package graft

import graft.model.EntryType
import graft.sources.Ply

/** PLY header walk + mesh/splat/point-cloud dispatch (ply.cpp:19-180,
  * entry.cpp:1018-1022) and the full data read beyond it. */
class PlySpec extends SparkSuite {

  private def ascii(body: String): Array[Byte] = body.getBytes("US-ASCII")

  private val pointCloudPly = ascii(
    """ply
      |format ascii 1.0
      |element vertex 3
      |property float x
      |property float y
      |property float z
      |end_header
      |1 2 3
      |4 5 6
      |7 8 9
      |""".stripMargin)

  private val meshPly = ascii(
    """ply
      |format ascii 1.0
      |comment made somewhere
      |element vertex 4
      |property float x
      |property float y
      |property float z
      |element face 2
      |property list uchar int vertex_indices
      |end_header
      |0 0 0
      |1 0 0
      |1 1 0
      |0 1 0
      |3 0 1 2
      |3 0 2 3
      |""".stripMargin)

  test("info: vertex count, dimensions, mesh/texture flags mirror getPlyInfo") {
    val i = Ply.info(pointCloudPly).get
    assert(!i.isMesh && !i.isSplat && i.shDegree == -1)
    assert(i.vertexCount == 3 && i.dimensions == Seq("x", "y", "z"))
    val m = Ply.info(meshPly).get
    assert(m.isMesh && !m.hasTextures)
    val t = Ply.info(ascii(
      "ply\nformat ascii 1.0\ncomment TextureFile tex.png\nelement vertex 1\nproperty float x\nelement face 1\nproperty list uchar int vertex_indices\nend_header\n0\n3 0 0 0\n")).get
    assert(t.isMesh && t.hasTextures)
    assert(Ply.info("not a ply".getBytes) == None)
    assert(Ply.info(Array.emptyByteArray) == None)
  }

  test("splat detection: f_dc_0 primary, scale/rot/opacity fallback, SH degree folding") {
    def splatHeader(rest: Int, extra: String = "property float f_dc_0\n"): Array[Byte] = ascii(
      "ply\nformat ascii 1.0\nelement vertex 0\nproperty float x\n" + extra +
        (0 until rest).map(i => s"property float f_rest_$i\n").mkString + "end_header\n")
    assert(Ply.info(splatHeader(0)).get.isSplat)
    assert(Ply.info(splatHeader(0)).get.shDegree == 0)
    assert(Ply.info(splatHeader(9)).get.shDegree == 1)
    assert(Ply.info(splatHeader(24)).get.shDegree == 2)
    assert(Ply.info(splatHeader(45)).get.shDegree == 3)
    // non-standard counts clamp to the closest lower degree
    assert(Ply.info(splatHeader(30)).get.shDegree == 2)
    assert(Ply.info(splatHeader(10)).get.shDegree == 1)
    assert(Ply.info(splatHeader(5)).get.shDegree == 0)
    // fallback signature without f_dc_0
    val fb = "property float opacity\n" +
      (0 until 3).map(i => s"property float scale_$i\n").mkString +
      (0 until 4).map(i => s"property float rot_$i\n").mkString
    assert(Ply.info(splatHeader(0, fb)).get.isSplat)
    // a mesh with splat-looking properties is NOT a splat
    val meshWithDc = ascii(
      "ply\nformat ascii 1.0\nelement vertex 0\nproperty float f_dc_0\nelement face 0\nproperty list uchar int vertex_indices\nend_header\n")
    assert(!Ply.info(meshWithDc).get.isSplat)
  }

  test("identify: textured mesh -> Generic, mesh -> Model, splat -> GaussianSplat, else PointCloud") {
    assert(Ply.identify(pointCloudPly) == EntryType.PointCloud)
    assert(Ply.identify(meshPly) == EntryType.Model)
    assert(Ply.identify(ascii(
      "ply\nformat ascii 1.0\ncomment TextureFile t.png\nelement vertex 0\nproperty float x\nelement face 0\nproperty list uchar int vertex_indices\nend_header\n")) == EntryType.Generic)
    assert(Ply.identify(ascii(
      "ply\nformat ascii 1.0\nelement vertex 0\nproperty float f_dc_0\nend_header\n")) == EntryType.GaussianSplat)
    assert(Ply.identify("garbage".getBytes) == EntryType.Generic)
  }

  test("ascii + binary reads agree; faces decode; big-endian handled") {
    val (_, av, af) = Ply.read(meshPly)
    assert(av.length == 4 && af == Seq(Seq(0L, 1L, 2L), Seq(0L, 2L, 3L)))
    val names = Seq("x", "y", "z")
    val rows = Seq(Array(1f, 2f, 3f), Array(-4.5f, 5f, 6f), Array(7f, 8f, 9.25f))
    val bin = Ply.write(names, rows)
    val (h, bv, _) = Ply.read(bin)
    assert(h.format == "binary_little_endian")
    assert(bv.map(_.toSeq) == rows.map(_.map(_.toDouble).toSeq))
    // big-endian: hand-build a 1-vertex file
    val beHead = "ply\nformat binary_big_endian 1.0\nelement vertex 1\nproperty float x\nproperty double y\nproperty uchar z\nend_header\n"
    val bb = java.nio.ByteBuffer.allocate(beHead.length + 4 + 8 + 1)
    bb.put(beHead.getBytes("US-ASCII")); bb.putFloat(2.5f); bb.putDouble(-3.25); bb.put(200.toByte)
    val (_, bev, _) = Ply.read(bb.array())
    assert(bev.head.toSeq == Seq(2.5, -3.25, 200.0))
  }

  test("header bound: >512 body lines is rejected like the reference parser") {
    val big = "ply\nformat ascii 1.0\nelement vertex 0\n" +
      (0 until 600).map(i => s"property float p$i\n").mkString + "end_header\n"
    assert(Ply.info(ascii(big)) == None)
  }

  test("Spark face: estate vertex table with typed columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ply")
    try {
      val names = Seq("x", "y", "f_dc_0")
      (0 until 3).foreach { f =>
        val rows = (0 until 50).map(i => Array((f * 100 + i).toFloat, i.toFloat, (i % 7).toFloat))
        java.nio.file.Files.write(dir.resolve(s"part$f.ply"), Ply.write(names, rows))
      }
      val df = Ply.vertexTable(spark, dir.toString + "/*.ply")
      assert(df.count() == 150)
      assert(df.schema.fieldNames.toSeq == Seq("file", "x", "y", "f_dc_0"))
      import org.apache.spark.sql.functions._
      val bySum = df.agg(sum(col("x"))).collect().head.getDouble(0)
      assert(bySum == (0 until 3).flatMap(f => (0 until 50).map(f * 100 + _)).sum.toDouble)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); java.nio.file.Files.delete(dir)
    }
  }

  test("extractor dispatch: .ply payloads fingerprint by content") {
    import graft.sources.Extractors
    assert(Extractors.fingerprint("cloud.ply", pointCloudPly) == EntryType.PointCloud)
    assert(Extractors.fingerprint("mesh.ply", meshPly) == EntryType.Model)
    val ex = Extractors.extract("splat.ply", ascii(
      "ply\nformat ascii 1.0\nelement vertex 0\nproperty float f_dc_0\nend_header\n"))
    assert(ex.entryType == EntryType.GaussianSplat)
    assert(ex.properties.contains("\"kind\":\"splat\"") && ex.properties.contains("\"shDegree\":0"))
  }
}
