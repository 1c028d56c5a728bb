package graft

import graft.sources.AsciiPoints

/** ASCII .xyz / .pts point readers (the PointCloud extensions
  * entry.cpp:1001 types; read natively here). */
class AsciiPointsSpec extends SparkSuite {

  private val xyzText =
    """# a comment
      |1.0 2.0 3.0
      |4.5 -5.25 6.0 100
      |
      |7.0 8.0 9.0 50 255 128 0
      |// another comment
      |not a point line
      |""".stripMargin

  test("xyz parse: comments/blank/garbage skipped, optional intensity and rgb") {
    val pts = AsciiPoints.parse(xyzText)
    assert(pts.length == 3)
    assert(pts(0) == AsciiPoints.Pt(1.0, 2.0, 3.0, None, None))
    assert(pts(1) == AsciiPoints.Pt(4.5, -5.25, 6.0, Some(100.0), None))
    assert(pts(2) == AsciiPoints.Pt(7.0, 8.0, 9.0, Some(50.0), Some((255, 128, 0))))
  }

  test("pts: count header verified; mismatch and missing header are named errors") {
    val pts = AsciiPoints.parse("2\n1 2 3\n4 5 6 77\n", pts = true)
    assert(pts.length == 2 && pts(1).intensity.contains(77.0))
    assert(intercept[IllegalArgumentException](AsciiPoints.parse("3\n1 2 3\n", pts = true))
      .getMessage.contains("declares 3"))
    assert(intercept[IllegalArgumentException](AsciiPoints.parse("1 2 3\n4 5 6\n", pts = true))
      .getMessage.contains("point count"))
  }

  test("reference column conventions: 6-col XYZRGB, CloudCompare header, count-first xyz") {
    // pointcloud_test xyzWithoutHeaders: 6 columns = x y z r g b
    val six = AsciiPoints.parse("274849.83 4603201.67 3.68 95 116 77\n274849.93 4603202.21 3.58 103 129 87\n")
    assert(six.length == 2)
    assert(six.head.rgb.contains((95, 116, 77)) && six.head.intensity.isEmpty)
    // xyzWithCloudCompareHeaders: //-header names the dimensions
    val ccText = "//X Y Z R G B Return_Number Number_Of_Returns User_Data\n" +
      "274849.83 4603201.67 3.68 95 116 77 1.0 1.0 3.0\n" +
      "274849.93 4603202.21 3.58 103 129 87 1.0 1.0 3.0\n"
    val cc = AsciiPoints.parse(ccText)
    assert(cc.length == 2 && cc.head.intensity.contains(95.0)) // 9 cols → 4th is intensity-slot
    val m = AsciiPoints.meta(ccText).get
    assert(m.pointCount == 2 && m.dimensions.take(3) == Seq("X", "Y", "Z") && m.dimensions.contains("Return_Number"))
    // xyzWithPointCount: a count-only first line drops out of an xyz parse
    assert(AsciiPoints.parse("2\n1 2 3\n4 5 6 7\n").length == 2)
  }

  test("ascii points feed the COPC pipeline (copcFromXyz composition)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xyz-copc")
    try {
      val lines = (0 until 300).map(i => s"${i % 20}.0 ${(i * 7) % 20}.0 ${(i * 13) % 10}.0")
      java.nio.file.Files.write(dir.resolve("cloud.xyz"), lines.mkString("\n").getBytes)
      val pts = AsciiPoints.pointsTable(spark, dir.resolve("cloud.xyz").toString)
      assert(pts.count() == 300)
      // convert to the integer-scaled domain and run the octree tiler +
      // conformant COPC assembly (the buildCopc path)
      import org.apache.spark.sql.functions._
      val scaled = pts.select(
        (col("x") * 100).cast("long").as("x"),
        (col("y") * 100).cast("long").as("y"),
        (col("z") * 100).cast("long").as("z"))
        .withColumn("id", monotonically_increasing_id())
        .withColumn("okey", md5(concat(lit("xyz:"), col("id").cast("string"))))
      val assigned = graft.geo.PcTiler.octreeAssign(scaled, cap = 64, maxDepth = 3)
      val copc = graft.geo.PcTiler.copcArtifact(assigned).collect().head.getAs[Array[Byte]]("copc")
      val info = graft.sources.Copc.info(copc).get
      assert(info.pointCount == 300, s"COPC should carry every ascii point, got ${info.pointCount}")
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); java.nio.file.Files.delete(dir)
    }
  }

  test("meta face: count + bounds like the LAS sniff") {
    val m = AsciiPoints.meta(xyzText).get
    assert(m.format == "xyz" && m.pointCount == 3)
    assert(m.bounds.contains((1.0, -5.25, 3.0, 7.0, 8.0, 9.0)))
    assert(AsciiPoints.meta("# only comments\n") == None)
  }

  test("Spark face: splittable text scan parses in parallel; pts headers drop out") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xyz")
    try {
      java.nio.file.Files.write(dir.resolve("a.xyz"),
        (0 until 500).map(i => s"$i ${i * 2} ${i * 3} ${i % 7}").mkString("\n").getBytes)
      java.nio.file.Files.write(dir.resolve("b.pts"),
        ("3\n" + (0 until 3).map(i => s"${i + 1000} 0 0").mkString("\n")).getBytes)
      val df = AsciiPoints.pointsTable(spark, dir.toString + "/*")
      assert(df.count() == 503)
      import org.apache.spark.sql.functions._
      assert(df.agg(sum(col("x"))).collect().head.getDouble(0) ==
        (0 until 500).sum.toDouble + 1000 + 1001 + 1002)
      assert(df.filter(col("intensity").isNotNull).count() == 500)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); java.nio.file.Files.delete(dir)
    }
  }
}
