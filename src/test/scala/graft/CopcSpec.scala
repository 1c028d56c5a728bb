package graft

import java.nio.file.Files

import graft.sources.Copc

/** COPC structure reader over a hand-assembled file: LAS 1.4 header,
  * copc info VLR, root + child hierarchy pages (the −1 point-count
  * child-page indirection), per-node cube bounds, cycle safety, and
  * the executor-side hierarchyTable with its bbox node selection.
  */
class CopcSpec extends SparkSuite {

  private def putU16(b: Array[Byte], i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >> 8).toByte }
  private def putU32(b: Array[Byte], i: Int, v: Long): Unit = (0 until 4).foreach(k => b(i + k) = (v >> (8 * k)).toByte)
  private def putU64(b: Array[Byte], i: Int, v: Long): Unit = (0 until 8).foreach(k => b(i + k) = (v >> (8 * k)).toByte)
  private def putF64(b: Array[Byte], i: Int, v: Double): Unit = putU64(b, i, java.lang.Double.doubleToLongBits(v))

  private def entry(b: Array[Byte], i: Int, lvl: Int, x: Int, y: Int, z: Int, off: Long, size: Int, cnt: Int): Unit = {
    putU32(b, i, lvl); putU32(b, i + 4, x); putU32(b, i + 8, y); putU32(b, i + 12, z)
    putU64(b, i + 16, off); putU32(b, i + 24, size); putU32(b, i + 28, cnt)
  }

  /** center (100, 200, 50), halfsize 40, spacing 0.5; root page at 600
    * holds two leaves + one child-page ref; child page at 700 holds
    * one level-2 leaf. */
  private def copcFile(childOffset: Long = 700L): Array[Byte] = {
    val b = new Array[Byte](800)
    b(0) = 'L'; b(1) = 'A'; b(2) = 'S'; b(3) = 'F'
    b(24) = 1; b(25) = 4 // LAS 1.4
    putU16(b, 94, 375) // header size
    putU32(b, 96, 589) // offset to point data
    putU32(b, 100, 1) // one VLR
    putU64(b, 247, 1750L) // point count
    // copc info VLR header at 375
    val user = "copc".getBytes("US-ASCII")
    user.indices.foreach(i => b(375 + 2 + i) = user(i))
    putU16(b, 375 + 18, 1) // record_id
    putU16(b, 375 + 20, 160) // payload length
    // payload at 429
    val p = 429
    putF64(b, p, 100.0); putF64(b, p + 8, 200.0); putF64(b, p + 16, 50.0)
    putF64(b, p + 24, 40.0) // halfsize
    putF64(b, p + 32, 0.5) // spacing
    putU64(b, p + 40, 600L) // root hier offset
    putU64(b, p + 48, 96L) // root hier size (3 entries)
    // root page
    entry(b, 600, 0, 0, 0, 0, off = 3000L, size = 512, cnt = 1000)
    entry(b, 632, 1, 1, 0, 1, off = 4000L, size = 256, cnt = 500)
    entry(b, 664, 1, 0, 0, 0, off = childOffset, size = 32, cnt = -1) // child page
    // child page
    entry(b, 700, 2, 3, 2, 1, off = 5000L, size = 128, cnt = 250)
    b
  }

  test("info VLR: octree cube, spacing, root page location, LAS 1.4 point count") {
    val inf = Copc.info(copcFile()).get
    assert(inf.centerX === 100.0 && inf.centerY === 200.0 && inf.centerZ === 50.0)
    assert(inf.halfSize === 40.0 && inf.spacing === 0.5)
    assert(inf.rootHierOffset === 600L && inf.rootHierSize === 96L)
    assert(inf.pointCount === 1750L)
    assert(Copc.info("nope".getBytes).isEmpty)
    val las12 = copcFile(); las12(25) = 2
    assert(Copc.info(las12).isEmpty, "COPC requires LAS 1.4")
  }

  test("hierarchy walk resolves child pages and returns only point-chunk nodes") {
    val nodes = Copc.hierarchy(copcFile())
    assert(nodes.map(n => (n.level, n.x, n.y, n.z, n.pointCount)).toSet ===
      Set((0, 0, 0, 0, 1000), (1, 1, 0, 1, 500), (2, 3, 2, 1, 250)))
    assert(nodes.map(_.pointCount.toLong).sum === 1750L)
  }

  test("a cyclic child-page reference terminates instead of looping") {
    assert(Copc.hierarchy(copcFile(childOffset = 600L)).length === 2)
  }

  test("meta reports the octree cube as bounds") {
    val m = Copc.meta(copcFile()).get
    assert(m.format === "copc" && m.pointCount === 1750L)
    assert(m.bounds === Some((60.0, 160.0, 10.0, 140.0, 240.0, 90.0)))
  }

  test("hierarchyTable: node cube bounds + per-level resolution; bbox selection needs no point bytes") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("copcspec")
    try {
      Files.write(dir.resolve("a.copc.laz"), copcFile())
      val df = Copc.hierarchyTable(spark, dir.toString)
      assert(df.count() === 3)
      val l2 = df.filter(col("level") === 2).collect().head
      // level-2 cube = 80/4 = 20: voxel (3,2,1) from corner (60,160,10)
      assert(l2.getAs[Double]("minx") === 60.0 + 3 * 20.0)
      assert(l2.getAs[Double]("miny") === 160.0 + 2 * 20.0)
      assert(l2.getAs[Double]("minz") === 10.0 + 1 * 20.0)
      assert(l2.getAs[Double]("maxx") === 60.0 + 4 * 20.0)
      assert(l2.getAs[Double]("resolution") === 0.125)
      // the tiler's planning query: nodes intersecting a bbox at depth <= 1
      val picked = df
        .filter(col("level") <= 1 && col("minx") < 145 && col("maxx") > 135 && col("miny") < 205 && col("maxy") > 195)
        .collect()
      assert(picked.map(_.getAs[Int]("level")).sorted.toSeq === Seq(0, 1))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }
}
