package graft

import graft.sources.{Mesh3d, MeshLod, Tiles3d}

/** Vertex-clustering mesh LOD (the buildlod computation half,
  * relational): distributed decimate ≡ serial twin, degenerate
  * dropping, pyramid GLBs through the b3dm/3tz chain. */
class MeshLodSpec extends SparkSuite {
  import spark.implicits._

  // deterministic lattice mesh: 10x10 grid, 2 triangles per cell
  private val verts: Seq[(Long, Double, Double, Double)] =
    (0 until 100).map(i => ((i.toLong, (i % 10).toDouble, (i / 10).toDouble, ((i * 3) % 7).toDouble)))
  private val tris: Seq[(Long, Long, Long)] = (for {
    r <- 0 until 9; c <- 0 until 9
    v = (r * 10 + c).toLong
    t <- Seq((v, v + 1, v + 10), (v + 1, v + 11, v + 10))
  } yield t)

  test("decimate: distributed result equals the serial twin, cell=3") {
    val vDf = verts.toDF("vid", "x", "y", "z")
    val tDf = tris.toDF("a", "b", "c")
    val (nv, nt) = MeshLod.decimate(vDf, tDf, 3.0)
    // serial twin (same rules as pyramidGlbs)
    def cellOf(v: (Long, Double, Double, Double)) =
      (math.floor(v._2 / 3.0), math.floor(v._3 / 3.0), math.floor(v._4 / 3.0))
    val rep = verts.groupBy(cellOf).map { case (_, vs) => vs.minBy(_._1) }.toSeq
    val byCell = rep.map(v => cellOf(v) -> v._1).toMap
    val remap = verts.map(v => v._1 -> byCell(cellOf(v))).toMap
    val expT = tris
      .map { case (a, b, c) => (remap(a), remap(b), remap(c)) }
      .filter { case (a, b, c) => a != b && b != c && a != c }
    assert(nv.select("vid").as[Long].collect().sorted.toSeq === rep.map(_._1).sorted)
    assert(
      nt.as[(Long, Long, Long)].collect().sorted.toSeq === expT.sorted
    )
    // clustering contracts: fewer vertices, fewer (or equal) triangles
    assert(rep.size < verts.size && expT.size < tris.size)
  }

  test("decimate at a cell larger than the mesh collapses to min-vid points") {
    val vDf = verts.toDF("vid", "x", "y", "z")
    val tDf = tris.toDF("a", "b", "c")
    val (nv, nt) = MeshLod.decimate(vDf, tDf, 1000.0)
    assert(nv.count() === 1)
    assert(nv.select("vid").as[Long].head() === 0L)
    assert(nt.count() === 0) // everything degenerate
  }

  test("pyramidGlbs: every level round-trips through b3dm and shrinks monotonically") {
    val levels = MeshLod.pyramidGlbs(verts, tris, Seq(2.0, 4.0, 8.0))
    assert(levels.map(_._1) === Seq(0.0, 2.0, 4.0, 8.0))
    val counts = levels.map { case (_, glb) =>
      val (pos, idx) = Mesh3d.readMeshGlb(glb)
      (pos.length / 3, idx.length / 3)
    }
    assert(counts.head === ((100, 162)))
    assert(counts.map(_._1) === counts.map(_._1).sorted.reverse) // vertices non-increasing
    // compose into a real LOD tileset: one b3dm per level
    val tiles = levels.zipWithIndex.map { case ((_, glb), i) => s"lod/$i.b3dm" -> Tiles3d.writeB3dm(glb) }
    val ts = Tiles3d.tilesetJson(-1.0, -1.0, 1.0, 1.0, 0.0, 10.0, 8.0, tiles.map(_._1))
    val tz = Tiles3d.write3tz(ts, tiles)
    tiles.foreach { case (name, payload) =>
      val back = Tiles3d.readZipEntry(tz, name).get
      val (_, glb) = Tiles3d.readB3dm(back)
      Mesh3d.readMeshGlb(glb) // parses
      assert(java.util.Arrays.equals(back, payload))
    }
  }

  test("q_lod runs against sf0.001 with the documented shape") {
    val df = MeshLod.lodQuery(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_cells")) > 0)
      assert(r.getLong(r.fieldIndex("n_tris")) >= 0)
    }
  }
}
