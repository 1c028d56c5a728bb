package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed mesh LOD building — the Spark re-expression of the
  * multiresolution half of the reference's `buildlod_runner.cpp`
  * (which shells out to the nexus library). The nexus `.nxs`
  * container stays out of scope; what a 100 TB estate needs from the
  * runner is the LOD *computation*: per level, a coarser mesh whose
  * error bound matches the tileset's geometricError ladder.
  *
  * The method is classic vertex clustering (Rossignac–Borrel):
  * vertices snap to a level-ℓ grid, every cell collapses to one
  * representative, triangles remap and degenerates drop. Picked over
  * edge-collapse because it is embarrassingly relational — one
  * groupBy per level, three hash joins to remap corners, no
  * iterative priority queue — so the same job decimates one mesh or
  * a million, partitioned by (mesh_id, cell).
  *
  * Determinism contract (what the oracle checks): the representative
  * of a cell is the vertex with the SMALLEST id in the cell,
  * carrying its ORIGINAL coordinates — no averaging, so results are
  * exact integers on lattice meshes and engine-independent.
  */
object MeshLod {

  /** One clustering level. `vertices`: (vid LONG, x, y, z DOUBLE);
    * `triangles`: (a, b, c LONG — vids). Returns (vertices',
    * triangles') where vertices' = one row per occupied cell (the
    * min-vid representative) and triangles' = remapped, degenerate
    * (<3 distinct corners) dropped. */
  def decimate(vertices: DataFrame, triangles: DataFrame, cell: Double): (DataFrame, DataFrame) = {
    require(cell > 0, "cell must be positive")
    val cells = vertices
      .withColumn("cx", floor(col("x") / cell))
      .withColumn("cy", floor(col("y") / cell))
      .withColumn("cz", floor(col("z") / cell))
    // representative = min vid per cell; its coords re-enter by join
    // (min over a struct would carry them in one pass, but (vid →
    // coords) is a unique-key join the optimizer handles fine)
    val reps = cells
      .groupBy("cx", "cy", "cz")
      .agg(min("vid").as("rep"))
    val remap = cells
      .join(reps, Seq("cx", "cy", "cz"))
      .select(col("vid"), col("rep"))
    val newVertices = vertices
      .join(remap.filter(col("vid") === col("rep")).select("vid"), "vid")
      .select("vid", "x", "y", "z")
    val t1 = triangles
      .join(remap.withColumnRenamed("vid", "a").withColumnRenamed("rep", "ra"), "a")
      .join(remap.withColumnRenamed("vid", "b").withColumnRenamed("rep", "rb"), "b")
      .join(remap.withColumnRenamed("vid", "c").withColumnRenamed("rep", "rc"), "c")
      .select(col("ra").as("a"), col("rb").as("b"), col("rc").as("c"))
      .filter(col("a") =!= col("b") && col("b") =!= col("c") && col("a") =!= col("c"))
    (newVertices, t1)
  }

  /** Build a GLB per level of a cell-size ladder, plus the level-0
    * original — the payload chain a 3D-tiles LOD tileset wants
    * (geometricError = cell size). Vertices re-index densely per
    * level in vid order. Returns (cell, glb) pairs, finest first
    * (cell 0 = original). */
  def pyramidGlbs(
      vertices: Seq[(Long, Double, Double, Double)],
      triangles: Seq[(Long, Long, Long)],
      cells: Seq[Double]
  ): Seq[(Double, Array[Byte])] = {
    def emit(vs: Seq[(Long, Double, Double, Double)], ts: Seq[(Long, Long, Long)]): Array[Byte] = {
      val index = vs.map(_._1).sorted.zipWithIndex.toMap
      val pos = new Array[Float](vs.length * 3)
      vs.foreach { case (vid, x, y, z) =>
        val k = index(vid)
        pos(3 * k) = x.toFloat; pos(3 * k + 1) = y.toFloat; pos(3 * k + 2) = z.toFloat
      }
      val idx = ts.flatMap { case (a, b, c) => Seq(index(a), index(b), index(c)) }.toArray
      Mesh3d.writeMeshGlb(pos, idx)
    }
    val levels = cells.map { cell =>
      // serial twin of [[decimate]] (spec-proven equal on shared input)
      def cellOf(v: (Long, Double, Double, Double)) =
        (math.floor(v._2 / cell), math.floor(v._3 / cell), math.floor(v._4 / cell))
      val rep = vertices.groupBy(cellOf).map { case (_, vs) => vs.minBy(_._1) }.toSeq
      val byCell = rep.map(v => cellOf(v) -> v._1).toMap
      val remap = vertices.map(v => v._1 -> byCell(cellOf(v))).toMap
      val ts = triangles
        .map { case (a, b, c) => (remap(a), remap(b), remap(c)) }
        .filter { case (a, b, c) => a != b && b != c && a != c }
      (cell, emit(rep, ts))
    }
    (0.0, emit(vertices, triangles)) +: levels
  }

  /** ◆ q_lod — the decimation contract under the oracle: per
    * event_type, a deterministic lattice mesh (vertex per event:
    * x=id%100, y=id*3%100, z=id*7%50; triangles over consecutive
    * id-ranked triples) clusters at cell=4; the oracle mirrors the
    * min-vid representative rule and the degenerate-drop in SQL.
    * Everything distributed: grid assignment is a projection, the
    * representative a groupBy, corner remap three joins. */
  def lodQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val verts = graft.Tables
      .eventsRaw(s, dir)
      .select(
        $"event_type",
        $"event_id".as("vid"),
        ($"event_id" % 100).cast("double").as("x"),
        (($"event_id" * 3) % 100).cast("double").as("y"),
        (($"event_id" * 7) % 50).cast("double").as("z")
      )
    // triangles: consecutive id-ranked triples within each event_type.
    // Ranking is the scalable two-phase shape: per-(type, vid-bucket)
    // counts, prefix-sum over that AGGREGATE (bounded input), then an
    // intra-bucket row_number keyed by the growing bucket column — no
    // window ever sees raw rows keyed only by the constant domain.
    val wb = org.apache.spark.sql.expressions.Window.partitionBy($"event_type").orderBy($"bk")
    val bucketed = verts.withColumn("bk", ($"vid" / 1024).cast("long"))
    val offsets = bucketed
      .groupBy($"event_type", $"bk")
      .agg(count(lit(1)).as("bn"))
      .withColumn("off", sum($"bn").over(wb) - $"bn")
      .select($"event_type", $"bk", $"off")
    val wf = org.apache.spark.sql.expressions.Window.partitionBy($"event_type", $"bk").orderBy($"vid")
    val ranked = bucketed
      .join(offsets, Seq("event_type", "bk"))
      .withColumn("rn", $"off" + row_number().over(wf) - 1)
    val tris = ranked
      .withColumn("tri", floor($"rn" / 3))
      .groupBy($"event_type", $"tri")
      .agg(
        count(lit(1)).as("nc"),
        max(when($"rn" % 3 === 0, $"vid")).as("a"),
        max(when($"rn" % 3 === 1, $"vid")).as("b"),
        max(when($"rn" % 3 === 2, $"vid")).as("c")
      )
      .filter($"nc" === 3)
      .select($"event_type", $"a", $"b", $"c")
    val cell = 4.0
    val cells = verts
      .withColumn("cx", floor($"x" / cell))
      .withColumn("cy", floor($"y" / cell))
      .withColumn("cz", floor($"z" / cell))
    val reps = cells
      .groupBy($"event_type", $"cx", $"cy", $"cz")
      .agg(min($"vid").as("rep"))
    val remap = cells
      .join(reps, Seq("event_type", "cx", "cy", "cz"))
      .select($"event_type", $"vid", $"rep")
    val keptVerts = verts
      .join(remap.filter($"vid" === $"rep").select($"event_type", $"vid"), Seq("event_type", "vid"))
    val remA = remap.select($"event_type", $"vid".as("a"), $"rep".as("ra"))
    val remB = remap.select($"event_type", $"vid".as("b"), $"rep".as("rb"))
    val remC = remap.select($"event_type", $"vid".as("c"), $"rep".as("rc"))
    val keptTris = tris
      .join(remA, Seq("event_type", "a"))
      .join(remB, Seq("event_type", "b"))
      .join(remC, Seq("event_type", "c"))
      .filter($"ra" =!= $"rb" && $"rb" =!= $"rc" && $"ra" =!= $"rc")
    val vAgg = keptVerts
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_cells"),
        sum($"x").cast("long").as("x_sum"),
        sum($"y").cast("long").as("y_sum"),
        sum($"z").cast("long").as("z_sum")
      )
    val tAgg = keptTris
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_tris"), sum($"ra" + $"rb" + $"rc").as("corner_sum"))
    vAgg.join(tAgg, Seq("event_type"), "left")
      .select(
        $"event_type", $"n_cells", $"x_sum", $"y_sum", $"z_sum",
        coalesce($"n_tris", lit(0L)).as("n_tris"),
        coalesce($"corner_sum", lit(0L)).as("corner_sum")
      )
      .orderBy($"event_type")
  }
}
