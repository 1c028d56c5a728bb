package graft.geo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Grid-partitioned spatial join — point-in-bbox between two LARGE
  * frames. The bbox-filter face (`core/Index`, q_bbox_filter) covers
  * one region against the estate; joining a whole region TABLE against
  * a point table cannot cross-join at scale, so both sides are keyed
  * to a fixed grid: each region explodes to the cells its envelope
  * covers (bounded by area/cell²), each point maps to exactly ONE
  * cell, and the join is a plain equi-join on (cx, cy) followed by the
  * exact containment test. Shuffle volume is data-sized × 1 for points
  * (no duplication — a point has one cell) and cell-count-sized for
  * regions; a point can match a region in only one cell, so the join
  * needs no dedup. Dense-cell skew is ordinary join skew (AQE
  * skew-join / salting apply); this is the standard distributed
  * spatial-join shape (the SpatialSpark / Sedona partitioned-join
  * design, expressed as plain DataFrame ops).
  */
object SpatialJoin {

  /** Grid cell index at `cell`° resolution — quantize-before-floor so
    * both engines discretize identically. */
  def cellOf(c: Column, cell: Double): Column =
    floor(round(c / cell, 9)).cast("long")

  /** Explode `regions(region_id, w, s, e, n)` to one row per covered
    * grid cell. Bounded: ceil(width/cell) × ceil(height/cell) rows per
    * region. */
  def regionCells(regions: DataFrame, cell: Double): DataFrame =
    regions
      .withColumn("cx", explode(sequence(cellOf(col("w"), cell), cellOf(col("e"), cell))))
      .withColumn("cy", explode(sequence(cellOf(col("s"), cell), cellOf(col("n"), cell))))

  /** Join `points(lon, lat, ...)` to `regions(region_id, w, s, e, n)`:
    * equi-join on the grid cell, exact bbox containment verify. Each
    * surviving row is one (point, region) containment. */
  def join(points: DataFrame, regions: DataFrame, cell: Double = 5.0): DataFrame =
    points
      .withColumn("cx", cellOf(col("lon"), cell))
      .withColumn("cy", cellOf(col("lat"), cell))
      .join(regionCells(regions, cell), Seq("cx", "cy"))
      .filter(col("lon") >= col("w") && col("lon") <= col("e") && col("lat") >= col("s") && col("lat") <= col("n"))
      .drop("cx", "cy")

  /** Deterministic 20-region bbox table (integer-degree corners, exact
    * in FP; both engines derive the identical table). */
  def syntheticRegions(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(20)
      .select(
        $"id".as("region_id"),
        (($"id" * 53) % 60 * 5 - 180).cast("double").as("w"),
        (($"id" * 53) % 60 * 5 - 180 + 4 + ($"id" % 5) * 3).cast("double").as("e"),
        (($"id" * 29) % 30 * 5 - 90).cast("double").as("s"),
        (($"id" * 29) % 30 * 5 - 90 + 3 + ($"id" % 4) * 4).cast("double").as("n")
      )
  }

  /** ◆ Spatial join under the oracle: the shared deterministic event
    * lon/lat derivation against the 20 synthetic regions, rolled up
    * per region (count + integer id checksum — no float accumulation).
    * DuckDB re-derives the grid, the cell explosion, and the exact
    * containment. */
  def spatialJoinQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = GeoQueries.withLonLat(Tables.eventsRaw(s, dir)).select($"event_id", $"lon", $"lat")
    join(pts, syntheticRegions(s))
      .groupBy($"region_id")
      .agg(count(lit(1)).as("n_points"), sum($"event_id").as("id_sum"))
  }

  /** One grid round: candidates from the 3×3 neighborhood of `cell`-
    * sized cells, kept within `radius`, per-query top-k. EXACT and
    * COMPLETE for any radius ≤ cell: a point within L∞ distance
    * `cell` of a query differs by at most one cell index per axis. */
  private def knnRound(queries: DataFrame, data: DataFrame, cell: Long, radius: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries
      .select(
        col("qid"),
        col("px"),
        col("py"),
        expr(s"(px + 18000) div $cell").as("cx0"),
        expr(s"(py + 9000) div $cell").as("cy0")
      )
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(
        col("qid"),
        col("px"),
        col("py"),
        (col("cx0") + col("dx")).as("cx"),
        (col("cy0") + col("dy")).as("cy")
      )
    val d = data.select(
      col("bid"),
      col("px").as("bx"),
      col("py").as("by"),
      expr(s"(px + 18000) div $cell").as("cx"),
      expr(s"(py + 9000) div $cell").as("cy")
    )
    val cand = q
      .join(d, Seq("cx", "cy"))
      .filter(col("bid") =!= col("qid"))
      .withColumn(
        "d2",
        (col("px") - col("bx")) * (col("px") - col("bx")) +
          (col("py") - col("by")) * (col("py") - col("by"))
      )
      .filter(col("d2") <= lit(radius * radius))
    cand
      .withColumn(
        "rank",
        row_number().over(Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("bid").asc))
      )
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("bid"), col("d2"))
  }

  /** Radius-bounded k-nearest-neighbor join — for every query point
    * the k closest data points within distance r, EXACT. Grid cell =
    * radius makes the 3×3 equi-join candidate set provably complete;
    * integer coordinates make d² exact long arithmetic; per-query
    * top-k is a window over the bounded candidates, never the table.
    *
    * DENSITY-ADAPTIVE (the sf1 scale-probe finding): with cell = r
    * the candidate count per query grows linearly with data density —
    * the r13→r14 probe measured the whole join ~linear-plus at 10×
    * rows because candidates grew 100×. When the expected neighbor
    * count per query (n·πr²/extent-area, from four cheap aggregates)
    * is far above k, a FIRST round runs at a shrunken radius r₁ with
    * E[neighbors at r₁] ≈ 8k: a query with k results inside the
    * guaranteed-complete r₁ ball already holds its global top-k
    * (closer beats farther), and only the sparse-region remainder
    * re-runs at full r. Per-query candidate work becomes O(k),
    * independent of density — the 100-TB shape.
    *
    * queries(qid, px, py) × data(bid, px, py), centi-degree longs. */
  def knnJoin(queries: DataFrame, data: DataFrame, r: Long, k: Int): DataFrame = {
    val stats = data
      .agg(
        count(lit(1)).as("n"),
        min(col("px")).as("x0"), max(col("px")).as("x1"),
        min(col("py")).as("y0"), max(col("py")).as("y1"))
      .head()
    val n = stats.getLong(0)
    if (n == 0) return knnRound(queries, data, r, r, k)
    val area = math.max(1.0,
      (stats.getLong(2) - stats.getLong(1)).toDouble * (stats.getLong(4) - stats.getLong(3)).toDouble)
    val lambda = n * math.Pi * r * r / area // expected neighbors within r
    val r1 = math.ceil(r * math.sqrt(8.0 * k / math.max(lambda, 1e-9))).toLong
    if (r1 >= r) knnRound(queries, data, r, r, k)
    else {
      val first = graft.operators.Staged.persist(knnRound(queries, data, math.max(r1, 1), math.max(r1, 1), k))
      val satisfied = first
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") === k)
        .select(col("qid"))
      val unsatisfied = queries.join(satisfied, Seq("qid"), "left_anti")
      first
        .join(satisfied, Seq("qid")) // keep only provably-complete top-k sets
        .unionByName(knnRound(unsatisfied, data, r, r, k))
    }
  }

  /** ◆ q_knn_join — every 10th event queries its 5 nearest events
    * within 5° (500 centi-degrees); DuckDB verifies by brute force. */
  def knnJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables
      .eventsRaw(s, dir)
      .select(
        col("event_id").as("bid"),
        (col("event_id") * 7919L % 36000L - 18000L).as("px"),
        (col("event_id") * 104729L % 18000L - 9000L).as("py")
      )
    val queries = pts
      .filter(col("bid") % 10 === 0)
      .select(col("bid").as("qid"), col("px"), col("py"))
    knnJoin(queries, pts, r = 500L, k = 5)
  }
}
