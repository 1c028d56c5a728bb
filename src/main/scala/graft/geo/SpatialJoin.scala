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
}
