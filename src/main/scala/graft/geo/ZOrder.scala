package graft.geo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order (Morton) spatial layout — the write-side half of the 100 TB
  * spatial story. `env_intersects` pushdown prunes row groups by
  * min/max stats, but stats only prune if spatially-near rows land in
  * the same files; interleaving the quantized x/y bits into one sort
  * key and range-partitioning on it gives every output file a tight
  * spatial envelope (the same mechanism as Delta's OPTIMIZE ZORDER —
  * expressed here as plain column bit math + repartitionByRange, no
  * engine extension needed). A bbox query over the laid-out table then
  * touches a handful of files instead of all of them; ZOrderSpec
  * measures exactly that.
  */
object ZOrder {

  /** Morton z-value of a coordinate pair: quantize x and y to
    * 2^bits cells over [west..east] × [south..north]
    * (quantize-before-floor — engine-neutral), then interleave the
    * bits (x even positions, y odd). Pure column bit math: codegen'd,
    * no UDF. */
  def zValue(
      x: Column,
      y: Column,
      west: Double,
      south: Double,
      east: Double,
      north: Double,
      bits: Int = 16
  ): Column = {
    require(bits >= 1 && bits <= 31, "1..31 interleave bits")
    val n = 1L << bits
    def cell(c: Column, lo: Double, hi: Double): Column =
      least(floor(round((c - lo) / (hi - lo) * n, 9)).cast("long"), lit(n - 1))
    val ix = cell(x, west, east)
    val iy = cell(y, south, north)
    (0 until bits)
      .map { b =>
        shiftleft(shiftright(ix, b).bitwiseAND(lit(1L)), 2 * b)
          .bitwiseOR(shiftleft(shiftright(iy, b).bitwiseAND(lit(1L)), 2 * b + 1))
      }
      .reduce(_ bitwiseOR _)
  }

  /** Lay a frame out z-ordered: range-partition on the z-value (files
    * get contiguous z ranges → tight spatial envelopes) and sort
    * within each file so row groups prune too. */
  def zorderWrite(
      df: DataFrame,
      xCol: String,
      yCol: String,
      west: Double,
      south: Double,
      east: Double,
      north: Double,
      nFiles: Int,
      path: String,
      bits: Int = 16
  ): Unit =
    df.withColumn("z", zValue(col(xCol), col(yCol), west, south, east, north, bits))
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
      .write
      .mode("overwrite")
      .parquet(path)

  /** ◆ Z-values under the oracle: the deterministic event lon/lat
    * derivation (shared with q_bbox_filter), 16-bit quantization, full
    * bit interleave — rolled up per z-cell (zval >> 22) so DuckDB
    * re-derives every interleaved bit. */
  def zorderQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = GeoQueries.withLonLat(Tables.eventsRaw(s, dir))
    ev.select($"event_id", zValue($"lon", $"lat", -180, -90, 180, 90, bits = 16).as("zval"))
      .groupBy(shiftright($"zval", 22).as("zcell"))
      .agg(count(lit(1)).as("n"), min($"zval").as("zmin"), max($"zval").as("zmax"))
  }
}
