package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed mergeable QUANTILE sketch — the percentile twin of
  * [[Hll]] (distincts) and [[Reservoir]] (samples): "what is p99" at
  * 100 TB where an exact quantile sorts the column and
  * `percentile_approx` yields no mergeable, persistable state. The
  * sketch IS a (group, bucket, cnt) DataFrame — bounded by the bucket
  * DOMAIN (≤ 32 per octave, ~64 octaves for any long), not the row
  * count — built in one `count` partial aggregation (map-side combine
  * collapses each partition before the shuffle, so shuffle volume is
  * sketch-sized), and bucket-wise `sum` MERGES two sketches EXACTLY
  * (counts add; QSketchSpec proves merge ≡ re-sketch bit-for-bit, the
  * property that lets per-day / per-shard sketches roll up without
  * re-reading data).
  *
  * Bucketing is the DDSketch idea (Masson et al., VLDB 2019:
  * relative-error guarantee from log-spaced bins) made ENGINE-NEUTRAL
  * by integer arithmetic: values land in the integer domain
  * (`round(value·100)` for 2-decimal inputs), the octave is the BIT
  * LENGTH of the integer (`length(bin(v))` / `length(printf('%b',v))`
  * — exact string-of-bits math, no float log whose last ulp could
  * flip a boundary), and the top 5 mantissa bits refine each octave
  * into ≤ 32 sub-buckets → γ = 1 + 2⁻⁴, ≈ 3 % worst-case relative
  * error. Bucket id = octave·32 + mantissa is a single integer;
  * estimates walk the per-group cumulative count (a window OVER THE
  * AGGREGATE — input bounded by bucket domain, never raw rows) and
  * report the first bucket whose cumulative count reaches ⌈q·n⌉, the
  * same discrete rule as `percentilesQuery`. Every step to the final
  * ÷100 is integer — bit-identical in any engine.
  */
object QSketch {

  /** Mantissa refinement: top `MantissaBits` bits of each octave. */
  val MantissaBits = 5

  /** Bucket id of a non-negative integer column: 0 for v = 0, else
    * bitlen(v)·32 + (v >> max(bitlen(v)−5, 0)). */
  private def bucketId(v: String): org.apache.spark.sql.Column =
    when(col(v) === 0, lit(0L)).otherwise(
      expr(s"length(bin($v)) * 32 + shiftright($v, greatest(length(bin($v)) - $MantissaBits, 0))")
    )

  /** Inclusive lower bound of a bucket id — the reported quantile
    * value (deterministic; no interpolation to diverge). */
  private def bucketLow = expr(
    s"CASE WHEN id = 0 THEN 0 ELSE shiftleft(id % 32, greatest(id div 32 - $MantissaBits, 0)) END"
  )

  /** Sketch an integer column per group → the (groupCols..., id, cnt)
    * bucket table, ≤ 32·octaves rows per group at any scale. */
  def sketch(df: DataFrame, groupCols: Seq[String], intCol: String): DataFrame =
    df.select(groupCols.map(col) :+ bucketId(intCol).as("id"): _*)
      .groupBy(groupCols.map(col) :+ col("id"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketches over a coarser grouping — bucket-wise count sum,
    * EXACTLY the sketch of the concatenated inputs. */
  def merge(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs
      .groupBy(groupCols.map(col) :+ col("id"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Collapse a bucket table to per-group quantile estimates at `qs`:
    * (groupCols..., n, q_<pct>...). The cumulative window's input is
    * the bucket AGGREGATE (bounded domain), so no raw row ever funnels
    * through a sort task. */
  def quantiles(regs: DataFrame, groupCols: Seq[String], qs: Seq[Double]): DataFrame = {
    val wCum = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    def pick(q: Double) =
      min(when(col("cum") >= greatest(lit(1L), ceil(lit(q) * col("n"))), col("low")))
    regs
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("low", bucketLow)
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(col("n")).as("n"),
        qs.map(q => pick(q).as(s"q${(q * 100).round}")): _*
      )
  }

  /** ◆ q_qsketch — per-event-type sketches of `round(value·100)` plus
    * the `__all__` row MERGED from the per-type bucket tables (the
    * merge is under the oracle, not just the spec): p50/p90/p99 per
    * group, integer centi-units. */
  def qsketchQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vals = Tables
      .events(s, dir)
      .filter($"value".isNotNull)
      .select($"event_type", round($"value" * 100).cast("long").as("v"))
    val regs = Staged.persist(sketch(vals, Seq("event_type"), "v"))
    val merged = merge(regs, Nil).select(lit("__all__").as("event_type"), $"id", $"cnt")
    quantiles(regs.unionByName(merged), Seq("event_type"), Seq(0.5, 0.9, 0.99))
  }
}
