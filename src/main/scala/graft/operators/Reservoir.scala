package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic bottom-k hash reservoir — the quantile/sample member
  * of the sketch family ([[Hll]] counts distincts, [[Bloom]] answers
  * membership; this one answers "what does the distribution look
  * like"). A group's sketch is the k rows whose md5-60 row hash is
  * smallest: a uniform random sample under the hash, but a PURE
  * FUNCTION of the input set — no RNG, no insertion order, no
  * partitioning in the result, which is what lets per-shard / per-day
  * sketches merge EXACTLY (bottom-k of a union of bottom-k's == bottom-k
  * of the union; ReservoirSpec gates it bit-for-bit) and lets a SQL
  * engine recompute the identical sample for the oracle. True KLL
  * buys a better error exponent with randomized compaction, but that
  * makes the sketch depend on merge order — unverifiable across
  * engines; the KMV/bottom-k form (Bar-Yossef et al. 2002; Cohen &
  * Kaplan 2007 "Summarizing data using bottom-k sketches") is the
  * mergeable-and-deterministic point in the design space.
  *
  * Scale shape: the sketch is built by ONE custom [[Aggregator]] on
  * the partial-agg path — each map task keeps a k-bounded buffer per
  * group (O(1) fast-path reject once the buffer is full: most rows
  * never touch the sort), so the shuffle carries ≤ k rows per group
  * per partition, never the data. Quantile extraction then windows
  * over SKETCH rows (≤ k per group), not raw rows.
  */
object Reservoir {

  /** k = 64 rows per group ≈ ±6% rank error at the quartiles (binomial
    * √(q(1-q)/k)) in 1.5 KiB of state per group. */
  val K = 64

  case class Item(h: Long, id: Long, v: Double)

  /** Keep the k items with the smallest (h, id) — a total order, so
    * the result is set-determined: commutative, associative, and
    * duplicate-tolerant (a row re-inserted into a full buffer lands in
    * the same place). */
  class BottomK(k: Int) extends Aggregator[Item, Seq[Item], Seq[Item]] {
    private def lt(a: Item, b: Item): Boolean = a.h < b.h || (a.h == b.h && a.id < b.id)
    override def zero: Seq[Item] = Vector.empty
    override def reduce(b: Seq[Item], a: Item): Seq[Item] =
      if (b.length == k && !lt(a, b.last)) b // O(1) reject: the common case once warm
      else ((b :+ a).distinct.sortWith(lt)).take(k)
    override def merge(x: Seq[Item], y: Seq[Item]): Seq[Item] = (x ++ y).distinct.sortWith(lt).take(k)
    override def finish(r: Seq[Item]): Seq[Item] = r
    override def bufferEncoder: ExpressionEncoder[Seq[Item]] = ExpressionEncoder[Seq[Item]]()
    override def outputEncoder: ExpressionEncoder[Seq[Item]] = ExpressionEncoder[Seq[Item]]()
  }

  private val bottomK = udaf(new BottomK(K), ExpressionEncoder[Item]())

  /** Engine-neutral row hash: the md5-60 family, salted per stream so
    * distinct metrics draw independent samples of the same rows. */
  def rowHash(metric: Column, id: Column): Column =
    conv(substring(md5(concat(lit("rsv:"), metric, lit(":"), id.cast("string"))), 1, 15), 16, 10).cast("long")

  /** Sketch a group: (groupCols..., h, id, v) — ≤ k rows per group
    * whatever the group size, built on the partial-agg path. */
  def sample(df: DataFrame, groupCols: Seq[String], hCol: Column, idCol: Column, vCol: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(bottomK(hCol, idCol, vCol).as("items"))
      .select(groupCols.map(col) :+ explode(col("items")).as("it"): _*)
      .select(groupCols.map(col) :+ col("it.h").as("h") :+ col("it.id").as("id") :+ col("it.v").as("v"): _*)

  /** Merge sketches over a coarser grouping — EXACTLY the sketch of
    * the concatenated inputs (same bottom-k rule over the union of
    * sample rows; rows shared by two sketches collapse because (h, id)
    * identifies them). */
  def merge(samples: DataFrame, groupCols: Seq[String]): DataFrame =
    samples
      .groupBy(groupCols.map(col): _*)
      .agg(bottomK(col("h"), col("id"), col("v")).as("items"))
      .select(groupCols.map(col) :+ explode(col("items")).as("it"): _*)
      .select(groupCols.map(col) :+ col("it.h").as("h") :+ col("it.id").as("id") :+ col("it.v").as("v"): _*)

  /** Per-group quantile estimates from a sketch: for each q, the
    * element at sorted index floor(q·(n−1)) of the n sample values —
    * a SELECTED element, no interpolation arithmetic to diverge
    * between engines. A group smaller than k has its whole population
    * in the sketch and the estimate is exact. */
  def quantiles(samples: DataFrame, groupCols: Seq[String], qs: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    samples
      .withColumn("rk", row_number().over(w.orderBy(col("v"), col("h"), col("id"))))
      .withColumn("n", count(lit(1)).over(w))
      .select(col("*"), explode(array(qs.map(lit): _*)).as("q"))
      .filter(col("rk") === floor(col("q") * (col("n") - 1)).cast("long") + 1)
      .select(groupCols.map(col) :+ col("q") :+ col("n").as("n_sample") :+ col("v").as("est"): _*)
  }

  /** ◆ Reservoir under the oracle, both regimes + the merge in one
    * result: per-event-type sketches of `value` over all events
    * (group ≫ k → genuine sampling) and over the event_id % 97 slice
    * (group < k → sketch IS the population, quantiles exact), plus a
    * `__all__` row per metric merged from the per-type sketches —
    * DuckDB recomputes the identical bottom-k rows and picks the
    * identical quantile elements. */
  def reservoirQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).filter($"value".isNotNull)
    val vals = ev
      .select($"event_type", lit("value_all").as("metric"), $"event_id".as("id"), $"value".as("v"))
      .union(
        ev.filter($"event_id" % 97 === 0)
          .select($"event_type", lit("value_97").as("metric"), $"event_id".as("id"), $"value".as("v"))
      )
      .withColumn("h", rowHash(col("metric"), col("id")))
    val sm = Staged.persist(sample(vals, Seq("event_type", "metric"), col("h"), col("id"), col("v")))
    val merged = merge(sm, Seq("metric"))
      .select(lit("__all__").as("event_type"), col("metric"), col("h"), col("id"), col("v"))
    quantiles(sm.unionByName(merged), Seq("event_type", "metric"), Seq(0.25, 0.5, 0.75, 0.9))
  }
}
