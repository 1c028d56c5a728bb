package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Priority sampling (Duffield, Lund & Thorup, "Priority sampling for
  * estimation of arbitrary subset sums", JACM 2007) — the WEIGHTED
  * fixed-size sample of the sketch family: k items drawn
  * probability-proportional-to-size, with a threshold τ that turns the
  * sample into an UNBIASED subset-sum estimator (ŵ = max(w, τ); any
  * subset's weight is estimated by summing its sampled members' ŵ —
  * the "sample 10k docs proportional to token count, then answer
  * weight questions about any slice" primitive of a corpus budget).
  * [[Reservoir]] samples uniformly; q_weighted_sample keeps a
  * RANDOM-SIZE Bernoulli sample; this one holds k fixed AND weights.
  *
  * Each item gets priority p = w/u for a hash-uniform u ∈ (0,1); the
  * sketch keeps the k+1 LARGEST priorities (top-(k+1) under a total
  * order — order-insensitive, so per-shard sketches merge EXACTLY and
  * the sketch is a pure function of the input set). τ = the (k+1)-th
  * priority; the k above it are the sample. DETERMINISM: u rides as
  * the odd integer 2·u6+1 (u6 = md5-60 mod 10^6) and p = w·10^6·2 /
  * (2·u6+1) is ONE multiply and ONE divide — correctly-rounded IEEE
  * ops any engine reproduces bit-for-bit; no ln/pow in the hot path
  * (the A-ES exponential-race form needs ln; priorities don't).
  *
  * Scale shape: the (k+1)-bounded buffer rides the partial-agg path —
  * sketch-sized shuffle, O(1) reject once warm.
  */
object Priority {

  /** k = 32 sampled items per group (+1 retained for τ). */
  val K = 32

  case class Item(p: Double, id: Long, w: Long)

  /** Keep the k+1 items with the LARGEST (p, id-desc-tie) — a total
    * order, set-determined, duplicate-tolerant. */
  class TopK(k: Int) extends Aggregator[Item, Seq[Item], Seq[Item]] {
    private def gt(a: Item, b: Item): Boolean = a.p > b.p || (a.p == b.p && a.id < b.id)
    override def zero: Seq[Item] = Vector.empty
    override def reduce(b: Seq[Item], a: Item): Seq[Item] =
      if (b.length == k && !gt(a, b.last)) b // O(1) reject once warm
      else ((b :+ a).distinct.sortWith(gt)).take(k)
    override def merge(x: Seq[Item], y: Seq[Item]): Seq[Item] = (x ++ y).distinct.sortWith(gt).take(k)
    override def finish(r: Seq[Item]): Seq[Item] = r
    override def bufferEncoder: ExpressionEncoder[Seq[Item]] = ExpressionEncoder[Seq[Item]]()
    override def outputEncoder: ExpressionEncoder[Seq[Item]] = ExpressionEncoder[Seq[Item]]()
  }

  private val topK = udaf(new TopK(K + 1), ExpressionEncoder[Item]())

  /** p = w · 2·10^6 / (2·u6+1): strictly decreasing in u6, scales with
    * w, and exactly reproducible (two IEEE ops on exact integers). */
  def priority(salt: String, id: Column, w: Column): Column = {
    val u6 = conv(substring(md5(concat(lit(s"ps:$salt:"), id.cast("string"))), 1, 15), 16, 10)
      .cast("long") % 1000000L
    w.cast("double") * lit(2000000.0) / (u6 * 2L + 1L).cast("double")
  }

  /** Sketch: (groupCols..., p, id, w) — the k+1 largest-priority rows
    * per group, built on the partial-agg path. */
  def sketch(df: DataFrame, groupCols: Seq[String], pCol: Column, idCol: Column, wCol: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(topK(pCol, idCol, wCol).as("items"))
      .select(groupCols.map(col) :+ explode(col("items")).as("it"): _*)
      .select(groupCols.map(col) :+ col("it.p").as("p") :+ col("it.id").as("id") :+ col("it.w").as("w"): _*)

  /** Merge per-shard sketches over a coarser grouping — EXACTLY the
    * sketch of the concatenated inputs. */
  def merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches
      .groupBy(groupCols.map(col): _*)
      .agg(topK(col("p"), col("id"), col("w")).as("items"))
      .select(groupCols.map(col) :+ explode(col("items")).as("it"): _*)
      .select(groupCols.map(col) :+ col("it.p").as("p") :+ col("it.id").as("id") :+ col("it.w").as("w"): _*)

  /** Extract the estimator: the top-k rows with τ = the (k+1)-th
    * priority (0 when the group is smaller — every item sampled,
    * estimates exact) and the Horvitz–Thompson adjusted weight
    * ŵ = max(w, τ). Windows run over SKETCH rows (≤ k+1 per group). */
  def sample(sk: DataFrame, groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(groupCols.map(col): _*).orderBy(col("p").desc, col("id").asc)
    sk.withColumn("rk", row_number().over(win))
      .withColumn("tau", coalesce(max(when(col("rk") === K + 1, col("p"))).over(win.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)), lit(0.0)))
      .filter(col("rk") <= K)
      .select(
        groupCols.map(col) :+ col("rk") :+ col("id") :+ col("w") :+
          round(greatest(col("w").cast("double"), col("tau")), 6).as("est_w"): _*
      )
  }

  /** ◆ Priority sampling under the oracle, both branches + the merge:
    * per-source token-weighted document samples (sources ≫ k →
    * sampling branch with a live τ), a `tiny` stream (doc_id < 20 →
    * exhaustive branch, τ = 0, estimates exact), and the `__all__`
    * row merged from the per-source sketches — every priority, rank,
    * τ and adjusted weight re-derived by DuckDB on identical IEEE
    * arithmetic. */
  def priorityQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables
      .documentsWide(s, dir)
      // same token rule as q_weighted_sample's oracle: \w+ over lower(text)
      .select($"source", $"doc_id", size(regexp_extract_all(lower($"text"), lit("\\w+"), lit(0))).cast("long").as("n_tok"))
      .filter($"n_tok" > 0)
    val base = docs
      .unionByName(docs.filter($"doc_id" < 20).select(lit("tiny").as("source"), $"doc_id", $"n_tok"))
      .withColumn("p", priority("tok", $"doc_id", $"n_tok"))
    val sk = Staged.persist(sketch(base, Seq("source"), col("p"), col("doc_id"), col("n_tok")))
    val all = merge(sk.filter($"source" =!= "tiny"), Nil)
      .select(lit("__all__").as("source"), col("p"), col("id"), col("w"))
    sample(sk.unionByName(all), Seq("source"))
      .select($"source", $"rk", $"id".as("doc_id"), $"w".as("n_tok"), $"est_w")
  }
}
