package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Theta sketch (KMV form — Bar-Yossef et al. 2002; Dasgupta et al.
  * 2016 "A framework for estimating stream expression cardinalities",
  * the DataSketches theta family) — distinct counting WITH SET
  * ALGEBRA, the operation [[Hll]] cannot do: per-day / per-segment
  * sketches support union AND intersection ("users who did A and B")
  * without re-reading data. A group's sketch is the k smallest
  * DISTINCT md5-60 value hashes; θ is the k-th smallest when the
  * sketch is full (2^60 otherwise), and the hashes below θ are a
  * uniform sample of the distinct values at inclusion rate θ/2^60:
  *   distinct ≈ (k−1) · 2^60 / θ          (full sketch)
  *   |A ∩ B| ≈ |{h ∈ A∩B : h < θ∩}| · 2^60 / θ∩,  θ∩ = min(θ_A, θ_B)
  * Deterministic end to end — the hash set is a pure function of the
  * value set, θ is integer, and the one estimate division is a fixed
  * IEEE double expression both engines evaluate identically.
  *
  * Scale shape: distinct-hash bottom-k rides a custom Aggregator on
  * the partial-agg path (k-bounded buffer per group per partition —
  * the shuffle is sketch-sized); set operations join k-row frames.
  */
object Theta {

  /** k = 64 retained hashes: relative standard error 1/√(k−2) ≈ 13%. */
  val K = 64

  /** 2^60 — the hash domain size (md5-60 family). */
  val Domain = 1152921504606846976L

  /** Bottom-k DISTINCT longs — order-insensitive and
    * duplicate-tolerant, so the sketch is set-determined and merge ==
    * re-sketch exactly. */
  class BottomKLong(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], a: Long): Seq[Long] =
      if (b.length == k && a >= b.last) b // O(1) reject once warm
      else ((b :+ a).distinct.sorted).take(k)
    override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = (x ++ y).distinct.sorted.take(k)
    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: ExpressionEncoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: ExpressionEncoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  private val bottomK = udaf(new BottomKLong(K), ExpressionEncoder[Long]())

  /** Engine-neutral value hash (salted so distinct theta streams are
    * independent). */
  def valueHash(salt: String, v: Column): Column =
    conv(substring(md5(concat(lit(s"th:$salt:"), v.cast("string"))), 1, 15), 16, 10).cast("long")

  /** Sketch a value column per group: (groupCols..., h) — ≤ k rows
    * per group, the k smallest distinct value hashes. */
  def sketch(df: DataFrame, groupCols: Seq[String], hCol: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(bottomK(hCol).as("hs"))
      .select(groupCols.map(col) :+ explode(col("hs")).as("h"): _*)

  /** Union-merge sketches over a coarser grouping — EXACTLY the
    * sketch of the concatenated value streams. */
  def merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches
      .groupBy(groupCols.map(col): _*)
      .agg(bottomK(col("h")).as("hs"))
      .select(groupCols.map(col) :+ explode(col("hs")).as("h"): _*)

  /** θ of each group: the k-th smallest retained hash when the sketch
    * is full, else the whole domain — (groupCols..., n_retained,
    * theta). */
  def theta(sk: DataFrame, groupCols: Seq[String]): DataFrame =
    sk.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_retained"), max(col("h")).as("hmax"))
      .select(
        groupCols.map(col) :+ col("n_retained") :+
          when(col("n_retained") === K, col("hmax")).otherwise(lit(Domain)).as("theta"): _*
      )

  /** Distinct-count estimate per group: exact below k, (k−1)·2^60/θ at
    * the estimation branch — one fixed double expression, rounded. */
  def estimate(sk: DataFrame, groupCols: Seq[String]): DataFrame =
    theta(sk, groupCols)
      .select(
        groupCols.map(col) :+ col("n_retained") :+
          when(col("n_retained") < K, col("n_retained").cast("double"))
            .otherwise(round(lit((K - 1).toDouble) * lit(Domain.toDouble) / col("theta"), 4))
            .as("theta_est"): _*
      )

  /** Pairwise intersection estimate between the sketches of groups `a`
    * and `b` (single group column): θ∩ = min(θ_a, θ_b), count the
    * common hashes below θ∩, scale by 2^60/θ∩. */
  def intersect(sk: DataFrame, groupCol: String, a: String, b: String): DataFrame = {
    val ta = theta(sk.filter(col(groupCol) === a), Nil).select(col("theta").as("theta_a"))
    val tb = theta(sk.filter(col(groupCol) === b), Nil).select(col("theta").as("theta_b"))
    val common = sk
      .filter(col(groupCol) === a)
      .select(col("h"))
      .join(sk.filter(col(groupCol) === b).select(col("h")), Seq("h"))
    common
      .crossJoin(broadcast(ta))
      .crossJoin(broadcast(tb))
      .select(col("h"), least(col("theta_a"), col("theta_b")).as("th"))
      .groupBy(col("th"))
      .agg(sum(when(col("h") < col("th"), 1L).otherwise(0L)).as("n_common"))
      .select(
        lit(a).as("set_a"),
        lit(b).as("set_b"),
        col("n_common"),
        round(col("n_common").cast("double") * lit(Domain.toDouble) / col("th"), 4).as("inter_est")
      )
  }

  /** ◆ Theta sketches under the oracle, all three branches in one
    * result: per-event-type user sketches (150 distinct users ≫ k →
    * estimation branch), a `small` stream (user_id < 40 → exact
    * branch), the `__all__` union-merge row, and the pairwise
    * intersections of the two largest event types — every retained
    * hash, θ, and estimate re-derived by DuckDB. */
  def thetaQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val users = ev.select($"event_type", valueHash("u", $"user_id").as("h"))
    val small = ev.filter($"user_id" < 40).select(lit("small").as("event_type"), valueHash("u", $"user_id").as("h"))
    val sk = Staged.persist(sketch(users.unionByName(small), Seq("event_type"), col("h")))
    val all = merge(sk.filter($"event_type" =!= "small"), Nil).select(lit("__all__").as("event_type"), col("h"))
    val ests = estimate(sk.unionByName(all), Seq("event_type"))
      .select($"event_type".as("set_a"), lit("").as("set_b"), $"n_retained".as("n"), $"theta_est".as("est"))
    val inters = intersect(sk, "event_type", "click", "view")
      .unionByName(intersect(sk, "event_type", "click", "purchase"))
      .select($"set_a", $"set_b", $"n_common".as("n"), $"inter_est".as("est"))
    ests.unionByName(inters)
  }
}
