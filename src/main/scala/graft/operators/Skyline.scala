package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** 2-D skyline (Pareto frontier, Börzsönyi et al. ICDE 2001) — the
  * points not dominated in the maximize-both sense: b dominates a iff
  * b.p ≥ a.p ∧ b.d ≥ a.d with at least one strict. The multi-objective
  * "best tradeoffs" operator (price vs recency, quality vs length …).
  *
  * Exact 2-D rule: over DISTINCT points sorted (p desc, d desc), a
  * point is in the skyline iff its d strictly exceeds the running max
  * of d over all strictly-earlier rows — every earlier row has either
  * a strictly larger p, or an equal p with a strictly larger d, so
  * "some earlier d ≥ mine" is exactly "dominated"; later rows never
  * dominate. Duplicates are collapsed first (they never dominate each
  * other) and reported with their multiplicity.
  *
  * Scale shape — local-skyline-then-merge (the skyline-of-skylines
  * identity: every globally non-dominated point is non-dominated in
  * its bucket, so bucket sweeps give a SUPERSET of the answer):
  * phase 1 runs the sweep per hash bucket (a partitioned window);
  * phase 2 re-runs it once over the pruned union — for 2-D data the
  * local frontiers are tiny (O(log n) expected per bucket on
  * independent dims), so the one global window sees a bounded set,
  * the q_bm25/q_topk "window after the cut" discipline. Nothing is
  * ever pairwise-joined.
  */
object Skyline {

  /** pts(p, d, rid) → skyline rows (p, d, n_rows, min_rid). */
  def skyline(pts: DataFrame, buckets: Int = 64): DataFrame = {
    val dist = pts
      .groupBy(col("p"), col("d"))
      .agg(count(lit(1)).as("n_rows"), min(col("rid")).as("min_rid"))
    def sweep(df: DataFrame, part: Seq[org.apache.spark.sql.Column]): DataFrame = {
      val w = (if (part.isEmpty) Window.orderBy(col("p").desc, col("d").desc)
               else Window.partitionBy(part: _*).orderBy(col("p").desc, col("d").desc))
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn("mx", max(col("d")).over(w))
        .filter(col("mx").isNull || col("d") > col("mx"))
        .drop("mx")
    }
    val local = sweep(dist.withColumn("b", pmod(col("min_rid"), lit(buckets))), Seq(col("b")))
      .drop("b")
    sweep(local, Seq.empty)
  }

  /** ◆ q_skyline — best (total price, order date) tradeoffs among
    * urgent orders: no other urgent order is both more valuable and
    * more recent. Day = integer epoch-microsecond division, so both
    * engines share the boundary. */
  def skylineQuery(s: SparkSession, dir: String): DataFrame =
    skyline(
      Tables
        .orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(
          col("o_totalprice").as("p"),
          // parquet TIMESTAMP is NTZ here; the session runs UTC, so the
          // cast reads the same instant DuckDB's epoch_us sees
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("d"),
          col("o_orderkey").as("rid")
        )
    ).select(col("p").as("price"), col("d").as("order_day"), col("n_rows"), col("min_rid").as("min_orderkey"))
}
