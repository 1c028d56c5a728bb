package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Incremental aggregate maintenance — keep a per-key rollup current
  * under arriving batches WITHOUT rescanning the base (the reference's
  * rescan/sync loop maintains its index the same way: fold the delta
  * in, never re-walk the estate). The state carries the mergeable
  * components (n, sum, min, max — the classic partial-agg algebra);
  * folding a delta is `merge(state, aggState(delta))`, and any derived
  * measure (avg) projects from the state at read time. At 100 TB the
  * difference is a full-table shuffle per refresh vs a delta-sized
  * one: state ⋈ delta-agg, both key-partitioned.
  *
  * `merge` is associative and commutative (sums of sums, min of mins),
  * so batches fold in any order and partial states from independent
  * shards combine exactly — the spec proves the law on arbitrary
  * splits.
  */
object Incremental {

  /** Mergeable per-key state: (key, n, sum, vmin, vmax). */
  def aggState(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol)).as("vsum"),
        min(col(valueCol)).as("vmin"),
        max(col(valueCol)).as("vmax")
      )

  /** Fold two states — exact: merge(aggState(a), aggState(b)) =
    * aggState(a ∪ b). */
  def merge(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.union(b)
      .groupBy(col(key))
      .agg(
        sum(col("n")).as("n"),
        sum(col("vsum")).as("vsum"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax")
      )

  /** ◆ q_incr_agg — 80 % of events stand in for the maintained state,
    * the other 20 % arrive as the delta; the folded state must equal
    * the full recompute (the oracle aggregates everything directly). */
  def incrAggQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsRaw(s, dir)
    val base = ev.filter(col("event_id") % 10 < 8)
    val delta = ev.filter(col("event_id") % 10 >= 8)
    merge(aggState(base, "user_id", "value"), aggState(delta, "user_id", "value"), "user_id")
      .select(
        col("user_id"),
        col("n"),
        round(col("vsum"), 4).as("sum_value"),
        col("vmin").as("min_value"),
        col("vmax").as("max_value"),
        // avg derives from the ROUNDED sum: the raw two-phase sum can
        // differ from a direct sum by an ulp, and an ulp straddling
        // the 6dp boundary flips the rounded avg; the 4dp sum is
        // boundary-safe (2-decimal inputs) and bit-identical in both
        // engines, so the quotient is too
        round(round(col("vsum"), 4) / col("n"), 6).as("avg_value")
      )
  }
}
