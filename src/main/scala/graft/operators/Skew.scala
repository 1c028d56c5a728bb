package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot keys (SURVEY steering: salting for
  * skew; AQE covers skewed JOINs at runtime, but a skewed AGGREGATION
  * key still funnels every row of the hot key through one task's final
  * merge — salting splits that).
  *
  * Shape: add a deterministic salt → partial aggregate on (key, salt)
  * (runs as Spark's map-side partial agg, so the salt mostly bounds the
  * FINAL-stage partition sizes) → re-aggregate on the key. Associative
  * measures only (count/sum/min/max) — the two-phase split must
  * commute.
  */
object Skew {

  /** Deterministic per-row salt in [0, nSalts): hash of the whole row's
    * stable id expression. */
  def salt(idCol: Column, nSalts: Int): Column = pmod(xxhash64(idCol), lit(nSalts))

  /** Two-phase salted count+sum per key — equals the direct
    * groupBy(key) result for any salt count. */
  def saltedCountSum(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      sumCol: String,
      nSalts: Int = 16
  ): DataFrame =
    df.withColumn("__salt", salt(col(idCol), nSalts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_value"))
}
