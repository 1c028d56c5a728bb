package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed HyperLogLog — the cardinality twin of [[Bloom]]:
  * "how many distinct keys" at 100 TB (vocabulary size, distinct URLs,
  * unique users) where an exact `count(distinct)` shuffles every key.
  * The sketch is a fixed m = 2^p integer registers per group, built by
  * one `max` partial aggregation — map-side combine collapses each
  * partition to ≤ m rows before the shuffle, so the shuffle volume is
  * sketch-sized, not data-sized — and register-wise `max` MERGES two
  * sketches exactly (the property that lets per-day / per-shard
  * sketches roll up without re-reading data; HllSpec proves merge ==
  * re-sketch bit-for-bit).
  *
  * Engine-neutral by construction (Flajolet et al. 2007 analysis is
  * bit-pattern-agnostic): the md5-60 hash family used everywhere else,
  * register index = low p bits, and the geometric observable is the
  * TRAILING-zero rank of the remaining 51 bits (same 2^-k law as the
  * leading-zero form, but computable as pure integer math in any
  * engine: `w & -w` isolates the lowest set bit, an exact power of two
  * whose log2 round-trips through a double losslessly). The harmonic
  * denominator Σ 2^-M_j is kept EXACT as the scaled integer
  * Σ 2^(52-M_j) — order-independent BIGINT addition, no float
  * accumulation order to diverge between engines — with one double
  * division at the end. Standard bias correction: linear counting
  * (m·ln(m/V)) below 2.5m when empty registers remain.
  */
object Hll {

  /** p = 9 → m = 512 registers: ±1.04/√512 ≈ 4.6% standard error at
    * 4 KiB of state per group. */
  val P = 9
  val M = 512

  /** Trailing-zero rank caps at the 51 post-index bits + 1. */
  val MaxRho = 52

  private def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** (register index j, rank rho) of one hashed value. */
  private def jRho(h: Column): (Column, Column) = {
    val j = h % M
    // integer shift, NOT floor(h/M): `/` is double division and a
    // 60-bit hash overflows a 53-bit mantissa — the low (trailing-rank)
    // bits would be garbage
    val w = shiftright(h, P)
    val rho = when(w === 0, lit(MaxRho))
      .otherwise((round(log2(w.bitwiseAND(-w))).cast("int") + 1))
    (j, rho)
  }

  /** Sketch a value column per group: the (groupCols..., j, reg_max)
    * register table — ≤ m rows per group whatever the cardinality, all
    * on the partial-agg path. */
  def registers(df: DataFrame, groupCols: Seq[String], valCol: String): DataFrame = {
    val (j, rho) = jRho(hash60(col(valCol)))
    df.select(groupCols.map(col) :+ j.as("j") :+ rho.as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("j"): _*)
      .agg(max(col("rho")).as("reg_max"))
  }

  /** Merge sketches by register-wise max over a coarser grouping —
    * EXACTLY the sketch of the concatenated inputs (HllSpec gates
    * bit-for-bit equality vs re-sketching). */
  def merge(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs
      .groupBy(groupCols.map(col) :+ col("j"): _*)
      .agg(max(col("reg_max")).as("reg_max"))

  /** Collapse a register table to per-group estimates:
    * (groupCols..., present, hll_est). The harmonic sum rides as the
    * exact integer Σ 2^(52-M_j); absent registers contribute 2^52
    * each (rho = 0). */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val alpha = 0.7213 / (1 + 1.079 / M) // standard m >= 128 constant
    val sTotal = col("s_present") + (lit(M.toLong) - col("present")) * lit(1L << MaxRho)
    val zeros = (lit(M.toLong) - col("present")).cast("double")
    val raw = lit(alpha * M.toDouble * M.toDouble) * lit((1L << MaxRho).toDouble) / sTotal
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("present"),
        sum(expr(s"shiftleft(cast(1 as bigint), $MaxRho - reg_max)")).as("s_present")
      )
      .select(
        groupCols.map(col) :+
          col("present") :+
          round(
            when(raw <= 2.5 * M && zeros > 0, lit(M.toDouble) * log(lit(M.toDouble) / zeros))
              .otherwise(raw),
            4
          ).as("hll_est"): _*
      )
  }

  /** ◆ HLL under the oracle, both correction branches + the merge in
    * one result: per-event-type sketches of `event_id` (cardinality
    * ~2000/group → raw estimator) and `user_id` (150 distinct →
    * linear-counting branch), plus a `__all__` row per metric merged
    * from the per-group registers by register-wise max — DuckDB
    * re-derives every register and both estimates on the same integer
    * math. */
  def hllQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val vals = ev
      .select($"event_type", lit("event_ids").as("metric"), $"event_id".cast("string").as("val"))
      .union(ev.select($"event_type", lit("users").as("metric"), $"user_id".cast("string").as("val")))
    val regs = Staged.persist(registers(vals, Seq("event_type", "metric"), "val"))
    val merged = merge(regs, Seq("metric")).select(lit("__all__").as("event_type"), $"metric", $"j", $"reg_max")
    estimate(regs.unionByName(merged), Seq("event_type", "metric"))
  }
}
