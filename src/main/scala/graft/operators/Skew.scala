package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

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
  *
  * For JOINS where neither side broadcasts, [[saltedJoin]] is the
  * classic hot-key split: detect the heavy keys from a deterministic
  * hash sample of the fact side, spread their fact rows over nSalts
  * sub-keys, replicate ONLY the matching dim rows nSalts times, and
  * equi-join on (key, salt). Cold keys pay nothing (salt 0, one dim
  * copy); the hot key's single 75 %-of-the-table partition becomes
  * nSalts average ones. This is the manual fallback for the shapes
  * AQE's skew-join split cannot rescue (e.g. a skewed join feeding a
  * same-key aggregation, where the runtime split would break the
  * co-partitioning).
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

  /** Hot keys of `df` under `keyCol`, estimated from a deterministic
    * 1-in-`sampleMod` hash sample (no full-table agg: at 100 TB the
    * detection pass reads the one key column and keeps 1/sampleMod of
    * it; output is sketch-sized — only keys above the threshold).
    * `hotThreshold` is in SAMPLED rows: a key is hot when its sample
    * count ≥ hotThreshold, i.e. ~hotThreshold·sampleMod true rows. */
  def hotKeys(df: DataFrame, keyCol: String, idCol: Column, hotThreshold: Long, sampleMod: Int): DataFrame =
    df.filter(pmod(xxhash64(idCol), lit(sampleMod)) === 0)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= hotThreshold)
      .select(col(keyCol), lit(true).as("__hot"))

  /** Inner equi-join of `fact` and `dim` on `keyCol`, with the hot
    * keys' rows spread over `nSalts` sub-partitions. Result equals the
    * plain inner join for ANY hot-key set (hot/cold only moves rows
    * between sub-keys), so the detection threshold is purely a
    * performance knob. `idCol` must be a deterministic per-row
    * expression on `fact` (drives both the sample and the salt). */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keyCol: String,
      idCol: Column,
      nSalts: Int = 16,
      hotThreshold: Long = 1000L,
      sampleMod: Int = 100
  ): DataFrame = {
    val hot = hotKeys(fact, keyCol, idCol, hotThreshold, sampleMod)
    val saltedFact = fact
      .join(broadcast(hot), Seq(keyCol), "left")
      .withColumn("__salt", when(col("__hot"), salt(idCol, nSalts)).otherwise(lit(0)))
      .drop("__hot")
    val saltedDim = dim
      .join(broadcast(hot), Seq(keyCol), "left")
      .withColumn(
        "__salts",
        when(col("__hot"), sequence(lit(0), lit(nSalts - 1))).otherwise(array(lit(0)))
      )
      .withColumn("__salt", explode(col("__salts")))
      .drop("__salts", "__hot")
    saltedFact.join(saltedDim, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** ◆ q_salted_agg — salted two-phase aggregation over lineitem's
    * 3-value `l_returnflag` domain (each key holds ~⅓ of the table: the
    * textbook hot-key aggregation). Equals the direct GROUP BY. */
  def saltedAggQuery(s: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(s, dir)
      .withColumn("__id", concat(col("l_orderkey"), lit(":"), col("l_linenumber")))
    saltedCountSum(li, "l_returnflag", "__id", "l_quantity", nSalts = 16)
      .select(col("l_returnflag"), col("n"), round(col("sum_value"), 2).as("sum_qty"))
  }

  /** ◆ q_salted_join — hot-key split join. The derived key sends 75 %
    * of lineitem to nation 7 (a deliberately skewed foreign key); the
    * salted join spreads that key over 16 sub-keys and still matches
    * the plain join + rollup exactly. */
  def saltedJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables
      .lineitem(s, dir)
      .withColumn(
        "n_nationkey",
        when(pmod(col("l_orderkey"), lit(4)) < 3, lit(7L)).otherwise(pmod(col("l_orderkey"), lit(25)))
      )
    val dim = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    val rowId = concat(col("l_orderkey"), lit(":"), col("l_linenumber"))
    saltedJoin(fact, dim, "n_nationkey", rowId, nSalts = 16, hotThreshold = 10L, sampleMod = 100)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))
      .select(col("n_name"), col("n"), round(col("s"), 2).as("sum_qty"))
  }
}
