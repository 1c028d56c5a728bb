package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the frequency
  * member of the sketch family ([[Hll]] answers "how many distinct",
  * [[Bloom]] "have we seen it", [[Reservoir]] "what does it look
  * like"; this one answers "how OFTEN", the token/URL/ngram frequency
  * question a 100 TB corpus asks constantly, e.g. stop-word discovery
  * and boilerplate heavy-hitters, where an exact count table would be
  * vocabulary-sized). d independent hash rows × w counters per group:
  * a key increments one counter per row, a point query takes the MIN
  * over its d counters — an overestimate, NEVER an underestimate
  * (collisions only add), within εN w.h.p. at w = ⌈e/ε⌉.
  *
  * Relational layout, the [[Hll]] pattern: the sketch IS a
  * (group, i, bucket, cnt) DataFrame built by one explode + count
  * partial agg — map-side combine collapses each partition to
  * ≤ d·w rows per group before the shuffle — and merging per-shard
  * sketches is an elementwise SUM, which is EXACT (integer adds in
  * any order), so stream/batch/shard sketches compose freely.
  * Hashes are the engine-neutral md5-60 family, one salt per row.
  */
object CountMin {

  /** d = 4 rows × w = 1024 counters: ε ≈ e/1024 ≈ 0.27% of the stream
    * length per estimate, failure probability e^-4 ≈ 1.8%. */
  val D = 4
  val W = 1024

  private def hashAt(i: Int, key: Column): Column =
    conv(substring(md5(concat(lit(s"cm$i:"), key)), 1, 15), 16, 10).cast("long") % W

  /** All d (row, bucket) probe positions of a key. */
  private def positions(key: Column): Column =
    array((0 until D).map(i => struct(lit(i).as("i"), hashAt(i, key).as("bucket"))): _*)

  /** Sketch a key column per group: (groupCols..., i, bucket, cnt) —
    * ≤ d·w rows per group whatever the stream length, all on the
    * partial-agg path. Order-insensitive, so the same code maintains
    * the sketch under Structured Streaming. */
  def sketch(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame =
    df.select(groupCols.map(col) :+ explode(positions(col(keyCol))).as("p"): _*)
      .groupBy(groupCols.map(col) :+ col("p.i").as("i") :+ col("p.bucket").as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** [[sketch]] over pre-aggregated (key, weight) rows: a key with
    * weight n increments the same d counters by n, so the counters
    * equal [[sketch]] of the exploded stream EXACTLY — but the d md5
    * probes are paid once per DISTINCT key instead of once per
    * occurrence (the occurrence→distinct aggregation is a plain
    * partial-agg shuffle; the hash family is the expensive part). */
  def sketchWeighted(df: DataFrame, groupCols: Seq[String], keyCol: String, weightCol: String): DataFrame =
    df.select(groupCols.map(col) ++ Seq(col(weightCol).as("__w"), explode(positions(col(keyCol))).as("p")): _*)
      .groupBy(groupCols.map(col) :+ col("p.i").as("i") :+ col("p.bucket").as("bucket"): _*)
      .agg(sum(col("__w")).as("cnt"))

  /** Merge sketches by counter-wise sum over a coarser grouping —
    * EXACTLY the sketch of the concatenated inputs. */
  def merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches
      .groupBy(groupCols.map(col) :+ col("i") :+ col("bucket"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-query a probe set against every group: min over the d
    * counters (absent counter = 0). The probe frame is
    * distinct-key-sized; the join against the sketch is
    * sketch-bounded, never stream-bounded. */
  def estimate(sk: DataFrame, groupCols: Seq[String], probes: DataFrame, keyCol: String): DataFrame = {
    val pb = probes
      .select(col(keyCol))
      .distinct()
      .select(col(keyCol), explode(positions(col(keyCol))).as("p"))
      .select(col(keyCol), col("p.i").as("i"), col("p.bucket").as("bucket"))
    sk.select(groupCols.map(col): _*)
      .distinct()
      .crossJoin(pb)
      .join(sk, groupCols ++ Seq("i", "bucket"), "left")
      .groupBy(groupCols.map(col) :+ col(keyCol): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }

  /** ◆ Count-Min under the oracle: per-source token-frequency sketch
    * over the documents table, point-queried with the distinct tokens
    * of doc 0, reported next to the exact count so the one-sided
    * error (cm_est ≥ true_cnt, equality off the collision paths) is
    * visible in the result — DuckDB re-derives every counter and every
    * min on identical integer math. */
  def cmQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables
      .documentsWide(s, dir)
      .select($"doc_id", $"source", explode(regexp_extract_all(lower($"text"), lit("\\w+"), lit(0))).as("tok"))
    val tokP = Staged.persist(toks)
    // occurrences → (source, tok, n) first: the 4-row md5 probe family
    // is then evaluated per DISTINCT (source, token), not per token
    // occurrence (~14x fewer md5s at sf0.1), and the exact-count side
    // reads the same table for free. Counters are identical
    // (sketchWeighted scaladoc; CountMinSpec pins the equality).
    val tokCounts = Staged.persist(
      tokP.groupBy($"source", $"tok").agg(count(lit(1)).as("n")))
    val sk = Staged.persist(sketchWeighted(tokCounts, Seq("source"), "tok", "n"))
    val probes = tokP.filter($"doc_id" === 0).select($"tok").distinct()
    val truth = tokCounts
      .join(probes, Seq("tok"), "left_semi")
      .select($"source", $"tok", $"n".as("true_cnt"))
    estimate(sk, Seq("source"), probes, "tok")
      .join(truth, Seq("source", "tok"), "left")
      .select($"source", $"tok", $"cm_est", coalesce($"true_cnt", lit(0L)).as("true_cnt"))
  }
}
