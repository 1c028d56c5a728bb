package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bucket-blocked interval-overlap join — the 1-D twin of
  * [[graft.geo.SpatialJoin]] and the operator Spark famously lacks: a
  * naive `a.s <= b.e AND b.s <= a.e` join plans a nested-loop over
  * the full cross product. Blocking by fixed time buckets turns it
  * into a plain equi-join: each interval explodes to the buckets it
  * covers (bounded by len/bucket + 2 rows), candidates meet only
  * inside a shared bucket, the exact overlap predicate verifies, and
  * the pair that shares SEVERAL buckets is emitted exactly once by
  * the standard first-common-bucket rule — the bucket that contains
  * `greatest(a.s, b.s)` — so there is no distinct/dedup shuffle over
  * the pair stream. Wall time is linear in candidates per bucket ×
  * buckets; a hot bucket is ordinary AQE join skew, not a plan
  * change.
  */
object IntervalJoin {

  /** Pairs of overlapping intervals between `a(id, s, e, ...)` and
    * `b(id, s, e, ...)` (closed-interval overlap, integer endpoints).
    * Returns one row per overlapping (a, b) pair with both payloads
    * prefixed `a_`/`b_`. `antiReflexive` additionally requires
    * a.id < b.id — the self-join form. */
  def overlapPairs(a: DataFrame, b: DataFrame, bucketSize: Long, antiReflexive: Boolean = false): DataFrame = {
    // `div`, not `/`: Column `/` on longs is DOUBLE division
    def exploded(df: DataFrame, pfx: String) =
      df.columns
        .foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$pfx$c"))
        .withColumn("bk", explode(sequence(expr(s"${pfx}s div $bucketSize"), expr(s"${pfx}e div $bucketSize"))))
    val ea = exploded(a, "a_")
    val eb = exploded(b, "b_")
    val overlap = col("a_s") <= col("b_e") && col("b_s") <= col("a_e")
    val firstBucket = col("bk") === expr(s"greatest(a_s, b_s) div $bucketSize")
    val pairPred = if (antiReflexive) overlap && col("a_id") < col("b_id") else overlap
    ea.join(eb, Seq("bk")).filter(pairPred && firstBucket).drop("bk")
  }

  /** ◆ Concurrent-event pairs under the oracle: deterministic integer
    * intervals [ts_sec, ts_sec + event_id%600 + 1] per event, blocked
    * self-join at 1024 s buckets, rolled up per (type_a, type_b) with
    * an id-sum checksum — DuckDB verifies with its own direct range
    * join (IEJoin), so the blocked plan is checked against a genuinely
    * different algorithm. */
  def intervalQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val iv = Tables
      .eventsRaw(s, dir)
      .select(
        $"event_id".as("id"),
        $"event_type".as("typ"),
        expr("ts div 1000000").as("s"),
        (expr("ts div 1000000") + $"event_id" % 600 + 1).as("e")
      )
    val ivP = Staged.persist(iv) // both sides of the self-join read it
    overlapPairs(ivP, ivP, bucketSize = 1024L, antiReflexive = true)
      .groupBy($"a_typ".as("type_a"), $"b_typ".as("type_b"))
      .agg(count(lit(1)).as("n_pairs"), sum($"a_id" + $"b_id").as("id_sum"))
  }
}
