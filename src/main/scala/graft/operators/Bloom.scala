package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed Bloom filter — the "have we seen this key" membership
  * primitive of a 100 TB ingest pipeline (URL dedup, content-hash
  * dedup, eval-set blocklists) when the exact key set is too large to
  * join every batch. Classic double hashing (Kirsch–Mitzenmacher: the
  * k probe positions are h1 + i·h2 mod m), md5-derived 60-bit hashes —
  * the engine-neutral family used everywhere else — and a relational
  * layout: the filter IS a (bucket, bits) DataFrame of 32-bit words
  * (32 keeps every shift engine-safe: a 64-bit word needs 1<<63, which
  * signed engines reject), built by one `bit_or` partial aggregation
  * and probed by one join. No driver-side bitset, so m scales to
  * billions of bits; a small filter broadcasts on its own under AQE.
  *
  * Bloom guarantee, preserved exactly: membership says MAYBE (possible
  * false positives, rate (1−e^{−kn/m})^k) but never misses an inserted
  * key (zero false negatives) — BloomSpec gates both sides.
  */
object Bloom {

  private def h1(key: Column): Column =
    conv(substring(md5(key), 1, 15), 16, 10).cast("long")

  private def h2(key: Column): Column =
    conv(substring(md5(concat(lit("salt2:"), key)), 1, 15), 16, 10).cast("long")

  /** The k probe positions of a key in an m-bit filter (array column).
    * h1 + i·h2 stays under 2^62 for k ≤ 4 60-bit hashes — no overflow
    * before the mod. k is a plan-time constant, so the array unrolls
    * (codegen'd, with h1/h2 CSE-shared) instead of a higher-order
    * transform lambda that would drop the projection to interpreted
    * eval. */
  def positions(key: Column, m: Int, k: Int): Column =
    array((0 until k).map(i => (h1(key) + lit(i.toLong) * h2(key)) % m): _*)

  /** Build the filter over a key column: (bucket, bits) 32-bit words,
    * one explode + one bit_or partial agg — the map-side combine does
    * most of the OR-ing before the shuffle. */
  def build(keys: DataFrame, keyCol: String, m: Int, k: Int): DataFrame =
    keys
      .select(explode(positions(col(keyCol), m, k)).as("p"))
      .select(
        (col("p") / 32).cast("long").as("bucket"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("b")
      )
      .groupBy("bucket")
      .agg(bit_or(col("b")).as("bits"))

  /** Probe every row of `probes`: adds a `maybe` column (1 = possibly
    * seen, 0 = definitely not). A probe is a hit iff ALL k bits are
    * set; the left join makes an absent word an automatic miss. */
  def contains(filter: DataFrame, probes: DataFrame, keyCol: String, m: Int, k: Int): DataFrame = {
    val cols = probes.columns
    val exploded = probes
      .select(col("*"), explode(positions(col(keyCol), m, k)).as("p"))
      .select(col("*"), (col("p") / 32).cast("long").as("bucket"))
    exploded
      .join(filter, Seq("bucket"), "left")
      .select(
        cols.map(col) :+
          when(col("bits").isNotNull && expr("(bits >> CAST(p % 32 AS INT)) & 1") === 1, 1L)
            .otherwise(0L)
            .as("bit_set"): _*
      )
      .groupBy(cols.map(col): _*)
      .agg(min(col("bit_set")).as("maybe"))
  }

  /** The md5-60 hash pair evaluated driver/executor-side — EXACTLY the
    * integer semantics of the [[h1]]/[[h2]] column expressions (hex
    * md5, first 15 nibbles, base-16 parse), so the closure probe and
    * the relational probe agree bit for bit. The first 15 hex nibbles
    * are the digest's top 60 bits, read straight off the bytes — no
    * hex string is materialized (this runs twice per probed row). */
  private val md5Local = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private def jvmHash60(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Scan-side probe: collect the (bounded, m/32-word) filter into a
    * closure array and test all k bits per row — NO join, NO shuffle,
    * the fact scan is pruned in place. This is the 100 TB semi-join
    * pattern: build the filter from the small side's keys, broadcast
    * it into the big side's scan, and only survivors (true matches +
    * the bounded false-positive overhead) reach the exact join's
    * shuffle. The relational [[contains]] stays the oracle surface;
    * BloomSpec gates that both paths answer identically. */
  def probe(filter: DataFrame, m: Int, k: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val words = new Array[Long](m / 32)
    filter.collect().foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    udf { key: String =>
      val a = jvmHash60(key)
      val b = jvmHash60("salt2:" + key)
      var i = 0
      var hit = true
      while (i < k && hit) {
        val p = (a + i * b) % m
        hit = ((words((p / 32).toInt) >> (p % 32).toInt) & 1L) == 1L
        i += 1
      }
      if (hit) 1L else 0L
    }
  }

  /** ◆ Bloom-pruned aggregation under the oracle: build the filter
    * from a dim key set (user_id % 37 = 0), prune the events fact
    * stream scan-side, and report per event type both the pruned
    * count and the exact count — the false-positive overhead the
    * sizing admits is visible as their difference, and every bit
    * decision is re-derived by DuckDB. */
  def bloomJoinQuery(s: SparkSession, dir: String, m: Int = 4096, k: Int = 3): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"event_type", concat(lit("u:"), $"user_id".cast("string")).as("key"))
    val dimKeys = ev.select($"key").distinct().filter(expr("CAST(substr(key, 3) AS BIGINT) % 37 = 0"))
    val pass = probe(build(dimKeys, "key", m, k), m, k)
    ev.withColumn("maybe", pass($"key"))
      .withColumn("exact", when(expr("CAST(substr(key, 3) AS BIGINT) % 37 = 0"), 1L).otherwise(0L))
      .groupBy($"event_type")
      .agg(sum($"maybe").as("n_bloom_pass"), sum($"exact").as("n_exact"))
  }

  /** ◆ Bloom membership under the oracle: filter built over the keys
    * of doc_id < 400, probed with doc_id < 500 — every per-probe
    * decision (including any false positive the sizing admits) is
    * re-derived by DuckDB bit for bit. */
  def bloomQuery(s: SparkSession, dir: String, m: Int = 65536, k: Int = 4): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val seen = docs.filter($"doc_id" < 400).select(concat(lit("doc:"), $"doc_id".cast("string")).as("key"))
    val probes = docs
      .filter($"doc_id" < 500)
      .select(concat(lit("doc:"), $"doc_id".cast("string")).as("key"), ($"doc_id" < 400).as("truly_seen"))
    val filt = build(seen, "key", m, k)
    contains(filt, probes, "key", m, k).orderBy($"key")
  }
}
