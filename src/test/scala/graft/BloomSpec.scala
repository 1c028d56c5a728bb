package graft

import org.apache.spark.sql.functions._

import graft.operators.Bloom

/** Bloom-filter membership: the one-sided error contract (never a
  * false negative; false positives at the sized rate), the 32-bit word
  * layout, and occupancy bounds.
  */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  private def keysDf(n: Int, prefix: String) =
    spark.range(n).select(concat(lit(prefix), col("id").cast("string")).as("key"))

  test("no false negatives, and a well-sized filter stays clean on unseen probes") {
    val m = 1 << 16; val k = 4
    val inserted = keysDf(500, "k")
    val filt = Bloom.build(inserted, "key", m, k)
    val onInserted = Bloom.contains(filt, inserted, "key", m, k)
    assert(onInserted.filter($"maybe" === 0).count() === 0, "an inserted key can NEVER miss")
    // m/n = 131: FPR ~ (1-e^{-4*500/65536})^4 ~ 8e-7 — zero expected on 2000 probes
    val unseen = keysDf(2000, "other")
    val fp = Bloom.contains(filt, unseen, "key", m, k).filter($"maybe" === 1).count()
    assert(fp === 0, s"well-sized filter produced $fp false positives")
  }

  test("an undersized filter trades false positives, never false negatives") {
    val m = 4096; val k = 4
    val inserted = keysDf(400, "k")
    val filt = Bloom.build(inserted, "key", m, k)
    assert(Bloom.contains(filt, inserted, "key", m, k).filter($"maybe" === 0).count() === 0)
    // kn/m = 0.39 → FPR ≈ 1.2%; 2000 unseen probes make FPs certain,
    // deterministic hashes make the exact count stable
    val fp = Bloom.contains(filt, keysDf(2000, "other"), "key", m, k).filter($"maybe" === 1).count()
    assert(fp > 0, "undersized filter must show the one-sided error")
    assert(fp < 200, s"FP count $fp far above the sized rate")
  }

  test("word layout: buckets within range, occupancy bounded by k·n bits") {
    val m = 1 << 14; val k = 4; val n = 300
    val filt = Bloom.build(keysDf(n, "k"), "key", m, k).collect()
    assert(filt.forall(r => r.getLong(0) >= 0 && r.getLong(0) < m / 32), "bucket ids inside the m-bit filter")
    assert(filt.forall(r => (r.getLong(1) & 0xffffffff00000000L) === 0L), "only low 32 bits used per word")
    val popcount = filt.map(r => java.lang.Long.bitCount(r.getLong(1))).sum
    assert(popcount > 0 && popcount <= n * k, s"occupancy $popcount exceeds k·n = ${n * k}")
  }

  test("closure probe == relational contains, bit for bit, and plans no join") {
    val m = 4096; val k = 3
    val filt = Bloom.build(keysDf(400, "key"), "key", m, k)
    val probes = keysDf(900, "key") // 400 inserted + 500 unseen
    val relational = Bloom
      .contains(filt, probes, "key", m, k)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val viaUdf = probes.withColumn("maybe", Bloom.probe(filt, m, k)(col("key")))
    val closure = viaUdf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(closure === relational, "the scan-side probe must reproduce the relational answers exactly")
    // the whole point of the closure path: the fact stream is pruned
    // in place — no join, no shuffle before the filter
    val plan = viaUdf.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Join"), s"closure probe must not plan a join:\n$plan")
  }
}
