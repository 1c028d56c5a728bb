package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Reservoir

/** Bottom-k reservoir sketch: the sketch must be a pure function of
  * the input SET — same rows regardless of partitioning or insertion
  * order — and merging per-shard sketches must equal re-sketching the
  * union bit-for-bit (the property that lets per-day sketches roll up
  * at 100 TB without re-reading data). Quantiles from an exhaustive
  * sketch (group smaller than k) must be exact.
  */
class ReservoirSpec extends SparkSuite {
  import spark.implicits._

  private def mkRows(n: Int, group: String): DataFrame =
    (0 until n)
      .map(i => (group, i.toLong + group.length * 100000L, (i * 37 % n).toDouble))
      .toDF("g", "id", "v")
      .withColumn("h", Reservoir.rowHash(col("g"), col("id")))

  private def key(df: DataFrame): Seq[(String, Long, Long, Double)] =
    df.select("g", "h", "id", "v").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq.sorted

  test("sketch is partitioning- and order-insensitive") {
    val rows = mkRows(500, "a")
    val base = key(Reservoir.sample(rows, Seq("g"), col("h"), col("id"), col("v")))
    assert(base.length === Reservoir.K)
    for (p <- Seq(1, 7, 32)) {
      val shuffled = rows.orderBy(rand(seed = p)).repartition(p)
      assert(key(Reservoir.sample(shuffled, Seq("g"), col("h"), col("id"), col("v"))) === base, s"parts=$p")
    }
  }

  test("merge of per-shard sketches == re-sketch of the union, bit for bit") {
    val a = mkRows(400, "a")
    val b = mkRows(300, "a").withColumn("id", col("id") + 1000000L).withColumn("h", Reservoir.rowHash(col("g"), col("id")))
    val skA = Reservoir.sample(a, Seq("g"), col("h"), col("id"), col("v"))
    val skB = Reservoir.sample(b, Seq("g"), col("h"), col("id"), col("v"))
    val merged = key(Reservoir.merge(skA.unionByName(skB), Seq("g")))
    val direct = key(Reservoir.sample(a.unionByName(b), Seq("g"), col("h"), col("id"), col("v")))
    assert(merged === direct)
    // idempotence: merging a sketch with itself changes nothing
    assert(key(Reservoir.merge(skA.unionByName(skA), Seq("g"))) === key(skA))
  }

  test("group smaller than k: sketch is exhaustive and quantiles are exact") {
    val small = mkRows(20, "s") // 20 < K=64; values are a permutation of 0..19
    val sk = Reservoir.sample(small, Seq("g"), col("h"), col("id"), col("v"))
    assert(sk.count() === 20)
    val qs = Reservoir
      .quantiles(sk, Seq("g"), Seq(0.25, 0.5, 0.75, 0.9))
      .collect()
      .map(r => r.getDouble(1) -> r.getDouble(3))
      .toMap
    // element at floor(q*(n-1)) of sorted 0..19
    assert(qs === Map(0.25 -> 4.0, 0.5 -> 9.0, 0.75 -> 14.0, 0.9 -> 17.0))
  }
}
