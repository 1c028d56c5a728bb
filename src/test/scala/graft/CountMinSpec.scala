package graft

import org.apache.spark.sql.functions._

import graft.operators.CountMin

/** Count-Min sketch: merging per-shard sketches must equal
  * re-sketching the union exactly (integer counter sums), point
  * queries must NEVER underestimate (collisions only add), and on a
  * skewed stream the heavy keys must come back near-exact.
  */
class CountMinSpec extends SparkSuite {
  import spark.implicits._

  // zipf-ish stream: key k appears ~600/k times, 1500 distinct keys
  private lazy val stream = (1 to 1500)
    .flatMap(k => Seq.fill(600 / k + 1)(s"key$k"))
    .zipWithIndex
    .map { case (tok, i) => (s"g${i % 2}", tok) }
    .toDF("g", "tok")

  private def key(df: org.apache.spark.sql.DataFrame): Set[(String, Int, Long, Long)] =
    df.select("g", "i", "bucket", "cnt")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("sketchWeighted over (key, count) rows == sketch of the occurrence stream, exactly") {
    val occ = key(CountMin.sketch(stream, Seq("g"), "tok"))
    val pre = stream.groupBy("g", "tok").agg(count(lit(1)).as("n"))
    val wtd = key(CountMin.sketchWeighted(pre, Seq("g"), "tok", "n"))
    assert(wtd === occ)
  }

  test("merge of per-shard sketches == re-sketch of the union, exactly") {
    val Array(a, b) = stream.randomSplit(Array(0.5, 0.5), seed = 7)
    val merged = key(CountMin.merge(CountMin.sketch(a, Seq("g"), "tok").unionByName(CountMin.sketch(b, Seq("g"), "tok")), Seq("g")))
    val direct = key(CountMin.sketch(a.unionByName(b), Seq("g"), "tok"))
    assert(merged === direct)
  }

  test("estimates never underestimate; heavy hitters are near-exact") {
    val sk = CountMin.sketch(stream, Seq("g"), "tok")
    val probes = (1 to 50).map(k => s"key$k").toDF("tok")
    val truth = stream
      .join(probes, Seq("tok"), "left_semi")
      .groupBy($"g", $"tok")
      .agg(count(lit(1)).as("t"))
    val rows = CountMin
      .estimate(sk, Seq("g"), probes, "tok")
      .join(truth, Seq("g", "tok"), "left")
      .select($"g", $"tok", $"cm_est", coalesce($"t", lit(0L)).as("t"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (g, tok, est, t) => assert(est >= t, s"$g/$tok: $est < $t — CM must never underestimate") }
    // εN bound: stream length per group ~2900; e/1024 · N ≈ 8
    val n = stream.count() / 2
    val maxErr = rows.map { case (_, _, est, t) => est - t }.max
    assert(maxErr <= math.ceil(math.E / CountMin.W * n).toLong * 4, s"error $maxErr way past the εN bound")
  }

  test("streaming maintenance: stream sketch == batch sketch after 3 micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val q = CountMin
      .sketch(ms.toDF().toDF("g", "tok"), Seq("g"), "tok")
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("cm_stream")
      .start()
    val data = (0 until 600).map(i => (s"g${i % 2}", s"key${i % 37}"))
    try {
      data.grouped(200).foreach { chunk =>
        ms.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = key(spark.table("cm_stream"))
      val want = key(CountMin.sketch(data.toDF("g", "tok"), Seq("g"), "tok"))
      assert(got.nonEmpty && got === want)
    } finally q.stop()
  }
}
