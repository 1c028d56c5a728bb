package graft

import graft.text.Importance

/** Streaming twin for the LM-training count pipeline: the bigram
  * expansion is a stateless per-row map (no window), so the SAME
  * frame runs under Structured Streaming — counts after N
  * micro-batches equal the batch counts exactly. */
class StreamImportanceSpec extends SparkSuite {

  test("streaming bigram counts == batch counts after 3 micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val docs = (0 until 90).map { i =>
      (i.toLong, s"alpha beta gamma w$i beta alpha ${if (i % 2 == 0) "alpha beta" else "gamma gamma"}")
    }
    val ms = MemoryStream[(Long, String)]
    val counts = Importance
      .bigrams(ms.toDF().toDF("doc_id", "text"))
      .groupBy($"w1", $"w2")
      .agg(count(lit(1)).as("c12"))
    val q = counts.writeStream.outputMode("complete").format("memory").queryName("kn_stream").start()
    try {
      docs.grouped(30).foreach { chunk =>
        ms.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.table("kn_stream").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
      val want = Importance
        .bigrams(docs.toDF("doc_id", "text"))
        .groupBy($"w1", $"w2")
        .agg(count(lit(1)).as("c12"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sorted
      assert(got.nonEmpty && got === want)
      // the high-frequency pairs carry real counts (not all singletons)
      assert(got.find(t => t._1 == "alpha" && t._2 == "beta").exists(_._3 > 100))
    } finally q.stop()
  }
}
