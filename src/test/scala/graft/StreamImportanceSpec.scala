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

  test("stream-static DSIR scoring: documents scored on arrival against a trained ratio table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // STATIC side: an integer-quantized per-feature ratio table (the
    // trained artifact a scoring-on-ingest pipeline broadcasts)
    def feats(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", explode(expr("""transform(regexp_extract_all(lower(text), '\\w+', 0), w -> ('0x' || substr(md5(concat('ds:', w)), 1, 15)))""")).as("h"))
      .select($"doc_id", (conv(substring($"h", 3, 15), 16, 10).cast("long") % 64).as("f"))
    val train = (0 until 40).map(i => (i.toLong, s"common w$i shared token${i % 5}")).toDF("doc_id", "text")
    val ratio = feats(train)
      .groupBy($"f").agg(count(lit(1)).as("cs"))
      .select($"f", expr("(cs + 1) * 1000 div 7").cast("long").as("a"))
      .cache()

    // STREAM side: incoming documents join the static ratio table
    // (stateless stream-static join — every feature OCCURRENCE is a
    // row, so one stateful aggregation suffices) and emit integer
    // scores per micro-batch
    val ms = MemoryStream[(Long, String)]
    val scores = feats(ms.toDF().toDF("doc_id", "text"))
      .join(ratio, Seq("f"))
      .groupBy($"doc_id")
      .agg(sum($"a").cast("long").as("score"))
    val q = scores.writeStream.outputMode("complete").format("memory").queryName("dsir_stream").start()
    val incoming = (100 until 130).map(i => (i.toLong, s"common shared token${i % 5} fresh w$i"))
    try {
      incoming.grouped(10).foreach { chunk =>
        ms.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.table("dsir_stream").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val want = feats(incoming.toDF("doc_id", "text"))
        .join(ratio, Seq("f"))
        .groupBy($"doc_id")
        .agg(sum($"a").cast("long").as("score"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.length == 30 && got === want)
    } finally q.stop()
  }
}
