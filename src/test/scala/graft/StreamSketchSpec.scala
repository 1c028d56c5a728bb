package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bloom, Hll}

/** Streaming maintenance of the HLL and Bloom sketches: both are built
  * from ORDER-INSENSITIVE aggregations (register-wise max, word-wise
  * bit_or), so the exact batch code — `Hll.registers` / `Bloom.build`
  * unchanged — runs as a stateful streaming aggregation, and after any
  * number of micro-batches the maintained state must equal the batch
  * sketch of everything seen, bit for bit. That is the ingest-path
  * sketch story at 100 TB: the per-day batch sketch and the live
  * streaming sketch are the same table, so they can be compared,
  * merged, and handed off freely.
  */
class StreamSketchSpec extends SparkSuite {
  import spark.implicits._

  test("streaming HLL registers == batch registers after 3 micro-batches, bit for bit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val regs = Hll.registers(ms.toDF().toDF("grp", "v"), Seq("grp"), "v")
    val q = regs.writeStream.outputMode("complete").format("memory").queryName("hll_stream").start()
    val data = (0 until 900).map(i => (s"g${i % 3}", s"val:$i"))
    try {
      data.grouped(300).foreach { chunk =>
        ms.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark
        .table("hll_stream")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .sorted
      val want = Hll
        .registers(data.toDF("grp", "v"), Seq("grp"), "v")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .sorted
      assert(got.nonEmpty && got === want)
    } finally q.stop()
  }

  test("streaming Bloom filter == batch filter after 3 micro-batches; probes agree") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (m, k) = (4096, 3)
    val ms = MemoryStream[String]
    val filt = Bloom.build(ms.toDF().toDF("key"), "key", m, k)
    val q = filt.writeStream.outputMode("complete").format("memory").queryName("bloom_stream").start()
    val keys = (0 until 600).map(i => s"url:$i")
    try {
      keys.grouped(200).foreach { chunk =>
        ms.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.table("bloom_stream").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val want = Bloom.build(keys.toDF("key"), "key", m, k).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.nonEmpty && got === want)
      // and the maintained filter answers like the batch one: inserted
      // keys always MAYBE (zero false negatives through the stream path)
      val probes = (550 until 650).map(i => s"url:$i").toDF("key")
      val answers = Bloom
        .contains(spark.table("bloom_stream"), probes, "key", m, k)
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      (550 until 600).foreach(i => assert(answers(s"url:$i") === 1L, s"inserted key url:$i must be MAYBE"))
    } finally q.stop()
  }

  test("streaming bottom-k reservoir == batch sketch after 3 micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Reservoir
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val withHash = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("grp", "id", "v").withColumn("h", Reservoir.rowHash(col("grp"), col("id")))
    val sk = Reservoir.sample(withHash(ms.toDF()), Seq("grp"), col("h"), col("id"), col("v"))
    val q = sk.writeStream.outputMode("complete").format("memory").queryName("rsv_stream").start()
    val data = (0 until 600).map(i => (s"g${i % 2}", i.toLong, (i * 13 % 100).toDouble))
    try {
      data.grouped(200).foreach { chunk =>
        ms.addData(chunk: _*)
        q.processAllAvailable()
      }
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("grp", "h", "id", "v")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .sorted
      val got = rows(spark.table("rsv_stream"))
      val want = rows(Reservoir.sample(withHash(data.toDF()), Seq("grp"), col("h"), col("id"), col("v")))
      assert(got.nonEmpty && got === want)
    } finally q.stop()
  }

  test("streaming QSketch bucket counts == batch sketch after 2 micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.QSketch
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    val sk = QSketch.sketch(ms.toDF().toDF("v").withColumn("grp", lit("g")), Seq("grp"), "v")
    val q = sk.writeStream.outputMode("complete").format("memory").queryName("qsk_stream").start()
    val data = (0 until 700).map(i => (i * 37L) % 9999)
    try {
      data.grouped(350).foreach { chunk =>
        ms.addData(chunk: _*)
        q.processAllAvailable()
      }
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
      val got = rows(spark.table("qsk_stream"))
      val want = rows(QSketch.sketch(data.toDF("v").withColumn("grp", lit("g")), Seq("grp"), "v"))
      assert(got.nonEmpty && got === want)
    } finally q.stop()
  }
}
