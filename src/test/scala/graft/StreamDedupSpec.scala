package graft

import org.apache.spark.sql.functions._

/** Streaming exact dedup — dedup-on-arrival as the stateful twin of
  * the batch `dedupExact` groupBy: the same content-hash key run
  * through streaming `dropDuplicates` must emit each distinct content
  * exactly once across micro-batches (cross-batch duplicates are
  * suppressed by state, not by the batch boundary), and the emitted
  * key set must equal the batch distinct of everything seen. The
  * watermarked variant (`dropDuplicatesWithinWatermark`) is the
  * bounded-state shape a 100 TB ingest runs: state is droppable once
  * the event-time watermark passes, trading unbounded history for a
  * dedup horizon.
  */
class StreamDedupSpec extends SparkSuite {
  import spark.implicits._

  test("streaming dropDuplicates on the content hash: one emission per distinct content, cross-batch dupes suppressed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val dedup = ms
      .toDF()
      .toDF("doc_id", "text")
      .withColumn("h", md5($"text"))
      .dropDuplicates("h")
    val q = dedup.writeStream.outputMode("append").format("memory").queryName("dedup_stream").start()
    // 80 distinct texts; batch 1 covers most, batch 2 overlaps batch 1,
    // batch 3 replays batch 1 entirely (pure cross-batch duplicates)
    val b1 = (0 until 200).map(i => (i.toLong, s"content ${i % 80}"))
    val b2 = (100 until 300).map(i => (i.toLong, s"content ${i % 80}"))
    val b3 = b1
    try {
      Seq(b1, b2, b3).foreach { b =>
        ms.addData(b: _*)
        q.processAllAvailable()
      }
      val got = spark.table("dedup_stream").select("h").as[String].collect()
      assert(got.length == 80, s"re-emitted duplicates: ${got.length} rows for 80 distinct contents")
      val want = (b1 ++ b2 ++ b3)
        .toDF("doc_id", "text")
        .select(md5($"text").as("h"))
        .distinct()
        .as[String]
        .collect()
        .toSet
      assert(got.toSet == want)
    } finally q.stop()
  }

  test("watermarked variant bounds state: dedup holds within the horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String)]
    val dedup = ms
      .toDF()
      .toDF("ts", "text")
      .withColumn("h", md5($"text"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("h")
    val q = dedup.writeStream.outputMode("append").format("memory").queryName("dedup_wm").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    try {
      // batch 1: three rows, one duplicate pair inside the horizon
      ms.addData((t(0), "a"), (t(1), "a"), (t(2), "b"))
      q.processAllAvailable()
      // batch 2: duplicate of "a" still within the 10-minute horizon
      ms.addData((t(5), "a"), (t(6), "c"))
      q.processAllAvailable()
      val got = spark.table("dedup_wm").select("text").as[String].collect().sorted
      assert(got.toSeq == Seq("a", "b", "c"), s"got ${got.toSeq}")
    } finally q.stop()
  }
}
