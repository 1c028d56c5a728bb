package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamJoin

/** Stream-stream interval join: after any number of micro-batches the
  * streamed attribution must equal the batch join of everything seen —
  * the same function body runs both paths. */
class StreamJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("streamed click->purchase attribution == batch join after 3 micro-batches") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicksMs = MemoryStream[(Long, Timestamp, Long)]
    val purchasesMs = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamJoin.attribution(
      clicksMs.toDF().toDF("user_id", "ts", "click_id"),
      purchasesMs.toDF().toDF("user_id", "ts", "purchase_id"),
      windowMin = 30
    )
    val q = joined.writeStream.outputMode("append").format("memory").queryName("attr_stream").start()
    // user 1: click at t0, purchases inside (t+10) and outside (t+50) the window
    // user 2: two clicks, one purchase matching both (fan-out)
    // user 3: purchase BEFORE any click (no match)
    val clicks = Seq(
      (1L, ts(0), 100L),
      (2L, ts(5), 200L),
      (2L, ts(20), 201L),
      (3L, ts(40), 300L)
    )
    val purchases = Seq(
      (1L, ts(10), 1000L),
      (1L, ts(50), 1001L),
      (2L, ts(25), 2000L),
      (3L, ts(35), 3000L)
    )
    try {
      // interleave out-of-order-but-within-watermark batches
      clicksMs.addData(clicks.take(2): _*)
      purchasesMs.addData(purchases.take(1): _*)
      q.processAllAvailable()
      clicksMs.addData(clicks.drop(2): _*)
      purchasesMs.addData(purchases.slice(1, 3): _*)
      q.processAllAvailable()
      purchasesMs.addData(purchases.drop(3): _*)
      q.processAllAvailable()
      val got = spark
        .table("attr_stream")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted
      val want = StreamJoin
        .attribution(
          clicks.toDF("user_id", "ts", "click_id"),
          purchases.toDF("user_id", "ts", "purchase_id"),
          windowMin = 30
        )
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted
      assert(want.nonEmpty, "batch reference must produce matches")
      assert(got === want)
      // semantic spot checks: in-window purchase matches, out-of-window
      // and pre-click purchases do not; fan-out click pairs both appear
      assert(want.contains((1L, 100L, 1000L)))
      assert(!want.exists(_._3 == 1001L), "purchase 50min after the click must not attribute")
      assert(want.count(_._3 == 2000L) === 2, "both user-2 clicks attribute the purchase")
      assert(!want.exists(_._3 == 3000L), "purchase before any click must not attribute")
    } finally q.stop()
  }
}
