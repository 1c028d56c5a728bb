package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — click→purchase
  * attribution as the canonical shape: a purchase joins every click by
  * the same user in the preceding `windowMin` minutes. Both sides
  * carry event-time watermarks and the join condition bounds each
  * side's event time against the other, which is exactly what lets
  * Structured Streaming BOUND THE BUFFERED STATE: a click older than
  * (watermark − window) can never match a future purchase and is
  * evicted; a purchase matches only buffered clicks. Without the
  * interval bounds the state grows forever — the condition is not an
  * optimization, it is the correctness contract of the operator at
  * 100 TB/day ingest.
  *
  * The SAME function body runs in batch (`spark.read` inputs): the
  * interval predicate is an ordinary join condition there, planned as
  * the bucket-blocked interval join family (q_interval_join). The
  * spec drives both paths and requires identical results.
  */
object StreamJoin {

  /** clicks(user_id, ts, click_id) ⋈ purchases(user_id, ts,
    * purchase_id) within `windowMin` minutes before each purchase.
    * Works on streaming or batch frames (same plan text). */
  def attribution(clicks: DataFrame, purchases: DataFrame, windowMin: Int, watermark: String = "10 minutes"): DataFrame = {
    val c =
      (if (clicks.isStreaming) clicks.withWatermark("ts", watermark) else clicks).alias("c")
    val p =
      (if (purchases.isStreaming) purchases.withWatermark("ts", watermark) else purchases)
        .alias("p")
    c.join(
      p,
      expr(
        s"""c.user_id = p.user_id AND
           |c.ts <= p.ts AND
           |c.ts >= p.ts - interval $windowMin minutes""".stripMargin
      ),
      "inner"
    ).select(
      col("c.user_id").as("user_id"),
      col("c.click_id").as("click_id"),
      col("p.purchase_id").as("purchase_id"),
      col("c.ts").as("click_ts"),
      col("p.ts").as("purchase_ts")
    )
  }
}
