package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Watermark semantics: late data beyond the watermark is dropped from
  * append-mode windowed aggregation — the state-bounding behavior that
  * keeps streaming aggregations viable on unbounded input.
  */
class WatermarkSpec extends SparkSuite {
  import spark.implicits._

  final case class Ev(ts: Timestamp, k: String)
  private def t(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("append-mode window drops data later than the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val agg = source
      .toDF()
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "10 minutes"), $"k")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("w"), $"k", $"n")

    val q = agg.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName("wm_test")
      .start()
    try {
      // batch 1: fill window [10:00,10:10) and advance event time to 10:30
      source.addData(Ev(t(1), "a"), Ev(t(2), "a"), Ev(t(30), "b"))
      q.processAllAvailable()
      // watermark is now 10:25 -> window [10:00,10:10) closed+emitted
      val afterB1 = spark.sql("select * from wm_test").collect()
      assert(afterB1.exists(r => r.getAs[String]("k") == "a" && r.getAs[Long]("n") == 2L))

      // batch 2: a LATE row for the closed window + one on-time row
      source.addData(Ev(t(3), "a"), Ev(t(35), "b"))
      q.processAllAvailable()
      val afterB2 = spark.sql("select * from wm_test").collect()
      // the late "a" row must NOT re-emit or bump the closed window
      assert(afterB2.count(r => r.getAs[String]("k") == "a") === 1)
      assert(afterB2.find(r => r.getAs[String]("k") == "a").get.getAs[Long]("n") === 2L)
    } finally q.stop()
  }

  test("dropped rows are observable via streaming progress metrics") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val agg = source.toDF()
      .withWatermark("ts", "1 minutes")
      .groupBy(window($"ts", "5 minutes")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append).format("memory").queryName("wm_metrics").start()
    try {
      source.addData(Ev(t(20), "x"))
      q.processAllAvailable()
      source.addData(Ev(t(1), "late"))
      q.processAllAvailable()
      val dropped = q.recentProgress.flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1, s"expected a watermark-dropped row, got $dropped")
    } finally q.stop()
  }
}
