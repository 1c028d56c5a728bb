package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Streaming twin for the Gopher quality gate: the flags are pure
  * column expressions, so a documents stream filters identically to
  * the batch face across micro-batch boundaries. */
class StreamGopherSpec extends SparkSuite {
  import spark.implicits._

  test("streaming Gopher gate == batch gate across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val flags = ms
      .toDF()
      .toDF("doc_id", "text")
      .select(Seq($"doc_id") ++ TextOps.gopherCols($"text"): _*)
      .filter($"pass_all")
    val q = flags.writeStream.outputMode("append").format("memory").queryName("gopher_stream").start()

    def prose(i: Int): String =
      (s"This is document $i and the words have to be varied so that " * 12) +
        "it can be long enough to pass with plain sentences."
    val good = (0 until 40).map(i => (i.toLong, prose(i)))
    val tooShort = (100 until 120).map(i => (i.toLong, "tiny text " + i))
    val bullets = (200 until 220).map(i => (i.toLong, Seq.fill(60)("- item " + i).mkString("\n")))
    val hashy = (300 until 320).map(i => (i.toLong, ("#tag" + i + " ") * 80))
    try {
      Seq(good ++ tooShort, bullets ++ hashy, good.map { case (id, t) => (id + 1000, t) }).foreach { b =>
        ms.addData(b: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("gopher_stream").select("doc_id").as[Long].collect().toSet
      val all = (good ++ tooShort ++ bullets ++ hashy ++ good.map { case (id, t) => (id + 1000, t) })
      val batch = all
        .toDF("doc_id", "text")
        .select(Seq($"doc_id") ++ TextOps.gopherCols($"text"): _*)
        .filter($"pass_all")
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch, s"stream/batch drift: ${streamed.size} vs ${batch.size}")
      assert(batch.size == 80, s"expected only the prose docs to pass, got ${batch.size}")
      assert(!batch.exists(id => id >= 100 && id < 400), "chrome/bullet/hashy docs must fail the gate")
    } finally q.stop()
  }
}
