package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Streaming twin for the Gopher quality gate: the flags are pure
  * column expressions, so a documents stream filters identically to
  * the batch face across micro-batch boundaries. */
class StreamGopherSpec extends SparkSuite {
  import spark.implicits._

  test("per-rule flags pin on crafted failures: every one of the 8 rules has a failing case") {
    val prose = ("The words here have to be plain and that is what we have with them " * 10).trim
    val docs = Seq(
      ("ok", prose),
      ("too_short", "only a few words here with the rest missing"),
      ("mean_len_high", (("pneumonoultramicroscopicsilicovolcanoconiosis " * 60).trim)),
      ("mean_len_low", ("a b c d e f g h i j " * 30).trim),
      ("hashy", (("#tag of the and that have with be to " + "# " * 5) * 20).trim),
      ("ellipsisy", (("so... the of and that have with be to " * 20).trim)),
      ("bullets", Seq.fill(60)("- the item of the list that we have with it be to and").mkString("\n")),
      ("ell_lines", Seq.fill(60)("the line of text that we have with it be to and...").mkString("\n")),
      ("numeric", (("12345 67890 24680 13579 11111 22222 33333 44444 55555 99999 " * 10).trim)),
      ("no_stops", ("quick brown foxes jump over lazy dogs near riverbanks daily always " * 10).trim)
    )
    val flags = docs
      .toDF("name", "text")
      .select(Seq($"name") ++ TextOps.gopherCols($"text"): _*)
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    def f(name: String, col: String): Boolean =
      flags(name).getBoolean(flags(name).schema.fieldIndex(col))
    assert(f("ok", "pass_all"), "the prose fixture must pass the whole gate")
    assert(!f("too_short", "f_words") && !f("too_short", "pass_all"))
    assert(!f("mean_len_high", "f_mean_len"))
    assert(!f("mean_len_low", "f_mean_len"))
    assert(!f("hashy", "f_hash"))
    assert(!f("ellipsisy", "f_ellipsis"))
    assert(!f("bullets", "f_bullet"))
    assert(!f("ell_lines", "f_ell_lines"))
    assert(!f("numeric", "f_alpha"))
    assert(!f("no_stops", "f_stops"))
  }

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
