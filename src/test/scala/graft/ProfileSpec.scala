package graft

import graft.operators.Relational

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("profiler: nulls, distincts, completeness, min/max, avg_len on a planted frame") {
    val df = Seq(
      (Some(1L), Some("aa")),
      (Some(2L), Some("bbbb")),
      (Some(2L), None),
      (None, Some("aa"))
    ).toDF("k", "s")
    val out = Relational.profileColumns(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = out("k")
    assert(k.getLong(1) === 4L && k.getLong(2) === 1L && k.getLong(3) === 2L)
    assert(k.getDouble(4) === 0.75 && k.getString(5) === "1" && k.getString(6) === "2")
    assert(k.isNullAt(7), "numeric column has no avg_len")
    val s = out("s")
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L)
    assert(s.getString(5) === "aa" && s.getString(6) === "bbbb")
    // lengths 2, 4, 2 -> 8/3 rounded
    assert(s.getDouble(7) === 2.6667)
  }

  test("profiler on documents: fully complete, doc_id unique") {
    val out = Relational.colProfileQuery(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    val n = out("doc_id").getLong(1)
    assert(out("doc_id").getLong(3) === n, "doc_id is a key")
    assert(out.values.forall(_.getDouble(4) === 1.0), "no nulls anywhere")
    assert(out("text").getDouble(7) > 0)
  }
}
