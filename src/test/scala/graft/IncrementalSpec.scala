package graft

import org.apache.spark.sql.functions._

import graft.operators.Incremental

class IncrementalSpec extends SparkSuite {

  test("merge law: folding any split equals the direct aggregate, in any order") {
    val ev = Tables.eventsRaw(spark, sf0001)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(
        col("user_id"),
        col("n"),
        round(col("vsum"), 6).as("s"),
        col("vmin"),
        col("vmax")
      ).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    val direct = norm(Incremental.aggState(ev, "user_id", "value"))
    val parts = Seq(0, 1, 2).map(k => Incremental.aggState(ev.filter(col("event_id") % 3 === k), "user_id", "value"))
    val leftFold = norm(
      Incremental.merge(Incremental.merge(parts(0), parts(1), "user_id"), parts(2), "user_id")
    )
    val rightFold = norm(
      Incremental.merge(parts(0), Incremental.merge(parts(1), parts(2), "user_id"), "user_id")
    )
    assert(leftFold === direct)
    assert(rightFold === direct)
  }

  test("keys absent from one side survive the fold") {
    import spark.implicits._
    val a = Seq((1L, 2.0), (1L, 4.0)).toDF("k", "v")
    val b = Seq((2L, 10.0)).toDF("k", "v")
    val merged = Incremental
      .merge(Incremental.aggState(a, "k", "v"), Incremental.aggState(b, "k", "v"), "k")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(merged === Set((1L, 2L, 6.0, 2.0, 4.0), (2L, 1L, 10.0, 10.0, 10.0)))
  }
}
