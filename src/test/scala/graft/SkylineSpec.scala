package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

class SkylineSpec extends SparkSuite {
  import spark.implicits._

  test("planted frontier: dominated points drop, duplicates carry multiplicity, p-ties resolve") {
    val pts = Seq(
      (10.0, 1L, 1L), // frontier (best p)
      (8.0, 5L, 2L),  // frontier
      (8.0, 3L, 3L),  // dominated by (8,5): equal p, larger d
      (7.0, 4L, 4L),  // dominated by (8,5)
      (5.0, 9L, 5L),  // frontier (best d)
      (5.0, 9L, 6L),  // duplicate of frontier point
      (1.0, 1L, 7L)   // dominated by everything
    ).toDF("p", "d", "rid")
    val out = Skyline.skyline(pts).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(-_._1)
    assert(out.toSeq === Seq((10.0, 1L, 1L, 1L), (8.0, 5L, 1L, 2L), (5.0, 9L, 2L, 5L)))
  }

  test("two-phase sweep equals brute-force dominance on a pseudo-random set") {
    val pts = Tables
      .eventsRaw(spark, sf001)
      .select(
        col("value").as("p"),
        (col("event_id") * 2654435761L % 1000L).as("d"),
        col("event_id").as("rid")
      )
    val sky = Skyline.skyline(pts).collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    val dist = pts.groupBy("p", "d").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    val brute = dist.filter { case (p, d) =>
      !dist.exists { case (bp, bd) => bp >= p && bd >= d && (bp > p || bd > d) }
    }.toSet
    assert(sky === brute, s"sweep=${sky.size} brute=${brute.size}")
  }

  test("frontier is an anti-chain: no member dominates another") {
    val out = Skyline.skylineQuery(spark, sf001).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    for (a <- out; b <- out if a != b)
      assert(!(a._1 >= b._1 && a._2 >= b._2 && (a._1 > b._1 || a._2 > b._2)), s"$a dominates $b")
    assert(out.nonEmpty)
  }
}
