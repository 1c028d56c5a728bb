package graft

import org.apache.spark.sql.functions._

import graft.geo.{GeoQueries, SpatialJoin}

/** Grid-partitioned spatial join: cell blocking must lose nothing vs
  * the exact cross containment, and the plan must be an equi-join —
  * never a cartesian product.
  */
class SpatialJoinSpec extends SparkSuite {
  import spark.implicits._

  private def points = GeoQueries
    .withLonLat(Tables.eventsRaw(spark, sf0001))
    .select($"event_id", $"lon", $"lat")

  test("blocked join == brute-force containment (pair-for-pair)") {
    val regions = SpatialJoin.syntheticRegions(spark)
    val blocked = SpatialJoin
      .join(points, regions)
      .select($"event_id", $"region_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val brute = points
      .crossJoin(regions)
      .filter($"lon" >= $"w" && $"lon" <= $"e" && $"lat" >= $"s" && $"lat" <= $"n")
      .select($"event_id", $"region_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(blocked === brute && brute.nonEmpty)
  }

  test("a region spanning many cells still matches across all of them") {
    val wide = Seq((0L, -100.0, -40.0, 100.0, 40.0)).toDF("region_id", "w", "s", "e", "n")
    val got = SpatialJoin.join(points, wide).count()
    val want = points.filter($"lon" >= -100 && $"lon" <= 100 && $"lat" >= -40 && $"lat" <= 40).count()
    assert(got === want)
  }

  test("the plan is an equi-join on cell keys, not a cartesian product") {
    val plan = SpatialJoin
      .join(points, SpatialJoin.syntheticRegions(spark))
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(20).mkString("\n"))
  }
}
