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

  test("knnJoin == brute-force radius top-k, including the exact-radius boundary") {
    import org.apache.spark.sql.expressions.Window
    val data = Tables
      .eventsRaw(spark, sf0001)
      .select(
        $"event_id".as("bid"),
        ($"event_id" * 7919L % 36000L - 18000L).as("px"),
        ($"event_id" * 104729L % 18000L - 9000L).as("py")
      )
    // planted boundary pair: b exactly r away from q on the x axis
    val extraQ = Seq((900001L, 0L, 0L)).toDF("qid", "px", "py")
    val extraB = Seq((900002L, 500L, 0L), (900003L, 501L, 0L)).toDF("bid", "px", "py")
    val queries = data.filter($"bid" % 10 === 0).select($"bid".as("qid"), $"px", $"py").union(extraQ)
    val all = data.union(extraB)
    val got = SpatialJoin.knnJoin(queries, all, r = 500L, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val brute = queries
      .crossJoin(all.select($"bid".as("b2"), $"px".as("bx"), $"py".as("by")))
      .filter($"b2" =!= $"qid")
      .withColumn("d2", ($"px" - $"bx") * ($"px" - $"bx") + ($"py" - $"by") * ($"py" - $"by"))
      .filter($"d2" <= 250000L)
      .withColumn("rank", row_number().over(Window.partitionBy($"qid").orderBy($"d2".asc, $"b2".asc)).cast("long"))
      .filter($"rank" <= 5)
      .select($"qid", $"rank", $"b2", $"d2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === brute && got.nonEmpty)
    val boundary = got.filter(_._1 == 900001L)
    assert(boundary.exists(_._3 == 900002L), "point at exactly r is included")
    assert(!boundary.exists(_._3 == 900003L), "point just past r is excluded")
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
