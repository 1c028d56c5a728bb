package graft

import org.apache.spark.sql.functions._

import graft.core.Index
import graft.plans.EnvExpressions

/** Native envelope-intersection predicate: semantics vs the plain
  * column-math form, null handling, codegen (projection context, where
  * the rewrite rule does NOT fire), and the Filter-context rewrite that
  * turns it into parquet-pushable range predicates.
  */
class EnvExprSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = {
    EnvExpressions.register(spark)
    Seq(
      // (id, minx, miny, maxx, maxy)
      (1L, Some(-1.0), Some(-1.0), Some(1.0), Some(1.0)), // overlaps query box
      (2L, Some(10.0), Some(10.0), Some(12.0), Some(12.0)), // disjoint
      (3L, Some(2.0), Some(-1.0), Some(4.0), Some(1.0)), // touches query edge at x=2
      (4L, None, None, None, None) // no envelope
    ).toDF("id", "minx", "miny", "maxx", "maxy")
  }

  private def pred = EnvExpressions.envIntersects($"minx", $"miny", $"maxx", $"maxy", -2.0, -2.0, 2.0, 2.0)

  test("filter semantics match Index.bboxIntersects; touching boxes intersect; null envelope never matches") {
    val native = df.filter(pred).select($"id").collect().map(_.getLong(0)).toSet
    val plain = df.filter(Index.bboxIntersects(-2.0, -2.0, 2.0, 2.0)).select($"id").collect().map(_.getLong(0)).toSet
    assert(native === Set(1L, 3L), "overlap + edge-touch intersect; disjoint and null-envelope do not")
    assert(native === plain, "native predicate must agree with the column-math form")
  }

  test("projection context (no rewrite): codegen'd expression evaluates, null envelope -> false not null") {
    val vals = df
      .select($"id", pred.as("hit"))
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)) // getBoolean throws if null: nullable=false holds
      .toMap
    assert(vals === Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
  }

  test("SQL surface: env_intersects callable from spark.sql") {
    df.createOrReplaceTempView("env_fixture")
    val n = spark
      .sql("SELECT count(*) FROM env_fixture WHERE env_intersects(minx, miny, maxx, maxy, -2.0, -2.0, 2.0, 2.0)")
      .head()
      .getLong(0)
    assert(n === 2L)
  }

  test("Filter context: the rewrite expands to pushable range predicates on a parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_env").toString
    try {
      df.write.mode("overwrite").parquet(dir)
      val scan = spark.read.parquet(dir).filter(pred)
      val plan = scan.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("env_intersects"), s"rewrite must remove the opaque call under Filter:\n$plan")
      val pushed = raw"PushedFilters: \[([^\]]+)\]".r.findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
      Seq("minx", "miny", "maxx", "maxy").foreach { c =>
        assert(pushed.contains(c), s"envelope column $c must reach PushedFilters, got [$pushed]")
      }
      assert(scan.select($"id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("null-observing contexts do NOT rewrite: NOT env_intersects keeps null-envelope rows") {
    // the expression is non-nullable (null envelope -> false), so NOT of
    // it is TRUE for row 4; the expanded four-comparison form would be
    // NULL there and drop the row — the rewrite must leave non-conjunct
    // occurrences alone
    val neg = df.filter(!pred).select($"id").collect().map(_.getLong(0)).toSet
    assert(neg === Set(2L, 4L), "disjoint AND null-envelope rows survive the negated predicate")
    // same through SQL, and mixed with a top-level conjunct that DOES rewrite
    df.createOrReplaceTempView("env_fixture_neg")
    val n = spark
      .sql("SELECT count(*) FROM env_fixture_neg WHERE NOT env_intersects(minx, miny, maxx, maxy, -2.0, -2.0, 2.0, 2.0)")
      .head()
      .getLong(0)
    assert(n === 2L)
    val mixed = df
      .filter(pred && !EnvExpressions.envIntersects($"minx", $"miny", $"maxx", $"maxy", 3.0, -2.0, 5.0, 2.0))
      .select($"id")
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(mixed === Set(1L), "conjunct rewrites, negated occurrence keeps expression semantics")
  }
}
