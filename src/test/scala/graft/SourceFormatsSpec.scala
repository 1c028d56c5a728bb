package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source-format breadth: the engine's operators are format-agnostic —
  * the same query over JSONL and CSV copies of a table must equal the
  * parquet result (schema-on-read differences handled at the source
  * boundary, exactly where Spark puts them).
  */
class SourceFormatsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val base = Tables
    .eventsRaw(spark, sf0001)
    .select($"event_id", $"ts", $"user_id", $"event_type", $"value")

  private lazy val expected = base
    .groupBy($"event_type")
    .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("s"))
    .collect()
    .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
    .toMap

  private def rollup(df: org.apache.spark.sql.DataFrame) = df
    .groupBy($"event_type")
    .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("s"))
    .collect()
    .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
    .toMap

  test("JSONL round-trip preserves query results") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    base.write.mode("overwrite").json(dir)
    val back = spark.read.schema(base.schema).json(dir)
    assert(rollup(back) === expected)
  }

  test("CSV round-trip (header, explicit schema) preserves query results") {
    val dir = Files.createTempDirectory("graft_csv").toString
    base.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(base.schema).csv(dir)
    assert(rollup(back) === expected)
  }
}
