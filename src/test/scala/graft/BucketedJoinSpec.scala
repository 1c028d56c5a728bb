package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Scale technique proof: bucketing both fact tables on the join key
  * removes the shuffle from the join entirely (SortMergeJoin with no
  * Exchange) — the layout we'd use for orders⋈lineitem at 100 TB
  * (SURVEY §4.3 / NOTES_r1 open item).
  */
class BucketedJoinSpec extends SparkSuite {

  test("bucketBy on the join key eliminates the exchange") {
    val wh = Files.createTempDirectory("graft_wh").toFile.getPath
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    Tables.orders(spark, sf0001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf0001)
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_lineitem").mode("overwrite").saveAsTable("b_lineitem")

    // disable broadcast so the join strategy question is real
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), Seq("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)

      // control: the same join on plain parquet DOES shuffle
      val unbucketed = Tables.orders(spark, sf0001)
        .join(Tables.lineitem(spark, sf0001).withColumnRenamed("l_orderkey", "o_orderkey"), Seq("o_orderkey"))
      val controlPlan = unbucketed.queryExecution.executedPlan.toString
      assert(controlPlan.contains("Exchange") || controlPlan.contains("AQEShuffleRead") ||
        controlPlan.contains("AdaptiveSparkPlan"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
