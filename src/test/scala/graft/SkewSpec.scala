package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salting for skew: the salted two-phase agg and the hot-key split
  * join must equal their unsalted forms for ANY salt count and ANY
  * hot-key detection outcome, and the plans must actually spread the
  * hot key (the whole point at 100 TB).
  */
class SkewSpec extends SparkSuite {

  private def li = Tables
    .lineitem(spark, sf0001)
    .withColumn("__id", concat(col("l_orderkey"), lit(":"), col("l_linenumber")))

  test("salted agg equals direct groupBy for several salt counts") {
    val direct = li
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 6).as("s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    for (nSalts <- Seq(1, 4, 32)) {
      val salted = Skew
        .saltedCountSum(li, "l_returnflag", "__id", "l_quantity", nSalts)
        .select(col("l_returnflag"), col("n"), round(col("sum_value"), 6).as("s"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(salted === direct, s"nSalts=$nSalts diverged")
    }
  }

  test("salted agg stage-1 exchange partitions on (key, salt)") {
    val plan = Skew
      .saltedCountSum(li, "l_returnflag", "__id", "l_quantity", 16)
      .queryExecution
      .executedPlan
      .toString
    assert(
      plan.contains("l_returnflag") && plan.contains("__salt"),
      "salted stage must aggregate on (l_returnflag, __salt)"
    )
    // the first (inner) exchange must hash on BOTH columns — that is
    // what splits the hot key across reducers
    val saltedExchange = "hashpartitioning\\([^)]*__salt".r.findFirstIn(plan)
    assert(saltedExchange.isDefined, s"no (key, salt) exchange in:\n$plan")
  }

  test("salted join equals plain join on the shuffle-join path, hot set irrelevant") {
    val fact = li.withColumn(
      "n_nationkey",
      when(pmod(col("l_orderkey"), lit(4)) < 3, lit(7L)).otherwise(pmod(col("l_orderkey"), lit(25)))
    )
    val dim = Tables.nation(spark, sf0001).select(col("n_nationkey"), col("n_name"))
    val rowId = concat(col("l_orderkey"), lit(":"), col("l_linenumber"))
    val expected = fact
      .join(dim, Seq("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 6).as("s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // everything hot (threshold 0 on a mod-1 sample) vs nothing hot
      for ((thr, mod) <- Seq((0L, 1), (Long.MaxValue, 1), (2L, 4))) {
        val got = Skew
          .saltedJoin(fact, dim, "n_nationkey", rowId, nSalts = 8, hotThreshold = thr, sampleMod = mod)
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 6).as("s"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
          .toSet
        assert(got === expected, s"hotThreshold=$thr sampleMod=$mod diverged")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("salted join replicates ONLY hot dim rows") {
    val fact = li.withColumn(
      "n_nationkey",
      when(pmod(col("l_orderkey"), lit(4)) < 3, lit(7L)).otherwise(pmod(col("l_orderkey"), lit(25)))
    )
    val dim = Tables.nation(spark, sf0001).select(col("n_nationkey"), col("n_name"))
    val hot = Skew.hotKeys(fact, "n_nationkey", col("__id"), hotThreshold = 10L, sampleMod = 100)
    val hotSet = hot.collect().map(_.getLong(0)).toSet
    assert(hotSet.contains(7L), "nation 7 (75% of rows) must be detected hot")
    assert(hotSet.size < 5, s"cold keys misdetected as hot: $hotSet")
  }
}
