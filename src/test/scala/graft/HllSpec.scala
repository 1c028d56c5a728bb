package graft

import org.apache.spark.sql.functions._

import graft.operators.Hll

/** HyperLogLog: exact mergeability (the property that makes sketches
  * roll up across shards/days without re-reading data), the published
  * accuracy bound, and the state-size cap that makes the shuffle
  * sketch-sized at any cardinality.
  */
class HllSpec extends SparkSuite {
  import spark.implicits._

  test("register-wise max merge is EXACTLY the sketch of the concatenated input") {
    val a = (0 until 3000).map(i => ("a", s"id$i")).toDF("g", "v")
    val b = (2000 until 6000).map(i => ("b", s"id$i")).toDF("g", "v")
    val partial = Hll.registers(a.union(b), Seq("g"), "v")
    val merged = Hll
      .merge(partial.select(lit("all").as("g"), $"j", $"reg_max"), Seq("g"))
      .select($"j", $"reg_max")
    val direct = Hll
      .registers(a.union(b).select(lit("all").as("g"), $"v"), Seq("g"), "v")
      .select($"j", $"reg_max")
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  test("estimate within the 3-sigma bound (±3·1.04/sqrt(512) ≈ 13.8%) on known cardinalities") {
    for (n <- Seq(100, 1000, 20000)) {
      val df = (0 until n).map(i => ("g", s"key:$i")).toDF("g", "v")
      val est = Hll.estimate(Hll.registers(df, Seq("g"), "v"), Seq("g")).head().getDouble(2)
      assert(math.abs(est - n) <= 0.138 * n + 1, s"n=$n est=$est")
    }
  }

  test("duplicates do not move the estimate; cardinality 1 estimates ~1") {
    val once = (0 until 500).map(i => ("g", s"k$i")).toDF("g", "v")
    val thrice = once.union(once).union(once)
    val e1 = Hll.estimate(Hll.registers(once, Seq("g"), "v"), Seq("g")).head().getDouble(2)
    val e3 = Hll.estimate(Hll.registers(thrice, Seq("g"), "v"), Seq("g")).head().getDouble(2)
    assert(e1 === e3)
    val single = Seq(("g", "only")).toDF("g", "v")
    val es = Hll.estimate(Hll.registers(single, Seq("g"), "v"), Seq("g")).head().getDouble(2)
    assert(es > 0.9 && es < 1.1, s"single-value estimate $es")
  }

  test("sketch state is capped at m rows per group regardless of cardinality") {
    val big = (0 until 50000).map(i => ("g", s"x$i")).toDF("g", "v")
    val nRegs = Hll.registers(big, Seq("g"), "v").count()
    assert(nRegs <= Hll.M)
  }
}
