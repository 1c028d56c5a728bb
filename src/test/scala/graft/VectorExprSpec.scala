package graft

import org.apache.spark.sql.functions._

import graft.ann.Similarity
import graft.plans.VectorExpressions

/** Native vector expressions: correctness vs the higher-order-function
  * forms, null semantics, SQL reachability, codegen path.
  */
class VectorExprSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = {
    VectorExpressions.register(spark)
    Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (2L, Array(1.0, 0.0), Array(0.0, 1.0)),
      (3L, Array(0.0, 0.0), Array(1.0, 1.0))
    ).toDF("id", "a", "b")
  }

  test("vec_dot matches HOF dot exactly") {
    val r = df.select(
      VectorExpressions.vecDot($"a", $"b").as("native"),
      Similarity.dot($"a", $"b").as("hof")
    ).collect()
    r.foreach(row => assert(row.getDouble(0) === row.getDouble(1)))
    assert(r(0).getDouble(0) === 32.0)
  }

  test("vec_cosine matches HOF cosine; zero norm -> null") {
    val r = df.select(
      $"id",
      VectorExpressions.vecCosine($"a", $"b").as("native")
    ).collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(math.abs(r(1L).get - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-15)
    assert(r(2L).get === 0.0)
    assert(r(3L).isEmpty) // zero-norm -> null, not NaN
  }

  test("vec_d2 matches the aggregate(zip_with) spelling bit-exactly") {
    val hof = aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    val r = df.select(VectorExpressions.vecD2($"a", $"b").as("native"), hof.as("hof")).collect()
    r.foreach(row => assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
      java.lang.Double.doubleToLongBits(row.getDouble(1))))
    assert(r(0).getDouble(0) === 27.0)
    // length mismatch -> null
    val m = df.select(VectorExpressions.vecD2($"a", array(lit(1.0))).as("d")).collect()
    assert(m.forall(_.isNullAt(0)))
  }

  test("vec_sub matches the zip_with spelling element-exactly") {
    val r = df.select(
      VectorExpressions.vecSub($"a", $"b").as("native"),
      zip_with($"a", $"b", (x, y) => x - y).as("hof")
    ).collect()
    r.foreach(row => assert(row.getSeq[Double](0) === row.getSeq[Double](1)))
    assert(r(0).getSeq[Double](0) === Seq(-3.0, -3.0, -3.0))
    val m = df.select(VectorExpressions.vecSub($"a", array(lit(1.0))).as("d")).collect()
    assert(m.forall(_.isNullAt(0)))
  }

  test("length mismatch -> null") {
    val d2 = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(d2.select(VectorExpressions.vecDot($"a", $"b")).head().isNullAt(0))
  }

  test("reachable from SQL") {
    df.createOrReplaceTempView("vecs")
    val got = spark.sql("select vec_cosine(a, a) from vecs where id = 1").head().getDouble(0)
    assert(math.abs(got - 1.0) < 1e-15)
  }

  test("survives whole-stage codegen over a real scan") {
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val q = emb.filter($"vec_id" === 0).select($"v".as("qv"))
    val joined = emb.crossJoin(broadcast(q))
    val native = joined.select(VectorExpressions.vecCosine($"v", $"qv").as("c"))
      .agg(sum("c")).head().getDouble(0)
    val hof = joined.select(Similarity.cosine($"v", $"qv").as("c"))
      .agg(sum("c")).head().getDouble(0)
    assert(math.abs(native - hof) < 1e-9)
  }
}
