package graft

import graft.ann.EmbedStats

class EmbedStatsSpec extends SparkSuite {
  import spark.implicits._

  test("covariance exact on a planted 2D set; diagonal non-negative on real embeddings") {
    val vecs = Seq(Seq(1.0, 2.0), Seq(3.0, 6.0), Seq(5.0, 10.0)).toDF("e")
    val cov = EmbedStats
      .covariance(vecs, 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // mean (3, 6); sample covariance: xx = 4, xy = 8, yy = 16
    assert(cov((1L, 1L)) === 4.0)
    assert(cov((1L, 2L)) === 8.0)
    assert(cov((2L, 2L)) === 16.0)

    val real = EmbedStats
      .covariance(
        Tables.embeddings(spark, sf0001).select(org.apache.spark.sql.functions.col("embedding").cast("array<double>").as("e")),
        64
      )
      .collect()
    assert(real.length === 64 * 65 / 2)
    real.filter(r => r.getLong(0) == r.getLong(1)).foreach { r =>
      assert(r.getDouble(2) >= 0.0, s"variance of dim ${r.getLong(0)} negative")
    }
  }

  test("power iteration recovers a planted dominant direction") {
    import org.apache.spark.sql.functions._
    // dim 5 carries variance 100; all other dims carry ~1e-4
    val vecs = spark
      .range(100)
      .select(
        transform(
          sequence(lit(1), lit(64)),
          j =>
            when(j === 5, when(pmod(col("id"), lit(2)) === 0, lit(10.0)).otherwise(lit(-10.0)))
              .otherwise(pmod(col("id") * j, lit(7)).cast("double") / 1000.0)
        ).as("e")
      )
    val ut = EmbedStats.covariance(vecs, 64).select(col("i"), col("j"), col("cov").as("c"))
    val full = ut.union(ut.filter(col("i") =!= col("j")).select(col("j").as("i"), col("i").as("j"), col("c")))
    val pc = EmbedStats.powerIteration(full, 64, 10).collect()
    val load = pc.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(load(5L)) > 0.999, s"dim 5 must dominate, got ${load(5L)}")
    val lambda = pc.head.getDouble(2)
    assert(lambda > 90 && lambda < 110, s"eigenvalue ~ dim-5 variance, got $lambda")
  }
}
