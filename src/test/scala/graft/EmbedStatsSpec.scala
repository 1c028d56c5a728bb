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
}
