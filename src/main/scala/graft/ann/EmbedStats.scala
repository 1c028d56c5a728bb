package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding-matrix statistics — the covariance matrix Σ of the vector
  * table, the preprocessing primitive under whitening, PCA, and the
  * Mahalanobis scoring ANN re-rankers use. Computed from SUMS (Σxᵢxⱼ,
  * Σxᵢ, n — the same mergeable-state algebra as [[graft.operators
  * .Incremental]]), so it is one distributed pass: each row scatters
  * its d(d+1)/2 upper-triangle products against a BROADCAST pair
  * domain (2 080 rows for d = 64 — a bounded nested-loop join, never a
  * CartesianProduct), and the map-side partial agg collapses the
  * blow-up within each partition before any shuffle. The shuffle is
  * therefore pair-domain-sized (2 080 rows per partition), independent
  * of row count — the shape that holds at 10⁹ vectors.
  */
object EmbedStats {

  /** vecs(e: array<double> of dim d) → (i, j, cov) upper triangle,
    * sample covariance, 6dp. */
  def covariance(vecs: DataFrame, d: Int): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val dims = s.range(1, d + 1).select($"id".as("i"))
    val pairs = dims
      .join(dims.select($"i".as("j")), $"j" >= $"i")
      .select($"i", $"j")
    val prods = vecs
      .join(broadcast(pairs))
      .select($"i", $"j", (element_at($"e", $"i".cast("int")) * element_at($"e", $"j".cast("int"))).as("p"))
      .groupBy($"i", $"j")
      .agg(sum($"p").as("sij"))
    val sums = vecs
      .join(broadcast(dims))
      .select($"i", element_at($"e", $"i".cast("int")).as("x"))
      .groupBy($"i")
      .agg(sum($"x").as("si"))
    val n = vecs.agg(count(lit(1)).as("n"))
    prods
      .join(broadcast(sums.select($"i", $"si".as("sa"))), Seq("i"))
      .join(broadcast(sums.select($"i".as("j"), $"si".as("sb"))), Seq("j"))
      .crossJoin(broadcast(n))
      // + 0.0 collapses IEEE −0.0 (a tiny negative covariance rounding
      // to zero keeps its sign bit otherwise, and engines then differ)
      .select($"i", $"j", (round(($"sij" - $"sa" * $"sb" / $"n") / ($"n" - 1), 6) + 0.0).as("cov"))
  }

  /** ◆ q_covariance — 64×64 upper triangle over the embeddings. */
  def covarianceQuery(s: SparkSession, dir: String): DataFrame =
    covariance(
      Tables.embeddings(s, dir).select(col("embedding").cast("array<double>").as("e")),
      d = 64
    )
}
