package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Lloyd's k-means (Lloyd 1982 / MacQueen 1967) over the embedding
  * table — the centroid trainer that the IVF coarse quantizer, the PQ
  * sub-quantizer codebooks, SemDeDup cells, and cluster-balanced
  * sampling all presuppose. Built the way a 10⁹-vector trainer must
  * be:
  *
  *   - ASSIGNMENT is map-only. The k·d centroid matrix is bounded
  *     (k = 8, d = 64 → 512 doubles), so it rides the plan as
  *     literals — each row computes its k codegen'd
  *     `aggregate(zip_with(...))` distances and takes the argmin with
  *     no join and no shuffle at all. This is the MLlib shape:
  *     broadcast centroids, one pass per round.
  *   - UPDATE is one partial-agg pass. `posexplode` scatters
  *     (cluster, dim, x); the map-side combine collapses each
  *     partition to ≤ k·d rows before the shuffle, so the exchange is
  *     centroid-sized and row-count independent; k·d rows reach the
  *     driver (the bounded-collect pattern [[Coreset]] and the IVF
  *     seeder already use).
  *
  * ENGINE LOCKSTEP (the [[EmbedStats.powerIteration]] float trick):
  * distances round to 4dp BEFORE the argmin (ties then break on the
  * smaller cluster id), and each new centroid coordinate is
  * round(round(sum, 4) / n, 8) — the quotient derives from the
  * already-rounded sum so both engines divide bit-identical inputs
  * (the q_incr_agg rounding-boundary lesson). Seeds are the k lowest
  * vec_ids, making the whole fit a pure function of the vector set.
  * Empty clusters keep their previous centroid.
  */
object Kmeans {

  // native codegen'd Σ(a−b)² (same left-to-right IEEE accumulation the
  // aggregate(zip_with(…)) spelling had — bit-identical, but the k
  // distance columns stay inside whole-stage codegen instead of k
  // interpreted lambda evaluations per row)
  private def d2To(center: Seq[Double]): Column =
    round(graft.plans.VectorExpressions.vecD2(col("e"), typedLit(center)), 4)

  /** One assignment pass: (vec_id, e, c, dist) with c = argmin over
    * the k literal centroids, ties to the smaller cluster id. */
  private def assign(vecs: DataFrame, cents: IndexedSeq[Seq[Double]]): DataFrame = {
    graft.plans.VectorExpressions.register(vecs.sparkSession)
    val withD = vecs.select(
      col("vec_id") +: col("e") +: cents.zipWithIndex.map { case (cv, j) => d2To(cv).as(s"d$j") }: _*
    )
    val minD = least(cents.indices.map(j => col(s"d$j")): _*)
    val cluster = cents.indices.tail.foldLeft(when(col("d0") === minD, 0L)) { (acc, j) =>
      acc.when(col(s"d$j") === minD, j.toLong)
    }
    withD.select(col("vec_id"), col("e"), cluster.as("c"), minD.as("dist"))
  }

  /** vecs(vec_id, e: array<double>) → (cluster, n_points, inertia)
    * after `iters` assignment passes and `iters − 1` centroid updates. */
  def lloyd(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    var cents: IndexedSeq[Seq[Double]] = vecs
      .orderBy(col("vec_id"))
      .limit(k)
      .collect()
      .sortBy(_.getLong(0))
      .toIndexedSeq
      .map(_.getSeq[Double](1))
    var assigned = assign(vecs, cents)
    for (_ <- 2 to iters) {
      val m = assigned
        .select(col("c"), posexplode(col("e")).as(Seq("i", "x")))
        .groupBy(col("c"), col("i"))
        .agg(round(round(sum(col("x")), 4) / count(lit(1)), 8).as("x"))
        .collect()
      val upd = m
        .groupBy(_.getLong(0))
        .map { case (c, rows) => c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
      cents = cents.indices.map(j => upd.getOrElse(j.toLong, cents(j)))
      assigned = assign(vecs, cents)
    }
    assigned
      .groupBy(col("c").as("cluster"))
      .agg(count(lit(1)).as("n_points"), (round(sum(col("dist")), 4) + 0.0).as("inertia"))
  }

  /** ◆ q_kmeans — 8 clusters, 5 Lloyd rounds over the embeddings. */
  def kmeansQuery(s: SparkSession, dir: String): DataFrame =
    lloyd(
      Tables
        .embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e")),
      k = 8,
      iters = 5
    )
}
