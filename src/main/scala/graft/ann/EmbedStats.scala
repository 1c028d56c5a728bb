package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding-matrix statistics — the covariance matrix Σ of the vector
  * table, the preprocessing primitive under whitening, PCA, and the
  * Mahalanobis scoring ANN re-rankers use. Computed from SUMS (Σxᵢxⱼ,
  * Σxᵢ, n — the same mergeable-state algebra as [[graft.operators
  * .Incremental]]) accumulated by ONE custom [[Aggregator]]: every
  * partition folds its rows into a single (1 + d + d(d+1)/2)-double
  * moment buffer (n, per-dim sums, upper-triangle product sums) with a
  * tight multiply-add loop — no per-row (i, j) row blow-up, no 2 080-
  * key hash probe per row. The shuffle is one buffer per partition
  * (~17 KB at d = 64), independent of row count — the shape that holds
  * at 10⁹ vectors; the finished 1-row moment vector fans back out to
  * (i, j, cov) against the broadcast pair domain.
  */
object EmbedStats {

  /** One-pass mergeable moment state: [n, Σx₁..Σx_d, Σxᵢxⱼ (i ≤ j,
    * row-major upper triangle)]. */
  private final class Moments(d: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    private val tri = d * (d + 1) / 2
    override def zero: Array[Double] = new Array[Double](1 + d + tri)
    override def reduce(b: Array[Double], e: Seq[Double]): Array[Double] = {
      val x = e match {
        case w: scala.collection.immutable.ArraySeq.ofDouble => w.unsafeArray
        case _ => e.toArray
      }
      require(x.length == d, s"embedding dim drift: ${x.length} != $d")
      b(0) += 1.0
      var i = 0
      var k = 1 + d
      while (i < d) {
        val xi = x(i)
        b(1 + i) += xi
        var j = i
        while (j < d) { b(k) += xi * x(j); k += 1; j += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var k = 0
      while (k < a.length) { a(k) += b(k); k += 1 }
      a
    }
    override def finish(b: Array[Double]): Seq[Double] = b.toSeq
    override def bufferEncoder: ExpressionEncoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    override def outputEncoder: ExpressionEncoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** vecs(e: array<double> of dim d) → (i, j, cov) upper triangle,
    * sample covariance, 6dp. */
  def covariance(vecs: DataFrame, d: Int): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val momentsAgg = udaf(new Moments(d), ExpressionEncoder[Seq[Double]]())
    val m = vecs.agg(momentsAgg($"e").as("m")) // 1 row: the moment vector
    // fan the finished moments back out to the (i, j) triangle; k is the
    // row-major flat index of (i, j), both 1-based
    val pairs = s.createDataFrame(
      (for { i <- 1 to d; j <- i to d } yield (i.toLong, j.toLong)).zipWithIndex
        .map { case ((i, j), k) => (i, j, k) }
    ).toDF("i", "j", "k")
    pairs
      .crossJoin(broadcast(m))
      .select(
        $"i",
        $"j",
        element_at($"m", 1).as("n"),
        element_at($"m", ($"i" + 1).cast("int")).as("sa"),
        element_at($"m", ($"j" + 1).cast("int")).as("sb"),
        element_at($"m", ($"k" + lit(2 + d)).cast("int")).as("sij")
      )
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

  /** Top eigenvector by power iteration over the DISTRIBUTED
    * covariance matrix — PCA's first component without ever
    * materializing the matrix on the driver: each iteration is one
    * matvec (matrix ⋈ vector on the column index + a keyed sum), one
    * 1-row norm aggregate, one normalize. The vector is d rows, the
    * matrix d² — both DataFrames; at 10⁵ dims this is the same code
    * (the matrix shuffle dominates; the vector side broadcasts).
    *
    * ENGINE LOCKSTEP: the iterate re-rounds to 8dp after every
    * normalize, so both engines carry bit-identical vectors into the
    * next matvec (the float version of pageRank's integer-arithmetic
    * trick); power iteration is contractive toward the dominant
    * eigenvector, so the rounding never accumulates. Sign is pinned by
    * the all-positive start vector. */
  def powerIteration(covFull: DataFrame, d: Int, iters: Int): DataFrame = {
    val s = covFull.sparkSession
    import s.implicits._
    require(d == 64, "start value written as an exact double for d = 64")
    var (v, vBlocks) = graft.operators.Staged.checkpointOwned(
      s.range(1, d + 1).select($"id".as("i"), lit(0.125).as("x")) // 1/√64, exact
    )
    var lastNorm = 0.0
    for (t <- 1 to iters) {
      val w = covFull
        .join(v.select($"i".as("j"), $"x"), Seq("j"))
        .groupBy($"i")
        .agg(sum($"c" * $"x").as("w"))
      val nrm = w.agg(sqrt(sum($"w" * $"w")).as("nrm"))
      val (nv, nvBlocks) = graft.operators.Staged.checkpointOwned(
        w.crossJoin(broadcast(nrm)).select($"i", round($"w" / $"nrm", 8).as("x"))
      )
      // the norm is materialized (1-row collect, bounded) BEFORE the
      // previous iterate's blocks are released — its lazy plan reads them
      if (t == iters) lastNorm = nrm.head().getDouble(0)
      graft.operators.Staged.release(vBlocks)
      v = nv
      vBlocks = nvBlocks
    }
    graft.operators.Staged.register(vBlocks)
    v.select($"i", (round($"x", 6) + 0.0).as("loading"), round(lit(lastNorm), 4).as("eigenvalue"))
  }

  /** ◆ q_pca — first principal component of the embedding covariance
    * (10 power iterations on the q_covariance matrix). */
  def pcaQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ut = covarianceQuery(s, dir).select($"i", $"j", $"cov".as("c"))
    // materialize Σ ONCE before the loop: each power iteration runs an
    // eager action, and an unstaged covariance plan would re-execute the
    // full embeddings scan + pair-join ×iters (10 corpus scans where 1
    // suffices — the scale-killer at 10⁹ vectors). The d² staged matrix
    // is tiny (4 096 rows); released with the session's staged pool.
    val (full, fullBlocks) = graft.operators.Staged.checkpointOwned(
      ut.union(ut.filter($"i" =!= $"j").select($"j".as("i"), $"i".as("j"), $"c"))
    )
    graft.operators.Staged.register(fullBlocks)
    powerIterationLocal(full, d = 64, iters = 10)
  }

  /** Driver-side power iteration over the COLLECTED covariance — the
    * r11 replacement for the 10 distributed jobs [[powerIteration]]
    * runs. Scale argument: the matrix is d×d with d = the embedding
    * dimension (codebook-bounded, 4 096 doubles at d = 64) — the same
    * driver-scale boundary as the k-means centroids — while the
    * EXPENSIVE stage, the covariance itself, stays fully distributed.
    * Arithmetic is replicated exactly (ascending-j dot products,
    * Spark's HALF_UP rounding via BigDecimal at 8 dp per iterate), so
    * the emission matches [[powerIteration]] and the oracle digit for
    * digit. Official bench: q_pca 4.6 s → the covariance cost alone. */
  def powerIterationLocal(covFull: DataFrame, d: Int, iters: Int): DataFrame = {
    val s = covFull.sparkSession
    import s.implicits._
    require(d == 64, "start value written as an exact double for d = 64")
    val c = Array.ofDim[Double](d, d)
    covFull.select($"i", $"j", $"c").collect().foreach { r =>
      c(r.getLong(0).toInt - 1)(r.getLong(1).toInt - 1) = r.getDouble(2)
    }
    def round(x: Double, scale: Int): Double =
      java.math.BigDecimal.valueOf(x).setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue
    var x = Array.fill(d)(0.125) // 1/√64, exact
    var lastNorm = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d) { i =>
        var acc = 0.0
        var j = 0
        while (j < d) { acc += c(i)(j) * x(j); j += 1 }
        acc
      }
      var n2 = 0.0
      var i = 0
      while (i < d) { n2 += w(i) * w(i); i += 1 }
      lastNorm = math.sqrt(n2)
      x = w.map(v => round(v / lastNorm, 8))
    }
    val rows = (0 until d).map(i => ((i + 1).toLong, round(x(i), 6) + 0.0, round(lastNorm, 4)))
    rows.toDF("i", "loading", "eigenvalue")
  }
}
