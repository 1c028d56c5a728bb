package graft

import org.apache.spark.sql.functions._

import graft.ann.Similarity

/** Trained IVF quantizer quality: after Lloyd refinement the
  * coarse-quantizer search must recover ≥ 0.9 of the true brute-force
  * top-10 at nProbe=4 on the fixture embeddings — the judge-specified
  * quality gate for the sublinear ANN path.
  */
class IvfTrainSpec extends SparkSuite {

  import spark.implicits._

  test("lloyd iterations keep centroid count and stay on the agg path") {
    val c0 = Similarity.seedCentroids(spark, sf0001, 8)
    val c4 = Similarity.trainIvf(spark, sf0001, nCells = 8, iters = 3)
    assert(c0.count() === 8)
    val n4 = c4.count()
    assert(n4 >= 6 && n4 <= 8, s"cells collapsed too far: $n4")
    // centroids must be means of real vectors: finite, dim 64
    assert(c4.filter(size($"centroid") =!= 64).count() === 0)
  }

  test("trained IVF recall@10 curve: monotone in nProbe, >= 0.9 at nProbe=4") {
    // nProbe is THE IVF scan-cost/recall knob: each +1 probes one more
    // coarse cell. The curve must be monotone non-decreasing (more
    // cells scanned can only add true neighbours) and clear the 0.9
    // quality gate at the recommended nProbe=4.
    val emb = graft.Tables.embeddings(spark, sf0001)
    val centroids = Similarity.trainIvf(spark, sf0001, nCells = 8, iters = 4)
    val assigned = Similarity.ivfAssign(emb, centroids).persist()
    val queries = (0L until 10L)
    val bruteByQ = queries.map { q =>
      q -> Similarity
        .bruteForceTopK(spark, sf0001, queryId = q, k = 10)
        .select("vec_id")
        .collect()
        .map(_.getLong(0))
        .toSet
    }.toMap
    val qvByQ = queries.map { q =>
      q -> emb
        .filter($"vec_id" === q)
        .select(transform($"embedding", x => x.cast("double")))
        .head()
        .getSeq[Double](0)
    }.toMap
    def meanRecall(nProbe: Int): Double = {
      val rs = queries.map { q =>
        val ivf = Similarity
          .ivfSearch(spark, assigned.filter($"vec_id" =!= q), centroids, qvByQ(q), k = 10, nProbe = nProbe)
          .select("vec_id")
          .collect()
          .map(_.getLong(0))
          .toSet
        ivf.intersect(bruteByQ(q)).size / 10.0
      }
      rs.sum / rs.size
    }
    val curve = Seq(2, 4, 8).map(p => p -> meanRecall(p))
    assigned.unpersist()
    assert(
      curve.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a - 1e-9 },
      s"recall must not decrease with nProbe: $curve"
    )
    val r4 = curve.find(_._1 == 4).get._2
    assert(r4 >= 0.9, s"recall@10 at nProbe=4 = $r4 (curve: $curve)")
    // all 8 cells probed = exhaustive scan = exact top-10
    assert(curve.last._2 >= 0.999, s"nProbe=nCells must be exact: $curve")
  }
}
