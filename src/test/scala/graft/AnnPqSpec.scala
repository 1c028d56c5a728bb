package graft

import org.apache.spark.sql.functions._

import graft.ann.Similarity

/** Product-quantization quality gates (Jégou et al. TPAMI 2011 shapes):
  * Lloyd training must not increase the k-means distortion over the
  * seed codebook, codes must be well-formed m-length vectors over
  * [0, ksub), and the IVF-PQ composition (coarse cells → residual PQ
  * codes → ADC shortlist → exact re-rank) must hold recall@10 at the
  * exact-IVF level at the same nProbe — PQ compresses the scan, it must
  * not cost meaningful recall once the shortlist re-ranks exactly.
  */
class AnnPqSpec extends SparkSuite {

  import spark.implicits._

  private val m = 8
  private val ksub = 16
  private val dsub = 8

  test("trainPq: distortion monotone vs seed, codes well-formed, codebook complete") {
    val corpus = Tables
      .embeddings(spark, sf0001)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val seed = Similarity.pqSeedCodebook(corpus, m, ksub, dsub)
    val trained = Similarity.trainPq(spark, corpus, m, ksub, dsub, iters = 3)

    assert(trained.count() === m.toLong * ksub, "one centroid per (sub_id, code)")
    assert(trained.filter(size($"centroid") =!= dsub).count() === 0)

    val d0 = Similarity.pqDistortion(corpus, seed, m, dsub)
    val d3 = Similarity.pqDistortion(corpus, trained, m, dsub)
    assert(d3 <= d0 + 1e-9, s"Lloyd must not increase distortion: seed=$d0 trained=$d3")

    val codes = Similarity.pqAssign(corpus, trained, m, dsub)
    assert(codes.count() === corpus.count(), "every vector encoded")
    assert(codes.filter(size($"codes") =!= m).count() === 0, s"$m codes per vector")
    assert(
      codes.filter(exists($"codes", c => c < 0 || c >= ksub)).count() === 0,
      s"codes must lie in [0, $ksub)"
    )
  }

  test("SQ8: codes bounded, reconstruction error under one step, shortlist+rerank recall >= 0.9") {
    val corpus = Tables
      .embeddings(spark, sf0001)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val dim = 64
    val bounds = Similarity.sqTrain(corpus)
    val codes = Similarity.sqAssign(corpus, bounds, dim)
    assert(codes.filter(size($"codes") =!= dim).count() === 0)
    assert(codes.filter(exists($"codes", c => c < 0 || c > 255)).count() === 0, "int8 range")

    // dequantization error is bounded by one quantization step per dim
    val b = bounds.collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val joined = corpus.join(codes, Seq("vec_id")).select($"v", $"codes").collect()
    joined.foreach { r =>
      val v = r.getSeq[Double](0); val cs = r.getSeq[Int](1)
      (0 until dim).foreach { d =>
        val (lo, hi) = b(d); val step = (hi - lo) / 255.0
        val err = math.abs(v(d) - (lo + cs(d) * step))
        assert(err <= step + 1e-12, s"dim $d reconstruction error $err exceeds step $step")
      }
    }

    // SQ approx ordering is near-exact: top-50 shortlist + exact rerank
    // recovers >= 0.9 of the true top-10
    val queries = (0L until 10L)
    val recalls = queries.map { q =>
      val brute = Similarity
        .bruteForceTopK(spark, sf0001, queryId = q, k = 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val qv = corpus.filter($"vec_id" === q).select($"v").head().getSeq[Double](0)
      val short = Similarity
        .sqDistances(codes.filter($"vec_id" =!= q), bounds, qv, dim)
        .orderBy(round($"sq_dist", 9).asc, $"vec_id".asc)
        .limit(50)
      val rr = corpus
        .join(org.apache.spark.sql.functions.broadcast(short.select("vec_id")), Seq("vec_id"))
        .select($"vec_id", round(Similarity.cosine($"v", lit(qv.toArray)), 6).as("cs"))
        .orderBy($"cs".desc, $"vec_id".asc)
        .limit(10)
        .collect().map(_.getLong(0)).toSet
      rr.intersect(brute).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"SQ8 shortlist+rerank recall@10 = $mean ($recalls)")
  }

  test("IVF-PQ recall@10 at nProbe=4: monotone in shortlist, within 0.05 of exact IVF, >= 0.85") {
    val emb = Tables.embeddings(spark, sf0001)
    val corpus = emb.select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val centroids = Similarity.trainIvf(spark, sf0001, nCells = 8, iters = 4)
    val assigned = Similarity.ivfAssign(emb, centroids).persist()
    // residual corpus: PQ codebooks are trained on v - cell_centroid so
    // each cell's quantization error is centered (the IVF-PQ design)
    val residuals = assigned
      .join(broadcast(centroids), Seq("cell_id"))
      .select($"vec_id", zip_with($"v", $"centroid", (a, b) => a - b).as("v"), $"cell_id")
      .persist()
    val pqCb = Similarity.trainPq(spark, residuals.select($"vec_id", $"v"), m, ksub, dsub, iters = 3)
    val codes = Similarity
      .pqAssign(residuals.select($"vec_id", $"v"), pqCb, m, dsub)
      .join(residuals.select($"vec_id", $"cell_id"), Seq("vec_id"))
      .persist()

    val queries = (0L until 10L)
    val bruteByQ = queries.map { q =>
      q -> Similarity
        .bruteForceTopK(spark, sf0001, queryId = q, k = 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }.toMap
    val qvByQ = queries.map { q =>
      q -> corpus.filter($"vec_id" === q).select($"v").head().getSeq[Double](0)
    }.toMap

    def pqRecall(shortlist: Int): Double = {
      val rs = queries.map { q =>
        val got = Similarity
          .ivfPqSearch(
            spark,
            assigned.filter($"vec_id" =!= q),
            centroids,
            pqCb,
            codes.filter($"vec_id" =!= q),
            qvByQ(q),
            k = 10,
            nProbe = 4,
            shortlist = shortlist,
            dsub = dsub
          )
          .select("vec_id").collect().map(_.getLong(0)).toSet
        got.intersect(bruteByQ(q)).size / 10.0
      }
      rs.sum / rs.size
    }
    val exactIvf = {
      val rs = queries.map { q =>
        val got = Similarity
          .ivfSearch(spark, assigned.filter($"vec_id" =!= q), centroids, qvByQ(q), k = 10, nProbe = 4)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        got.intersect(bruteByQ(q)).size / 10.0
      }
      rs.sum / rs.size
    }

    val r75 = pqRecall(75)
    val r150 = pqRecall(150)
    assigned.unpersist(); residuals.unpersist(); codes.unpersist()

    // growing the ADC shortlist can only hand the exact re-rank a
    // superset — any top-10 displacement is by another true neighbour
    assert(r150 >= r75 - 1e-9, s"recall must not decrease with shortlist: 75=$r75 150=$r150")
    assert(
      r150 >= exactIvf - 0.05,
      s"IVF-PQ (shortlist=150) must hold the exact-IVF recall at nProbe=4: pq=$r150 exact=$exactIvf"
    )
    assert(r150 >= 0.85, s"recall@10 floor at nProbe=4, shortlist=150: $r150")
  }
}
