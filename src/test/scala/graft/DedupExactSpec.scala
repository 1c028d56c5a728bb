package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.ann.Similarity
import graft.text.{Dedup, TextOps}

/** Guarantees behind the oracle-checkable dedup rewrites: the
  * engine-neutral hash, minhash estimate bounds, and the completeness
  * of exact-near-dup norm blocking.
  */
class DedupExactSpec extends SparkSuite {
  import spark.implicits._

  test("md5Hash60 equals the 15-hex-char parse it replaces") {
    val samples = Gen.listOfN(200, Gen.asciiPrintableStr).sample.get :+ "" :+ "päöü✓"
    samples.foreach { s =>
      val hex = java.security.MessageDigest
        .getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_))
        .mkString
      assert(TextOps.md5Hash60(s) === java.lang.Long.parseLong(hex.substring(0, 15), 16))
    }
  }

  test("minhash permutation constants stay in GF(p) and a*x+b cannot overflow") {
    (0 until 16).foreach { i =>
      val (a, b) = (Dedup.minhashA(i), Dedup.minhashB(i))
      assert(a > 0 && a < Dedup.MinhashP && b >= 0 && b < Dedup.MinhashP)
      // max a * max residue + b < 2^63
      assert(BigInt(a) * (Dedup.MinhashP - 1) + b < BigInt(Long.MaxValue))
    }
  }

  test("minhash: est_jaccard in (0,1], exact dups estimate 1.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text").collect()
    val m = pairs.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((1L, 2L)) === 1.0)
    assert(m.values.forall(v => v > 0 && v <= 1.0))
    assert(!m.contains((1L, 3L)) && !m.contains((2L, 3L)))
  }

  test("simhash 60-bit: signatures fit in 60 bits; identical docs collide") {
    val docs = Seq(
      (1L, "spark distributed query engine for large scale analytics"),
      (2L, "spark distributed query engine for large scale analytics"),
      (3L, "entirely unrelated words about cooking pasta tonight")
    ).toDF("doc_id", "text")
    val sigs = docs.select($"doc_id", Dedup.simhashUdf($"text").as("sig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.values.forall(v => v >= 0 && v < (1L << 60)))
    assert(sigs(1L) === sigs(2L))
    val pairs = Dedup.simhashCandidates(docs, "doc_id", "text").collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(2) == 0))
  }

  test("embedNearDupExact: norm blocking is complete vs brute force") {
    val pairs = Dedup.embedNearDupExact(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same (small) table
    val vs = Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val brute = (for {
      (ia, va) <- vs; (ib, vb) <- vs if ia < ib
      d2 = va.indices.map(j => (va(j) - vb(j)) * (va(j) - vb(j))).sum
      if math.sqrt(d2) <= 1.05
    } yield (ia, ib)).toSet
    assert(pairs === brute)
    assert(brute.nonEmpty, "fixture should contain at least one near-dup pair")
  }

  test("LSH planes are deterministic and in [-1, 1]") {
    for (t <- 0 until 3; b <- 0 until 3; j <- 0 until 5) {
      val w = Similarity.planeEntry(t, b, j)
      assert(w >= -1.0 && w <= 1.0)
      assert(w === Similarity.planeEntry(t, b, j))
    }
  }

  test("tfidf: 3 ranked terms per source, scores positive") {
    val rows = TextOps.tfidfQuery(spark, sf0001).collect()
    val bySource = rows.groupBy(_.getString(0))
    bySource.values.foreach { rs =>
      assert(rs.map(_.getInt(3)).sorted.toSeq === Seq(1, 2, 3))
      // scores are ranked non-increasing
      val scores = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }
}
