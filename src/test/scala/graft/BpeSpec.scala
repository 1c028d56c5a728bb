package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** Distributed BPE training vs a serial reference implementation of
  * Sennrich et al. 2016 — identical merge tables (count ties broken
  * lexicographically), plus the classic hand-checkable example and the
  * encode half's monotone compression.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  /** Serial reference BPE (the paper's algorithm, ~20 lines): word
    * frequency map → repeat (count adjacent pairs, merge argmax). */
  private def serialBpe(texts: Seq[String], nMerges: Int): Seq[(String, String, Long)] = {
    val wf = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(t => "\\w+".r.findAllIn(t.toLowerCase).foreach(w => wf(w) = wf.getOrElse(w, 0L) + 1))
    var vocab: Map[Vector[String], Long] = wf.toMap.map { case (w, f) =>
      val cs = w.map(_.toString).toVector
      (cs.init :+ (cs.last + Bpe.Eow), f)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    var continue = true
    while (i < nMerges && continue) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach { case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + f; case _ => () }
      }
      if (pairs.isEmpty) continue = false
      else {
        val ((a, b), n) = pairs.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((a, b, n))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val r = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) { r += a + b; j += 2 }
            else { r += syms(j); j += 1 }
          }
          r.toVector
        }(_._2)(_ + _)
        i += 1
      }
    }
    out.toSeq
  }

  test("classic example: 'low/lower/newest/widest' learns the expected first merges") {
    // Sennrich et al. §3.2's flavor of corpus: 'est</w>' family wins
    val corpus = Seq.fill(5)("low").mkString(" ") + " " +
      Seq.fill(2)("lower").mkString(" ") + " " +
      Seq.fill(6)("newest").mkString(" ") + " " +
      Seq.fill(3)("widest").mkString(" ")
    val docs = Seq(corpus).toDF("text")
    val merges = Bpe
      .trainBpe(spark, docs, "text", 4)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // (e,s) and (s,t</w>) both count 9 (newest x6 + widest x3): the
    // lexicographic tie-break picks (e,s); the merged 'es' then pairs
    // with t</w> x9; third comes (l,o) x7 from low/lower
    assert(merges.head === ((0, "e", "s", 9L)), s"first merge: $merges")
    assert(merges(1) === ((1, "es", "t</w>", 9L)), s"second merge: $merges")
    assert(merges(2) === ((2, "l", "o", 7L)), s"third merge: $merges")
    assert(merges.map(_._1).toSeq === Seq(0, 1, 2, 3), "ranks in order")
  }

  test("distributed == serial reference on real documents, byte-identical merge table") {
    val texts = Tables
      .documents(spark, sf0001)
      .filter($"doc_id" < 60)
      .select($"text")
      .collect()
      .map(_.getString(0))
      .toSeq
    val expected = serialBpe(texts, 12)
    val got = Bpe
      .trainBpe(spark, texts.toDF("text"), "text", 12)
      .orderBy($"rank")
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got === expected, s"\n got=$got\n exp=$expected")
  }

  test("applyBpe: more merges never increase the token count; zero merges = character count") {
    val docs = Tables.documents(spark, sf0001).filter($"doc_id" < 30).select($"doc_id", $"text")
    val merges = Bpe
      .trainBpe(spark, docs, "text", 10)
      .orderBy($"rank")
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq
    def totalTokens(ms: Seq[(String, String)]): Long =
      Bpe.applyBpe(docs, "text", ms).agg(sum($"n_bpe_tokens")).head().getLong(0)
    val t0 = totalTokens(Seq.empty)
    val t5 = totalTokens(merges.take(5))
    val t10 = totalTokens(merges)
    assert(t0 >= t5 && t5 >= t10, s"merges must compress monotonically: $t0 >= $t5 >= $t10")
    assert(t10 < t0, "ten merges on real text must actually compress")
    // zero merges: every word token = its character count (with the
    // end-of-word marker glued to the last char, not a separate symbol)
    val chars = docs
      .select(aggregate(regexp_extract_all(lower($"text"), lit("\\w+"), lit(0)), lit(0L), (acc, w) => acc + length(w)).as("n"))
      .agg(sum($"n")).head().getLong(0)
    assert(t0 === chars, "no merges -> one symbol per character")
  }
}
