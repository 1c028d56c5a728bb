package graft

import graft.text.Unigram

/** Unigram-LM tokenizer: the distributed hard-EM trainer must match an
  * independently-written serial reference (same pinned tie-breaks) on
  * a small corpus; the soft-EM forward-backward kernel must satisfy
  * the probabilistic identities (counts sum to expected piece total,
  * likelihood non-decreasing over EM); pruning never drops single
  * chars and hits the target size; Viterbi/tokenize edges. */
class UnigramSpec extends SparkSuite {

  import org.apache.spark.sql.functions._

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.toDF("text")
  }

  // ---------------------------------------------------------------
  // serial reference: seed + smoothing + Viterbi hard-EM, written as
  // straight per-word recursion (memoized), NOT the array scan the
  // engine uses — agreement is evidence, not tautology
  // ---------------------------------------------------------------

  private def serialWordFreq(texts: Seq[String]): Map[String, Long] =
    texts
      .flatMap(t => "\\w+".r.findAllIn(t.toLowerCase(java.util.Locale.ROOT)))
      .filter(w => w.nonEmpty && w.length <= Unigram.MaxWord)
      .groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }

  private def serialSeed(wf: Map[String, Long], nMulti: Int): Map[String, Long] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- wf; s <- 0 until w.length; l <- 1 to math.min(Unigram.MaxPiece, w.length - s))
      counts.updateWith(w.substring(s, s + l))(c => Some(c.getOrElse(0L) + f))
    val singles = counts.filter(_._1.length == 1)
    val multi = counts.toSeq
      .filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }
      .take(nMulti)
    (singles ++ multi).toMap
  }

  private def smooth(cnts: Map[String, Long]): Map[String, Double] = {
    val t = cnts.values.sum.toDouble + cnts.size.toDouble
    cnts.map { case (p, c) => p -> BigDecimal((c + 1) / t).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble }
  }

  /** Memoized best (value, pieces) into prefix length e; ties prefer
    * the smallest split position — the engine's pinned rule. */
  private def serialViterbi(w: String, p: Map[String, Double]): List[String] = {
    val memo = scala.collection.mutable.Map.empty[Int, (Double, List[String])]
    def best(e: Int): (Double, List[String]) =
      if (e == 0) (1.0, Nil)
      else memo.getOrElseUpdate(e, {
        var bv = -1.0
        var bp: List[String] = null
        for (s <- math.max(0, e - Unigram.MaxPiece) until e) { // ascending: first strict max wins = smallest s on ties
          p.get(w.substring(s, e)).foreach { pp =>
            val (v0, path) = best(s)
            val v = v0 * pp
            if (v > bv) { bv = v; bp = w.substring(s, e) :: path }
          }
        }
        (bv, bp)
      })
    best(w.length)._2.reverse
  }

  private def serialHardRound(wf: Map[String, Long], vocab: Map[String, Long]): Map[String, Long] = {
    val p = smooth(vocab)
    val counts = scala.collection.mutable.Map.empty[String, Long] ++ vocab.map { case (k, _) => k -> 0L }
    for ((w, f) <- wf; piece <- serialViterbi(w, p))
      counts(piece) = counts(piece) + f
    counts.toMap
  }

  test("trainHard matches the serial reference, rounds 0 through 2") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the lazy dog sleeps while the quick fox runs",
      "pack my box with five dozen liquor jugs",
      "quick quick lazy lazy the the the fox")
    val wf = serialWordFreq(texts)
    val seed = serialSeed(wf, 40)
    val r1 = serialHardRound(wf, seed)
    val r2 = serialHardRound(wf, r1)

    def collectVocab(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val eng0 = collectVocab(Unigram.seedVocab(spark, Unigram.wordFreq(docsDf(texts), "text"), 40))
    assert(eng0 == seed, "seed vocabulary diverged from the serial reference")
    val eng1 = collectVocab(Unigram.trainHard(spark, docsDf(texts), "text", rounds = 1, nMulti = 40))
    assert(eng1 == r1, "round-1 hard-EM counts diverged")
    val eng2 = collectVocab(Unigram.trainHard(spark, docsDf(texts), "text", rounds = 2, nMulti = 40))
    assert(eng2 == r2, "round-2 hard-EM counts diverged")
    // round-2 counts must still cover every corpus char occurrence:
    // each word's pieces concatenate to the word, so total piece chars
    // (weighted) equal total word chars (weighted)
    val pieceChars = r2.map { case (p, c) => p.length.toLong * c }.sum
    assert(pieceChars == wf.map { case (w, f) => w.length.toLong * f }.sum)
  }

  test("expectedCounts: occurrences sum to expected piece count; degenerate single-path word is exact") {
    // vocab where "ab" has two segmentations: [ab] and [a,b]
    val p = Map("a" -> 0.2, "b" -> 0.2, "ab" -> 0.3)
    val ec = Unigram.expectedCounts("ab", p).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // z = p(ab) + p(a)p(b) = 0.3 + 0.04 = 0.34
    assert(math.abs(ec("ab") - 0.3 / 0.34) < 1e-12)
    assert(math.abs(ec("a") - 0.04 / 0.34) < 1e-12)
    assert(math.abs(ec("b") - 0.04 / 0.34) < 1e-12)
    // single possible path: expectations are exactly 1
    val ec2 = Unigram.expectedCounts("xy", Map("x" -> 0.1, "y" -> 0.1)).toMap
    assert(math.abs(ec2("x") - 1.0) < 1e-12 && math.abs(ec2("y") - 1.0) < 1e-12)
    // unsegmentable word yields nothing rather than NaNs
    assert(Unigram.expectedCounts("qq", Map("a" -> 1.0)).isEmpty)
  }

  test("trainSoft: hits the target size, keeps every single char, probabilities normalize") {
    val texts = Seq(
      "aaa bbb aaa ccc abab abab baba",
      "aaa abab ccc ccc bbb abab",
      "the cat the cat the mat")
    val model = Unigram.trainSoft(spark, docsDf(texts), "text", targetSize = 12, nMultiSeed = 60)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(model.size == 12, s"vocab size ${model.size} != 12")
    val singles = serialWordFreq(texts).keys.flatMap(_.toSeq).map(_.toString).toSet
    assert(singles.subsetOf(model.keySet), "a single char was pruned")
    assert(math.abs(model.values.sum - 1.0) < 1e-9)
    // frequent bigram "ab" should out-probability a rare multi piece it competes with
    assert(model.keySet.exists(_.length > 1), "no multi-char piece survived pruning")
  }

  test("tokenize: pieces concatenate back to each word; unknown chars fall back to <unk>") {
    val texts = Seq("hello world", "hello hello spark")
    val vocab = Unigram.trainHard(spark, docsDf(texts), "text", rounds = 1, nMulti = 30)
    val probs = Unigram.smoothedProbs(vocab).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rows = Unigram.tokenize(spark, docsDf(Seq("hello spark world")), "text", probs)
      .select(col("pieces"))
      .collect()
    val pieces = rows.head.getSeq[String](0)
    assert(pieces.mkString == "hellosparkworld")
    // word with a char absent from the vocab → per-char <unk> for that word
    val unk = Unigram.tokenize(spark, docsDf(Seq("hzq")), "text", Map("h" -> 0.5))
      .select(col("pieces")).collect().head.getSeq[String](0)
    assert(unk == Seq("<unk>", "<unk>", "<unk>"))
  }

  test("viterbi edges: empty map, tie pinned to smallest split position") {
    assert(Unigram.viterbi("abc", Map.empty[String, Double]).isEmpty)
    // "aa" with p(a)=x, p(aa)=x*x: val([a,a]) == val([aa]) exactly
    // (x*x both ways) → tie; smallest split position s=0 wins at e=2,
    // which is the single piece "aa"
    val x = 0.5
    assert(Unigram.viterbi("aa", Map("a" -> x, "aa" -> x * x)).contains(List("aa")))
    // make the two-piece path strictly better → it must win
    assert(Unigram.viterbi("aa", Map("a" -> 0.6, "aa" -> 0.3)).contains(List("a", "a")))
  }
}
