package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training (Kudo 2018, "Subword
  * Regularization" — the SentencePiece `unigram` model), the other
  * tokenizer family real pipelines train besides BPE ([[Bpe]]).
  *
  * Two trainers share one vocabulary/segmentation core:
  *
  *  - [[trainHard]] — hard-EM (Viterbi E-step): each word's single
  *    best segmentation under the current piece probabilities counts
  *    its pieces; probabilities re-estimate from those counts with
  *    add-one smoothing. Counts are INTEGERS, so the only floats that
  *    cross an iteration boundary are the smoothed probabilities —
  *    `round(cnt+1 / total+V, 8)` mirrored bit-for-bit by the DuckDB
  *    oracle (q_unigram), with Viterbi ties pinned (max product, then
  *    smallest split position). The k-means-style determinism trick,
  *    strengthened: integer counts cannot drift at all.
  *  - [[trainSoft]] — the full published algorithm: forward-backward
  *    expected counts (soft-EM) plus the prune step (drop the pieces
  *    whose removal costs the least corpus likelihood, never single
  *    chars, until the target vocab size). Spec'd against a serial
  *    reference implementation (UnigramSpec); not oracled — expected
  *    counts are order-sensitive float sums.
  *
  * Scale shape (the [[Bpe]] trick): the corpus reduces ONCE to the
  * distinct-word frequency table; every EM pass is vocab-sized work —
  * a broadcast piece table, one UDF pass over distinct words, one
  * partial-agg count. Nothing downstream of the first reduction
  * touches corpus-sized data.
  */
object Unigram {

  /** Max piece length considered anywhere (seed + segmentation). */
  val MaxPiece = 4

  /** Words longer than this are dropped from training (both engines —
    * keeps the oracle's position unroll bounded). */
  val MaxWord = 12

  /** Distinct-word frequency table over `\w+` tokens of length ≤
    * [[MaxWord]]: (word, freq). */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(regexp_extract_all(lower(col(textCol)), lit("\\w+"), lit(0))).as("word"))
      .where(length(col("word")).between(1, MaxWord))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** Seed vocabulary: every substring of length 1..[[MaxPiece]] with
    * its occurrence count (occurrences × word freq). All single chars
    * are kept unconditionally (every word must stay segmentable);
    * multi-char pieces keep the top `nMulti` by (count desc, piece
    * asc). Returns (piece, cnt). */
  def seedVocab(s: SparkSession, words: DataFrame, nMulti: Int): DataFrame = {
    import s.implicits._
    val subs = udf { w: String =>
      for {
        st <- 0 until w.length
        l <- 1 to math.min(MaxPiece, w.length - st)
      } yield w.substring(st, st + l)
    }
    val counts = words
      .select(col("freq"), explode(subs(col("word"))).as("piece"))
      .groupBy("piece")
      .agg(sum(col("freq")).as("cnt"))
    val singles = counts.where(length(col("piece")) === 1)
    val multi = counts
      .where(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(nMulti)
    singles.unionByName(multi)
  }

  /** Smoothed piece probabilities from integer counts: round((cnt + 1)
    * / (total + V), 8) — the one float the oracle must mirror. */
  def smoothedProbs(vocab: DataFrame): DataFrame = {
    val agg = vocab.agg(sum(col("cnt")).as("t"), count(lit(1)).as("v")).collect().head
    val total = agg.getLong(0).toDouble
    val v = agg.getLong(1).toDouble
    vocab.select(col("piece"), round((col("cnt") + 1) / lit(total + v), 8).as("p"))
  }

  /** Viterbi best segmentation of `word` under piece probabilities:
    * max product of p(piece), ties broken by the SMALLEST split
    * position at each step (the rule the oracle mirrors). Single
    * chars must be present for every char of the word; a char with no
    * piece at all yields None (caller drops the word). */
  def viterbi(word: String, p: collection.Map[String, Double]): Option[List[String]] = {
    val n = word.length
    val best = new Array[Double](n + 1)
    val bp = new Array[Int](n + 1) // chosen split position s for best path into e
    java.util.Arrays.fill(bp, -1)
    best(0) = 1.0
    bp(0) = 0
    var e = 1
    while (e <= n) {
      var s = math.max(0, e - MaxPiece)
      while (s < e) {
        if (bp(s) >= 0) {
          p.get(word.substring(s, e)) match {
            case Some(pp) =>
              val v = best(s) * pp
              // strictly greater replaces: equal values keep the
              // earliest s (ascending scan) — the pinned tie-break
              if (bp(e) < 0 || v > best(e)) { best(e) = v; bp(e) = s }
            case None =>
          }
        }
        s += 1
      }
      e += 1
    }
    if (bp(n) < 0) None
    else {
      var pieces = List.empty[String]
      var pos = n
      while (pos > 0) {
        val s = bp(pos)
        pieces = word.substring(s, pos) :: pieces
        pos = s
      }
      Some(pieces)
    }
  }

  /** One hard-EM pass: Viterbi-segment every distinct word under
    * `probs` (broadcast), count pieces weighted by word freq. Returns
    * (piece, cnt) over the FULL vocab (zero-count pieces kept with
    * cnt 0 — the vocab set never changes in hard-EM). */
  private def hardCounts(s: SparkSession, words: DataFrame, vocab: DataFrame, probs: DataFrame): DataFrame = {
    import s.implicits._
    val pMap = probs.as[(String, Double)].collect().toMap // vocab-sized
    val bc = s.sparkContext.broadcast(pMap)
    val seg = udf { w: String => viterbi(w, bc.value).getOrElse(Nil) }
    val counted = words
      .select(col("freq"), explode(seg(col("word"))).as("piece"))
      .groupBy("piece")
      .agg(sum(col("freq")).as("n"))
    vocab
      .select(col("piece"))
      .join(counted, Seq("piece"), "left_outer")
      .select(col("piece"), coalesce(col("n"), lit(0L)).as("cnt"))
  }

  /** Hard-EM training: seed → `rounds` × (Viterbi count, re-smooth).
    * Returns the final (piece, cnt) table — integer counts, exactly
    * reproducible (q_unigram oracles seed + 2 rounds end-to-end). */
  def trainHard(s: SparkSession, docs: DataFrame, textCol: String, rounds: Int, nMulti: Int): DataFrame = {
    val words = wordFreq(docs, textCol).localCheckpoint() // corpus reduced once
    var vocab = seedVocab(s, words, nMulti).localCheckpoint()
    var r = 0
    while (r < rounds) {
      vocab = hardCounts(s, words, vocab, smoothedProbs(vocab)).localCheckpoint()
      r += 1
    }
    vocab
  }

  // ------------------------------------------------------------------
  // soft-EM + pruning (the full published algorithm; spec'd serially)
  // ------------------------------------------------------------------

  /** Forward-backward expected piece counts for one word (log-free:
    * probabilities stay well above double underflow at [[MaxWord]]).
    * Returns (piece, expectedCount) pairs, one per occurrence. */
  def expectedCounts(word: String, p: collection.Map[String, Double]): Seq[(String, Double)] = {
    val n = word.length
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 1)
    alpha(0) = 1.0
    for (e <- 1 to n; s <- math.max(0, e - MaxPiece) until e)
      p.get(word.substring(s, e)).foreach(pp => alpha(e) += alpha(s) * pp)
    beta(n) = 1.0
    for (s <- n - 1 to 0 by -1; e <- s + 1 to math.min(n, s + MaxPiece))
      p.get(word.substring(s, e)).foreach(pp => beta(s) += pp * beta(e))
    val z = alpha(n)
    if (z <= 0) return Nil
    for {
      s <- 0 until n
      e <- s + 1 to math.min(n, s + MaxPiece)
      pp <- p.get(word.substring(s, e)).toSeq
    } yield word.substring(s, e) -> alpha(s) * pp * beta(e) / z
  }

  /** Per-word prune losses: for every multi-char vocab piece occurring
    * in `word`, the freq-weighted log-likelihood drop if that piece
    * were removed — computed by re-running the forward pass with the
    * piece masked. A word emits entries only for pieces it contains
    * (≤ len×[[MaxPiece]]), so the corpus-wide loss table is one
    * explode + partial-agg sum away, never a driver loop over the
    * word table. */
  def pruneLosses(word: String, p: collection.Map[String, Double]): Seq[(String, Double)] = {
    val n = word.length
    def ll(masked: String): Double = {
      val alpha = new Array[Double](n + 1)
      alpha(0) = 1.0
      for (e <- 1 to n; s <- math.max(0, e - MaxPiece) until e) {
        val piece = word.substring(s, e)
        if (piece != masked) p.get(piece).foreach(pp => alpha(e) += alpha(s) * pp)
      }
      if (alpha(n) > 0) math.log(alpha(n)) else Double.NegativeInfinity
    }
    val base = ll(null)
    if (base == Double.NegativeInfinity) return Nil
    val present = (for {
      s <- 0 until n
      e <- s + 2 to math.min(n, s + MaxPiece) // multi-char only: singles are never prunable
      piece = word.substring(s, e)
      if p.contains(piece)
    } yield piece).distinct
    present.map { piece =>
      val without = ll(piece)
      // a word that becomes unsegmentable without the piece pins it as unprunable
      piece -> (if (without == Double.NegativeInfinity) Double.MaxValue else base - without)
    }
  }

  /** Soft-EM with pruning, the SentencePiece shape: `emPerShrink`
    * forward-backward passes, then drop the lowest-loss prunable
    * pieces (never single chars) by the shrink factor, repeating until
    * `targetSize`. E-step AND prune scoring are distributed — one
    * broadcast-probs pass over distinct words each, partial-agg sums;
    * only vocab-sized tables ever reach the driver. Returns (piece,
    * prob) of the final model. */
  def trainSoft(
      s: SparkSession,
      docs: DataFrame,
      textCol: String,
      targetSize: Int,
      nMultiSeed: Int = 512,
      emPerShrink: Int = 2,
      shrink: Double = 0.75): DataFrame = {
    import s.implicits._
    val wordsDf = wordFreq(docs, textCol).localCheckpoint()
    var probs: Map[String, Double] = {
      val seed = seedVocab(s, wordsDf, nMultiSeed).as[(String, Long)].collect()
      val total = seed.map(_._2).sum.toDouble
      seed.map { case (pc, c) => pc -> c / total }.toMap
    }
    // one distributed pass over distinct words: per-word (piece, value)
    // pairs explode into a partial-agg freq-weighted sum — vocab-sized out
    def perWordAgg(
        p: Map[String, Double],
        f: (String, collection.Map[String, Double]) => Seq[(String, Double)]): Seq[(String, Double)] = {
      val bc = s.sparkContext.broadcast(p)
      val kv = udf { w: String => f(w, bc.value).map { case (a, b) => a + " " + b } }
      wordsDf
        .select(col("freq"), explode(kv(col("word"))).as("kv"))
        .select(
          substring_index(col("kv"), " ", 1).as("piece"),
          (col("freq") * substring_index(col("kv"), " ", -1).cast("double")).as("c"))
        .groupBy("piece")
        .agg(sum(col("c")).as("c"))
        .as[(String, Double)]
        .collect()
        .toSeq
    }
    def emPass(p: Map[String, Double]): Map[String, Double] = {
      val agg = perWordAgg(p, expectedCounts)
      val total = agg.map(_._2).sum
      agg.map { case (pc, c) => pc -> c / total }.toMap
    }
    var stalled = false
    while (probs.size > targetSize && !stalled) {
      for (_ <- 1 to emPerShrink) probs = emPass(probs)
      val needed = probs.size - targetSize
      val nDrop = math.min(needed, math.max(1, math.ceil(probs.size * (1 - shrink)).toInt))
      val losses = perWordAgg(probs, pruneLosses).toMap
      val byLoss = probs.keys
        .filter(_.length > 1)
        .toSeq
        .map(pc => pc -> losses.getOrElse(pc, 0.0)) // piece in no word: free to drop
        .filter(_._2 < Double.MaxValue)
        .sortBy { case (pc, l) => (l, pc) }
      if (byLoss.isEmpty) stalled = true // single-char floor: nothing prunable remains
      else {
        probs = probs -- byLoss.take(nDrop).map(_._1)
        val t = probs.values.sum
        probs = probs.map { case (k, v) => k -> v / t }
      }
    }
    probs.toSeq.toDF("piece", "prob")
  }

  /** Tokenize a corpus with a trained model: one row per document with
    * the piece sequence (Viterbi under `probs`); unknown-char words
    * fall back to per-char pieces tagged as "<unk>". */
  def tokenize(s: SparkSession, docs: DataFrame, textCol: String, probs: collection.Map[String, Double]): DataFrame = {
    val bc = s.sparkContext.broadcast(probs)
    val tok = udf { text: String =>
      "\\w+".r
        .findAllIn(Option(text).getOrElse("").toLowerCase(java.util.Locale.ROOT))
        .flatMap(w => viterbi(w, bc.value).getOrElse(w.map(_ => "<unk>").toList))
        .toSeq
    }
    docs.withColumn("pieces", tok(col(textCol)))
  }

  /** ◆ q_unigram — seed + 2 hard-EM rounds over `documents`, top 30
    * pieces by (final count desc, piece asc). Counts are integers;
    * the DuckDB oracle replays the identical seed, smoothing, Viterbi
    * tie-breaks and backtrack, position-unrolled. */
  def unigramQuery(s: SparkSession, dir: String): DataFrame = {
    val vocab = trainHard(s, graft.Tables.documents(s, dir), "text", rounds = 2, nMulti = 120)
    vocab
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(30)
      .select(col("piece"), col("cnt").cast("long").as("cnt"))
  }
}
