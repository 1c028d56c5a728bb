package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language ID, document
  * fingerprinting. All per-row column math / codegen'd built-ins — no
  * shuffle except the final rollups, so these scale linearly with input
  * splits at 100 TB.
  */
object TextOps {

  /** Whitespace + BPE-ish token counts as pure column expressions. */
  def tokenCols(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+"), lit(0)))

  /** Gopher quality-rule flags (Rae et al. 2021, the published
    * standard gate most curation stacks start from), as pure column
    * expressions over the shared `\w+` token convention:
    * word-count bounds, mean word length 3–10, symbol-to-word ratios
    * for '#' and '...', bullet-line and ellipsis-line ratios,
    * alphabetic-word ratio ≥ 0.8, ≥ 2 of the 8 Gopher stop words.
    * Returns (flag columns..., pass_all). */
  // Kernel folds over the codegen'd token/line arrays — each replaces a
  // higher-order filter/aggregate lambda (CodegenFallback, which
  // dropped the whole per-doc flag projection to interpreted eval).
  // ScalaUDFs participate in whole-stage codegen. Value parity with
  // the former HOF spellings is spec-gated (TextSpec): word lengths
  // count CODEPOINTS like Spark length(); ltrim/rtrim fold only 0x20
  // like Spark's trim family (NOT \s — Java and RE2 disagree on \x0B
  // in \s and on $ before U+2028, so regex classes would drift the
  // DuckDB oracle on such bytes).
  private val wordCharsUdf = udf { ws: Seq[String] =>
    if (ws == null) None // null-in-null-out, like the HOF spelling
    else { var s = 0L; ws.foreach(w => s += w.codePointCount(0, w.length)); Some(s.toDouble) }
  }
  private val alphaWordsUdf = udf { ws: Seq[String] =>
    if (ws == null) None
    else Some(ws.count(w => w.exists(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))).toDouble)
  }
  private val bulletLinesUdf = udf { ls: Seq[String] =>
    if (ls == null) None
    else Some(ls.count { l =>
      var i = 0
      while (i < l.length && l.charAt(i) == ' ') i += 1
      i < l.length && (l.charAt(i) == '-' || l.charAt(i) == '*' || l.charAt(i) == '•')
    }.toDouble)
  }
  private val ellipsisLinesUdf = udf { ls: Seq[String] =>
    if (ls == null) None
    else Some(ls.count { l =>
      var e = l.length
      while (e > 0 && l.charAt(e - 1) == ' ') e -= 1
      (e >= 3 && l.charAt(e - 1) == '.' && l.charAt(e - 2) == '.' && l.charAt(e - 3) == '.') ||
      (e >= 1 && l.charAt(e - 1) == '…')
    }.toDouble)
  }

  // test faces for the fold kernels (TextSpec equality gate)
  private[graft] def testWordChars(ws: Column): Column = wordCharsUdf(ws)
  private[graft] def testAlphaWords(ws: Column): Column = alphaWordsUdf(ws)
  private[graft] def testBulletLines(ls: Column): Column = bulletLinesUdf(ls)
  private[graft] def testEllipsisLines(ls: Column): Column = ellipsisLinesUdf(ls)
  private[graft] def testStopHits(ws: Column): Column = stopHitsUdf(ws)

  def gopherCols(text: Column): Seq[Column] = {
    val words = regexp_extract_all(text, lit("\\w+"), lit(0))
    val nWords = size(words).cast("double")
    val wordChars = wordCharsUdf(words)
    val meanLen = when(nWords > 0, wordChars / nWords).otherwise(lit(0.0))
    val alphaWords = alphaWordsUdf(words)
    val hashes = (length(text) - length(regexp_replace(text, lit("#"), lit("")))).cast("double")
    val ellipses = ((length(text) - length(regexp_replace(text, lit("\\.\\.\\."), lit("")))) / 3).cast("double")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("double")
    val bulletLines = bulletLinesUdf(lines)
    val ellipsisLines = ellipsisLinesUdf(lines)
    val stopHits = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(w => when(lower(text).rlike("\\b" + w + "\\b"), 1).otherwise(0))
      .reduce(_ + _)
    val fWords = nWords >= 50 && nWords <= 100000
    val fMeanLen = meanLen >= 3.0 && meanLen <= 10.0
    val fHash = when(nWords > 0, hashes / nWords).otherwise(lit(1.0)) <= 0.1
    val fEllipsis = when(nWords > 0, ellipses / nWords).otherwise(lit(1.0)) <= 0.1
    val fBullet = when(nLines > 0, bulletLines / nLines).otherwise(lit(0.0)) <= 0.9
    val fEllLines = when(nLines > 0, ellipsisLines / nLines).otherwise(lit(0.0)) <= 0.3
    val fAlpha = when(nWords > 0, alphaWords / nWords).otherwise(lit(0.0)) >= 0.8
    val fStops = stopHits >= 2
    Seq(
      fWords.as("f_words"), fMeanLen.as("f_mean_len"), fHash.as("f_hash"),
      fEllipsis.as("f_ellipsis"), fBullet.as("f_bullet"), fEllLines.as("f_ell_lines"),
      fAlpha.as("f_alpha"), fStops.as("f_stops"),
      (fWords && fMeanLen && fHash && fEllipsis && fBullet && fEllLines && fAlpha && fStops).as("pass_all")
    )
  }

  /** ◆ Gopher rules rolled up by source: docs, per-rule pass counts,
    * full-gate pass count. */
  def gopherQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, dir)
      .select(Seq($"source") ++ gopherCols($"text"): _*)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("docs"),
        sum(when($"f_words", 1L).otherwise(0L)).as("ok_words"),
        sum(when($"f_mean_len", 1L).otherwise(0L)).as("ok_mean_len"),
        sum(when($"f_alpha", 1L).otherwise(0L)).as("ok_alpha"),
        sum(when($"f_stops", 1L).otherwise(0L)).as("ok_stops"),
        sum(when($"pass_all", 1L).otherwise(0L)).as("pass_all")
      )
      .orderBy($"source")
  }

  /** ◆ Token counting per document, rolled up by language. */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, dir)
      .select($"lang", tokenCols($"text").as("tokens"), length($"text").as("chars"))
      .groupBy($"lang")
      .agg(
        sum($"tokens").as("total_tokens"),
        round(avg($"tokens"), 4).as("avg_tokens"),
        round(avg($"chars"), 4).as("avg_chars"),
        count(lit(1)).as("docs")
      )
  }

  /** Quality-score components (length, punctuation ratio, stopword
    * ratio, mean word length) as pure column math. */
  private val qualityStopwords =
    Set("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
  private val stopHitsUdf = udf { ws: Seq[String] =>
    if (ws == null) None else Some(ws.count(w => qualityStopwords.contains(w.toLowerCase)).toDouble)
  }

  def qualityCols(text: Column): Seq[Column] = {
    val nChars = length(text).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val words = regexp_extract_all(text, lit("\\w+"), lit(0))
    val stopHits = stopHitsUdf(words)
    val nWords = size(words).cast("double")
    Seq(
      nChars.as("n_chars"),
      when(nChars > 0, punct / nChars).otherwise(lit(0.0)).as("punct_ratio"),
      when(nWords > 0, stopHits / nWords).otherwise(lit(0.0)).as("stopword_ratio"),
      when(nWords > 0, nChars / nWords).otherwise(lit(0.0)).as("mean_word_len")
    )
  }

  /** ◆ Quality scoring rolled up by source. */
  def qualityStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, dir)
      .select(Seq($"source") ++ qualityCols($"text"): _*)
      .groupBy($"source")
      .agg(
        round(avg($"punct_ratio"), 6).as("avg_punct_ratio"),
        round(avg($"stopword_ratio"), 6).as("avg_stopword_ratio"),
        round(avg($"mean_word_len"), 6).as("avg_word_len"),
        count(lit(1)).as("docs")
      )
  }

  /** Language-ID heuristic: score character-class + stopword evidence
    * per language family. Deterministic, pure-JVM — in a real pipeline
    * the profiles would come from training data; here a tiny built-in
    * profile set demonstrates the distributed shape (per-row map, no
    * shuffle). */
  private val langProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "los", "se", "del"),
    "fr" -> Set("le", "la", "de", "et", "les", "des", "est", "un", "une", "du"),
    "de" -> Set("der", "die", "und", "das", "ist", "von", "den", "mit", "ein", "zu")
  )

  val langIdUdf = udf { text: String =>
    if (text == null || text.isEmpty) "und"
    else {
      val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\W+").filter(_.nonEmpty)
      if (toks.isEmpty) "und"
      else {
        val scores = langProfiles.map { case (lang, stops) =>
          lang -> toks.count(stops.contains).toDouble / toks.length
        }
        val (best, score) = scores.maxBy { case (l, v) => (v, l) }
        if (score <= 0.0) "und" else best
      }
    }
  }

  /** Stopword-evidence score for one language — pure column math (the
    * same per-row map shape as the UDF, but codegen-friendly and
    * SQL-expressible for the oracle). */
  def langScore(toks: Column, stops: Set[String]): Column =
    size(filter(toks, t => t.isin(stops.toSeq.map(lit(_)): _*))).cast("double") / size(toks)

  /** ◆ Language ID over the corpus — argmax of per-language stopword
    * scores; ties break to the alphabetically-first language; zero
    * evidence → "und". Deterministic CASE cascade mirrored verbatim in
    * the SQL oracle. */
  def langIdQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = regexp_extract_all(lower($"text"), lit("\\w+"), lit(0))
    val scored = Tables
      .documents(s, dir)
      .withColumn("toks", toks)
      .withColumn("s_en", langScore($"toks", langProfiles("en")))
      .withColumn("s_es", langScore($"toks", langProfiles("es")))
      .withColumn("s_fr", langScore($"toks", langProfiles("fr")))
      .withColumn("s_de", langScore($"toks", langProfiles("de")))
    scored
      .withColumn(
        "lang_pred",
        when(size($"toks") === 0 || greatest($"s_en", $"s_es", $"s_fr", $"s_de") <= 0.0, "und")
          .when($"s_en" >= $"s_es" && $"s_en" >= $"s_fr" && $"s_en" >= $"s_de", "en")
          .when($"s_es" >= $"s_fr" && $"s_es" >= $"s_de", "es")
          .when($"s_fr" >= $"s_de", "fr")
          .otherwise("de")
      )
      .groupBy($"lang_pred")
      .agg(count(lit(1)).as("n"))
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Engine-neutral 60-bit string hash: first 15 hex chars of md5 as an
    * unsigned int — identical to DuckDB's
    * `('0x' || substr(md5(s),1,15))::BIGINT`. 15 hex chars = the first
    * 7.5 digest bytes, i.e. the big-endian first-8-bytes long shifted
    * right by one nibble — computed directly on the digest bytes
    * (no hex-string round-trip; a thread-local digest instance keeps
    * this allocation-free on the per-token hot path). */
  def md5Hash60(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Per-document term-count row (public: Catalyst's generated
    * deserializer must be able to instantiate it). */
  final case class TermCount(w: String, c: Long)

  /** One-pass per-document term-count kernel: tokens (the shared
    * `\w+`-on-lowercase tokenization) → (term, count) pairs in
    * first-occurrence order — value-identical, after explode, to
    * `groupBy(doc, term).count()` over the exploded token stream
    * (TextSpec proves the per-doc identity), but with no per-occurrence
    * rows in the plan and no (doc, term) aggregation exchange. One
    * corpus pass feeds every count-table consumer: the per-(doc, term)
    * frame is the finest statistic the tf-idf/BM25 family ever needs
    * (term frequency = Σ c, document frequency = row count per term,
    * document length = Σ c per doc). */
  private[graft] val termCountsSerial = udf { text: String =>
    if (text == null) Seq.empty[TermCount]
    else {
      val m = java.util.regex.Pattern.compile("\\w+").matcher(text.toLowerCase(java.util.Locale.ROOT))
      val counts = new java.util.LinkedHashMap[String, Long]()
      while (m.find()) {
        val w = m.group()
        counts.put(w, counts.getOrDefault(w, 0L) + 1L)
      }
      val out = new scala.collection.mutable.ArrayBuffer[TermCount](counts.size())
      val it = counts.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); out += TermCount(e.getKey, e.getValue) }
      out.toSeq
    }
  }

  /** Rolling-hash document fingerprinting (winnowing, window w=4 over
    * word 3-gram hashes): per-document set of selected hashes. Used by
    * near-dup candidate generation. Deterministic, md5-based so the
    * oracle can recompute it. */
  val fingerprintUdf = udf { text: String =>
    if (text == null) Array.empty[Long]
    else {
      val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\W+").filter(_.nonEmpty)
      if (toks.length < 3) Array.empty[Long]
      else {
        val grams = toks.sliding(3).map(_.mkString(" ")).toArray
        val hashes = grams.map(md5Hash60)
        val w = 4
        if (hashes.length <= w) Array(hashes.min)
        else hashes.sliding(w).map(_.min).toArray.distinct.sorted
      }
    }
  }

  /** ◆ TF-IDF top terms per source — term explode → (source, term)
    * occurrence counts + per-term document frequency, idf =
    * ln((N+1)/(df+1)), top-3 by rounded score (rounding before ranking
    * keeps the tie-order engine-independent; ties break on the term).
    * Two partial-agg shuffles + one window; the doc-count side is a
    * 1-row broadcast. */
  def tfidfQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    // ONE corpus tokenize pass (guide §2.3 — aggregate before you
    // shuffle): the serial kernel emits per-doc (term, count) pairs, so
    // the staged frame is DOC-sized (one row per document, arrays
    // bounded by doc vocabulary) instead of an occurrence-level cache.
    // Both count tables and the corpus doc count read it: per-source
    // term frequency = Σ c, document frequency = (doc, term) row count
    // per term (the distinct is implied by the per-doc counting), and
    // nd = the row count of the staged frame itself.
    val per = docs
      .select($"source", $"doc_id", termCountsSerial($"text").as("tc"))
      .transform(graft.operators.Staged.persist(_)) // staged: released by Staged.releaseAll
    val dt = per
      .select($"source", explode($"tc").as("t"))
      .select($"source", $"t.w".as("term"), $"t.c".as("c"))
    val tf = dt.groupBy($"source", $"term").agg(sum($"c").as("stf"))
    val dfT = dt.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = per.agg(count(lit(1)).as("nd"))
    val scored = tf
      .join(dfT, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round($"stf" * log(($"nd" + 1.0) / ($"df" + 1.0)), 6))
    val w = Window.partitionBy($"source").orderBy($"tfidf".desc, $"term".asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"source", $"term", $"tfidf", $"rank")
  }

  /** ◆ q_bm25 — Okapi BM25 relevance search (k1=1.2, b=0.75): the
    * standard lexical ranking function (Robertson & Zaragoza, "The
    * Probabilistic Relevance Framework: BM25 and Beyond", 2009) and the
    * retrieval half of a dedup/decontamination review loop ("show me
    * the corpus documents most relevant to this probe"). Terms are the
    * shared `\w+` tokenization (same as TF-IDF). Shape: the inverted
    * postings side is ONE partial-agg pass filtered to the query's
    * terms (the `term IN (...)` predicate pushes into the scan of a
    * real postings table), document length + corpus stats are a second
    * pass whose output is doc-count-sized, and the final top-k is
    * TakeOrderedAndProject — a per-partition heap, never a global
    * sort, so the candidate set (every doc containing ≥1 query term)
    * streams through without materializing. Rank is computed AFTER the
    * k-row cut, so the only Window in the plan sees 20 rows. */
  def bm25Query(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k1 = 1.2
    val b = 0.75
    val k = 20
    val terms = Seq("fast", "spark", "join")
    val docs = Tables.documentsWide(s, dir) // spread the single-row-group scan before the per-row token work
    // ONE corpus tokenize pass (guide §2.3): the serial kernel emits
    // per-doc (term, count) pairs, so the staged frame is DOC-sized
    // (one row per document) instead of an occurrence-level cache.
    // Every statistic derives from it: document length = Σ c per doc
    // (docs with zero tokens emit no pairs, exactly like the explode
    // path), query-term tf IS the c of the filtered pairs, and df per
    // term is the (doc, term) row count — the distinct is implied by
    // the per-doc counting.
    val per = docs
      .select($"doc_id", termCountsSerial($"text").as("tc"))
      .transform(graft.operators.Staged.persist(_)) // staged: released by Staged.releaseAll
    val dt = per
      .select($"doc_id", explode($"tc").as("t"))
      .select($"doc_id", $"t.w".as("term"), $"t.c".as("c"))
    val dl = dt.groupBy($"doc_id").agg(sum($"c").as("dlen"))
    val stats = dl.agg(
      (sum($"dlen").cast("double") / count(lit(1))).as("avgdl"),
      count(lit(1)).as("nd")
    )
    val hits = dt.filter($"term".isin(terms: _*))
    val tf = hits.select($"doc_id", $"term", $"c".as("f"))
    val dfT = hits.groupBy($"term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfT), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn(
        "contrib",
        log(lit(1.0) + ($"nd" - $"df" + 0.5) / ($"df" + 0.5)) * $"f" * lit(k1 + 1.0) /
          ($"f" + lit(k1) * (lit(1.0 - b) + lit(b) * $"dlen" / $"avgdl"))
      )
      .groupBy($"doc_id")
      .agg(round(sum($"contrib"), 6).as("score"))
    val top = scored.orderBy($"score".desc, $"doc_id".asc).limit(k)
    top
      .withColumn("rank", row_number().over(Window.orderBy($"score".desc, $"doc_id".asc)).cast("int"))
      .select($"doc_id", $"score", $"rank")
  }

  /** ◆ Composed training-data pipeline — the canonical pre-training
    * cleanup chain as ONE declarative plan: quality gate (length,
    * punctuation, stopword evidence) → exact dedup keep-first (window
    * over the content digest) → per-language corpus stats. Catalyst
    * fuses the per-row stages into the scan; the dedup window and the
    * final rollup are the only shuffles. */
  def pipelineQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"h").orderBy($"doc_id".asc)
    Tables
      .documents(s, dir)
      .select(Seq($"doc_id", $"lang", $"text") ++ qualityCols($"text"): _*)
      .filter($"n_chars" >= 100.0 && $"punct_ratio" <= 0.2 && $"stopword_ratio" >= 0.01)
      .withColumn("h", md5($"text".cast("binary")))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1) // keep-first by doc_id within identical content
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("docs_kept"),
        sum(tokenCols($"text")).cast("long").as("total_tokens"),
        round(avg($"stopword_ratio"), 6).as("avg_stopword_ratio")
      )
  }

  /** ◆ Document fingerprints — winnowed hash count + an md5 digest of
    * the selected-hash sequence (hash-compared against the oracle's
    * recomputation). */
  def fingerprintQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, dir)
      .select($"doc_id", fingerprintUdf($"text").as("fingerprint"))
      .select(
        $"doc_id",
        size($"fingerprint").as("n_fingerprints"),
        md5(concat_ws(",", $"fingerprint".cast("array<string>")).cast("binary")).as("fp_digest")
      )
  }

  /** ◆ SHA-256 content digests under the oracle — the ingest hash
    * (`hash.cpp` / `sha2(content, 256)` in `Ingest.toEntries`) over
    * document text, rolled up per language with exact-dup counts. */
  def contentDigestQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, dir)
      .select($"lang", sha2($"text".cast("binary"), 256).as("digest"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct($"digest").as("distinct_digests"),
        min($"digest").as("first_digest")
      )
  }

  /** Deterministic per-doc hash in [0, mod): md5 of a salted id. The
    * curation-pipeline replacement for RNG sampling — reproducible
    * across runs, engines and cluster sizes, and stable under
    * repartitioning (none of which holds for `rand()`). */
  def idHash(salt: String, id: Column, mod: Int): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 15), 16, 10).cast("long") % mod

  /** ◆ Stratified deterministic sampling — per-language keep rates
    * (downsample the dominant language, keep the tail), the
    * `sampleBy` shape every training-data pipeline runs before
    * tokenization, but hash-deterministic instead of RNG. One scan +
    * one rollup shuffle. */
  def sampleQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rate = when($"lang" === "en", 250)
      .when($"lang" === "es", 500)
      .otherwise(900) // per-mille keep rates
    Tables
      .documents(s, dir)
      .withColumn("h", idHash("smp:", $"doc_id", 1000))
      .filter($"h" < rate)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("kept_docs"),
        sum(tokenCols($"text")).cast("long").as("kept_tokens")
      )
  }

  /** ◆ Train/val/test split assignment — hash-bucket 80/10/10, the
    * standard leakage-safe split (content-independent, id-stable).
    * Emits per (lang, split) doc and token counts. */
  def splitQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = idHash("split:", $"doc_id", 100)
    Tables
      .documents(s, dir)
      .withColumn("split", when(h < 80, "train").when(h < 90, "val").otherwise("test"))
      .groupBy($"lang", $"split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCols($"text")).cast("long").as("n_tokens")
      )
  }

  /** ◆ Stratified train/val/test split — EXACT floor-target
    * proportions per language group (q_split's hash split is only
    * proportional in expectation). The scale shape is the
    * quantile-cut pattern, NOT a per-group sort: hash-prefix buckets
    * are counted, the cumulative bucket table (a bounded summary)
    * locates the 80/90% cut, whole buckets on either side classify
    * with no ordering at all, and only the ≤2 BOUNDARY buckets per
    * group are ranked — a window over a filtered sliver, never the
    * constant-domain-keyed funnel the plan gate forbids. */
  def stratifiedSplitQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables
      .documents(s, dir)
      .select(
        $"lang",
        $"text",
        md5(concat(lit("strat:"), $"doc_id".cast("string")).cast("binary")).as("okey")
      )
      .withColumn("bucket", substring($"okey", 1, 2))
    val counts = docs.groupBy($"lang", $"bucket").agg(count(lit(1)).as("c"))
    val wb = Window.partitionBy($"lang").orderBy($"bucket")
    val cums = counts
      .withColumn("cum", coalesce(sum($"c").over(wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val totals = counts
      .groupBy($"lang")
      .agg(sum($"c").as("n"))
      .withColumn("t80", expr("(n * 80) div 100"))
      .withColumn("t90", expr("(n * 90) div 100"))
    val tagged = docs
      .join(cums, Seq("lang", "bucket"))
      .join(broadcast(totals), "lang")
      .withColumn("bstart", $"cum")
      .withColumn("bend", $"cum" + $"c")
    val isClear = $"bend" <= $"t80" || $"bstart" >= $"t90" || ($"bstart" >= $"t80" && $"bend" <= $"t90")
    val clear = tagged
      .filter(isClear)
      .withColumn("split", when($"bend" <= $"t80", "train").when($"bstart" >= $"t90", "test").otherwise("val"))
    val ws = Window.partitionBy($"lang", $"bucket").orderBy($"okey")
    val straddle = tagged
      .filter(!isClear)
      .withColumn("posn", $"bstart" + row_number().over(ws) - 1)
      .withColumn("split", when($"posn" < $"t80", "train").when($"posn" < $"t90", "val").otherwise("test"))
    clear
      .select($"lang", $"split", $"text")
      .unionByName(straddle.select($"lang", $"split", $"text"))
      .groupBy($"lang", $"split")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(size(split($"text", " "))).cast("long").as("n_tokens")
      )
  }

  /** ◆ Training-mixture allocation — the "domain mixing" step between
    * curation and shuffling: each source gets a token budget
    * proportional to its mixture weight, capped by what the source
    * actually has (the deficit column is the re-balancing signal an
    * operator feeds back into the weights). All-integer arithmetic
    * (weights, `div` budgets), so the allocation is bit-identical on
    * any engine — no float shares. One scan + one bounded rollup;
    * the totals row broadcasts. */
  def mixtureQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = Tables
      .documents(s, dir)
      .groupBy($"source")
      .agg(sum(tokenCols($"text")).cast("long").as("tokens"))
      .withColumn("w", regexp_extract($"source", "(\\d+)", 1).cast("long") % 7 + 1)
      // staged: the per-source rollup feeds both the totals row and
      // the output — without this the corpus scans TWICE
      .transform(graft.operators.Staged.persist(_))
    val tot = tok.agg(sum($"tokens").as("t_total"), sum($"w").as("w_total"))
    tok
      .crossJoin(broadcast(tot))
      .withColumn("target", expr("(((t_total * 6) div 10) * w) div w_total"))
      .select(
        $"source",
        $"tokens",
        $"w".as("weight"),
        $"target",
        least($"tokens", $"target").as("kept_tokens"),
        greatest(lit(0L), $"target" - $"tokens").as("deficit")
      )
  }

  /** ◆ Deterministic global training-order shuffle: every doc gets a
    * shard and a position within the shard, totally ordered by a
    * salted md5 of its id — the "shuffle the corpus once, write N
    * shard files, stream them in order" step every pretraining
    * pipeline runs after curation. Hash-ordering (not `rand()` or
    * `orderBy(rand)`) makes the permutation reproducible across runs,
    * engines, and cluster sizes.
    *
    * Scale shape: NO global sort/row_number — rows hash-route to
    * `numShards` shards and sort only within a shard (window keyed on
    * shard). `numShards` is the scale dial: at 100 TB you pick
    * shards ≈ corpus/shard-file-size (10⁵⁺), so the per-shard sort
    * stays bounded no matter the corpus; (shard, pos) is still a
    * total order. */
  def shuffleOrder(docs: DataFrame, idCol: String, salt: String, numShards: Int): DataFrame = {
    val okey = md5(concat(lit(salt), col(idCol).cast("string")))
    docs
      .select(col(idCol).as("doc_id"), okey.as("okey"))
      .withColumn(
        "shard",
        (conv(substring(col("okey"), 1, 8), 16, 10).cast("long") % numShards).cast("int")
      )
      .withColumn(
        "pos",
        row_number()
          .over(org.apache.spark.sql.expressions.Window.partitionBy(col("shard")).orderBy(col("okey")))
          .cast("long")
      )
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  def shuffleQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    shuffleOrder(Tables.documents(s, dir), "doc_id", "ord:42:", numShards = 64)
      .orderBy($"shard", $"pos")
  }

  /** PII patterns shared by detect and redact — deliberately restricted
    * to constructs Java regex and RE2 interpret identically (character
    * classes, bounded repetition; no lookaround, no Unicode classes) so
    * the SQL oracle reproduces every match. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("phone", "\\d{3}-\\d{3}-\\d{4}", "<PHONE>"),
    ("ip", "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}", "<IP>")
  )

  /** ◆ PII detection + redaction — the standard pre-training scrub
    * (emails, phone numbers, IP addresses): per-pattern match counts
    * plus the text with every occurrence replaced by its tag, applied
    * in declaration order. Pure column regex ops — codegen'd, no UDF,
    * embarrassingly parallel. */
  def piiRedact(docs: DataFrame, textCol: String): DataFrame = {
    val counted = PiiPatterns.foldLeft(docs) { case (df, (name, pat, _)) =>
      df.withColumn(s"n_$name", size(regexp_extract_all(col(textCol), lit(pat), lit(0))))
    }
    val cleaned = PiiPatterns.foldLeft(col(textCol)) { case (c, (_, pat, tag)) =>
      regexp_replace(c, pat, tag)
    }
    counted.withColumn("clean", cleaned)
  }

  /** ◆ PII scrub under the oracle: the fixture text carries no PII, so
    * each doc is AUGMENTED with deterministic id-derived email / phone
    * / IP tokens (both engines build the identical string), then
    * detect+redact runs and rolls up per source with a digest of every
    * redacted document. */
  def piiQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val aug = Tables
      .documents(s, dir)
      .withColumn(
        "t",
        concat(
          $"text",
          lit(" contact user"), $"doc_id".cast("string"),
          lit("@mail"), ($"doc_id" % 7).cast("string"), lit(".example.com or call 555-"),
          lpad(($"doc_id" % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((($"doc_id" * 31) % 10000).cast("string"), 4, "0"),
          lit(" from 192.168."), ($"doc_id" % 256).cast("string"), lit("."), (($"doc_id" * 3) % 256).cast("string")
        )
      )
    piiRedact(aug, "t")
      .groupBy($"source")
      .agg(
        sum($"n_email").cast("long").as("n_email"),
        sum($"n_phone").cast("long").as("n_phone"),
        sum($"n_ip").cast("long").as("n_ip"),
        md5(
          concat_ws("|", transform(array_sort(collect_list(struct($"doc_id", $"clean"))), _.getField("clean")))
        ).as("clean_md5")
      )
  }

  /** ◆ Bigram language-model quality score — train add-one-smoothed
    * bigram stats on the corpus itself, score each document by its
    * mean log2 P(w2|w1), roll up per language. The classic
    * perplexity-flavoured quality gate (high = natural text, low =
    * gibberish/boilerplate). Shapes: one windowed lead per doc for
    * bigrams, two partial-agg count tables (bigram, unigram), joins on
    * the word keys (AQE broadcasts the small side locally,
    * shuffle-joins at corpus scale), everything else column math. */
  def lmScoreQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Bigrams come from the per-row serial kernel (each document is
    // self-contained — ImportanceSpec proves the kernel equals the
    // token-array derivation), NOT a lead() window: the former shape
    // shuffled + sorted the token-occurrence stream by doc_id just to
    // pair adjacent rows, and staged the occurrence cache for four
    // consumers (a doc-level counted cache was also measured — the
    // nested-array columnar encode cost more than the two plain
    // kernel passes it saved). The unigram counts still need one token
    // explode (the final token of each doc is counted in c1 but starts
    // no bigram); the vocabulary size is the c1 ROW count — no
    // countDistinct pass.
    val bg = Tables
      .documents(s, dir)
      .select($"doc_id", $"lang", explode(Importance.bigramsSerial($"text")).as("b"))
      .select($"doc_id", $"lang", $"b.w1".as("w"), $"b.w2".as("w2"))
    val c12 = bg.groupBy($"w", $"w2").agg(count(lit(1)).as("c12"))
    val toks = Tables
      .documents(s, dir)
      .select(explode(regexp_extract_all(lower($"text"), lit("\\w+"), lit(0))).as("w"))
    val c1 = toks.groupBy($"w").agg(count(lit(1)).as("c1"))
    val vocab = c1.agg(count(lit(1)).as("v"))
    bg
      .join(c12, Seq("w", "w2"))
      .join(c1, Seq("w"))
      .crossJoin(broadcast(vocab))
      .withColumn("lp", log2(($"c12" + 1.0) / ($"c1" + $"v")))
      .groupBy($"doc_id", $"lang")
      .agg(avg($"lp").as("doc_score"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), round(avg($"doc_score"), 4).as("avg_lm_score"))
  }
}
