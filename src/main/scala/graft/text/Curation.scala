package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation operators for training-data pipelines — the stages
  * that sit BETWEEN candidate generation ([[Dedup]]) and the training
  * job: cluster canonicalization, eval-set decontamination, repetition
  * quality signals, and sequence packing.
  *
  * Scale design notes (the 100 TB shapes):
  *  - cluster canonicalization: candidate pairs (already bucketed, no
  *    N² anywhere) feed the generic min-label component fixpoint
  *    ([[graft.operators.Graph.connectedComponents]]) — the graph is
  *    PAIR-sized (near-dups only), orders of magnitude smaller than
  *    the corpus, so the O(log diameter) rounds iterate over a frame
  *    that is tiny relative to the scan that produced it.
  *  - decontamination: one distinct-shingle explode per side, one
  *    hash-join on the 8-byte shingle hash. The eval side is the small
  *    one; AQE broadcasts it locally and shuffle-joins it at corpus
  *    scale. Nothing ships full text.
  *  - packing: the global running offset is a two-phase distributed
  *    prefix sum (per-block partials → tiny block-offset frame →
  *    broadcast back), NOT a single-partition window — the classic
  *    scan-primitive decomposition, so the token ledger never
  *    serializes through one task.
  */
object Curation {

  /** Non-distinct word n-grams (cf. [[Dedup.shingles]], which is
    * distinct — counts matter here: repetition is about multiplicity). */
  def ngramsAll(text: Column, n: Int): Column = {
    val toks = regexp_extract_all(lower(text), lit("\\w+"), lit(0))
    filter(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => when(i + n <= size(toks), concat_ws(" ", slice(toks, i + 1, lit(n))))
      ),
      x => x.isNotNull
    )
  }

  /** One-pass serial form of [[ngramsAll]] — value-identical gram
    * strings (CurationSpec proves row-for-row equality), but a single
    * JIT'd call per document instead of a higher-order-function tree
    * (CodegenFallback) rebuilding the token array per gram. */
  private[graft] def ngramsAllSerial(n: Int) =
    org.apache.spark.sql.functions.udf { text: String =>
      if (text == null) Seq.empty[String]
      else {
        val m = java.util.regex.Pattern.compile("\\w+").matcher(text.toLowerCase)
        val toks = scala.collection.mutable.ArrayBuffer.empty[String]
        while (m.find()) toks += m.group()
        if (toks.length < n) Seq.empty[String]
        else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
      }
    }

  /** One-pass per-document gram-hash kernel: position i (0-based) →
    * the 60-bit md5 prefix of the i-th n-gram — value-identical to
    * `conv(substring(md5(ngramsAll(text, n)[i]), 1, 15), 16, 10)`
    * (CurationSpec proves row-for-row equality) but with no gram
    * STRING column materialized through the plan: only 8-byte longs
    * leave the projection. Same shape win as the r11 minhash/CDC
    * kernels — the inverted-index joins downstream are unchanged. */
  private[graft] def gramHashesSerial(text: String, n: Int): Array[Long] =
    gramHashesFromToks(Dedup.tokensOf(text), n)

  /** [[gramHashesSerial]] body over a pre-tokenized array. */
  private[graft] def gramHashesFromToks(toks: Array[String], n: Int): Array[Long] = {
    if (toks.length < n) return Array.emptyLongArray
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      sb.append(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      // first 15 hex chars = top 60 bits, exactly conv(substring(md5,1,15),16,10)
      var hv = 0L
      var b = 0
      while (b < 7) { hv = (hv << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = (hv << 4) | ((d(7) & 0xf0L) >> 4)
      i += 1
    }
    out
  }

  /** `(doc_id, p [1-based], h)` gram-hash rows via the serial kernel. */
  private def gramHashRows(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val hashesUdf = udf((t: String) => gramHashesSerial(if (t == null) "" else t, n))
    docs
      .select(col(idCol).as("doc_id"), posexplode(hashesUdf(col(textCol))).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("h"))
  }

  /** ◆ Near-dup cluster canonicalization: MinHash candidate pairs →
    * connected components → one keeper per cluster (the MIN doc id,
    * the deterministic label rule the SQL oracle recomputes as a
    * recursive reachability closure). This is the step that turns a
    * PAIR list into a DEDUP DECISION — pairs alone can't be acted on
    * because near-duplication is transitive (A~B, B~C ⟹ drop two of
    * three, not two of two).
    *
    * Returns one row per multi-member cluster: keeper id, member
    * count, member-id checksum. Docs in no pair are implicitly their
    * own singleton cluster and are not re-listed (at corpus scale the
    * interesting output is exactly the drop list).
    */
  /** Min-id component label per doc that appears in any candidate pair
    * — the shared core of [[dedupClusters]] (summary view) and
    * [[dedupDropList]] (actionable view). */
  def clusterLabels(docs: DataFrame, idCol: String, textCol: String, threshold: Double = 0.5): DataFrame =
    labelsFromPairs(Dedup.minhashCandidates(docs, idCol, textCol, threshold = threshold))

  /** [[clusterLabels]] over pre-computed MinHash signatures `(id, sig)`
    * — for fused pipelines (q_curate) that already ran the signature
    * kernel; the candidate generation and component labeling are
    * identical. */
  def clusterLabelsFromSigs(sigs: DataFrame, threshold: Double = 0.5): DataFrame =
    labelsFromPairs(Dedup.minhashCandidatesFromSigs(sigs, threshold = threshold))

  private def labelsFromPairs(candidates: DataFrame): DataFrame = {
    // multi-consumer (node set + edge list): checkpointOwned so the
    // pair blocks can be dropped as soon as components() — which
    // returns an EAGER checkpoint with no lineage into them — is done
    val (pairs, pairBlocks) = graft.operators.Staged.checkpointOwned(
      candidates.select(col("id_a"), col("id_b"))
    )
    try {
      val nodes = pairs.select(col("id_a").as("id")).union(pairs.select(col("id_b").as("id"))).distinct()
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      graft.operators.Graph.components(nodes, edges)
    } finally graft.operators.Staged.release(pairBlocks)
  }

  def dedupClusters(docs: DataFrame, idCol: String, textCol: String, threshold: Double = 0.5): DataFrame =
    clusterLabels(docs, idCol, textCol, threshold)
      .groupBy(col("lab").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"), sum(col("id")).as("member_id_sum"))

  /** The dedup DROP LIST: every clustered doc except its cluster's
    * keeper (the MIN id). Anti-join this against the corpus to apply
    * the dedup decision. */
  def dedupDropList(docs: DataFrame, idCol: String, textCol: String, threshold: Double = 0.5): DataFrame =
    clusterLabels(docs, idCol, textCol, threshold)
      .filter(col("id") =!= col("lab"))
      .select(col("id").as("doc_id"))

  def dedupClusterQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    dedupClusters(Tables.documents(s, dir), "doc_id", "text").orderBy($"cluster_id")
  }

  /** ◆ Eval-set decontamination: flag training documents that share at
    * least one 8-token shingle with any held-out eval document — the
    * standard n-gram-overlap test-set leakage check (e.g. GPT-3 §C,
    * PaLM §7 use 8–13-gram collision). The eval split here is the
    * deterministic id-hash family used by [[TextOps.splitQuery]];
    * shingles ride the join as 60-bit md5 hashes (8-byte keys, both
    * engines hash identically).
    *
    * Returns one row per CONTAMINATED train doc with the count of
    * distinct shared 8-grams — the drop/inspect list.
    */
  /** The deterministic eval-holdout predicate — defined ONCE so
    * [[decontaminate]]'s contamination check and [[curate]]'s holdout
    * filter can never diverge on what "eval" means. */
  def isEval(idCol: String, evalMod: Int = 10, evalRem: Int = 7): Column =
    col(idCol) % evalMod === evalRem

  def decontaminate(docs: DataFrame, idCol: String, textCol: String, n: Int = 8, evalMod: Int = 10, evalRem: Int = 7): DataFrame = {
    // both join sides read the same shingle pipeline — materialize it
    // once (at corpus scale: a staged table) instead of re-hashing the
    // corpus per side. Hashes come from the one-pass distinct kernel
    // (value-identical to explode(shingles)+md5 — TextSpec)
    val hashesUdf = udf { t: String => if (t == null) null else Dedup.shingleHashesSerial(t, n) }
    val sh = docs
      .select(col(idCol).as("doc_id"), explode(hashesUdf(col(textCol))).as("h"))
      .transform(graft.operators.Staged.persist(_)) // staged: released by Staged.releaseAll
    val ev = isEval("doc_id", evalMod, evalRem)
    val evalSh = sh.filter(ev).select(col("h")).distinct()
    sh.filter(!ev)
      .join(evalSh, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  def decontamQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decontaminate(Tables.documentsWide(s, dir), "doc_id", "text").orderBy($"doc_id")
  }

  /** ◆ Repetition quality signals (the Gopher repetition-removal
    * family, Rae et al. 2021 §A1.1.3): per document, the fraction of
    * all bigram occurrences taken by the single most frequent bigram,
    * and the fraction of trigram occurrences whose trigram occurs more
    * than once. High values = degenerate boilerplate/loop text. Both
    * are count ratios — engine-exact.
    *
    * Shape: one n-gram explode per signal → per-(doc, gram) partial
    * agg → per-doc agg. The per-doc gram tables are bounded by doc
    * length; nothing crosses documents, so the whole signal is
    * embarrassingly parallel.
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def gramCounts(n: Int): DataFrame =
      docs
        .select(col(idCol).as("doc_id"), explode(ngramsAllSerial(n)(col(textCol))).as("g"))
        .groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("c"))
    val bi = gramCounts(2)
      .groupBy("doc_id")
      .agg((max(col("c")).cast("double") / sum(col("c"))).as("top_bi"))
    val tri = gramCounts(3)
      .groupBy("doc_id")
      .agg((sum(when(col("c") > 1, col("c")).otherwise(0)).cast("double") / sum(col("c"))).as("dup_tri"))
    bi.join(tri, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        round(col("top_bi"), 4).as("top_bigram_frac"),
        round(coalesce(col("dup_tri"), lit(0.0)), 4).as("dup_trigram_frac")
      )
  }

  def repetitionQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    repetitionSignals(Tables.documentsWide(s, dir), "doc_id", "text").orderBy($"doc_id")
  }

  /** ◆ Cross-document duplicated-span coverage — the span-granular
    * dedup signal of Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better", substring dedup): for every
    * position in a document, is its n-token window shared with another
    * document? Docs with high coverage are near-verbatim recombinations
    * that doc-level MinHash can miss (and the per-position counts say
    * WHICH spans to cut, not just which docs).
    *
    * Shape: the inverted-index family again — positions ride as 8-byte
    * md5 gram hashes, document frequency is one partial agg, coverage
    * is one join back + per-doc agg. No pair table at all, so this is
    * strictly cheaper than any pairwise dedup at the same n.
    */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String, n: Int = 10): DataFrame = {
    val g = gramHashRows(docs, idCol, textCol, n)
      .select(col("doc_id"), col("h"))
      .transform(graft.operators.Staged.persist(_)) // staged: released by Staged.releaseAll
    val dfTab = g.groupBy("h").agg(countDistinct("doc_id").as("nd"))
    g.join(dfTab, Seq("h"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_positions"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_positions")
      )
      .filter(col("n_dup_positions") > 0)
      .select(
        col("doc_id"),
        col("n_positions"),
        col("n_dup_positions"),
        round(col("n_dup_positions").cast("double") / col("n_positions"), 4).as("dup_span_frac")
      )
  }

  def dupSpansQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    dupSpans(Tables.documentsWide(s, dir), "doc_id", "text").orderBy($"doc_id")
  }

  /** ◆ Substring-dedup span REMOVAL (the cut half of Lee et al. 2022 —
    * [[dupSpans]] measures coverage; this emits the cleaned text): every
    * token covered by any cross-document duplicated n-gram window is
    * cut, adjacent/overlapping dup positions merging naturally through
    * the covered-token-index set union, and the surviving tokens are
    * reassembled in order. Output (affected docs only): original and
    * cut token counts plus the cleaned, whitespace-normalized text.
    *
    * Shape: the same inverted index as [[dupSpans]] (positions ride as
    * 8-byte gram hashes, document frequency is one partial agg), plus
    * one anti-join of token rows against covered indices and a per-doc
    * ordered reassembly (collect_list bounded by DOC length — nothing
    * cross-document ever sits in one task). Token indices are 1-based
    * to match the SQL oracle's `generate_subscripts`.
    */
  /** Per-document fused span payload (public: Catalyst instantiates
    * it): the token array and the per-position n-gram hashes from ONE
    * tokenization. */
  final case class SpanDoc(toks: Array[String], hs: Array[Long])

  private def spanDocSerial(n: Int) = udf { text: String =>
    val toks = if (text == null) Array.empty[String] else Dedup.tokensOf(text)
    SpanDoc(toks, gramHashesFromToks(toks, n))
  }

  def cutDupSpans(docs: DataFrame, idCol: String, textCol: String, n: Int = 10): DataFrame = {
    // ONE corpus tokenize pass (guide §2.3/§6): the former shape ran
    // the gram-hash kernel (tokenize + md5), a posexplode tokenize for
    // the token rows, AND a third tokenize for the per-doc token count.
    // The fused kernel emits the token array and the position hashes
    // together; the staged frame is doc-sized and every consumer
    // (inverted index, token rows, token counts) reads it.
    val perDoc = docs
      .select(col(idCol).as("doc_id"), spanDocSerial(n)(col(textCol)).as("k"))
      .transform(graft.operators.Staged.persist(_)) // staged: released by Staged.releaseAll
    val g = perDoc
      .select(col("doc_id"), posexplode(col("k.hs")).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("h"))
    val dfTab = g.groupBy("h").agg(countDistinct("doc_id").as("nd"))
    // NO distinct here: left_anti tolerates duplicate keys on its right
    // side, so overlapping windows merge for free in the join instead
    // of paying an extra aggregate+exchange to dedupe covered indices
    val covered = g
      .join(dfTab.filter(col("nd") >= 2).select("h"), Seq("h"))
      .select(col("doc_id"), explode(sequence(col("p"), col("p") + (n - 1))).as("ti"))
    val tokRows = perDoc
      .select(col("doc_id"), posexplode(col("k.toks")).as(Seq("ti0", "tok")))
      .select(col("doc_id"), (col("ti0") + 1).as("ti"), col("tok"))
    val kept = tokRows
      .join(covered, Seq("doc_id", "ti"), "left_anti")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        concat_ws(
          " ",
          transform(array_sort(collect_list(struct(col("ti"), col("tok")))), x => x.getField("tok"))
        ).as("clean_text")
      )
    perDoc
      .select(col("doc_id"), size(col("k.toks")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .withColumn("n_cut", col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
      .filter(col("n_cut") > 0)
      .select(col("doc_id"), col("n_tokens"), col("n_cut"), coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  def cutSpansQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cutDupSpans(Tables.documentsWide(s, dir), "doc_id", "text").orderBy($"doc_id")
  }

  /** ◆ Variable-length duplicated-RUN extraction — the maximal-
    * substring half of Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better"), distributedly approximated:
    * adjacent/overlapping duplicated n-gram windows chain into MAXIMAL
    * runs (gaps-and-islands over the covered token set per doc), so a
    * 25-token cross-document duplicate reports as ONE [start, end]
    * span, never 16 fixed windows. [[cutDupSpans]] removes covered
    * tokens; this reports the span structure a span-level policy needs
    * (cut, keep-first-occurrence, audit run-length distributions).
    *
    * Shape: the same inverted index as [[cutDupSpans]], a partial-agg
    * distinct of covered positions, then per-doc windows (partition
    * key = doc_id — corpus cardinality; rows per partition bounded by
    * document length, never cross-document).
    */
  def dupRuns(docs: DataFrame, idCol: String, textCol: String, n: Int = 10): DataFrame = {
    val g = gramHashRows(docs, idCol, textCol, n)
      .transform(graft.operators.Staged.persist(_)) // staged: released by Staged.releaseAll
    val dfTab = g.groupBy("h").agg(countDistinct("doc_id").as("nd"))
    val covered = g
      .join(dfTab.filter(col("nd") >= 2).select("h"), Seq("h"))
      .select(col("doc_id"), explode(sequence(col("p"), col("p") + (n - 1))).as("ti"))
      .groupBy("doc_id", "ti")
      .agg(count(lit(1)).as("w")) // distinct on the partial-agg path
    // gaps-and-islands: contiguous ti share (ti - row_number) per doc
    val w = Window.partitionBy("doc_id").orderBy("ti")
    covered
      .withColumn("grp", col("ti") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min("ti").cast("long").as("run_start"), max("ti").cast("long").as("run_end"), count(lit(1)).as("run_len"))
      .withColumn("run", row_number().over(Window.partitionBy("doc_id").orderBy("run_start")).cast("long"))
      .select(col("doc_id"), col("run"), col("run_start"), col("run_end"), col("run_len"))
  }

  def cutRunsQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    dupRuns(Tables.documentsWide(s, dir), "doc_id", "text").orderBy($"doc_id", $"run")
  }

  /** ◆ Sequence packing (concat-and-chunk): lay the corpus out in
    * doc-id order as one token stream and cut it into fixed-length
    * training sequences — the standard LM pretraining batch layout.
    * Reports, per sequence: how many documents contribute, the first
    * contributing doc, and the token count (== seqLen except the final
    * partial sequence) — the stats a packing job needs to audit
    * cross-doc attention contamination and tail waste.
    *
    * The running token offset is a distributed two-phase prefix sum:
    * per-block within-window cumsum (blocks = contiguous id ranges, so
    * each window partition is bounded at `blockSize` docs) + a
    * block-offset table small enough to broadcast — never a
    * single-partition global window.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String, seqLen: Int = 256, blockSize: Int = 4096): DataFrame = {
    val toks = docs.select(
      col(idCol).as("doc_id"),
      size(regexp_extract_all(lower(col(textCol)), lit("\\w+"), lit(0))).cast("long").as("n")
    )
    val blocked = toks.withColumn("blk", floor(col("doc_id") / blockSize).cast("long"))
    // phase 1: per-block totals → cumulative block offsets (tiny frame:
    // one row per block; the window over it is bounded-cardinality)
    val blockOffsets = blocked
      .groupBy("blk")
      .agg(sum("n").as("blk_n"))
      .withColumn("blk_off", coalesce(sum(col("blk_n")).over(Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("blk"), col("blk_off"))
    // phase 2: within-block running sum (partitioned window, bounded at
    // blockSize rows) + broadcast block offset = global prefix sum
    val win = Window.partitionBy("blk").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    val spans = blocked
      .join(broadcast(blockOffsets), Seq("blk"))
      .withColumn("fin", col("blk_off") + sum(col("n")).over(win))
      .filter(col("n") > 0)
      .withColumn("st", col("fin") - col("n"))
    spans
      .select(
        col("doc_id"),
        col("st"),
        col("fin"),
        explode(sequence(floor(col("st") / seqLen), floor((col("fin") - 1) / seqLen))).as("seq_id")
      )
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        min("doc_id").as("first_doc"),
        sum(least(col("fin"), (col("seq_id") + 1) * seqLen) - greatest(col("st"), col("seq_id") * seqLen)).as("n_tokens")
      )
  }

  def packQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    packSequences(Tables.documents(s, dir), "doc_id", "text").orderBy($"seq_id")
  }

  /** ◆ Cluster-balanced subsampling: assign every embedding to its IVF
    * cell (the oracled deterministic quantizer of `Similarity.ivfAssign`)
    * and keep the `cap` smallest md5-keyed members per cell — the
    * diversity-preserving subsample a curation pipeline uses so one
    * over-represented mode can't dominate the training mix
    * (cluster-then-uniform sampling, the SemDeDup/DCLM shape).
    *
    * Scale note: cells are FEW and rows are MANY — a single per-cell
    * window would funnel the corpus through `nCells` tasks. The
    * selection therefore runs two-phase top-k: a salted local round
    * first (bounded window partitions), then the final per-cell rank
    * over ≤ salts·cap survivors. Per-salt top-cap provably contains the
    * global top-cap.
    */
  def clusterSample(
      s: SparkSession,
      dir: String,
      cap: Int = 3,
      nCells: Int = 8,
      salts: Int = 32,
      centroids: Option[DataFrame] = None
  ): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    // default: the oracled deterministic seed quantizer (vec_id < nCells).
    // At corpus scale pass the Lloyd-trained cells (Similarity.trainIvf):
    // trained centroids spread the population far more evenly, which is
    // the whole point of balanced sampling — see CurationSpec's
    // balance-improvement gate.
    val cents = centroids.getOrElse(
      emb
        .filter($"vec_id" < nCells)
        .select($"vec_id".as("cell_id"), $"embedding".cast("array<double>").as("centroid"))
    )
    val assigned = graft.ann.Similarity.ivfAssign(emb, cents).select("vec_id", "cell_id")
    val key = md5(col("vec_id").cast("string"))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy("cell_id", "salt")
      .orderBy(key, col("vec_id"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy("cell_id")
      .orderBy(key, col("vec_id"))
    assigned
      .withColumn("salt", pmod(col("vec_id"), lit(salts)))
      .withColumn("lrk", row_number().over(w1))
      .filter(col("lrk") <= cap)
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= cap)
      .select(col("cell_id"), col("vec_id"), col("rk"))
  }

  def clusterSampleQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    clusterSample(s, dir).orderBy($"cell_id", $"rk")
  }

  /** ◆ SemDeDup (Abbas et al. 2023): SEMANTIC near-dup pruning inside
    * embedding-space clusters — the modality MinHash can't see (same
    * meaning, different words). Every vector is assigned to its IVF
    * cell (the oracled deterministic quantizer), pairs form ONLY within
    * a cell (the per-cell N² is the knob: nCells scales with the corpus
    * so cells stay bounded — real SemDeDup runs 50k+ clusters), pairs
    * with cosine ≥ minCos link, and each component keeps its MIN id —
    * the same transitive-closure decision rule as [[dedupClusters]],
    * re-using [[graft.operators.Graph.components]] and the codegen'd
    * cosine. Returns the multi-member cluster summary.
    */
  def semDedup(s: SparkSession, dir: String, nCells: Int = 8, minCos: Double = 0.35): DataFrame = {
    import s.implicits._
    graft.plans.VectorExpressions.register(s)
    val emb = Tables.embeddings(s, dir)
    val centroids = emb
      .filter($"vec_id" < nCells)
      .select($"vec_id".as("cell_id"), $"embedding".cast("array<double>").as("centroid"))
    val assigned = graft.ann.Similarity.ivfAssign(emb, centroids)
    val a = assigned.select($"cell_id", $"vec_id".as("id_a"), $"v".as("va"))
    val b = assigned.select($"cell_id", $"vec_id".as("id_b"), $"v".as("vb"))
    // multi-consumer (CC sizing count + node set + edge list would each
    // re-run the within-cell cosine join): materialize the pair list
    // once, release as soon as components() has checkpointed its result
    val (pairs, pairBlocks) = graft.operators.Staged.checkpointOwned(
      a.join(b, Seq("cell_id"))
        .filter($"id_a" < $"id_b")
        .filter(graft.plans.VectorExpressions.vecCosine($"va", $"vb") >= minCos)
        .select($"id_a", $"id_b")
    )
    try {
      val nodes = pairs.select($"id_a".as("id")).union(pairs.select($"id_b".as("id"))).distinct()
      val edges = pairs.select($"id_a".as("src"), $"id_b".as("dst"))
      graft.operators.Graph
        .components(nodes, edges)
        .groupBy($"lab".as("cluster_id"))
        .agg(count(lit(1)).as("n_members"), sum($"id").as("member_id_sum"))
    } finally graft.operators.Staged.release(pairBlocks)
  }

  def semDedupQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    semDedup(s, dir).orderBy($"cluster_id")
  }

  /** ◆ Deterministic quality-weighted resampling: keep a document with
    * probability proportional to a quality weight — here p =
    * min(1, n_tokens/128), the longer-is-likelier prior of
    * quality-scored mixes (FineWeb-edu-style score sampling) — decided
    * by the salted-md5 uniform already used for [[TextOps]] sampling,
    * so the draw is reproducible under any repartitioning. The accept
    * test is INTEGER math (u·den < num·10⁶): no float threshold can
    * round differently across engines.
    */
  def weightedSample(docs: DataFrame, idCol: String, num: Column, den: Column): DataFrame = {
    val u6 = conv(substring(md5(concat(lit("rs:"), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("long") % 1000000L
    docs.withColumn("kept", u6 * den < num * lit(1000000L))
  }

  /** ◆ The END-TO-END curation pipeline — documents in, training mix
    * out, every stage an operator this engine already proves
    * individually against the oracle:
    *
    *  1. hold out the eval split (never trains);
    *  2. gate: ≥ 8 tokens;
    *  3. decontaminate: drop train docs sharing any 8-gram with eval;
    *  4. near-dup dedup: MinHash pairs → components → keep only each
    *     cluster's keeper;
    *  5. report the surviving mix per source (doc + token counts).
    *
    * One fused plan: the survivors' frame is materialized once and
    * feeds both the dedup candidate generation and the final rollup.
    * This is the query a 100 TB corpus actually runs nightly; at that
    * scale each `persist` becomes a staged table and nothing else
    * changes.
    */
  /** Per-document fused curation payload (public: Catalyst
    * instantiates it). `sh8` / `sig` are null for docs below the gram
    * sizes, exactly like the standalone kernels. */
  final case class CurateDoc(n_tok: Long, sh8: Array[Long], sig: Array[Long])

  /** ONE-pass curation kernel: tokenize once, emit the token count
    * (stage 2's gate), the distinct 8-gram decontamination hashes
    * (stage 3's join keys) and the 16-position MinHash signature
    * (stage 4's candidate input). Field-for-field identical to
    * `size(tokens)` / `Dedup.shingleHashesSerial(t, 8)` /
    * `Dedup.minhashSigSerial(t, 3, 16)` (CurationSpec pins all three),
    * but the corpus text is scanned and tokenized ONCE instead of
    * three times (guide §2.3/§6 — one pass). */
  private[graft] val curateDocSerial = udf { text: String =>
    val toks = if (text == null) Array.empty[String] else Dedup.tokensOf(text)
    CurateDoc(
      toks.length.toLong,
      Dedup.shingleHashesFromToks(toks, 8),
      Dedup.minhashSigFromToks(toks, 3, 16)
    )
  }

  def curate(docs: DataFrame, minTokens: Int = 8, evalMod: Int = 10, evalRem: Int = 7): DataFrame = {
    // ONE corpus text pass (guide §2.3/§6 — the r18 verdict's top item:
    // this lane ran THREE full tokenize/md5 passes — decontam shingles,
    // the token-count gate, and the MinHash signatures on the
    // survivors). The fused kernel computes all three per-doc payloads
    // from one tokenization; the staged frame carries hashes, never
    // text, and every later stage reads it.
    val enriched = docs
      .select(col("doc_id"), col("source"), curateDocSerial(col("text")).as("k"))
      .transform(graft.operators.Staged.persist(_)) // staged: released by Staged.releaseAll
    val ev = isEval("doc_id", evalMod, evalRem)
    // the SAME (evalMod, evalRem) defines both the holdout filter and
    // the decontamination eval side — one split definition, one place.
    // Contamination = "train doc shares >= 1 8-gram with any eval doc";
    // the former shape counted the shared grams per doc and dropped the
    // count — the semi-join is the same doc set without the aggregate.
    val sh = enriched.select(col("doc_id"), explode(col("k.sh8")).as("h"))
    val evalSh = sh.filter(ev).select(col("h")).distinct()
    // no distinct: the left_anti below tolerates duplicate right-side
    // keys, so deduping contaminated ids would only add an exchange
    val contaminated = sh.filter(!ev).join(evalSh, Seq("h"), "left_semi").select("doc_id")
    val base = enriched
      .filter(!ev && col("k.n_tok") >= minTokens)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("k.n_tok").as("n_tok"), col("k.sig").as("sig"))
      .transform(graft.operators.Staged.persist(_)) // staged: released by Staged.releaseAll
    val drops = clusterLabelsFromSigs(base.select(col("doc_id").as("id"), col("sig")))
      .filter(col("id") =!= col("lab"))
      .select(col("id").as("doc_id"))
    base
      .join(drops, Seq("doc_id"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
  }

  def curateQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    curate(Tables.documentsWide(s, dir)).orderBy($"source")
  }

  def weightedSampleQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = size(regexp_extract_all(lower($"text"), lit("\\w+"), lit(0))).cast("long")
    weightedSample(Tables.documents(s, dir).withColumn("n_tok", toks), "doc_id", col("n_tok"), lit(128L))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when($"kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when($"kept", $"doc_id").otherwise(0L)).as("kept_id_sum")
      )
      .orderBy($"source")
  }
}
