package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document chunking for training/RAG ingestion — the two standard
  * strategies a large-scale corpus pipeline splits text with:
  *
  *  - [[chunkQuery]] — fixed sliding token windows with overlap (the
  *    retrieval-ingestion default): window `Win` tokens, stride
  *    `Step`, last window clamped. One generator over computed
  *    columns — no join, no shuffle beyond the source scan;
  *    per-chunk digests make the output hash-checkable.
  *  - [[cdcQuery]] — content-defined chunking (Gear rolling hash):
  *    boundaries where the rolling hash's low bits vanish, so chunk
  *    edges are CONTENT-anchored — insertions shift a boundary only
  *    locally, which is what makes CDC the byte-level dedup
  *    primitive (FastCDC/LBFS lineage). The rolling hash
  *    h_p = 2·h_{p−1} + gear(c_p) is evaluated mod 2^6 (the boundary
  *    mask), which collapses the infinite recurrence to the last six
  *    characters — six window lags, no per-row state, fully
  *    relational. Chunks re-materialize by (start, length) substring
  *    against the document, never by reassembling characters, and
  *    cross-document duplicate chunks surface through one digest
  *    join.
  *
  * Scale: both are one pass over the corpus; CDC adds one windowed
  * shuffle keyed by doc and one digest-keyed aggregation whose
  * cardinality is the chunk count. At 100 TB the digest join is the
  * classic dedup shuffle — partitioned by digest, no driver state.
  */
object Chunking {

  val Win = 32
  val Step = 24

  /** ◆ q_chunk — overlapping token windows, one row per chunk with
    * its token count and content digest. */
  def chunkQuery(s: SparkSession, dir: String): DataFrame =
    tokenChunks(graft.Tables.documents(s, dir))

  /** Token-window chunk table over (doc_id, text). */
  def tokenChunks(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .withColumn("n", size($"toks"))
      .filter($"n" > 0)
      .withColumn("k", greatest(ceil(($"n" - Win) / lit(Step.toDouble)).cast("int"), lit(0)))
      .select($"doc_id", explode(sequence(lit(0), $"k")).as("chunk_id"), $"toks")
      .select(
        $"doc_id",
        $"chunk_id",
        size(slice($"toks", $"chunk_id" * Step + 1, lit(Win))).as("n_tok"),
        md5(concat_ws(" ", slice($"toks", $"chunk_id" * Step + 1, lit(Win))).cast("binary")).as("digest")
      )
  }

  /** Per-character gear value: the engine-neutral md5-derived hash
    * (identical to the relational column and the DuckDB oracle).
    * A character alphabet is tiny, so values memoize per executor —
    * the md5 count drops from chars to DISTINCT chars. */
  private val gearCache = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
  private def gearOf(cp: Int): Long = {
    val cached = gearCache.get(cp)
    if (cached != null) cached.longValue()
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(("g:" + new String(Character.toChars(cp))).getBytes("UTF-8"))
      val hex = md.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15)
      val v = java.lang.Long.parseLong(hex, 16) % 64
      gearCache.put(cp, java.lang.Long.valueOf(v))
      v
    }
  }

  /** One serial pass over a document: chunk START offsets, in CODE
    * POINT units — the relational path indexes with Spark
    * `length`/`substr`, which count code points, so the serial kernel
    * must too or non-BMP documents (emoji, supplementary CJK)
    * mis-slice. Position p opens a new chunk iff the 6-lag weighted
    * gear sum at p−1 hits the mask — exactly the relational cut rule
    * below, spec-proven equal. O(n) with O(1) state (the 6-value lag
    * ring). */
  private[text] def gearStartsSerial(text: String): Array[Int] = {
    if (text.isEmpty) return Array.empty
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    starts += 0
    val lags = new Array[Long](6)
    val nCp = text.codePointCount(0, text.length)
    var ci = 0 // UTF-16 char cursor
    var p = 0 // code-point index
    while (p < nCp) {
      var k = 5
      while (k > 0) { lags(k) = lags(k - 1); k -= 1 }
      val cp = text.codePointAt(ci)
      lags(0) = gearOf(cp)
      val h = lags(0) + lags(1) * 2 + lags(2) * 4 + lags(3) * 8 + lags(4) * 16 + lags(5) * 32
      if (h % 64 == 0 && p + 1 < nCp) starts += p + 1
      ci += Character.charCount(cp)
      p += 1
    }
    starts.toArray
  }

  /** Native single-pass variant of [[gearChunks]]: same rows, same
    * digests, no per-character explode / window shuffles — ONE
    * projection computes every (start, len) span, then the digest
    * join proceeds at chunk granularity exactly as before. The
    * relational construction stays as the documented alternative and
    * the cross-check (ChunkingSpec proves them identical). */
  def gearChunksNative(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val spans = udf { text: String =>
      val st = gearStartsSerial(text)
      // spans are in code points (matching Spark substr semantics)
      val n = text.codePointCount(0, text.length)
      st.zipWithIndex.map { case (b, i) =>
        val end = if (i + 1 < st.length) st(i + 1) else n
        (i.toLong, b.toLong, (end - b).toLong)
      }
    }
    docs
      .filter(length($"text") > 0)
      .select($"doc_id", $"text", explode(spans($"text")).as("c"))
      .select(
        $"doc_id",
        $"c._1".as("chunk"),
        $"c._2".as("start"),
        $"c._3".as("len"),
        md5($"text".substr(($"c._2" + 1).cast("int"), $"c._3".cast("int")).cast("binary")).as("digest")
      )
  }

  /** ◆ q_cdc — Gear content-defined chunks per document: chunk count,
    * in-document distinct digests, chunks shared with OTHER documents
    * (the dedup signal), and total length (= document length, the
    * partition invariant). Runs on the single-pass native span
    * kernel; [[gearChunks]] is the relational equivalent (spec-equal). */
  def cdcQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunks = gearChunksNative(graft.Tables.documents(s, dir).select($"doc_id", $"text"))
    val freq = chunks.groupBy($"digest").agg(countDistinct($"doc_id").as("ndocs"))
    chunks
      .join(freq, "digest")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_chunks"),
        countDistinct($"digest").cast("int").as("n_distinct"),
        sum(when($"ndocs" > 1, 1).otherwise(0)).cast("int").as("n_shared"),
        sum($"len").cast("long").as("len_sum")
      )
  }

  /** Gear CDC chunk table over (doc_id, text): one row per chunk with
    * its start offset, length and content digest.
    *
    * 100 TB shape: the rolling hash has a SIX-character horizon, so
    * cut decisions are computed in per-(doc, block) windows of
    * `blockSize` characters with a 5-character overlap copied from
    * the previous block — EXACT (spec-gated block-size invariance)
    * while no task ever holds more than one block, however large a
    * document gets. Chunk ids are the packSequences two-phase prefix
    * sum: within-block running cut count + per-block offsets (one
    * tiny window over block summaries). Char rows carry (doc, pos,
    * gear) ONLY — the document text re-enters by a join at CHUNK
    * granularity, never on the per-character path. */
  def gearChunks(docs: DataFrame, blockSize: Int = 4096): DataFrame = {
    require(blockSize >= 8, s"gearChunks: blockSize $blockSize too small for the 6-char hash horizon")
    val s = docs.sparkSession
    import s.implicits._
    val chars = docs
      .filter(length($"text") > 0)
      .select($"doc_id", $"text", explode(sequence(lit(0), length($"text") - 1)).as("pos"))
      .select(
        $"doc_id",
        $"pos",
        ($"pos" / blockSize).cast("long").as("block"),
        (conv(substring(md5(concat(lit("g:"), $"text".substr($"pos" + 1, lit(1)))), 1, 15), 16, 10)
          .cast("long") % 64).as("gv")
      )
    // 5-char left context duplicated into the NEXT block (ctx rows
    // feed lags only; their own cut flag is computed in their home block)
    val ctx = chars
      .filter($"pos" % blockSize >= blockSize - 5)
      .withColumn("block", $"block" + 1)
      .withColumn("is_ctx", lit(true))
    val all = chars.withColumn("is_ctx", lit(false)).unionByName(ctx)
    val w = Window.partitionBy($"doc_id", $"block").orderBy($"pos")
    val cut = (($"gv"
      + lag($"gv", 1, 0).over(w) * 2
      + lag($"gv", 2, 0).over(w) * 4
      + lag($"gv", 3, 0).over(w) * 8
      + lag($"gv", 4, 0).over(w) * 16
      + lag($"gv", 5, 0).over(w) * 32) % 64 === 0).cast("long")
    val cuts = all
      .withColumn("cut", cut)
      .withColumn("run", coalesce(sum($"cut").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(!$"is_ctx")
    // per-block offsets: cuts in all PRIOR blocks of the doc (block
    // summaries are tiny — chars/blockSize rows per doc)
    val wb = Window.partitionBy($"doc_id").orderBy($"block")
    val offsets = cuts
      .groupBy($"doc_id", $"block")
      .agg(sum($"cut").as("bc"), min($"run").as("ctx_run"))
      .withColumn(
        "off",
        coalesce(sum($"bc").over(wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
      )
      .select($"doc_id", $"block", $"off", $"ctx_run")
    val cid = cuts
      .join(offsets, Seq("doc_id", "block"))
      // run counts cut flags within the block INCLUDING the copied
      // context rows' flags; subtract the context prefix (ctx_run =
      // run at the block's first real row) so chunk ids chain exactly
      .select($"doc_id", $"pos", ($"off" + $"run" - $"ctx_run").as("chunk"))
    val chunks = cid
      .groupBy($"doc_id", $"chunk")
      .agg(min($"pos").as("start"), count(lit(1)).as("len"))
    chunks
      .join(docs.select($"doc_id", $"text"), "doc_id")
      .select(
        $"doc_id",
        $"chunk",
        $"start",
        $"len",
        md5($"text".substr(($"start" + 1).cast("int"), $"len".cast("int")).cast("binary")).as("digest")
      )
  }
}
