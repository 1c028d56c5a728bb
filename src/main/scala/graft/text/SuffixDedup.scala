package graft.text

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** ◆ EXACT substring-duplication analysis via a DISTRIBUTED suffix
  * array — the exact form of Lee et al. 2022's substring dedup
  * ("Deduplicating Training Data Makes Language Models Better"), whose
  * ESA machinery finds every duplicated span of ANY length. The
  * fixed-n gram-hash pipeline ([[Curation.dupSpans]] /
  * [[Curation.cutDupSpans]]) answers "is this n-window duplicated?";
  * this module answers the strictly stronger "how LONG is the longest
  * duplicate starting here?" — per corpus position — which fixed-n
  * hashing cannot (it saturates at n and misses sub-n structure).
  *
  * Construction is prefix doubling (the classic distributed suffix-
  * array algorithm — Manber–Myers ranks, realized with sort passes the
  * way the published MPI/MapReduce SACAs do it, e.g. Flick & Aluru,
  * SC'15): suffixes are identified by (doc, pos) — nothing ever
  * materializes the concatenated corpus — and after the initial
  * rank-by-first-`InitPrefix`-chars sort, each round k doubles the
  * compared prefix by re-ranking every still-tied suffix on the pair
  * (rank(p), rank(p+k)). Ranks are SPARSE (rank = count of strictly
  * smaller suffixes), so a tie group at rank r with m members owns
  * slot [r, r+m) and refines entirely inside it: finalized suffixes
  * (singleton groups) drop out of every later round, and the working
  * set collapses geometrically on real text.
  *
  * Scale shape per round (r17 — resolved-rank FREEZE): finalized
  * ranks never change after finalization, so each round's finalized
  * piece is frozen into a cache hash-partitioned AND sorted on
  * (doc, pos). The per-round rank(p+k) lookup is then a
  * requests-driven chain of sort-merge joins in which ONLY the
  * work-sized request side shuffles — the cached pieces satisfy the
  * join's distribution and ordering as-is, so the corpus-sized rank
  * table re-shuffles NEVER (one repartition per piece, at freeze
  * time). Per-round shuffle volume is O(surviving ties), which
  * collapses geometrically on real text; before r17 every round
  * re-shuffled the full table (the r16 sf10 probe measured rounds ×
  * ~20-25 GB of live scratch at 1 G chars — the single-box
  * constraint this freeze removes). The remaining per-round work:
  * the request join, one grouped count, and one window PARTITIONED BY
  * the old rank over the distinct (rank, rank+k) pairs —
  * group-bounded, never a global single-task window. The only global
  * sort in the whole build is the initial rank, done RDD-side
  * (range-partitioned, skew-sampled) with a numPartitions-sized
  * driver collect of partition subtotals. Rounds are O(log maxDocLen)
  * regardless of corpus size. Pathological corpora (one character
  * repeated everywhere) keep one giant tie group alive for all log
  * rounds — the distinct PAIR table stays tiny there, so the window
  * cost stays bounded even then. Freezing is LAZY per piece: a corpus
  * that direct-finishes before any doubling round never pays the
  * cache (small SFs run exactly the pre-r17 plan).
  *
  * SCRATCH-DISK note (r16 sf10 probe): shuffle files stay on disk
  * until the ContextCleaner observes their RDD graph collected — run
  * long iterative jobs with `spark.cleaner.periodicGC.interval` well
  * under the job length ([[graft.Sessions.local]] sets 5 min). The
  * r17 freeze shrinks what there is to retain: dead rounds hold
  * O(work) shuffle files instead of O(corpus), and the corpus-scale
  * state lives in the piece caches (spillable storage, one copy),
  * not in per-round shuffle scratch.
  */
object SuffixDedup {

  /** First-round compare width (chars). Wider costs more sort-key
    * bytes but discriminates far more suffixes in round zero (real
    * prose ties heavily at 16 chars — common phrases — and barely at
    * 32), which shrinks every later round's working set. */
  val InitPrefix = 32

  /** SF-adaptive shuffle width: ~128K corpus positions per partition,
    * floored at 8 (parallelism for the lcp/compare work), capped at
    * 2048 (scratch-bounded tasks at 100x, the r16 design point). A
    * 1.5M-char sf0.1 corpus gets ~11 partitions instead of a fixed 32
    * (measured 3.6 s vs 4.9 s for the extent pipeline); a 150M-char
    * sf10 corpus grows to ~1100 bounded tasks instead of 32 giants. */
  private def adaptiveParts(chars: Long): Int =
    math.min(2048L, math.max(8L, chars / 131072L)).toInt

  /** Initial sparse ranks from ONE range-partitioned sort of the
    * (window, doc, pos) rows: rank(row) = global index of the first row
    * sharing its window, fin = the window is unique corpus-wide. Key
    * runs that straddle partition boundaries are stitched from a
    * numPartitions-sized driver summary (count, first/last key,
    * tail-run length per partition) — the two-pass cumulative trick,
    * never a one-partition Window, and never a groupBy + join-back
    * (this stage dominates the whole SA build, so it gets exactly one
    * shuffle). The range partitioner samples the key distribution, so
    * a heavily-duplicated window still spreads across partitions; all
    * its rows rank at the run's stitched global start, as sparse ranks
    * require. */
  private def initialRanks(withWin: DataFrame, parts: Int): (DataFrame, Seq[RDD[_]]) = {
    val spark = withWin.sparkSession
    import spark.implicits._
    // the global sort runs as a Tungsten range shuffle (repartitionByRange
    // + sortWithinPartitions), NOT RDD.sortBy — the row payload never
    // round-trips through Java serialization; only the two stitch passes
    // below read it out as JVM objects
    val sortedDf = withWin
      .select(col("k"), col("d"), col("p"))
      .repartitionByRange(parts, col("k"), col("d"), col("p"))
      .sortWithinPartitions("k", "d", "p")
    val sorted: RDD[(String, (Long, Int))] = sortedDf.rdd
      .map(r => (r.getString(0), (r.getLong(1), r.getInt(2))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // per-partition summary: (index, count, firstKey, lastKey, tailRunLen)
    val meta = sorted
      .mapPartitionsWithIndex { case (i, it) =>
        var n = 0L
        var first: String = null
        var last: String = null
        var tailRun = 0L
        it.foreach { case (k, _) =>
          if (first == null) first = k
          if (k == last) tailRun += 1 else tailRun = 1
          last = k
          n += 1
        }
        Iterator((i, n, first, last, tailRun))
      }
      .collect()
      .sortBy(_._1)
    val offsets = meta.scanLeft(0L)(_ + _._2).init // global index of each partition's first row
    // stitch pass (driver, numPartitions entries): where does the key
    // run each partition OPENS with begin globally, and what are the
    // boundary rows' neighbor keys (for the uniqueness flag)
    val headStart = new Array[Long](meta.length)
    val prevLast = new Array[String](meta.length)
    val nextFirst = new Array[String](meta.length)
    var curKey: String = null
    var curStart = 0L
    meta.foreach { case (i, n, first, last, tailRun) =>
      prevLast(i) = curKey
      if (n > 0L) {
        headStart(i) = if (first == curKey) curStart else offsets(i)
        if (last != curKey || last != first) {
          // the run open at this partition's end starts at its own tail
          curStart = offsets(i) + n - tailRun
          curKey = last
        } // else: the whole partition continues curKey's run
      }
    }
    var firstSeen: String = null
    meta.reverse.foreach { case (i, n, first, _, _) =>
      nextFirst(i) = firstSeen
      if (n > 0L) firstSeen = first
    }
    val bc = spark.sparkContext.broadcast((offsets, headStart, prevLast, nextFirst))
    val ranked = sorted.mapPartitionsWithIndex { case (i, it) =>
      val (off, hs, pl, nf) = bc.value
      // buffered for one-row lookahead on the uniqueness flag; bounded
      // by the range split, the same order as the shuffle block itself
      val buf = it.toArray
      val n = buf.length
      var j = 0
      var groupStart = 0
      val out = new Array[(Long, Int, Long, Boolean)](n)
      while (j < n) {
        val k = buf(j)._1
        if (j > 0 && k != buf(j - 1)._1) groupStart = j
        val rank =
          if (groupStart == 0 && k == pl(i)) hs(i) // continues the previous partition's run
          else off(i) + groupStart
        val prevK = if (j > 0) buf(j - 1)._1 else pl(i)
        val nextK = if (j < n - 1) buf(j + 1)._1 else nf(i)
        val fin = k != prevK && k != nextK
        out(j) = (buf(j)._2._1, buf(j)._2._2, rank, fin)
        j += 1
      }
      out.iterator
    }
    val out = ranked.toDF("d", "p", "rank", "fin")
    // sorted's blocks back `out` lazily; the CALLER releases them the
    // moment `out` is checkpointed (corpus-sized — holding them to
    // query end doubled resident scratch at the sf10 scale)
    (out, Seq[RDD[_]](sorted))
  }

  /** (doc_id, pos, rank) sparse suffix ranks over the whole corpus —
    * pos is 1-based (SQL substr parity), rank = number of strictly
    * smaller suffixes corpus-wide; EQUAL suffixes (full-text ties)
    * share their rank. */
  def suffixRanks(docs: DataFrame, idCol: String, textCol: String,
      directFinishBytes: Long = DirectFinishBytes): DataFrame = {
    val d = docs.select(col(idCol).cast("long").as("d"), col(textCol).as("t")).filter(length(col("t")) >= 1)
    val lenRow = d.agg(max(length(col("t"))), sum(length(col("t")))).head()
    val maxLen = lenRow.getInt(0)
    val aparts = adaptiveParts(lenRow.getLong(1))

    // one pass: every (doc, 1-based pos) with its InitPrefix-char window
    val withWin = d
      .select(col("d"), col("t"), explode(sequence(lit(1), length(col("t")))).as("p"))
      .select(col("d"), col("p"), expr(s"substring(t, p, $InitPrefix)").as("k"))
    val (ranked0, sortedBlocks) = initialRanks(withWin, aparts)
    val (r0, r0Blocks) = graft.operators.Staged.checkpointOwned(ranked0) // eager
    // the range-sorted stage backed ranked0 only until this checkpoint:
    // release it NOW (corpus-sized persist + its shuffle dependency)
    graft.operators.Staged.release(sortedBlocks)

    // finalized suffixes LEAVE the loop: each round re-ranks (and
    // re-checkpoints) only the still-tied working set, which collapses
    // geometrically on real text — round 1 is O(corpus), the tail is
    // O(surviving ties). Finalized ranks are FROZEN (they never change
    // after finalization — Manber–Myers), so each round's piece is
    // cached CO-PARTITIONED on (d, p): the per-round rank(p+k) lookup
    // is then a requests-driven join in which ONLY the work-sized
    // request side shuffles — the cached pieces' hash partitioning
    // satisfies the join's distribution, so the corpus-sized table
    // never re-shuffles after its one repartition (the r16 sf10 probe
    // diagnosed exactly that per-round corpus shuffle as the
    // single-box scratch constraint: rounds × ~25 GiB at 1 G chars).
    val parts = aparts
    // Freezing = caching the piece hash-partitioned AND sorted on the
    // lookup key: every later round's sort-merge join then neither
    // exchanges nor re-sorts the cached side (InMemoryTableScan
    // preserves both properties). LAZY per piece — a corpus that
    // direct-finishes before any doubling round (small SFs) never pays
    // the repartition/cache at all; the first lookup round freezes
    // whatever pieces exist, later rounds freeze only their own.
    final class Piece(raw: DataFrame) {
      private var forced = false
      lazy val lookup: DataFrame = {
        forced = true
        graft.operators.Staged.persist(
          raw.repartition(parts, col("d"), col("p")).sortWithinPartitions("d", "p"))
      }
      /** frozen form if a round built it (cached — reuse), raw otherwise */
      def best: DataFrame = if (forced) lookup else raw
    }
    var pieces = List(new Piece(r0.filter(col("fin")).select("d", "p", "rank")))
    var work = r0.filter(!col("fin")).select("d", "p", "rank")
    var workCount = work.count()
    // round-scoped checkpoint lifetime (the Graph-fixpoint pattern):
    // round r's checkpoint backs its work (consumed into round r+1's
    // eager checkpoint) and its piece's raw form (cache-backed once
    // any later lookup round forces the freeze) — so after round
    // r+1 materializes, round r's blocks are DEAD and release
    // immediately instead of accumulating rounds × corpus scratch to
    // query end (the r16/r17 sf10 disk-exhaustion mode). Whatever is
    // still pending at loop exit stays alive for the returned union
    // and releases with the session registry.
    var pendingBlocks: List[Seq[org.apache.spark.rdd.RDD[_]]] = List(r0Blocks)

    var k = InitPrefix.toLong
    while (k < maxLen && workCount > 0) {
      if (workCount * maxLen.toLong < directFinishBytes) {
        // DIRECT FINISH (prefix-doubling "with discarding + direct
        // comparison", the standard hybrid): once the surviving tied
        // set is small, one window per tie group ordered by the ACTUAL
        // remaining suffix settles every group in a single round —
        // rank() is sparse within the group (equal tails keep sharing,
        // as genuinely equal suffixes must). The guard bounds the
        // shuffled tail payload (workCount × maxDocLen); above it the
        // doubling rounds keep shrinking the set first, so adversarial
        // corpora (one repeated character) stay O(log) rounds of
        // bounded shuffles instead of one giant-partition sort.
        val tails = work
          .join(d, "d")
          .select(col("d"), col("p"), col("rank"), expr("substring(t, p, 2147483647)").as("tail"))
          .repartition(aparts, col("rank")) // satisfies the window distribution at adaptive width
        val w = Window.partitionBy("rank").orderBy("tail")
        work = tails.select(col("d"), col("p"), (col("rank") + rank().over(w) - 1).as("rank"))
        workCount = 0
      } else {
        // requests-driven lookup: each tied suffix asks for rank(p+k).
        // Pieces are disjoint by position, so across the chained left
        // joins at most one lookup column is non-null; -1 is the
        // "no such suffix" sentinel (p+k past the doc end), exactly as
        // the old shifted-union join filled it.
        val req = work.select(col("d"), col("p"), col("rank"), (col("p") + k).as("q"))
        var joined = req
        var rnCols = List.empty[org.apache.spark.sql.Column]
        (work :: pieces.map(_.lookup)).zipWithIndex.foreach { case (piece, i) =>
          val r = piece.select(col("d").as(s"ld$i"), col("p").as(s"lp$i"), col("rank").as(s"rn$i"))
          joined = joined
            .join(r, joined("d") === r(s"ld$i") && joined("q") === r(s"lp$i"), "left")
            .drop(s"ld$i", s"lp$i")
          rnCols ::= col(s"rn$i")
        }
        val wn = joined.select(
          col("d"), col("p"), col("rank"),
          coalesce(rnCols.reverse :+ lit(-1L): _*).as("rn"))
        val pairs = wn.groupBy("rank", "rn").agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("rank").orderBy("rn")
        val offs = pairs
          .withColumn("off", coalesce(sum(col("c")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("nfin", col("c") === 1)
        val (refined, refinedBlocks) = graft.operators.Staged.checkpointOwned(
          wn
            .join(offs, Seq("rank", "rn"))
            .select(col("d"), col("p"), (col("rank") + col("off")).as("rank"), col("nfin").as("fin"))
        )
        // refined is materialized (checkpointOwned is eager), which
        // also forced and materialized every existing piece's frozen
        // cache through the request join — all prior rounds' blocks
        // are now dead
        pendingBlocks.foreach(graft.operators.Staged.release)
        pendingBlocks = List(refinedBlocks)
        pieces ::= new Piece(refined.filter(col("fin")).select("d", "p", "rank"))
        work = refined.filter(!col("fin")).select("d", "p", "rank")
        workCount = work.count()
        k *= 2
      }
    }
    pendingBlocks.foreach(graft.operators.Staged.register)
    // remaining ties are genuinely equal suffixes (identical text to
    // their full length) — they keep the shared sparse rank
    (work :: pieces.map(_.best)).reduce(_ union _)
  }

  /** Direct-finish payload bound (bytes ≈ surviving ties × max doc
    * length): below it the remaining groups sort by their actual
    * suffix tails in one round; above it prefix doubling keeps going. */
  val DirectFinishBytes: Long = 256L << 20

  /** Total suffix order: sparse rank + deterministic (doc, pos) break
    * inside full-text tie groups — the tie-group window is bounded by
    * duplicate-suffix multiplicity, never the corpus. */
  def suffixOrder(docs: DataFrame, idCol: String, textCol: String,
      directFinishBytes: Long = DirectFinishBytes): DataFrame = {
    val ranks = suffixRanks(docs, idCol, textCol, directFinishBytes)
    val w = Window.partitionBy("rank").orderBy("d", "p")
    ranks.select(col("d"), col("p"), (col("rank") + row_number().over(w) - 1).as("ord"))
  }

  /** LCP in CODE POINTS (positions are Spark/SQL character positions,
    * which count code points — a UTF-16 charAt walk would drift on
    * supplementary-plane text and could stop mid-surrogate-pair). */
  private def lcpFrom(a: String, pa: Int, b: String, pb: Int): Long = {
    var ia = a.offsetByCodePoints(0, pa - 1)
    var ib = b.offsetByCodePoints(0, pb - 1)
    var n = 0L
    var go = true
    while (go && ia < a.length && ib < b.length) {
      val ca = a.codePointAt(ia)
      if (ca == b.codePointAt(ib)) {
        val w = Character.charCount(ca)
        ia += w; ib += w; n += 1
      } else go = false
    }
    n
  }

  private val lcpUdf = udf { (a: String, pa: Int, b: String, pb: Int) =>
    lcpFrom(a, pa, b, pb)
  }

  /** Per corpus position, the EXACT longest duplicate extent: the
    * length of the longest substring starting at (doc, pos) that also
    * occurs anywhere else in the corpus (another doc or another
    * position of the same doc). Classical identity: that extent is the
    * max LCP with the suffix-order NEIGHBORS, so one self-join on
    * ord±1, two text lookups, and a per-pair character walk bounded by
    * the true LCP — no pair table, no quadratic anything. */
  def dupExtents(docs: DataFrame, idCol: String, textCol: String, cap: Int = 0,
      directFinishBytes: Long = DirectFinishBytes): DataFrame =
    if (cap > 0) cappedExtents(docs, idCol, textCol, cap)
    else {
      // sfx feeds both sides of the neighbor join and adj feeds both
      // sides of the position union — staged, or the whole SA plan
      // (including the non-checkpointed finish window) re-executes 4x
      val texts = docs.select(col(idCol).cast("long").as("d"), col(textCol).as("t"))
      val sfx = graft.operators.Staged.persist(suffixOrder(docs, idCol, textCol, directFinishBytes))
      val nxt = sfx.select((col("ord") - 1).as("ord"), col("d").as("d2"), col("p").as("p2"))
      val adj = sfx
        .join(nxt, "ord")
        .join(texts, "d")
        .withColumnRenamed("t", "ta")
        .join(texts.select(col("d").as("d2"), col("t").as("tb")), "d2")
        .select(col("d"), col("p"), col("d2"), col("p2"), lcpUdf(col("ta"), col("p"), col("tb"), col("p2")).as("l"))
      val staged = graft.operators.Staged.persist(adj)
      staged
        .select(col("d"), col("p"), col("l"))
        .union(staged.select(col("d2").as("d"), col("p2").as("p"), col("l")))
        .groupBy("d", "p")
        .agg(max(col("l")).as("extent"))
    }

  /** Capped extents from ONE range sort of the cap-char windows — no
    * sparse-SA build at all. min(extent, cap) is fully determined by
    * the windows: LCP_win(a,b) = min(LCP_true(a,b), cap) for every
    * suffix pair (equal-or-shorter windows walk to the shorter tail's
    * end, which IS the true LCP there), and in any lexicographic order
    * of the windows the sorted-strings identity max-LCP-over-all =
    * max-LCP-with-adjacent still holds. Within an equal-window tie
    * block every member sees the block's shared LCP from ANY in-block
    * neighbor, and block-boundary LCPs are fixed by the windows alone —
    * so sorting by (win, d, p) yields position-for-position the same
    * capped extents as sorting by the true suffix order (the same
    * argument [[OracleWindow]] documents for the windowed SQL oracle;
    * SuffixDedupSpec's capped-vs-full test gates it).
    *
    * Per-position extents are emitted in the SAME partition pass that
    * walks the adjacency (extent = max(LCP with prev, LCP with next),
    * partition seams stitched from a numPartitions-sized driver
    * collect) — the former adjacency-pair union + groupBy(d,p) max
    * re-shuffled the whole corpus once more for a value each sorted
    * run already knows locally. */
  private def cappedExtents(docs: DataFrame, idCol: String, textCol: String, cap: Int): DataFrame = {
    val spark = docs.sparkSession
    val d = docs
      .select(col(idCol).cast("long").as("d"), col(textCol).as("t"))
      .filter(length(col("t")) >= 1)
    val parts = adaptiveParts(d.agg(sum(length(col("t")))).head().getLong(0))
    // one pass: every (doc, 1-based pos) with its cap-char window, range
    // sorted — the cap-char payload rides exactly one shuffle
    val sorted = d
      .select(col("d"), col("t"), explode(sequence(lit(1), length(col("t")))).as("p"))
      .select(col("d"), col("p"), expr(s"substring(t, p, $cap)").as("win"))
      .repartitionByRange(parts, col("win"), col("d"), col("p"))
      .sortWithinPartitions("win", "d", "p")
    val rdd = sorted.rdd
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    graft.operators.Staged.register(Seq(rdd))
    // seams: last row of each non-empty partition pairs with the next
    // non-empty partition's first row — numPartitions-sized driver data
    // (win strings are cap chars), never corpus-sized
    val edges = rdd.mapPartitionsWithIndex { (i, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next()
        var last = first
        it.foreach(last = _)
        Iterator((i, first, last))
      }
    }.collect().sortBy(_._1)
    val nParts = rdd.getNumPartitions
    val seamIn = new Array[Long](nParts) // LCP of partition's first row with global predecessor
    val seamOut = new Array[Long](nParts) // LCP of partition's last row with global successor
    edges.zip(edges.drop(1)).foreach { case ((ia, _, la), (ib, fb, _)) =>
      val l = lcpFrom(la._3, 1, fb._3, 1)
      seamOut(ia) = l
      seamIn(ib) = l
    }
    val bc = spark.sparkContext.broadcast((seamIn, seamOut))
    val extents = rdd.mapPartitionsWithIndex { (i, it) =>
      val (in, out) = bc.value
      if (!it.hasNext) Iterator.empty
      else new Iterator[(Long, Int, Long)] {
        private var cur = it.next()
        private var lcpPrev = in(i) // first row's LCP with the previous partition's last
        private var done = false
        def hasNext: Boolean = !done
        def next(): (Long, Int, Long) = {
          if (it.hasNext) {
            val nxt = it.next()
            val l = lcpFrom(cur._3, 1, nxt._3, 1)
            val res = (cur._1, cur._2, math.max(lcpPrev, l))
            cur = nxt
            lcpPrev = l
            res
          } else {
            done = true
            (cur._1, cur._2, math.max(lcpPrev, out(i)))
          }
        }
      }
    }
    import spark.implicits._
    extents.toDF("d", "p", "extent")
  }

  /** Per-doc exact dup profile: longest duplicated substring length and
    * how many positions open a duplicate of ≥ minLen. */
  def longestDup(docs: DataFrame, idCol: String, textCol: String, minLen: Int): DataFrame =
    dupExtents(docs, idCol, textCol)
      .groupBy(col("d").as("doc_id"))
      .agg(
        max(col("extent")).as("max_extent"),
        sum(when(col("extent") >= minLen, 1L).otherwise(0L)).as("n_dup_positions")
      )

  /** q_suffix_dedup oracle face. Extents are CAPPED at [[OracleWindow]]
    * so the DuckDB oracle can rebuild them from a W-char windowed
    * suffix sort: capping makes the per-position value independent of
    * the within-tie-block ordering (block members see extent == W from
    * an in-block neighbor either way, and block-boundary LCPs are
    * fixed by the W-prefixes alone), so the true-SA face here and the
    * windowed SQL face agree EXACTLY, position by position, while the
    * un-capped machinery is proven unbounded in SuffixDedupSpec. */
  val OracleWindow = 48
  val OracleMinLen = 16

  def suffixDedupQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.Tables.documentsWide(s, dir)
    val ext = dupExtents(docs, "doc_id", "text", cap = OracleWindow)
      .select(col("d").as("doc_id"), col("extent").as("ext"))
    docs
      .select(col("doc_id"), col("lang"))
      .join(ext, "doc_id")
      .groupBy($"lang")
      .agg(
        sum(when($"ext" >= OracleMinLen, 1L).otherwise(0L)).as("dup_positions"),
        sum(when($"ext" >= OracleMinLen, $"ext").otherwise(0L)).as("dup_chars"),
        max($"ext").as("max_extent")
      )
      .orderBy($"lang")
  }
}
