package graft

import org.apache.spark.sql.functions._

import graft.text.Curation

/** Curation-pipeline behavior tests on controlled inputs: cluster
  * canonicalization transitivity, decontamination hit/miss, repetition
  * fractions by hand, and packing conservation laws (the DuckDB oracle
  * covers the SQL faces at all three scale factors).
  */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  test("dedupClusters: transitive near-dups collapse into ONE cluster keyed by min id") {
    // 10 ~ 20 and 20 ~ 30 (chained edits) but 10 !~ 30 directly strongly;
    // transitivity must still put all three in one cluster.
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (20L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (30L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (40L, "totally unrelated text about distributed sequence packing audits today")
    ).toDF("doc_id", "text")
    val rows = Curation
      .dedupClusters(docs, "doc_id", "text", threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 1, s"expected one cluster, got ${rows.toSeq}")
    assert(rows.head === ((10L, 3L, 60L))) // keeper=min id, 3 members, 10+20+30
  }

  test("dedupClusters: no candidate pairs -> empty output (singletons are implicit)") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty")
    ).toDF("doc_id", "text")
    assert(Curation.dedupClusters(docs, "doc_id", "text").isEmpty)
  }

  test("decontaminate: train doc sharing an 8-gram with an eval doc is flagged; clean doc is not") {
    val run = "one two three four five six seven eight" // the planted 8-gram
    val docs = Seq(
      (7L, s"eval doc prefix $run and some eval suffix text"), // eval: 7 % 10 == 7
      (3L, s"train doc header $run plus different trailer words"), // contaminated
      (4L, "entirely fresh training content with no overlapping runs at all here")
    ).toDF("doc_id", "text")
    val flagged = Curation
      .decontaminate(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(flagged.contains(3L) && flagged(3L) >= 1L)
    assert(!flagged.contains(4L))
    assert(!flagged.contains(7L)) // eval docs are never self-flagged
  }

  test("repetitionSignals: hand-computed fractions on a degenerate doc") {
    // "spam ham spam ham spam": bigrams = [spam ham, ham spam, spam ham, ham spam]
    // -> top bigram fraction 2/4; trigrams = 3 occurrences of 2 distinct
    // grams, "spam ham spam" twice -> dup fraction 2/3.
    val docs = Seq(
      (1L, "spam ham spam ham spam"),
      (2L, "all five words differ here") // no repeats: top bigram 1/4, dup 0
    ).toDF("doc_id", "text")
    val m = Curation
      .repetitionSignals(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(m(1L) === ((0.5, 0.6667)))
    assert(m(2L) === ((0.25, 0.0)))
  }

  test("gramHashesSerial equals the relational md5-gram construction, row for row") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog near a riverbank at dawn today"),
      (2L, "short doc"),
      (3L, ""),
      (4L, "Punctuation, CASE and   runs--of symbols; should tokenize identically 1 2 3 4 5 6 7")
    ).toDF("doc_id", "text")
    for (n <- Seq(2, 8, 10)) {
      val relational = docs
        .select(col("doc_id"), posexplode(Curation.ngramsAll(col("text"), n)).as(Seq("p0", "gram")))
        .select(col("doc_id"), col("p0"), conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long").as("h"))
        .as[(Long, Int, Long)]
        .collect()
        .sortBy(r => (r._1, r._2))
      val kernel = docs
        .as[(Long, String)]
        .collect()
        .flatMap { case (id, t) =>
          Curation.gramHashesSerial(t, n).zipWithIndex.map { case (h, p) => (id, p, h) }
        }
        .sortBy(r => (r._1, r._2))
      assert(kernel.toSeq === relational.toSeq, s"n=$n")
    }
  }

  test("ngramsAllSerial equals the relational ngramsAll, row for row (incl. unicode and short docs)") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog near a riverbank at dawn today"),
      (2L, "short doc"),
      (3L, ""),
      (4L, "Punctuation, CASE and   runs--of symbols; should tokenize identically 1 2 3 4 5 6 7"),
      (5L, "Üñïçôdé Wörds müßen auch identisch TOKENISIEREN über beide Pfade"),
      (6L, "one")
    ).toDF("doc_id", "text")
    for (n <- Seq(2, 3, 10)) {
      val relational = docs
        .select(col("doc_id"), posexplode(Curation.ngramsAll(col("text"), n)).as(Seq("p", "g")))
        .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      val serial = docs
        .select(col("doc_id"), posexplode(Curation.ngramsAllSerial(n)(col("text"))).as(Seq("p", "g")))
        .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(serial === relational, s"n=$n")
    }
  }

  test("dupSpans: shared 10-token run is flagged position-exactly; unique docs are absent") {
    val run = "a b c d e f g h i j" // 10 shared tokens = 1 shared position each side
    val docs = Seq(
      (1L, s"$run unique1 tail1 one"), // 13 tokens -> 4 positions, 1 dup (the run itself)
      (2L, s"$run unique2 tail2 two"),
      (3L, "entirely distinct words making up another training document here now")
    ).toDF("doc_id", "text")
    val m = Curation
      .dupSpans(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(m.keySet === Set(1L, 2L))
    assert(m(1L) === ((4L, 1L, 0.25)))
    assert(m(2L) === ((4L, 1L, 0.25)))
  }

  test("cutDupSpans: token conservation (kept + cut = original) and exact span removal") {
    val run = "a b c d e f g h i j" // 10 shared tokens = one dup window in each doc
    val docs = Seq(
      (1L, s"$run unique1 tail1 one"),
      (2L, s"two head2 $run unique2"),
      (3L, "entirely distinct words making up another training document here now")
    ).toDF("doc_id", "text")
    val m = Curation
      .cutDupSpans(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // only the two affected docs appear; the shared run is cut exactly,
    // the unique tokens survive in order
    assert(m.keySet === Set(1L, 2L))
    assert(m(1L) === ((13L, 10L, "unique1 tail1 one")))
    assert(m(2L) === ((13L, 10L, "two head2 unique2")))
    // conservation: cleaned text has exactly n_tokens - n_cut tokens
    m.values.foreach { case (nTok, nCut, clean) =>
      val nKept = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(nKept + nCut === nTok)
    }
    // overlapping dup windows merge: doc pair sharing 12 tokens has 3
    // dup positions whose windows overlap; exactly 12 tokens are cut
    val long = "p q r s t u v w x y z0 z1"
    val docs2 = Seq((1L, s"$long alpha"), (2L, s"beta $long")).toDF("doc_id", "text")
    val m2 = Curation
      .cutDupSpans(docs2, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(m2(1L) === ((13L, 12L, "alpha")))
    assert(m2(2L) === ((13L, 12L, "beta")))
  }

  test("dupRuns: a 25-token duplicate chains into ONE maximal run; disjoint duplicates stay separate runs") {
    // 25 shared tokens = 16 overlapping dup windows — they must merge
    // into a single [start, end] span, the Lee-et-al maximal-substring
    // behavior a fixed-window report can't express
    val dup25 = (1 to 25).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$dup25 tailone tailtwo tailthree"),
      (2L, s"headone headtwo $dup25"),
      (3L, "a wholly different document with no shared content of its own here")
    ).toDF("doc_id", "text")
    val runs = Curation
      .dupRuns(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(runs.map(_._1).toSet === Set(1L, 2L))
    val byDoc = runs.groupBy(_._1)
    assert(byDoc.values.forall(_.length === 1), s"one maximal run per doc, got $runs")
    // doc 1: tokens 1..25; doc 2: tokens 3..27
    assert(byDoc(1L).head === ((1L, 1L, 1L, 25L, 25L)))
    assert(byDoc(2L).head === ((2L, 1L, 3L, 27L, 25L)))

    // two DISJOINT duplicated regions in one doc -> two runs
    val dupA = (1 to 10).map(i => s"a$i").mkString(" ")
    val dupB = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs2 = Seq(
      (1L, s"$dupA gapone gaptwo gapthree $dupB"),
      (2L, s"other1 $dupA other2"),
      (3L, s"third1 third2 $dupB")
    ).toDF("doc_id", "text")
    val r2 = Curation
      .dupRuns(docs2, "doc_id", "text")
      .filter($"doc_id" === 1L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(r2.toSeq === Seq((1L, 1L, 10L, 10L), (2L, 14L, 23L, 10L)), s"disjoint regions must not merge: ${r2.toSeq}")
  }

  test("clusterSample: exactly cap rows per non-empty cell, ranks contiguous, members belong to the cell") {
    val out = Curation
      .clusterSample(spark, "/root/testdata/sf0.001", cap = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byCell = out.groupBy(_._1)
    assert(byCell.nonEmpty)
    byCell.foreach { case (cell, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.size), s"ranks not contiguous in cell $cell")
      assert(rows.size <= 3)
    }
    // two-phase selection must equal the naive single-window selection
    val naive = Curation
      .clusterSample(spark, "/root/testdata/sf0.001", cap = 3, salts = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(out.toSet === naive)
  }

  test("clusterSample(trained): Lloyd-trained cells balance populations better than seed centroids") {
    import graft.ann.Similarity
    val emb = Tables.embeddings(spark, sf0001)
    val seed = emb
      .filter($"vec_id" < 8)
      .select($"vec_id".as("cell_id"), transform($"embedding", _.cast("double")).as("centroid"))
    val trained = Similarity.trainIvf(spark, sf0001, nCells = 8, iters = 4)
    def pops(c: org.apache.spark.sql.DataFrame): Seq[Long] =
      Similarity.ivfAssign(emb, c).groupBy("cell_id").count().collect().map(_.getLong(1)).toSeq
    def imbalance(x: Seq[Long]): Double = x.max.toDouble / (x.sum.toDouble / x.size) // max/mean load factor
    val si = imbalance(pops(seed))
    val ti = imbalance(pops(trained))
    assert(ti < si, s"trained cells must spread load better: seed max/mean=$si, trained max/mean=$ti")
    // the trained quantizer drops into the SAME two-phase top-k plan
    val out = Curation
      .clusterSample(spark, sf0001, cap = 3, centroids = Some(trained))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byCell = out.groupBy(_._1)
    assert(byCell.values.forall(_.length <= 3))
    assert(
      byCell.values.forall(g => g.map(_._3).sorted.toSeq == (1 to g.length)),
      "ranks contiguous per cell"
    )
  }

  test("semDedup: clusters are multi-member, keyed by their min member id, disjoint") {
    val rows = Curation
      .semDedup(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // every cluster: >= 2 members (singletons are implicit), keeper is
    // the MIN member id so cluster_id must be strictly below the id sum
    // of the remaining members
    rows.foreach { case (cid, n, idSum) =>
      assert(n >= 2, s"cluster $cid has $n members")
      // min-id keeper ⟹ sum of n member ids each >= cid
      assert(idSum >= cid * n, s"cluster $cid cannot contain ids below its label")
    }
    // disjoint: cluster ids unique
    assert(rows.map(_._1).distinct.length === rows.length)
  }

  test("weightedSample: integer accept test — long docs always kept, acceptance grows with weight") {
    val docs = Seq(
      (1L, (1 to 200).map(i => s"w$i").mkString(" "), "a"), // 200 tokens >= 128 -> always kept
      (2L, "tiny", "a"),
      (3L, (1 to 150).map(i => s"x$i").mkString(" "), "b")
    ).toDF("doc_id", "text", "source")
    import org.apache.spark.sql.functions.{col, lit, lower, regexp_extract_all, size => fsize}
    val toks = fsize(regexp_extract_all(lower(col("text")), lit("\\w+"), lit(0))).cast("long")
    val kept = Curation
      .weightedSample(docs.withColumn("n_tok", toks), "doc_id", col("n_tok"), lit(128L))
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("kept")))
      .toMap
    assert(kept(1L) && kept(3L)) // p = 1 for >= 128 tokens
  }

  test("curateDocSerial: fused kernel field-identical to the three standalone derivations") {
    import graft.text.{Dedup, TextOps}
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "short",
      "",
      null,
      "exactly eight tokens one two three four five",
      "seven tokens only one two three four",
      "Üñïçôdé wörter bleiben GLEICH wörter und mehr davon hier stehen jetzt",
      "a b a b a b a b a b a b a b a b"
    )
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // n_tok must equal the relational tokenize the old gate used
    val nTokExpect = docs
      .select($"doc_id", size(regexp_extract_all(lower($"text"), lit("\\w+"), lit(0))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val rows = docs
      .select($"doc_id", Curation.curateDocSerial($"text").as("k"))
      .select($"doc_id", $"k.n_tok", $"k.sh8", $"k.sig")
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val t = texts(id.toInt)
      // null text tokenizes to nothing relationally (size = -1 for null input arrays handled below)
      val expectN = if (t == null) 0L else nTokExpect(id)
      assert(r.getLong(1) === expectN, s"n_tok doc $id")
      val sh8 = Option(r.getSeq[Long](2)).map(_.toSeq).orNull
      val sig = Option(r.getSeq[Long](3)).map(_.toSeq).orNull
      val expSh = if (t == null) null else Option(Dedup.shingleHashesSerial(t, 8)).map(_.toSeq).orNull
      val expSig = if (t == null) null else Option(Dedup.minhashSigSerial(t, 3, 16)).map(_.toSeq).orNull
      assert(sh8 === expSh, s"sh8 doc $id")
      assert(sig === expSig, s"sig doc $id")
    }
    val _ = TextOps // keep import used
  }

  test("curate: eval held out, short docs gated, contaminated dropped, dup keeper kept") {
    val run8 = "q w e r t y u i" // 8-token run planted in eval + one train doc
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (7L, s"$run8 eval only content here", "s0"), // eval split (7 % 10 == 7): held out
      (1L, s"$run8 and train filler words x", "s0"), // contaminated -> dropped
      (2L, "tiny doc", "s0"), // < 8 tokens -> gated
      (3L, dup, "s1"), // cluster keeper (min id)
      (4L, dup, "s1"), // exact dup -> dropped
      (5L, "a clean independent training document with plenty of words inside", "s1")
    ).toDF("doc_id", "text", "source")
    val out = Curation
      .curate(docs)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // s0 loses everything: 7 is eval, 1 contaminated, 2 gated
    assert(!out.contains("s0"), s"unexpected s0 survivors: $out")
    // s1 keeps doc 3 (12 tokens) + doc 5 (10 tokens); doc 4 deduped
    assert(out("s1") === ((2L, 22L)))
  }

  test("packSequences: conservation + fill + block-size invariance of the prefix sum") {
    // 40 docs x 10 tokens = 400 tokens; seqLen 64 -> 7 sequences
    // (6 full + one 16-token tail).
    val docs = (0L until 40L)
      .map(i => (i, (0 until 10).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation
      .packSequences(docs, "doc_id", "text", seqLen = 64, blockSize = 7) // force multi-block prefix sum
      .orderBy("seq_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq === (0L until 7L))
    assert(out.map(_._4).sum === 400L) // token conservation
    assert(out.dropRight(1).forall(_._4 == 64L), s"non-final bins must be full: ${out.toSeq}")
    assert(out.last._4 === 16L)
    // 10-token docs at 64-token bins: a bin holds 6 or 7 doc spans
    assert(out.dropRight(1).forall(b => b._2 == 7L || b._2 == 8L) || out.dropRight(1).forall(b => b._2 >= 6L && b._2 <= 8L))
    // block size must not change the layout (pure prefix-sum refactor)
    val big = Curation
      .packSequences(docs, "doc_id", "text", seqLen = 64, blockSize = 4096)
      .orderBy("seq_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(big.toSeq === out.toSeq)
  }
}
