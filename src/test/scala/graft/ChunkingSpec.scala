package graft

import org.apache.spark.sql.functions._

import graft.text.Chunking

/** Chunking invariants.
  *
  * Sliding windows (q_chunk): every token is covered, consecutive
  * windows overlap by win−step, only the final window may be short.
  *
  * Gear CDC (q_cdc): chunks PARTITION the document (contiguous,
  * disjoint, lengths sum to the text), chunking is content-anchored —
  * an edit moves boundaries only within a local horizon, so the
  * chunks strictly before the edit (and those past the first
  * re-synchronized boundary) are byte-identical — and duplicated
  * passages across documents surface as shared digests.
  */
class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  test("sliding windows: full coverage, fixed overlap, only the last window short") {
    val rows = Chunking.chunkQuery(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", size(split($"text", " ")).as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.filter(_._2 > 0).keySet)
    byDoc.foreach { case (doc, cs) =>
      val n = docs(doc)
      val sorted = cs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == sorted.indices)
      sorted.dropRight(1).foreach(c => assert(c.getInt(2) == Chunking.Win, s"doc $doc interior window"))
      val last = sorted.last
      val lastStart = (sorted.size - 1) * Chunking.Step
      assert(last.getInt(2) == math.min(Chunking.Win, n - lastStart))
      // coverage: the last window reaches the end of the document
      assert(lastStart + last.getInt(2) == n, s"doc $doc not covered to the end")
      // a window starts while the previous one still has step..win tokens
      assert(sorted.size == 1 + math.max(0, math.ceil((n - Chunking.Win) / Chunking.Step.toDouble).toInt))
    }
  }

  test("CDC chunks partition each document: contiguous, disjoint, lengths sum to the text") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog " * 20), (2L, "x")).toDF("doc_id", "text")
    val chunks = Chunking.gearChunks(docs).collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    Seq(1L, 2L).foreach { d =>
      val cs = byDoc(d).sortBy(_.getInt(2))
      val textLen = if (d == 1L) 44 * 20 else 1
      assert(cs.map(_.getLong(3)).sum == textLen, s"doc $d lengths")
      var expect = 0L
      cs.foreach { c =>
        assert(c.getInt(2).toLong == expect, s"doc $d gap at ${c.getInt(2)}")
        expect += c.getLong(3)
      }
    }
    // a repeated phrase yields repeated chunk digests inside doc 1
    val d1 = byDoc(1L)
    assert(d1.length > 3, "mask 2^-6 over ~880 chars should cut more than 3 chunks")
    assert(d1.map(_.getString(4)).distinct.length < d1.length, "repeated content should repeat digests")
  }

  test("CDC is content-anchored: an edit only disturbs chunks within its horizon") {
    val rnd = new scala.util.Random(7)
    val base = (0 until 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = base.substring(0, 1000) + "Z" + base.substring(1000)
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val chunks = Chunking.gearChunks(docs).collect().groupBy(_.getLong(0))
    def digests(d: Long) = chunks(d).sortBy(_.getInt(2)).map(_.getString(4)).toSeq
    val a = digests(1L)
    val b = digests(2L)
    // chunks strictly before the edit position are identical
    val before = chunks(1L).sortBy(_.getInt(2)).takeWhile(c => c.getInt(2) + c.getLong(3) <= 1000)
    assert(before.nonEmpty, "want chunks before the edit")
    assert(b.take(before.length) == a.take(before.length), "prefix chunks must be untouched")
    // the tail re-synchronizes: the suffix chunk multisets agree except
    // for a bounded number of disturbed chunks around the edit
    val common = a.toSet.intersect(b.toSet).size
    assert(a.size - common <= 3, s"edit disturbed ${a.size - common} of ${a.size} chunks")
  }

  test("blocked windows are exact: any blockSize gives identical chunks (the 100 TB shape)") {
    val rnd = new scala.util.Random(23)
    val docs = Seq(
      (1L, (0 until 1500).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString),
      (2L, "xyz"), // shorter than any block
      (3L, (0 until 256).map(_ => ('0' + rnd.nextInt(10)).toChar).mkString) // exact block multiple at B=32
    ).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getString(4))
    val base = Chunking.gearChunks(docs, blockSize = 4096).collect().map(key).sortBy(t => (t._1, t._2)).toSeq
    for (b <- Seq(8, 31, 32, 100)) {
      val got = Chunking.gearChunks(docs, blockSize = b).collect().map(key).sortBy(t => (t._1, t._2)).toSeq
      assert(got == base, s"blockSize $b diverges")
    }
  }

  test("cross-document duplicate passages surface as shared chunks (q_cdc columns)") {
    val out = Chunking.cdcQuery(spark, sf0001).collect()
    assert(out.length == 500)
    // len_sum is the partition invariant: equals the document length
    val lens = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", length($"text").as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach(r => assert(r.getLong(4) == lens(r.getLong(0)).toLong, s"doc ${r.getLong(0)} len_sum"))
    // the synthetic corpus shares vocabulary heavily: some chunk
    // digests must recur across documents
    assert(out.map(_.getInt(3)).sum > 0, "no shared chunks found across 500 docs")
  }

  test("native single-pass gear spans equal the relational construction, row for row") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").select(col("doc_id"), col("text"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id").cast("long"), col("chunk").cast("long"),
        col("start").cast("long"), col("len").cast("long"), col("digest"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    val native = rows(graft.text.Chunking.gearChunksNative(docs))
    val relational = rows(graft.text.Chunking.gearChunks(docs))
    assert(native.nonEmpty && native.toSeq == relational.toSeq)
    // synthetic edges: 1-char, cut-at-last-position, long uniform runs
    import spark.implicits._
    val edge = Seq((1L, "x"), (2L, "a" * 5000), (3L, "mixed content with spaces and 123 numbers \u00e9\u4e16"))
      .toDF("doc_id", "text")
    assert(rows(graft.text.Chunking.gearChunksNative(edge)).toSeq ==
      rows(graft.text.Chunking.gearChunks(edge)).toSeq)
  }
}
