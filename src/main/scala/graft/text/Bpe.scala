package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the real subword algorithm behind the token counts a training
  * pipeline budgets by (TextOps counts with a BPE-ish regex; this
  * LEARNS the merge table).
  *
  * Scale shape: the corpus is reduced ONCE to the distinct-word
  * frequency table (the standard trick — all further work is
  * vocab-sized, not corpus-sized). Each merge round is one adjacent-
  * pair count (explode + partial-agg sum weighted by word frequency),
  * a driver-side argmax of a vocab-bounded pair table, and one narrow
  * map applying the merge to the symbol sequences. k rounds = k
  * vocab scans; lineage stays flat by rebuilding the (small) vocab
  * frame from the applied arrays each round via localCheckpoint.
  *
  * Determinism: ties on pair count break lexicographically (smallest
  * (left, right) wins), so the merge table is a pure function of the
  * corpus — the spec replays a serial reference implementation and
  * must get byte-identical merges.
  */
object Bpe {

  /** End-of-word marker, attached to a word's last symbol (the paper's
    * `</w>`): merges crossing word boundaries are impossible and final
    * symbols distinguish "low" + "er" from "lower" mid-word. */
  val Eow = "</w>"

  /** Distinct-word frequency table: (word, freq). */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(regexp_extract_all(lower(col(textCol)), lit("\\w+"), lit(0))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  private def initSymbols(word: String): Array[String] = {
    val cs = word.toCharArray.map(_.toString)
    if (cs.isEmpty) cs else { cs(cs.length - 1) = cs(cs.length - 1) + Eow; cs }
  }

  private def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += a + b; i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Train `nMerges` merges; returns the merge table in order:
    * (rank, left, right, pair_count). */
  def trainBpe(s: SparkSession, docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    import s.implicits._
    val init = udf((w: String) => initSymbols(w))
    var vocab = wordFreq(docs, textCol)
      .select(col("freq"), init(col("word")).as("syms"))
      .localCheckpoint() // corpus reduced once; everything below is vocab-sized
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      // adjacent-pair counts weighted by word frequency — partial-agg;
      // argmax with lexicographic tie-break is a driver reduce over a
      // vocab-bounded pair table
      val top = vocab
        .filter(size(col("syms")) >= 2) // sequence(0, -1) would run DESCENDING on 1-symbol words
        .select(
          col("freq"),
          explode(
            expr("transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS a, syms[i + 1] AS b))")
          ).as("p")
        )
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, a, b, n))
        val apply = udf((syms: Seq[String]) => applyMerge(syms.toArray, a, b))
        val next = vocab.select(col("freq"), apply(col("syms")).as("syms")).localCheckpoint()
        vocab.unpersist(blocking = false) // round n−1 released as round n lands
        vocab = next
        rank += 1
      }
    }
    vocab.unpersist(blocking = false)
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Encode a text column with a learned merge table: applies the
    * merges in rank order per word (the inference half: a narrow map
    * with the driver-sized merge list in the closure). Returns the
    * input plus `n_bpe_tokens`. */
  def applyBpe(docs: DataFrame, textCol: String, merges: Seq[(String, String)]): DataFrame = {
    val ms = merges.toArray
    val count = udf { text: String =>
      if (text == null) 0L
      else {
        val words = "\\w+".r.findAllIn(text.toLowerCase(java.util.Locale.ROOT)).toArray
        var total = 0L
        words.foreach { w =>
          var syms = initSymbols(w)
          var i = 0
          while (i < ms.length) { syms = applyMerge(syms, ms(i)._1, ms(i)._2); i += 1 }
          total += syms.length
        }
        total
      }
    }
    docs.withColumn("n_bpe_tokens", count(col(textCol)))
  }
}
