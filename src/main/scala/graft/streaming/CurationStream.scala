package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.Dedup

/** Streaming curation stages — the ingest-path versions of the batch
  * operators in [[graft.text.Curation]]: documents are checked the
  * moment they arrive instead of by a nightly sweep.
  *
  * The decontamination check is a STREAM-STATIC join: the eval-set
  * shingle table is a static (slowly-changing, re-read per batch)
  * relation, so no state is needed for the join itself — Spark
  * broadcast/shuffle-joins each micro-batch against it. Only the
  * doc-id dedup after the shingle-level match keeps (watermark-bounded)
  * state. At corpus scale the static side is the published eval-suite
  * shingle table; the same plan serves both a 1-doc trickle and a
  * backfill replay.
  */
object CurationStream {

  /** 60-bit md5 shingle hashes of a text column, n tokens per shingle —
    * the engine-neutral hash family shared with the batch operators. */
  def shingleHashes(text: Column, n: Int): Column =
    transform(Dedup.shingles(text, n), g => conv(substring(md5(g), 1, 15), 16, 10).cast("long"))

  /** Static side: distinct shingle hashes of the eval/benchmark corpus
    * (batch DataFrame with doc_id + text columns). */
  def evalShingleTable(evalDocs: DataFrame, textCol: String = "text", n: Int = 8): DataFrame =
    evalDocs
      .select(explode(shingleHashes(col(textCol), n)).as("h"))
      .distinct()

  /** Streaming decontamination: emit the ids of incoming documents that
    * share at least one n-gram with the static eval set — the
    * quarantine feed a training-data ingest pipeline consumes.
    *
    * @param docs      streaming DataFrame with (doc_id, ts, text)
    * @param evalTable static DataFrame from [[evalShingleTable]]
    * @param watermark how long a doc id stays in dedup state
    */
  def contaminatedIds(docs: DataFrame, evalTable: DataFrame, n: Int = 8, watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"), explode(shingleHashes(col("text"), n)).as("h"))
      .join(evalTable, Seq("h"), "left_semi") // stream-static: no state
      .dropDuplicatesWithinWatermark("doc_id") // one row per flagged doc
      .select(col("doc_id"), col("ts"))

  /** Per-row MinHash signature — the SAME hash family and permutation
    * constants as the batch [[Dedup.minhashCandidates]], computed in
    * one closure so a STREAM can sign documents without a shuffle or a
    * streaming aggregation (the batch shape's explode→min-agg needs
    * update-mode state; a row-local kernel needs none). */
  private val minhashSigUdf = {
    val k = 16
    udf { text: String =>
      if (text == null) Array.empty[Long]
      else {
        val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\W+").filter(_.nonEmpty)
        if (toks.length < 3) Array.empty[Long]
        else {
          val hs = toks.sliding(3).map(_.mkString(" ")).toArray.distinct
            .map(g => graft.text.TextOps.md5Hash60(g) % Dedup.MinhashP)
          Array.tabulate(k) { i =>
            val a = Dedup.minhashA(i); val b = Dedup.minhashB(i)
            var m = Long.MaxValue
            hs.foreach { h => val v = (a * h + b) % Dedup.MinhashP; if (v < m) m = v }
            m
          }
        }
      }
    }
  }

  /** One emitted near-dup candidate: the arriving doc against a prior
    * member of the same LSH bucket. */
  final case class Candidate(id_a: Long, id_b: Long, band: Int)

  /** ◆ Streaming near-dup candidate detection — dedup AT INGEST instead
    * of the nightly sweep: each arriving document is MinHash-signed
    * row-locally, exploded to its r=1 LSH band buckets, and checked
    * against the bucket's MEMBERSHIP STATE
    * (`flatMapGroupsWithState` keyed by (band, value) — the custom
    * stateful operator the batch inverted-index self-join becomes when
    * the corpus arrives one micro-batch at a time). A new member emits
    * one candidate pair per prior member, then joins the state.
    *
    * State per bucket is CAPPED at `capPerBucket` ids (a hot bucket —
    * a boilerplate shingle — would otherwise accumulate the corpus;
    * the batch path bounds the same blowup with its df cap). At
    * production scale the state store also gets a timeout/TTL; the
    * cap is the memory bound, the TTL the staleness bound.
    */
  def nearDupCandidates(docs: DataFrame, capPerBucket: Int = 8): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val keyed = docs
      .select(col("doc_id").cast("long").as("id"), posexplode(minhashSigUdf(col("text"))).as(Seq("band", "v")))
      .as[(Long, Int, Long)]
      .groupByKey { case (_, band, v) => (band, v) }
    keyed
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Int, Long), rows: Iterator[(Long, Int, Long)], state: GroupState[Seq[Long]]) => {
          val prior = state.getOption.getOrElse(Seq.empty)
          val arrivals = rows.map(_._1).toSeq.distinct.sorted
          val out = new scala.collection.mutable.ArrayBuffer[Candidate]()
          var members = prior
          arrivals.foreach { id =>
            if (!members.contains(id)) {
              members.foreach(m => out += Candidate(math.min(id, m), math.max(id, m), key._1))
              if (members.length < capPerBucket) members = members :+ id
            }
          }
          if (members != prior) state.update(members)
          out.iterator
        }
      )
      .toDF()
  }

  /** ◆ Quality gate + PII scrub at ingest — the stateless curation
    * stages ([[graft.text.TextOps.qualityCols]] thresholds, then
    * [[graft.text.TextOps.piiRedact]]) are pure column expressions, so
    * the SAME plan fragment serves the nightly batch sweep and the
    * ingest stream; only the doc-id dedup keeps state, and that state
    * is watermark-bounded. Emits survivors as (doc_id, ts, quality
    * columns, per-pattern PII counts, redacted `clean` text) — the
    * feed a training-data lake appends, already scrubbed.
    */
  def curateAtIngest(
      docs: DataFrame, // streaming (doc_id, ts, text)
      watermark: String = "1 hour",
      minChars: Int = 50,
      maxPunctRatio: Double = 0.2,
      minStopwordRatio: Double = 0.05
  ): DataFrame = {
    import graft.text.TextOps
    val scored = docs
      .withWatermark("ts", watermark)
      .select(Seq(col("doc_id"), col("ts"), col("text")) ++ TextOps.qualityCols(col("text")): _*)
      .filter(
        col("n_chars") >= minChars &&
          col("punct_ratio") <= maxPunctRatio &&
          col("stopword_ratio") >= minStopwordRatio
      )
    TextOps
      .piiRedact(scored, "text")
      .dropDuplicatesWithinWatermark("doc_id") // re-sent docs append once
      .drop("text")
  }
}
