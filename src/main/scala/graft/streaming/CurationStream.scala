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
}
