package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Small-file compaction planner — the "OPTIMIZE" half of the
  * small-files problem every long-lived 100 TB table develops (the
  * reference rebuilds its index per directory batch,
  * `src/library/indexer.cpp`'s batched folder walk; at lake scale the
  * same maintenance pass plans which little files merge into which
  * target-sized output).
  *
  * Bin rule: files in PATH order, running byte total, bin =
  * ⌊(cumsum − size) / target⌋ — every bin lands within one file of the
  * target size, bins are path-contiguous (compaction preserves
  * partition/sort locality), and the rule is a pure function of the
  * listing, so the plan is reproducible and incremental runs agree on
  * unchanged prefixes.
  *
  * Scale shape: a single global running sum would funnel the whole
  * listing through one task, so the prefix sum is two-phase — per-
  * directory subtotals (one partial agg, output = directory count),
  * an offset cumsum over THAT aggregate (the only unpartitioned
  * window, bounded by directory count), and a per-directory running
  * sum partitioned by `dir` (directory count grows with the data;
  * no constant-domain key). Because '/' sorts below every path
  * character, (dir, path) order equals global path order, so the
  * stitched two-phase cumsum IS the global one.
  */
object Compaction {

  /** Plan compaction bins over a (path, dir, bytes) listing. */
  def plan(files: DataFrame, targetBytes: Long): DataFrame = {
    val perDir = files.groupBy(col("dir")).agg(sum(col("bytes")).as("dir_bytes"))
    val offsets = perDir
      .withColumn(
        "offset",
        sum(col("dir_bytes")).over(Window.orderBy(col("dir"))) - col("dir_bytes")
      )
      .select(col("dir"), col("offset"))
    files
      .withColumn("local", sum(col("bytes")).over(Window.partitionBy(col("dir")).orderBy(col("path"))))
      .join(broadcast(offsets), Seq("dir"))
      .withColumn("bin", floor((col("local") + col("offset") - col("bytes")) / targetBytes))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("bytes")).as("bytes"),
        min(col("path")).as("first_path"),
        max(col("path")).as("last_path")
      )
  }

  /** ◆ q_compaction — documents as the file listing (source = the
    * directory, n_chars = the size), 16 KiB target bins. */
  def compactionQuery(s: SparkSession, dir: String): DataFrame = {
    val files = Tables
      .documents(s, dir)
      .select(
        concat(col("source"), lit("/"), lpad(col("doc_id").cast("string"), 6, "0")).as("path"),
        col("source").as("dir"),
        col("n_chars").as("bytes")
      )
    plan(files, 16384L)
  }
}
