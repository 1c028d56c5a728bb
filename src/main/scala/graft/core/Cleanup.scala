package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-folder garbage collection — the reference's `cleanupBuild`
  * (`build.cpp:705-870`), re-expressed as the two relational phases it
  * actually is:
  *
  *  - **Phase 1** — stale index rows: every indexed non-directory
  *    entry whose underlying file is gone from the filesystem listing
  *    (a left-anti join on path) is removed from the index.
  *  - **Phase 2** — orphan artifacts: build-directory items are
  *    hash-named (64-hex content hashes — directories — or
  *    `<hash>.pending` files); anything hash-like whose hash is absent
  *    from the (post-phase-1) valid-hash set is an orphan. Guards
  *    mirror the reference exactly: non-hash-like names are never
  *    touched (a user-specified output path may hold unrelated
  *    files), orphans holding an ACTIVE `.building` lock are skipped,
  *    stale locks do not protect.
  *
  * Inputs are plain DataFrames (index entries, filesystem listing,
  * build-dir listing), so the same plan runs over one dataset or an
  * estate; both phases are anti-joins that broadcast the small side
  * locally and shuffle at scale. The filesystem side effects (the
  * actual deletes) stay at the caller's `foreachPartition` boundary,
  * keeping the relational core pure (SURVEY §7.4 rule 5).
  */
object Cleanup {

  /** Build-artifact names are content hashes (64 hex chars) —
    * `build.cpp:776-785`. */
  def isHashLike(s: String): Boolean =
    s != null && s.length == 64 && s.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))

  private val isHashLikeCol = udf(isHashLike _)

  /** Phase 1: indexed non-directory entries whose path is missing
    * from `fsPaths` (column `path`). Returns the stale rows (to
    * remove from the index). */
  def staleEntries(entries: DataFrame, fsPaths: DataFrame): DataFrame =
    entries
      .filter(col("type") =!= graft.model.EntryType.Directory)
      .join(fsPaths.select(col("path")), Seq("path"), "left_anti")

  /** The index after phase 1. */
  def cleanEntries(entries: DataFrame, fsPaths: DataFrame): DataFrame =
    entries.filter(col("type") === graft.model.EntryType.Directory)
      .unionByName(
        entries
          .filter(col("type") =!= graft.model.EntryType.Directory)
          .join(fsPaths.select(col("path")), Seq("path"), "left_semi")
      )

  /** Phase 2: orphan build artifacts. `buildItems` columns:
    * `name` (file/dir basename), `is_dir` (bool), `active_lock`
    * (bool: a live `.building` lock one level deep). Hash-named
    * directories and `<hash>.pending` files whose hash is not in the
    * post-phase-1 index are orphans; active locks protect; anything
    * not hash-like is ignored. */
  def orphanArtifacts(buildItems: DataFrame, validEntries: DataFrame): DataFrame = {
    val candidates = buildItems
      .withColumn(
        "artifact_hash",
        when(col("is_dir"), col("name"))
          .otherwise(when(col("name").endsWith(".pending"), regexp_replace(col("name"), "\\.pending$", "")))
      )
      .filter(col("artifact_hash").isNotNull && isHashLikeCol(col("artifact_hash")))
    val validHashes = validEntries
      .filter(col("hash").isNotNull && col("hash") =!= "")
      .select(col("hash").as("artifact_hash"))
      .distinct()
    candidates
      .join(validHashes, Seq("artifact_hash"), "left_anti")
      .filter(!coalesce(col("active_lock"), lit(false)))
      .select(col("name"), col("is_dir"))
  }

  /** Both phases as one result: (removedEntries paths, removed
    * artifact names), the `CleanupResult` shape. Deterministic
    * ordering for stable reporting. */
  def cleanupBuild(
      entries: DataFrame,
      fsPaths: DataFrame,
      buildItems: DataFrame
  ): (Seq[String], Seq[String]) = {
    val stale = staleEntries(entries, fsPaths).select("path").collect().map(_.getString(0)).sorted
    val valid = cleanEntries(entries, fsPaths)
    val orphans = orphanArtifacts(buildItems, valid).select("name").collect().map(_.getString(0)).sorted
    (stale.toSeq, orphans.toSeq)
  }
}
