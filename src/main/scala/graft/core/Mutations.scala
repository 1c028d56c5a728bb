package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.EntryType

/** Index mutations — move/delete with the reference's cascade
  * semantics (`dbops.cpp:1381-1473` moveEntry, delete matrix in
  * `tests/ddb_test.cpp:84-448`). All pure DataFrame→DataFrame
  * transforms: the caller owns the atomic re-materialization
  * (SURVEY §7.4.6).
  */
object Mutations {

  /** Delete by pattern: matching rows AND their children (folder
    * cascade) leave the index; attached meta rows cascade too — ref
    * delete-with-meta-cascade (`ddb_test.cpp:84-448`). Returns
    * (entries', meta', removedPaths). */
  def removeEntries(
      entries: DataFrame,
      meta: DataFrame,
      pattern: String
  ): (DataFrame, DataFrame, DataFrame) = {
    val hit = Index.pathMatches(pattern) // self + children
    val removed = entries.filter(hit).select("path")
    val remainingEntries = entries.filter(!hit)
    val remainingMeta = meta.join(removed, Seq("path"), "left_anti")
    (remainingEntries, remainingMeta, removed)
  }

  /** Move/rename: rewrite the path prefix, recompute depth, and
    * re-fingerprint when the extension changed (ref
    * `dbops.cpp:1381-1473` — a renamed `.jpg`→`.bin` changes type).
    * Directory moves carry children; meta follows the path rewrite.
    * Fails (like the reference) if `dest` already exists. */
  def moveEntry(
      entries: DataFrame,
      meta: DataFrame,
      source: String,
      dest: String
  )(implicit s: SparkSession): (DataFrame, DataFrame) = {
    require(source.nonEmpty && dest.nonEmpty, "source/dest must be non-empty")
    if (!Index.pathExists(entries, source))
      throw new IllegalArgumentException(s"no such entry: $source")
    if (Index.pathExists(entries, dest))
      throw new IllegalArgumentException(s"destination exists: $dest")
    if (dest == source || dest.startsWith(source + "/"))
      throw new IllegalArgumentException(s"cannot move '$source' into itself: $dest")

    val isChild = col("path").startsWith(source + "/")
    val hit = col("path") === source || isChild
    val newPath = when(col("path") === source, lit(dest))
      .otherwise(concat(lit(dest), expr(s"substring(path, ${source.length + 1})")))

    def extOf(p: String): String = {
      val i = p.lastIndexOf('.'); if (i < 0) "" else p.substring(i + 1).toLowerCase(java.util.Locale.ROOT)
    }
    val extChanged = extOf(source) != extOf(dest)
    val refingerprint = udf((p: String) => EntryType.fromExtension(p))

    // rewrite via a temp column: `hit` refers to the ORIGINAL path, so
    // the depth recompute must happen before `path` itself is replaced
    val moved = entries
      .withColumn("__newpath", when(hit, newPath).otherwise(col("path")))
      .withColumn("depth", when(hit, Index.depthOf(col("__newpath"))).otherwise(col("depth")))
      .withColumn("path", col("__newpath"))
      .drop("__newpath")
    val retyped =
      if (extChanged)
        moved.withColumn(
          "entryType",
          // directories keep their type through a rename; files re-dispatch
          when(col("path") === dest && col("entryType") =!= EntryType.Directory, refingerprint(col("path")))
            .otherwise(col("entryType"))
        )
      else moved

    val movedMeta = meta.withColumn(
      "path",
      when(col("path") === source, lit(dest))
        .when(col("path").startsWith(source + "/"), concat(lit(dest), expr(s"substring(path, ${source.length + 1})")))
        .otherwise(col("path"))
    )
    (retyped, movedMeta)
  }
}

/** Build-artifact dependency — ref `src/library/build.cpp:39-97`,
  * `dbops.cpp:773-785`: derived artifacts (tiles, COGs, EPTs, meshes)
  * live in hash-keyed folders; an entry is "pending build" when it is
  * buildable by type but has no artifact folder for its content hash.
  * The artifact listing is a small dimension → broadcast join.
  */
object Builds {
  import graft.model.EntryType

  val buildableTypes: Seq[Int] = Seq(
    EntryType.PointCloud, EntryType.GeoRaster, EntryType.Model, EntryType.Tiles3D
  )

  /** entries requiring a build: buildable type, no artifact row with
    * the same content hash. `artifacts` needs a `hash` column (the
    * hash-keyed build folder name). */
  def pendingBuilds(entries: org.apache.spark.sql.DataFrame, artifacts: org.apache.spark.sql.DataFrame) =
    entries
      .filter(org.apache.spark.sql.functions.col("entryType").isin(buildableTypes.map(Integer.valueOf): _*))
      .join(
        org.apache.spark.sql.functions.broadcast(artifacts.select("hash")),
        Seq("hash"),
        "left_anti"
      )

  /** entries whose artifact exists (the build-folder lookup join). */
  def builtEntries(entries: org.apache.spark.sql.DataFrame, artifacts: org.apache.spark.sql.DataFrame) =
    entries.join(
      org.apache.spark.sql.functions.broadcast(artifacts.select("hash")),
      Seq("hash"),
      "left_semi"
    )

  /** `getPendingBuildInfo` (`build.cpp:592-622`): every `.pending`
    * marker joined back to its indexed entry — unindexed hashes drop
    * out (they are garbage the [[Cleanup]] pass collects). `pending`
    * columns: hash, missing_deps, last_attempt. Emits (hash, path,
    * missing_deps, last_attempt). */
  def pendingBuildInfo(
      pending: org.apache.spark.sql.DataFrame,
      entries: org.apache.spark.sql.DataFrame
  ): org.apache.spark.sql.DataFrame =
    pending.join(entries.select("hash", "path"), Seq("hash"))
      .select("hash", "path", "missing_deps", "last_attempt")
}

/** Password rows — salt + SHA256(salt ++ password), mirroring the
  * reference's `passwords` table shape (`database.cpp:59-64`). Not
  * analytics; completes the §1.1 data-model inventory. */
object Passwords {
  final case class PasswordRow(salt: String, hash: String)

  def hashPassword(password: String, salt: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(salt.getBytes("UTF-8"))
    md.update(password.getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  def mkRow(password: String, salt: String): PasswordRow =
    PasswordRow(salt, hashPassword(password, salt))

  def verify(row: PasswordRow, password: String): Boolean =
    java.security.MessageDigest.isEqual(
      row.hash.getBytes("UTF-8"),
      hashPassword(password, row.salt).getBytes("UTF-8")
    )
}
