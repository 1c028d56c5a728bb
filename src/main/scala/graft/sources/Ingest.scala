package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Index
import graft.model.EntryType

/** Ingest — the `ddb add` pipeline (SURVEY §3.1) re-expressed as one
  * Spark job: list files → anti-join current index on (path, mtime) →
  * hash+extract only new/modified rows → upsert.
  *
  * Scale design: `binaryFile` scans parallelize across executors; the
  * mtime-before-hash short-circuit (`dbops.cpp:441-472`) becomes a
  * join predicate so unchanged files never read content; the upsert is
  * union + row_number dedup (newest wins), one shuffle on path.
  */
object Ingest {

  /** Recursive dir scan — ref `getPathList` (`dbops.cpp:200-275`):
    * walk tree, skip `.ddb`. Metadata-only listing (no content read). */
  def listFiles(s: SparkSession, root: String): DataFrame =
    s.read
      .format("binaryFile")
      .option("pathGlobFilter", "*")
      .option("recursiveFileLookup", "true")
      .load(root)
      .filter(!col("path").contains("/.ddb/"))
      .select(
        regexp_replace(col("path"), "^file:", "").as("abs_path"),
        (unix_timestamp(col("modificationTime"))).as("mtime"),
        col("length").as("size"),
        col("content")
      )

  /** Glob semantics — ref `dbops.cpp:321-439`: `*?[]` via Hadoop glob
    * in load(); `**` replicated with an rlike filter. */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' if i + 1 < glob.length && glob.charAt(i + 1) == '*' =>
          // `**/` spans ZERO or more directories (so `**/*.jpg`
          // matches a top-level a.jpg — glob_test RecursiveDoubleStar);
          // a bare `**` greedily crosses separators
          if (i + 2 < glob.length && glob.charAt(i + 2) == '/') { sb.append("(.*/)?"); i += 2 }
          else { sb.append(".*"); i += 1 }
        case '*' => sb.append("[^/]*")
        case '?' => sb.append("[^/]")
        case '[' => sb.append('[')
        case ']' => sb.append(']')
        case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append("$").toString
  }

  /** CLI-side glob expansion — the `expandGlobPatterns` contract
    * (glob_test.cpp:78-186): literal files pass through (missing
    * literal throws), bare directories walk recursively, patterns
    * match with [[globToRegex]] semantics, `.ddb` entries are always
    * skipped, results deduplicate across patterns and come back
    * absolute; an empty pattern throws and zero total matches throw.
    * This is the driver-side utility twin of the distributed
    * [[listFiles]]+rlike face (same regex, same .ddb rule). */
  def expandGlobPatterns(root: String, patterns: Seq[String]): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val rootPath = java.nio.file.Paths.get(root).toAbsolutePath.normalize
    def isDdb(p: java.nio.file.Path): Boolean =
      rootPath.relativize(p).iterator().asScala.exists(_.toString == ".ddb")
    def walk(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.walk(dir)
      try s.iterator().asScala.toList.filter(p => java.nio.file.Files.isRegularFile(p) && !isDdb(p))
      finally s.close()
    }
    val out = scala.collection.mutable.LinkedHashSet[String]()
    // one tree walk shared by every wildcard pattern (was one walk per
    // pattern); literal entries resolve directly and also honor the
    // always-skip-.ddb contract
    lazy val allFiles = walk(rootPath)
    patterns.foreach { pat =>
      require(pat != null && pat.nonEmpty, "empty glob pattern")
      val hasMeta = pat.exists("*?[".contains(_))
      if (!hasMeta) {
        val p = rootPath.resolve(pat).normalize
        if (java.nio.file.Files.isRegularFile(p)) { if (!isDdb(p)) out += p.toString }
        else if (java.nio.file.Files.isDirectory(p)) walk(p).foreach(out += _.toString)
        else throw new java.io.FileNotFoundException(s"no such file or directory: $pat")
      } else {
        val re = globToRegex(pat).r
        allFiles.foreach { p =>
          val rel = rootPath.relativize(p).toString.replace('\\', '/')
          if (re.matches(rel)) out += p.toString
        }
      }
    }
    if (out.isEmpty) throw new java.io.FileNotFoundException(s"no files matched: ${patterns.mkString(", ")}")
    out.toSeq
  }

  /** Entry assembly from a file listing rooted at `root`: relative
    * path, depth, content-sniffed type + properties + geotag
    * (`Extractors.withExtraction` — the `parseEntry` role,
    * `entry.cpp:34-489`), sha256 (built-in, codegen'd). */
  def toEntries(files: DataFrame, root: String): DataFrame = {
    val rel = regexp_replace(col("abs_path"), "^" + java.util.regex.Pattern.quote(root) + "/?", "")
    Extractors
      .withExtraction(
        files.select(
          rel.as("path"),
          lower(sha2(col("content"), 256)).as("hash"),
          col("mtime"),
          col("size"),
          col("content")
        ),
        col("path"),
        col("content")
      )
      .drop("content")
      .withColumn("depth", Index.depthOf(col("path")))
  }

  /** Incremental add: which files actually need hashing/parsing —
    * mtime join against the index short-circuits unchanged paths
    * before any content is touched (ref `dbops.cpp:441-472`). */
  def changedFiles(files: DataFrame, index: DataFrame): DataFrame =
    files.join(
      index.select(col("path"), col("mtime").as("idx_mtime")),
      files("abs_path").endsWith(col("path")), // caller aligns roots; kept simple for fixtures
      "left_outer"
    ).filter(col("idx_mtime").isNull || col("idx_mtime") =!= col("mtime"))

  /** Rescan — ref `dbops.cpp:1034-1140`: re-parse indexed entries
    * (optionally restricted to some types) from current file bytes and
    * upsert the fresh rows over the index. Paths not on disk anymore
    * are left untouched (delete is `Sync.status` + removeEntries'
    * job). */
  def rescan(index: DataFrame, root: String, typeFilter: Option[Seq[Int]] = None)(
      implicit s: org.apache.spark.sql.SparkSession
  ): DataFrame = {
    val scoped = typeFilter.foldLeft(index)((df, ts) => df.filter(col("entryType").isin(ts.map(Integer.valueOf): _*)))
    val fresh = toEntries(listFiles(s, root), root)
      .join(scoped.select("path"), Seq("path"), "left_semi")
    upsert(index, fresh)
  }

  /** Upsert: union new entries over current index, newest-mtime wins
    * per path, incoming wins mtime ties (a re-parse at the same mtime
    * must still refresh the row) — the MERGE shape on an immutable
    * store (SURVEY §7.4.6). */
  def upsert(index: DataFrame, incoming: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("path").orderBy(col("mtime").desc, col("__src").desc)
    index
      .withColumn("__src", lit(0))
      .unionByName(incoming.withColumn("__src", lit(1)), allowMissingColumns = true)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }

  /** Index write layout: path-prefix partitioning so folder queries
    * prune (SURVEY §4.3.2) — partition column = top-level dir. */
  def writeIndex(entries: DataFrame, dest: String): Unit =
    entries
      .withColumn("topdir", when(col("depth") > 0, split(col("path"), "/").getItem(0)).otherwise(lit("")))
      .repartition(col("topdir"))
      .write
      .mode("overwrite")
      .partitionBy("topdir")
      .parquet(dest)
}
