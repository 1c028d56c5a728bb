package graft

import graft.core.Cleanup
import graft.model.EntryType

/** Build-folder GC (build.cpp:705-870) — the cleanup_test behavior
  * matrix as relational assertions. */
class CleanupSpec extends SparkSuite {

  import org.apache.spark.sql.DataFrame

  private val hashA = "a" * 64
  private val hashB = "b" * 63 + "0"
  private val hashC = "c" * 63 + "1"

  private def entriesDf(rows: (String, Int, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("path", "type", "hash")
  }

  private def fsDf(paths: String*): DataFrame = {
    import spark.implicits._
    paths.toSeq.toDF("path")
  }

  private def buildDf(rows: (String, Boolean, Boolean)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("name", "is_dir", "active_lock")
  }

  test("isHashLike: 64 hex chars only (never clobber unrelated names)") {
    assert(Cleanup.isHashLike(hashA) && Cleanup.isHashLike(hashB.toUpperCase))
    assert(!Cleanup.isHashLike("short"))
    assert(!Cleanup.isHashLike("g" * 64)) // non-hex
    assert(!Cleanup.isHashLike("a" * 63) && !Cleanup.isHashLike("a" * 65))
    assert(!Cleanup.isHashLike(null))
  }

  test("empty or missing build directory yields no orphans; valid hashes are kept") {
    val entries = entriesDf(("a.jpg", EntryType.Image, hashA))
    val fs = fsDf("a.jpg")
    assert(Cleanup.cleanupBuild(entries, fs, buildDf()) == ((Seq.empty, Seq.empty)))
    // KeepsValidHashes
    val (_, orphans) = Cleanup.cleanupBuild(entries, fs, buildDf((hashA, true, false)))
    assert(orphans.isEmpty)
  }

  test("orphan directories and orphan .pending files are removed; non-hash names are ignored") {
    val entries = entriesDf(("a.jpg", EntryType.Image, hashA))
    val fs = fsDf("a.jpg")
    val build = buildDf(
      (hashA, true, false), // valid
      (hashB, true, false), // orphan dir
      (s"$hashC.pending", false, false), // orphan pending file
      ("not-a-hash", true, false), // IgnoresNonHashDirectory
      ("readme.txt", false, false), // IgnoresUnrelatedTopLevelFiles
      ("short.pending", false, false) // IgnoresNonHashPendingFile
    )
    val (stale, orphans) = Cleanup.cleanupBuild(entries, fs, build)
    assert(stale.isEmpty)
    assert(orphans == Seq(hashB, s"$hashC.pending"))
  }

  test("active .building locks protect an orphan; stale locks do not") {
    val entries = entriesDf(("a.jpg", EntryType.Image, hashA))
    val fs = fsDf("a.jpg")
    val build = buildDf(
      (hashB, true, true), // SkipsOrphanWithActiveLock
      (hashC, true, false) // RemovesOrphanWithStaleLock (lock present but stale → active_lock=false)
    )
    val (_, orphans) = Cleanup.cleanupBuild(entries, fs, build)
    assert(orphans == Seq(hashC))
  }

  test("phase 1 removes stale DB entries and frees their build folders (combined phases)") {
    val entries = entriesDf(
      ("kept.jpg", EntryType.Image, hashA),
      ("gone.jpg", EntryType.Image, hashB), // file missing → stale
      ("subdir", EntryType.Directory, null) // directories never stale-checked
    )
    val fs = fsDf("kept.jpg")
    val build = buildDf((hashA, true, false), (hashB, true, false))
    val (stale, orphans) = Cleanup.cleanupBuild(entries, fs, build)
    // RemovesStaleDbEntriesAndTheirBuildFolder
    assert(stale == Seq("gone.jpg"))
    assert(orphans == Seq(hashB), "the stale entry's hash becomes an orphan after phase 1")
    // KeepsDbEntriesWhenFilesExist
    val (stale2, orphans2) = Cleanup.cleanupBuild(entries, fsDf("kept.jpg", "gone.jpg"), build)
    assert(stale2.isEmpty && orphans2.isEmpty)
  }

  test("repeated call is idempotent") {
    val entries = entriesDf(("kept.jpg", EntryType.Image, hashA), ("gone.jpg", EntryType.Image, hashB))
    val fs = fsDf("kept.jpg")
    val build = buildDf((hashA, true, false), (hashB, true, false))
    val first = Cleanup.cleanupBuild(entries, fs, build)
    // after applying phase 1+2: entries minus stale, build minus orphans
    val entries2 = Cleanup.cleanEntries(entries, fs)
    val build2 = buildDf((hashA, true, false))
    val second = Cleanup.cleanupBuild(entries2, fs, build2)
    assert(first == ((Seq("gone.jpg"), Seq(hashB))))
    assert(second == ((Seq.empty, Seq.empty)))
  }

  test("typeFromHuman + entry type names (rescan_test matrix)") {
    assert(EntryType.fromHuman("image") == EntryType.Image)
    assert(EntryType.fromHuman("Image") == EntryType.Image)
    assert(EntryType.fromHuman("IMAGE") == EntryType.Image)
    assert(EntryType.fromHuman("GeoImage") == EntryType.GeoImage)
    assert(EntryType.fromHuman("PointCloud") == EntryType.PointCloud)
    assert(EntryType.fromHuman("georaster") == EntryType.GeoRaster)
    assert(EntryType.fromHuman("geovideo") == EntryType.GeoVideo)
    assert(EntryType.fromHuman("dronedb") == EntryType.DroneDB)
    assert(EntryType.fromHuman("unknown") == EntryType.Undefined)
    assert(EntryType.fromHuman("") == EntryType.Undefined)
    assert(EntryType.fromHuman("xyz123") == EntryType.Undefined)
    assert(EntryType.fromHuman(null) == EntryType.Undefined)
    val names = EntryType.humanNames
    assert(names.nonEmpty)
    assert(Seq("image", "geoimage", "pointcloud", "georaster").forall(names.contains))
    assert(!names.contains("directory") && !names.contains("undefined"))
  }

  test("getPendingBuildInfo: .pending markers join back to indexed entries; unindexed drop out") {
    import spark.implicits._
    val entries = Seq((hashA, "a.laz"), (hashB, "b.obj")).toDF("hash", "path")
    val pending = Seq(
      (hashA, "dep1.mtl,dep2.jpg", 1700000000L),
      (hashC, "x.bin", 1700000100L) // hash not indexed -> garbage, dropped
    ).toDF("hash", "missing_deps", "last_attempt")
    val got = graft.core.Builds.pendingBuildInfo(pending, entries).collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("path") == "a.laz")
    assert(got.head.getAs[String]("missing_deps") == "dep1.mtl,dep2.jpg")
  }
}
