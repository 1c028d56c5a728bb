package graft

import org.apache.spark.sql.functions._

import graft.core.{Index, Meta}
import graft.model.{Entry, EntryType, MetaRow}

/** List/search semantics matrix — the Spark mirror of
  * `tests/ddb_test.cpp:450-820` (exact, wildcard, folder, recursive,
  * depth) and the LIKE-escape rules of `dbops.cpp:760-771`.
  */
class IndexSpec extends SparkSuite {
  import spark.implicits._

  private def e(path: String, tpe: Int = EntryType.Generic, size: Long = 10): Entry =
    Entry(path, if (tpe == EntryType.Directory) "" else "h" + path.hashCode, tpe, "{}",
      1700000000L + path.length, size, path.count(_ == '/'), None, None)

  private lazy val entries = Seq(
    e("photos", EntryType.Directory),
    e("photos/IMG_0001.JPG", EntryType.Image),
    e("photos/IMG_0002.JPG", EntryType.Image),
    e("photos/sub", EntryType.Directory),
    e("photos/sub/IMG_0003.JPG", EntryType.Image),
    e("readme.md", EntryType.Markdown),
    e("data_1.bin"),
    e("data%2.bin"),
    e("ortho.tif", EntryType.GeoRaster)
  ).toDF()

  private lazy val meta = Seq.empty[MetaRow].toDF()

  private def paths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("path").collect().map(_.getString(0)).toSeq

  test("exact path lookup") {
    assert(paths(Index.getEntry(entries, "readme.md")) === Seq("readme.md"))
    assert(Index.pathExists(entries, "photos/IMG_0001.JPG"))
    assert(!Index.pathExists(entries, "nope.jpg"))
  }

  test("wildcard search: * maps to LIKE % and crosses '/' (ref semantics)") {
    val got = paths(Index.search(entries, meta, "photos/*.JPG"))
    assert(got === Seq("photos/IMG_0001.JPG", "photos/IMG_0002.JPG", "photos/sub/IMG_0003.JPG"))
  }

  test("star does not cross directory boundaries like SQL % would") {
    // the reference's LIKE-based semantics: '*' -> '%' DOES cross '/';
    // folder scoping comes from the pattern shape
    val got = paths(Index.search(entries, meta, "*.JPG"))
    assert(got === Seq("photos/IMG_0001.JPG", "photos/IMG_0002.JPG", "photos/sub/IMG_0003.JPG"))
  }

  test("folder query expands to children (// suffix semantics)") {
    val got = paths(Index.search(entries, meta, "photos"))
    assert(got.contains("photos") && got.contains("photos/IMG_0001.JPG") && got.contains("photos/sub/IMG_0003.JPG"))
  }

  test("literal % in path is escaped, not a wildcard") {
    val got = paths(Index.search(entries, meta, "data%2.bin"))
    assert(got === Seq("data%2.bin"))
    // and a real wildcard still matches both data files
    assert(paths(Index.search(entries, meta, "data*")).toSet === Set("data_1.bin", "data%2.bin"))
  }

  test("literal _ is escaped (SQL single-char wildcard disabled)") {
    assert(paths(Index.search(entries, meta, "data_1.bin")) === Seq("data_1.bin"))
    assert(paths(Index.search(entries, meta, "data_X.bin")) === Seq())
  }

  test("depth filter: maxDepth=1 hides subfolder contents") {
    val got = paths(Index.matchingEntries(entries, meta, "*", maxDepth = Some(1)))
    assert(!got.exists(_.startsWith("photos/")))
  }

  test("list orders by type then path (dirs first)") {
    val got = paths(Index.list(entries, meta, Seq("photos"), recursive = true))
    assert(got.head === "photos") // Directory=1 sorts before Image=6
  }

  test("missing folder derivation (folder-consistency anti-join)") {
    val broken = Seq(e("a/b/c/file.bin")).toDF()
    val missing = paths(Index.missingFolders(broken)).sorted
    assert(missing === Seq("a", "a/b", "a/b/c"))
  }

  test("dataset summary rolls up count/size") {
    val r = Index.datasetSummary(entries).head()
    assert(r.getAs[Long]("entryCount") === 9L)
    assert(r.getAs[Long]("totalSize") === 90L)
  }

  test("nested dataset entry: child index becomes one DroneDB row") {
    val row = Index.nestedDatasetEntry(entries, "child.ddb", 1700000000L).head()
    assert(row.getAs[String]("path") === "child.ddb")
    assert(row.getAs[Int]("entryType") === graft.model.EntryType.DroneDB)
    assert(row.getAs[Long]("size") === 90L) // SUM(child size), entry.cpp:968
    assert(row.getAs[String]("properties").contains("\"entryCount\":9"))
  }

  test("bbox intersects prunes on envelope columns") {
    val withEnv = entries
      .withColumn("minx", when($"path" === "ortho.tif", lit(-122.5)))
      .withColumn("miny", when($"path" === "ortho.tif", lit(45.0)))
      .withColumn("maxx", when($"path" === "ortho.tif", lit(-122.0)))
      .withColumn("maxy", when($"path" === "ortho.tif", lit(45.5)))
    assert(paths(withEnv.filter(Index.bboxIntersects(-123, 44, -122.2, 46))) === Seq("ortho.tif"))
    assert(paths(withEnv.filter(Index.bboxIntersects(-121, 44, -120, 46))) === Seq())
  }

  test("STAC-style paging via row_number") {
    val page = paths(Index.page(entries.orderBy("path"), limit = 3, offset = 2))
    assert(page.size === 3)
    assert(page === paths(entries.orderBy("path")).slice(2, 5))
  }
}
