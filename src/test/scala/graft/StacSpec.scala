package graft

import org.apache.spark.sql.functions._

import graft.model.{Entry, EntryType, PointGeom}
import graft.stac.Stac

/** STAC document shapes — mirrors `tests/stac_test.cpp:571-621`. */
class StacSpec extends SparkSuite {
  import spark.implicits._

  test("slugify matches reference rules") {
    val df = Seq("My File (1).JPG", "--weird--", "already-clean", "a__b").toDF("s")
    val got = df.select(Stac.slugify($"s").as("slug")).collect().map(_.getString(0))
    assert(got(0) === "my-file-1-jpg")
    assert(got(1) === "weird")
    assert(got(2) === "already-clean")
    assert(got(3) === "a-b")
  }

  test("mime type lookup with octet-stream fallback") {
    val df = Seq("a/b.JPG", "c.tif", "weird.xyz", "movie.mp4").toDF("path")
    val got = df.select(Stac.mimeType($"path").as("m")).collect().map(_.getString(0))
    assert(got === Array("image/jpeg", "image/tiff", "application/octet-stream", "video/mp4"))
  }

  test("epsg from wkt: last AUTHORITY wins") {
    val wkt = """PROJCS["WGS 84 / UTM zone 17N",GEOGCS["WGS 84",AUTHORITY["EPSG","4326"]],AUTHORITY["EPSG","32617"]]"""
    val got = Seq(wkt).toDF("wkt").select(Stac.epsgFromWkt($"wkt").as("e")).head().getInt(0)
    assert(got === 32617)
  }

  test("iso formatting from epoch ms and s") {
    val df = Seq((1700000000000L, 1700000000L)).toDF("ms", "s")
    val r = df.select(Stac.isoFromEpochMs($"ms").as("a"), Stac.isoFromEpochSec($"s").as("b")).head()
    assert(r.getString(0) === "2023-11-14T22:13:20Z")
    assert(r.getString(1) === "2023-11-14T22:13:20Z")
  }

  private def entryRow(path: String, withPoint: Boolean, captureMs: Option[Long]): Entry =
    Entry(path, "h", EntryType.GeoImage,
      captureMs.map(ms => s"""{"captureTime":$ms}""").getOrElse("{}"),
      1700000000L, 10, 0,
      if (withPoint) Some(PointGeom(-122.3, 47.6, 100)) else None, None)

  private lazy val entries = Seq(
    entryRow("a.jpg", withPoint = true, Some(1690000000000L)),
    entryRow("b.jpg", withPoint = true, None),
    entryRow("nogeom.jpg", withPoint = false, None)
  ).toDF()
    .withColumn("minx", when($"pointGeom".isNotNull, $"pointGeom.lon"))
    .withColumn("miny", when($"pointGeom".isNotNull, $"pointGeom.lat"))
    .withColumn("maxx", when($"pointGeom".isNotNull, $"pointGeom.lon"))
    .withColumn("maxy", when($"pointGeom".isNotNull, $"pointGeom.lat"))

  test("items: geometry presence filter, slug id, datetime coalesce") {
    val items = Stac.items(entries).collect()
    assert(items.length === 2) // nogeom filtered
    val a = items.find(_.getAs[String]("id") == "a-jpg").get
    assert(a.getAs[String]("datetime") === "2023-07-22T04:26:40Z") // captureTime wins
    val b = items.find(_.getAs[String]("id") == "b-jpg").get
    assert(b.getAs[String]("datetime") === "2023-11-14T22:13:20Z") // falls back to mtime
    assert(a.getAs[String]("geometry").contains("\"Point\""))
  }

  test("itemCollection: bbox + paging + numberMatched") {
    val (page, matched) = Stac.itemCollection(entries,
      bbox = Some((-123.0, 47.0, -122.0, 48.0)), startSec = None, endSec = None, limit = 1, offset = 0)
    assert(matched === 2)
    assert(page.count() === 1)
    val (page2, m2) = Stac.itemCollection(entries,
      bbox = Some((0.0, 0.0, 1.0, 1.0)), startSec = None, endSec = None)
    assert(m2 === 0 && page2.count() === 0)
  }

  test("itemCollection temporal filter uses captureTime else mtime") {
    val (_, matched) = Stac.itemCollection(entries, bbox = None,
      startSec = Some(1695000000L), endSec = None)
    assert(matched === 1) // only b.jpg (mtime 1700000000); a.jpg captureTime 1690000000
  }

  test("string API: datetime offsets, open intervals, bbox validation (stac_test.cpp:540-589)") {
    // timezone offsets: the same instant in Z and +02:00 matches identically
    val (_, mUtc) = Stac.itemCollectionApi(entries, "", "1970-01-01T00:00:00Z", "2099-01-01T00:00:00+00:00")
    val (_, mOff) = Stac.itemCollectionApi(entries, "", "1970-01-01T00:00:00Z", "2099-01-01T02:00:00+02:00")
    assert(mUtc === mOff && mUtc >= 1)
    // far-future interval → 0 features
    val (_, mFut) = Stac.itemCollectionApi(entries, "", "2099-01-01T00:00:00Z", "2099-12-31T23:59:59Z")
    assert(mFut === 0)
    // open-ended forms: "", ".." both mean unbounded
    val (_, mOpenStart) = Stac.itemCollectionApi(entries, "", "", "2099-12-31T23:59:59Z")
    val (_, mOpenEnd) = Stac.itemCollectionApi(entries, "", "1970-01-01T00:00:00Z", "..")
    assert(mOpenStart >= 1 && mOpenEnd >= 1)
    // parse faces directly
    assert(Stac.parseDatetime("") === None)
    assert(Stac.parseDatetime("..") === None)
    assert(Stac.parseDatetime("1970-01-01T00:00:00Z") === Some(0L))
    assert(Stac.parseDatetime("1970-01-01T02:00:00+02:00") === Some(0L))
    intercept[IllegalArgumentException](Stac.parseDatetime("yesterday-ish"))
    // bbox validation: non-numeric token and wrong arity are named errors
    assert(Stac.parseBbox("") === None)
    assert(Stac.parseBbox("1.0,2.0,3.0,4.0") === Some((1.0, 2.0, 3.0, 4.0)))
    intercept[IllegalArgumentException](Stac.parseBbox("abc,2,3,4"))
    intercept[IllegalArgumentException](Stac.parseBbox("1.0,2.0,3.0"))
  }

  test("collection description + license: README rule and meta default (stac.cpp:529-538)") {
    val dir = java.nio.file.Files.createTempDirectory("stacreadme").toFile
    try {
      java.nio.file.Files.writeString(new java.io.File(dir, "README.md").toPath, "# My dataset\nhello")
      // README.md not indexed → title wins even though the file exists
      assert(Stac.collectionDescription(entries, dir.getPath, "fallback-title") === "fallback-title")
      val withReadme = entries.unionByName(Seq(entryRow("README.md", withPoint = false, None)).toDF()
        .withColumn("minx", lit(null).cast("double")).withColumn("miny", lit(null).cast("double"))
        .withColumn("maxx", lit(null).cast("double")).withColumn("maxy", lit(null).cast("double")))
      assert(Stac.collectionDescription(withReadme, dir.getPath, "t") === "# My dataset\nhello")
      // license: singular meta at dataset level, default proprietary
      import graft.core.Meta
      val empty = Seq.empty[graft.model.MetaRow].toDF()
      assert(Stac.collectionLicense(empty) === "proprietary")
      implicit val s = spark
      val withLic = Meta.set(empty, Meta.metaRow("", "license", "CC-BY-4.0", 100))
      assert(Stac.collectionLicense(withLic) === "CC-BY-4.0")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("geojson feature collection: polygon wins over point, valid doc") {
    val withPoly = entries.withColumn(
      "polygonGeom",
      when($"path" === "a.jpg",
        array(
          struct(lit(-122.4).as("lon"), lit(47.5).as("lat"), lit(0.0).as("alt")),
          struct(lit(-122.2).as("lon"), lit(47.5).as("lat"), lit(0.0).as("alt")),
          struct(lit(-122.4).as("lon"), lit(47.5).as("lat"), lit(0.0).as("alt"))
        ))
    )
    val feats = Stac.features(withPoly).collect().map(_.getString(0))
    assert(feats.length === 2)
    assert(feats(0).contains("\"Polygon\"")) // a.jpg: polygon beats point
    assert(feats(1).contains("\"Point\""))
    val doc = Stac.featureCollectionJson(withPoly)
    assert(doc.startsWith("""{"type":"FeatureCollection","features":["""))
    // must be parseable JSON: Spark's parser extracts the type field
    val parsedType = spark.range(1)
      .select(get_json_object(lit(doc), "$.type").as("t")).head().getString(0)
    assert(parsedType === "FeatureCollection")
    assert(doc.split("\\{\"type\":\"Feature\"").length - 1 === 2)
  }

  test("featureCollectionJson enforces the paged-sink bound") {
    val doc = Stac.featureCollectionJson(entries, maxFeatures = 2)
    assert(doc.split("\\{\"type\":\"Feature\"").length - 1 === 2)
    val e = intercept[IllegalArgumentException] {
      Stac.featureCollectionJson(entries, maxFeatures = 1)
    }
    assert(e.getMessage.contains("paged"))
  }

  test("collection extent aggregates envelope + time") {
    val r = Stac.collectionExtent(entries).head()
    assert(r.getAs[Double]("west") === -122.3)
    assert(r.getAs[String]("start_datetime") === "2023-07-22T04:26:40Z")
    assert(r.getAs[Long]("item_count") === 3)
  }
}
