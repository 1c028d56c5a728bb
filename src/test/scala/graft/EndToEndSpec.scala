package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.core.{Index, Meta, Mutations, Sync}
import graft.model.{EntryType, MetaRow}
import graft.sources.Ingest
import graft.stac.Stac

/** The reference's whole lifecycle on one fixture tree:
  * init → add → search/list → meta → STAC → stamp/delta → move/delete.
  * Mirrors SURVEY §3 traces end-to-end with real extracted geotags.
  */
class EndToEndSpec extends SparkSuite {
  import spark.implicits._
  implicit private def s = spark

  private def jpegWithGps(latRef: String, lonRef: String): Array[Byte] =
    ExifFixtures.buildJpegWithExif(ExifFixtures.buildTiff(latRef = latRef, lonRef = lonRef))

  test("full lifecycle over a fixture tree") {
    val dir = Files.createTempDirectory("graft_e2e").toFile
    try {
      Files.createDirectories(Paths.get(dir.getPath, "photos"))
      Files.write(Paths.get(dir.getPath, "photos", "IMG_0001.JPG"), jpegWithGps("N", "W"))
      Files.write(Paths.get(dir.getPath, "photos", "IMG_0002.JPG"), jpegWithGps("S", "E"))
      Files.writeString(Paths.get(dir.getPath, "README.md"), "# dataset")

      // ---- add (SURVEY §3.1)
      val entries = Ingest.toEntries(Ingest.listFiles(spark, dir.getPath), dir.getPath)
        .persist()
      assert(entries.count() === 3)
      val img1 = entries.filter($"path" === "photos/IMG_0001.JPG").head()
      assert(img1.getAs[Int]("entryType") === EntryType.GeoImage)
      assert(img1.getAs[String]("properties").contains("\"make\":\"DJI\""))

      // ---- search (SURVEY §3.2)
      val meta0 = Seq.empty[MetaRow].toDF()
      val found = Index.search(entries, meta0, "*.JPG").select("path").collect().map(_.getString(0))
      assert(found.toSeq === Seq("photos/IMG_0001.JPG", "photos/IMG_0002.JPG"))

      // ---- meta attach + per-path JSON in the search join
      val meta1 = Meta.add(meta0, Meta.metaRow("photos/IMG_0001.JPG", "annotations", "{\"kind\":\"tree\"}", 100))
      val joined = Index.search(entries, meta1, "photos/IMG_0001.JPG")
      val metaJson = joined.select("meta").head().getString(0)
      assert(metaJson != null && metaJson.contains("annotations"))

      // ---- STAC ItemCollection over the real geotags (SURVEY §3.3)
      val (page, matched) = Stac.itemCollection(
        entries, bbox = Some((-180.0, 0.0, 0.0, 90.0)), startSec = None, endSec = None)
      assert(matched === 1) // only the N/W image is in the NW quadrant
      val item = page.head()
      assert(item.getAs[String]("id") === "photos-img-0001-jpg")
      assert(item.getAs[String]("datetime") === "2016-06-23T21:32:27Z") // geo-TZ corrected (America/Chicago CDT)

      // ---- stamp / delta roundtrip (push-pull shape)
      val checksum1 = Sync.stampChecksum(entries, meta1)
      assert(Sync.stampChecksum(entries, meta1) === checksum1) // deterministic
      val (moved, metaMoved) = Mutations.moveEntry(entries, meta1, "photos/IMG_0002.JPG", "archived.jpg")
      val delta = Sync.delta(moved, metaMoved, entries, meta1)
      assert(delta.adds.select("path").collect().map(_.getString(0)).toSet === Set("archived.jpg"))
      assert(delta.removes.select("path").collect().map(_.getString(0)).toSet === Set("photos/IMG_0002.JPG"))
      assert(Sync.stampChecksum(moved, metaMoved) !== checksum1)

      // ---- applyDelta brings the old index up to date
      val applied = Sync.applyDelta(
        entries.select("path", "hash"), delta.adds, delta.removes, Sync.KeepTheirs)
      assert(applied.select("path").collect().map(_.getString(0)).toSet ===
        moved.select("path").collect().map(_.getString(0)).toSet)

      // ---- delete cascade ends the story
      val (e3, m3, removed) = Mutations.removeEntries(moved, metaMoved, "photos")
      assert(removed.count() === 1) // only IMG_0001 remains under photos/ (no dir rows from file listing)
      assert(e3.filter($"path".startsWith("photos")).count() === 0)
    } finally {
      def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
      rm(dir)
    }
  }
}
