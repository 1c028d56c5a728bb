package graft

import org.apache.spark.sql.functions._

import graft.model.EntryType
import graft.sources.{Ddb, Gpkg, Ingest, Laz, Ply, Sqlite}

/** The full reference-user walk as ONE integration test: a mixed
  * asset directory (EXIF JPEG, .laz point cloud, 3DGS splat PLY,
  * GeoPackage, markdown, generic) → recursive ingest scan →
  * content-sniffed typed index with hashes and properties → a REAL
  * SQLite .ddb (reference schema + migration pass) → read-back +
  * path search. Every stage is spec- or oracle-gated on its own; this
  * proves they compose. */
class EndToEndSpec extends SparkSuite {

  test("mixed directory -> ingest -> typed entries -> .ddb round-trip -> search") {
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e")
    def put(rel: String, bytes: Array[Byte]): Unit = {
      val p = dir.resolve(rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, bytes)
    }
    try {
      // --- assets ---
      val tiff = ExifFixtures.buildTiff()
      put("images/shot.jpg", ExifFixtures.buildJpegWithExifXmp(tiff, Some(ExifFixtures.xmpPacket())))
      val lazPts = (0 until 500).map(i => Laz.P(i * 10, i * 20, i * 3, i % 100,
        returnByte = 1 | (1 << 3), classification = 2, scanAngle = 0, userData = 0,
        pointSource = 1, gpsTime = 1000.0 + i))
      put("clouds/scan.laz", Laz.compress(lazPts, pointFormat = 1, chunkSize = 200))
      put("splats/scene.ply", Ply.write(
        Seq("x", "y", "z", "f_dc_0", "opacity"),
        (0 until 40).map(i => Array(i.toFloat, 0f, 0f, 0.5f, 1f))))
      put("vectors/sites.gpkg", Gpkg.write("sites", Seq("name" -> "TEXT"),
        (0 until 10).map(i => (Seq[Any](s"s$i"), Some((10.0 + i, 45.0))))))
      put("README.md", "# dataset".getBytes)
      put("misc/blob.bin", Array.tabulate[Byte](64)(_.toByte))
      put(".ddb/ignored.txt", "index internals are skipped".getBytes) // dbops.cpp getPathList skip

      // --- ingest scan -> typed entries ---
      val files = Ingest.listFiles(spark, dir.toString)
      val entries = Ingest.toEntries(files, dir.toString).cache()
      val byPath = entries.collect().map(r => r.getAs[String]("path") -> r).toMap
      assert(!byPath.keySet.exists(_.contains(".ddb")), "index internals must be skipped")
      assert(byPath("images/shot.jpg").getAs[Int]("entryType") == EntryType.GeoImage)
      assert(byPath("clouds/scan.laz").getAs[Int]("entryType") == EntryType.PointCloud)
      assert(byPath("splats/scene.ply").getAs[Int]("entryType") == EntryType.GaussianSplat)
      assert(byPath("vectors/sites.gpkg").getAs[Int]("entryType") == EntryType.Vector)
      assert(byPath("README.md").getAs[Int]("entryType") == EntryType.Markdown)
      assert(byPath("misc/blob.bin").getAs[Int]("entryType") == EntryType.Generic)
      // content-derived properties made it through
      assert(byPath("clouds/scan.laz").getAs[String]("properties").contains("\"pointCount\":500"))
      assert(byPath("splats/scene.ply").getAs[String]("properties").contains("\"kind\":\"splat\""))
      val jpgProps = byPath("images/shot.jpg").getAs[String]("properties")
      assert(jpgProps.contains("\"width\"") && jpgProps.contains("hasCameraOrientation"))
      // sha256 + depth filled
      assert(byPath("images/shot.jpg").getAs[String]("hash").length == 64)
      assert(byPath("clouds/scan.laz").getAs[Int]("depth") == 1)

      // --- materialize a REAL .ddb, run the migration pass, read back ---
      val ddbEntries = entries.collect().map { r =>
        Ddb.Entry(
          r.getAs[String]("path"), r.getAs[String]("hash"),
          r.getAs[Int]("entryType").toLong, r.getAs[String]("properties"),
          r.getAs[Long]("mtime"), r.getAs[Long]("size"), r.getAs[Int]("depth").toLong,
          pointGeom = Option(r.getAs[Any]("pointGeom")).map { _ =>
            val g = r.getAs[org.apache.spark.sql.Row]("pointGeom")
            (g.getDouble(0), g.getDouble(1), g.getDouble(2))
          }
        )
      }.toSeq
      val db = Ddb.ensureSchemaConsistency(Ddb.write(ddbEntries))
      assert(Sqlite.userVersion(db) == Ddb.SchemaVersion)
      val back = Ddb.readEntries(db)
      assert(back.map(_.path).toSet == byPath.keySet)
      assert(back.find(_.path == "images/shot.jpg").get.typ == EntryType.GeoImage.toLong)
      // the path auto-index serves sorted lookups
      assert(Sqlite.readIndex(db, "sqlite_autoindex_entries_1").map(_.head.asInstanceOf[String]) ==
        back.map(_.path))

      // --- index queries over the entries frame (the LIKE-scan face) ---
      import graft.core.Index
      val clouds = entries.filter(Index.pathMatches("clouds/*")).collect()
      assert(clouds.length == 1 && clouds.head.getAs[String]("path") == "clouds/scan.laz")
      assert(entries.filter(col("entryType") === EntryType.GaussianSplat).count() == 1)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir.toFile)
    }
  }
}
