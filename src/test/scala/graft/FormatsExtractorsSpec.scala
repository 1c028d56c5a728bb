package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.functions.Formats
import graft.model.EntryType
import graft.sources.Extractors

/** §2.7 format kernels + byte-level content sniffing. */
class FormatsExtractorsSpec extends SparkSuite {
  import spark.implicits._

  test("iso8601 parse: Z, numeric offsets, fractional, date-only") {
    val df = Seq(
      "2023-11-14T22:13:20Z",
      "2023-11-14T23:13:20+01:00",
      "2023-11-14T2313:20", // junk
      "2023-11-14T17:13:20-0500",
      "2023-11-14T22:13:20.123Z",
      "2023-11-14"
    ).toDF("s")
    val got = df.select(Formats.parseIso8601($"s").as("t")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got(0) === Some(1700000000L))
    assert(got(1) === Some(1700000000L)) // +01:00 normalizes to same instant
    assert(got(2) === None)
    assert(got(3) === Some(1700000000L)) // ±HHMM without colon
    assert(got(4) === Some(1700000000L)) // fractional stripped
    assert(got(5) === Some(1699920000L)) // date-only at UTC midnight
  }

  test("bytesToHuman") {
    val df = Seq(0L, 512L, 1024L, 1536L, 1048576L, 5L * 1024 * 1024 * 1024).toDF("b")
    val got = df.select(Formats.bytesToHuman($"b").as("h")).collect().map(_.getString(0))
    assert(got === Array("0 B", "512 B", "1 KB", "1.5 KB", "1 MB", "5 GB"))
  }

  test("wkt polygon bbox") {
    val wkt = "POLYGON ((-91.99 46.84, -91.98 46.84, -91.98 46.85, -91.99 46.85, -91.99 46.84))"
    val r = Seq(wkt).toDF("w").select(Formats.wktPolygonBbox($"w").as("b")).head().getStruct(0)
    assert(r.getDouble(0) === -91.99 && r.getDouble(1) === 46.84)
    assert(r.getDouble(2) === -91.98 && r.getDouble(3) === 46.85)
  }

  test("geojson coordinate-walk bbox handles nesting") {
    val gj = """{"type":"MultiPolygon","coordinates":[[[[10.0,20.0],[11.0,21.5],[10.5,22.0]]],[[[9.5,19.0],[10.0,20.0]]]]}"""
    val r = Seq(gj).toDF("g").select(Formats.geojsonBbox($"g").as("b")).head().getStruct(0)
    assert(r.getDouble(0) === 9.5 && r.getDouble(1) === 19.0)
    assert(r.getDouble(2) === 11.0 && r.getDouble(3) === 22.0)
  }

  test("url encode") {
    val got = Seq("a b/c?d=e&f").toDF("s").select(Formats.urlEncode($"s")).head().getString(0)
    assert(got === "a%20b%2Fc%3Fd%3De%26f")
  }

  // -- byte-level sniffing ------------------------------------------------

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  test("png/jpeg dimension sniffing on real encoder output") {
    assert(Extractors.sniffImage(pngBytes(37, 21)) === Some(Extractors.ImageMeta("png", 37, 21)))
    assert(Extractors.sniffImage(jpegBytes(64, 48)) === Some(Extractors.ImageMeta("jpeg", 64, 48)))
    assert(Extractors.sniffImage("not an image".getBytes) === None)
    assert(Extractors.sniffImage(Array.empty[Byte]) === None)
  }

  test("content-first fingerprint: magic beats extension; panorama by aspect") {
    // a PNG stored with a .bin extension is still an Image
    assert(Extractors.fingerprint("weird.bin", pngBytes(10, 10)) === EntryType.Image)
    // aspect ratio >= 2 upgrades to Panorama (entry.cpp:1081-1086)
    assert(Extractors.fingerprint("wide.png", pngBytes(100, 40)) === EntryType.Panorama)
    // non-image bytes fall back to extension dispatch
    assert(Extractors.fingerprint("notes.md", "# hi".getBytes) === EntryType.Markdown)
  }

  test("audio payloads: extraction carries duration/rate/channels properties (beyond-reference)") {
    val pcm = Array.tabulate(8000)(i => (math.sin(i * 0.1) * 8000).toInt)
    val flac = graft.multimodal.Flac.encode(8000, 1, 16, pcm)
    val exF = Extractors.extract("song.flac", flac)
    assert(exF.properties.contains(""""codec":"pcm"""") && exF.properties.contains(""""duration":1000"""), exF.properties)
    val mp3 = graft.multimodal.Mp3.syntheticCbr(20)
    val exM = Extractors.extract("song.mp3", mp3)
    assert(exM.properties.contains(""""codec":"mp3"""") && exM.properties.contains(""""sampleRate":44100"""), exM.properties)
    val ogg = graft.multimodal.Ogg.writePage(1, 0, 0, 2,
      Array[Byte](1) ++ "vorbis".getBytes ++ Array[Byte](0, 0, 0, 0, 2) ++
        Array[Byte]((44100 & 0xff).toByte, ((44100 >> 8) & 0xff).toByte, 0, 0) ++ new Array[Byte](14)) ++
      graft.multimodal.Ogg.writePage(1, 1, 44100, 4, new Array[Byte](20))
    val exO = Extractors.extract("song.ogg", ogg)
    assert(exO.properties.contains(""""codec":"vorbis"""") && exO.properties.contains(""""duration":1000"""), exO.properties)
    // non-audio generic bytes keep empty properties
    assert(Extractors.extract("data.bin", Array.fill[Byte](200)(0x42)).properties == "{}")
  }

  test("extraction over a DataFrame of files") {
    val files = Seq(
      ("a.png", pngBytes(30, 20)),
      ("b.jpg", jpegBytes(20, 10)),
      ("c.md", "# doc".getBytes)
    ).toDF("path", "content")
    val out = Extractors.withExtraction(files, $"path", $"content")
      .select($"path", $"entryType", get_json_object($"properties", "$.width").as("w"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), Option(r.getString(2)))).toMap
    assert(out("a.png") === (EntryType.Image, Some("30")))
    assert(out("b.jpg") === (EntryType.Panorama, Some("20"))) // 20x10 -> ratio 2
    assert(out("c.md") === (EntryType.Markdown, None))
  }
}
