package graft

import java.io.ByteArrayOutputStream

import graft.model.EntryType
import graft.sources.{Exif, Extractors}

/** EXIF walker against a hand-built TIFF/APP1 structure (big-endian),
  * mirroring the golden-value style of `tests/entry_test.cpp:41-391`.
  */
class ExifSpec extends SparkSuite {

  import ExifFixtures._

  test("exif golden: make/model/datetime/gps/alt/focal") {
    val jpeg = buildJpegWithExif(buildTiff())
    val e = Exif.fromJpeg(jpeg)
    assert(e.make === Some("DJI"))
    assert(e.model === Some("FC300S"))
    // DateTime has no OffsetTime and the fix is in America/Chicago
    // (CDT, UTC−5 in June) → geo-timezone cascade (exif.cpp:619-651)
    // converts local wall-clock to UTC
    assert(e.captureTimeMs === Some(
      java.time.LocalDateTime.of(2016, 6, 23, 21, 32, 27).toEpochSecond(java.time.ZoneOffset.UTC) * 1000))
    // 46°50'31.2" N = 46.842, 91°59'38.4" W = -91.994 (entry_test golden shape)
    assert(math.abs(e.lat.get - 46.842) < 1e-9)
    assert(math.abs(e.lon.get - (-91.994)) < 1e-9)
    assert(math.abs(e.altitude.get - 198.51) < 1e-9)
    assert(math.abs(e.focalLength.get - 3.61) < 1e-9)
  }

  test("capture-time cascade: OffsetTime beats geo-timezone (exif.cpp:588-618)") {
    // Brussels flight, explicit +02:00 offset: UTC = local − 2h
    val jpeg = buildJpegWithExif(buildTiff(
      dateTime = "2024:06:15 14:30:00",
      latRef = "N", lat = (50, 50, 24.0), lonRef = "E", lon = (4, 21, 7.2),
      offsetTime = Some("+02:00")
    ))
    val e = Exif.fromJpeg(jpeg)
    assert(e.captureTimeMs === Some(
      java.time.LocalDateTime.of(2024, 6, 15, 12, 30, 0).toEpochSecond(java.time.ZoneOffset.UTC) * 1000))
  }

  test("capture-time cascade: non-UTC flight uses geo-timezone lookup (exif.cpp:619-651)") {
    // Brussels in June = CEST (UTC+2), no OffsetTime tag: wall clock
    // 14:30 local must become 12:30 UTC via the lat/lon zone lookup
    val jpeg = buildJpegWithExif(buildTiff(
      dateTime = "2024:06:15 14:30:00",
      latRef = "N", lat = (50, 50, 24.0), lonRef = "E", lon = (4, 21, 7.2)
    ))
    val e = Exif.fromJpeg(jpeg)
    assert(e.captureTimeMs === Some(
      java.time.LocalDateTime.of(2024, 6, 15, 12, 30, 0).toEpochSecond(java.time.ZoneOffset.UTC) * 1000))
    // winter date: CET (UTC+1)
    val w = Exif.fromJpeg(buildJpegWithExif(buildTiff(
      dateTime = "2024:01:15 14:30:00",
      latRef = "N", lat = (50, 50, 24.0), lonRef = "E", lon = (4, 21, 7.2)
    )))
    assert(w.captureTimeMs === Some(
      java.time.LocalDateTime.of(2024, 1, 15, 13, 30, 0).toEpochSecond(java.time.ZoneOffset.UTC) * 1000))
  }

  test("capture-time cascade: GPS DateStamp+TimeStamp wins over everything (exif.cpp:540-571)") {
    val jpeg = buildJpegWithExif(buildTiff(
      dateTime = "2024:06:15 14:30:00",
      latRef = "N", lat = (50, 50, 24.0), lonRef = "E", lon = (4, 21, 7.2),
      offsetTime = Some("+02:00"),
      gpsStamp = Some(("2024:06:15", 12, 29, 58)) // UTC, disagrees by 2 s
    ))
    val e = Exif.fromJpeg(jpeg)
    assert(e.captureTimeMs === Some(
      java.time.LocalDateTime.of(2024, 6, 15, 12, 29, 58).toEpochSecond(java.time.ZoneOffset.UTC) * 1000))
  }

  test("no GPS fix and no offset: naive UTC fallback (exif.cpp:652-655)") {
    // mid-ocean coordinates outside every zone bbox → UTC passthrough
    val jpeg = buildJpegWithExif(buildTiff(
      dateTime = "2024:06:15 14:30:00",
      latRef = "S", lat = (30, 0, 0.0), lonRef = "W", lon = (140, 0, 0.0)
    ))
    val e = Exif.fromJpeg(jpeg)
    assert(e.captureTimeMs === Some(
      java.time.LocalDateTime.of(2024, 6, 15, 14, 30, 0).toEpochSecond(java.time.ZoneOffset.UTC) * 1000))
  }

  test("southern/eastern hemisphere signs") {
    val jpeg = buildJpegWithExif(buildTiff(latRef = "S", lonRef = "E"))
    val e = Exif.fromJpeg(jpeg)
    assert(e.lat.get < 0 && e.lon.get > 0)
  }

  test("no exif -> empty; corrupt bytes never throw") {
    assert(Exif.fromJpeg("garbage".getBytes) === Exif.empty)
    assert(Exif.fromJpeg(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)) === Exif.empty)
    val truncated = buildJpegWithExif(buildTiff()).take(40)
    Exif.fromJpeg(truncated) // must not throw
  }

  test("xmp: relative altitude and gimbal angles parsed from APP1 packet") {
    import graft.sources.Xmp
    val jpeg = buildJpegWithExifXmp(buildTiff(), Some(xmpPacket(relAlt = 61.5, yaw = 30.0, pitch = -85.0)))
    val x = Xmp.fromJpeg(jpeg)
    assert(x.relativeAltitude === Some(61.5))
    assert(x.gimbalYaw === Some(30.0))
    assert(x.gimbalPitch === Some(-85.0))
    assert(Xmp.fromJpeg(buildJpegWithExif(buildTiff())) === Xmp.empty) // no XMP segment
  }

  test("camera footprint ring from EXIF GPS + XMP altitude") {
    val jpeg = buildJpegWithExifXmp(buildTiff(), Some(xmpPacket(relAlt = 60.0, yaw = 0.0, pitch = -90.0)))
    val ex = Extractors.extract("shot.jpg", jpeg)
    assert(ex.footprint.isDefined, "footprint should be computed")
    val ring = ex.footprint.get
    assert(ring.size === 5 && ring.head === ring.last)
    // ring surrounds the geotag (lon -91.994, lat 46.842)
    val lons = ring.map(_._1); val lats = ring.map(_._2)
    assert(lons.min < -91.994 && lons.max > -91.994)
    assert(lats.min < 46.842 && lats.max > 46.842)
    // nadir at 60 m with 3.61 mm focal / 6.17 mm sensor: half-width =
    // 60 * (6.17/2) / 3.61 = 51.3 m -> ~0.00094 deg lon at this latitude
    val halfLon = (lons.max - lons.min) / 2
    assert(halfLon > 0.0005 && halfLon < 0.002, s"halfLon $halfLon")
    assert(ex.properties.contains("\"relAltitude\":60"))
  }

  test("extraction pipeline: GPS upgrades Image -> GeoImage with pointGeom") {
    val jpeg = buildJpegWithExif(buildTiff())
    val ex = Extractors.extract("shot.jpg", jpeg)
    assert(ex.entryType === EntryType.GeoImage)
    assert(ex.properties.contains("\"captureTime\""))
    assert(ex.properties.contains("\"make\":\"DJI\""))
    assert(ex.lon.isDefined && ex.lat.isDefined)
    // wide geotagged image -> GeoPanorama
    val wide = buildJpegWithExif(buildTiff(), width = 800, height = 300)
    assert(Extractors.extract("pano.jpg", wide).entryType === EntryType.GeoPanorama)
  }

  test("IFD1 embedded thumbnail extracts and decodes; absent/corrupt cases refuse") {
    import graft.sources.Exif
    // a real tiny JPEG as the thumbnail payload
    val thumb = graft.raster.Jpeg.encode(16, 12, 1, Array.tabulate(192)(i => (i * 5).toByte), quality = 85)
    // hand-built APP1: IFD0 (orientation) -> IFD1 (0x0201/0x0202) -> thumb bytes
    val tiff = {
      val out = collection.mutable.ArrayBuffer.empty[Byte]
      def u16(v: Int): Unit = { out += v.toByte; out += (v >> 8).toByte }
      def u32(v: Long): Unit = (0 until 4).foreach(k => out += (v >> (8 * k)).toByte)
      out += 'I'; out += 'I'; u16(42); u32(8)
      u16(1); u16(0x0112); u16(3); u32(1); u32(1) // IFD0: orientation=1
      u32(26) // next IFD at 26
      u16(2)
      u16(0x0201); u16(4); u32(1); u32(56)
      u16(0x0202); u16(4); u32(1); u32(thumb.length.toLong)
      u32(0)
      assert(out.length == 56)
      out ++= thumb
      out.toArray
    }
    val app1Body = "Exif\u0000\u0000".getBytes("ISO-8859-1") ++ tiff
    val app1 = Array(0xFF.toByte, 0xE1.toByte,
      (((app1Body.length + 2) >> 8) & 0xff).toByte, ((app1Body.length + 2) & 0xff).toByte) ++ app1Body
    val host = graft.raster.Jpeg.encode(32, 32, 1, new Array[Byte](1024), quality = 85)
    val withExif = host.take(2) ++ app1 ++ host.drop(2)

    val got = Exif.thumbnail(withExif).getOrElse(fail("thumbnail not extracted"))
    assert(got.toSeq == thumb.toSeq)
    val dec = graft.raster.Jpeg.decode(got).getOrElse(fail("thumbnail not a decodable JPEG"))
    assert(dec.width == 16 && dec.height == 12)
    // no IFD1 -> None; corrupt offset -> None
    assert(Exif.thumbnail(host).isEmpty)
    val bad = withExif.clone()
    // break the thumbnail offset (0x0201 value at tiff+2+... ) by pointing past the block
    assert(Exif.thumbnail(bad.take(withExif.length - thumb.length - 4)).isEmpty)
  }
}
