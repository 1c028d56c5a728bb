package graft

import graft.sources.{Exif, ExifWrite}
import ExifFixtures._

/** EXIF GPS write-back round-trip: written bytes must re-read through
  * this engine's own EXIF parser with the reference's DMS/fraction
  * quantization, existing tags preserved.
  */
class ExifWriteSpec extends SparkSuite {

  // doubleToDMS quantizes seconds to 1/10000 → worst error ~1.4e-8 deg
  private val eps = 1e-7

  test("setGps on an EXIF-bearing JPEG: coordinates round-trip, prior tags survive") {
    val jpeg = buildJpegWithExif(buildTiff())
    val before = Exif.fromJpeg(jpeg)
    val out = ExifWrite.setGps(jpeg, 46.84202, -91.99346, 183.25)
    val e = Exif.fromJpeg(out)
    assert(math.abs(e.lat.get - 46.84202) < eps)
    assert(math.abs(e.lon.get - (-91.99346)) < eps)
    assert(e.altitude.get === 183.25) // trunc(183.25·10³)/10³ is exact
    // IFD0 + Exif sub-IFD content preserved through the rewrite
    assert(e.make === before.make)
    assert(e.model === before.model)
    assert(e.captureTimeMs === before.captureTimeMs)
    assert(e.focalLength === before.focalLength)
  }

  test("southern/western hemisphere refs and below-sea-level altitude") {
    val jpeg = buildJpegWithExif(buildTiff())
    val e = Exif.fromJpeg(ExifWrite.setGps(jpeg, -33.856, 151.215, -12.5))
    assert(math.abs(e.lat.get - (-33.856)) < eps)
    assert(math.abs(e.lon.get - 151.215) < eps)
    assert(e.altitude.get === -12.5)
  }

  test("a JPEG with no EXIF gains a fresh GPS-only block") {
    val bare = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte) // SOI + EOI
    val e = Exif.fromJpeg(ExifWrite.setGps(bare, 10.5, -20.25, 99.0))
    assert(math.abs(e.lat.get - 10.5) < eps)
    assert(math.abs(e.lon.get - (-20.25)) < eps)
    assert(e.altitude.get === 99.0)
  }

  test("idempotent rewrite: setting GPS twice keeps the last value and stays parseable") {
    val jpeg = buildJpegWithExif(buildTiff())
    val once = ExifWrite.setGps(jpeg, 1.0, 2.0, 3.0)
    val twice = ExifWrite.setGps(once, -4.5, 5.25, -6.125)
    val e = Exif.fromJpeg(twice)
    assert(math.abs(e.lat.get - (-4.5)) < eps)
    assert(math.abs(e.lon.get - 5.25) < eps)
    assert(e.altitude.get === -6.125)
  }

  test("Spark face: geotag rewrites a payload column from coordinate columns") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val jpeg = buildJpegWithExif(buildTiff())
    val df = Seq((1L, jpeg, 10.0, 20.0, 30.0), (2L, jpeg, -1.5, -2.5, -3.5))
      .toDF("id", "payload", "lat", "lon", "alt")
    val out = ExifWrite
      .geotag(df, col("payload"), col("lat"), col("lon"), col("alt"))
      .collect()
      .map(r => r.getLong(0) -> Exif.fromJpeg(r.getAs[Array[Byte]](1)))
      .toMap
    assert(math.abs(out(1L).lat.get - 10.0) < eps && math.abs(out(2L).lon.get - (-2.5)) < eps)
  }
}
