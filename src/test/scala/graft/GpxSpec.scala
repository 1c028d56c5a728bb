package graft

import java.nio.file.Files

import graft.sources.Gpx

/** Pure-JVM GPX reader: wpt/rte/trk layers, lat/lon attributes,
  * multi-segment tracks, elevation/time rollups, and the
  * executor-side featureTable.
  */
class GpxSpec extends SparkSuite {

  private val gpxDoc =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<gpx version="1.1" creator="unit" xmlns="http://www.topografix.com/GPX/1/1">
      |  <wpt lat="47.62" lon="-122.35"><name>home</name><ele>120.5</ele></wpt>
      |  <rte><name>plan</name>
      |    <rtept lat="47.60" lon="-122.40"/>
      |    <rtept lat="47.65" lon="-122.30"/>
      |  </rte>
      |  <trk><name>flight-1</name>
      |    <trkseg>
      |      <trkpt lat="47.600" lon="-122.400"><ele>100.0</ele><time>2024-01-10T08:00:00Z</time></trkpt>
      |      <trkpt lat="47.610" lon="-122.390"><ele>140.0</ele><time>2024-01-10T08:01:00Z</time></trkpt>
      |    </trkseg>
      |    <trkseg>
      |      <trkpt lat="47.620" lon="-122.380"><ele>130.0</ele><time>2024-01-10T08:02:00Z</time></trkpt>
      |    </trkseg>
      |  </trk>
      |</gpx>""".stripMargin

  test("wpt/rte/trk features: counts, bbox in lon/lat order, segment folding") {
    val fs = Gpx.features(gpxDoc.getBytes("UTF-8"))
    assert(fs.map(_.kind) === Seq("wpt", "rte", "trk"))
    val Seq(wpt, rte, trk) = fs
    assert(wpt.name === Some("home") && wpt.nPoints === 1)
    assert(wpt.bbox === Some((-122.35, 47.62, -122.35, 47.62)))
    assert(rte.nPoints === 2 && rte.bbox === Some((-122.40, 47.60, -122.30, 47.65)))
    assert(trk.name === Some("flight-1"))
    assert(trk.nPoints === 3, "both trksegs fold into one track feature")
    assert(trk.bbox === Some((-122.400, 47.600, -122.380, 47.620)))
  }

  test("elevation and time roll up across segments") {
    val trk = Gpx.features(gpxDoc.getBytes("UTF-8")).last
    assert(trk.eleMin === Some(100.0) && trk.eleMax === Some(140.0))
    assert(trk.timeFirst === Some("2024-01-10T08:00:00Z"))
    assert(trk.timeLast === Some("2024-01-10T08:02:00Z"))
  }

  test("meta face; non-GPX refused; malformed XML yields empty") {
    val m = Gpx.meta(gpxDoc.getBytes("UTF-8")).get
    assert(m.driver === "GPX" && m.featureCount === 3)
    assert(m.geometryTypes.toSet === Set("Point", "LineString"))
    assert(m.bbox === Some((-122.40, 47.60, -122.30, 47.65)))
    assert(Gpx.meta("<kml></kml>".getBytes).isEmpty)
    assert(Gpx.features("<gpx><trk><broken".getBytes).isEmpty)
  }

  test("featureTable over a directory; time-windowed track selection") {
    val dir = Files.createTempDirectory("gpxspec")
    try {
      Files.write(dir.resolve("a.gpx"), gpxDoc.getBytes("UTF-8"))
      val df = Gpx.featureTable(spark, dir.toString)
      assert(df.count() === 3)
      import org.apache.spark.sql.functions.col
      val tracked = df.filter(col("kind") === "trk" && col("time_last") >= "2024-01-10T08:02:00Z").collect()
      assert(tracked.length === 1 && tracked.head.getAs[Long]("n_points") === 3L)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }
}
