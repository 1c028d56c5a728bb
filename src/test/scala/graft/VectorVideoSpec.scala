package graft

import graft.model.EntryType
import graft.sources.{Extractors, Mp4, VectorFile}

/** GeoJSON vector-layer + MP4 header extraction. */
class VectorVideoSpec extends SparkSuite {

  private val geojson =
    """{"type":"FeatureCollection","features":[
      |{"type":"Feature","geometry":{"type":"Point","coordinates":[-91.5,46.5]},"properties":{}},
      |{"type":"Feature","geometry":{"type":"Polygon","coordinates":[[[-92.0,46.0],[-91.0,46.0],[-91.0,47.0],[-92.0,46.0]]]},"properties":{}}
      |]}""".stripMargin.getBytes("UTF-8")

  test("geojson vector meta: feature count, types, extent") {
    val m = VectorFile.sniffGeoJson(geojson).get
    assert(m.featureCount === 2)
    assert(m.geometryTypes.toSet === Set("Point", "Polygon"))
    val (w, s, e, n) = m.bbox.get
    assert(w === -92.0 && s === 46.0 && e === -91.0 && n === 47.0)
    assert(VectorFile.sniffGeoJson("""{"a": 1}""".getBytes) === None)
    assert(VectorFile.sniffGeoJson("plain text".getBytes) === None)
  }

  test("extraction: geojson -> Vector with envelope ring and center") {
    val ex = Extractors.extract("areas.geojson", geojson)
    assert(ex.entryType === EntryType.Vector)
    assert(ex.properties.contains("\"driver\":\"GeoJSON\""))
    assert(ex.properties.contains("\"featureCount\":2"))
    assert(ex.footprint.get.size === 5)
    assert(ex.lon === Some(-91.5) && ex.lat === Some(46.5))
  }

  /** Minimal MP4: ftyp + moov(mvhd + trak(tkhd) [+ udta(©xyz)]). */
  private def mp4Bytes(timescale: Long, duration: Long, w: Int, h: Int, gps: Option[String] = None): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = { out.write((v >> 24).toInt); out.write((v >> 16).toInt); out.write((v >> 8).toInt); out.write(v.toInt) }
    def tag(s: String): Unit = s.foreach(c => out.write(c))
    // ftyp
    w32(16); tag("ftyp"); tag("isom"); w32(512)
    // mvhd box: ver/flags + ctime + mtime + timescale + duration + rest zeroed
    val mvhd = new java.io.ByteArrayOutputStream()
    val mv = mvhd // alias
    def m32(v: Long): Unit = { mv.write((v >> 24).toInt); mv.write((v >> 16).toInt); mv.write((v >> 8).toInt); mv.write(v.toInt) }
    m32(0) // version+flags
    m32(0); m32(0) // ctime mtime
    m32(timescale); m32(duration)
    (0 until 20).foreach(_ => m32(0))
    val mvhdBytes = mvhd.toByteArray
    // tkhd box: ver/flags + 80 bytes payload; width/height 16.16 at offsets 76/80
    val tk = new Array[Byte](84)
    def tk32(i: Int, v: Long): Unit = { tk(i) = (v >> 24).toByte; tk(i + 1) = (v >> 16).toByte; tk(i + 2) = (v >> 8).toByte; tk(i + 3) = v.toByte }
    tk32(76, w.toLong << 16); tk32(80, h.toLong << 16)
    val tkhdSize = 8 + tk.length
    val trakSize = 8 + tkhdSize
    val mvhdSize = 8 + mvhdBytes.length
    val gpsBytes = gps.map(_.getBytes("UTF-8"))
    val xyzSize = gpsBytes.map(g => 8 + 4 + g.length).getOrElse(0)
    val udtaSize = gpsBytes.map(_ => 8 + xyzSize).getOrElse(0)
    val moovSize = 8 + mvhdSize + trakSize + udtaSize
    w32(moovSize); tag("moov")
    w32(mvhdSize); tag("mvhd"); out.write(mvhdBytes)
    w32(trakSize); tag("trak")
    w32(tkhdSize); tag("tkhd"); out.write(tk)
    gpsBytes.foreach { g =>
      w32(udtaSize); tag("udta")
      w32(xyzSize); out.write(0xa9); tag("xyz")
      out.write(g.length >> 8); out.write(g.length & 0xff) // strlen
      out.write(0x15); out.write(0xc7) // lang code
      out.write(g)
    }
    out.toByteArray
  }

  /** Minimal .shp main-file bytes per the public ESRI spec. */
  private def shpBytes(records: Seq[(Int, Array[Double])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def be32(v: Long): Unit = { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }
    def le32(v: Long): Unit = { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
    def leD(v: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach(k => w8(((bits >> (8 * k)) & 0xff).toInt))
    }
    // header: code 9994 BE, 5 unused, length, version 1000 LE, type LE, bbox, 4 zero ranges
    be32(9994); (0 until 5).foreach(_ => be32(0)); be32(0)
    le32(1000); le32(records.headOption.map(_._1.toLong).getOrElse(0L))
    leD(0); leD(0); leD(0); leD(0) // header bbox left zero: reader must union records
    (0 until 4).foreach(_ => leD(0))
    records.zipWithIndex.foreach { case ((tpe, vals), idx) =>
      val contentBytes = 4 + vals.length * 8
      be32(idx + 1L); be32(contentBytes / 2L)
      le32(tpe.toLong); vals.foreach(leD)
    }
    out.toByteArray
  }

  test("shapefile: header + record walk gives count, types, union extent") {
    // polygon record layout: bbox(4) numParts numPoints... — the reader
    // only consumes the bbox, so pad with zeros for parts/points
    val shp = shpBytes(Seq(
      (5, Array(1.0, 2.0, 4.0, 6.0, 0.0)), // polygon bbox (1,2)-(4,6)
      (5, Array(-3.0, 0.5, 2.0, 3.0, 0.0)), // polygon bbox (-3,0.5)-(2,3)
      (1, Array(10.0, -1.0)) // point (10, -1)
    ))
    val v = graft.sources.VectorFile.sniffShapefile(shp).get
    assert(v.driver === "ESRI Shapefile")
    assert(v.featureCount === 3)
    assert(v.geometryTypes === Seq("Polygon", "Point"))
    assert(v.bbox === Some((-3.0, -1.0, 10.0, 6.0)))
  }

  test("extraction: .shp -> Vector with the same layer shape as GeoJSON") {
    val shp = shpBytes(Seq((3, Array(0.0, 0.0, 5.0, 5.0, 0.0)))) // polyline bbox
    val ex = Extractors.extract("layers/roads.shp", shp)
    assert(ex.entryType === EntryType.Vector)
    assert(ex.properties.contains("\"driver\":\"ESRI Shapefile\""))
    assert(ex.properties.contains("\"featureCount\":1"))
    assert(ex.properties.contains("\"geometryTypes\":[\"LineString\"]"))
    assert(ex.footprint.isDefined && ex.footprint.get.size === 5)
    assert(ex.lon === Some(2.5) && ex.lat === Some(2.5))
    // random bytes are NOT a shapefile
    assert(graft.sources.VectorFile.sniffShapefile("garbage-bytes-here-x".getBytes) === None)
  }

  test("mp4 header: duration + dimensions") {
    val m = Mp4.sniff(mp4Bytes(timescale = 1000, duration = 12500, w = 1920, h = 1080)).get
    assert(m.durationMs === 12500L)
    assert(m.width === 1920 && m.height === 1080)
    assert(Mp4.sniff("RIFF....".getBytes) === None)
  }

  test("extraction: mp4 -> Video with duration properties") {
    val ex = Extractors.extract("clip.mp4", mp4Bytes(600, 3000, 1280, 720))
    assert(ex.entryType === EntryType.Video)
    assert(ex.properties.contains("\"duration\":5000")) // 3000/600 = 5 s
    assert(ex.properties.contains("\"width\":1280"))
  }

  test("tileset.json -> Tiles3D with geometricError") {
    val tileset = """{"asset":{"version":"1.0"},"geometricError":500.5,"root":{}}""".getBytes
    assert(VectorFile.sniffTileset(tileset) === Some(500.5))
    val ex = Extractors.extract("tileset.json", tileset)
    assert(ex.entryType === EntryType.Tiles3D)
    assert(ex.properties.contains("\"geometricError\":500.5"))
    // a plain JSON config is NOT a tileset
    assert(VectorFile.sniffTileset("""{"name":"config"}""".getBytes) === None)
    assert(Extractors.extract("conf.json", """{"name":"config"}""".getBytes).entryType === EntryType.Generic)
  }

  test("gps atom upgrades Video -> GeoVideo with geotag") {
    val withGps = mp4Bytes(600, 3000, 1280, 720, gps = Some("+46.8420-091.9940/"))
    val m = Mp4.sniff(withGps).get
    assert(m.lat === Some(46.842) && m.lon === Some(-91.994))
    val ex = Extractors.extract("flight.mp4", withGps)
    assert(ex.entryType === EntryType.GeoVideo)
    assert(ex.lat === Some(46.842) && ex.lon === Some(-91.994))
  }
}
