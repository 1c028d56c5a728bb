package graft

import graft.model.EntryType
import graft.sources.{Extractors, GeoTiff}

/** GeoTIFF header parse + Image-vs-GeoRaster dispatch — mirrors the
  * reference's raster fingerprint rule (`entry.cpp:1045-1062`) and
  * footprint math (`entry.cpp:368-389`).
  */
class GeoTiffSpec extends SparkSuite {

  /** Minimal little-endian TIFF: width/height (+ optional pixel scale,
    * tiepoint and geokeys). */
  private def tiffBytes(
      width: Int,
      height: Int,
      geo: Boolean,
      originLon: Double = -92.0,
      originLat: Double = 47.0,
      pixelDeg: Double = 0.001
  ): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit = { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
    def f64(v: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach(k => w8(((bits >> (8 * k)) & 0xff).toInt))
    }
    out.write('I'); out.write('I'); w16(42); w32(8)
    val nTags = if (geo) 5 else 2
    val ifdSize = 2 + nTags * 12 + 4
    val scaleOff = 8 + ifdSize
    val tieOff = scaleOff + 24
    w16(nTags)
    def tag(id: Int, tpe: Int, count: Long, value: Long): Unit = { w16(id); w16(tpe); w32(count); w32(value) }
    tag(256, 3, 1, width)
    tag(257, 3, 1, height)
    if (geo) {
      tag(33550, 12, 3, scaleOff)
      tag(33922, 12, 6, tieOff)
      tag(34735, 3, 4, 0) // geokey directory presence
    }
    w32(0)
    if (geo) {
      f64(pixelDeg); f64(pixelDeg); f64(0.0) // scale x, y, z
      f64(0.0); f64(0.0); f64(0.0); f64(originLon); f64(originLat) // tiepoint (0,0) -> origin; z dropped
    }
    out.toByteArray
  }

  test("georeferenced tiff: geotransform from scale + tiepoint") {
    val m = GeoTiff.sniff(tiffBytes(1000, 800, geo = true)).get
    assert(m.width === 1000 && m.height === 800)
    assert(m.georeferenced)
    val gt = m.geotransform.get
    assert(gt(0) === -92.0 && gt(3) === 47.0)
    assert(gt(1) === 0.001 && gt(5) === -0.001)
    val (ring, center) = m.footprint.get
    assert(ring.size === 5 && ring.head === ring.last)
    assert(math.abs(center._1 - (-91.5)) < 1e-9) // -92 + 500*0.001
    assert(math.abs(center._2 - 46.6) < 1e-9) // 47 - 400*0.001
  }

  /** TIFF with a REAL GeoKeyDirectory naming a projected CRS; scale and
    * tiepoint are in that CRS's meters. */
  private def projectedTiffBytes(
      width: Int,
      height: Int,
      epsg: Int,
      originE: Double,
      originN: Double,
      pixelM: Double
  ): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit = { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
    def f64(v: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach(k => w8(((bits >> (8 * k)) & 0xff).toInt))
    }
    out.write('I'); out.write('I'); w16(42); w32(8)
    val nTags = 5
    val ifdSize = 2 + nTags * 12 + 4
    val scaleOff = 8 + ifdSize
    val tieOff = scaleOff + 24
    val keysOff = tieOff + 48
    w16(nTags)
    def tag(id: Int, tpe: Int, count: Long, value: Long): Unit = { w16(id); w16(tpe); w32(count); w32(value) }
    tag(256, 3, 1, width)
    tag(257, 3, 1, height)
    tag(33550, 12, 3, scaleOff)
    tag(33922, 12, 6, tieOff)
    tag(34735, 3, 12, keysOff) // header + 2 keys
    w32(0)
    f64(pixelM); f64(pixelM); f64(0.0)
    f64(0.0); f64(0.0); f64(0.0); f64(originE); f64(originN)
    // GeoKeyDirectory: version 1.1.0, 2 keys: ModelType=1 (projected), ProjectedCSType=epsg
    Seq(1, 1, 0, 2, /*GTModelType*/ 1024, 0, 1, 1, /*ProjectedCSType*/ 3072, 0, 1, epsg).foreach(w16)
    out.toByteArray
  }

  test("projected tiff (EPSG:2193): footprint unprojects through NZTM to WGS84") {
    val proj = graft.geo.Crs.forEpsg(2193).get
    // 1000×800 px at 0.1 m/px anchored near the wro.tif golden area
    val (oe, on) = proj.forward(-41.06584, 175.40294)
    val m = GeoTiff.sniff(projectedTiffBytes(1000, 800, 2193, oe, on, 0.1)).get
    assert(m.epsg.contains(2193))
    assert(m.georeferenced)
    val (ring, center) = m.footprint.get
    assert(ring.size === 5 && ring.head === ring.last)
    // corners must surround the origin's lon/lat and stay within the
    // raster's ~100 m extent (≈0.0013° lon, 0.0009° lat)
    assert(math.abs(ring.head._1 - 175.40294) < 1e-6 && math.abs(ring.head._2 - -41.06584) < 1e-6)
    assert(math.abs(center._1 - 175.40294) < 0.002 && math.abs(center._2 - -41.06584) < 0.002)
    // center is mid-raster: 50 m east, 40 m south of origin
    val (clat, clon) = proj.inverse(oe + 50.0, on - 40.0)
    assert(math.abs(center._1 - clon) < 1e-9 && math.abs(center._2 - clat) < 1e-9)
    assert(GeoTiff.properties(m).contains("\"epsg\":2193"))
  }

  test("projected tiff (EPSG:31370): footprint unprojects through Belgian Lambert 72") {
    val proj = graft.geo.Crs.forEpsg(31370).get
    val (oe, on) = proj.forward(50.69212, 4.34276)
    val m = GeoTiff.sniff(projectedTiffBytes(400, 300, 31370, oe, on, 0.5)).get
    assert(m.epsg.contains(31370))
    val (_, center) = m.footprint.get
    val (clat, clon) = proj.inverse(oe + 100.0, on - 75.0)
    assert(math.abs(center._1 - clon) < 1e-9 && math.abs(center._2 - clat) < 1e-9)
  }

  test("plain tiff: not georeferenced") {
    val m = GeoTiff.sniff(tiffBytes(64, 64, geo = false)).get
    assert(!m.georeferenced && m.geotransform.isEmpty)
    assert(GeoTiff.sniff("nope".getBytes) === None)
  }

  test("dispatch: geo tiff -> GeoRaster with footprint; bare tiff -> Image") {
    val geo = Extractors.extract("ortho.tif", tiffBytes(1000, 800, geo = true))
    assert(geo.entryType === EntryType.GeoRaster)
    assert(geo.footprint.isDefined)
    assert(geo.lon.isDefined && math.abs(geo.lon.get - (-91.5)) < 1e-9)
    assert(geo.properties.contains("\"geotransform\":[-92"))
    val plain = Extractors.extract("scan.tif", tiffBytes(64, 64, geo = false))
    assert(plain.entryType === EntryType.Image)
  }
}
