package graft

import graft.sources.Tiles3d

/** 3D Tiles info extraction over self-built .3tz fixtures: zip entry
  * walk, all three boundingVolume kinds, the reference's corner-radius
  * rule, ECEF→WGS84, and the local-frame (non-georeferenced) path.
  */
class Tiles3dSpec extends SparkSuite {

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  test("ecefToWgs84: equator/meridian anchor points") {
    val (lon0, lat0, alt0) = Tiles3d.ecefToWgs84(6378137.0 + 100.0, 0.0, 0.0)
    assert(math.abs(lon0) < 1e-9 && math.abs(lat0) < 1e-9 && math.abs(alt0 - 100.0) < 1e-6)
    val (lon90, lat90, _) = Tiles3d.ecefToWgs84(0.0, 6378137.0, 0.0)
    assert(math.abs(lon90 - 90.0) < 1e-9 && math.abs(lat90) < 1e-9)
  }

  test("region volume: radians to degrees, center + bounds") {
    val ts =
      """{"asset":{"version":"1.0"},"root":{"geometricError":500.0,
        |"boundingVolume":{"region":[-0.1,0.2,0.1,0.4,10.0,30.0]}}}""".stripMargin
    val i = Tiles3d.fromTilesetJson(ts).get
    assert(i.assetVersion === Some("1.0") && i.geometricError === Some(500.0))
    assert(i.georeferenced && i.hasBounds)
    assert(math.abs(i.west - (-0.1 * 57.29577951308232)) < 1e-12)
    assert(math.abs(i.centerLon) < 1e-12)
    assert(math.abs(i.centerLat - 0.3 * 57.29577951308232) < 1e-12)
    assert(i.centerAlt === 20.0)
  }

  test("box volume in ECEF: footprint from the corner radius; local frame stays ungeoreferenced") {
    // center at (a+50, 0, 0) → lon=lat=0, alt=50; half-axes 100/200/300 → r=374.17
    val a = 6378137.0
    val ts =
      s"""{"root":{"geometricError":12.0,"boundingVolume":{
         |"box":[${a + 50}, 0, 0, 100,0,0, 0,200,0, 0,0,300]}}}""".stripMargin
    val i = Tiles3d.fromTilesetJson(ts).get
    assert(i.georeferenced)
    assert(math.abs(i.centerLon) < 1e-9 && math.abs(i.centerLat) < 1e-9)
    val r = math.sqrt(100.0 * 100 + 200 * 200 + 300 * 300)
    assert(math.abs((i.north - i.centerLat) - r / 111320.0) < 1e-12)
    // engineering frame: near-origin center
    val local = Tiles3d.fromTilesetJson(
      """{"root":{"boundingVolume":{"box":[0,0,0, 10,0,0, 0,10,0, 0,0,10]}}}"""
    ).get
    assert(!local.georeferenced && !local.hasBounds)
  }

  test("sphere volume with a root transform: translation applies to the center") {
    val a = 6378137.0
    // identity rotation, translation moves the local origin onto the equator
    val t = s"[1,0,0,0, 0,1,0,0, 0,0,1,0, ${a + 25},0,0,1]"
    val ts =
      s"""{"root":{"transform":$t,"boundingVolume":{"sphere":[0,0,0,500]}}}"""
    val i = Tiles3d.fromTilesetJson(ts).get
    assert(i.georeferenced)
    assert(math.abs(i.centerLon) < 1e-9 && math.abs(i.centerLat) < 1e-9)
    assert(math.abs((i.east - i.centerLon) - 500.0 / 111320.0) < 1e-12)
  }

  test(".3tz zip walk finds tileset.json wherever it sits in the entry list") {
    val ts = """{"root":{"boundingVolume":{"region":[0.01,0.01,0.02,0.02]}}}"""
    val bytes = zip("models/a.b3dm" -> "xxxx", "tileset.json" -> ts, "readme.txt" -> "hi")
    val i = Tiles3d.from3tz(bytes).get
    assert(i.georeferenced)
    assert(Tiles3d.from3tz(zip("other.json" -> ts)) === None)
  }
}
