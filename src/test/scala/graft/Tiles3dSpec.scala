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

  test("write3tz round-trips: tileset.json region + contents through from3tz and the extractor") {
    import graft.sources.{Mzip, Tiles3d}
    val ts = Tiles3d.tilesetJson(
      west = -92.0, south = 46.8, east = -91.9, north = 46.9,
      minHeight = 180.0, maxHeight = 220.0,
      geometricError = 64.0,
      contents = Seq("tiles/0.b3dm", "tiles/1.b3dm"))
    val tz = Tiles3d.write3tz(ts, Seq(
      "tiles/0.b3dm" -> Array[Byte](1, 2, 3),
      "tiles/1.b3dm" -> Array[Byte](4, 5)))
    // deterministic packaging: same input, same bytes
    assert(java.util.Arrays.equals(tz, Tiles3d.write3tz(ts, Seq(
      "tiles/0.b3dm" -> Array[Byte](1, 2, 3),
      "tiles/1.b3dm" -> Array[Byte](4, 5)))))
    val info = Tiles3d.from3tz(tz).get
    assert(info.assetVersion.contains("1.0"))
    assert(info.geometricError.contains(64.0))
    assert(info.georeferenced && info.hasBounds)
    assert(math.abs(info.west - -92.0) < 1e-9 && math.abs(info.north - 46.9) < 1e-9)
    assert(math.abs(info.centerLon - -91.95) < 1e-9)
    // payloads intact through the archive
    val back = Mzip.unpack(tz).toMap
    assert(back("tiles/0.b3dm").toSeq == Seq[Byte](1, 2, 3))
    // extractor chain: a .3tz payload fingerprints as Tiles3D
    assert(graft.sources.Extractors.fingerprint("model.3tz", tz) == graft.model.EntryType.Tiles3D)
  }
}
