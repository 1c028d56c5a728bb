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

  test("b3dm: header layout, 8-byte GLB alignment, feature table round-trip") {
    import graft.sources.{Mesh3d, Tiles3d}
    val glb = Mesh3d.writeMeshGlb(Array(0f, 0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f), Array(0, 1, 2))
    val b3dm = Tiles3d.writeB3dm(glb, batchLength = 0)
    assert(new String(b3dm, 0, 4, "US-ASCII") === "b3dm")
    assert(b3dm.length % 8 === 0)
    val bb = java.nio.ByteBuffer.wrap(b3dm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(4)
    assert(bb.getInt === 1) // version
    assert(bb.getInt === b3dm.length) // byteLength
    val ftLen = bb.getInt
    assert((28 + ftLen) % 8 === 0) // GLB starts 8-aligned
    val (ftJson, glbBack) = Tiles3d.readB3dm(b3dm)
    assert(ftJson === """{"BATCH_LENGTH":0}""")
    assert(java.util.Arrays.equals(glbBack, glb))
    // corrupt: wrong magic and truncation are named errors
    intercept[IllegalArgumentException](Tiles3d.readB3dm("i3dm".getBytes ++ new Array[Byte](32)))
    intercept[IllegalArgumentException](Tiles3d.readB3dm(b3dm.take(20)))
  }

  test("GLB mesh write/read: bit-exact positions and indices; json chunk valid") {
    import graft.sources.Mesh3d
    val pos = Array.tabulate(30)(i => (i * 7 % 23).toFloat)
    val idx = Array.tabulate(9)(i => i % 10)
    val glb = Mesh3d.writeMeshGlb(pos, idx)
    assert(glb.length % 4 === 0)
    // our own GLB parses through the existing reader faces
    val json = Mesh3d.glbJson(glb)
    assert(json.contains("\"POSITION\":1"))
    assert(Mesh3d.gltfDependencies(json).isEmpty) // embedded buffer, no URIs
    val (pos2, idx2) = Mesh3d.readMeshGlb(glb)
    assert(pos2.toSeq === pos.toSeq)
    assert(idx2.toSeq === idx.toSeq)
    // uint16-indexed GLBs from other producers read too
    val json16 = json.replace("\"componentType\":5125", "\"componentType\":5123")
    val ib = java.nio.ByteBuffer.allocate(idx.length * 2 + pos.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    idx.foreach(i => ib.putShort(i.toShort))
    pos.foreach(ib.putFloat)
    // rebuild views for 2-byte indices
    val json16v = json16
      .replace(s""""byteLength":${idx.length * 4},"target":34963""", s""""byteLength":${idx.length * 2},"target":34963""")
      .replace(s""""byteOffset":${idx.length * 4}""", s""""byteOffset":${idx.length * 2}""")
      .replace(s""""buffers":[{"byteLength":${idx.length * 4 + pos.length * 4}}]""", s""""buffers":[{"byteLength":${idx.length * 2 + pos.length * 4}}]""")
    val glb16 = Mesh3d.writeGlb(json16v, ib.array())
    val (p16, i16) = Mesh3d.readMeshGlb(glb16)
    assert(p16.toSeq === pos.toSeq && i16.toSeq === idx.toSeq)
  }

  test("complete self-produced 3D-tiles archive: b3dm payloads survive the .3tz cycle") {
    import graft.sources.{Mesh3d, Tiles3d}
    val tiles = (0 until 3).map { t =>
      val pos = Array.tabulate(12)(i => (i + t * 100).toFloat)
      val idx = Array(0, 1, 2, 1, 2, 3)
      s"tiles/$t.b3dm" -> Tiles3d.writeB3dm(Mesh3d.writeMeshGlb(pos, idx))
    }
    val ts = Tiles3d.tilesetJson(-92.0, 46.8, -91.9, 46.9, 180.0, 220.0, 64.0, tiles.map(_._1))
    val tz = Tiles3d.write3tz(ts, tiles)
    assert(Tiles3d.from3tz(tz).exists(_.georeferenced))
    tiles.foreach { case (name, payload) =>
      val back = Tiles3d.readZipEntry(tz, name).get
      assert(java.util.Arrays.equals(back, payload), name)
      val (_, glb) = Tiles3d.readB3dm(back)
      val (pos2, _) = Mesh3d.readMeshGlb(glb)
      val t = name.stripPrefix("tiles/").stripSuffix(".b3dm").toInt
      assert(pos2(0) === (t * 100).toFloat)
    }
  }
}
