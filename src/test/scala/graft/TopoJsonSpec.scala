package graft

import java.nio.file.Files

import graft.sources.{Extractors, Shz, TopoJson}
import graft.model.EntryType

/** TopoJSON reader pinned against the specification's own canonical
  * example pair (topojson/topojson-specification §1: the plain and
  * quantized encodings of the GeoJSON-spec example collection — exact
  * expected coordinates), plus the spec's structural rules: ones'-
  * complement arc reversal, junction dedup with equality enforcement,
  * ring closure, transform application to Point coordinates, and
  * named refusals for malformed input. No TopoJSON producer exists in
  * this container (python `topojson` absent, no node topojson-*
  * modules, no GDAL) — the spec examples are the conformance anchor.
  *
  * Also: zipped shapefiles (`.shz` / `.shp.zip`, the GDAL 3.1
  * container spelling listed by `entry.cpp:1034`) route through the
  * shapefile sniff, and `dwg` classifies as Vector by extension
  * exactly like the reference (which cannot decode it either — GDAL
  * needs a proprietary toolkit; recognition without decode IS the
  * reference behavior).
  */
class TopoJsonSpec extends SparkSuite {

  // The spec's unquantized example (its LineString/Polygon/Point are
  // the GeoJSON specification's example features).
  private val plainDoc =
    """{
      |  "type": "Topology",
      |  "objects": {
      |    "example": {
      |      "type": "GeometryCollection",
      |      "geometries": [
      |        {"type": "Point", "properties": {"prop0": "value0"}, "coordinates": [102, 0.5]},
      |        {"type": "LineString", "properties": {"prop0": "value0", "prop1": 0}, "arcs": [0]},
      |        {"type": "Polygon", "properties": {"prop0": "value0"}, "arcs": [[1]]}
      |      ]
      |    }
      |  },
      |  "arcs": [
      |    [[102, 0], [103, 1], [104, 0], [105, 1]],
      |    [[100, 0], [101, 0], [101, 1], [100, 1], [100, 0]]
      |  ]
      |}""".stripMargin.getBytes("UTF-8")

  // The same topology quantized at Q=10000 over x:[100,105] y:[0,1] —
  // the spec's quantized example: delta-encoded integer arcs + the
  // transform that maps them back.
  private val quantDoc =
    """{
      |  "type": "Topology",
      |  "transform": {
      |    "scale": [0.0005000500050005, 0.00010001000100010001],
      |    "translate": [100, 0]
      |  },
      |  "objects": {
      |    "example": {
      |      "type": "GeometryCollection",
      |      "geometries": [
      |        {"type": "Point", "properties": {"prop0": "value0"}, "coordinates": [4000, 5000]},
      |        {"type": "LineString", "properties": {"prop0": "value0", "prop1": 0}, "arcs": [0]},
      |        {"type": "Polygon", "properties": {"prop0": "value0"}, "arcs": [[1]]}
      |      ]
      |    }
      |  },
      |  "arcs": [
      |    [[4000, 0], [1999, 9999], [2000, -9999], [2000, 9999]],
      |    [[0, 0], [1999, 0], [0, 9999], [-1999, 0], [0, -9999]]
      |  ]
      |}""".stripMargin.getBytes("UTF-8")

  test("spec plain example decodes to the GeoJSON example coordinates exactly") {
    val t = TopoJson.decode(plainDoc)
    assert(t.transform.isEmpty)
    assert(TopoJson.line(t, Seq(0)) ===
      Vector((102.0, 0.0), (103.0, 1.0), (104.0, 0.0), (105.0, 1.0)))
    val fs = TopoJson.features(plainDoc)
    assert(fs.map(_.geomType) === Seq("Point", "LineString", "Polygon"))
    assert(fs(0).bbox === Some((102.0, 0.5, 102.0, 0.5)))
    assert(fs(2).nPoints === 5L)
    assert(fs(2).bbox === Some((100.0, 0.0, 101.0, 1.0)))
    assert(fs.forall(_.objectName == "example"))
    assert(fs.map(_.fid) === Seq(0L, 1L, 2L))
    assert(fs.map(_.nProps) === Seq(1, 2, 1))
  }

  test("spec quantized example: delta cumsum + transform reproduce the plain coordinates") {
    val t = TopoJson.decode(quantDoc)
    val sx = 0.0005000500050005; val sy = 0.00010001000100010001
    val line = TopoJson.line(t, Seq(0))
    // exact double arithmetic of the declared transform
    val expected = Vector(4000, 5999, 7999, 9999).map(_.toDouble)
      .zip(Vector(0, 9999, 0, 9999).map(_.toDouble))
      .map { case (gx, gy) => (gx * sx + 100.0, gy * sy + 0.0) }
    assert(line === expected)
    // and within quantization error of the unquantized truth
    val plain = Vector((102.0, 0.0), (103.0, 1.0), (104.0, 0.0), (105.0, 1.0))
    line.zip(plain).foreach { case ((x, y), (px, py)) =>
      assert(math.abs(x - px) < 5.1e-4 && math.abs(y - py) < 1.1e-4)
    }
    // Point coordinates map through the same transform
    val fs = TopoJson.features(quantDoc)
    assert(math.abs(fs(0).bbox.get._1 - (4000 * sx + 100.0)) < 1e-12)
    assert(math.abs(fs(0).bbox.get._2 - 5000 * sy) < 1e-12)
    // polygon ring closes exactly at (100, 0)
    val ringPts = TopoJson.geometry(t, graft.core.MiniJson.obj(graft.core.MiniJson.parse(
      """{"type":"Polygon","arcs":[[1]]}"""))).points
    assert(ringPts.head === ringPts.last)
    assert(ringPts.head === (100.0, 0.0))
  }

  test("ones'-complement arc reversal and junction dedup") {
    val t = TopoJson.decode(plainDoc)
    assert(TopoJson.line(t, Seq(-1)) === TopoJson.line(t, Seq(0)).reverse)
    // split arc 0 into two and stitch: junction position appears once
    val doc =
      """{"type":"Topology","objects":{"o":{"type":"LineString","arcs":[0,1]}},
        |"arcs":[[[102,0],[103,1]],[[103,1],[104,0],[105,1]]]}""".stripMargin.getBytes("UTF-8")
    val t2 = TopoJson.decode(doc)
    assert(TopoJson.line(t2, Seq(0, 1)) ===
      Vector((102.0, 0.0), (103.0, 1.0), (104.0, 0.0), (105.0, 1.0)))
    // and reversed stitching: ~1 then ~0
    assert(TopoJson.line(t2, Seq(-2, -1)) ===
      Vector((105.0, 1.0), (104.0, 0.0), (103.0, 1.0), (102.0, 0.0)))
  }

  test("malformed input raises named errors") {
    def err(doc: String): String =
      intercept[TopoJson.TopoJsonError] {
        TopoJson.features(doc.getBytes("UTF-8"))
      }.getMessage
    // not a topology
    assert(err("""{"type":"FeatureCollection","features":[]}""").contains("Topology"))
    // dangling arc index
    assert(err("""{"type":"Topology","objects":{"o":{"type":"LineString","arcs":[3]}},
                 |"arcs":[[[0,0],[1,1]]]}""".stripMargin).contains("out of range"))
    // arc with one position
    assert(err("""{"type":"Topology","objects":{"o":{"type":"LineString","arcs":[0]}},
                 |"arcs":[[[0,0]]]}""".stripMargin).contains("positions"))
    // junction mismatch (spec: first position of a subsequent arc MUST
    // equal the last position of the previous arc)
    assert(err("""{"type":"Topology","objects":{"o":{"type":"LineString","arcs":[0,1]}},
                 |"arcs":[[[0,0],[1,1]],[[9,9],[2,2]]]}""".stripMargin).contains("junction"))
    // unclosed ring
    assert(err("""{"type":"Topology","objects":{"o":{"type":"Polygon","arcs":[[0]]}},
                 |"arcs":[[[0,0],[1,0],[1,1],[0,1]]]}""".stripMargin).contains("unclosed"))
    // transform without scale
    assert(err("""{"type":"Topology","transform":{"translate":[0,0]},
                 |"objects":{},"arcs":[]}""".stripMargin).contains("scale"))
    // unknown geometry type
    assert(err("""{"type":"Topology","objects":{"o":{"type":"Circle","arcs":[0]}},
                 |"arcs":[[[0,0],[1,1]]]}""".stripMargin).contains("unknown geometry"))
    // deep type errors (non-object geometry member, boolean id) are
    // still the NAMED TopoJsonError, not a leaked MiniJson exception
    err("""{"type":"Topology","objects":{"o":{"type":"GeometryCollection","geometries":[42]}},"arcs":[]}""")
    err("""{"type":"Topology","objects":{"o":{"type":"Point","coordinates":[1,2],"id":true}},"arcs":[]}""")
  }

  test("crafted deep nesting raises the named parse error, never a StackOverflowError") {
    // 100k-deep array bomb: must fail as the NAMED json error (an
    // IllegalArgumentException the tolerant faces catch), not an Error
    val bomb = "[" * 100000
    val e = intercept[IllegalArgumentException] { graft.core.MiniJson.parse(bomb) }
    assert(e.getMessage.contains("depth"))
    // the tolerant fingerprint face absorbs it
    assert(TopoJson.meta(("""{"type":"Topology","objects":""" + bomb).getBytes("UTF-8")) === None)
    // and the strict face raises the named TopoJsonError
    intercept[TopoJson.TopoJsonError] {
      TopoJson.features(("""{"type":"Topology","objects":""" + bomb).getBytes("UTF-8"))
    }
    // sane real-world nesting is untouched
    val deep = ("[" * 100) + "1" + ("]" * 100)
    assert(graft.core.MiniJson.parse(deep) !== null)
  }

  test("MultiLineString / MultiPolygon / nested GeometryCollection flatten") {
    val doc =
      """{"type":"Topology","objects":{
        |  "m": {"type":"MultiLineString","arcs":[[0],[-1]]},
        |  "p": {"type":"MultiPolygon","arcs":[[[1]]]},
        |  "c": {"type":"GeometryCollection","geometries":[
        |     {"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[1,2]}]},
        |     {"type":"MultiPoint","coordinates":[[3,4],[5,6]]}]}
        |},
        |"arcs":[[[102,0],[103,1]],[[100,0],[101,0],[101,1],[100,0]]]}""".stripMargin.getBytes("UTF-8")
    val fs = TopoJson.features(doc)
    // objects sort by name: c's two members, then m, then p
    assert(fs.map(f => (f.objectName, f.geomType, f.nPoints)) === Seq(
      ("c", "GeometryCollection", 1L),
      ("c", "MultiPoint", 2L),
      ("m", "MultiLineString", 4L),
      ("p", "MultiPolygon", 4L)))
    assert(fs(3).bbox === Some((100.0, 0.0, 101.0, 1.0)))
  }

  test("meta + fingerprint: .topojson classifies as Vector with layer properties") {
    val m = TopoJson.meta(plainDoc).get
    assert(m.driver === "TopoJSON" && m.featureCount === 3L)
    assert(m.geometryTypes === Seq("Point", "LineString", "Polygon"))
    assert(m.bbox === Some((100.0, 0.0, 105.0, 1.0)))
    assert(Extractors.fingerprint("ex.topojson", plainDoc) === EntryType.Vector)
    // garbage with the magic word is tolerated by the sniff chain
    assert(TopoJson.meta(""" {"type":"Topology", broken""".getBytes("UTF-8")) === None)
    // extension-only classification (reference entry.cpp:1034)
    assert(EntryType.fromExtension("a.topojson") === EntryType.Vector)
    assert(EntryType.fromExtension("a.dwg") === EntryType.Vector)
    assert(EntryType.fromExtension("a.shz") === EntryType.Vector)
  }

  test("featureTable Spark face: one row per feature with envelope columns") {
    val dir = Files.createTempDirectory("topojson").toFile
    Files.write(new java.io.File(dir, "a.topojson").toPath, plainDoc)
    Files.write(new java.io.File(dir, "b.topojson").toPath, quantDoc)
    val df = TopoJson.featureTable(spark, dir.getAbsolutePath)
    val rows = df.collect()
    assert(rows.length === 6)
    val a = df.where("path like '%a.topojson%' and geom_type = 'Polygon'").collect()(0)
    assert(a.getAs[Long]("n_points") === 5L)
    assert(a.getAs[Double]("minx") === 100.0 && a.getAs[Double]("maxy") === 1.0)
  }

  // ---- zipped shapefile (.shz / .shp.zip) --------------------------------

  private def shpBytes(points: Seq[(Double, Double)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def be32(v: Long): Unit = { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }
    def le32(v: Long): Unit = { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
    def leD(v: Double): Unit = {
      var bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach { _ => w8((bits & 0xff).toInt); bits >>= 8 }
    }
    val fileWords = (100 + points.length * (8 + 20)) / 2
    be32(9994); (0 until 5).foreach(_ => be32(0)); be32(fileWords.toLong)
    le32(1000); le32(1) // version, shape type Point
    leD(points.map(_._1).min); leD(points.map(_._2).min)
    leD(points.map(_._1).max); leD(points.map(_._2).max)
    (0 until 4).foreach(_ => leD(0.0)) // z/m ranges
    points.zipWithIndex.foreach { case ((x, y), i) =>
      be32((i + 1).toLong); be32(10) // content = 20 bytes = 10 words
      le32(1); leD(x); leD(y)
    }
    out.toByteArray
  }

  private def zipOf(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, bytes) =>
      val e = new java.util.zip.ZipEntry(name); e.setTime(0L)
      zo.putNextEntry(e); zo.write(bytes); zo.closeEntry()
    }
    zo.close(); bos.toByteArray
  }

  test(".shz and .shp.zip route to the shapefile sniff through the container") {
    val shp = shpBytes(Seq((10.0, 20.0), (11.0, 21.0), (12.0, 19.5)))
    val container = zipOf("layer.shp" -> shp, "layer.dbf" -> Array[Byte](3, 0, 0, 0))
    for (name <- Seq("layer.shz", "layer.shp.zip", "UPPER.SHZ")) {
      val m = Shz.meta(name, container)
      assert(m.isDefined, name)
      assert(m.get.driver === "ESRI Shapefile")
      assert(m.get.featureCount === 3L)
      assert(m.get.geometryTypes === Seq("Point"))
      assert(m.get.bbox === Some((10.0, 19.5, 12.0, 21.0)))
    }
    assert(Extractors.fingerprint("layer.shz", container) === EntryType.Vector)
    // wrong extension: the container alone is NOT a vector signal
    assert(Shz.meta("layer.zip", container) === None)
    // two .shp inside: ambiguous, refuse to claim
    assert(Shz.meta("two.shz", zipOf("a.shp" -> shp, "b.shp" -> shp)) === None)
    // no .shp inside
    assert(Shz.meta("none.shz", zipOf("a.txt" -> "x".getBytes)) === None)
    // not a zip at all
    assert(Shz.meta("x.shz", shp) === None)
    // truncated container tolerated (sniff face returns None)
    assert(Shz.meta("t.shz", container.take(30)) === None)
  }
}
