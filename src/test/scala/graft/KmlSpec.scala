package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.Kml

/** Pure-JVM KML/KMZ reader: Placemark walk under Document/Folder
  * nesting, namespace-prefixed tags, coordinates parsing, ExtendedData
  * attributes, MultiGeometry, KMZ unzip, and the executor-side
  * featureTable with envelope columns feeding the spatial filter path.
  */
class KmlSpec extends SparkSuite {
  import spark.implicits._

  private val kmlDoc =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<kml xmlns="http://www.opengis.net/kml/2.2">
      |<Document><name>survey</name>
      |  <Folder><name>markers</name>
      |    <Placemark>
      |      <name>takeoff</name>
      |      <ExtendedData>
      |        <Data name="alt"><value>120.5</value></Data>
      |        <Data name="crew"><value>alpha</value></Data>
      |      </ExtendedData>
      |      <Point><coordinates>-122.35,47.62,15</coordinates></Point>
      |    </Placemark>
      |    <Placemark>
      |      <name>flightline</name>
      |      <LineString><coordinates>
      |        -122.40,47.60,100 -122.30,47.65,100 -122.20,47.61,100
      |      </coordinates></LineString>
      |    </Placemark>
      |  </Folder>
      |  <Placemark>
      |    <name>boundary</name>
      |    <Polygon><outerBoundaryIs><LinearRing><coordinates>
      |      -122.5,47.5 -122.1,47.5 -122.1,47.8 -122.5,47.8 -122.5,47.5
      |    </coordinates></LinearRing></outerBoundaryIs></Polygon>
      |  </Placemark>
      |  <Placemark>
      |    <name>multi</name>
      |    <MultiGeometry>
      |      <Point><coordinates>-121.9,47.3</coordinates></Point>
      |      <Point><coordinates>-121.8,47.4</coordinates></Point>
      |    </MultiGeometry>
      |  </Placemark>
      |</Document>
      |</kml>""".stripMargin

  private val kmlPrefixed =
    """<?xml version="1.0"?>
      |<kml:kml xmlns:kml="http://www.opengis.net/kml/2.2">
      |<kml:Document>
      |  <kml:Placemark>
      |    <kml:name>prefixed</kml:name>
      |    <kml:ExtendedData><kml:SchemaData>
      |      <kml:SimpleData name="grade">7</kml:SimpleData>
      |    </kml:SchemaData></kml:ExtendedData>
      |    <kml:Point><kml:coordinates>10.5,-33.25</kml:coordinates></kml:Point>
      |  </kml:Placemark>
      |</kml:Document>
      |</kml:kml>""".stripMargin

  test("placemark walk: document order, names, geometry types, point counts, bboxes, ExtendedData") {
    val fs = Kml.features(kmlDoc.getBytes("UTF-8"))
    assert(fs.map(_.name) === Seq(Some("takeoff"), Some("flightline"), Some("boundary"), Some("multi")))
    assert(fs.map(_.geomType) === Seq(Some("Point"), Some("LineString"), Some("Polygon"), Some("MultiGeometry")))
    assert(fs.map(_.nPoints) === Seq(1L, 3L, 5L, 2L))
    assert(fs(0).bbox === Some((-122.35, 47.62, -122.35, 47.62)))
    assert(fs(1).bbox === Some((-122.40, 47.60, -122.20, 47.65)))
    assert(fs(2).bbox === Some((-122.5, 47.5, -122.1, 47.8)))
    assert(fs(3).bbox === Some((-121.9, 47.3, -121.8, 47.4)))
    assert(fs(0).props === Map("alt" -> "120.5", "crew" -> "alpha"))
    assert(fs(1).props === Map.empty)
  }

  test("namespace-prefixed documents and SchemaData/SimpleData attributes parse identically") {
    val fs = Kml.features(kmlPrefixed.getBytes("UTF-8"))
    assert(fs.length === 1)
    assert(fs.head.name === Some("prefixed"))
    assert(fs.head.geomType === Some("Point"))
    assert(fs.head.bbox === Some((10.5, -33.25, 10.5, -33.25)))
    assert(fs.head.props === Map("grade" -> "7"))
  }

  test("KMZ: first .kml zip entry wins; non-KML zips and malformed XML yield empty, not a throw") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("images/photo.txt"))
    z.write("not kml".getBytes)
    z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("doc.kml"))
    z.write(kmlDoc.getBytes("UTF-8"))
    z.closeEntry()
    z.close()
    val fs = Kml.features(bos.toByteArray)
    assert(fs.length === 4 && fs.head.name === Some("takeoff"))

    assert(Kml.features("<kml><Placemark><name>broken".getBytes) === Seq.empty)
    val emptyZip = { val b = new java.io.ByteArrayOutputStream(); val zz = new java.util.zip.ZipOutputStream(b); zz.putNextEntry(new java.util.zip.ZipEntry("a.txt")); zz.write(1); zz.closeEntry(); zz.close(); b.toByteArray }
    assert(Kml.features(emptyZip) === Seq.empty)
  }

  test("meta face: count, geometry types, union envelope (the computeStats numbers)") {
    val m = Kml.meta(kmlDoc.getBytes("UTF-8")).get
    assert(m.driver === "KML")
    assert(m.featureCount === 4L)
    assert(m.geometryTypes.toSet === Set("Point", "LineString", "Polygon", "MultiGeometry"))
    assert(m.bbox === Some((-122.5, 47.3, -121.8, 47.8)))
    assert(Kml.meta("plain text, nothing spatial".getBytes) === None)
  }

  test("featureTable: executor-side parse, envelope columns drive the env_intersects filter") {
    val dir = Files.createTempDirectory("graft_kml")
    try {
      Files.writeString(Paths.get(dir.toString, "survey.kml"), kmlDoc)
      val t = Kml.featureTable(spark, dir.toString + "/*.kml")
      assert(t.count() === 4)
      val boundary = t.filter($"name" === "boundary").head()
      assert(boundary.getAs[String]("geom_type") === "Polygon")
      assert(boundary.getAs[Double]("minx") === -122.5 && boundary.getAs[Double]("maxy") === 47.8)
      assert(t.filter($"name" === "takeoff").head().getAs[String]("props") === """{"alt":"120.5","crew":"alpha"}""")
      // spatial face: the query box around the multi-point placemark
      graft.plans.EnvExpressions.register(spark)
      val hits = t
        .filter(graft.plans.EnvExpressions.envIntersects($"minx", $"miny", $"maxx", $"maxy", -122.0, 47.0, -121.5, 47.45))
        .select($"name")
        .collect()
        .map(_.getString(0))
        .toSet
      assert(hits === Set("multi"), s"got $hits")
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("extractor dispatch: a .kml payload fingerprints as Vector with the KML driver") {
    val ex = graft.sources.Extractors.extract("survey.kml", kmlDoc.getBytes("UTF-8"))
    assert(ex.entryType === graft.model.EntryType.Vector)
    assert(ex.properties.contains("\"KML\"") || ex.properties.contains("KML"))
  }
}
