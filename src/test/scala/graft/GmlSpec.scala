package graft

import java.nio.file.Files

import graft.sources.Gml

/** Pure-JVM GML reader: featureMember (GML2) / featureMembers (GML3.1)
  * / member (WFS2) walks, coordinates vs pos/posList encodings,
  * srsDimension-3 stepping, simple-property extraction, gml:id, and
  * the executor-side featureTable with envelope columns.
  */
class GmlSpec extends SparkSuite {

  private val gml2Doc =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<ogr:FeatureCollection xmlns:ogr="http://ogr.maptools.org/" xmlns:gml="http://www.opengis.net/gml">
      |  <gml:featureMember>
      |    <ogr:site fid="site.0">
      |      <ogr:name>pad-a</ogr:name>
      |      <ogr:grade>7</ogr:grade>
      |      <ogr:geometryProperty>
      |        <gml:Point><gml:coordinates>-122.35,47.62</gml:coordinates></gml:Point>
      |      </ogr:geometryProperty>
      |    </ogr:site>
      |  </gml:featureMember>
      |  <gml:featureMember>
      |    <ogr:site fid="site.1">
      |      <ogr:name>fence</ogr:name>
      |      <ogr:geometryProperty>
      |        <gml:Polygon><gml:outerBoundaryIs><gml:LinearRing>
      |          <gml:coordinates>-122.5,47.5 -122.1,47.5 -122.1,47.8 -122.5,47.8 -122.5,47.5</gml:coordinates>
      |        </gml:LinearRing></gml:outerBoundaryIs></gml:Polygon>
      |      </ogr:geometryProperty>
      |    </ogr:site>
      |  </gml:featureMember>
      |</ogr:FeatureCollection>""".stripMargin

  private val gml3Doc =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs/2.0" xmlns:gml="http://www.opengis.net/gml/3.2">
      |  <wfs:member>
      |    <app:track gml:id="t1" xmlns:app="http://example.com/app">
      |      <app:pilot>jordan</app:pilot>
      |      <app:geom>
      |        <gml:LineString srsName="urn:ogc:def:crs:EPSG::4326">
      |          <gml:posList srsDimension="3">-122.40 47.60 100 -122.30 47.65 110 -122.20 47.61 120</gml:posList>
      |        </gml:LineString>
      |      </app:geom>
      |    </app:track>
      |  </wfs:member>
      |  <gml:featureMembers>
      |    <app:marker gml:id="m1" xmlns:app="http://example.com/app">
      |      <app:geom><gml:Point><gml:pos>-121.9 47.3</gml:pos></gml:Point></app:geom>
      |    </app:marker>
      |    <app:marker gml:id="m2" xmlns:app="http://example.com/app">
      |      <app:geom><gml:MultiPoint>
      |        <gml:pointMember><gml:Point><gml:pos>-121.8 47.4</gml:pos></gml:Point></gml:pointMember>
      |        <gml:pointMember><gml:Point><gml:pos>-121.7 47.5</gml:pos></gml:Point></gml:pointMember>
      |      </gml:MultiPoint></app:geom>
      |    </app:marker>
      |  </gml:featureMembers>
      |</wfs:FeatureCollection>""".stripMargin

  test("GML2 featureMember: properties, coordinates encoding, polygon envelope") {
    val fs = Gml.features(gml2Doc.getBytes("UTF-8"))
    assert(fs.length === 2)
    assert(fs.head.typeName === "site")
    assert(fs.head.props === Map("name" -> "pad-a", "grade" -> "7"))
    assert(fs.head.geomType === Some("Point"))
    assert(fs.head.bbox === Some((-122.35, 47.62, -122.35, 47.62)))
    val fence = fs(1)
    assert(fence.geomType === Some("Polygon"))
    assert(fence.nPoints === 5)
    assert(fence.bbox === Some((-122.5, 47.5, -122.1, 47.8)))
  }

  test("GML3/WFS2: member + featureMembers, pos/posList, srsDimension 3, gml:id") {
    val fs = Gml.features(gml3Doc.getBytes("UTF-8"))
    assert(fs.length === 3)
    val track = fs.head
    assert(track.typeName === "track")
    assert(track.gmlId === Some("t1"))
    assert(track.props === Map("pilot" -> "jordan"))
    assert(track.nPoints === 3) // srsDimension=3 steps over altitude
    assert(track.bbox === Some((-122.40, 47.60, -122.20, 47.65)))
    assert(fs(1).gmlId === Some("m1"))
    val multi = fs(2)
    assert(multi.geomType === Some("MultiPoint"))
    assert(multi.nPoints === 2)
    assert(multi.bbox === Some((-121.8, 47.4, -121.7, 47.5)))
  }

  test("meta: driver, counts, union envelope; non-GML bytes refused") {
    val m = Gml.meta(gml2Doc.getBytes("UTF-8")).get
    assert(m.driver === "GML")
    assert(m.featureCount === 2)
    assert(m.geometryTypes.toSet === Set("Point", "Polygon"))
    assert(m.bbox === Some((-122.5, 47.5, -122.1, 47.8)))
    assert(Gml.meta("just some text".getBytes).isEmpty)
    assert(Gml.meta("""{"type":"FeatureCollection"}""".getBytes).isEmpty)
  }

  test("malformed XML yields empty, not a throw") {
    assert(Gml.features("<gml:featureMember><broken".getBytes).isEmpty)
  }

  test("featureTable: executor-side parse over a directory of .gml files") {
    val dir = Files.createTempDirectory("gmlspec")
    try {
      Files.write(dir.resolve("a.gml"), gml2Doc.getBytes("UTF-8"))
      Files.write(dir.resolve("b.gml"), gml3Doc.getBytes("UTF-8"))
      val df = Gml.featureTable(spark, dir.toString)
      assert(df.count() === 5)
      val fence = df.filter(org.apache.spark.sql.functions.col("n_points") === 5).collect()
      assert(fence.length === 1 && fence.head.getAs[Double]("minx") === -122.5)
      // envelope columns are plain doubles: the env_intersects path applies
      val hits = df
        .filter(graft.core.Index.bboxIntersects(-122.45, 47.55, -122.25, 47.63))
        .collect()
        .map(_.getAs[String]("type_name"))
      assert(hits.contains("site") && hits.contains("track"))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }
}
