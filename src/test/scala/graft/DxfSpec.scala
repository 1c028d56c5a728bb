package graft

import java.nio.file.Files

import graft.sources.Dxf

/** Pure-JVM ASCII DXF reader: group-code pair walk, ENTITIES section
  * gating, POINT/LINE/LWPOLYLINE/POLYLINE+VERTEX/CIRCLE geometry,
  * closed flag (70 bit 1), layer/handle attributes, and the
  * executor-side featureTable.
  */
class DxfSpec extends SparkSuite {

  // a minimal but structurally honest ASCII DXF: HEADER section the
  // reader must skip, then ENTITIES with one of each supported kind
  private def dxf(entities: String): String =
    s"""0
       |SECTION
       |2
       |HEADER
       |9
       |$$ACADVER
       |1
       |AC1027
       |0
       |ENDSEC
       |0
       |SECTION
       |2
       |ENTITIES
       |$entities
       |0
       |ENDSEC
       |0
       |EOF
       |""".stripMargin

  private val doc = dxf(
    """0
      |POINT
      |5
      |A1
      |8
      |markers
      |10
      |12.5
      |20
      |-3.25
      |0
      |LINE
      |8
      |axes
      |10
      |0.0
      |20
      |0.0
      |11
      |10.0
      |21
      |5.0
      |0
      |LWPOLYLINE
      |8
      |parcels
      |90
      |4
      |70
      |1
      |10
      |1.0
      |20
      |1.0
      |10
      |4.0
      |20
      |1.0
      |10
      |4.0
      |20
      |3.0
      |10
      |1.0
      |20
      |3.0
      |0
      |CIRCLE
      |8
      |pads
      |10
      |100.0
      |20
      |50.0
      |40
      |2.5""".stripMargin
  )

  private val polylineDoc = dxf(
    """0
      |POLYLINE
      |8
      |legacy
      |66
      |1
      |0
      |VERTEX
      |8
      |legacy
      |10
      |7.0
      |20
      |8.0
      |0
      |VERTEX
      |8
      |legacy
      |10
      |9.0
      |20
      |12.0
      |0
      |SEQEND""".stripMargin
  )

  test("POINT/LINE/LWPOLYLINE/CIRCLE parse with layers, closed flag, envelopes") {
    val fs = Dxf.features(doc.getBytes("UTF-8"))
    assert(fs.map(_.entity) === Seq("POINT", "LINE", "LWPOLYLINE", "CIRCLE"))
    val Seq(pt, line, lwp, circle) = fs
    assert(pt.layer === Some("markers") && pt.handle === Some("A1"))
    assert(pt.bbox === Some((12.5, -3.25, 12.5, -3.25)))
    assert(line.bbox === Some((0.0, 0.0, 10.0, 5.0)) && line.nPoints === 2)
    assert(lwp.layer === Some("parcels") && lwp.closed && lwp.nPoints === 4)
    assert(lwp.bbox === Some((1.0, 1.0, 4.0, 3.0)))
    // circle bbox = center +- radius
    assert(circle.bbox === Some((97.5, 47.5, 102.5, 52.5)))
  }

  test("legacy POLYLINE + VERTEX + SEQEND folds vertices into one feature") {
    val fs = Dxf.features(polylineDoc.getBytes("UTF-8"))
    assert(fs.length === 1)
    assert(fs.head.entity === "POLYLINE" && fs.head.layer === Some("legacy"))
    assert(fs.head.nPoints === 2)
    assert(fs.head.bbox === Some((7.0, 8.0, 9.0, 12.0)))
  }

  test("meta: driver/count/types/extent; non-DXF refused; binary sentinel refused") {
    val m = Dxf.meta(doc.getBytes("UTF-8")).get
    assert(m.driver === "DXF")
    assert(m.featureCount === 4)
    assert(m.geometryTypes.toSet === Set("POINT", "LINE", "LWPOLYLINE", "CIRCLE"))
    assert(m.bbox === Some((0.0, -3.25, 102.5, 52.5)))
    assert(Dxf.meta("hello world".getBytes).isEmpty)
    assert(Dxf.features(("AutoCAD Binary DXF\r\n " + doc).getBytes("UTF-8")).isEmpty)
  }

  test("featureTable: executor-side parse over a directory of .dxf files") {
    val dir = Files.createTempDirectory("dxfspec")
    try {
      Files.write(dir.resolve("a.dxf"), doc.getBytes("UTF-8"))
      Files.write(dir.resolve("b.dxf"), polylineDoc.getBytes("UTF-8"))
      val df = Dxf.featureTable(spark, dir.toString)
      assert(df.count() === 5)
      import org.apache.spark.sql.functions.col
      assert(df.filter(col("closed")).count() === 1)
      assert(df.filter(col("layer") === "legacy").count() === 1)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }
}
