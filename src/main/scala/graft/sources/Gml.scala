package graft.sources

import java.io.ByteArrayInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.w3c.dom.{Element, Node}

/** Pure-JVM GML reader — an OGR long-tail driver the reference reads
  * through GDAL (`entry.cpp:1034` lists "gml" among vector extensions;
  * `vector.cpp:52-140` asks OGR for feature count + envelope). GML
  * (OGC 07-036 / ISO 19136) is XML: features sit under
  * `featureMember` (GML2, one per wrapper), `featureMembers` (GML3.1,
  * many per wrapper) or `member` (WFS2) elements; a feature's child
  * elements are its properties — simple text content becomes an
  * attribute, a geometry-valued property carries the gml geometry.
  * Coordinates appear as `coordinates` ("x,y x,y" — GML2),
  * `pos` ("x y") or `posList` ("x1 y1 x2 y2 …", srsDimension-aware).
  * Axis order is taken as written (x first) — the reference's OGR
  * path makes the same call for the common EPSG:4326 lon/lat files;
  * no reprojection, same as the KML/GeoJSON drivers.
  *
  * Parsing runs EXECUTOR-side via `binaryFile` (one file = one task),
  * so a .gml estate scans in parallel and the envelope columns feed
  * the same `env_intersects` / parquet-stat pruning path as every
  * other vector layer.
  */
object Gml {

  final case class Feature(
      fid: Long,
      typeName: String,
      gmlId: Option[String],
      geomType: Option[String],
      nPoints: Long,
      bbox: Option[(Double, Double, Double, Double)],
      props: Map[String, String]
  )

  private def local(n: Node): String = {
    val s = n.getNodeName
    val i = s.indexOf(':')
    if (i >= 0) s.substring(i + 1) else s
  }

  private def childElements(e: Node): Seq[Element] = {
    val kids = e.getChildNodes
    (0 until kids.getLength).map(kids.item).collect { case el: Element => el }
  }

  private def descendants(e: Element, names: Set[String]): Seq[Element] = {
    val out = ArrayBuffer.empty[Element]
    def walk(n: Element): Unit = {
      if (names.contains(local(n))) out += n
      childElements(n).foreach(walk)
    }
    walk(e)
    out.toSeq
  }

  private val GeomTags = Set(
    "Point", "LineString", "Polygon", "Curve", "Surface",
    "MultiPoint", "MultiLineString", "MultiPolygon", "MultiCurve", "MultiSurface", "MultiGeometry"
  )
  private val MemberTags = Set("featureMember", "featureMembers", "member")

  /** "x,y x,y" (GML2 `coordinates`, default cs/ts) → (x, y) pairs. */
  private[sources] def parseCoordinatesText(text: String): Seq[(Double, Double)] =
    text.trim.split("\\s+").iterator.filter(_.nonEmpty).flatMap { tuple =>
      val parts = tuple.split(",")
      if (parts.length >= 2)
        try Some((parts(0).toDouble, parts(1).toDouble))
        catch { case _: NumberFormatException => None }
      else None
    }.toSeq

  /** "x1 y1 [z1] x2 y2 [z2] …" (`pos`/`posList`) → (x, y) pairs,
    * stepping by srsDimension (2 unless declared 3). */
  private[sources] def parsePosList(text: String, dim: Int): Seq[(Double, Double)] = {
    val nums = text.trim.split("\\s+").iterator.filter(_.nonEmpty).flatMap { t =>
      try Some(t.toDouble)
      catch { case _: NumberFormatException => None }
    }.toArray
    val step = math.max(dim, 2)
    (0 until (nums.length / step)).map(i => (nums(i * step), nums(i * step + 1)))
  }

  /** Every coordinate pair under a geometry element, whatever mix of
    * coordinates/pos/posList encodings its rings and members use. */
  private def geomCoords(g: Element): Seq[(Double, Double)] =
    descendants(g, Set("coordinates", "pos", "posList")).flatMap { c =>
      local(c) match {
        case "coordinates" => parseCoordinatesText(c.getTextContent)
        case _ =>
          val dim = Option(c.getAttribute("srsDimension")).filter(_.nonEmpty).flatMap(_.toIntOption).getOrElse(2)
          parsePosList(c.getTextContent, dim)
      }
    }

  /** All features of a GML byte payload in document order (fid =
    * 0-based position, OGR's GML FID convention absent gml:id).
    * Malformed XML yields an empty result rather than a throw. */
  def features(bytes: Array[Byte]): Seq[Feature] = {
    val doc =
      try {
        val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        f.setNamespaceAware(false)
        f.setExpandEntityReferences(false) // no external entities on untrusted inputs
        f.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
        f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
      } catch { case _: Exception => return Seq.empty }
    val members = descendants(doc.getDocumentElement, MemberTags)
    val feats = members.flatMap(childElements) // featureMembers holds many, featureMember one
    feats.zipWithIndex.map { case (fe, i) =>
      val gmlId = Seq("gml:id", "id", "fid").iterator
        .map(a => fe.getAttribute(a))
        .find(_.nonEmpty)
      // property elements: simple text → attribute; first geometry
      // found anywhere below a property → the feature geometry
      val geomEl = {
        def findGeom(n: Element): Option[Element] =
          if (GeomTags.contains(local(n))) Some(n)
          else childElements(n).collectFirst(Function.unlift(findGeom))
        childElements(fe).collectFirst(Function.unlift(findGeom))
      }
      val props = childElements(fe).flatMap { p =>
        val kids = childElements(p)
        val text = p.getTextContent.trim
        if (kids.isEmpty && text.nonEmpty && !GeomTags.contains(local(p)))
          Some(local(p) -> text)
        else None
      }.toMap
      val coords = geomEl.toSeq.flatMap(geomCoords)
      val bbox =
        if (coords.isEmpty) None
        else Some((coords.map(_._1).min, coords.map(_._2).min, coords.map(_._1).max, coords.map(_._2).max))
      Feature(i.toLong, local(fe), gmlId, geomEl.map(local), coords.length.toLong, bbox, props)
    }
  }

  /** Metadata face for the extraction scan — the same numbers the
    * reference's `computeStats` (`vector.cpp:52-140`) asks OGR for. */
  def meta(bytes: Array[Byte]): Option[VectorFile.VectorMeta] = {
    val head = new String(bytes, 0, math.min(bytes.length, 512), "UTF-8")
    val looksGml = head.contains("FeatureCollection") && (head.contains("gml") || head.contains("wfs")) ||
      head.contains("<gml:") || head.contains("featureMember")
    if (!looksGml) return None
    val fs = features(bytes)
    if (fs.isEmpty) return None
    val boxes = fs.flatMap(_.bbox)
    val bbox =
      if (boxes.isEmpty) None
      else Some((boxes.map(_._1).min, boxes.map(_._2).min, boxes.map(_._3).max, boxes.map(_._4).max))
    Some(VectorFile.VectorMeta("GML", fs.length.toLong, fs.flatMap(_.geomType).distinct, bbox))
  }

  private val tableSchema = StructType(
    Seq(
      StructField("path", StringType),
      StructField("fid", LongType),
      StructField("type_name", StringType),
      StructField("gml_id", StringType),
      StructField("geom_type", StringType),
      StructField("n_points", LongType),
      StructField("minx", DoubleType),
      StructField("miny", DoubleType),
      StructField("maxx", DoubleType),
      StructField("maxy", DoubleType),
      StructField("props", StringType) // JSON object, keys sorted
    )
  )

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def propsJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")

  /** ◆ Relational face over an estate of .gml assets: one file = one
    * `binaryFile` row = one parse task. */
  def featureTable(s: SparkSession, path: String): DataFrame = {
    val rows = s.read
      .format("binaryFile")
      .load(path)
      .select(col("path"), col("content"))
      .rdd
      .flatMap { r =>
        val p = r.getString(0)
        features(r.getAs[Array[Byte]](1)).map { f =>
          Row(
            p,
            f.fid,
            f.typeName,
            f.gmlId.orNull,
            f.geomType.orNull,
            f.nPoints,
            f.bbox.map(_._1).map(Double.box).orNull,
            f.bbox.map(_._2).map(Double.box).orNull,
            f.bbox.map(_._3).map(Double.box).orNull,
            f.bbox.map(_._4).map(Double.box).orNull,
            propsJson(f.props)
          )
        }
      }
    s.createDataFrame(rows, tableSchema)
  }
}
