package graft.sources

import java.io.ByteArrayInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.w3c.dom.{Element, Node}

/** Pure-JVM GPX reader — the flight-log/track format of the OGR
  * long-tail (`entry.cpp:1034` lists "gpx"). GPX 1.0/1.1 (the
  * Topografix schema) is plain XML: `wpt` waypoints, `rte` routes of
  * `rtept`, and `trk` tracks of `trkseg`/`trkpt`, every point
  * carrying WGS84 `lat`/`lon` ATTRIBUTES (not text) plus optional
  * `ele`/`time` children. One feature per wpt/rte/trk, matching
  * OGR's layer model flattened to a single table.
  *
  * Parsing runs EXECUTOR-side via `binaryFile`, feeding the same
  * envelope-pruning path as the other vector layers.
  */
object Gpx {

  final case class Feature(
      fid: Long,
      kind: String, // wpt | rte | trk
      name: Option[String],
      nPoints: Long,
      bbox: Option[(Double, Double, Double, Double)],
      eleMin: Option[Double],
      eleMax: Option[Double],
      timeFirst: Option[String],
      timeLast: Option[String]
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

  private def descendants(e: Element, name: String): Seq[Element] = {
    val out = ArrayBuffer.empty[Element]
    def walk(n: Element): Unit = {
      if (local(n) == name) out += n
      childElements(n).foreach(walk)
    }
    walk(e)
    out.toSeq
  }

  private def firstChildText(e: Element, name: String): Option[String] =
    childElements(e).find(c => local(c) == name).map(_.getTextContent.trim).filter(_.nonEmpty)

  private def latLon(e: Element): Option[(Double, Double)] =
    for {
      lat <- Option(e.getAttribute("lat")).filter(_.nonEmpty).flatMap(_.toDoubleOption)
      lon <- Option(e.getAttribute("lon")).filter(_.nonEmpty).flatMap(_.toDoubleOption)
    } yield (lon, lat) // (x, y) order like every other driver

  private def pointFeature(fid: Long, kind: String, name: Option[String], pts: Seq[Element]): Feature = {
    val coords = pts.flatMap(latLon)
    val bbox =
      if (coords.isEmpty) None
      else Some((coords.map(_._1).min, coords.map(_._2).min, coords.map(_._1).max, coords.map(_._2).max))
    val eles = pts.flatMap(p => firstChildText(p, "ele").flatMap(_.toDoubleOption))
    val times = pts.flatMap(p => firstChildText(p, "time")) // ISO8601: lexicographic = chronological
    Feature(
      fid, kind, name, coords.length.toLong, bbox,
      if (eles.isEmpty) None else Some(eles.min),
      if (eles.isEmpty) None else Some(eles.max),
      if (times.isEmpty) None else Some(times.min),
      if (times.isEmpty) None else Some(times.max)
    )
  }

  /** All wpt/rte/trk features in document order. Malformed XML yields
    * an empty result rather than a throw. */
  def features(bytes: Array[Byte]): Seq[Feature] = {
    val doc =
      try {
        val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        f.setNamespaceAware(false)
        f.setExpandEntityReferences(false)
        f.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
        f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
      } catch { case _: Exception => return Seq.empty }
    val root = doc.getDocumentElement
    if (local(root) != "gpx") return Seq.empty
    val out = ArrayBuffer.empty[Feature]
    childElements(root).foreach { e =>
      local(e) match {
        case "wpt" => out += pointFeature(out.length.toLong, "wpt", firstChildText(e, "name"), Seq(e))
        case "rte" =>
          out += pointFeature(out.length.toLong, "rte", firstChildText(e, "name"), descendants(e, "rtept"))
        case "trk" =>
          out += pointFeature(out.length.toLong, "trk", firstChildText(e, "name"), descendants(e, "trkpt"))
        case _ => ()
      }
    }
    out.toSeq
  }

  /** Metadata face for the extraction scan. */
  def meta(bytes: Array[Byte]): Option[VectorFile.VectorMeta] = {
    val head = new String(bytes, 0, math.min(bytes.length, 256), "UTF-8")
    if (!head.contains("<gpx") && !head.contains(":gpx")) return None
    val fs = features(bytes)
    if (fs.isEmpty) return None
    val boxes = fs.flatMap(_.bbox)
    val bbox =
      if (boxes.isEmpty) None
      else Some((boxes.map(_._1).min, boxes.map(_._2).min, boxes.map(_._3).max, boxes.map(_._4).max))
    val kinds = fs.map(f => if (f.kind == "wpt") "Point" else "LineString").distinct
    Some(VectorFile.VectorMeta("GPX", fs.length.toLong, kinds, bbox))
  }

  private val tableSchema = StructType(
    Seq(
      StructField("path", StringType),
      StructField("fid", LongType),
      StructField("kind", StringType),
      StructField("name", StringType),
      StructField("n_points", LongType),
      StructField("minx", DoubleType),
      StructField("miny", DoubleType),
      StructField("maxx", DoubleType),
      StructField("maxy", DoubleType),
      StructField("ele_min", DoubleType),
      StructField("ele_max", DoubleType),
      StructField("time_first", StringType),
      StructField("time_last", StringType)
    )
  )

  /** ◆ Relational face over an estate of .gpx assets: one file = one
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
            p, f.fid, f.kind, f.name.orNull, f.nPoints,
            f.bbox.map(_._1).map(Double.box).orNull,
            f.bbox.map(_._2).map(Double.box).orNull,
            f.bbox.map(_._3).map(Double.box).orNull,
            f.bbox.map(_._4).map(Double.box).orNull,
            f.eleMin.map(Double.box).orNull,
            f.eleMax.map(Double.box).orNull,
            f.timeFirst.orNull,
            f.timeLast.orNull
          )
        }
      }
    s.createDataFrame(rows, tableSchema)
  }
}
