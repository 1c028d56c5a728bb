package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.w3c.dom.{Element, Node}

/** Pure-JVM KML / KMZ reader — an OGR long-tail driver the reference
  * reads through GDAL (`entry.cpp:1034` lists "kml","kmz" among vector
  * extensions; `vector.cpp:52-140` computes feature count + WGS84
  * envelope through OGR layers). KML (OGC 07-147r2) is plain XML:
  * `Placemark` elements under arbitrary Document/Folder nesting carry
  * a name, `ExtendedData` attributes, and a geometry (Point /
  * LineString / Polygon / MultiGeometry); `coordinates` text is
  * whitespace-separated "lon,lat[,alt]" tuples, already WGS84 by spec
  * — no reprojection step, which is what makes a from-scratch reader
  * practical. KMZ is the same document zipped (the first `.kml` entry
  * wins, matching OGR).
  *
  * The JDK's DOM parser keeps it dependency-free; [[featureTable]]
  * parses EXECUTOR-side (one file = one `binaryFile` row = one task),
  * so an estate of .kml assets scans in parallel like any other
  * source and the resulting envelope columns feed the same
  * `env_intersects` / parquet-stat pruning path as every other layer.
  */
object Kml {

  final case class Feature(
      fid: Long,
      name: Option[String],
      geomType: Option[String],
      nPoints: Long,
      bbox: Option[(Double, Double, Double, Double)],
      props: Map[String, String]
  )

  private def isZip(bytes: Array[Byte]): Boolean =
    bytes.length > 4 && bytes(0) == 'P' && bytes(1) == 'K' && bytes(2) == 3 && bytes(3) == 4

  /** KMZ → the first .kml entry's bytes (the spec's doc.kml
    * convention; OGR likewise takes the first). */
  private[sources] def unzipKml(bytes: Array[Byte]): Option[Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory && e.getName.toLowerCase(java.util.Locale.ROOT).endsWith(".kml")) {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
          return Some(out.toByteArray)
        }
        e = zin.getNextEntry
      }
      None
    } finally zin.close()
  }

  /** Tag name with any namespace prefix stripped (files written as
    * `<kml:Placemark>` and `<Placemark>` both occur in the wild). */
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

  /** Parse a `coordinates` text block: whitespace-separated
    * "lon,lat[,alt]" tuples. */
  private[sources] def parseCoordinates(text: String): Seq[(Double, Double)] =
    text.trim
      .split("\\s+")
      .iterator
      .filter(_.nonEmpty)
      .flatMap { tuple =>
        val parts = tuple.split(",")
        if (parts.length >= 2)
          try Some((parts(0).toDouble, parts(1).toDouble))
          catch { case _: NumberFormatException => None }
        else None
      }
      .toSeq

  private val GeomTags = Set("Point", "LineString", "Polygon", "MultiGeometry")

  /** All Placemark features of a KML or KMZ byte payload, in document
    * order (fid = 0-based document position, the OGR FID convention for
    * KML). Malformed XML yields an empty result rather than a throw —
    * a relational engine flags, it does not abort the scan. */
  def features(bytes: Array[Byte]): Seq[Feature] = {
    val kmlBytes = if (isZip(bytes)) unzipKml(bytes).getOrElse(return Seq.empty) else bytes
    val doc =
      try {
        val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        f.setNamespaceAware(false)
        f.setExpandEntityReferences(false) // no external entity resolution on untrusted inputs
        f.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
        f.newDocumentBuilder().parse(new ByteArrayInputStream(kmlBytes))
      } catch { case _: Exception => return Seq.empty }
    val root = doc.getDocumentElement
    descendants(root, "Placemark").zipWithIndex.map { case (pm, i) =>
      // geometry: the first geometry child anywhere under the Placemark;
      // MultiGeometry wins if it is the container
      val geomEl = {
        def findGeom(n: Element): Option[Element] =
          if (GeomTags.contains(local(n))) Some(n)
          else childElements(n).collectFirst(Function.unlift(findGeom))
        childElements(pm).collectFirst(Function.unlift(findGeom))
      }
      val coords = geomEl.toSeq.flatMap(g => descendants(g, "coordinates").flatMap(c => parseCoordinates(c.getTextContent)))
      val bbox =
        if (coords.isEmpty) None
        else Some((coords.map(_._1).min, coords.map(_._2).min, coords.map(_._1).max, coords.map(_._2).max))
      // ExtendedData: <Data name=..><value>..</value></Data> and
      // SchemaData/<SimpleData name=..>..</SimpleData>
      val props: Map[String, String] = childElements(pm).find(c => local(c) == "ExtendedData") match {
        case None => Map.empty
        case Some(ed) =>
          val data = descendants(ed, "Data").flatMap { d =>
            Option(d.getAttribute("name")).filter(_.nonEmpty).flatMap(k => firstChildText(d, "value").map(k -> _))
          }
          val simple = descendants(ed, "SimpleData").flatMap { d =>
            Option(d.getAttribute("name")).filter(_.nonEmpty).map(k => k -> d.getTextContent.trim)
          }
          (data ++ simple).toMap
      }
      Feature(i.toLong, firstChildText(pm, "name"), geomEl.map(local), coords.length.toLong, bbox, props)
    }
  }

  /** Metadata face for the extraction scan: feature count, geometry
    * types present, union WGS84 envelope — the same numbers the
    * reference's `computeStats` (`vector.cpp:52-140`) asks OGR for. */
  def meta(bytes: Array[Byte]): Option[VectorFile.VectorMeta] = {
    val looksKml =
      isZip(bytes) || {
        val head = new String(bytes, 0, math.min(bytes.length, 512), "UTF-8")
        head.contains("<kml") || head.contains(":kml") || head.contains("<Placemark")
      }
    if (!looksKml) return None
    val fs = features(bytes)
    if (fs.isEmpty) return None
    val boxes = fs.flatMap(_.bbox)
    val bbox =
      if (boxes.isEmpty) None
      else Some((boxes.map(_._1).min, boxes.map(_._2).min, boxes.map(_._3).max, boxes.map(_._4).max))
    Some(
      VectorFile.VectorMeta(
        if (isZip(bytes)) "KMZ" else "KML",
        fs.length.toLong,
        fs.flatMap(_.geomType).distinct,
        bbox
      )
    )
  }

  private val tableSchema = StructType(
    Seq(
      StructField("path", StringType),
      StructField("fid", LongType),
      StructField("name", StringType),
      StructField("geom_type", StringType),
      StructField("n_points", LongType),
      StructField("minx", DoubleType),
      StructField("miny", DoubleType),
      StructField("maxx", DoubleType),
      StructField("maxy", DoubleType),
      StructField("props", StringType) // JSON object, keys sorted
    )
  )

  private def propsJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** ◆ Relational face over an estate of .kml/.kmz assets: one file =
    * one `binaryFile` row = one parse task; envelope columns are
    * top-level doubles, so the output written to parquet min/max-prunes
    * under `env_intersects` like every other layer. */
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
            f.name.orNull,
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
