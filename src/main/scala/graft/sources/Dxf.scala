package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Pure-JVM ASCII DXF reader — an OGR long-tail driver the reference
  * reads through GDAL (`entry.cpp:1034` lists "dxf" among vector
  * extensions). ASCII DXF (Autodesk's published spec) is a stream of
  * (group-code line, value line) pairs; geometry lives in the
  * ENTITIES section as 0-code-delimited entities. This reader covers
  * the survey-workflow subset OGR's DXF driver maps to simple
  * features: POINT (10/20), LINE (10/20→11/21), LWPOLYLINE (repeated
  * 10/20, closed when 70 bit 1), legacy POLYLINE…VERTEX…SEQEND, and
  * CIRCLE (center 10/20 + radius 40 → its bbox). Layer (code 8) and
  * handle (code 5) ride along as attributes.
  *
  * Parsing runs EXECUTOR-side via `binaryFile` (one file = one task),
  * feeding the same envelope-pruning path as the other vector layers.
  */
object Dxf {

  final case class Feature(
      fid: Long,
      entity: String,
      layer: Option[String],
      handle: Option[String],
      nPoints: Long,
      bbox: Option[(Double, Double, Double, Double)],
      closed: Boolean
  )

  private final case class Pair(code: Int, value: String)

  private def pairs(text: String): Iterator[Pair] = {
    val lines = text.linesIterator.toArray
    (0 until lines.length - 1 by 2).iterator.flatMap { i =>
      lines(i).trim.toIntOption.map(c => Pair(c, lines(i + 1).trim))
    }
  }

  private val GeomEntities = Set("POINT", "LINE", "LWPOLYLINE", "POLYLINE", "CIRCLE")

  /** All geometry entities of an ASCII DXF payload in document order
    * (fid = 0-based position, OGR's DXF FID convention). A VERTEX run
    * after POLYLINE folds into its parent; SEQEND closes it. Binary
    * DXF ("AutoCAD Binary DXF" sentinel) and malformed input yield an
    * empty result rather than a throw. */
  def features(bytes: Array[Byte]): Seq[Feature] = {
    if (bytes.length > 22 && new String(bytes, 0, 22, "US-ASCII").startsWith("AutoCAD Binary DXF"))
      return Seq.empty
    val text = new String(bytes, "UTF-8")
    val it = pairs(text).buffered
    val out = ArrayBuffer.empty[Feature]
    var inEntities = false
    var cur: Option[(String, ArrayBuffer[(Double, Double)], Option[String], Option[String], Boolean, Option[Double])] =
      None // (entity, pts, layer, handle, closed, radius)
    var polyline: Option[(ArrayBuffer[(Double, Double)], Option[String], Option[String], Boolean)] = None
    var px: Option[Double] = None

    def flush(): Unit = {
      cur.foreach { case (ent, pts, layer, handle, closed, radius) =>
        val allPts = (ent, radius) match {
          case ("CIRCLE", Some(r)) =>
            pts.headOption.toSeq.flatMap { case (cx, cy) => Seq((cx - r, cy - r), (cx + r, cy + r)) }
          case _ => pts.toSeq
        }
        val bbox =
          if (allPts.isEmpty) None
          else Some((allPts.map(_._1).min, allPts.map(_._2).min, allPts.map(_._1).max, allPts.map(_._2).max))
        out += Feature(out.length.toLong, ent, layer, handle, pts.length.toLong, bbox, closed)
      }
      cur = None
      px = None
    }

    while (it.hasNext) {
      val Pair(code, value) = it.next()
      (code, value) match {
        case (0, "SECTION") => ()
        case (2, "ENTITIES") => inEntities = true
        case (0, "ENDSEC") if inEntities =>
          flush(); polyline = None; inEntities = false
        case (0, ent) if inEntities =>
          ent match {
            case "POLYLINE" =>
              flush()
              polyline = Some((ArrayBuffer.empty, None, None, false))
            case "VERTEX" if polyline.isDefined =>
              flush() // a VERTEX is not a standalone feature
            case "SEQEND" if polyline.isDefined =>
              flush()
              polyline.foreach { case (pts, layer, handle, closed) =>
                val bbox =
                  if (pts.isEmpty) None
                  else Some((pts.map(_._1).min, pts.map(_._2).min, pts.map(_._1).max, pts.map(_._2).max))
                out += Feature(out.length.toLong, "POLYLINE", layer, handle, pts.length.toLong, bbox, closed)
              }
              polyline = None
            case e if GeomEntities.contains(e) =>
              flush()
              cur = Some((e, ArrayBuffer.empty, None, None, false, None))
            case _ =>
              flush()
          }
        case (c, v) if inEntities =>
          // VERTEX coordinates accumulate into the open POLYLINE
          val intoPolyVertex = polyline.isDefined && cur.isEmpty
          c match {
            case 8 =>
              if (intoPolyVertex) polyline = polyline.map { case (p, _, h, cl) => (p, Some(v), h, cl) }
              else cur = cur.map { case (e, p, _, h, cl, r) => (e, p, Some(v), h, cl, r) }
            case 5 =>
              if (intoPolyVertex) polyline = polyline.map { case (p, l, _, cl) => (p, l, Some(v), cl) }
              else cur = cur.map { case (e, p, l, _, cl, r) => (e, p, l, Some(v), cl, r) }
            case 10 | 11 => px = v.toDoubleOption
            case 20 | 21 =>
              val y = v.toDoubleOption
              (px, y) match {
                case (Some(x), Some(yy)) =>
                  if (intoPolyVertex) polyline.foreach(_._1 += ((x, yy)))
                  else cur.foreach(_._2 += ((x, yy)))
                case _ => ()
              }
              px = None
            case 40 => cur = cur.map { case (e, p, l, h, cl, _) => (e, p, l, h, cl, v.toDoubleOption) }
            case 70 =>
              val closed = v.toIntOption.exists(f => (f & 1) == 1)
              if (intoPolyVertex) polyline = polyline.map { case (p, l, h, _) => (p, l, h, closed) }
              else cur = cur.map { case (e, p, l, h, _, r) => (e, p, l, h, closed, r) }
            case _ => ()
          }
        case _ => ()
      }
    }
    flush()
    out.toSeq
  }

  /** Metadata face for the extraction scan. */
  def meta(bytes: Array[Byte]): Option[VectorFile.VectorMeta] = {
    val head = new String(bytes, 0, math.min(bytes.length, 256), "UTF-8")
    // every ASCII DXF opens with a (0, SECTION) pair or a 999 comment
    val looksDxf = head.linesIterator.take(8).map(_.trim).sliding(2).exists {
      case Seq("0", "SECTION") => true
      case _                   => false
    }
    if (!looksDxf) return None
    val fs = features(bytes)
    if (fs.isEmpty) return None
    val boxes = fs.flatMap(_.bbox)
    val bbox =
      if (boxes.isEmpty) None
      else Some((boxes.map(_._1).min, boxes.map(_._2).min, boxes.map(_._3).max, boxes.map(_._4).max))
    Some(VectorFile.VectorMeta("DXF", fs.length.toLong, fs.map(_.entity).distinct, bbox))
  }

  private val tableSchema = StructType(
    Seq(
      StructField("path", StringType),
      StructField("fid", LongType),
      StructField("entity", StringType),
      StructField("layer", StringType),
      StructField("handle", StringType),
      StructField("n_points", LongType),
      StructField("minx", DoubleType),
      StructField("miny", DoubleType),
      StructField("maxx", DoubleType),
      StructField("maxy", DoubleType),
      StructField("closed", BooleanType)
    )
  )

  /** ◆ Relational face over an estate of .dxf assets: one file = one
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
            f.entity,
            f.layer.orNull,
            f.handle.orNull,
            f.nPoints,
            f.bbox.map(_._1).map(Double.box).orNull,
            f.bbox.map(_._2).map(Double.box).orNull,
            f.bbox.map(_._3).map(Double.box).orNull,
            f.bbox.map(_._4).map(Double.box).orNull,
            Boolean.box(f.closed)
          )
        }
      }
    s.createDataFrame(rows, tableSchema)
  }
}
