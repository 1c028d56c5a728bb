package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.core.MiniJson

/** Pure-JVM TopoJSON reader — the topology-encoded cousin of GeoJSON
  * in the reference's vector long-tail (`entry.cpp:1034` lists
  * "topojson"; `stac.cpp:149` maps its MIME type; the reference reads
  * it through OGR's GeoJSON driver). Implemented from the public
  * TopoJSON 1.0 specification (topojson/topojson-specification):
  *
  *   - a Topology carries shared `arcs`; when a `transform`
  *     ({scale, translate}) is present the topology is QUANTIZED and
  *     each arc is delta-encoded — position j is the running sum of
  *     deltas, mapped to absolute coordinates as
  *     `x = grid_x * scale_x + translate_x` (Point/MultiPoint
  *     `coordinates` map through the same transform, without deltas);
  *   - geometries reference arcs by index; a NEGATIVE index `~i`
  *     (ones' complement) means arc `i` reversed;
  *   - consecutive arcs of a LineString/ring stitch by dropping the
  *     duplicated junction position (the spec REQUIRES the junction
  *     positions to be equal — enforced here in grid space, where the
  *     comparison is exact for quantized topologies);
  *   - Polygon rings must be closed after stitching (enforced).
  *
  * Untrusted-bytes contract: `features`/`decode` raise
  * [[TopoJsonError]] on malformed input of any shape (non-Topology
  * documents, dangling arc indexes, short arcs, junction mismatches,
  * unclosed rings, malformed transforms); `meta` is the tolerant
  * fingerprint face and returns None instead. Scale shape: one file =
  * one `binaryFile` row = one executor-side parse task, the same
  * envelope-pruning path as the other vector layers.
  *
  * No TopoJSON producer exists in this container (python `topojson`
  * absent, no node topojson-server/-client modules, no GDAL) — the
  * spec's own canonical example pair (plain + quantized, with exact
  * expected coordinates) pins decode in TopoJsonSpec instead.
  */
object TopoJson {

  final case class TopoJsonError(msg: String) extends RuntimeException(s"topojson: $msg")
  private def fail(msg: String): Nothing = throw TopoJsonError(msg)

  /** Decoded topology: `grid` holds per-arc running-sum positions in
    * quantized space (identical to `abs` when no transform), `abs`
    * the transformed absolute coordinates. */
  final case class Topology(
      transform: Option[(Double, Double, Double, Double)], // sx, sy, tx, ty
      grid: Vector[Vector[(Double, Double)]],
      abs: Vector[Vector[(Double, Double)]],
      objects: Vector[(String, Map[String, Any])]
  )

  sealed trait Geom {
    def tpe: String
    def id: Option[String]
    def nProps: Int
    def points: Seq[(Double, Double)]
  }
  final case class GPoint(xy: (Double, Double), id: Option[String], nProps: Int) extends Geom {
    def tpe = "Point"; def points: Seq[(Double, Double)] = Seq(xy)
  }
  final case class GMultiPoint(pts: Seq[(Double, Double)], id: Option[String], nProps: Int) extends Geom {
    def tpe = "MultiPoint"; def points: Seq[(Double, Double)] = pts
  }
  final case class GLine(pts: Seq[(Double, Double)], id: Option[String], nProps: Int) extends Geom {
    def tpe = "LineString"; def points: Seq[(Double, Double)] = pts
  }
  final case class GMultiLine(lines: Seq[Seq[(Double, Double)]], id: Option[String], nProps: Int) extends Geom {
    def tpe = "MultiLineString"; def points: Seq[(Double, Double)] = lines.flatten
  }
  final case class GPolygon(rings: Seq[Seq[(Double, Double)]], id: Option[String], nProps: Int) extends Geom {
    def tpe = "Polygon"; def points: Seq[(Double, Double)] = rings.flatten
  }
  final case class GMultiPolygon(polys: Seq[Seq[Seq[(Double, Double)]]], id: Option[String], nProps: Int)
      extends Geom {
    def tpe = "MultiPolygon"; def points: Seq[(Double, Double)] = polys.flatten.flatten
  }
  final case class GCollection(geoms: Seq[Geom], id: Option[String], nProps: Int) extends Geom {
    def tpe = "GeometryCollection"; def points: Seq[(Double, Double)] = geoms.flatMap(_.points)
  }

  // ---- topology decode -------------------------------------------------

  private def numPair(v: Any, what: String): (Double, Double) = v match {
    case a: Vector[_] if a.length >= 2 => (MiniJson.num(a(0)), MiniJson.num(a(1)))
    case _ => fail(s"$what is not a [x, y] position")
  }

  def decode(bytes: Array[Byte]): Topology = {
    if (bytes == null || bytes.isEmpty) fail("empty document")
    val root =
      try MiniJson.obj(MiniJson.parse(new String(bytes, "UTF-8")))
      catch { case e: IllegalArgumentException => fail(e.getMessage) }
    if (!root.get("type").map(MiniJson.str).contains("Topology")) fail("type is not Topology")
    val transform = root.get("transform").map { t =>
      val o = MiniJson.obj(t)
      val (sx, sy) = numPair(o.getOrElse("scale", fail("transform without scale")), "scale")
      val (tx, ty) = numPair(o.getOrElse("translate", fail("transform without translate")), "translate")
      (sx, sy, tx, ty)
    }
    val rawArcs = root.getOrElse("arcs", fail("missing arcs")) match {
      case a: Vector[_] => a
      case _ => fail("arcs is not an array")
    }
    val grid = rawArcs.zipWithIndex.map { case (arcAny, i) =>
      val positions = arcAny match {
        case a: Vector[_] if a.length >= 2 => a.map(p => numPair(p, s"arc $i position"))
        case a: Vector[_] => fail(s"arc $i has ${a.length} positions (spec minimum is 2)")
        case _ => fail(s"arc $i is not an array")
      }
      if (transform.isDefined) { // delta-encoded
        var x = 0.0; var y = 0.0
        positions.map { case (dx, dy) => x += dx; y += dy; (x, y) }
      } else positions
    }
    val abs = transform match {
      case Some((sx, sy, tx, ty)) => grid.map(_.map { case (x, y) => (x * sx + tx, y * sy + ty) })
      case None => grid
    }
    val objects = root.getOrElse("objects", fail("missing objects")) match {
      case o: Map[_, _] =>
        o.toVector.map { case (k, v) => (k.toString, MiniJson.obj(v)) }.sortBy(_._1)
      case _ => fail("objects is not an object")
    }
    Topology(transform, grid, abs, objects)
  }

  /** Resolve one arc reference to grid-space positions (reversed for
    * ones'-complement indexes). */
  private def arcGrid(t: Topology, ref: Int): Vector[(Double, Double)] = {
    val i = if (ref < 0) ~ref else ref
    if (i < 0 || i >= t.grid.length) fail(s"arc index $ref out of range (${t.grid.length} arcs)")
    if (ref < 0) t.grid(i).reverse else t.grid(i)
  }
  private def arcAbs(t: Topology, ref: Int): Vector[(Double, Double)] = {
    val i = if (ref < 0) ~ref else ref
    if (ref < 0) t.abs(i).reverse else t.abs(i)
  }

  /** Stitch a list of arc references into one position sequence,
    * dropping each junction's duplicated position. The spec requires
    * the junction positions to be EQUAL — checked in grid space where
    * quantized comparisons are exact. */
  def line(t: Topology, refs: Seq[Int]): Vector[(Double, Double)] = {
    if (refs.isEmpty) fail("LineString/ring with zero arcs")
    val out = Vector.newBuilder[(Double, Double)]
    var lastGrid: Option[(Double, Double)] = None
    refs.foreach { ref =>
      val g = arcGrid(t, ref)
      val a = arcAbs(t, ref)
      lastGrid match {
        case Some(prev) =>
          if (g.head != prev) fail(s"arc junction mismatch at arc $ref (${g.head} != $prev)")
          a.drop(1).foreach(out += _)
        case None => a.foreach(out += _)
      }
      lastGrid = Some(g.last)
    }
    out.result()
  }

  private def ring(t: Topology, refs: Seq[Int]): Vector[(Double, Double)] = {
    val pts = line(t, refs)
    if (pts.length < 4) fail(s"ring with ${pts.length} positions (spec minimum is 4)")
    // closure is exact in grid space; compare the stitched endpoints there
    val gFirst = arcGrid(t, refs.head).head
    val gLast = arcGrid(t, refs.last).last
    if (gFirst != gLast) fail(s"unclosed ring ($gFirst != $gLast)")
    pts
  }

  private def point(t: Topology, v: Any): (Double, Double) = {
    val (px, py) = numPair(v, "point coordinates")
    t.transform match {
      case Some((sx, sy, tx, ty)) => (px * sx + tx, py * sy + ty)
      case None => (px, py)
    }
  }

  private def arcRefs(v: Any, what: String): Vector[Int] = v match {
    case a: Vector[_] =>
      a.map {
        case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
        case d: Double if d == math.rint(d) && math.abs(d) <= Int.MaxValue => d.toInt
        case other => fail(s"$what arc index $other is not an integer")
      }
    case _ => fail(s"$what arcs is not an array")
  }
  private def nested(v: Any, what: String): Vector[Any] = v match {
    case a: Vector[_] => a.toVector
    case _ => fail(s"$what is not an array")
  }

  def geometry(t: Topology, raw: Map[String, Any]): Geom = {
    val id = raw.get("id").map {
      case l: Long => l.toString
      case d: Double => if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString
      case other => MiniJson.str(other)
    }
    val nProps = raw.get("properties").map(MiniJson.obj(_).size).getOrElse(0)
    def coords = raw.getOrElse("coordinates", fail("geometry without coordinates"))
    def arcs = raw.getOrElse("arcs", fail("geometry without arcs"))
    raw.get("type").map(MiniJson.str).getOrElse(fail("geometry without type")) match {
      case "Point" => GPoint(point(t, coords), id, nProps)
      case "MultiPoint" => GMultiPoint(nested(coords, "MultiPoint").map(point(t, _)), id, nProps)
      case "LineString" => GLine(line(t, arcRefs(arcs, "LineString")), id, nProps)
      case "MultiLineString" =>
        GMultiLine(nested(arcs, "MultiLineString").map(l => line(t, arcRefs(l, "MultiLineString"))), id, nProps)
      case "Polygon" => GPolygon(nested(arcs, "Polygon").map(r => ring(t, arcRefs(r, "Polygon"))), id, nProps)
      case "MultiPolygon" =>
        GMultiPolygon(
          nested(arcs, "MultiPolygon").map(p => nested(p, "polygon").map(r => ring(t, arcRefs(r, "polygon")))),
          id,
          nProps)
      case "GeometryCollection" =>
        val gs = raw.getOrElse("geometries", fail("GeometryCollection without geometries")) match {
          case a: Vector[_] => a.map(g => geometry(t, MiniJson.obj(g)))
          case _ => fail("geometries is not an array")
        }
        GCollection(gs, id, nProps)
      case other => fail(s"unknown geometry type $other")
    }
  }

  // ---- feature face ----------------------------------------------------

  final case class Feature(
      objectName: String,
      fid: Long,
      geomType: String,
      id: Option[String],
      nPoints: Long,
      nProps: Int,
      bbox: Option[(Double, Double, Double, Double)]
  )

  private def bboxOf(pts: Seq[(Double, Double)]): Option[(Double, Double, Double, Double)] =
    if (pts.isEmpty) None
    else Some((pts.map(_._1).min, pts.map(_._2).min, pts.map(_._1).max, pts.map(_._2).max))

  /** One feature per geometry: a top-level GeometryCollection is the
    * layer (its members are the features, OGR's TopoJSON model); any
    * other object type is a single feature itself. Every malformed
    * shape raises [[TopoJsonError]] — including type errors deep in
    * the JSON (a non-object geometry, a boolean id) that surface from
    * MiniJson as IllegalArgumentException. */
  def features(bytes: Array[Byte]): Seq[Feature] =
    try features0(bytes)
    catch {
      case e: TopoJsonError => throw e
      case e: IllegalArgumentException => fail(e.getMessage)
    }

  private def features0(bytes: Array[Byte]): Seq[Feature] = {
    val t = decode(bytes)
    val out = Vector.newBuilder[Feature]
    t.objects.foreach { case (name, raw) =>
      val members = raw.get("type").map(MiniJson.str) match {
        case Some("GeometryCollection") =>
          raw.getOrElse("geometries", fail("GeometryCollection without geometries")) match {
            case a: Vector[_] => a.map(g => geometry(t, MiniJson.obj(g)))
            case _ => fail("geometries is not an array")
          }
        case _ => Vector(geometry(t, raw))
      }
      members.zipWithIndex.foreach { case (g, i) =>
        val pts = g.points
        out += Feature(name, i.toLong, g.tpe, g.id, pts.length.toLong, g.nProps, bboxOf(pts))
      }
    }
    out.result()
  }

  /** Tolerant fingerprint face (the Extractors chain): a JSON object
    * whose type is "Topology" with arcs + objects. */
  def meta(bytes: Array[Byte]): Option[VectorFile.VectorMeta] = {
    if (bytes == null || bytes.isEmpty) return None
    val head = new String(bytes, 0, math.min(bytes.length, 512), "UTF-8")
    if (!head.trim.startsWith("{") || !head.contains("\"Topology\"")) return None
    try {
      val fs = features(bytes)
      val boxes = fs.flatMap(_.bbox)
      val bbox =
        if (boxes.isEmpty) None
        else Some((boxes.map(_._1).min, boxes.map(_._2).min, boxes.map(_._3).max, boxes.map(_._4).max))
      Some(VectorFile.VectorMeta("TopoJSON", fs.length.toLong, fs.map(_.geomType).distinct, bbox))
    } catch { case _: Exception => None }
  }

  private val tableSchema = StructType(
    Seq(
      StructField("path", StringType),
      StructField("object_name", StringType),
      StructField("fid", LongType),
      StructField("geom_type", StringType),
      StructField("feature_id", StringType),
      StructField("n_points", LongType),
      StructField("n_props", IntegerType),
      StructField("minx", DoubleType),
      StructField("miny", DoubleType),
      StructField("maxx", DoubleType),
      StructField("maxy", DoubleType)
    )
  )

  /** ◆ Relational face over an estate of .topojson assets: one file =
    * one `binaryFile` row = one parse task. */
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
            p, f.objectName, f.fid, f.geomType, f.id.orNull, f.nPoints, f.nProps,
            f.bbox.map(_._1).map(Double.box).orNull,
            f.bbox.map(_._2).map(Double.box).orNull,
            f.bbox.map(_._3).map(Double.box).orNull,
            f.bbox.map(_._4).map(Double.box).orNull
          )
        }
      }
    s.createDataFrame(rows, tableSchema)
  }

  // ---- query lane --------------------------------------------------------

  /** TopoJSON cycle over events: each (event_type, shard) bucket
    * encodes its ids as ONE quantized topology — a delta-encoded
    * LineString at integer scale (lossless through the transform), a
    * reversed reference to the same arc (ones' complement, require-
    * only identity), a two-arc stitched line exercising junction
    * dedup, and a closed square Polygon — then OUR reader decodes it
    * and the bucket aggregates closed forms the oracle reproduces:
    * sum of decoded x over the line = 0+1+…+(n-1), sum of decoded y =
    * Σ(id mod 1000). */
  def topoQuery(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val cycle = udf { ids: Seq[Long] =>
      val sorted = ids.sorted
      val n = sorted.length
      val ys = sorted.map(_ % 1000L)
      // delta-encode (x=j, y=id_j%1000) at scale [1,1] translate [0,0];
      // a sentinel trailing position keeps the arc >= 2 positions even
      // for a single-id bucket (dropped from the aggregates below)
      val deltas = new StringBuilder
      var px = 0L; var py = 0L
      sorted.indices.foreach { j =>
        val x = j.toLong; val y = ys(j)
        if (j > 0) deltas.append(',')
        deltas.append('[').append(x - px).append(',').append(y - py).append(']')
        px = x; py = y
      }
      if (n > 0) deltas.append(",[1,1]") else deltas.append("[0,0],[1,1]")
      px += 1; py += 1
      // a second arc continuing from the line's end (junction repeats
      // the final position as its absolute-start in delta space)
      val arc1 = s"[[$px,$py],[1,1],[1,1]]"
      // a closed unit square as four single-position deltas + closure
      val arc2 = "[[0,0],[7,0],[0,7],[-7,0],[0,-7]]"
      val doc =
        s"""{"type":"Topology",
           |"transform":{"scale":[1,1],"translate":[0,0]},
           |"objects":{"lane":{"type":"GeometryCollection","geometries":[
           |  {"type":"LineString","arcs":[0],"id":7,"properties":{"k":"v"}},
           |  {"type":"LineString","arcs":[-1]},
           |  {"type":"LineString","arcs":[0,1]},
           |  {"type":"Polygon","arcs":[[2]]},
           |  {"type":"Point","coordinates":[$px,$py]},
           |  {"type":"MultiPoint","coordinates":[[0,0],[$px,$py]]}
           |]}},
           |"arcs":[[$deltas],$arc1,$arc2]}""".stripMargin
      val fs = features(doc.getBytes("UTF-8"))
      require(fs.length == 6, s"topojson: feature count drift ${fs.length}")
      val t = TopoJson.decode(doc.getBytes("UTF-8"))
      val fwd = line(t, Seq(0))
      val rev = line(t, Seq(-1))
      require(rev == fwd.reverse, "topojson: ones'-complement reversal drift")
      val stitched = line(t, Seq(0, 1))
      require(stitched.length == fwd.length + 2, "topojson: junction dedup drift")
      require(fs(3).nPoints == 5L && fs(3).geomType == "Polygon", "topojson: ring drift")
      require(fs(0).id.contains("7") && fs(0).nProps == 1, "topojson: id/properties drift")
      val data = fwd.take(n) // drop the sentinel tail
      require(fwd.length == n + (if (n > 0) 1 else 2), "topojson: decoded length drift")
      val sumX = data.iterator.map(_._1).sum
      val sumY = data.iterator.map(_._2).sum
      Seq(n.toLong, math.rint(sumX).toLong, math.rint(sumY).toLong)
    }
    graft.Tables
      .eventsRaw(s, dir)
      .groupBy($"event_type", expr("event_id DIV 4096").as("shard"))
      .agg(collect_list($"event_id").as("ids"))
      .transform(d => graft.operators.Spread.wide(d)) // conf-width, not a local-core literal
      .select($"event_type", cycle($"ids").as("a"))
      .groupBy($"event_type")
      .agg(
        sum($"a".getItem(0)).as("n_points"),
        sum($"a".getItem(1)).as("sum_x"),
        sum($"a".getItem(2)).as("sum_y"))
      .orderBy($"event_type")
  }
}
