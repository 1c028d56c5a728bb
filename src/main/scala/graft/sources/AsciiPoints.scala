package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** ASCII point-cloud readers for the `.xyz` / `.pts` extensions the
  * dispatch table types as PointCloud (`entry.cpp:1001` — the
  * reference hands them to PDAL; here they read natively):
  *
  *  - **XYZ**: one point per line, whitespace-separated
  *    `x y z [intensity [r g b]]`; `#`-comment and blank lines
  *    skipped. Column count is sniffed from the first data line.
  *  - **PTS** (Leica): first line = point count, then
  *    `x y z [intensity [r g b]]` rows.
  *
  * Scale shape: these are LINE-SPLITTABLE text formats — the Spark
  * face reads them through the parallel text source (every other
  * codec here needs byte-range planning; a plain `spark.read.text`
  * split is the right plan for ASCII points), so a single huge .xyz
  * scans multi-task out of the box.
  */
object AsciiPoints {

  final case class Pt(x: Double, y: Double, z: Double, intensity: Option[Double], rgb: Option[(Int, Int, Int)])

  /** CloudCompare-style dimension header: a leading `//X Y Z R G B ...`
    * comment names the columns (pointcloud_test xyzWithCloudCompareHeaders). */
  def headerDimensions(text: String): Option[Seq[String]] =
    text.linesIterator
      .map(_.trim)
      .find(_.nonEmpty)
      .filter(l => l.startsWith("//") && l.drop(2).trim.split("\\s+").length >= 3)
      .map(_.drop(2).trim.split("\\s+").toSeq)

  /** Column conventions: 3 = XYZ; 6 = XYZ RGB (the CloudCompare
    * export shape); 4 = XYZ intensity; 7+ = XYZ intensity RGB. */
  private def parseLine(line: String): Option[Pt] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#") || t.startsWith("//")) return None
    val f = t.split("\\s+")
    if (f.length < 3) return None
    try {
      val x = f(0).toDouble; val y = f(1).toDouble; val z = f(2).toDouble
      f.length match {
        case 3 | 5 => Some(Pt(x, y, z, None, None))
        case 4 => Some(Pt(x, y, z, Some(f(3).toDouble), None))
        case 6 => Some(Pt(x, y, z, None, Some((f(3).toDouble.toInt, f(4).toDouble.toInt, f(5).toDouble.toInt))))
        case _ => Some(Pt(x, y, z, Some(f(3).toDouble), Some((f(4).toDouble.toInt, f(5).toDouble.toInt, f(6).toDouble.toInt))))
      }
    } catch { case _: NumberFormatException => None }
  }

  /** Serial parse (driver/test face). PTS headers (a lone integer
    * first line) are detected and checked against the row count. */
  def parse(text: String, pts: Boolean = false): Seq[Pt] = {
    val lines = text.linesIterator.toSeq
    if (pts) {
      val declared = lines.headOption.map(_.trim).filter(_.matches("\\d+")).map(_.toLong)
        .getOrElse(throw new IllegalArgumentException("pts: first line must be the point count"))
      val points = lines.drop(1).flatMap(parseLine)
      require(points.length.toLong == declared,
        s"pts: header declares $declared points, parsed ${points.length}")
      points
    } else lines.flatMap(parseLine)
  }

  private val schema = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("z", DoubleType, nullable = false),
    StructField("intensity", DoubleType, nullable = true),
    StructField("red", IntegerType, nullable = true),
    StructField("green", IntegerType, nullable = true),
    StructField("blue", IntegerType, nullable = true)
  ))

  /** Parallel Spark face over the splittable text source. `.pts`
    * count headers parse as a non-point line and drop out naturally;
    * the serial [[parse]] face is the place that VERIFIES them. */
  def pointsTable(s: SparkSession, pathGlob: String): DataFrame = {
    val rows = s.read
      .textFile(pathGlob)
      .rdd
      .flatMap(l => parseLine(l).map { p =>
        Row(p.x, p.y, p.z, p.intensity.orNull,
          p.rgb.map(_._1).orNull, p.rgb.map(_._2).orNull, p.rgb.map(_._3).orNull)
      })
    s.createDataFrame(rows, schema)
  }

  /** Meta face for the extractor chain: count + bounds, like the
    * LAS/PLY sniffs. */
  def meta(text: String): Option[PointCloud.CloudMeta] = {
    val pts = text.linesIterator.flatMap(parseLine).toSeq
    if (pts.isEmpty) None
    else Some(PointCloud.CloudMeta(
      "xyz", pts.length.toLong,
      headerDimensions(text).getOrElse(Seq("X", "Y", "Z")),
      Some((pts.map(_.x).min, pts.map(_.y).min, pts.map(_.z).min,
        pts.map(_.x).max, pts.map(_.y).max, pts.map(_.z).max))
    ))
  }
}
