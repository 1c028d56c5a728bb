package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Camera sensor-width database — the Spark re-expression of
  * `src/library/sensor_data.cpp` (SensorData::contains/getFocal: a
  * `sensors(id TEXT PRIMARY KEY, focal REAL)` SQLite lookup keyed by
  * the normalized "make model" string) and the sensor-size cascade of
  * `src/library/exif.cpp:195-232` (`extractSensorSize`: focal-plane
  * EXIF tags first, database second).
  *
  * The database file itself (`data/sensor_data.sqlite`, built by
  * `data/create_sensor_data.py` from the public OpenSfM / AliceVision
  * sensor tables) is read with the pure-JVM [[Sqlite]] reader — a
  * real-world conformance fixture for that reader. At query scale the
  * table is a ~7.5k-row broadcast dimension: EXIF make/model joins
  * against it map-side, never a shuffle.
  */
object SensorData {

  /** Deployment contract (see [[Assets]]): GRAFT_SENSOR_DB env override →
    * bundled resource → in-sandbox reference checkout. */
  def resolved: Option[(String, Array[Byte])] =
    Assets.resolve("GRAFT_SENSOR_DB", "sensor_data.sqlite", "/root/reference/data/sensor_data.sqlite")

  /** Parse a sensor_data.sqlite image into id → focal (sensor width,
    * mm). SQLite stores integral REALs as integers on disk (REAL
    * affinity) — coerce Longs back to Double like its cursor does. */
  def load(bytes: Array[Byte]): Map[String, Double] =
    Sqlite.readTable(bytes, "sensors")._2.flatMap { r =>
      (r.headOption, r.lift(1)) match {
        case (Some(id: String), Some(d: Double)) => Some(id -> d)
        case (Some(id: String), Some(l: Long)) => Some(id -> l.toDouble)
        case _ => None
      }
    }.toMap

  /** The shipped database, loaded once per JVM; empty when no copy
    * resolves (callers fall back to [[fallback]]). */
  lazy val default: Map[String, Double] =
    resolved.map(_._2).map { bytes =>
      try load(bytes) catch { case _: Exception => Map.empty[String, Double] }
    }.getOrElse(Map.empty)

  /** Small built-in subset (values read from the shipped asset; the
    * SensorDataSpec asserts they stay in sync) so footprint math
    * degrades gracefully when the database file is not deployed. */
  val fallback: Map[String, Double] = Map(
    "dji fc220" -> 6.17,
    "dji fc300x" -> 6.2,
    "dji fc330" -> 6.25,
    "dji fc6310" -> 13.2,
    "dji fc7303" -> 6.16,
    "hasselblad l1d-20c" -> 13.2,
    "gopro hero4 silver" -> 6.17,
    "parrot anafi" -> 5.9,
    "sony ilce-7rm2" -> 35.9,
    "canon eos 5d mark iii" -> 36.0,
    "nikon d750" -> 35.9,
    "phantom vision fc200" -> 6.17
  )

  def contains(sensor: String): Boolean =
    default.contains(sensor) || fallback.contains(sensor)

  def getFocal(sensor: String): Option[Double] =
    default.get(sensor).orElse(fallback.get(sensor))

  /** "${make} ${model}" lowercase with the make string removed from
    * the model — `exif.cpp:142-165` (extractSensor). Missing fields
    * read as "unknown" like the reference's extractMake/extractModel. */
  def extractSensor(make: Option[String], model: Option[String]): String = {
    val mk0 = make.map(_.trim).filter(_.nonEmpty).getOrElse("unknown")
      .toLowerCase(java.util.Locale.ROOT)
    var md = model.map(_.trim).filter(_.nonEmpty).getOrElse("unknown")
      .toLowerCase(java.util.Locale.ROOT)
    if (mk0 != "unknown") {
      var pos = md.indexOf(mk0)
      while (pos >= 0) {
        md = md.substring(0, pos) + md.substring(pos + mk0.length)
        pos = md.indexOf(mk0)
      }
    }
    mk0.trim + " " + md.trim
  }

  /** mm per FocalPlaneResolutionUnit — `exif.cpp:236-258`. 0.0 =
    * unknown unit (cascade falls through to the database). */
  def mmPerUnit(resolutionUnit: Long): Double = resolutionUnit match {
    case 2 => 25.4 // inch
    case 3 => 10.0 // cm
    case 4 => 1.0 // mm
    case 5 => 0.001 // um
    case _ => 0.0
  }

  /** Fleet sensor ids for [[sensorFocalQuery]] — all present in the
    * shipped database; order is the dispatch order (custkey % 12). */
  val fleetSensors: Seq[String] = Seq(
    "dji fc220", "dji fc300x", "dji fc330", "dji fc6310",
    "dji fc7303", "hasselblad l1d-20c", "gopro hero4 silver",
    "parrot anafi", "sony ilce-7rm2", "canon eos 5d mark iii",
    "nikon d750", "phantom vision fc200"
  )

  /** ◆ q_sensor_focal — sensor-width dimension join + computeFocal
    * math (`exif.cpp:167-191`): a synthetic camera fleet keyed off
    * customer rows resolves its sensor width from the REAL shipped
    * sensor_data.sqlite (broadcast ~7.5k-row dim; [[fallback]] only if
    * the asset is absent) and converts 35mm-equivalent focal lengths
    * to true mm. The oracle mirrors the fleet derivation and inlines
    * the expected (id, width) pairs — if the pure-JVM SQLite reader
    * misparses the asset, the hash diverges. */
  def sensorFocalQuery(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val dim = s.createDataFrame(
      fleetSensors.map(id => (id, getFocal(id).getOrElse(Double.NaN)))
    ).toDF("sensor_id", "width_mm")
    val fleet = graft.Tables.customer(s, dir)
      .filter($"c_custkey" <= 600)
      .select(
        $"c_custkey",
        element_at(
          array(fleetSensors.map(lit): _*),
          ($"c_custkey" % 12).cast("int") + 1
        ).as("sensor_id"),
        (lit(24.0) + ($"c_custkey" % 40).cast("double")).as("focal35")
      )
    fleet
      .join(broadcast(dim), "sensor_id")
      .withColumn("focal_mm", round($"focal35" / 36.0 * $"width_mm", 6))
      .groupBy($"sensor_id", $"width_mm")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"focal_mm"), 6).as("focal_mm_sum")
      )
  }

  /** Sensor (width, height) in mm — the `extractSensorSize` cascade:
    * focal-plane resolution tags when present and decodable, else the
    * database keyed by normalized make/model (height scaled from the
    * image aspect, `exif.cpp:225-229`), else None. */
  def sensorSizeMm(
      exif: Exif.ExifData,
      imageWidth: Int,
      imageHeight: Int
  ): Option[(Double, Double)] = {
    val byPlane = for {
      unit <- exif.focalPlaneResolutionUnit
      xr <- exif.focalPlaneXResolution if xr > 0
      yr <- exif.focalPlaneYResolution if yr > 0
      mm = mmPerUnit(unit.toLong) if mm != 0.0
    } yield (imageWidth * (1.0 / xr) * mm, imageHeight * (1.0 / yr) * mm)
    byPlane.orElse {
      getFocal(extractSensor(exif.make, exif.model)).map { w =>
        (w, if (imageWidth > 0) w / imageWidth * imageHeight else w)
      }
    }
  }
}
