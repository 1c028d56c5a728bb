package graft.sources

/** Flight telemetry derived from EXIF + XMP — the reference's
  * `extractCameraOrientation` / `extractFlightSpeed` /
  * `extractGpsAccuracy` / `extractGpsDirection` cascade
  * (`exif.cpp:667-830`) and the properties `entry.cpp:182-227` emits
  * from them (cameraYaw/Pitch/Roll + hasCameraOrientation,
  * flightSpeed{,3D,X,Y,Z}, gpsXYAccuracy/gpsZAccuracy/gpsDop,
  * gpsImgDirection{,Ref} / gpsTrack{,Ref}). Behavior matrix from
  * `tests/flight_speed_test.cpp` and `tests/gps_metadata_test.cpp`.
  */
object FlightMeta {

  /** Orientation with the (-90, 0, 0) nadir default when no source
    * tag is present; `has` distinguishes defaulted from measured. */
  final case class CameraOrientation(pitch: Double, yaw: Double, roll: Double, has: Boolean)

  final case class FlightSpeed(x: Double, y: Double, z: Double) {
    def horizontal: Double = math.sqrt(x * x + y * y)
    def magnitude: Double = math.sqrt(x * x + y * y + z * z)
  }

  final case class GpsAccuracy(xyAccuracy: Option[Double], zAccuracy: Option[Double], dop: Option[Double])

  final case class GpsDirection(
      imgDirection: Option[Double],
      imgDirectionRef: String,
      track: Option[Double],
      trackRef: String
  )

  /** All three gimbal angles must resolve (dji → Camera-namespace
    * fallback handled inside [[Xmp.parse]]); otherwise the nadir
    * default. senseFly rigs report gimbal-relative angles — pitch
    * shifts by -90 and roll flips (exif.cpp:685-690). */
  def cameraOrientation(xmp: Xmp.XmpData, make: Option[String]): CameraOrientation =
    (xmp.gimbalPitch, xmp.gimbalYaw, xmp.gimbalRoll) match {
      case (Some(p), Some(y), Some(r)) =>
        if (make.contains("senseFly")) CameraOrientation(p - 90, y, -r, has = true)
        else CameraOrientation(p, y, r, has = true)
      case _ => CameraOrientation(-90, 0, 0, has = false)
    }

  /** Priority 1: the DJI XMP 3D vector (all three components);
    * priority 2: scalar EXIF GPSSpeed converted to m/s by its ref
    * unit (K km/h, M mph, N knots; unknown falls back to km/h),
    * stored as (speed, 0, 0). */
  def flightSpeed(xmp: Xmp.XmpData, exif: Exif.ExifData): Option[FlightSpeed] =
    (xmp.flightXSpeed, xmp.flightYSpeed, xmp.flightZSpeed) match {
      case (Some(x), Some(y), Some(z)) => Some(FlightSpeed(x, y, z))
      case _ =>
        exif.gpsSpeed.map { v =>
          val ms = exif.gpsSpeedRef.getOrElse("K") match {
            case "K" => v / 3.6
            case "M" => v / 2.237
            case "N" => v / 1.944
            case _ => v / 3.6
          }
          FlightSpeed(ms, 0, 0)
        }
    }

  /** Camera-namespace XY/Z accuracy → DJI RTK standard deviations
    * (xy = hypot(stdLon, stdLat)) → EXIF GPSHPositioningError +
    * GPSDOP. Returns None when no source has data. */
  def gpsAccuracy(xmp: Xmp.XmpData, exif: Exif.ExifData): Option[GpsAccuracy] = {
    val p1 =
      if (xmp.gpsXYAccuracy.isDefined || xmp.gpsZAccuracy.isDefined)
        Some(GpsAccuracy(xmp.gpsXYAccuracy, xmp.gpsZAccuracy, None))
      else None
    val p2 = p1.orElse {
      val xy = for (lo <- xmp.rtkStdLon; la <- xmp.rtkStdLat) yield math.sqrt(lo * lo + la * la)
      if (xy.isDefined || xmp.rtkStdHgt.isDefined) Some(GpsAccuracy(xy, xmp.rtkStdHgt, None))
      else None
    }
    p2.orElse {
      if (exif.gpsHPositioningError.isDefined || exif.gpsDop.isDefined)
        Some(GpsAccuracy(exif.gpsHPositioningError, None, exif.gpsDop))
      else None
    }
  }

  /** GPSImgDirection / GPSTrack with their T (true north, default) /
    * M (magnetic) references. None when neither is present. */
  def gpsDirection(exif: Exif.ExifData): Option[GpsDirection] =
    if (exif.gpsImgDirection.isDefined || exif.gpsTrack.isDefined)
      Some(GpsDirection(
        exif.gpsImgDirection,
        exif.gpsImgDirectionRef.getOrElse("T"),
        exif.gpsTrack,
        exif.gpsTrackRef.getOrElse("T")
      ))
    else None

  /** The property-JSON fragments entry.cpp:182-227 emits (numbers
    * formatted like the rest of the extractor properties). */
  def propertyFields(xmp: Xmp.XmpData, exif: Exif.ExifData): Seq[String] = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val ori = cameraOrientation(xmp, exif.make)
    val speed = flightSpeed(xmp, exif)
    val acc = gpsAccuracy(xmp, exif)
    val dir = gpsDirection(exif)
    Seq(
      Some(s""""cameraRoll":${ori.roll}"""),
      Some(s""""hasCameraOrientation":${ori.has}""")
    ).flatten ++
      speed.toSeq.flatMap(sp => Seq(
        s""""flightSpeed":${sp.horizontal}""",
        s""""flightSpeed3D":${sp.magnitude}""",
        s""""flightSpeedX":${sp.x}""",
        s""""flightSpeedY":${sp.y}""",
        s""""flightSpeedZ":${sp.z}"""
      )) ++
      acc.toSeq.flatMap(a =>
        a.xyAccuracy.map(v => s""""gpsXYAccuracy":$v""").toSeq ++
          a.zAccuracy.map(v => s""""gpsZAccuracy":$v""").toSeq ++
          a.dop.map(v => s""""gpsDop":$v""").toSeq) ++
      dir.toSeq.flatMap(d =>
        d.imgDirection.map(v => s""""gpsImgDirection":$v,"gpsImgDirectionRef":${q(d.imgDirectionRef)}""").toSeq ++
          d.track.map(v => s""""gpsTrack":$v,"gpsTrackRef":${q(d.trackRef)}""").toSeq)
  }
}
