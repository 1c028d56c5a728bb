package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Exif, FlightMeta, Xmp}

/** Flight telemetry cascade (exif.cpp:667-830), behavior matrix from
  * flight_speed_test.cpp / gps_metadata_test.cpp. */
class FlightMetaSpec extends AnyFunSuite {

  private def xmp(fields: (String, Double)*): Xmp.XmpData =
    Xmp.parse(
      "<x:xmpmeta><rdf:Description " +
        fields.map { case (k, v) => s"""$k="$v"""" }.mkString(" ") +
        " /></x:xmpmeta>")

  private val noExif = Exif.empty

  test("FlightSpeed value object: horizontal and 3D magnitudes, negative components") {
    val s = FlightMeta.FlightSpeed(3.0, 4.0, 12.0)
    assert(s.horizontal == 5.0)
    assert(s.magnitude == 13.0)
    val neg = FlightMeta.FlightSpeed(-3.0, -4.0, -12.0)
    assert(neg.horizontal == 5.0 && neg.magnitude == 13.0)
    assert(FlightMeta.FlightSpeed(0, 0, 0).magnitude == 0.0)
    val small = FlightMeta.FlightSpeed(0.5, 0.5, 0.1) // small drone speeds stay exact
    assert(math.abs(small.horizontal - math.sqrt(0.5)) < 1e-12)
  }

  test("DJI XMP vector wins; EXIF GPSSpeed is the scalar fallback with unit conversion") {
    val dji = xmp("drone-dji:FlightXSpeed" -> 2.0, "drone-dji:FlightYSpeed" -> -1.5, "drone-dji:FlightZSpeed" -> 0.3)
    val viaDji = FlightMeta.flightSpeed(dji, noExif.copy(gpsSpeed = Some(100.0), gpsSpeedRef = Some("K")))
    assert(viaDji.contains(FlightMeta.FlightSpeed(2.0, -1.5, 0.3)))
    // a PARTIAL DJI vector does not count (all three components required)
    val partial = xmp("drone-dji:FlightXSpeed" -> 2.0)
    assert(FlightMeta.flightSpeed(partial, noExif).isEmpty)
    // GPSSpeed unit refs: K km/h, M mph, N knots, default/unknown K
    def sp(v: Double, ref: Option[String]) =
      FlightMeta.flightSpeed(Xmp.empty, noExif.copy(gpsSpeed = Some(v), gpsSpeedRef = ref)).get
    assert(math.abs(sp(36.0, Some("K")).x - 10.0) < 1e-9)
    assert(math.abs(sp(22.37, Some("M")).x - 10.0) < 1e-3)
    assert(math.abs(sp(19.44, Some("N")).x - 10.0) < 1e-3)
    assert(math.abs(sp(36.0, None).x - 10.0) < 1e-9)
    assert(math.abs(sp(36.0, Some("X")).x - 10.0) < 1e-9) // unknown → km/h
    assert(sp(36.0, Some("K")).y == 0.0 && sp(36.0, Some("K")).z == 0.0)
    assert(FlightMeta.flightSpeed(Xmp.empty, noExif).isEmpty)
  }

  test("camera orientation: all-three requirement, nadir default, senseFly correction") {
    val full = xmp("drone-dji:GimbalPitchDegree" -> -45.0, "drone-dji:GimbalYawDegree" -> 90.0,
      "drone-dji:GimbalRollDegree" -> 5.0)
    val ori = FlightMeta.cameraOrientation(full, Some("DJI"))
    assert(ori.has && ori.pitch == -45.0 && ori.yaw == 90.0 && ori.roll == 5.0)
    // missing any angle → the (-90, 0, 0) default, has = false
    val partial = xmp("drone-dji:GimbalPitchDegree" -> -45.0)
    val d = FlightMeta.cameraOrientation(partial, Some("DJI"))
    assert(!d.has && d.pitch == -90.0 && d.yaw == 0.0 && d.roll == 0.0)
    // senseFly: pitch += -90, roll flips
    val sf = FlightMeta.cameraOrientation(
      xmp("Camera:Pitch" -> 10.0, "Camera:Yaw" -> 20.0, "Camera:Roll" -> 3.0), Some("senseFly"))
    assert(sf.has && sf.pitch == -80.0 && sf.yaw == 20.0 && sf.roll == -3.0)
    // FlightYawDegree is a yaw fallback
    val fy = xmp("drone-dji:FlightYawDegree" -> 33.0, "drone-dji:GimbalPitchDegree" -> -90.0,
      "drone-dji:GimbalRollDegree" -> 0.0)
    assert(FlightMeta.cameraOrientation(fy, None).yaw == 33.0)
  }

  test("GPS accuracy priority: Camera namespace > DJI RTK > EXIF HPosError/DOP") {
    val cam = xmp("Camera:GPSXYAccuracy" -> 0.5, "Camera:GPSZAccuracy" -> 0.8,
      "drone-dji:RtkStdLon" -> 9.0, "drone-dji:RtkStdLat" -> 9.0)
    val a1 = FlightMeta.gpsAccuracy(cam, noExif.copy(gpsHPositioningError = Some(99.0))).get
    assert(a1.xyAccuracy.contains(0.5) && a1.zAccuracy.contains(0.8) && a1.dop.isEmpty)
    // RTK: xy = hypot(stdLon, stdLat)
    val rtk = xmp("drone-dji:RtkStdLon" -> 3.0, "drone-dji:RtkStdLat" -> 4.0, "drone-dji:RtkStdHgt" -> 2.0)
    val a2 = FlightMeta.gpsAccuracy(rtk, noExif).get
    assert(a2.xyAccuracy.contains(5.0) && a2.zAccuracy.contains(2.0))
    // EXIF fallback carries the DOP too
    val a3 = FlightMeta.gpsAccuracy(Xmp.empty, noExif.copy(gpsHPositioningError = Some(1.5), gpsDop = Some(0.9))).get
    assert(a3.xyAccuracy.contains(1.5) && a3.dop.contains(0.9) && a3.zAccuracy.isEmpty)
    assert(FlightMeta.gpsAccuracy(Xmp.empty, noExif).isEmpty)
  }

  test("GPS direction: img direction and track with T default refs") {
    val d = FlightMeta.gpsDirection(noExif.copy(
      gpsImgDirection = Some(123.5), gpsTrack = Some(88.0), gpsTrackRef = Some("M"))).get
    assert(d.imgDirection.contains(123.5) && d.imgDirectionRef == "T")
    assert(d.track.contains(88.0) && d.trackRef == "M")
    assert(FlightMeta.gpsDirection(noExif).isEmpty)
  }

  test("property fields match the entry.cpp emission shape") {
    val x = xmp("drone-dji:GimbalPitchDegree" -> -90.0, "drone-dji:GimbalYawDegree" -> 10.0,
      "drone-dji:GimbalRollDegree" -> 1.0,
      "drone-dji:FlightXSpeed" -> 3.0, "drone-dji:FlightYSpeed" -> 4.0, "drone-dji:FlightZSpeed" -> 0.0)
    val props = FlightMeta.propertyFields(x, noExif.copy(gpsImgDirection = Some(45.0))).mkString("{", ",", "}")
    assert(props.contains("\"cameraRoll\":1.0") && props.contains("\"hasCameraOrientation\":true"))
    assert(props.contains("\"flightSpeed\":5.0") && props.contains("\"flightSpeed3D\":5.0"))
    assert(props.contains("\"flightSpeedX\":3.0") && props.contains("\"flightSpeedY\":4.0"))
    assert(props.contains("\"gpsImgDirection\":45.0") && props.contains("\"gpsImgDirectionRef\":\"T\""))
    // without sources: just the defaulted orientation pair
    val bare = FlightMeta.propertyFields(Xmp.empty, noExif).mkString(",")
    assert(bare.contains("\"cameraRoll\":0.0") && bare.contains("\"hasCameraOrientation\":false"))
    assert(!bare.contains("flightSpeed") && !bare.contains("gps"))
  }
}
