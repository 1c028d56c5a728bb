package graft

import graft.raster.SensorProfiles
import graft.raster.SensorProfiles.{BandMapping, Profile}

/** Sensor profile registry vs reference semantics —
  * `sensorprofile.cpp:19-35` (Parse), `:254-285` (matchesProfile),
  * `:287-449` (detectSensor cascade), and the band-alignment ref-band
  * rule (`merge_multispectral.cpp:250-258`). */
class SensorProfilesSpec extends SparkSuite {
  import spark.implicits._

  test("BandMapping.parse accepts 4-3-2, 4,3,2, and falls back on junk") {
    assert(BandMapping.parse("4-3-2") === BandMapping(4, 3, 2))
    assert(BandMapping.parse("4,3,2") === BandMapping(4, 3, 2))
    assert(BandMapping.parse("5,4,3,2") === BandMapping(5, 4, 3)) // extra tokens ignored (vals[0..2])
    assert(BandMapping.parse("1-2") === BandMapping(1, 2, 3)) // < 3 values → default
    assert(BandMapping.parse("x,y,z") === BandMapping(1, 2, 3))
    assert(BandMapping(3, 2, 1).toInternalString === "3-2-1")
    assert(BandMapping(3, 2, 1).toApiString === "3,2,1")
  }

  test("detectSensor: priority-ordered profile match with metadata patterns") {
    val (det, id, cat, bm) =
      SensorProfiles.detectSensor(5, "UInt16", Seq("Sensor: MicaSense RedEdge-M"), lastBandIsAlpha = false)
    assert(det && id === "micasense-rededge" && cat === "multispectral" && bm === BandMapping(3, 2, 1))
    // same shape without the pattern → the lower-priority generic profile
    val (det2, id2, _, _) =
      SensorProfiles.detectSensor(5, "UInt16", Seq("unknown rig"), lastBandIsAlpha = false)
    assert(det2 && id2 === "generic-5band")
  }

  test("detectSensor: RGBA and RGB Byte short-circuits (ref :316-327)") {
    assert(!SensorProfiles.detectSensor(4, "Byte", Seq("DJI"), lastBandIsAlpha = true)._1)
    assert(!SensorProfiles.detectSensor(3, "Byte", Nil, lastBandIsAlpha = false)._1)
  }

  test("detectSensor: alpha-effective band count still matches (ref :259-262)") {
    // 6 bands with alpha → effective 5 → micasense matches
    val (det, id, _, _) =
      SensorProfiles.detectSensor(6, "UInt16", Seq("MicaSense"), lastBandIsAlpha = true)
    assert(det && id === "micasense-rededge")
  }

  test("detectSensor: thermal profile and multiband fallback (ref :420-445)") {
    val (det, id, cat, _) = SensorProfiles.detectSensor(1, "Float32", Seq("FLIR Duo"), lastBandIsAlpha = false)
    assert(det && id === "flir-thermal" && cat === "thermal")
    // no profile, >3 bands, non-Byte → fallback multispectral 1-2-3
    val (det2, id2, cat2, bm2) = SensorProfiles.detectSensor(6, "Float32", Nil, lastBandIsAlpha = false)
    assert(det2 && id2 === "" && cat2 === "multispectral" && bm2 === BandMapping(1, 2, 3))
    // no profile, 2 bands → undetected
    assert(!SensorProfiles.detectSensor(2, "UInt16", Nil, lastBandIsAlpha = false)._1)
  }

  test("resolveBands feeds vegetation formulas from profile band names") {
    val mica = SensorProfiles.defaultProfiles.find(_.id == "micasense-rededge").get
    val ndvi = SensorProfiles.resolveBands(mica, Set("red", "nir"))
    assert(ndvi === Some(Map("red" -> 3, "nir" -> 5)))
    assert(SensorProfiles.resolveBands(mica, Set("red", "swir")) === None)
  }

  test("band alignment: ref band is first Green-or-540-570, else band 0") {
    val bands = Seq(
      // capture 1: Green present at idx 2 → ref 2
      (1L, 0, "Red", 668), (1L, 1, "NIR", 842), (1L, 2, "Green", 560),
      // capture 2: no Green name but λ=550 at idx 1 → ref 1
      (2L, 0, "Red", 668), (2L, 1, "PanA", 550),
      // capture 3: nothing matches → ref 0
      (3L, 0, "Red", 668), (3L, 1, "NIR", 842)
    ).toDF("capture_id", "band_idx", "band_name", "wavelength")
      .selectExpr(
        "capture_id", "band_idx", "band_name", "wavelength",
        "CAST(band_idx AS DOUBLE) / 16 AS pp_x", "0.0 AS pp_y",
        "0.00390625 AS pitch_x", "0.00390625 AS pitch_y",
        "TRUE AS has_pp", "TRUE AS has_pitch",
        "0.0 AS roc_x", "0.0 AS roc_y", "FALSE AS has_roc"
      )
    val out = SensorProfiles.detectBandAlignment(bands)
    // PrincipalPoint source everywhere (shifts up to 32 px > 1.5 gate);
    // the ref band of each capture has shift exactly 0
    val zeroShift = out
      .filter($"shift_x" === 0.0 && $"shift_y" === 0.0)
      .select("capture_id", "band_idx").as[(Long, Int)].collect().toSet
    assert(zeroShift.contains((1L, 2)) && zeroShift.contains((2L, 1)) && zeroShift.contains((3L, 0)))
    assert(out.filter($"shift_source" === "PrincipalPoint").count() === 7)
  }

  test("band alignment: DJI RelOC outranks PrincipalPoint; thermal flag from LWIR/λ") {
    val bands = Seq(
      (1L, 0, "Green", 560, true), (1L, 1, "LWIR", 10500, true), (1L, 2, "NIR", 842, true)
    ).toDF("capture_id", "band_idx", "band_name", "wavelength", "has_roc")
      .selectExpr(
        "capture_id", "band_idx", "band_name", "wavelength",
        "CAST(band_idx AS DOUBLE) / 16 AS pp_x", "0.0 AS pp_y", // PP shifts would be large
        "0.00390625 AS pitch_x", "0.00390625 AS pitch_y",
        "TRUE AS has_pp", "TRUE AS has_pitch",
        "CAST(band_idx AS DOUBLE) / 4 AS roc_x", "0.0 AS roc_y", "has_roc"
      )
    val out = SensorProfiles.detectBandAlignment(bands).collect()
    assert(out.forall(_.getAs[String]("shift_source") === "DJI_RelativeOpticalCenter"))
    val lwir = out.find(_.getAs[String]("band_name") === "LWIR").get
    assert(lwir.getAs[Boolean]("is_thermal"))
    assert(lwir.getAs[Double]("shift_x") === 0.25) // roc delta vs Green ref, NOT the PP shift
    assert(out.count(_.getAs[Boolean]("is_thermal")) === 1)
  }

  // --- shipped registry: the reference's real data/sensor-profiles.json ---

  private def shipped: Option[Seq[Profile]] =
    SensorProfiles.resolved.map { case (_, bytes) =>
      SensorProfiles.fromJson(new String(bytes, "UTF-8"))
    }

  test("fromJson parses the shipped registry: 17 profiles, priority-desc") {
    shipped match {
      case None => cancel("sensor-profiles.json asset not deployed")
      case Some(ps) =>
        assert(ps.size === 17)
        assert(ps.map(_.priority) === ps.map(_.priority).sorted.reverse)
        val s2 = ps.find(_.id === "sentinel-2").get
        assert(s2.category === "multispectral")
        assert(s2.bandCount === 13 && s2.dataType === "UInt16" && s2.priority === 10)
        assert(s2.patterns.contains("S2A_") && s2.patterns.contains("SENTINEL2"))
        assert(s2.mapping === BandMapping(4, 3, 2)) // true-color default preset
        assert(s2.bands.size === 13)
        val nir = s2.bands.find(_.name === "NIR").get
        assert(nir.index === 8 && nir.wavelength === 842)
        // dataType absent in JSON → "" (any) — landsat-5-tm
        assert(ps.find(_.id === "landsat-5-tm").get.dataType === "")
        // patterns absent → always-match generic
        assert(ps.find(_.id === "generic-4band").get.patterns.isEmpty)
        assert(ps.find(_.id === "dji-mavic-3m").get.mapping === BandMapping(4, 1, 2))
    }
  }

  test("detection cascade over the shipped registry matches its entries") {
    shipped match {
      case None => cancel("sensor-profiles.json asset not deployed")
      case Some(ps) =>
        val (d1, id1, _, bm1) =
          SensorProfiles.detectSensor(13, "UInt16", Seq("S2A_MSIL2A_20240101"), lastBandIsAlpha = false, ps)
        assert(d1 && id1 === "sentinel-2" && bm1 === BandMapping(4, 3, 2))
        // RedEdge-P (priority 12) outranks plain micasense-rededge (10)
        val (d2, id2, _, _) =
          SensorProfiles.detectSensor(5, "UInt16", Seq("MicaSense RedEdge-P"), lastBandIsAlpha = false, ps)
        assert(d2 && id2 === "micasense-rededge-p")
        // pattern-free generic-4band catches unknown 4-band UInt16 rigs
        val (d3, id3, _, _) =
          SensorProfiles.detectSensor(4, "UInt16", Seq("no patterns here"), lastBandIsAlpha = false, ps)
        assert(d3 && id3 === "generic-4band")
        // thermal: dataType-free profile matches Float32 radiometric tiffs
        val (d4, id4, cat4, _) =
          SensorProfiles.detectSensor(1, "Float32", Seq("FLIR Vue Pro R"), lastBandIsAlpha = false, ps)
        assert(d4 && id4 === "flir-vue-pro-r" && cat4 === "thermal")
        // landsat-5: dataType "" accepts Byte at 7 bands (no RGB short-circuit)
        val (d5, id5, _, _) =
          SensorProfiles.detectSensor(7, "Byte", Seq("LT05_L1TP"), lastBandIsAlpha = false, ps)
        assert(d5 && id5 === "landsat-5-tm")
    }
  }
}
