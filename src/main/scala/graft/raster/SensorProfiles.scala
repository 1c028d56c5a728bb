package graft.raster

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sensor profile registry + band mapping + multispectral band
  * alignment detection — the Spark re-expression of
  * `src/library/sensorprofile.cpp` (`BandMapping::Parse` :19-35,
  * `matchesProfile` :254-285, `detectSensor` :287-449,
  * `getFallbackMapping` :471-503) and
  * `src/library/merge_multispectral.cpp:50-338`
  * (`detectBandAlignment`: per-band XMP stats → reference-band
  * selection → shift-source priority → per-band pixel shifts).
  *
  * The reference detects ONE raster at a time through GDAL handles;
  * here detection is a relational query over a raster-metadata table
  * (band_count, data_type, metadata, alpha flag) joined against the
  * small broadcast profile registry — the bulk shape that classifies
  * a 100 TB estate's rasters in one pass. Alignment detection runs
  * per capture group (`groupBy capture_id` + windows), one rig
  * capture = one bounded group.
  */
object SensorProfiles {

  /** Band mapping r/g/b (1-based band indexes) — ref
    * `sensorprofile.h:16-28`. */
  final case class BandMapping(r: Int = 1, g: Int = 2, b: Int = 3) {
    def toInternalString: String = s"$r-$g-$b" // ref :37-39
    def toApiString: String = s"$r,$g,$b" // ref :41-43
  }

  object BandMapping {
    /** Accept both "4-3-2" and "4,3,2" — ref `BandMapping::Parse`
      * (:19-35). Fewer than 3 parseable ints → default 1-2-3 (the
      * reference leaves the default-constructed mapping). */
    def parse(s: String): BandMapping = {
      val sep = if (s.contains(',')) ',' else '-'
      val vals = s.split(sep).toSeq.flatMap(t => t.trim.toIntOption)
      if (vals.size >= 3) BandMapping(vals(0), vals(1), vals(2)) else BandMapping()
    }
  }

  final case class BandInfo(index: Int, name: String, wavelength: Int = 0, domain: String = "optical")

  final case class Profile(
      id: String,
      name: String,
      category: String, // "multispectral" | "thermal"
      priority: Int,
      bandCount: Int,
      dataType: String, // "" = any
      patterns: Seq[String], // substring match, any-of; empty = always
      mapping: BandMapping,
      bands: Seq[BandInfo] = Nil
  )

  /** Default registry — the shape of the reference's
    * sensor-profiles.json (registry content ships as data there;
    * these mirror its common rig families). Priority-desc order is
    * the match order (ref :168-170). */
  val defaultProfiles: Seq[Profile] = Seq(
    Profile(
      "micasense-rededge", "MicaSense RedEdge", "multispectral", 100, 5, "UInt16",
      Seq("RedEdge", "MicaSense"), BandMapping(3, 2, 1),
      Seq(
        BandInfo(1, "Blue", 475), BandInfo(2, "Green", 560), BandInfo(3, "Red", 668),
        BandInfo(4, "RedEdge", 717), BandInfo(5, "NIR", 842)
      )
    ),
    Profile(
      "dji-multispectral", "DJI Multispectral", "multispectral", 90, 4, "UInt16",
      Seq("DJI"), BandMapping(3, 2, 1),
      Seq(BandInfo(1, "Green", 560), BandInfo(2, "Red", 650), BandInfo(3, "RedEdge", 730), BandInfo(4, "NIR", 860))
    ),
    Profile(
      "flir-thermal", "FLIR Thermal", "thermal", 80, 1, "Float32",
      Seq("FLIR", "thermal"), BandMapping(1, 1, 1),
      Seq(BandInfo(1, "LWIR", 10500, domain = "thermal"))
    ),
    Profile(
      "generic-5band", "Generic 5-band", "multispectral", 10, 5, "UInt16",
      Nil, BandMapping(3, 2, 1),
      Seq(
        BandInfo(1, "Blue", 475), BandInfo(2, "Green", 560), BandInfo(3, "Red", 668),
        BandInfo(4, "RedEdge", 717), BandInfo(5, "NIR", 842)
      )
    ),
    Profile(
      "generic-4band", "Generic 4-band", "multispectral", 9, 4, "UInt16",
      Nil, BandMapping(3, 2, 1),
      Seq(BandInfo(1, "Blue", 475), BandInfo(2, "Green", 560), BandInfo(3, "Red", 668), BandInfo(4, "NIR", 842))
    )
  )

  /** Parse the reference's `sensor-profiles.json` registry format —
    * `sensorprofile.cpp` from_json (:50-129, field-for-field) +
    * ensureLoaded's priority-desc sort (:168-170) + detectSensor's
    * default-preset selection (:391-408: first isDefault preset's
    * bandMapping, else the first bands-type preset's). Unknown keys
    * (descriptions, presets' colormaps/formulas) are render concerns
    * and are skipped. */
  def fromJson(text: String): Seq[Profile] = {
    import graft.core.MiniJson
    val root = MiniJson.obj(MiniJson.parse(text))
    val raw = root.get("profiles").map(MiniJson.arr).getOrElse(Vector.empty)
    raw.map { pv =>
      val p = MiniJson.obj(pv)
      val det = MiniJson.obj(p("detection"))
      val bands = p.get("bands").map(MiniJson.arr).getOrElse(Vector.empty).map { bv =>
        val b = MiniJson.obj(bv)
        BandInfo(
          MiniJson.num(b("index")).toInt,
          MiniJson.str(b("name")),
          b.get("wavelength").map(MiniJson.num(_).toInt).getOrElse(0),
          b.get("domain").map(MiniJson.str).getOrElse("optical")
        )
      }
      val presets = p.get("presets").map(MiniJson.arr).getOrElse(Vector.empty).map(MiniJson.obj)
      def mappingOf(pr: Map[String, Any]): BandMapping =
        pr.get("bandMapping").map(MiniJson.obj).map { m =>
          BandMapping(
            MiniJson.num(m("r")).toInt,
            MiniJson.num(m("g")).toInt,
            MiniJson.num(m("b")).toInt
          )
        }.getOrElse(BandMapping())
      val defaultMapping = presets.find(_.get("isDefault").contains(true)).map(mappingOf)
        .orElse(
          presets.find(pr =>
            pr.get("type").forall(t => MiniJson.str(t) == "bands")
          ).map(mappingOf)
        )
        .getOrElse(BandMapping())
      Profile(
        id = MiniJson.str(p("id")),
        name = MiniJson.str(p("name")),
        category = MiniJson.str(p("sensorCategory")),
        priority = det.get("priority").map(MiniJson.num(_).toInt).getOrElse(0),
        bandCount = MiniJson.num(det("bandCount")).toInt,
        dataType = det.get("dataType").map(MiniJson.str).getOrElse(""),
        patterns = det.get("metadataPatterns").map(MiniJson.arr).getOrElse(Vector.empty).map(MiniJson.str),
        mapping = defaultMapping,
        bands = bands
      )
    }.sortBy(-_.priority)
  }

  /** Deployment contract (see [[graft.sources.Assets]]): env override →
    * bundled resource → in-sandbox reference checkout. */
  def resolved: Option[(String, Array[Byte])] =
    graft.sources.Assets.resolve(
      "GRAFT_SENSOR_PROFILES", "sensor-profiles.json", "/root/reference/data/sensor-profiles.json")

  /** The shipped registry when deployed, else [[defaultProfiles]]. */
  lazy val shippedProfiles: Seq[Profile] =
    resolved.map { case (_, bytes) =>
      try fromJson(new String(bytes, "UTF-8"))
      catch { case _: Exception => defaultProfiles }
    }.getOrElse(defaultProfiles)

  /** Scalar detection for one raster — the reference's exact decision
    * cascade (`detectSensor` :287-449): RGBA/RGB short-circuits,
    * priority-ordered profile match (band count vs alpha-effective
    * count, data type, any-of substring patterns), then the
    * multiband-non-Byte fallback. Returns (detected, sensorId,
    * category, mapping). */
  def detectSensor(
      bandCount: Int,
      dataType: String,
      metadata: Seq[String],
      lastBandIsAlpha: Boolean,
      profiles: Seq[Profile] = defaultProfiles
  ): (Boolean, String, String, BandMapping) = {
    if (bandCount == 0) return (false, "", "", BandMapping())
    if (bandCount == 4 && dataType == "Byte" && lastBandIsAlpha) // RGBA, ref :316-320
      return (false, "", "", BandMapping())
    if (bandCount == 3 && dataType == "Byte") // plain RGB, ref :323-327
      return (false, "", "", BandMapping())
    val effective = if (lastBandIsAlpha) bandCount - 1 else bandCount
    val hit = profiles
      .filter(p => p.category == "multispectral" || p.category == "thermal")
      .sortBy(-_.priority)
      .find { p =>
        (p.bandCount == effective || p.bandCount == bandCount) && // ref :259-262
        (p.dataType.isEmpty || p.dataType == dataType) && // ref :265-267
        (p.patterns.isEmpty || p.patterns.exists(pat => metadata.exists(_.contains(pat)))) // ref :270-282
      }
    hit match {
      case Some(p) => (true, p.id, p.category, p.mapping)
      case None if bandCount > 3 && dataType != "Byte" => // fallback, ref :420-445
        (true, "", "multispectral", BandMapping(1, 2, 3))
      case None => (false, "", "", BandMapping())
    }
  }

  /** Resolve the named bands a vegetation formula needs against a
    * detected profile — closes the loop into
    * `Vegetation.requiredBands` (the reference feeds profile band
    * names into its index presets). Case-insensitive; returns the
    * 1-based band index per required name when ALL are present. */
  def resolveBands(profile: Profile, required: Set[String]): Option[Map[String, Int]] = {
    val byName = profile.bands.map(b => b.name.toLowerCase(java.util.Locale.ROOT) -> b.index).toMap
    val hits = required.map(n => n -> byName.get(n.toLowerCase(java.util.Locale.ROOT))).toMap
    if (hits.values.forall(_.isDefined)) Some(hits.map { case (k, v) => k -> v.get }) else None
  }

  /** Broadcast profile registry as a DataFrame for bulk detection. */
  def profilesDf(s: SparkSession, profiles: Seq[Profile] = defaultProfiles): DataFrame = {
    import s.implicits._
    profiles
      .map(p => (p.id, p.category, p.priority, p.bandCount, p.dataType, p.patterns, p.mapping.toInternalString))
      .toDF("sensor_id", "category", "priority", "p_band_count", "p_data_type", "patterns", "mapping")
  }

  /** Bulk detection over a raster-metadata table
    * (raster_id, band_count, data_type, metadata, last_band_alpha):
    * broadcast-join the registry, keep the max-priority match per
    * raster (window by raster key — scale-safe partitioning), then
    * apply the reference's short-circuits and fallback. */
  def detectSensors(rasters: DataFrame, profiles: DataFrame): DataFrame = {
    val joinCond =
      (col("p_band_count") === when(col("last_band_alpha"), col("band_count") - 1).otherwise(col("band_count")) ||
        col("p_band_count") === col("band_count")) &&
        (col("p_data_type") === "" || col("p_data_type") === col("data_type")) &&
        (size(col("patterns")) === 0 || exists(col("patterns"), p => col("metadata").contains(p)))
    val w = Window.partitionBy("raster_id").orderBy(col("priority").desc)
    val matched = rasters
      .join(broadcast(profiles), joinCond, "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val rgba = col("band_count") === 4 && col("data_type") === "Byte" && col("last_band_alpha")
    val rgb = col("band_count") === 3 && col("data_type") === "Byte"
    val shortCircuit = rgba || rgb
    val profileHit = col("sensor_id").isNotNull && !shortCircuit
    val fallback = !shortCircuit && col("sensor_id").isNull &&
      col("band_count") > 3 && col("data_type") =!= "Byte"
    matched.select(
      col("raster_id"),
      (profileHit || fallback).as("detected"),
      when(profileHit, col("sensor_id")).otherwise(lit("")).as("sensor_id"),
      when(profileHit, col("category")).when(fallback, lit("multispectral")).otherwise(lit("")).as("category"),
      when(profileHit, col("mapping"))
        .when(fallback, lit("1-2-3"))
        .otherwise(lit("")) // undetected: mapping is a render concern, ref returns default
        .as("mapping")
    )
  }

  /** Band-alignment detection per capture group — ref
    * `merge_multispectral.cpp:50-338`. Input: one row per band file
    * (capture_id, band_idx, band_name, wavelength, pp_x, pp_y [mm],
    * pitch_x, pitch_y [mm/px], has_pp, has_pitch, roc_x, roc_y,
    * has_roc). Pipeline per capture: reference band = first Green
    * (name or λ∈[540,570]) else band 0 (ref :250-258); shift-source
    * priority DJI RelativeOpticalCenter > PrincipalPoint (only when
    * max |PP shift| > 1.5 px AND every band has PP+pitch, ref
    * :287-296); per-band shift in pixels. isThermal = LWIR name or
    * λ > 7000 (ref :102-104). */
  def detectBandAlignment(bands: DataFrame): DataFrame = {
    val isRefCandidate = col("band_name") === "Green" ||
      (col("wavelength") >= 540 && col("wavelength") <= 570)
    val wCap = Window.partitionBy("capture_id")
    // reference band: min band_idx among Green candidates, else min band_idx
    val withRef = bands
      .withColumn("ref_idx", coalesce(
        min(when(isRefCandidate, col("band_idx"))).over(wCap),
        min(col("band_idx")).over(wCap)
      ))
    val refCols = withRef
      .filter(col("band_idx") === col("ref_idx"))
      .select(
        col("capture_id"),
        col("pp_x").as("ref_pp_x"), col("pp_y").as("ref_pp_y"),
        (col("has_pp") && col("has_pitch")).as("ref_has_pp"),
        col("roc_x").as("ref_roc_x"), col("roc_y").as("ref_roc_y"),
        col("has_roc").as("ref_has_roc")
      )
    val j = withRef.join(refCols, Seq("capture_id"))
    val ppShiftX = (col("pp_x") - col("ref_pp_x")) / col("pitch_x")
    val ppShiftY = (col("pp_y") - col("ref_pp_y")) / col("pitch_y")
    val usable = col("has_pp") && col("has_pitch") && col("ref_has_pp")
    val annotated = j
      .withColumn("pp_shift_abs",
        when(usable && col("band_idx") =!= col("ref_idx"), greatest(abs(ppShiftX), abs(ppShiftY))))
      .withColumn("max_pp_shift", coalesce(max(col("pp_shift_abs")).over(wCap), lit(0.0)))
      .withColumn("all_have_pp", min((col("has_pp") && col("has_pitch")).cast("int")).over(wCap) === 1)
      .withColumn("any_roc", max(col("has_roc").cast("int")).over(wCap) === 1)
      // DJI ref band: the Green ref if it has RelOC, else first band with RelOC (ref :318-324)
      .withColumn("dji_ref_idx",
        when(col("ref_has_roc"), col("ref_idx"))
          .otherwise(min(when(col("has_roc"), col("band_idx"))).over(wCap)))
    val djiRef = annotated
      .filter(col("band_idx") === col("dji_ref_idx"))
      .select(col("capture_id"), col("roc_x").as("dref_x"), col("roc_y").as("dref_y"))
    val src = when(col("any_roc"), lit("DJI_RelativeOpticalCenter"))
      .when(col("max_pp_shift") > 1.5 && col("all_have_pp"), lit("PrincipalPoint"))
      .otherwise(lit("none"))
    annotated
      .join(djiRef, Seq("capture_id"), "left")
      .withColumn("shift_source", src)
      .select(
        col("capture_id"),
        col("band_idx"),
        col("band_name"),
        (col("band_name") === "LWIR" || col("wavelength") > 7000).as("is_thermal"),
        when(col("shift_source") === "DJI_RelativeOpticalCenter" && col("has_roc"), lit(true))
          .when(col("shift_source") === "PrincipalPoint" && usable, lit(true))
          .otherwise(lit(false)).as("detected"),
        when(col("shift_source") === "DJI_RelativeOpticalCenter" && col("has_roc"),
          col("roc_x") - col("dref_x"))
          .when(col("shift_source") === "PrincipalPoint" && usable,
            when(col("band_idx") === col("ref_idx"), lit(0.0)).otherwise(ppShiftX))
          .otherwise(lit(0.0)).as("shift_x"),
        when(col("shift_source") === "DJI_RelativeOpticalCenter" && col("has_roc"),
          col("roc_y") - col("dref_y"))
          .when(col("shift_source") === "PrincipalPoint" && usable,
            when(col("band_idx") === col("ref_idx"), lit(0.0)).otherwise(ppShiftY))
          .otherwise(lit(0.0)).as("shift_y"),
        when(col("shift_source") === "DJI_RelativeOpticalCenter" && col("has_roc"), col("shift_source"))
          .when(col("shift_source") === "PrincipalPoint" && usable, col("shift_source"))
          .otherwise(lit("none")).as("shift_source")
      )
  }

  /** ◆ Bulk sensor detection under the oracle: raster metadata
    * synthesized from the events table (band counts 1–6, three data
    * types, five metadata strings), classified against the default
    * registry, rolled up per (detected, sensor, category, mapping). */
  def sensorDetectQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rasters = graft.Tables
      .eventsRaw(s, dir)
      .select(
        $"event_id".as("raster_id"),
        (lit(1) + ($"event_id" % 6)).cast("int").as("band_count"),
        when($"event_id" % 3 === 0, "Byte")
          .when($"event_id" % 3 === 1, "UInt16")
          .otherwise("Float32").as("data_type"),
        when($"event_id" % 5 === 0, "Sensor: MicaSense RedEdge-M")
          .when($"event_id" % 5 === 1, "DJI Phantom multispectral rig")
          .when($"event_id" % 5 === 2, "FLIR thermal imager")
          .otherwise("generic camera").as("metadata"),
        ($"event_id" % 7 === 0).as("last_band_alpha")
      )
    detectSensors(rasters, profilesDf(s))
      .groupBy($"detected", $"sensor_id", $"category", $"mapping")
      .agg(count(lit(1)).as("n"))
  }

  /** ◆ Band-alignment detection under the oracle: five-band rig
    * captures synthesized from events (capture = event_id div 5) with
    * three metadata regimes — DJI RelOC (capture%3=0), large
    * principal-point offsets (capture%3=1), and PP below the 1.5 px
    * gate (capture%3=2 → source none). All offsets dyadic (pitch
    * 1/256 mm/px) so the per-source aggregate sums are exact. */
  def bandAlignmentQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val names = array(lit("Blue"), lit("Green"), lit("Red"), lit("RedEdge"), lit("LWIR"))
    val waves = array(lit(475), lit(560), lit(668), lit(717), lit(10500))
    val bands = graft.Tables
      .eventsRaw(s, dir)
      .select(
        expr("event_id div 5").as("capture_id"),
        ($"event_id" % 5).cast("int").as("band_idx")
      )
      .withColumn("regime", col("capture_id") % 3)
      .select(
        col("capture_id"),
        col("band_idx"),
        element_at(names, col("band_idx") + 1).as("band_name"),
        element_at(waves, col("band_idx") + 1).as("wavelength"),
        // principal point mm: band-dependent offsets; regime 1 large, regime 2 tiny
        (col("band_idx").cast("double") *
          when(col("regime") === 1, lit(1.0 / 64)).otherwise(lit(1.0 / 1024))).as("pp_x"),
        (col("band_idx").cast("double") *
          when(col("regime") === 1, lit(-1.0 / 64)).otherwise(lit(1.0 / 2048))).as("pp_y"),
        lit(1.0 / 256).as("pitch_x"),
        lit(1.0 / 256).as("pitch_y"),
        lit(true).as("has_pp"),
        lit(true).as("has_pitch"),
        (col("band_idx").cast("double") / 8).as("roc_x"),
        (col("band_idx").cast("double") / 16).as("roc_y"),
        (col("regime") === 0).as("has_roc")
      )
    detectBandAlignment(bands)
      .groupBy($"shift_source", $"is_thermal", $"detected")
      .agg(
        count(lit(1)).as("n_bands"),
        round(avg($"shift_x"), 6).as("avg_shift_x"),
        round(avg($"shift_y"), 6).as("avg_shift_y"),
        round(max(greatest(abs($"shift_x"), abs($"shift_y"))), 6).as("max_shift")
      )
  }
}
