package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.raster.Vegetation
import graft.stac.Stac

/** Scalar-function surface (SURVEY §2.7) exposed as oracle-checkable
  * queries over the test tables: slugify, base64 href encoding, path
  * derivation (depth / parent / extension). All codegen'd column
  * expressions — per-row map work that scales with input splits.
  */
object Scalars {

  /** ◆ slugify over part names — ref `stac.cpp:53-84`. */
  def slugifyQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .part(s, dir)
      .select(Stac.slugify($"p_name").as("slug"))
      .distinct()
  }

  /** ◆ base64 href tokens — ref `stac.cpp:447`, `569`. */
  def base64Query(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .customer(s, dir)
      .select($"c_custkey", base64($"c_name".cast("binary")).as("href_token"))
  }

  /** ◇ vegetation-index formulas under the oracle: lineitem columns
    * stand in as bands (the kernels are pure arithmetic — parity with
    * the SQL oracle is exactly what's being checked; real band columns
    * come from the raster layer). VARI + NDVI + SAVI per returnflag. */
  def vegetationQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables
      .lineitem(s, dir)
      .select(
        $"l_returnflag",
        ($"l_discount" + 0.1).as("R"),
        ($"l_tax" + 0.2).as("G"),
        lit(0.05).as("B"),
        ($"l_quantity" / 50.0 + 0.5).as("N")
      )
    val bands = Map("R" -> col("R"), "G" -> col("G"), "B" -> col("B"), "N" -> col("N"),
      "Re" -> col("R"), "L" -> col("R"))
    li.select(
      $"l_returnflag",
      Vegetation.formula("VARI")(bands).as("vari"),
      Vegetation.formula("NDVI")(bands).as("ndvi"),
      Vegetation.formula("SAVI")(bands).as("savi")
    ).groupBy($"l_returnflag")
      .agg(
        round(avg($"vari"), 6).as("avg_vari"),
        round(avg($"ndvi"), 6).as("avg_ndvi"),
        round(avg($"savi"), 6).as("avg_savi"),
        count(lit(1)).as("n")
      )
  }

  /** ◇ thermal raw→°C under the oracle: value column as raw sensor
    * counts through the Planck radiometry at emissivity 1. */
  def thermalQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cal = graft.raster.Thermal.Calibration(emissivity = 1.0)
    Tables
      .events(s, dir)
      // keep raw above the Planck-curve singularity (raw + O > 0)
      .select($"event_type", ((abs($"value") + 100.0) * 100.0).as("raw"))
      .select($"event_type", graft.raster.Thermal.rawToCelsius($"raw", cal).as("celsius"))
      .groupBy($"event_type")
      .agg(round(avg($"celsius"), 6).as("avg_c"), count(lit(1)).as("n"))
  }

  /** ◆ MIME type from extension — ref `stac.cpp:86-171`: a broadcast
    * map literal + `element_at`, octet-stream fallback. */
  def mimeQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val exts = Seq("jpg", "tif", "laz", "mp4", "txt", "geojson", "xyz")
    val extCol = element_at(lit(exts.toArray), ($"doc_id" % exts.size).cast("int") + 1)
    Tables
      .documents(s, dir)
      .withColumn("path", concat(lit("f_"), $"doc_id", lit("."), extCol))
      .select($"doc_id", $"path", Stac.mimeType($"path").as("mime"))
  }

  /** ◆ EPSG code from WKT — ref `stac.cpp:173-197`: the LAST
    * AUTHORITY["EPSG","n"] in the string wins (outer CRS authority). */
  def epsgQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .nation(s, dir)
      .withColumn(
        "wkt",
        concat(
          lit("PROJCS[\"utm\",GEOGCS[\"wgs84\",AUTHORITY[\"EPSG\",\"4326\"]],AUTHORITY[\"EPSG\",\"326"),
          ($"n_nationkey" % 60) + 1,
          lit("\"]]")
        )
      )
      .select($"n_nationkey", Stac.epsgFromWkt($"wkt").as("epsg"))
  }

  /** ◆ bytesToHuman — ref `entry.cpp:950` (`io::bytesToHuman`): unit
    * ladder by thresholds; scaled value kept numeric (string
    * formatting rounds differently across engines). */
  def bytesHumanQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // explicit floor: DuckDB's double→BIGINT cast rounds, Spark's truncates
    val bytes = floor($"o_totalprice" * 1024.0).cast("long")
    val k = 1024.0
    Tables
      .orders(s, dir)
      .withColumn("bytes", bytes)
      .withColumn(
        "unit",
        when($"bytes" < k, "B")
          .when($"bytes" < k * k, "KB")
          .when($"bytes" < k * k * k, "MB")
          .otherwise("GB")
      )
      .withColumn(
        "scaled",
        when($"bytes" < k, $"bytes".cast("double"))
          .when($"bytes" < k * k, $"bytes" / k)
          .when($"bytes" < k * k * k, $"bytes" / (k * k))
          .otherwise($"bytes" / (k * k * k))
      )
      .groupBy($"unit")
      .agg(count(lit(1)).as("n"), round(avg($"scaled"), 4).as("avg_scaled"))
  }

  /** ◆ STAC datetime coalesce (`stac.cpp:643-651` + `24-51`): use
    * captureTime (epoch ms) when present and > 0, else mtime (epoch s),
    * formatted ISO8601 UTC — rolled up per day with the ISO min/max
    * (lexicographic ≡ chronological). Every 3rd event lacks a
    * captureTime, exercising both branches. */
  def isoFormatQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.eventsRaw(s, dir)
    val ctMs = when($"event_id" % 3 === 0, lit(0L)).otherwise(expr("ts div 1000"))
    val mtimeS = expr("ts div 1000000")
    val iso = when(ctMs > 0, Stac.isoFromEpochMs(ctMs)).otherwise(Stac.isoFromEpochSec(mtimeS))
    ev.select(iso.as("iso"))
      .groupBy(substring($"iso", 1, 10).as("day"))
      .agg(count(lit(1)).as("n"), min($"iso").as("first_iso"), max($"iso").as("last_iso"))
  }

  /** ◆ ISO8601-with-offset parse (`stac.cpp:245-334`): ±HH:MM offset
    * strings built from events, parsed back to epoch seconds (the
    * offset math the reference hand-rolls), rolled up per offset hour.
    * Both engines build and parse the same strings. */
  def isoParseQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.eventsRaw(s, dir)
    val local = date_format(timestamp_seconds(expr("ts div 1000000")), "yyyy-MM-dd'T'HH:mm:ss")
    val oh = ($"user_id" % 25) - 12
    val om = when($"user_id" % 2 === 0, "00").otherwise("30")
    val isoStr = concat(
      local,
      when(oh < 0, "-").otherwise("+"),
      lpad(abs(oh).cast("string"), 2, "0"),
      lit(":"),
      om
    )
    ev.select(oh.as("offset_h"), graft.functions.Formats.parseIso8601(isoStr).as("epoch_s"))
      .groupBy($"offset_h")
      .agg(count(lit(1)).as("n"), min($"epoch_s").as("min_epoch"), max($"epoch_s").as("max_epoch"))
  }

  /** ◆ WKT POLYGON bbox parse (`database.cpp:495-530`): WKT rings built
    * from integer milli-degree corners (integer text is formatted
    * identically in both engines), parsed back to [w,s,e,n] with the
    * regex + min/max fold, rolled up per event type. */
  def wktBboxQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.eventsRaw(s, dir)
    val xi = ($"event_id" * 7919 % 36000) - 18000 // milli-degree-ish ints
    val yi = ($"event_id" * 104729 % 18000) - 9000
    val wkt = concat(
      lit("POLYGON (("),
      xi, lit(" "), yi, lit(", "),
      xi + 500, lit(" "), yi, lit(", "),
      xi + 500, lit(" "), yi + 500, lit(", "),
      xi, lit(" "), yi + 500, lit(", "),
      xi, lit(" "), yi,
      lit("))")
    )
    // the same regex derivation as Formats.wktPolygonBbox (spec-pinned
    // Column form), staged through a projection so the two
    // regexp_extract_all evals are shared by min AND max instead of
    // re-running inside each aggregate reference — CollapseProject
    // keeps the barrier because inlining would duplicate the
    // non-cheap regex (measured 2.4 s -> 1.5 s on this lane)
    val pat = lit("(-?\\d+(?:\\.\\d+)?)\\s+(-?\\d+(?:\\.\\d+)?)")
    ev.select(
        $"event_type",
        regexp_extract_all(wkt, pat, lit(1)).cast("array<double>").as("xs"),
        regexp_extract_all(wkt, pat, lit(2)).cast("array<double>").as("ys"))
      .select(
        $"event_type",
        array_min($"xs").as("w"), array_min($"ys").as("s"),
        array_max($"xs").as("e"), array_max($"ys").as("n"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_rings"),
        min($"w").as("min_w"),
        max($"e").as("max_e"),
        min($"s").as("min_s"),
        max($"n").as("max_n")
      )
  }

  /** ◆ GeoJSON bbox by recursive coordinate walk (`stac.cpp:205-243`,
    * `Formats.geojsonBbox`) — Polygon documents synthesized from
    * integer coords (identical strings on both engines); the oracle
    * recomputes the envelope ALGEBRAICALLY rather than re-running the
    * regex walk, so the parse path is checked against ground truth,
    * not against a mirror of itself. */
  def geojsonBboxQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.eventsRaw(s, dir).filter($"event_id" % 97 === 0)
    val xi = ($"event_id" * 7919 % 36000) - 18000
    val yi = ($"event_id" * 104729 % 18000) - 9000
    val gj = concat(
      lit("""{"type":"Polygon","coordinates":[[["""),
      xi - 5, lit(","), yi - 5, lit("],["),
      xi + 5, lit(","), yi - 5, lit("],["),
      xi + 5, lit(","), yi + 5, lit("],["),
      xi - 5, lit(","), yi + 5, lit("],["),
      xi - 5, lit(","), yi - 5,
      lit("]]]}")
    )
    ev.select($"event_id".as("id"), graft.functions.Formats.geojsonBbox(gj).as("b"))
      .select($"id", $"b._1".as("w"), $"b._2".as("s"), $"b._3".as("e"), $"b._4".as("n"))
  }

  /** ◆ path derivation — depth / parent / extension / LIKE scoping
    * (ref `dbops.cpp:1296`, `mio.cpp` path helpers) over synthetic
    * paths built from the documents table. */
  def pathOpsQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, dir)
      .withColumn("path", concat($"source", lit("/"), $"lang", lit("/doc_"), $"doc_id", lit(".txt")))
      .select(
        $"doc_id",
        $"path",
        (size(split($"path", "/")) - 1).as("depth"),
        regexp_replace($"path", "/[^/]*$", "").as("parent"),
        element_at(split($"path", "\\."), -1).as("ext")
      )
      .filter($"path".like("src1%"))
  }
}
