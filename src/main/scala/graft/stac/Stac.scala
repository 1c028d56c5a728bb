package graft.stac

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Index

/** STAC document generation — `src/library/stac.cpp`. Items are a
  * projection over the entries index; Collections aggregate the
  * spatial/temporal extent; ItemCollections are filter + count + page
  * (two actions, exactly like the reference's two queries,
  * `stac.cpp:654-680`).
  */
object Stac {

  /** slugify — ref `stac.cpp:53-84`: lowercase, non-alnum → dash,
    * collapse, trim. */
  def slugify(c: Column): Column =
    regexp_replace(
      regexp_replace(regexp_replace(lower(c), "[^a-z0-9]+", "-"), "-+", "-"),
      "^-|-$",
      ""
    )

  /** MIME type from extension — ref `stac.cpp:86-171` (subset of the
    * ~70-entry table; unknowns → octet-stream like the reference). */
  val mimeMap: Map[String, String] = Map(
    "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg", "png" -> "image/png",
    "gif" -> "image/gif", "webp" -> "image/webp", "bmp" -> "image/bmp",
    "tif" -> "image/tiff", "tiff" -> "image/tiff",
    "mp4" -> "video/mp4", "mov" -> "video/quicktime", "avi" -> "video/x-msvideo",
    "webm" -> "video/webm", "mkv" -> "video/x-matroska",
    "las" -> "application/vnd.las", "laz" -> "application/vnd.laszip",
    "ply" -> "text/plain", "obj" -> "text/plain", "md" -> "text/markdown",
    "json" -> "application/json", "geojson" -> "application/geo+json",
    "xml" -> "application/xml", "pdf" -> "application/pdf", "txt" -> "text/plain",
    "zip" -> "application/zip", "gpkg" -> "application/geopackage+sqlite3",
    "fgb" -> "application/flatgeobuf", "glb" -> "model/gltf-binary",
    "gltf" -> "model/gltf+json"
  )

  def mimeType(pathCol: Column): Column = {
    val ext = lower(element_at(split(pathCol, "\\."), -1))
    val m = map(mimeMap.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)
    coalesce(element_at(m, ext), lit("application/octet-stream"))
  }

  /** EPSG code from WKT — ref `stac.cpp:173-197`: last
    * AUTHORITY["EPSG","n"] wins (the outer CRS authority is the last
    * one in a WKT string). */
  def epsgFromWkt(wkt: Column): Column = {
    val all = regexp_extract_all(wkt, lit("AUTHORITY\\[\"EPSG\",\"(\\d+)\"\\]"), lit(1))
    element_at(all, -1).cast("int")
  }

  /** epoch-ms → ISO8601 UTC — ref `stac.cpp:24-51`. */
  def isoFromEpochMs(ms: Column): Column =
    date_format(timestamp_millis(ms.cast("long")), "yyyy-MM-dd'T'HH:mm:ss'Z'")

  def isoFromEpochSec(sec: Column): Column =
    date_format(timestamp_seconds(sec.cast("long")), "yyyy-MM-dd'T'HH:mm:ss'Z'")

  /** Item datetime: captureTime (ms) if > 0 else mtime (s) — ref
    * `stac.cpp:643-651`. */
  def itemDatetime: Column = {
    val ct = get_json_object(col("properties"), "$.captureTime").cast("double")
    when(ct.isNotNull && ct > 0, isoFromEpochMs(ct)).otherwise(isoFromEpochSec(col("mtime")))
  }

  /** STAC Item projection — ref `buildStacItem` (`stac.cpp:336-472`).
    * One row per entry with geometry; pure column work, no shuffle. */
  def items(entries: DataFrame, rootUrl: String = ""): DataFrame = {
    val geomPresent = col("pointGeom").isNotNull || col("polygonGeom").isNotNull
    val bbox = array(col("minx"), col("miny"), col("maxx"), col("maxy"))
    val geometry = when(
      col("polygonGeom").isNotNull,
      to_json(
        struct(
          lit("Polygon").as("type"),
          array(transform(col("polygonGeom"), p => array(p.getField("lon"), p.getField("lat")))).as("coordinates")
        )
      )
    ).otherwise(
      to_json(
        struct(
          lit("Point").as("type"),
          array(col("pointGeom.lon"), col("pointGeom.lat")).as("coordinates")
        )
      )
    )
    entries
      .filter(geomPresent)
      .select(
        lit("Feature").as("type"),
        lit("1.0.0").as("stac_version"),
        slugify(col("path")).as("id"),
        geometry.as("geometry"),
        bbox.as("bbox"),
        itemDatetime.as("datetime"),
        col("path"),
        mimeType(col("path")).as("asset_type"),
        base64(col("path").cast("binary")).as("asset_href_token"), // ref base64-encodes hrefs, stac.cpp:447
        col("size"),
        col("entryType")
      )
  }

  /** GeoJSON FeatureCollection sink — ref `entry.cpp:882-915`,
    * `info.cpp:31-80`: one Feature per entry, first non-empty geometry
    * wins (polygon over point). Returns a DataFrame of feature JSON
    * strings; `featureCollectionJson` assembles the (driver-side)
    * document for API responses. */
  def features(entries: DataFrame): DataFrame = {
    val geometry = when(
      col("polygonGeom").isNotNull,
      to_json(
        struct(
          lit("Polygon").as("type"),
          array(transform(col("polygonGeom"), p => array(p.getField("lon"), p.getField("lat")))).as("coordinates")
        )
      )
    ).otherwise(
      to_json(
        struct(lit("Point").as("type"), array(col("pointGeom.lon"), col("pointGeom.lat")).as("coordinates"))
      )
    )
    entries
      .filter(col("pointGeom").isNotNull || col("polygonGeom").isNotNull)
      .select(
        concat(
          lit("""{"type":"Feature","geometry":"""),
          geometry,
          lit(""","properties":"""),
          to_json(struct(col("path"), col("entryType"), col("size"), col("mtime"))),
          lit("}")
        ).as("feature"),
        col("path")
      )
      .orderBy("path")
      .select("feature")
  }

  /** Assemble one FeatureCollection document for an API response.
    * Driver-side by design (mirrors the reference sink, which writes a
    * single JSON document) but BOUNDED: the input must be pre-paged —
    * `limit(maxFeatures+1)` proves the bound before anything
    * materializes, so no unbounded driver collect exists in this path.
    * For dataset-scale exports use `features(...).write` (sharded). */
  def featureCollectionJson(entries: DataFrame, maxFeatures: Int = 10000): String = {
    val rows = features(entries).limit(maxFeatures + 1).collect()
    require(
      rows.length <= maxFeatures,
      s"featureCollectionJson is a paged API sink (> $maxFeatures features); " +
        "page the input or write features(df) as sharded JSON"
    )
    rows.map(_.getString(0))
      .mkString("""{"type":"FeatureCollection","features":[""", ",", "]}")
  }

  /** Collection extent — spatial (envelope union ≡ min/max fold, ref
    * `database.cpp:370-389`) + temporal (`database.cpp:395-458`). */
  def collectionExtent(entries: DataFrame): DataFrame =
    entries.agg(
      min("minx").as("west"),
      min("miny").as("south"),
      max("maxx").as("east"),
      max("maxy").as("north"),
      isoFromEpochSec(min(Index.temporalInstant)).as("start_datetime"),
      isoFromEpochSec(max(Index.temporalInstant)).as("end_datetime"),
      count(lit(1)).as("item_count")
    )

  /** ItemCollection — filter (geometry presence + bbox + temporal) →
    * numberMatched count → ORDER BY path page — ref
    * `stac.cpp:597-713`. Returns (page, numberMatched). */
  def itemCollection(
      entries: DataFrame,
      bbox: Option[(Double, Double, Double, Double)],
      startSec: Option[Long],
      endSec: Option[Long],
      limit: Int = 10, // reference default page size, stac.cpp:610-611
      offset: Int = 0
  ): (DataFrame, Long) = {
    var f = entries.filter(col("pointGeom").isNotNull || col("polygonGeom").isNotNull)
    bbox.foreach { case (w, s, e, n) =>
      // native predicate (codegen'd); EnvIntersectsRewrite expands it
      // under Filter so the parquet scan still min/max-prunes
      graft.plans.EnvExpressions.register(entries.sparkSession)
      f = f.filter(
        graft.plans.EnvExpressions
          .envIntersects(col("minx"), col("miny"), col("maxx"), col("maxy"), w, s, e, n)
      )
    }
    startSec.foreach(t => f = f.filter(Index.temporalInstant >= t))
    endSec.foreach(t => f = f.filter(Index.temporalInstant <= t))
    val matched = f.count()
    (Index.page(items(f).orderBy("path"), limit, offset), matched)
  }

  /** ISO datetime string → epoch seconds. Open ends ("", "..") are
    * None; explicit UTC offsets normalize to the same instant
    * (stac_test.cpp:558-564: `+02:00` ≡ `Z` shifted); a bare local
    * datetime reads as UTC. Junk is a named error (C-API contract). */
  def parseDatetime(s: String): Option[Long] = {
    if (s == null || s.isEmpty || s == "..") return None
    val t = s.trim
    try Some(java.time.OffsetDateTime.parse(t).toEpochSecond)
    catch {
      case _: java.time.format.DateTimeParseException =>
        try Some(java.time.LocalDateTime.parse(t).toEpochSecond(java.time.ZoneOffset.UTC))
        catch {
          case _: java.time.format.DateTimeParseException =>
            throw new IllegalArgumentException(s"Invalid datetime: $s")
        }
    }
  }

  /** "w,s,e,n" → bbox; the C API's validation (stacCApi
    * invalidArgsBadBbox): exactly four numeric tokens or a named
    * error; empty/null = no filter. */
  def parseBbox(s: String): Option[(Double, Double, Double, Double)] = {
    if (s == null || s.isEmpty) return None
    val parts = s.split(",", -1).map(_.trim)
    require(parts.length == 4, s"bbox must have exactly 4 values: $s")
    val d = parts.map { p =>
      p.toDoubleOption.getOrElse(throw new IllegalArgumentException(s"bbox: non-numeric value '$p'"))
    }
    Some((d(0), d(1), d(2), d(3)))
  }

  /** README.md content when the path is indexed and the file reads —
    * `Database::getReadme` (database.cpp:348-368): only the exact
    * root-level `README.md` entry qualifies. */
  def readme(entries: DataFrame, rootDir: String): Option[String] = {
    val indexed = entries.filter(col("path") === "README.md").limit(1).count() > 0
    if (!indexed) None
    else {
      val p = java.nio.file.Paths.get(rootDir, "README.md")
      if (java.nio.file.Files.isReadable(p))
        Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      else None
    }
  }

  /** Collection description rule — `stac.cpp:535-536`: README content
    * when present and non-empty, else the title. */
  def collectionDescription(entries: DataFrame, rootDir: String, title: String): String =
    readme(entries, rootDir).filter(_.nonEmpty).getOrElse(title)

  /** Collection license — `stac.cpp:538`: the dataset-level singular
    * `license` meta string, default "proprietary". */
  def collectionLicense(meta: DataFrame): String =
    graft.core.Meta.getString(meta, "", "license", "proprietary")

  /** String-parameter face of [[itemCollection]] — the
    * DDBStacItemCollection argument contract. */
  def itemCollectionApi(
      entries: DataFrame,
      bbox: String,
      startDatetime: String,
      endDatetime: String,
      limit: Int = 10,
      offset: Int = 0
  ): (DataFrame, Long) =
    itemCollection(entries, parseBbox(bbox), parseDatetime(startDatetime), parseDatetime(endDatetime), limit, offset)
}
