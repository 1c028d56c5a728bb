package graft.model

import org.apache.spark.sql.types._

/** Core data model mirroring the reference's `entries` /
  * `entries_meta` tables (`src/library/database.cpp:36-89`) and
  * `EntryType` enum (`src/include/entry_types.h:15-34`), re-expressed
  * as Spark schemas. Geometry is plain structs of doubles (SURVEY §1.3
  * mapping decision) — every spatial op the engine needs is envelope
  * arithmetic, no geometry library.
  */
object EntryType {
  val Undefined = 0
  val Directory = 1
  val Generic = 2
  val GeoImage = 3
  val GeoRaster = 4
  val PointCloud = 5
  val Image = 6
  val DroneDB = 7
  val Markdown = 8
  val Video = 9
  val GeoVideo = 10
  val Model = 11
  val Panorama = 12
  val GeoPanorama = 13
  val Vector = 14
  val GaussianSplat = 15
  val Tiles3D = 16

  val names: Map[Int, String] = Map(
    Undefined -> "undefined", Directory -> "directory", Generic -> "generic",
    GeoImage -> "geoimage", GeoRaster -> "georaster", PointCloud -> "pointcloud",
    Image -> "image", DroneDB -> "dronedb", Markdown -> "markdown",
    Video -> "video", GeoVideo -> "geovideo", Model -> "model",
    Panorama -> "panorama", GeoPanorama -> "geopanorama", Vector -> "vector",
    GaussianSplat -> "gaussiansplat", Tiles3D -> "tiles3d"
  )

  /** Case-insensitive human name -> type, Undefined on no match
    * (`entry_types.cpp` typeFromHuman; rescan_test matrix). */
  def fromHuman(name: String): Int =
    names.collectFirst { case (t, n) if name != null && n == name.toLowerCase(java.util.Locale.ROOT) => t }.getOrElse(Undefined)

  /** All selectable type names (lowercase), excluding directory and
    * undefined (`getEntryTypeNames`). */
  def humanNames: Seq[String] =
    names.toSeq.sortBy(_._1).collect { case (t, n) if t != Directory && t != Undefined => n }

  /** Extension-based fingerprint (content-sniffing subset of
    * `entry.cpp:982-1118` — the pure-function core used for tests). */
  def fromExtension(path: String): Int = {
    val lower = path.toLowerCase(java.util.Locale.ROOT)
    val ext = lower.substring(lower.lastIndexOf('.') + 1)
    if (!lower.contains('.')) Generic
    else ext match {
      case "jpg" | "jpeg" | "png" | "gif" | "bmp" | "webp" | "dng" => Image // dng: entry.cpp:1038 (TIFF-based raw)
      case "tif" | "tiff" => GeoRaster // content sniff decides Image vs GeoRaster in the full path
      case "las" | "laz" | "copc" | "e57" | "pts" | "xyz" => PointCloud // entry.cpp:1001
      case "ply" => PointCloud // content dispatch mesh/splat in full path (entry.cpp:1018-1022)
      case "md" => Markdown
      case "mp4" | "mov" | "avi" | "mkv" | "webm" | "m4v" => Video // m4v: entry.cpp:1041
      case "obj" | "gltf" | "glb" | "fbx" | "stl" => Model
      // entry.cpp:1034's extension set verbatim (dwg/shz/topojson added
      // r17); dwg classifies but never decodes — see Extractors scaladoc
      case "geojson" | "shp" | "gpkg" | "fgb" | "kml" | "kmz" | "dxf" | "dwg" | "shz" | "topojson" => Vector
      // the extension is an explicit splat signal; content checks only
      // warn, never reclassify (entry.cpp:1006-1016)
      case "splat" | "spz" | "ksplat" => GaussianSplat
      case "3tz" => Tiles3D // OGC 3D Tiles archive (entry.cpp:1028-1031)
      case "json" => Generic
      case _ => Generic
    }
  }
}

/** One row of the entries index — ref `src/include/entry.h:23-163`. */
final case class PointGeom(lon: Double, lat: Double, alt: Double)

final case class Entry(
    path: String,
    hash: String,
    entryType: Int,
    properties: String, // schemaless JSON payload, like the reference's TEXT column
    mtime: Long,
    size: Long,
    depth: Int,
    pointGeom: Option[PointGeom],
    polygonGeom: Option[Seq[PointGeom]] // closed ring
)

/** One row of the entries_meta side table — ref `database.cpp:66-89`. */
final case class MetaRow(id: String, path: String, key: String, data: String, mtime: Long)

object Schemas {
  val pointGeom: StructType = StructType(Seq(
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("alt", DoubleType, nullable = false)
  ))

  /** entries — ref `database.cpp:36-57`; envelope columns added as
    * top-level doubles so Parquet min/max stats prune spatial queries
    * (SURVEY §4.3.1 — the moral equivalent of the SpatiaLite MBR
    * index). */
  val entries: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("hash", StringType, nullable = false),
    StructField("entryType", IntegerType, nullable = false),
    StructField("properties", StringType, nullable = false),
    StructField("mtime", LongType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("pointGeom", pointGeom, nullable = true),
    StructField("polygonGeom", ArrayType(pointGeom, containsNull = false), nullable = true),
    StructField("minx", DoubleType, nullable = true),
    StructField("miny", DoubleType, nullable = true),
    StructField("maxx", DoubleType, nullable = true),
    StructField("maxy", DoubleType, nullable = true)
  ))

  /** entries_meta — ref `database.cpp:66-78`. */
  val meta: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("data", StringType, nullable = false),
    StructField("mtime", LongType, nullable = false)
  ))
}
