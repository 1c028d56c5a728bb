package graft.geo

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Geospatial operators under the oracle: bbox-envelope filtering
  * (`stac.cpp:629-636`), web-mercator tile math (`tiler.cpp:134-221`),
  * haversine track distance (`raster_profile.cpp:34-44`) — all pure
  * column arithmetic (codegen'd, no UDF), over synthetic lon/lat
  * derived from the events table with exact integer modulo math so the
  * inputs are bit-identical across engines.
  *
  * Scale notes: the envelope min/max live as top-level double columns —
  * at warehouse scale parquet row-group stats prune on them (the moral
  * equivalent of the reference's SpatiaLite MBR index, SURVEY §4.3.1).
  * Tile assignment is per-row map work; the per-tile rollup is one
  * partial-agg shuffle.
  */
object GeoQueries {

  /** Deterministic synthetic geotags: lon/lat on a 0.01° grid offset by
    * 0.005° so no point sits on a tile/bbox boundary (FP-safe floor). */
  private[graft] def withLonLat(df: DataFrame): DataFrame =
    df.withColumn("lon", (col("event_id") * 7919L % 36000L) / 100.0 - 180.0 + 0.005)
      .withColumn("lat", (col("event_id") * 104729L % 18000L) / 100.0 - 90.0 + 0.005)

  /** ◆ Envelope-intersection bbox filter — each point carries a ±0.25°
    * footprint envelope; query box = [-60,-30,60,30]. Same disjunction
    * the reference's MbrIntersects expands to. */
  def bboxFilterQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (w, south, e, n) = (-60.0, -30.0, 60.0, 30.0)
    withLonLat(Tables.eventsRaw(s, dir))
      .withColumn("minx", $"lon" - 0.25)
      .withColumn("maxx", $"lon" + 0.25)
      .withColumn("miny", $"lat" - 0.25)
      .withColumn("maxy", $"lat" + 0.25)
      .filter(!($"maxx" < w || $"minx" > e || $"maxy" < south || $"miny" > n))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), round(avg($"lon"), 6).as("avg_lon"), round(avg($"lat"), 6).as("avg_lat"))
  }

  /** ◆ Web-mercator tile assignment at z=10 (`tiler.cpp:134-221`,
    * `Mercator.latLonToTile`) + the TMS→XYZ y-flip, rolled up to tile
    * counts. Formula written identically in the SQL oracle; inputs are
    * off-boundary by construction. */
  def tileMathQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val z = 10
    val originShift = math.Pi * 6378137.0
    val res = (2 * math.Pi * 6378137.0 / 256.0) / (1 << z)
    def tile(m: Column): Column = greatest(lit(0L), (ceil(((m + originShift) / res) / 256.0)).cast("long") - 1)
    withLonLat(Tables.eventsRaw(s, dir))
      .filter($"lat" > -85.0 && $"lat" < 85.0)
      .withColumn("mx", $"lon" * originShift / 180.0)
      .withColumn("my", log(tan((lit(90.0) + $"lat") * math.Pi / 360.0)) / (math.Pi / 180.0) * originShift / 180.0)
      .withColumn("tx", tile($"mx"))
      .withColumn("ty_xyz", lit((1L << z) - 1) - tile($"my"))
      .groupBy($"tx", $"ty_xyz")
      .agg(count(lit(1)).as("n"))
  }

  /** Per-tile MVT point features at zoom `z`: web-mercator tile
    * assignment (the q_tile_math kernel), 4096-extent tile-local
    * quantization, and the sorted point set each tile's MULTIPOINT
    * feature encodes. One scan + one shuffle on the tile key; per-tile
    * arrays are bounded by tile point count (the renderTiles bound).
    * The float→int quantization rounds at 1e-9 before floor — the same
    * quantize-before-discretize guard as the LSH sign test, so a
    * last-ulp libm difference can't flip a pixel across engines. */
  def mvtFeatures(s: SparkSession, dir: String, z: Int): DataFrame = {
    import s.implicits._
    val originShift = math.Pi * 6378137.0
    val res = (2 * math.Pi * 6378137.0 / 256.0) / (1 << z)
    // tile size at z = res · 256 = 2πR / 2^z — power-of-two scaling, so
    // the two forms are bit-identical doubles in any IEEE engine
    val ts = 2 * math.Pi * 6378137.0 / (1L << z)
    def tile(m: Column): Column = greatest(lit(0L), (ceil(((m + originShift) / res) / 256.0)).cast("long") - 1)
    def quant(raw: Column): Column =
      least(lit(4095L), greatest(lit(0L), floor(round(raw, 9)).cast("long")))
    withLonLat(Tables.eventsRaw(s, dir))
      .filter($"lat" > -85.0 && $"lat" < 85.0)
      .withColumn("mx", $"lon" * originShift / 180.0)
      .withColumn("my", log(tan((lit(90.0) + $"lat") * math.Pi / 360.0)) / (math.Pi / 180.0) * originShift / 180.0)
      .withColumn("tx", tile($"mx"))
      .withColumn("tms", tile($"my"))
      .withColumn("tsz", lit(ts))
      .withColumn("px", quant(($"mx" - ($"tx" * $"tsz" - originShift)) / $"tsz" * 4096.0))
      .withColumn("py", quant(((($"tms" + 1) * $"tsz" - originShift) - $"my") / $"tsz" * 4096.0))
      .groupBy($"tx", (lit((1L << z) - 1) - $"tms").as("ty"))
      .agg(array_sort(collect_list(struct($"px", $"py"))).as("pts"))
  }

  /** ◆ MVT geometry command stream under the oracle (z=5): per tile,
    * the MULTIPOINT command integers — MoveTo(n) then per-point zigzag
    * deltas in (px, py) sort order — exactly the packed varint payload
    * `Mvt.encodeTile` writes (MvtSpec proves the round-trip). DuckDB
    * recomputes every integer, so the tile CONTENT is hash-verified;
    * only the protobuf envelope is spec-side. */
  def mvtQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def zz(c: Column): Column = when(c >= 0, c * 2).otherwise(-c * 2 - 1)
    def fld(i: Column, f: String): Column = element_at($"pts", i).getField(f)
    val deltas = flatten(
      transform(
        sequence(lit(1), size($"pts")),
        i =>
          array(
            zz(fld(i, "px") - when(i === 1, lit(0L)).otherwise(fld(i - 1, "px"))),
            zz(fld(i, "py") - when(i === 1, lit(0L)).otherwise(fld(i - 1, "py")))
          )
      )
    )
    mvtFeatures(s, dir, z = 5)
      .withColumn("cmds", concat(array((size($"pts") * 8 + 1).cast("long")), deltas))
      .select(
        $"tx",
        $"ty",
        size($"pts").cast("long").as("n_points"),
        size($"cmds").cast("long").as("n_cmds"),
        md5(concat_ws(",", $"cmds".cast("array<string>"))).as("cmd_md5")
      )
  }

  /** Encode real MVT tile BYTES — one row per tile with the protobuf
    * payload (layer "events", one MULTIPOINT feature tagged n_points).
    * The per-tile kernel mirrors `renderTiles`' PNG stage. */
  def mvtTiles(s: SparkSession, dir: String, z: Int = 5): DataFrame = {
    val enc = udf { (pts: Seq[Row]) =>
      val sorted = pts.map(r => (r.getLong(0), r.getLong(1)))
      Mvt.encodeTile(
        "events",
        Seq(Mvt.Feature(0L, 1, Mvt.pointCommands(sorted), tags = Seq(0L, 0L))),
        keys = Seq("n_points"),
        intValues = Seq(sorted.length.toLong)
      )
    }
    mvtFeatures(s, dir, z)
      .withColumn("mvt", enc(col("pts")))
      .select(col("tx"), col("ty"), col("mvt"), length(col("mvt")).as("mvt_bytes"))
  }

  /** The deterministic sparse byte raster the COG queries share: the
    * events-derived 400×400 grid (pure integer math on event_id, the
    * q_tile_pyramid fixture convention), value = (event_id·37) mod 256,
    * collisions resolved by MAX. */
  private def cogPixels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .eventsRaw(s, dir)
      .select(
        ($"event_id" % 400).as("x"),
        expr("(event_id div 400) % 400").as("y"),
        (($"event_id" * 37) % 256).as("v0")
      )
      .groupBy($"x", $"y")
      .agg(max($"v0").as("v"))
  }

  /** ◆ COG tile planes under the oracle: the exact zero-padded 256×256
    * pixel planes `raster/Cog.encode` writes as TIFF tiles — 512×512
    * canvas (2×2 tile grid over the 400×400 raster), row-major within
    * each tile, digest-compared. DuckDB rebuilds every plane, so the
    * tile CONTENT is hash-verified; the TIFF/COG envelope is
    * round-trip-spec'd (`CogSpec`, JDK TIFF reader). */
  def cogQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grid = s
      .range(512L * 512L)
      .select(($"id" % 512).as("gx"), ($"id" / 512).cast("long").as("gy"))
    grid
      .join(cogPixels(s, dir), $"gx" === $"x" && $"gy" === $"y", "left")
      .select(
        ($"gx" / 256).cast("long").as("tile_x"),
        ($"gy" / 256).cast("long").as("tile_y"),
        (($"gy" % 256) * 256 + ($"gx" % 256)).as("idx"),
        coalesce($"v", lit(0L)).as("v")
      )
      .groupBy($"tile_x", $"tile_y")
      .agg(
        sum(when($"v" =!= 0, 1L).otherwise(0L)).as("n_nonzero"),
        md5(
          concat_ws(
            ",",
            transform(array_sort(collect_list(struct($"idx", $"v"))), _.getField("v").cast("string"))
          )
        ).as("plane_md5")
      )
  }

  /** Build the actual COG binary — one row per raster, the per-raster
    * kernel shape (`renderTiles`' per-tile bound, one group per raster
    * FILE, so a 100 TB estate encodes its rasters in parallel while no
    * task ever holds more than one raster). Georeferenced to the
    * fixture's nominal anchor. */
  def buildCog(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val enc = udf { pts: Seq[Row] =>
      val plane = new Array[Byte](400 * 400)
      pts.foreach(r => plane(r.getLong(0).toInt * 400 + r.getLong(1).toInt) = r.getLong(2).toByte)
      graft.raster.Cog.encode(400, 400, plane, 256, Some(graft.raster.Cog.GeoRef(-180.0, 90.0, 0.05, 4326)))
    }
    cogPixels(s, dir)
      .groupBy(lit(1L).as("raster_id"))
      .agg(collect_list(struct($"y", $"x", $"v")).as("pts"))
      .withColumn("cog", enc($"pts"))
      .select($"raster_id", length($"cog").as("cog_bytes"), $"cog")
  }

  /** ◆ The COG READ loop under the oracle (`raster_region.cpp`
    * semantics — crop a window, read an overview): encode the 400×400
    * fixture raster to a real COG inside the task, then decode a
    * level-0 window AND the level-1 overview back out of the TIFF
    * bytes and aggregate per y-band. The oracle recomputes both from
    * the raw grid (overview = the writer's nearest top-left sample),
    * so a green row proves encode∘decode is the identity on windows
    * and the pyramid sampling is exactly as specified. */
  def cogReadQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val kernel = udf { pts: Seq[Row] =>
      val plane = new Array[Byte](400 * 400)
      pts.foreach(r => plane(r.getLong(0).toInt * 400 + r.getLong(1).toInt) = r.getLong(2).toByte)
      val cog = graft.raster.Cog.encode(400, 400, plane, 256, Some(graft.raster.Cog.GeoRef(-180.0, 90.0, 0.05, 4326)))
      val (w0, h0, l0) = graft.raster.Cog.decodeLevel(cog, 0)
      val (w1, h1, l1) = graft.raster.Cog.decodeLevel(cog, 1)
      require(w0 == 400 && h0 == 400 && w1 == 200 && h1 == 200, s"cog pyramid dims $w0 x $h0 / $w1 x $h1")
      val acc = scala.collection.mutable.Map.empty[(Int, Int), (Long, Long)]
      def add(level: Int, y: Int, v: Int): Unit = {
        val k = (level, y / 32)
        val (n, sv) = acc.getOrElse(k, (0L, 0L))
        acc(k) = (n + (if (v != 0) 1 else 0), sv + v)
      }
      for (y <- 50 until 300; x <- 37 until 341) add(0, y, l0(y * 400 + x))
      for (y <- 0 until 200; x <- 0 until 200) add(1, y, l1(y * 200 + x))
      acc.toSeq.sortBy(_._1).map { case ((l, b), (n, sv)) => (l, b, n, sv) }
    }
    cogPixels(s, dir)
      .groupBy(lit(1L).as("raster_id"))
      .agg(collect_list(struct($"y", $"x", $"v")).as("pts"))
      .select(explode(kernel($"pts")).as("t"))
      .select(
        $"t._1".as("level"),
        $"t._2".as("band"),
        $"t._3".as("n_nonzero"),
        $"t._4".as("sum_v")
      )
  }

  /** Tile-pyramid core (`gdaltiler.cpp:158-380`): the tiler's
    * warp-once / per-tile-window pipeline as one relational flow.
    * Input pixels carry (lon, lat, byte); raw pixels are scanned
    * EXACTLY ONCE — assigned their web-mercator tile at the FINEST
    * requested zoom and partial-agg'd to per-tile stats — and every
    * coarser level is built by 2×2-reducing the level below (the
    * `gdaltiler` overview pattern): counts and byte sums add, min/max
    * fold, so a z0–19 pyramid costs one pixel scan plus per-level
    * shuffles over ever-shrinking tile sets (the r4-flagged
    * per-zoom pixel explode scanned the raw data once PER ZOOM).
    *
    * The halving is bit-exact, not approximate: `res` doubles per
    * level by an exact power of two, and IEEE rounding commutes with
    * power-of-two scaling, so ceil-index(z−1) ≡ ceil-index(z) div 2
    * for every pixel — the rollup output is hash-identical to direct
    * per-zoom assignment (same q_tile_pyramid oracle row, and the
    * byte mean divides the exact integer byte sum by the exact
    * count). The groupBy exchange IS the per-tile window read: pixels
    * hash-partition by tile id, each task assembles complete tiles,
    * untouched tiles never exist. `renderTiles` below adds the PNG
    * byte-encode stage. Tile ids are XYZ (y-flipped from TMS,
    * `tiler.cpp:219-221`). */
  def tilePyramid(pixels: DataFrame, zooms: Seq[Int]): DataFrame = {
    require(zooms.nonEmpty, "at least one zoom level")
    val zMin = zooms.min
    val zMax = zooms.max
    val originShift = math.Pi * 6378137.0
    val res = lit(2 * math.Pi * 6378137.0 / 256.0) / pow(lit(2.0), lit(zMax))
    def tileIdx(m: Column): Column =
      greatest(lit(0L), ceil(((m + originShift) / res) / 256.0).cast("long") - 1)
    val finest = pixels
      .withColumn("mx_m", col("lon") * originShift / 180.0)
      .withColumn(
        "my_m",
        log(tan((lit(90.0) + col("lat")) * math.Pi / 360.0)) / (math.Pi / 180.0) * originShift / 180.0
      )
      .withColumn("tx", tileIdx(col("mx_m")))
      .withColumn("ty", pow(lit(2.0), lit(zMax)).cast("long") - 1 - tileIdx(col("my_m")))
      .groupBy(col("tx"), col("ty"))
      .agg(
        count(lit(1)).as("n_px"),
        sum(col("byte")).as("byte_sum"),
        min(col("byte")).as("byte_min"),
        max(col("byte")).as("byte_max")
      )
      .select(lit(zMax).as("z"), col("tx"), col("ty"), col("n_px"), col("byte_sum"), col("byte_min"), col("byte_max"))
      // materialize the base level once (gdaladdo's overviews-over-base
      // pattern): every coarser level and the final union read these
      // tile stats, never the raw pixels again — without this, each
      // union branch would re-derive (and re-scan) the pixel source
      .transform(graft.operators.Staged.checkpoint)
    var levels = List(finest)
    var cur = finest
    for (z <- (zMax - 1) to zMin by -1) {
      // XYZ y runs top-down: halve in TMS space, flip back
      val tmsChild = lit((1L << (z + 1)) - 1) - col("ty")
      cur = cur
        .select(
          shiftright(col("tx"), 1).as("tx"),
          (lit((1L << z) - 1) - shiftright(tmsChild, 1)).as("ty"),
          col("n_px"),
          col("byte_sum"),
          col("byte_min"),
          col("byte_max")
        )
        .groupBy(col("tx"), col("ty"))
        .agg(
          sum(col("n_px")).as("n_px"),
          sum(col("byte_sum")).as("byte_sum"),
          min(col("byte_min")).as("byte_min"),
          max(col("byte_max")).as("byte_max")
        )
        .select(lit(z).as("z"), col("tx"), col("ty"), col("n_px"), col("byte_sum"), col("byte_min"), col("byte_max"))
        .transform(graft.operators.Staged.checkpoint) // level z feeds both the union and level z−1
      levels ::= cur
    }
    levels
      .reduce(_.unionAll(_))
      .filter(col("z").isin(zooms.map(z => z: Any): _*))
      .select(
        col("z"),
        col("tx"),
        col("ty"),
        col("n_px"),
        col("byte_min"),
        col("byte_max"),
        round(col("byte_sum").cast("double") / col("n_px"), 4).as("byte_mean")
      )
  }

  /** Materialize a tile pyramid partitioned by zoom: one parquet
    * directory per z level (partition pruning serves "give me level
    * 14" without touching the rest), clustered by tx inside each
    * level so a viewport read hits few files. The byte-encode step
    * (PNG/COG) would map over these grouped rows. */
  def writeTilePyramid(tiles: DataFrame, path: String): Unit =
    tiles
      .repartition(col("z"), col("tx"))
      .write
      .partitionBy("z")
      .mode("overwrite")
      .parquet(path)

  /** Render tiles to PNG bytes — the byte-encode stage of
    * `gdaltiler.cpp:200-400`, previously declared out of scope, now
    * closed with the pure-JVM deterministic encoder
    * (`graft.raster.Png`). Pixels carry (lon, lat, byte); each pixel
    * maps to its (tile, in-tile x, in-tile y) at zoom `z`, one
    * groupBy(tile) gathers the tile's pixel window (bounded at
    * 256×256 rows per group), and a per-tile kernel rasterizes +
    * PNG-encodes. Output: one row per XYZ tile with the `png` binary
    * column — exactly the reference's per-tile artifact, minus disk.
    * Sparse coverage renders as 0 (nodata black), like a tiler edge
    * tile. */
  /** (lon, lat) → XYZ tile id + in-tile pixel position at zoom `z` —
    * shared by the grey and RGB renderers. */
  private def withTileCoords(pixels: DataFrame, z: Int): DataFrame = {
    val originShift = math.Pi * 6378137.0
    val res = (2 * math.Pi * 6378137.0 / 256.0) / (1L << z)
    def globalPx(m: Column): Column = (m + originShift) / res
    pixels
      .withColumn("gx", globalPx(col("lon") * originShift / 180.0))
      .withColumn(
        "gy",
        globalPx(log(tan((lit(90.0) + col("lat")) * math.Pi / 360.0)) / (math.Pi / 180.0) * originShift / 180.0)
      )
      .withColumn("tx", greatest(lit(0L), ceil(col("gx") / 256.0).cast("long") - 1))
      .withColumn("ty_tms", greatest(lit(0L), ceil(col("gy") / 256.0).cast("long") - 1))
      .withColumn("ix", (floor(col("gx")).cast("long") - col("tx") * 256).cast("int"))
      // PNG rows run top-down while TMS y runs bottom-up: flip inside the tile
      .withColumn("iy", (lit(255) - (floor(col("gy")).cast("long") - col("ty_tms") * 256)).cast("int"))
      .withColumn("ty", lit((1L << z) - 1) - col("ty_tms"))
  }

  def renderTiles(pixels: DataFrame, z: Int): DataFrame = {
    val encodeTile = udf { pts: Seq[Row] =>
      val img = new Array[Byte](256 * 256)
      pts.foreach { r =>
        val ix = r.getInt(0); val iy = r.getInt(1)
        if (ix >= 0 && ix < 256 && iy >= 0 && iy < 256) img(iy * 256 + ix) = r.getInt(2).toByte
      }
      graft.raster.Png.encodeGray(256, 256, img)
    }
    withTileCoords(pixels, z)
      .groupBy(col("tx"), col("ty"))
      .agg(
        count(lit(1)).as("n_px"),
        encodeTile(collect_list(struct(col("ix"), col("iy"), col("byte")))).as("png")
      )
      .withColumn("z", lit(z))
      .select(col("z"), col("tx"), col("ty"), col("n_px"), col("png"))
  }

  /** Colormapped RGB tile rendering — the tiler's colormap output path
    * (`gdaltiler.cpp` + the reference's colormap LUTs): pixels carry
    * (lon, lat, r, g, b) — typically from
    * `Vegetation.applyColormap` over a normalized band — and each tile
    * renders as an 8-bit truecolour PNG. */
  def renderTilesRgb(pixels: DataFrame, z: Int): DataFrame = {
    val encodeTile = udf { pts: Seq[Row] =>
      val img = new Array[Byte](256 * 256 * 3)
      pts.foreach { p =>
        val ix = p.getInt(0); val iy = p.getInt(1)
        if (ix >= 0 && ix < 256 && iy >= 0 && iy < 256) {
          val at = (iy * 256 + ix) * 3
          img(at) = p.getInt(2).toByte; img(at + 1) = p.getInt(3).toByte; img(at + 2) = p.getInt(4).toByte
        }
      }
      graft.raster.Png.encode(256, 256, 3, img)
    }
    withTileCoords(pixels, z)
      .groupBy(col("tx"), col("ty"))
      .agg(
        count(lit(1)).as("n_px"),
        encodeTile(collect_list(struct(col("ix"), col("iy"), col("r"), col("g"), col("b")))).as("png")
      )
      .withColumn("z", lit(z))
      .select(col("z"), col("tx"), col("ty"), col("n_px"), col("png"))
  }

  /** ◆ Tile-pyramid materialization under the oracle
    * (`gdaltiler.cpp:158-380`, behavior spec `tests/tiler_test.cpp:
    * 18-230`): synthesize a north-up pixel plane from the events table
    * (affine gt: origin (−10°, 40°), 0.001°/px, pixel-center sampling),
    * byte-rescale the band once with the GLOBAL min/max
    * (`tiler.cpp:106-131` — the tiler normalizes before cutting
    * tiles), then cut zooms 12–14. The min/max scalars ride a 1-row
    * broadcast, never a second pass per tile. */
  def tilePyramidQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val px = Tables
      .eventsRaw(s, dir)
      .select(expr("event_id % 400").cast("double").as("x"), expr("(event_id div 400) % 400").cast("double").as("y"), $"value")
    val mm = px.agg(min($"value").as("mn"), max($"value").as("mxv"))
    val plane = px
      .crossJoin(broadcast(mm))
      .withColumn(
        "byte",
        when($"mxv" - $"mn" <= 0, lit(0))
          .otherwise(least(lit(255), greatest(lit(0), round(($"value" - $"mn") / ($"mxv" - $"mn") * 255.0).cast("int"))))
      )
      .withColumn("lon", lit(-10.0) + ($"x" + 0.5) * 0.001)
      .withColumn("lat", lit(40.0) - ($"y" + 0.5) * 0.001)
      .select($"lon", $"lat", $"byte")
    tilePyramid(plane, Seq(12, 13, 14))
  }

  /** ◆ Dataset-scale CRS reprojection (`entry.cpp:368-389` — the
    * reference warps footprints per file through PROJ; at warehouse
    * scale the same transform is a column expression over millions of
    * coordinates). Forward Lambert Conformal Conic 2SP (EPSG:31370,
    * Belgian Lambert 72) then the inverse as FOUR UNROLLED fixed-point
    * iterations — deterministic on both engines, error ≪ the 1e-6°
    * output rounding. Projection constants (n, a·F, e) are computed
    * once by `Crs` and injected as identical literals into this plan
    * AND the SQL oracle, so both engines start from bit-equal
    * parameters. All codegen'd column math, no UDF. */
  def crsTransformQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = graft.geo.Crs.forEpsg(31370).get.asInstanceOf[graft.geo.Crs.LambertConformalConic2SP]
    val (e, aF, n, fe, fn) = (p.ell.e, p.ell.a * p.bigF, p.n, p.fe, p.fn)
    val lon0 = p.lon0
    def rad(c: Column): Column = c * math.Pi / 180.0
    def deg(c: Column): Column = c * 180.0 / math.Pi
    val pts = Tables
      .eventsRaw(s, dir)
      .select(($"event_id" % 25).as("pt_id"))
      .distinct()
      .withColumn("lon", lit(2.6) + $"pt_id" * 0.15)
      .withColumn("lat", lit(49.6) + (($"pt_id" * 7) % 25) * 0.08)
    val latR = rad($"lat")
    val tC = tan(lit(math.Pi / 4) - latR / 2) /
      pow((lit(1.0) - sin(latR) * e) / (lit(1.0) + sin(latR) * e), e / 2)
    val r = lit(aF) * pow(tC, n)
    val theta = lit(n) * rad($"lon" - lon0)
    val fwd = pts
      .withColumn("easting", lit(fe) + r * sin(theta))
      .withColumn("northing", lit(fn) + lit(p.r0) - r * cos(theta))
    // inverse from the projected columns only (r0 = 0 for 31370)
    val dx = $"easting" - fe
    val dy = lit(p.r0) - ($"northing" - fn)
    val rp = sqrt(dx * dx + dy * dy)
    val tp = pow(rp / aF, 1.0 / n)
    def iter(phi: Column): Column =
      lit(math.Pi / 2) - lit(2.0) * atan(tp * pow((lit(1.0) - sin(phi) * e) / (lit(1.0) + sin(phi) * e), e / 2))
    val phi0 = lit(math.Pi / 2) - lit(2.0) * atan(tp)
    val phi = iter(iter(iter(iter(phi0))))
    fwd
      .withColumn("lon_rt", round(deg(atan2(dx, dy) / n) + lon0, 6))
      .withColumn("lat_rt", round(deg(phi), 6))
      .select(
        $"pt_id",
        round($"easting", 3).as("easting"),
        round($"northing", 3).as("northing"),
        $"lon_rt",
        $"lat_rt"
      )
  }

  /** ◆ Spatial extent aggregate under the oracle — envelope union ≡
    * min/max fold over envelope columns (`database.cpp:370-389`,
    * `Stac.collectionExtent`), per event type. */
  def extentUnionQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withLonLat(Tables.eventsRaw(s, dir))
      .groupBy($"event_type")
      .agg(
        min($"lon" - 0.25).as("minx"),
        min($"lat" - 0.25).as("miny"),
        max($"lon" + 0.25).as("maxx"),
        max($"lat" + 0.25).as("maxy"),
        count(lit(1)).as("n")
      )
  }

  /** ◆ Haversine track distance — consecutive-fix distance per user
    * (ordered window lag), rolled up by event type. Identical operation
    * sequence on both engines (explicit *π/180, squares via
    * multiplication — `power(x,2)` and `x*x` agree, verified). */
  def haversineQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    def rad(c: Column): Column = c * math.Pi / 180.0
    val df = withLonLat(Tables.eventsRaw(s, dir))
      .withColumn("plon", lag($"lon", 1).over(w))
      .withColumn("plat", lag($"lat", 1).over(w))
      .filter($"plon".isNotNull)
    val sdLat = sin(rad($"lat" - $"plat") / 2.0)
    val sdLon = sin(rad($"lon" - $"plon") / 2.0)
    val a = sdLat * sdLat + cos(rad($"plat")) * cos(rad($"lat")) * sdLon * sdLon
    df.withColumn("dist_m", lit(2.0 * 6371000.0) * asin(sqrt(a)))
      .groupBy($"event_type")
      .agg(round(avg($"dist_m"), 4).as("avg_dist_m"), count(lit(1)).as("n"))
  }
}
