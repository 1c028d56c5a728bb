package graft.raster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bilinear grid resampling — the warp kernel the reference delegates
  * to GDAL (`geoproject.cpp:135` and `raster_region.cpp:414` both pass
  * `-r bilinear`; `-outsize` scaling in `geoproject.cpp:92-135`),
  * re-expressed as relational algebra: each output pixel's center maps
  * into source pixel space (the GDAL half-pixel-center convention
  * sx = (i+0.5)·srcW/dstW − 0.5, clamped at the edges), contributes
  * exactly FOUR weighted taps, and the taps resolve through ONE
  * equi-join against the pixel table + one keyed sum.
  *
  * Scale design: the tap table is 4 rows per OUTPUT pixel — join and
  * aggregation both key on small integer coordinates, so the whole
  * warp is a single shuffle bounded by the output size, never a
  * gather of source windows to the driver; at 100 TB the same plan
  * tiles by raster_id with the join co-partitioned on (raster, tile).
  * No window functions, no cartesian — the 2×2 neighborhood is
  * enumerated as an `explode` of four structs (a generator over
  * already-computed columns, not a join).
  */
object Resample {

  /** Bilinear resample of a single-band (x, y, value) grid from
    * srcW×srcH to dstW×dstH → (i, j, v) with v rounded to 6dp. */
  def bilinear(src: DataFrame, srcW: Int, srcH: Int, dstW: Int, dstH: Int): DataFrame = {
    val s = src.sparkSession
    import s.implicits._
    val sxScale = srcW.toDouble / dstW
    val syScale = srcH.toDouble / dstH
    val t = s
      .range(dstW.toLong * dstH)
      .select(
        (col("id") % dstW).cast("int").as("i"),
        (col("id") / dstW).cast("int").as("j")
      )
      .withColumn("sx", least(greatest(($"i" + 0.5) * sxScale - 0.5, lit(0.0)), lit((srcW - 1).toDouble)))
      .withColumn("sy", least(greatest(($"j" + 0.5) * syScale - 0.5, lit(0.0)), lit((srcH - 1).toDouble)))
      .withColumn("x0", floor($"sx").cast("int"))
      .withColumn("y0", floor($"sy").cast("int"))
      .withColumn("x1", least($"x0" + 1, lit(srcW - 1)))
      .withColumn("y1", least($"y0" + 1, lit(srcH - 1)))
      .withColumn("fx", $"sx" - $"x0")
      .withColumn("fy", $"sy" - $"y0")
    val taps = t
      .select(
        $"i",
        $"j",
        explode(
          array(
            struct(lit(0).as("k"), $"x0".as("xx"), $"y0".as("yy"), ((lit(1.0) - $"fx") * (lit(1.0) - $"fy")).as("w")),
            struct(lit(1).as("k"), $"x1".as("xx"), $"y0".as("yy"), ($"fx" * (lit(1.0) - $"fy")).as("w")),
            struct(lit(2).as("k"), $"x0".as("xx"), $"y1".as("yy"), ((lit(1.0) - $"fx") * $"fy").as("w")),
            struct(lit(3).as("k"), $"x1".as("xx"), $"y1".as("yy"), ($"fx" * $"fy").as("w"))
          )
        ).as("t")
      )
      .select($"i", $"j", $"t.k", $"t.xx", $"t.yy", $"t.w")
    // the four taps combine in a FIXED expression order (t0+t1)+(t2+t3),
    // not a sum over rows — a 4-row sum's accumulation order is
    // engine-dependent and the last ulp could straddle the 6dp round
    def tap(k: Int) = max(when($"k" === k, $"w" * $"value"))
    taps
      .join(src.select($"x".as("xx"), $"y".as("yy"), $"value"), Seq("xx", "yy"))
      .groupBy($"i", $"j")
      .agg(round((tap(0) + tap(1)) + (tap(2) + tap(3)), 6).as("v"))
  }

  /** Cubic-convolution resample (Catmull-Rom, a = −0.5 — GDAL's
    * `-r cubic` kernel): each output pixel blends a 4×4 source
    * neighborhood with the separable piecewise-cubic weights
    * w(d) = 1.5d³−2.5d²+1 (|d|≤1), −0.5d³+2.5d²−4d+2 (1<|d|<2);
    * edge taps clamp-replicate. Same relational shape as [[bilinear]]
    * — 16 taps per output pixel through one equi-join + one keyed
    * aggregation, the blend a FIXED-order expression tree so the
    * result is bit-reproducible across engines. */
  def cubic(src: DataFrame, srcW: Int, srcH: Int, dstW: Int, dstH: Int): DataFrame = {
    val s = src.sparkSession
    import s.implicits._
    val sxScale = srcW.toDouble / dstW
    val syScale = srcH.toDouble / dstH
    import org.apache.spark.sql.Column
    def near(d: Column): Column = (lit(1.5) * d - lit(2.5)) * d * d + lit(1.0)
    def far(d: Column): Column = ((lit(-0.5) * d + lit(2.5)) * d - lit(4.0)) * d + lit(2.0)
    var t = s
      .range(dstW.toLong * dstH)
      .select(
        (col("id") % dstW).cast("int").as("i"),
        (col("id") / dstW).cast("int").as("j")
      )
      .withColumn("sx", ($"i" + 0.5) * sxScale - 0.5)
      .withColumn("sy", ($"j" + 0.5) * syScale - 0.5)
      .withColumn("xb", floor($"sx").cast("int"))
      .withColumn("yb", floor($"sy").cast("int"))
      .withColumn("fx", $"sx" - floor($"sx"))
      .withColumn("fy", $"sy" - floor($"sy"))
      .withColumn("wx0", far($"fx" + lit(1.0)))
      .withColumn("wx1", near($"fx"))
      .withColumn("wx2", near(lit(1.0) - $"fx"))
      .withColumn("wx3", far(lit(2.0) - $"fx"))
      .withColumn("wy0", far($"fy" + lit(1.0)))
      .withColumn("wy1", near($"fy"))
      .withColumn("wy2", near(lit(1.0) - $"fy"))
      .withColumn("wy3", far(lit(2.0) - $"fy"))
    for (o <- 0 to 3) {
      t = t
        .withColumn(s"x$o", least(greatest($"xb" + lit(o - 1), lit(0)), lit(srcW - 1)))
        .withColumn(s"y$o", least(greatest($"yb" + lit(o - 1), lit(0)), lit(srcH - 1)))
    }
    val structs = for (ky <- 0 to 3; kx <- 0 to 3) yield struct(
      lit(ky * 4 + kx).as("k"),
      col(s"x$kx").as("xx"),
      col(s"y$ky").as("yy"),
      (col(s"wx$kx") * col(s"wy$ky")).as("w")
    )
    val taps = t
      .select($"i", $"j", explode(array(structs: _*)).as("t"))
      .select($"i", $"j", $"t.k", $"t.xx", $"t.yy", $"t.w")
    // fixed-order balanced tree over the 16 weighted taps (see the
    // bilinear note: a row-sum's accumulation order is engine-defined)
    def p(k: Int) = max(when($"k" === k, $"w" * $"value"))
    taps
      .join(src.select($"x".as("xx"), $"y".as("yy"), $"value"), Seq("xx", "yy"))
      .groupBy($"i", $"j")
      .agg(
        round(
          (((p(0) + p(1)) + (p(2) + p(3))) + ((p(4) + p(5)) + (p(6) + p(7)))) +
            (((p(8) + p(9)) + (p(10) + p(11))) + ((p(12) + p(13)) + (p(14) + p(15)))),
          6
        ).as("v")
      )
  }

  /** Arbitrary-window region read (the `raster_region.cpp` semantic:
    * crop a pixel window, warp it to the requested output size with
    * `-r bilinear`): shift the window to a local origin — the filter
    * prunes the scan BEFORE any join — then run the same four-tap
    * kernel against the window-local grid. At estate scale the window
    * filter rides parquet min/max stats on the (x, y) columns, so a
    * small region over a huge raster reads only its row groups. */
  def bilinearWindow(
      src: DataFrame,
      x0: Int,
      y0: Int,
      x1: Int,
      y1: Int, // window [x0, x1) × [y0, y1) in source pixels
      dstW: Int,
      dstH: Int
  ): DataFrame = {
    import org.apache.spark.sql.functions.col
    val windowed = src
      .filter(col("x") >= x0 && col("x") < x1 && col("y") >= y0 && col("y") < y1)
      .select((col("x") - x0).as("x"), (col("y") - y0).as("y"), col("value"))
    bilinear(windowed, x1 - x0, y1 - y0, dstW, dstH)
  }

  /** ◆ q_resample — the 64×64 synthetic surface (two mounds on a
    * tilted plane, pure integer→double math shared with the oracle)
    * warped to 40×52: non-integer scale on both axes so genuine
    * four-tap blends dominate, plus clamped edge taps. */
  def resampleQuery(s: SparkSession, dir: String): DataFrame = {
    def m(cx: Int, cy: Int, r2: Int, amp: Double)(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      lit(amp) * greatest(lit(0), lit(r2) - ((x - cx) * (x - cx) + (y - cy) * (y - cy)))
    val px = Raster.grid(s, 64, 64)((x, y) =>
      lit(100.0) + x * y * 0.01 + m(20, 25, 400, 0.25)(x, y) + m(45, 40, 300, 0.125)(x, y)
    )
    bilinear(px, 64, 64, dstW = 40, dstH = 52)
  }

  /** ◆ q_resample_cubic — the same surface warped with the cubic
    * kernel (genuine 4×4 blends, negative-lobe weights, clamped edge
    * taps on all four sides). */
  def resampleCubicQuery(s: SparkSession, dir: String): DataFrame = {
    def m(cx: Int, cy: Int, r2: Int, amp: Double)(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      lit(amp) * greatest(lit(0), lit(r2) - ((x - cx) * (x - cx) + (y - cy) * (y - cy)))
    val px = Raster.grid(s, 64, 64)((x, y) =>
      lit(100.0) + x * y * 0.01 + m(20, 25, 400, 0.25)(x, y) + m(45, 40, 300, 0.125)(x, y)
    )
    cubic(px, 64, 64, dstW = 40, dstH = 52)
  }
}
