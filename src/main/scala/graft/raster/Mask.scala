package graft.raster

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Border masking — the Spark re-expression of `src/library/mask.cpp`
  * (`maskBorders`, ref `mask.cpp:14-248`): the reference shells out to
  * GDAL nearblack with `-alg floodfill`, masking the near-black (or
  * near-white / near-color) collar that orthophoto mosaics carry
  * around their valid data. Floodfill — not per-scanline "twopasses" —
  * is chosen by the reference explicitly because collars are concave
  * (`mask.cpp:120-121`); the semantic is therefore REACHABILITY: a
  * pixel is masked iff it is near the collar color AND 4-connected to
  * the image border through near pixels. Interior near-black blobs
  * (shadows, dark roofs) survive.
  *
  * Distributed shape: the near predicate is pure column math; the
  * reachability closure reuses the min-label component machinery from
  * [[Stockpile]] (pointer-jumped min-label propagation, O(log
  * diameter) rounds) restricted to the near set — on a real ortho the
  * near set is the thin collar, a small fraction of the raster, so
  * the fixpoint iterates over collar-sized frames, not the full pixel
  * plane. Output mask is 0 (collar) / 255 (keep), the dataset-mask
  * byte convention of the reference's `-setmask` output.
  */
object Mask {

  /** Near-color predicate: EVERY band within `nearDist` of its target
    * component (for black this is v <= nearDist; for white
    * v >= 255 - nearDist — GDAL nearblack's -near/-white/-color
    * surface, ref `mask.cpp:123-131`). */
  def nearColor(bands: Seq[Column], target: Seq[Int], nearDist: Int): Column =
    bands
      .zip(target)
      .map { case (b, t) => abs(b - lit(t)) <= lit(nearDist) }
      .reduce(_ && _)

  /** Mask the border-connected near-color collar of a pixel grid.
    *
    * @param pixels   (x, y, band columns) — one row per pixel
    * @param width    raster width (pixels)
    * @param height   raster height (pixels)
    * @param nearDist per-band tolerance (ref default 15, `mask.h:15`)
    * @param target   collar color, one component per band column
    *                 (black = all 0, white = all 255, or -color)
    * @param bandCols names of the band value columns (1 = grey/DEM,
    *                 3 = RGB — the reference's supported domain,
    *                 `mask.cpp:40-53`)
    * @return pixels + `mask` column: 0 = collar, 255 = keep
    */
  /** The reference's supported-domain gate (`mask.cpp:40-92`): only
    * 1-band (grey/DEM/thermal), 3-band RGB or 4-band RGBA rasters; the
    * 3-/4-band paths require 8-bit samples; a 4-band input must carry
    * an ALPHA band 4 — RGB+NIR multispectral must go through the
    * multispectral pipeline instead. Named errors, mirroring
    * mask_cog_test rejectsFourBandNonAlpha / acceptsFourBandWithAlpha. */
  def validateBands(srcBands: Int, bytesPerSample: Int, band4IsAlpha: Boolean = false): Unit = {
    if (srcBands != 1 && srcBands != 3 && srcBands != 4)
      throw new IllegalArgumentException(
        "Mask borders supports only 1-band (DEM/thermal/greyscale), 3-band RGB " +
          s"or 4-band RGBA rasters; input has $srcBands bands")
    if ((srcBands == 3 || srcBands == 4) && bytesPerSample != 1)
      throw new IllegalArgumentException(
        "3- and 4-band masking require 8-bit Byte input (RGB/RGBA orthophoto)")
    if (srcBands == 4 && !band4IsAlpha)
      throw new IllegalArgumentException(
        "4-band input must be RGBA (band 4 must be an alpha channel); " +
          "for multispectral rasters (e.g. RGB+NIR) use the multispectral pipeline")
  }

  def maskBorders(
      pixels: DataFrame,
      width: Int,
      height: Int,
      nearDist: Int = 15,
      target: Seq[Int] = Seq(0, 0, 0),
      bandCols: Seq[String] = Seq("r", "g", "b")
  ): DataFrame = {
    require(bandCols.nonEmpty && bandCols.size == target.size, "one target component per band column")
    val near = pixels
      .filter(nearColor(bandCols.map(col), target, nearDist))
      .select((col("y").cast("long") * width + col("x")).as("id"), col("x"), col("y"))
      .transform(graft.operators.Staged.checkpoint) // multi-consumer: CC seed, adjacency joins, border seed, mask join
    val labels = Stockpile.connectedComponentsTiled(near, width)
    val borderLabs = near
      .filter(col("x") === 0 || col("x") === width - 1 || col("y") === 0 || col("y") === height - 1)
      .join(labels, Seq("id"))
      .select(col("lab"))
      .distinct()
    val masked = near
      .join(labels, Seq("id"))
      .join(broadcast(borderLabs), Seq("lab")) // collar components only
      .select(col("x").as("mx"), col("y").as("my"), lit(0).as("mask"))
    pixels
      .join(masked, pixels("x") === col("mx") && pixels("y") === col("my"), "left")
      .select(
        (pixels.columns.map(pixels(_)) :+ coalesce(col("mask"), lit(255)).as("mask")): _*
      )
  }

  /** ◆ maskBorders under the oracle: a 48×48 synthetic RGB ortho with
    * a ragged concave black collar (left collar width varies with y; a
    * bay hangs off the top border) plus an interior near-black blob
    * that must SURVIVE — the exact case for which the reference picks
    * floodfill over twopasses (`mask.cpp:120-121`). All band values
    * are integer column math, identical in both engines. The result is
    * one row per scanline: masked count + kept count + masked-x sum,
    * which pins every pixel's mask bit without shipping 2304 rows. */
  def maskQuery(s: SparkSession, dir: String): DataFrame = {
    val W = 48
    val H = 48
    val base = s
      .range(W.toLong * H)
      .select((col("id") % W).cast("int").as("x"), (col("id") / W).cast("int").as("y"))
    val collar =
      col("x") < lit(2) + (col("y") * 7) % 4 || // ragged left collar
        col("x") >= W - 2 ||
        col("y") < 2 ||
        col("y") >= H - 2 ||
        (col("x").between(10, 16) && col("y") < 9) // concave bay off the top border
    val blob = col("x").between(22, 27) && col("y").between(22, 27) // interior near-black
    val px = base
      .withColumn("r", when(collar, 0).when(blob, 8).otherwise(lit(40) + (col("x") * 4) % 160))
      .withColumn("g", when(collar, 4).when(blob, 12).otherwise(lit(60) + (col("y") * 3) % 120))
      .withColumn("b", when(collar, 2).when(blob, 6).otherwise(lit(50) + ((col("x") + col("y")) * 5) % 180))
    maskBorders(px, W, H, nearDist = 15)
      .groupBy(col("y"))
      .agg(
        sum(when(col("mask") === 0, 1).otherwise(0)).as("n_masked"),
        sum(when(col("mask") === 255, 1).otherwise(0)).as("n_kept"),
        sum(when(col("mask") === 0, col("x")).otherwise(0)).as("masked_x_sum")
      )
      .orderBy(col("y"))
  }
}
