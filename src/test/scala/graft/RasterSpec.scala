package graft

import org.apache.spark.sql.functions._

import graft.raster.{Raster, Thermal, Vegetation}

/** Raster kernels — mirrors `tests/volume_test.cpp:113-254` (flat &
  * mound), `tests/raster_profile_test.cpp` (gradient/nodata), contour
  * interval resolve, vegetation formulas, rescale.
  */
class RasterSpec extends SparkSuite {
  import spark.implicits._

  test("area stats on a known grid incl. exact median") {
    // values 0..99 (10x10): mean 49.5, median (49+50)/2, stddev_pop known
    val px = Raster.grid(spark, 10, 10)((x, y) => (y * lit(10) + x).cast("double"))
    val r = Raster.areaStats(px).head()
    assert(r.getAs[Double]("min") === 0.0)
    assert(r.getAs[Double]("max") === 99.0)
    assert(r.getAs[Double]("mean") === 49.5)
    assert(r.getAs[Double]("median") === 49.5)
    assert(r.getAs[Long]("pixelCount") === 100L)
    assert(math.abs(r.getAs[Double]("stddev") - 28.86607) < 1e-4)
  }

  test("approx stats agree with exact on the known grid") {
    val px = Raster.grid(spark, 10, 10)((x, y) => (y * lit(10) + x).cast("double"))
    val r = Raster.areaStatsApprox(px).head()
    assert(r.getAs[Double]("mean") === 49.5)
    assert(math.abs(r.getAs[Double]("median") - 49.5) <= 1.0) // approx: within one step
    assert(r.getAs[Long]("pixelCount") === 100L)
  }

  test("nodata and NaN filtered like the reference") {
    val px = Raster.grid(spark, 4, 1)((x, _) =>
      when(x === 0, lit(Double.NaN)).when(x === 1, lit(-9999.0)).otherwise(x.cast("double")))
    val r = Raster.areaStats(px, nodata = Some(-9999.0)).head()
    assert(r.getAs[Long]("pixelCount") === 2L)
    assert(r.getAs[Double]("min") === 2.0)
  }

  test("volume: flat plane above base = cut only (volume_test flat case)") {
    // 10x10 grid at z=5, perimeter at z=0, pixelArea=1 -> cut=500
    val px = Raster.grid(spark, 10, 10)((_, _) => lit(5.0))
    val perim = Raster.grid(spark, 10, 10)((x, y) =>
      when(x === 0 || x === 9 || y === 0 || y === 9, lit(0.0)).otherwise(lit(0.0)))
      .filter($"x" === 0 || $"x" === 9 || $"y" === 0 || $"y" === 9)
    val r = Raster.volume(px, perim, Raster.LowestPoint, pixelArea = 1.0).head()
    assert(r.getAs[Double]("cut") === 500.0)
    assert(r.getAs[Double]("fill") === 0.0)
    assert(r.getAs[Double]("volume") === 500.0)
  }

  test("volume: mound over best-fit tilted base plane") {
    // base plane z = x (tilt), mound adds +2 in the interior
    val px = Raster.grid(spark, 10, 10)((x, y) =>
      x.cast("double") + when(x > 2 && x < 7 && y > 2 && y < 7, lit(2.0)).otherwise(lit(0.0)))
    val perim = px.filter($"x" === 0 || $"x" === 9 || $"y" === 0 || $"y" === 9)
    val (a, b, c) = Raster.fitPlane(perim)
    assert(math.abs(a - 1.0) < 1e-9, s"plane slope a=$a") // fits z=x exactly
    assert(math.abs(b) < 1e-9 && math.abs(c) < 1e-9)
    val r = Raster.volume(px, perim, Raster.BestFit, pixelArea = 1.0).head()
    assert(math.abs(r.getAs[Double]("cut") - 32.0) < 1e-9) // 4x4 interior * 2
    assert(math.abs(r.getAs[Double]("fill")) < 1e-9)
  }

  test("profile: gradient raster, nodata -> null, distance monotone") {
    // value = x over a 100x1 strip; gt maps pixel x -> lon 0..1 deg
    val px = Raster.grid(spark, 100, 1)((x, _) =>
      when(x === 50, lit(-1.0)).otherwise(x.cast("double")))
    val gt = Array(0.0, 0.01, 0.0, 0.5, 0.0, -1.0) // 1 px = 0.01 deg lon; y row 0 covers lat (0.5, -0.5)
    val prof = Raster.profile(spark, px, gt, lon1 = 0.005, lat1 = 0.0, lon2 = 0.985, lat2 = 0.0,
      samples = 50, nodata = Some(-1.0))
    val rows = prof.collect()
    assert(rows.length === 50)
    assert(rows.head.getAs[Double]("distance") === 0.0)
    // distances strictly increasing
    val dists = rows.map(_.getAs[Double]("distance"))
    assert(dists.sliding(2).forall(p => p(1) > p(0)))
    // nodata pixel surfaced as null value somewhere mid-line
    assert(rows.count(_.isNullAt(rows.head.fieldIndex("value"))) >= 1)
    // values otherwise non-decreasing along the gradient
    val vals = rows.filter(!_.isNullAt(rows.head.fieldIndex("value"))).map(_.getAs[Double]("value"))
    assert(vals.sliding(2).forall(p => p(1) >= p(0)))
  }

  test("profile sample clamp [2,4096]") {
    val px = Raster.grid(spark, 4, 1)((x, _) => x.cast("double"))
    val gt = Array(0.0, 0.25, 0.0, 0.5, 0.0, -1.0)
    assert(Raster.profile(spark, px, gt, 0.1, 0, 0.9, 0, samples = 1).count() === 2L)
    assert(Raster.profile(spark, px, gt, 0.1, 0, 0.9, 0, samples = 9999).count() === 4096L)
  }

  test("contour levels: explicit interval + derived interval") {
    assert(Raster.contourLevels(0.0, 10.0, Some(2.5)) === Seq(0.0, 2.5, 5.0, 7.5, 10.0))
    val derived = Raster.contourLevels(0.0, 100.0, None, count = 10)
    assert(derived.size === 11 && derived.head === 0.0 && derived.last === 100.0)
    assert(Raster.contourLevels(5.0, 5.0, None) === Seq.empty)
  }

  test("rescale byte with equal min/max guard") {
    val px = Raster.grid(spark, 4, 1)((x, _) => x.cast("double"))
    val vals = px.select(Raster.rescaleByte($"value", 0, 3).as("b")).collect().map(_.getInt(0)).sorted
    assert(vals === Array(0, 85, 170, 255))
    assert(px.select(Raster.rescaleByte($"value", 5, 5).as("b")).head().getInt(0) === 0)
  }

  test("vegetation formulas: VARI, NDVI, KELVIN golden values") {
    val df = Seq((0.2, 0.6, 0.1, 0.8)).toDF("R", "G", "B", "N")
    val bands = Map("R" -> col("R"), "G" -> col("G"), "B" -> col("B"), "N" -> col("N"),
      "Re" -> col("R"), "L" -> col("R"))
    val r = df.select(
      Vegetation.formula("VARI")(bands).as("vari"),
      Vegetation.formula("NDVI")(bands).as("ndvi"),
      Vegetation.formula("KELVIN")(bands).as("kelvin")
    ).head()
    assert(math.abs(r.getDouble(0) - (0.6 - 0.2) / (0.6 + 0.2 - 0.1)) < 1e-12)
    assert(math.abs(r.getDouble(1) - (0.8 - 0.2) / (0.8 + 0.2)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 273.35) < 1e-9)
  }

  test("band-requirement filtering (vegetation.cpp:157-207)") {
    assert(Vegetation.applicable(Set("R", "G", "B")) === Seq("EXG", "GLI", "GRVI", "MPRI", "NDYI", "VARI", "VNDVI"))
    assert(Vegetation.applicable(Set("N", "R")).contains("NDVI"))
    assert(!Vegetation.applicable(Set("R", "G")).contains("NDVI"))
  }

  test("colormap lookup endpoints") {
    val df = Seq(0.0, 1.0).toDF("v")
    val rows = df.select(Vegetation.applyColormap("viridis", $"v").as("c")).collect()
    assert(rows(0).getStruct(0).getInt(0) === 68) // viridis low = (68,1,84)
    assert(rows(1).getStruct(0).getInt(0) === 253) // viridis high = (253,231,37)
  }

  test("thermal conversion roundtrip sanity") {
    // at emissivity 1.0 the reflected term cancels; higher raw -> higher temp
    val c = Thermal.Calibration(emissivity = 1.0)
    val df = Seq(10000.0, 20000.0).toDF("raw")
    val t = df.select(Thermal.rawToCelsius($"raw", c).as("t")).collect().map(_.getDouble(0))
    assert(t(1) > t(0))
    assert(t(0) > -100 && t(1) < 300) // physically plausible band
  }

  test("slope: Horn gradients exact on a planted plane z = 2x + 3y") {
    import graft.raster.Slope
    val px = (for (x <- 0 until 6; y <- 0 until 6) yield (x, y, 2.0 * x + 3.0 * y)).toDF("x", "y", "value")
    val g = Slope.gradients(px).collect()
    // interior = 4x4 pixels; Horn on a perfect plane recovers the exact
    // coefficients at every interior pixel
    assert(g.length === 16)
    g.foreach { r =>
      assert(r.getDouble(2) === 2.0, s"dzx at (${r.getInt(0)},${r.getInt(1)})")
      assert(r.getDouble(3) === 3.0, s"dzy at (${r.getInt(0)},${r.getInt(1)})")
    }
    // octant: |dzy| > |dzx|, both positive -> octant 1
    val oct = Slope
      .gradients(px)
      .select(Slope.octant($"dzx", $"dzy").as("o"))
      .distinct()
      .collect()
      .map(_.getInt(0))
    assert(oct.toSeq === Seq(1))
  }
}
