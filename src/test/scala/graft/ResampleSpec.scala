package graft

import org.apache.spark.sql.functions._

import graft.raster.{Raster, Resample}

class ResampleSpec extends SparkSuite {
  import spark.implicits._

  test("identity resample (same size) returns the source grid exactly") {
    val px = Raster.grid(spark, 16, 16)((x, y) => (x * 7 + y * 3).cast("double"))
    val out = Resample
      .bilinear(px, 16, 16, 16, 16)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    val src = px.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // scale 1 maps every output center onto a source center: fx=fy=0
    assert(out === src)
  }

  test("constant surface stays constant (weights sum to 1, edges clamped)") {
    val px = Raster.grid(spark, 10, 10)((_, _) => lit(42.5))
    val out = Resample.bilinear(px, 10, 10, 7, 13).collect()
    assert(out.length === 7 * 13)
    out.foreach(r => assert(r.getDouble(2) === 42.5, s"pixel (${r.getInt(0)},${r.getInt(1)})"))
  }

  test("2x upsample of a linear ramp interpolates linearly") {
    // v = x on a ramp: bilinear reproduces the linear function at any
    // sample point, so out(i) = clamp((i+0.5)/2 - 0.5, 0, w-1)
    val px = Raster.grid(spark, 8, 4)((x, _) => x.cast("double"))
    val out = Resample
      .bilinear(px, 8, 4, 16, 4)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    (0 until 16).foreach { i =>
      val expect = math.min(math.max((i + 0.5) * 0.5 - 0.5, 0.0), 7.0)
      assert(math.abs(out((i, 1)) - expect) < 1e-9, s"col $i")
    }
  }

  test("downsample averages the covered neighborhood (2:1 exact midpoint case)") {
    // 2:1 downsample centers land exactly between source pixels:
    // out(i) = (v(2i) + v(2i+1)) / 2 on a 1-D varying surface
    val px = Raster.grid(spark, 8, 2)((x, _) => (x * x).cast("double"))
    val out = Resample
      .bilinear(px, 8, 2, 4, 2)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    (0 until 4).foreach { i =>
      val expect = (math.pow(2 * i, 2) + math.pow(2 * i + 1, 2)) / 2.0
      assert(math.abs(out((i, 0)) - expect) < 1e-9, s"col $i")
    }
  }

  test("windowed region read: crop + warp equals resampling the cropped grid directly") {
    val px = Raster.grid(spark, 32, 32)((x, y) => (x * 3 + y * 11).cast("double"))
    val viaWindow = Resample
      .bilinearWindow(px, 8, 4, 24, 20, dstW = 10, dstH = 10)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    val direct = Resample
      .bilinear(
        Raster.grid(spark, 16, 16)((x, y) => ((x + 8) * 3 + (y + 4) * 11).cast("double")),
        16, 16, 10, 10
      )
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    assert(viaWindow === direct)
  }

  test("cubic: constant surface stays constant (kernel weights sum to 1, edges clamp-replicated)") {
    val px = Raster.grid(spark, 10, 10)((_, _) => lit(42.5))
    val out = Resample.cubic(px, 10, 10, 7, 13).collect()
    assert(out.length === 7 * 13)
    out.foreach(r => assert(math.abs(r.getDouble(2) - 42.5) < 1e-6, s"pixel (${r.getInt(0)},${r.getInt(1)})"))
  }

  test("cubic: interpolating kernel reproduces source samples at integer alignment") {
    // same-size warp puts every output center on a source center:
    // fx=fy=0 → the Catmull-Rom weights collapse to (0,1,0,0)
    val px = Raster.grid(spark, 16, 16)((x, y) => (x * 7 + y * 3).cast("double"))
    val out = Resample
      .cubic(px, 16, 16, 16, 16)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    val src = px.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out === src)
  }

  test("cubic: 2x upsample of a linear ramp is linear in the interior (Catmull-Rom reproduces degree-1)") {
    val px = Raster.grid(spark, 8, 4)((x, _) => x.cast("double"))
    val out = Resample
      .cubic(px, 8, 4, 16, 4)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    // interior columns: taps never clamp for i in [3, 12]
    (3 to 12).foreach { i =>
      val expect = (i + 0.5) * 0.5 - 0.5
      assert(math.abs(out((i, 1)) - expect) < 1e-6, s"col $i")
    }
  }

  test("q_resample: full output grid, values inside the source range") {
    val rows = Resample.resampleQuery(spark, sf0001).collect()
    assert(rows.length === 40 * 52)
    // the surface is 100 + tilt + mounds: interpolation cannot exceed
    // the source extremes
    val vs = rows.map(_.getDouble(2))
    assert(vs.min >= 100.0 - 1e-6)
    assert(vs.max <= 100.0 + 63 * 63 * 0.01 + 0.25 * 400 + 0.125 * 300 + 1e-6)
  }
}
