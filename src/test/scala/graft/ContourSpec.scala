package graft

import org.apache.spark.sql.functions._

import graft.raster.{Contour, Raster}

/** Marching-squares contour tracing — behavior mirrored from
  * `tests/contour_test.cpp:65-212` (features per level, base-offset
  * alignment, min/max clipping, count→interval) plus structural
  * properties GDAL guarantees (closed loops on a smooth field).
  */
class ContourSpec extends SparkSuite {

  import spark.implicits._

  /** Gradient DEM: value = x (like the reference's createGradientDem). */
  private def gradient(w: Int, h: Int) =
    Raster.grid(spark, w, h)((x, _) => x.cast("double"))

  test("fixed interval: vertical contour lines at interpolated x (contour_test.cpp:65)") {
    val cells = Contour.cells(gradient(20, 10).select($"x", $"y", $"value"))
    val segs = Contour.segments(cells, Seq(5.0, 10.0)).cache()
    assert(segs.count() > 0)
    // value = x → contours are vertical lines x = level; every segment
    // sits exactly on its level's x and spans one pixel row
    val bad = segs.filter(abs($"x1" - $"level") > 1e-9 || abs($"x2" - $"level") > 1e-9).count()
    assert(bad === 0)
    // 9 interior rows → 9 unit segments per level
    assert(segs.groupBy("level").count().collect().forall(_.getLong(1) === 9))
    segs.unpersist()
  }

  test("levels align to base + k*interval and clip to [min, max] (contour_test.cpp:104-141)") {
    val lv = Raster.contourLevels(mn = 3.0, mx = 47.0, interval = Some(10.0))
    assert(lv === Seq(10.0, 20.0, 30.0, 40.0))
    lv.foreach(l => assert(l % 10.0 === 0.0))
    val clipped = lv.filter(l => l >= 15.0 && l <= 35.0)
    assert(clipped === Seq(20.0, 30.0))
  }

  test("count derives interval = range/count (contour_test.cpp:88-102)") {
    val lv = Raster.contourLevels(mn = 0.0, mx = 99.0, interval = None, count = 10)
    assert(lv.nonEmpty)
    assert(math.abs((99.0 - 0.0) / 10 - 9.9) < 1e-12)
    assert(lv.forall(l => l >= 0 && l <= 99))
  }

  test("closed loops on a cone: every endpoint is shared by exactly two segments") {
    // value = 100 − distance from grid center → level sets are closed
    // rings; marching squares must produce a closed cycle (each crossing
    // point appears exactly twice as a segment endpoint)
    val cone = Raster.grid(spark, 30, 30) { (x, y) =>
      lit(100.0) - sqrt((x - 15.0) * (x - 15.0) + (y - 15.0) * (y - 15.0))
    }
    val cells = Contour.cells(cone.select($"x", $"y", $"value"))
    val segs = Contour.segments(cells, Seq(92.3)).cache()
    assert(segs.count() > 4)
    val pts = segs
      .select(round($"x1", 9).as("px"), round($"y1", 9).as("py"))
      .union(segs.select(round($"x2", 9), round($"y2", 9)))
      .groupBy("px", "py")
      .count()
    assert(pts.filter($"count" =!= 2).count() === 0, "open contour: some endpoint not shared by exactly 2 segments")
    segs.unpersist()
  }

  test("no segment on a flat cell; degenerate levels produce nothing") {
    val flat = Raster.grid(spark, 5, 5)((_, _) => lit(7.0))
    val segs = Contour.segments(Contour.cells(flat.select($"x", $"y", $"value")), Seq(3.0, 12.0))
    assert(segs.count() === 0)
    assert(Raster.contourLevels(5.0, 5.0, None, 10) === Seq.empty)
  }

  test("crossings are exactly the segment endpoints (relational core ≡ kernel)") {
    val cells = Contour.cells(gradient(12, 8).select($"x", $"y", $"value"))
    val levels = Seq(4.0, 7.0)
    val cross = Contour
      .crossings(cells, levels.toDF("level"))
      .select($"level", round($"x", 9).as("px"), round($"y", 9).as("py"))
      .distinct()
    val segPts = Contour
      .segments(cells, levels)
      .select($"level", round($"x1", 9).as("px"), round($"y1", 9).as("py"))
      .union(Contour.segments(cells, levels).select($"level", round($"x2", 9), round($"y2", 9)))
      .distinct()
    assert(segPts.except(cross).count() === 0, "kernel emitted an endpoint that is not an edge crossing")
  }
}
