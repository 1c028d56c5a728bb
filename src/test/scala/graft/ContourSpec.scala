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

  test("polyline assembly: one closed ring per level on a cone (contour_test.cpp feature shape)") {
    val cone = Raster.grid(spark, 30, 30) { (x, y) =>
      lit(100.0) - sqrt((x - 15.0) * (x - 15.0) + (y - 15.0) * (y - 15.0))
    }
    val cells = Contour.cells(cone.select($"x", $"y", $"value"))
    // non-lattice levels: radii 9.5/7.7/5.9 keep crossings off grid
    // corners (corner-exact levels degrade to junction topology, which
    // stitches deterministically but not as a single ring — same as
    // GDAL's tracer on corner-degenerate input)
    val segs = Contour.segments(cells, Seq(90.5, 92.3, 94.1))
    val lines = Contour.polylines(segs).collect()
    // each level set of a cone is ONE closed ring
    assert(lines.length === 3)
    assert(lines.forall(_.getAs[Boolean]("closed")))
    assert(lines.forall(_.getAs[Int]("n_points") > 4))
    // ring circumference ≈ 2π·r (r = 100 − level), coarse on a pixel grid
    lines.foreach { l =>
      val level = l.getAs[Double]("level")
      val r = 100.0 - level
      val len = l.getAs[Double]("length")
      assert(math.abs(len - 2 * math.Pi * r) / (2 * math.Pi * r) < 0.15, s"level $level len $len r $r")
    }
  }

  test("polyline assembly: open lines on a gradient span the grid; simplify collapses collinear points") {
    val cells = Contour.cells(gradient(20, 10).select($"x", $"y", $"value"))
    val segs = Contour.segments(cells, Seq(5.0, 10.0))
    val raw = Contour.polylines(segs).collect()
    // vertical contours: one open line per level, 9 unit segments → 10 points
    assert(raw.length === 2)
    assert(raw.forall(!_.getAs[Boolean]("closed")))
    assert(raw.forall(_.getAs[Int]("n_points") === 10))
    assert(raw.forall(r => math.abs(r.getAs[Double]("length") - 9.0) < 1e-9))
    // all interior points are collinear → DP keeps only the 2 endpoints
    val simp = Contour.polylines(segs, simplifyEps = 0.01).collect()
    assert(simp.forall(_.getAs[Int]("n_points") === 2))
    assert(simp.forall(r => math.abs(r.getAs[Double]("length") - 9.0) < 1e-9))
  }

  test("polyline assembly is deterministic (same ids and starts on recompute)") {
    val cone = Raster.grid(spark, 24, 24) { (x, y) =>
      lit(50.0) - sqrt((x - 12.0) * (x - 12.0) + (y - 12.0) * (y - 12.0))
    }
    val segs = Contour.segments(Contour.cells(cone.select($"x", $"y", $"value")), Seq(44.0, 46.0))
    def snap() = Contour.polylines(segs).orderBy("level", "line_id")
      .collect().map(_.toSeq).toSeq
    assert(snap() === snap())
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
