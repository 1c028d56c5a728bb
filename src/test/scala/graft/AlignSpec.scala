package graft

import org.apache.spark.sql.functions._
import graft.geo.Align

/** Align estimator vs reference semantics — `align.cpp:415-499`
  * (Umeyama direct 2D Procrustes + RANSAC consensus + refit). */
class AlignSpec extends SparkSuite {
  import spark.implicits._

  private def grid(n: Int) =
    spark.range(n.toLong).select(
      $"id".as("tp_id"),
      ($"id" % 20).cast("double").as("px"),
      (expr("id div 20") % 20).cast("double").as("py")
    )

  test("umeyama recovers an exact similarity from noise-free points") {
    val pts = grid(400).select(
      $"px", $"py",
      (lit(2.0) * (lit(0.6) * $"px" - lit(0.8) * $"py") + lit(3.0)).as("qx"),
      (lit(2.0) * (lit(0.8) * $"px" + lit(0.6) * $"py") - lit(7.0)).as("qy")
    )
    val r = Align.umeyama(pts).head()
    assert(math.abs(r.getAs[Double]("scale") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("cos_theta") - 0.6) < 1e-12)
    assert(math.abs(r.getAs[Double]("sin_theta") - 0.8) < 1e-12)
    assert(math.abs(r.getAs[Double]("tx") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ty") + 7.0) < 1e-9)
  }

  test("pure translation returns R = I exactly (direct-form property, align.cpp:417-424)") {
    // the reference deliberately avoids the 2×2 SVD because it injects
    // a spurious rotation in the translation-dominated case; the
    // direct form must return cosθ=1, sinθ=0 EXACTLY
    val pts = grid(400).select($"px", $"py", ($"px" + 12.5).as("qx"), ($"py" - 4.25).as("qy"))
    val r = Align.umeyama(pts).head()
    assert(r.getAs[Double]("cos_theta") === 1.0)
    assert(r.getAs[Double]("sin_theta") === 0.0)
    assert(math.abs(r.getAs[Double]("scale") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("tx") - 12.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("ty") + 4.25) < 1e-9)
  }

  test("degenerate input (coincident points) hits the identity guards, no NaN") {
    val pts = Seq((1L, 5.0, 5.0, 9.0, 2.0), (2L, 5.0, 5.0, 9.0, 2.0))
      .toDF("tp_id", "px", "py", "qx", "qy")
    val r = Align.umeyama(pts).head()
    assert(r.getAs[Double]("scale") === 1.0)
    assert(r.getAs[Double]("cos_theta") === 1.0)
    assert(r.getAs[Double]("sin_theta") === 0.0)
    assert(!r.getAs[Double]("tx").isNaN && !r.getAs[Double]("ty").isNaN)
  }

  test("ransacAlign rejects outliers and the refit beats the contaminated fit") {
    val pts = grid(400).select(
      $"tp_id", $"px", $"py",
      (lit(1.25) * (lit(0.6) * $"px" - lit(0.8) * $"py") + lit(10.0)
        + when($"tp_id" % 10 === 3, 50.0).otherwise(0.0)).as("qx"),
      (lit(1.25) * (lit(0.8) * $"px" + lit(0.6) * $"py") - lit(5.0)
        + when($"tp_id" % 10 === 3, -35.0).otherwise(0.0)).as("qy")
    )
    val r = Align.ransacAlign(pts, threshold = 2.0, nCand = 12).head()
    assert(r.getAs[Long]("inlier_count") === 360L) // exactly the clean 90%
    assert(r.getAs[Double]("inlier_ratio") === 0.9)
    assert(math.abs(r.getAs[Double]("scale") - 1.25) < 1e-6)
    assert(math.abs(r.getAs[Double]("cos_theta") - 0.6) < 1e-6)
    assert(math.abs(r.getAs[Double]("sin_theta") - 0.8) < 1e-6)
    assert(math.abs(r.getAs[Double]("tx") - 10.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("ty") + 5.0) < 1e-6)
    // the naive all-points fit is dragged off by the outlier cohort
    val naive = Align.umeyama(pts).head()
    assert(math.abs(naive.getAs[Double]("tx") - 10.0) > 1.0)
  }

  test("rmse of the ransac fit on the oracle fixture is jitter-scale") {
    val fit = Align.alignQuery(spark, sf0001).head()
    val (s, c, si, tx, ty) =
      (fit.getAs[Double]("scale"), fit.getAs[Double]("cos_theta"), fit.getAs[Double]("sin_theta"),
        fit.getAs[Double]("tx"), fit.getAs[Double]("ty"))
    val pts = graft.Tables.eventsRaw(spark, sf0001).select(
      $"event_id".as("tp_id"),
      ($"event_id" % 100).cast("double").as("px"),
      (expr("event_id div 100") % 100).cast("double").as("py")
    ).select(
      $"tp_id", $"px", $"py",
      (lit(1.25) * (lit(0.6) * $"px" - lit(0.8) * $"py") + lit(10.0)
        + (($"tp_id" * 7919) % 13 - 6).cast("double") / 64).as("qx"),
      (lit(1.25) * (lit(0.8) * $"px" + lit(0.6) * $"py") - lit(5.0)
        + (($"tp_id" * 104729) % 13 - 6).cast("double") / 64).as("qy")
    ).filter($"tp_id" % 10 =!= 3) // clean cohort
    val rmse = pts.select(
      sqrt(avg(
        (lit(s) * (lit(c) * $"px" - lit(si) * $"py") + lit(tx) - $"qx") * (lit(s) * (lit(c) * $"px" - lit(si) * $"py") + lit(tx) - $"qx")
          + (lit(s) * (lit(si) * $"px" + lit(c) * $"py") + lit(ty) - $"qy") * (lit(s) * (lit(si) * $"px" + lit(c) * $"py") + lit(ty) - $"qy")
      )).as("rmse")
    ).head().getDouble(0)
    assert(rmse < 0.1, s"rmse $rmse should be jitter-scale (max jitter 6/64 per axis)")
  }
}
