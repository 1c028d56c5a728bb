package graft

import org.apache.spark.sql.functions._
import graft.raster.{Raster, Stockpile}

/** Stockpile detection vs reference semantics — `stockpile.cpp:91-482`
  * (flood fill / two-pass labeling, border base plane, adaptive
  * threshold, per-component volume) re-checked on handcrafted grids. */
class StockpileSpec extends SparkSuite {
  import spark.implicits._

  test("convolveSeparable: clamped-edge binomial smoothing matches hand-computed values") {
    // 1-D impulse on a 5×1 grid: value 16 at x=2
    val px = Seq((0, 0, 0.0), (1, 0, 0.0), (2, 0, 16.0), (3, 0, 0.0), (4, 0, 0.0))
      .toDF("x", "y", "value")
    val out = Stockpile
      .convolveSeparable(px, Stockpile.Binomial5, width = 5, height = 1)
      .collect()
      .map(r => (r.getInt(0), r.getDouble(2)))
      .toMap
    // vertical pass over height 1 sums all 5 clamped taps onto the
    // same row (Σw = 1), so the horizontal profile is preserved
    assert(out(0) === 1.0) // w(+2)·16
    assert(out(1) === 4.0)
    assert(out(2) === 6.0)
    assert(out(3) === 4.0)
    assert(out(4) === 1.0)
  }

  test("convolveSeparable: edge clamp re-weights the border pixel") {
    // impulse AT the edge x=0: out(0) = (w0 + w-1 + w-2)·16 since
    // clamp(0-1)=clamp(0-2)=0 — the reference's std::clamp semantics
    val px = Seq((0, 0, 16.0), (1, 0, 0.0), (2, 0, 0.0), (3, 0, 0.0), (4, 0, 0.0))
      .toDF("x", "y", "value")
    val out = Stockpile
      .convolveSeparable(px, Stockpile.Binomial5, width = 5, height = 1)
      .collect()
      .map(r => (r.getInt(0), r.getDouble(2)))
      .toMap
    assert(out(0) === 11.0) // (6+4+1)/16 · 16 — taps −2,−1,0 all clamp to x=0
    assert(out(1) === 5.0) // (4+1)/16 · 16 — taps −1 AND −2 both reach x=0
    assert(out(2) === 1.0) // tap −2 clamps to x=0
    assert(out(3) === 0.0)
  }

  test("connectedComponents: min-label fixpoint over a U-shape (long propagation path)") {
    // U-shape: two vertical arms of height 6 joined at the bottom —
    // min id sits at the TOP of the left arm; the right arm only
    // learns it through the full path around the U.
    val cells =
      (0 to 5).map(y => (0, y)) ++ (0 to 5).map(y => (4, y)) ++ (1 to 3).map(x => (x, 5))
    val fg = cells.toDF("x", "y").withColumn("id", $"y".cast("long") * 10 + $"x")
    val labels = Stockpile.connectedComponents(fg, Stockpile.adjacencyEdges(fg))
    val labs = labels.select("lab").distinct().as[Long].collect()
    assert(labs.toSet === Set(0L)) // one component, labelled by min id (0,0)
    assert(labels.count() === cells.size)
  }

  test("connectedComponents: separate blobs get separate min-id labels") {
    val fg = Seq((0, 0), (1, 0), (5, 5), (5, 6), (9, 9))
      .toDF("x", "y")
      .withColumn("id", $"y".cast("long") * 10 + $"x")
    val labels = Stockpile.connectedComponents(fg, Stockpile.adjacencyEdges(fg))
    val byLab = labels.groupBy("lab").count().as[(Long, Long)].collect().toMap
    assert(byLab === Map(0L -> 2L, 55L -> 2L, 99L -> 1L))
  }

  test("detectAll: finds mounds, merges overlapping ones, filters tiny, sorts by volume") {
    val rows = Stockpile.stockpileQuery(spark, sf0001).collect()
    assert(rows.length === 5) // 6 mounds, 2 merged, tiny bump below threshold
    val vols = rows.map(_.getAs[Double]("est_volume"))
    assert(vols.sorted.reverse.toSeq === vols.toSeq) // volume-desc order
    // merged pair (28,34)+(33,34) → one component centred midway
    val merged = rows.find(r => math.abs(r.getAs[Double]("centroid_x") - 30.5) < 0.1).get
    assert(math.abs(merged.getAs[Double]("centroid_y") - 34.0) < 0.1)
    // every confidence in (0, 1]
    assert(rows.forall { r =>
      val c = r.getAs[Double]("confidence"); c > 0.0 && c <= 1.0
    })
  }

  test("detectAt: reports only the clicked component; off-pile click reports nothing") {
    val px = Raster.grid(spark, 32, 32) { (x, y) =>
      lit(50.0) +
        lit(0.5) * greatest(lit(0), lit(16) - ((x - 8) * (x - 8) + (y - 8) * (y - 8))) +
        lit(0.5) * greatest(lit(0), lit(16) - ((x - 24) * (x - 24) + (y - 22) * (y - 22)))
    }
    val hit = Stockpile.detectAt(px, 32, 32, cellArea = 1.0, seedX = 8, seedY = 8, sensitivity = 0.6)
    val r = hit.collect()
    assert(r.length === 1)
    assert(math.abs(r(0).getAs[Double]("centroid_x") - 8.0) < 0.5)
    assert(math.abs(r(0).getAs[Double]("centroid_y") - 8.0) < 0.5)
    val miss = Stockpile.detectAt(px, 32, 32, cellArea = 1.0, seedX = 16, seedY = 16, sensitivity = 0.6)
    assert(miss.count() === 0)
  }

  test("detectAll respects minArea and maxResults truncation") {
    val full = Stockpile.stockpileQuery(spark, sf0001)
    // same fixture, higher minArea: the 11.25 m² component drops
    def m(cx: Int, cy: Int, r2: Int, amp: Double)(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      lit(amp) * greatest(lit(0), lit(r2) - ((x - cx) * (x - cx) + (y - cy) * (y - cy)))
    val px = Raster.grid(spark, 64, 64)((x, y) =>
      lit(100.0) + m(12, 12, 36, 0.25)(x, y) + m(44, 14, 64, 0.125)(x, y) +
        m(14, 46, 25, 0.25)(x, y) + m(52, 48, 49, 0.25)(x, y) +
        m(28, 34, 25, 0.25)(x, y) + m(33, 34, 25, 0.25)(x, y) + m(4, 58, 2, 0.5)(x, y)
    )
    val bigOnly = Stockpile.detectAll(px, 64, 64, 0.25, 0.6, minAreaM2 = 15.0, maxResults = 10)
    assert(bigOnly.count() === full.count() - 1)
    val top2 = Stockpile.detectAll(px, 64, 64, 0.25, 0.6, minAreaM2 = 1.0, maxResults = 2)
    assert(top2.count() === 2)
    assert(top2.agg(max("id")).head().getInt(0) === 2)
    // truncation keeps the LARGEST components in volume-desc order with
    // ids reassigned sequentially (ref detectAllStockpilesJson sort,
    // stockpile.cpp:566-888) — the survivors must be exactly the full
    // run's top-2 rows, id included
    val fullTop2 = full
      .orderBy(col("est_volume").desc, col("id").asc)
      .limit(2)
      .collect()
      .map(r => (r.getInt(0), r.getDouble(3)))
      .toSeq
    val got = top2
      .orderBy(col("id").asc)
      .collect()
      .map(r => (r.getInt(0), r.getDouble(3)))
      .toSeq
    assert(got === fullTop2, "maxResults must truncate AFTER the volume-desc sort")
    assert(got.map(_._2) === got.map(_._2).sorted.reverse, "ids must follow volume-desc order")
  }
}
