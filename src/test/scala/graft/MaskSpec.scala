package graft

import org.apache.spark.sql.functions._
import graft.raster.Mask

/** Border masking vs reference semantics — `mask.cpp:14-248` (GDAL
  * nearblack, `-alg floodfill`): only border-CONNECTED near-color
  * pixels are masked; interior near-color blobs survive. */
class MaskSpec extends SparkSuite {
  import spark.implicits._

  private def grid(w: Int, h: Int)(rgb: (Int, Int) => (Int, Int, Int)) = {
    val rows = for (y <- 0 until h; x <- 0 until w) yield {
      val (r, g, b) = rgb(x, y)
      (x, y, r, g, b)
    }
    rows.toDF("x", "y", "r", "g", "b")
  }

  private def maskMap(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Int] =
    df.select("x", "y", "mask").collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap

  test("black collar is masked; bright interior is kept") {
    // 8×8, 1-px black frame, bright center
    val px = grid(8, 8) { (x, y) =>
      if (x == 0 || x == 7 || y == 0 || y == 7) (0, 0, 0) else (200, 180, 160)
    }
    val m = maskMap(Mask.maskBorders(px, 8, 8, nearDist = 15))
    assert(m((0, 0)) == 0 && m((7, 7)) == 0 && m((3, 0)) == 0)
    assert(m((3, 3)) == 255 && m((1, 1)) == 255)
    assert(m.count(_._2 == 0) == 28) // the frame: 8*8 - 6*6
  }

  test("interior near-black blob survives (floodfill, not global threshold)") {
    val px = grid(10, 10) { (x, y) =>
      if (y == 0) (5, 5, 5) // collar only along the top
      else if (x >= 4 && x <= 6 && y >= 4 && y <= 6) (8, 8, 8) // interior blob
      else (100, 100, 100)
    }
    val m = maskMap(Mask.maskBorders(px, 10, 10, nearDist = 15))
    assert((0 until 10).forall(x => m((x, 0)) == 0), "top collar masked")
    assert(m((5, 5)) == 255 && m((4, 4)) == 255, "interior blob kept")
    assert(m.count(_._2 == 0) == 10)
  }

  test("concave collar bay is reached through the border (the floodfill case)") {
    // collar along the left edge, with a bay jutting right at y=5 that
    // only connects to the border through the collar itself
    val px = grid(12, 12) { (x, y) =>
      val collar = x == 0 || (y == 5 && x <= 7)
      if (collar) (0, 0, 0) else (90, 90, 90)
    }
    val m = maskMap(Mask.maskBorders(px, 12, 12, nearDist = 15))
    assert((0 to 7).forall(x => m((x, 5)) == 0), "bay masked through the left edge")
    assert(m((8, 5)) == 255)
  }

  test("white collar with -white semantics") {
    val px = grid(6, 6) { (x, y) =>
      if (x == 0 || x == 5 || y == 0 || y == 5) (255, 250, 247) else (30, 30, 30)
    }
    val m = maskMap(Mask.maskBorders(px, 6, 6, nearDist = 15, target = Seq(255, 255, 255)))
    assert(m((0, 0)) == 0 && m((2, 0)) == 0)
    assert(m((2, 2)) == 255)
  }

  test("nearDist = 0 masks only the exact color") {
    val px = grid(6, 1) { (x, _) => if (x <= 2) (0, 0, 0) else if (x == 3) (1, 0, 0) else (50, 50, 50) }
    val m = maskMap(Mask.maskBorders(px, 6, 1, nearDist = 0))
    assert(m((0, 0)) == 0 && m((2, 0)) == 0)
    assert(m((3, 0)) == 255, "1-off pixel not near at tolerance 0")
  }

  test("near pixel NOT on/connected to border is kept even when alone") {
    val px = grid(5, 5) { (x, y) => if (x == 2 && y == 2) (3, 3, 3) else (80, 80, 80) }
    val m = maskMap(Mask.maskBorders(px, 5, 5))
    assert(m.values.forall(_ == 255))
  }

  test("single-band (DEM/grey) masking — the 1-band domain of mask.cpp:41") {
    val px = (for (y <- 0 until 6; x <- 0 until 6)
      yield (x, y, if (x == 0 || y == 0) 2 else 120)).toDF("x", "y", "v")
    val m = Mask
      .maskBorders(px, 6, 6, nearDist = 15, target = Seq(0), bandCols = Seq("v"))
      .select("x", "y", "mask")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2))
      .toMap
    assert(m((0, 3)) == 0 && m((3, 0)) == 0 && m((3, 3)) == 255)
  }

  test("all bands must be near: dark-red pixel is not near-black") {
    val px = grid(4, 1) { (x, _) => if (x == 0) (0, 0, 0) else if (x == 1) (10, 200, 10) else (90, 90, 90) }
    val m = maskMap(Mask.maskBorders(px, 4, 1))
    assert(m((0, 0)) == 0)
    assert(m((1, 0)) == 255, "green channel breaks the near predicate")
  }

  test("maskQuery fixture: collar rows masked, blob rows kept, counts conserve") {
    val out = Mask.maskQuery(spark, sf0001).collect()
    assert(out.length == 48)
    out.foreach(r => assert(r.getLong(1) + r.getLong(2) == 48, "masked + kept = width"))
    val byY = out.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byY(0) == 48 && byY(1) == 48, "top collar rows fully masked")
    assert(byY(24) >= 4, "mid rows carry the side collars")
    // blob rows (y 22..27) keep their interior: masked count there is
    // only the side collars, identical to a blob-free row with the
    // same ragged-collar width ((y*7)%4 equal for 24 and 28)
    assert(byY(24) == byY(28))
  }

  test("band-domain gate mirrors mask_cog_test: 4-band needs alpha, 3/4-band needs Byte") {
    import graft.raster.Mask
    Mask.validateBands(1, 4) // DEM float is fine single-band
    Mask.validateBands(3, 1)
    Mask.validateBands(4, 1, band4IsAlpha = true)
    assert(intercept[IllegalArgumentException](Mask.validateBands(4, 1, band4IsAlpha = false))
      .getMessage.contains("alpha"))
    assert(intercept[IllegalArgumentException](Mask.validateBands(2, 1)).getMessage.contains("2 bands"))
    assert(intercept[IllegalArgumentException](Mask.validateBands(5, 1)).getMessage.contains("5 bands"))
    assert(intercept[IllegalArgumentException](Mask.validateBands(3, 2)).getMessage.contains("8-bit"))
  }
}
