package graft

import org.apache.spark.sql.functions._

import graft.geo.{GeoQueries, Mercator}
import graft.raster.Png

/** PNG codec + per-tile byte rendering — the encoder stage of
  * `gdaltiler.cpp:200-400` (tile window → byte plane → PNG).
  */
class TileRenderSpec extends SparkSuite {

  import spark.implicits._

  test("png roundtrip: gray and rgb planes survive encode→decode bit-exact") {
    val gray = Array.tabulate(16 * 16)(i => ((i * 7) % 256).toByte)
    val g = Png.decode(Png.encodeGray(16, 16, gray)).get
    assert(g.width === 16 && g.height === 16 && g.channels === 1)
    assert(g.pixels.toSeq === gray.toSeq)

    val rgb = Array.tabulate(8 * 4 * 3)(i => ((i * 13 + 5) % 256).toByte)
    val c = Png.decode(Png.encode(8, 4, 3, rgb)).get
    assert(c.width === 8 && c.height === 4 && c.channels === 3)
    assert(c.pixels.toSeq === rgb.toSeq)

    assert(!Png.isPng("not a png at all".getBytes))
    assert(Png.decode("garbage".getBytes) === None)
  }

  test("renderTiles: every pixel lands at its Mercator position in the right tile") {
    val z = 12
    // dense 64×64 pixel plane over a small area; byte = 7 everywhere so
    // rendered pixels are distinguishable from the 0 background
    val px = spark
      .range(64L * 64)
      .select(
        (lit(-10.0) + (col("id") % 64 + 0.5) * 0.001).as("lon"),
        (lit(40.0) - (col("id") / 64 + 0.5) * 0.001).as("lat"),
        lit(7).as("byte")
      )
    val tiles = GeoQueries.renderTiles(px, z).cache()
    val rows = tiles.collect()
    assert(rows.nonEmpty)
    // pixel conservation: every input pixel is in exactly one tile
    assert(rows.map(_.getAs[Long]("n_px")).sum === 64L * 64)
    rows.foreach { r =>
      val img = Png.decode(r.getAs[Array[Byte]]("png")).get
      assert(img.width === 256 && img.height === 256 && img.channels === 1)
      // non-background pixels ≤ n_px (grid points may share a cell) and > 0
      val lit7 = img.pixels.count(_ == 7.toByte)
      assert(lit7 > 0 && lit7 <= r.getAs[Long]("n_px"))
      // no stray values: only 0 (background) and 7 (band) appear
      assert(img.pixels.forall(b => b == 0.toByte || b == 7.toByte))
    }
    // spot-check one concrete pixel against the scalar Mercator math
    val (lon0, lat0) = (-10.0 + 0.5 * 0.001, 40.0 - 0.5 * 0.001)
    val (mx, my) = Mercator.latLonToMeters(lat0, lon0)
    val (gpx, gpy) = Mercator.metersToPixels(mx, my, z)
    val (tx, tyTms) = Mercator.pixelsToTile(gpx, gpy)
    val tyXyz = Mercator.tmsToXYZ(tyTms, z)
    val tile = rows.find(r => r.getAs[Long]("tx") == tx && r.getAs[Long]("ty") == tyXyz).get
    val img = Png.decode(tile.getAs[Array[Byte]]("png")).get
    val ix = gpx.toInt - tx * 256
    val iy = 255 - (gpy.toInt - tyTms * 256)
    assert(img.pixels(iy * 256 + ix) === 7.toByte, s"expected band byte at ($ix,$iy) of tile ($tx,$tyXyz)")
    tiles.unpersist()
  }

  test("colormapped RGB tiles: applyColormap feeds truecolour PNGs") {
    val z = 12
    val px = spark
      .range(32L * 32)
      .select(
        (lit(-10.0) + (col("id") % 32 + 0.5) * 0.001).as("lon"),
        (lit(40.0) - (col("id") / 32 + 0.5) * 0.001).as("lat"),
        ((col("id") % 32) / 31.0).as("v") // normalized band [0, 1]
      )
      .withColumn("c", graft.raster.Vegetation.applyColormap("rdylgn", col("v")))
      .select(col("lon"), col("lat"), col("c.r").as("r"), col("c.g").as("g"), col("c.b").as("b"))
    val tiles = GeoQueries.renderTilesRgb(px, z).collect()
    assert(tiles.nonEmpty)
    assert(tiles.map(_.getAs[Long]("n_px")).sum === 32L * 32)
    val img = Png.decode(tiles.head.getAs[Array[Byte]]("png")).get
    assert(img.width === 256 && img.height === 256 && img.channels === 3)
    // rendered pixels carry colormap stops (non-black); background stays black
    val nonBlack = (0 until 256 * 256).count { i =>
      img.pixels(i * 3) != 0 || img.pixels(i * 3 + 1) != 0 || img.pixels(i * 3 + 2) != 0
    }
    assert(nonBlack > 0 && nonBlack <= tiles.head.getAs[Long]("n_px"))
  }

  test("multimodal: PNG payloads decode for REAL; non-PNG falls back to byte plane") {
    val plane = Array.tabulate(32 * 32)(i => ((i * 31) % 256).toByte)
    val png = Png.encodeGray(32, 32, plane)
    val (mean, std) = graft.multimodal.Multimodal.StubCodecs.imageStats(png)
    val expMean = plane.map(_ & 0xff).sum.toDouble / plane.length
    assert(math.abs(mean - expMean) < 1e-9, "stats must come from decoded pixels, not file bytes")
    assert(std > 0)

    val resized = graft.multimodal.Multimodal.StubCodecs.resizeImage(png, 8, 8).get
    val rimg = Png.decode(resized).get
    assert(rimg.width === 8 && rimg.height === 8)
    // nearest-neighbour: corner pixel survives
    assert(rimg.pixels(0) === plane(0))

    assert(graft.multimodal.Multimodal.StubCodecs.resizeImage("text payload".getBytes, 8, 8) === None)
  }
}
