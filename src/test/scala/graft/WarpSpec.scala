package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.raster.Warp
import graft.raster.Warp.Affine

/** GCP warp (geoproject.cpp:144-200 semantics without GDAL): LSQ
  * affine fit, analytic inverse, nearest sampling with inside mask. */
class WarpSpec extends AnyFunSuite {

  test("fit over consistent GCPs recovers the exact affine") {
    val t = Affine(10.0, 2.0, -1.0, -5.0, 0.5, 3.0)
    val gcps = Seq((0.0, 0.0), (0.0, 32.0), (32.0, 32.0), (32.0, 0.0), (16.0, 8.0)).map { case (px, py) =>
      val (x, y) = t(px, py); (px, py, x, y)
    }
    val fit = Warp.fitGcps(gcps)
    assert(math.abs(fit.a - t.a) < 1e-9 && math.abs(fit.b - t.b) < 1e-9 && math.abs(fit.c - t.c) < 1e-9)
    assert(math.abs(fit.d - t.d) < 1e-9 && math.abs(fit.e - t.e) < 1e-9 && math.abs(fit.f - t.f) < 1e-9)
  }

  test("fit over perturbed GCPs is the least-squares compromise, not an exact interpolant") {
    val t = Affine(0.0, 2.0, 0.0, 0.0, 0.0, 3.0)
    val base = Seq((0.0, 0.0), (0.0, 32.0), (32.0, 32.0), (32.0, 0.0)).map { case (px, py) =>
      val (x, y) = t(px, py); (px, py, x, y)
    }
    val perturbed = base.updated(2, (32.0, 32.0, base(2)._3 + 2.0, base(2)._4 - 2.0))
    val fit = Warp.fitGcps(perturbed)
    // residuals nonzero at the perturbed corner, but the fit stays close
    val (rx, ry) = fit(32.0, 32.0)
    assert(math.abs(rx - (base(2)._3 + 2.0)) > 0.1)
    assert(math.abs(fit.b - 2.0) < 0.1 && math.abs(fit.f - 3.0) < 0.1)
    // degenerate configurations are a named error
    val line = Seq((0.0, 0.0, 0.0, 0.0), (1.0, 0.0, 1.0, 0.0), (2.0, 0.0, 2.0, 0.0))
    assertThrows[IllegalArgumentException](Warp.fitGcps(line))
  }

  test("identity-scaled warp samples each source pixel once, fully inside") {
    // geo == pixel space: X = px, Y = H - py (north-up flip)
    val aff = Affine(0.0, 1.0, 0.0, 32.0, 0.0, -1.0)
    val samples = Warp.geoprojectSamples(aff, 32, 32, 32, 32, 0.0, 0.0, 32.0, 32.0)
    assert(samples.length == 32 * 32)
    assert(samples.forall(_.inside))
    // output row r (top = maxy) maps back to source row r; col = col
    assert(samples.forall(s => s.srcRow == s.row && s.srcCol == s.col))
  }

  test("footprint smaller than the output bbox masks outside pixels") {
    // source occupies the left half of the output extent
    val aff = Affine(0.0, 1.0, 0.0, 32.0, 0.0, -1.0) // maps [0,32]x[0,32]
    val samples = Warp.geoprojectSamples(aff, 32, 32, 40, 40, 0.0, 0.0, 64.0, 32.0)
    val inside = samples.filter(_.inside)
    assert(inside.nonEmpty && inside.length < samples.length)
    // inside iff gx < 32 → output col < 20
    assert(inside.forall(_.col < 20))
    assert(samples.filterNot(_.inside).forall(_.col >= 20))
  }

  test("rotation/shear affine round-trips: every inside sample inverse-maps into the footprint") {
    val aff = Affine(100.0, 2.0, 1.0, -50.0, -1.0, 3.0)
    val xs = Seq(aff(0, 0), aff(0, 32), aff(32, 32), aff(32, 0))
    val samples = Warp.geoprojectSamples(
      aff, 32, 32, 40, 40,
      xs.map(_._1).min, xs.map(_._2).min, xs.map(_._1).max, xs.map(_._2).max)
    val inside = samples.filter(_.inside)
    assert(inside.length > 40 * 40 / 4, "a sheared footprint still covers a good part of its bbox")
    inside.foreach { s =>
      assert(s.srcRow >= 0 && s.srcRow < 32 && s.srcCol >= 0 && s.srcCol < 32)
      // forward-map the sampled source pixel center: stays within a
      // pixel diagonal of the output pixel center (nearest sampling)
      val (gx, gy) = aff(s.srcCol + 0.5, s.srcRow + 0.5)
      val ox = xs.map(_._1).min + (s.col + 0.5) * (xs.map(_._1).max - xs.map(_._1).min) / 40
      val oy = xs.map(_._2).max - (s.row + 0.5) * (xs.map(_._2).max - xs.map(_._2).min) / 40
      val pixDiag = math.sqrt(2 * 2 + 1 * 1) + math.sqrt(1 * 1 + 3 * 3) // |col step| + |row step| bound
      assert(math.hypot(gx - ox, gy - oy) <= pixDiag, s"sample too far: ${math.hypot(gx - ox, gy - oy)}")
    }
  }
}
