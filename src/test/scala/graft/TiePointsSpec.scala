package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.TiePoints
import graft.geo.TiePoints.Grid

/** FFT phase correlation + per-patch NCC tie-point extraction
  * (align.cpp:201-413): transform identities, known-shift recovery
  * incl. negative wrap-around, sub-pixel bounds, peak strength as a
  * texture/confidence signal, and the closed loop into the Umeyama
  * estimator that AlignSpec already gates. */
class TiePointsSpec extends AnyFunSuite {

  private def rng(seed: Long): () => Double = {
    var s = seed
    () => { s = s * 6364136223846793005L + 1442695040888963407L; ((s >>> 33).toDouble / (1L << 31).toDouble) }
  }

  private def texturedGrid(w: Int, h: Int, seed: Long): Grid = {
    val next = rng(seed)
    Grid(w, h, Array.fill(w * h)(next() * 100.0))
  }

  private def circShift(g: Grid, dr: Int, dc: Int): Grid =
    Grid(g.width, g.height, Array.tabulate(g.width * g.height) { k =>
      val r = k / g.width; val c = k % g.width
      g(((r - dr) % g.height + g.height) % g.height, ((c - dc) % g.width + g.width) % g.width)
    })

  test("fft1d matches known DFTs and inverts exactly") {
    // impulse → flat spectrum
    val re = Array(1.0, 0.0, 0.0, 0.0); val im = Array.fill(4)(0.0)
    TiePoints.fft1d(re, im, inverse = false)
    assert(re.forall(v => math.abs(v - 1.0) < 1e-12) && im.forall(v => math.abs(v) < 1e-12))
    // constant → DC only
    val re2 = Array(2.0, 2.0, 2.0, 2.0); val im2 = Array.fill(4)(0.0)
    TiePoints.fft1d(re2, im2, inverse = false)
    assert(math.abs(re2(0) - 8.0) < 1e-12 && re2.drop(1).forall(v => math.abs(v) < 1e-12))
    // single complex exponential → one bin
    val n = 16
    val re3 = Array.tabulate(n)(i => math.cos(2 * math.Pi * 3 * i / n))
    val im3 = Array.tabulate(n)(i => math.sin(2 * math.Pi * 3 * i / n))
    TiePoints.fft1d(re3, im3, inverse = false)
    (0 until n).foreach { k =>
      val expect = if (k == 3) n.toDouble else 0.0
      assert(math.abs(re3(k) - expect) < 1e-9 && math.abs(im3(k)) < 1e-9, s"bin $k")
    }
    // round trip
    val next = rng(7)
    val rr = Array.fill(64)(next()); val ri = Array.fill(64)(next())
    val cr = rr.clone(); val ci = ri.clone()
    TiePoints.fft1d(cr, ci, inverse = false)
    TiePoints.fft1d(cr, ci, inverse = true)
    (0 until 64).foreach { i =>
      assert(math.abs(cr(i) - rr(i)) < 1e-10 && math.abs(ci(i) - ri(i)) < 1e-10)
    }
  }

  test("2D FFT inverts exactly") {
    val next = rng(11)
    val n = 16
    val re = Array.fill(n * n)(next()); val im = Array.fill(n * n)(next())
    val cr = re.clone(); val ci = im.clone()
    TiePoints.fft2d(cr, ci, n, inverse = false)
    TiePoints.fft2d(cr, ci, n, inverse = true)
    (0 until n * n).foreach { i =>
      assert(math.abs(cr(i) - re(i)) < 1e-9 && math.abs(ci(i) - im(i)) < 1e-9)
    }
  }

  test("phase correlation recovers integer circular shifts, including negative wrap-around") {
    val src = texturedGrid(32, 32, 123)
    for ((dr, dc) <- Seq((0, 0), (3, 5), (-4, 2), (7, -6), (-3, -3), (15, 15))) {
      val ref = circShift(src, dr, dc)
      val (gotDc, gotDr, strength) = TiePoints.phaseCorrelate(src, ref)
      assert(gotDr == dr.toDouble && gotDc == dc.toDouble, s"shift ($dr,$dc) → got ($gotDr,$gotDc)")
      assert(strength > 10.0, s"exact copy should give a sharp peak, got $strength")
    }
  }

  test("phase correlation survives additive noise; flat input reports weak strength") {
    val src = texturedGrid(32, 32, 99)
    val noise = rng(5)
    val ref0 = circShift(src, 5, -3)
    val ref = Grid(32, 32, ref0.data.map(_ + noise() * 10.0)) // 10% noise
    val (dc, dr, strength) = TiePoints.phaseCorrelate(src, ref)
    assert(dr == 5.0 && dc == -3.0)
    assert(strength > 3.0)
    val flat = Grid(16, 16, Array.fill(256)(42.0))
    val (_, _, weak) = TiePoints.phaseCorrelate(flat, flat)
    assert(weak < 3.0, s"textureless input must not report a confident peak, got $weak")
  }

  test("NCC patch match finds the exact offset and parabolic corrections stay sub-half-pixel") {
    val src = texturedGrid(32, 32, 77)
    val ref = circShift(src, 2, -1)
    val ii = new TiePoints.IntegralImages(ref)
    for (r <- Seq(5, 10, 20); c <- Seq(5, 12, 24)) {
      val tp = TiePoints.matchPatch(src, ii, ref, r, c, 5, 3, 2.0, -1.0)
      assert(math.abs(tp.score - 1.0) < 1e-9, s"exact copy should score 1, got ${tp.score}")
      assert(math.round(tp.dr) == 2L && math.round(tp.dc) == -1L)
      assert(math.abs(tp.dr - 2.0) < 0.5 && math.abs(tp.dc + 1.0) < 0.5)
    }
    // textureless patch is dropped
    val flatSrc = Grid(32, 32, Array.fill(32 * 32)(1.0))
    val tp = TiePoints.matchPatch(flatSrc, ii, ref, 5, 5, 5, 3, 0.0, 0.0)
    assert(tp.score == -1.0)
  }

  test("full extraction closes the loop: tie points feed Umeyama and recover the translation") {
    val src = texturedGrid(32, 32, 2024)
    val ref = circShift(src, -2, 2)
    val tps = TiePoints.extractTiePoints(src, ref, margin = 4)
    assert(tps.length == 16, s"expected the full 4x4 patch grid, got ${tps.length}")
    assert(tps.forall(_.score > 0.999))
    assert(tps.forall(tp => math.round(tp.dr) == -2L && math.round(tp.dc) == 2L))
    val meanDr = tps.map(_.dr).sum / tps.length
    val meanDc = tps.map(_.dc).sum / tps.length
    assert(math.round(meanDr) == -2L && math.round(meanDc) == 2L)
  }
}
