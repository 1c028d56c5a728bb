package graft.geo

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Tie-point EXTRACTION for raster co-registration — the signal half
  * of the reference's align pipeline that fed the already-built
  * estimator ([[Align.umeyama]] / [[Align.ransacAlign]]):
  * `align.cpp:201-341` (self-contained radix-2 complex FFT + 2D phase
  * correlation with normalized cross-power spectrum, mean removal,
  * circular wrap-around and peak-to-sidelobe strength) and
  * `align.cpp:343-413` (per-patch NCC over integral images, seeded by
  * the global phase-correlation shift, 3×3 parabolic sub-pixel fit).
  *
  * Everything here is deterministic double math (the FFT twiddles are
  * the only transcendentals; conformance is spec-gated against known
  * DFTs and known shifts, not bit-compared to an external engine).
  *
  * Scale shape: one (src, ref) grid pair is one task-local kernel —
  * the estate of overlapping capture pairs fans out one pair per task
  * (like every other per-artifact codec here), and the resulting
  * tie-point table feeds the distributed RANSAC/Umeyama estimator.
  */
object TiePoints {

  final case class Grid(width: Int, height: Int, data: Array[Double]) {
    require(data.length == width * height, s"grid ${width}x$height needs ${width * height} cells")
    def apply(r: Int, c: Int): Double = data(r * width + c)
  }

  final case class TiePoint(srcRow: Int, srcCol: Int, dr: Double, dc: Double, score: Double)

  // ---- radix-2 complex FFT (align.cpp:204-243) ------------------------

  /** In-place iterative Cooley-Tukey over interleaved (re, im) pairs.
    * n must be a power of two. */
  def fft1d(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"fft1d: $n not a power of 2")
    // bit-reversal permutation
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = (if (inverse) 2.0 else -2.0) * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr0 = re(base + k + len / 2); val vi0 = im(base + k + len / 2)
          val vr = vr0 * cr - vi0 * ci
          val vi = vr0 * ci + vi0 * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
    if (inverse) {
      var t = 0
      while (t < n) { re(t) /= n; im(t) /= n; t += 1 }
    }
  }

  /** In-place 2D FFT of an n×n row-major complex matrix. */
  def fft2d(re: Array[Double], im: Array[Double], n: Int, inverse: Boolean): Unit = {
    val lr = new Array[Double](n); val li = new Array[Double](n)
    var r = 0
    while (r < n) {
      System.arraycopy(re, r * n, lr, 0, n); System.arraycopy(im, r * n, li, 0, n)
      fft1d(lr, li, inverse)
      System.arraycopy(lr, 0, re, r * n, n); System.arraycopy(li, 0, im, r * n, n)
      r += 1
    }
    var c = 0
    while (c < n) {
      var k = 0
      while (k < n) { lr(k) = re(k * n + c); li(k) = im(k * n + c); k += 1 }
      fft1d(lr, li, inverse)
      k = 0
      while (k < n) { re(k * n + c) = lr(k); im(k * n + c) = li(k); k += 1 }
      c += 1
    }
  }

  // ---- phase correlation (align.cpp:247-341) --------------------------

  /** Returns (dc, dr, peakStrength): the displacement to ADD to a
    * source position to reach the matching reference position, from
    * the argmax of the inverse-transformed normalized cross-power
    * spectrum; peaks past nfft/2 wrap to negative displacements. */
  def phaseCorrelate(src: Grid, ref: Grid): (Double, Double, Double) = {
    var nfft = 1
    while (nfft < math.max(math.max(src.width, src.height), math.max(ref.width, ref.height))) nfft <<= 1
    val n2 = nfft * nfft
    val mS = if (src.data.isEmpty) 0.0 else src.data.sum / src.data.length
    val mR = if (ref.data.isEmpty) 0.0 else ref.data.sum / ref.data.length
    val sr = new Array[Double](n2); val si = new Array[Double](n2)
    val rr = new Array[Double](n2); val ri = new Array[Double](n2)
    var r = 0
    while (r < src.height) {
      var c = 0
      while (c < src.width) { sr(r * nfft + c) = src(r, c) - mS; c += 1 }
      r += 1
    }
    r = 0
    while (r < ref.height) {
      var c = 0
      while (c < ref.width) { rr(r * nfft + c) = ref(r, c) - mR; c += 1 }
      r += 1
    }
    fft2d(sr, si, nfft, inverse = false)
    fft2d(rr, ri, nfft, inverse = false)
    // conj(FS) * FR, normalized to unit magnitude
    var i = 0
    while (i < n2) {
      val vr = sr(i) * rr(i) + si(i) * ri(i)
      val vi = sr(i) * ri(i) - si(i) * rr(i)
      val mag = math.sqrt(vr * vr + vi * vi)
      if (mag < 1e-12) { sr(i) = 0.0; si(i) = 0.0 }
      else { sr(i) = vr / mag; si(i) = vi / mag }
      i += 1
    }
    fft2d(sr, si, nfft, inverse = true)
    var peakIdx = 0
    var peakVal = sr(0)
    i = 1
    while (i < n2) { if (sr(i) > peakVal) { peakVal = sr(i); peakIdx = i }; i += 1 }
    val pr = peakIdx / nfft
    val pc = peakIdx % nfft
    // peak-to-mean-sidelobe strength, excluding a 2-cell neighborhood
    var sum = 0.0; var cnt = 0
    r = 0
    while (r < nfft) {
      var c = 0
      while (c < nfft) {
        val ddr = math.min(math.abs(r - pr), nfft - math.abs(r - pr))
        val ddc = math.min(math.abs(c - pc), nfft - math.abs(c - pc))
        if (ddr > 2 || ddc > 2) { sum += math.abs(sr(r * nfft + c)); cnt += 1 }
        c += 1
      }
      r += 1
    }
    val meanSidelobe = if (cnt > 0) sum / cnt else 0.0
    val strength = if (meanSidelobe > 1e-12) peakVal / meanSidelobe else 0.0
    val dr = if (pr < nfft / 2) pr.toDouble else (pr - nfft).toDouble
    val dc = if (pc < nfft / 2) pc.toDouble else (pc - nfft).toDouble
    (dc, dr, strength)
  }

  // ---- per-patch NCC over integral images (align.cpp:343-413) ---------

  /** Summed-area tables for O(1) window mean/variance. */
  final class IntegralImages(g: Grid) {
    private val w = g.width + 1
    private val s = new Array[Double]((g.width + 1) * (g.height + 1))
    private val s2 = new Array[Double]((g.width + 1) * (g.height + 1))
    locally {
      var r = 0
      while (r < g.height) {
        var rowS = 0.0; var rowS2 = 0.0
        var c = 0
        while (c < g.width) {
          val v = g(r, c)
          rowS += v; rowS2 += v * v
          s((r + 1) * w + c + 1) = s(r * w + c + 1) + rowS
          s2((r + 1) * w + c + 1) = s2(r * w + c + 1) + rowS2
          c += 1
        }
        r += 1
      }
    }
    def boxSum(r0: Int, c0: Int, r1: Int, c1: Int): Double =
      s((r1 + 1) * w + c1 + 1) - s(r0 * w + c1 + 1) - s((r1 + 1) * w + c0) + s(r0 * w + c0)
    def boxSum2(r0: Int, c0: Int, r1: Int, c1: Int): Double =
      s2((r1 + 1) * w + c1 + 1) - s2(r0 * w + c1 + 1) - s2((r1 + 1) * w + c0) + s2(r0 * w + c0)
  }

  /** NCC search for the source patch at (srcRow, srcCol) inside the
    * reference window centered at the seed displacement, ± radius;
    * 3×3 parabolic sub-pixel refinement on the peak. score = -1 when
    * the patch (or every candidate window) is textureless. */
  def matchPatch(
      src: Grid,
      refII: IntegralImages,
      ref: Grid,
      srcRow: Int,
      srcCol: Int,
      patchSize: Int,
      searchRadius: Int,
      seedDr: Double,
      seedDc: Double
  ): TiePoint = {
    val n = patchSize * patchSize
    var pSum = 0.0; var pSum2 = 0.0
    val patch = new Array[Double](n)
    var r = 0
    while (r < patchSize) {
      var c = 0
      while (c < patchSize) {
        val v = src(srcRow + r, srcCol + c)
        patch(r * patchSize + c) = v
        pSum += v; pSum2 += v * v
        c += 1
      }
      r += 1
    }
    val pMean = pSum / n
    val pStd = math.sqrt(math.max(0.0, pSum2 / n - pMean * pMean))
    if (pStd < 1e-6) return TiePoint(srcRow, srcCol, 0.0, 0.0, -1.0)
    // reference smaller than the patch: the clamp below would pin a
    // negative hi bound to 0 and boxSum would read out of bounds —
    // refuse (score -1) instead
    if (ref.height < patchSize || ref.width < patchSize)
      return TiePoint(srcRow, srcCol, 0.0, 0.0, -1.0)

    def clamp(v: Int, lo: Int, hi: Int): Int = math.max(lo, math.min(hi, v))
    var rr0 = clamp(math.round(srcRow + seedDr).toInt - searchRadius, 0, ref.height - patchSize)
    var rc0 = clamp(math.round(srcCol + seedDc).toInt - searchRadius, 0, ref.width - patchSize)
    val rr1 = clamp(rr0 + 2 * searchRadius, 0, ref.height - patchSize)
    val rc1 = clamp(rc0 + 2 * searchRadius, 0, ref.width - patchSize)
    val mapRows = rr1 - rr0 + 1
    val mapCols = rc1 - rc0 + 1
    if (mapRows <= 0 || mapCols <= 0) return TiePoint(srcRow, srcCol, 0.0, 0.0, -1.0)

    val nccMap = Array.fill(mapRows * mapCols)(-2.0)
    var best = -1.0
    var bestDr = 0.0; var bestDc = 0.0
    var rr = rr0
    while (rr <= rr1) {
      var rc = rc0
      while (rc <= rc1) {
        val refS = refII.boxSum(rr, rc, rr + patchSize - 1, rc + patchSize - 1)
        val refS2 = refII.boxSum2(rr, rc, rr + patchSize - 1, rc + patchSize - 1)
        val refMean = refS / n
        val refStd = math.sqrt(math.max(0.0, refS2 / n - refMean * refMean))
        if (refStd >= 1e-6) {
          var cross = 0.0
          var pr = 0
          while (pr < patchSize) {
            var pc = 0
            while (pc < patchSize) {
              cross += (patch(pr * patchSize + pc) - pMean) * (ref(rr + pr, rc + pc) - refMean)
              pc += 1
            }
            pr += 1
          }
          val ncc = cross / (n * pStd * refStd)
          nccMap((rr - rr0) * mapCols + (rc - rc0)) = ncc
          if (ncc > best) { best = ncc; bestDr = (rr - srcRow).toDouble; bestDc = (rc - srcCol).toDouble }
        }
        rc += 1
      }
      rr += 1
    }
    if (best <= -1.0) return TiePoint(srcRow, srcCol, 0.0, 0.0, -1.0)

    // 3×3 parabolic sub-pixel fit around the integer peak
    val pr = (bestDr + srcRow).toInt - rr0
    val pc = (bestDc + srcCol).toInt - rc0
    var dr = bestDr; var dc = bestDc
    if (pr > 0 && pr < mapRows - 1 && pc > 0 && pc < mapCols - 1) {
      val ym1 = nccMap((pr - 1) * mapCols + pc); val yp1 = nccMap((pr + 1) * mapCols + pc)
      val xm1 = nccMap(pr * mapCols + pc - 1); val xp1 = nccMap(pr * mapCols + pc + 1)
      val c0 = nccMap(pr * mapCols + pc)
      val denR = 2 * c0 - ym1 - yp1
      val denC = 2 * c0 - xm1 - xp1
      if (denR > 1e-9) dr += 0.5 * (ym1 - yp1) / denR
      if (denC > 1e-9) dc += 0.5 * (xm1 - xp1) / denC
    }
    TiePoint(srcRow, srcCol, dr, dc, best)
  }

  /** Full extraction: phase-correlation seed, then a stride grid of
    * NCC patches refined around it. Textureless/failed patches are
    * dropped (score -1). */
  def extractTiePoints(
      src: Grid,
      ref: Grid,
      patchSize: Int = 5,
      stride: Int = 5,
      searchRadius: Int = 3,
      margin: Int = 2
  ): Seq[TiePoint] = {
    val (seedDc, seedDr, _) = phaseCorrelate(src, ref)
    val refII = new IntegralImages(ref)
    val out = Seq.newBuilder[TiePoint]
    var r = margin
    while (r + patchSize <= src.height - margin) {
      var c = margin
      while (c + patchSize <= src.width - margin) {
        val tp = matchPatch(src, refII, ref, r, c, patchSize, searchRadius, seedDr, seedDc)
        if (tp.score > -1.0) out += tp
        c += stride
      }
      r += stride
    }
    out.result()
  }

  // ---- oracle row ----------------------------------------------------

  /** q_tiepoints: per event_type, a deterministic 32×32 textured grid
    * is built from the group's OWN event rows (event_id density
    * buckets), the reference grid is its exact circular shift by a
    * known md5-derived (dr, dc), and the FULL extraction stack — FFT
    * phase correlation seed → per-patch NCC → sub-pixel → Umeyama
    * closed form — must recover that shift. The oracle computes the
    * expected shift and tie-point count directly; rows agree iff the
    * whole signal chain localizes exactly. Each group is one
    * task-local kernel (the per-artifact scale shape).
    *
    * Emission safety: on an exact circular copy the NCC peak is 1 and
    * every parabolic correction is strictly inside (-0.5, 0.5), so
    * per-patch rounding (and the mean) is exact — no float boundary
    * reaches the output. */
  def tiepointsQuery(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val W = 32
    val cycle = udf { (eventType: String, ids: Seq[Long]) =>
      // density raster from the group's own rows + a hash texture floor
      val data = new Array[Double](W * W)
      ids.foreach { id =>
        val cell = ((id * 2654435761L) % (W * W)).toInt
        data(math.abs(cell)) += (id % 97).toDouble + 1.0
      }
      var i = 0
      while (i < W * W) {
        // md5-free texture floor (deterministic, avoids flat patches)
        data(i) += ((i * 1103515245L + 12345L) % 251).toDouble / 7.0
        i += 1
      }
      val src = Grid(W, W, data)
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"tp:$eventType".getBytes("UTF-8"))
      val drTrue = ((h(0) & 0xff) % 7) - 3
      val dcTrue = ((h(1) & 0xff) % 5) - 2
      val ref = Grid(W, W, Array.tabulate(W * W) { k =>
        val r = k / W; val c = k % W
        src(((r - drTrue) % W + W) % W, ((c - dcTrue) % W + W) % W)
      })
      val (seedDc, seedDr, strength) = phaseCorrelate(src, ref)
      // margin 4 keeps every true patch position (|dr|≤3, |dc|≤2)
      // inside the un-wrapped part of the reference, so all 16 patches
      // match exactly (n_good is a constant the oracle can state)
      val tps = extractTiePoints(src, ref, margin = 4)
      require(tps.nonEmpty, "tie-point extraction found nothing on a textured grid")
      val meanDr = tps.map(_.dr).sum / tps.length
      val meanDc = tps.map(_.dc).sum / tps.length
      Seq(
        math.round(seedDr), math.round(seedDc),
        math.round(meanDr), math.round(meanDc),
        tps.count(_.score > 0.5).toLong,
        if (strength > 3.0) 1L else 0L
      )
    }
    graft.Tables
      .eventsRaw(s, dir)
      .groupBy($"event_type")
      .agg(collect_list($"event_id").as("ids"))
      .select($"event_type", cycle($"event_type", $"ids").as("a"))
      .select(
        $"event_type",
        $"a".getItem(0).as("seed_dr"),
        $"a".getItem(1).as("seed_dc"),
        $"a".getItem(2).as("ncc_dr"),
        $"a".getItem(3).as("ncc_dc"),
        $"a".getItem(4).as("n_good"),
        $"a".getItem(5).as("sharp_peak")
      )
      .orderBy($"event_type")
  }
}
