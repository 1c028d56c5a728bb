package graft.raster

import scala.collection.mutable.ArrayBuffer

/** JPEG 2000 Part-1 coding kernels (ISO/IEC 15444-1 / ITU-T T.800,
  * published spec): the MQ arithmetic coder (Annex C, the 47-state
  * table), tag trees (B.10.2), the stuffed packet-header bit IO
  * (B.10.1), the reversible 5/3 wavelet (Annex F lifting, forward
  * vertical→horizontal, inverse mirrored), and the EBCOT Tier-1
  * block coder (Annex D: significance-propagation, refinement and
  * cleanup passes over 4-row stripes, all 19 contexts).
  *
  * The Tier-1 scan is written ONCE and driven through a tiny
  * code-a-decision interface, so the encoder and decoder cannot
  * drift apart structurally — the same property LazCodec uses.
  * Conformance boundary: round-trip-proven (no external JP2 fixtures
  * exist in this sandbox); all tables and layouts follow the
  * published text.
  */
object Jp2Codec {

  // ------------------------------------------------------------ MQ coder

  // Table C-2: Qe, NMPS, NLPS, SWITCH
  private val Qe = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401, 0x4801, 0x3801,
    0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401, 0x5101, 0x4801, 0x3801, 0x3401,
    0x3001, 0x2801, 0x2401, 0x2201, 0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101,
    0x0AC1, 0x09C1, 0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val Nmps = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40,
    41, 42, 43, 44, 45, 45, 46)
  private val Nlps = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14, 15, 16, 17, 18,
    19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37,
    38, 39, 40, 41, 42, 43, 46)
  private val Switch = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0)

  /** Number of T1 contexts: 9 ZC + RL(17) + 5 SC(9..13) + 3 MR(14..16) + UNI(18). */
  val NumCtx = 19
  val CtxRl = 17
  val CtxUni = 18

  private def initStates(): (Array[Int], Array[Int]) = {
    val i = new Array[Int](NumCtx)
    val mps = new Array[Int](NumCtx)
    i(CtxUni) = 46
    i(CtxRl) = 3
    i(0) = 4
    (i, mps)
  }

  /** One decision in either direction: encode writes `d`, decode
    * ignores it and returns the decoded decision. */
  trait MqIo {
    def code(d: Int, cx: Int): Int
  }

  final class MqEncoder extends MqIo {
    private val (ist, mps) = initStates()
    private val buf = ArrayBuffer[Int](0) // index 0 is the spec's start-1 scratch cell
    private var c = 0L
    private var a = 0x8000
    private var ct = 12

    private def byteout(): Unit = {
      if (buf.last == 0xff) {
        buf += ((c >> 20) & 0xff).toInt; c &= 0xfffff; ct = 7
      } else if (c < 0x8000000L) {
        buf += ((c >> 19) & 0xff).toInt; c &= 0x7ffff; ct = 8
      } else {
        buf(buf.length - 1) += 1
        if (buf.last == 0xff) {
          c &= 0x7ffffff
          buf += ((c >> 20) & 0xff).toInt; c &= 0xfffff; ct = 7
        } else {
          buf += ((c >> 19) & 0xff).toInt; c &= 0x7ffff; ct = 8
        }
      }
    }

    private def renorm(): Unit = {
      while ({
        if (ct == 0) byteout()
        a <<= 1; c <<= 1; ct -= 1
        (a & 0x8000) == 0
      }) ()
    }

    def code(d: Int, cx: Int): Int = {
      val s = ist(cx)
      val qe = Qe(s)
      if (d == mps(cx)) {
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) a = qe else c += qe
          ist(cx) = Nmps(s)
          renorm()
        } else c += qe
      } else {
        a -= qe
        if (a < qe) c += qe else a = qe
        if (Switch(s) == 1) mps(cx) ^= 1
        ist(cx) = Nlps(s)
        renorm()
      }
      d
    }

    /** FLUSH (C.2.9); returns the codeword segment. */
    def finish(): Array[Byte] = {
      val tempc = c + a
      c |= 0xffff
      if (c >= tempc) c -= 0x8000
      c <<= ct; byteout()
      c <<= ct; byteout()
      var end = buf.length
      if (buf(end - 1) == 0xff) end -= 1 // trailing 0xFF is dropped
      Array.tabulate(end - 1)(i => buf(i + 1).toByte)
    }
  }

  final class MqDecoder(data: Array[Byte]) extends MqIo {
    private val (ist, mps) = initStates()
    private var bp = 0
    private var c = 0L
    private var a = 0
    private var ct = 0

    private def at(i: Int): Int = if (i < data.length) data(i) & 0xff else 0xff

    private def bytein(): Unit = {
      if (at(bp) == 0xff) {
        if (at(bp + 1) > 0x8f) { c += 0xff00; ct = 8 }
        else { bp += 1; c += at(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += at(bp).toLong << 8; ct = 8 }
    }

    // INITDEC
    c = at(0).toLong << 16
    bytein()
    c <<= 7; ct -= 7; a = 0x8000

    private def renorm(): Unit = {
      while ({
        if (ct == 0) bytein()
        a <<= 1; c <<= 1; ct -= 1
        (a & 0x8000) == 0
      }) ()
    }

    def code(d0: Int, cx: Int): Int = {
      val s = ist(cx)
      val qe = Qe(s)
      var d = 0
      a -= qe
      if (((c >> 16) & 0xffff) < qe) {
        if (a < qe) { d = mps(cx); ist(cx) = Nmps(s) }
        else { d = 1 - mps(cx); if (Switch(s) == 1) mps(cx) ^= 1; ist(cx) = Nlps(s) }
        a = qe
        renorm()
      } else {
        c -= qe.toLong << 16
        if ((a & 0x8000) == 0) {
          if (a < qe) { d = 1 - mps(cx); if (Switch(s) == 1) mps(cx) ^= 1; ist(cx) = Nlps(s) }
          else { d = mps(cx); ist(cx) = Nmps(s) }
          renorm()
        } else d = mps(cx)
      }
      d
    }
  }

  // ------------------------------------------------------------ packet-header bit IO (B.10.1: bit stuffing after 0xFF)

  final class HeaderWriter {
    val out = ArrayBuffer.empty[Byte]
    private var acc = 0
    private var n = 0
    private def cap: Int = if (out.nonEmpty && (out.last & 0xff) == 0xff) 7 else 8
    def bit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1)
      n += 1
      if (n == cap) { out += acc.toByte; acc = 0; n = 0 }
    }
    def bits(v: Long, k: Int): Unit = { var i = k - 1; while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 } }
    /** Align to a byte boundary; if the last full byte was 0xFF a
      * stuffed 7-bit byte must still be emitted (B.10.1). */
    def flush(): Array[Byte] = {
      if (n > 0) { acc <<= (cap - n); out += acc.toByte; acc = 0; n = 0 }
      else if (out.nonEmpty && (out.last & 0xff) == 0xff) out += 0.toByte
      out.toArray
    }
  }

  final class HeaderReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    private var last = 0
    def bit(): Int = {
      if (n == 0) {
        val cap = if (last == 0xff) 7 else 8
        acc = if (pos < data.length) data(pos) & 0xff else 0
        last = acc
        pos += 1
        n = cap
        if (cap == 7) acc &= 0x7f
      }
      n -= 1
      (acc >> n) & 1
    }
    def bits(k: Int): Long = { var v = 0L; var i = 0; while (i < k) { v = (v << 1) | bit(); i += 1 }; v }
    /** Skip to the next byte boundary (consuming the stuffed byte if due). */
    def align(): Int = {
      if (n == 0 && last == 0xff) { pos += 1 } // stuffed byte after a trailing 0xFF
      n = 0; last = 0
      pos
    }
  }

  // ------------------------------------------------------------ tag trees (B.10.2)

  final class TagTree(w: Int, h: Int) {
    private case class Lv(w: Int, h: Int, off: Int)
    private val levels: Array[Lv] = {
      val ls = ArrayBuffer.empty[Lv]
      var (lw, lh, off) = (w, h, 0)
      ls += Lv(lw, lh, 0)
      while (lw > 1 || lh > 1) {
        off += lw * lh
        lw = (lw + 1) / 2; lh = (lh + 1) / 2
        ls += Lv(lw, lh, off)
      }
      ls.toArray
    }
    private val n = levels.last.off + 1
    val value = Array.fill(n)(Int.MaxValue) // decoder: unknown; encoder: set leaves then build
    private val low = new Array[Int](n)
    private val known = new Array[Boolean](n)

    private def idx(lv: Int, x: Int, y: Int): Int = levels(lv).off + y * levels(lv).w + x

    /** Encoder side: set all leaf values, then min-reduce parents. */
    def build(leaves: (Int, Int) => Int): Unit = {
      var y = 0
      while (y < h) { var x = 0; while (x < w) { value(idx(0, x, y)) = leaves(x, y); x += 1 }; y += 1 }
      var lv = 1
      while (lv < levels.length) {
        val p = levels(lv); val c = levels(lv - 1)
        var py = 0
        while (py < p.h) {
          var px = 0
          while (px < p.w) {
            var m = Int.MaxValue
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val cx = 2 * px + dx; val cy = 2 * py + dy
                if (cx < c.w && cy < c.h) m = math.min(m, value(idx(lv - 1, cx, cy)))
                dx += 1
              }
              dy += 1
            }
            value(idx(lv, px, py)) = m
            px += 1
          }
          py += 1
        }
        lv += 1
      }
    }

    private def path(x: Int, y: Int): Array[Int] = {
      val p = new Array[Int](levels.length)
      var lv = 0; var cx = x; var cy = y
      while (lv < levels.length) { p(levels.length - 1 - lv) = idx(lv, cx, cy); cx /= 2; cy /= 2; lv += 1 }
      p // root..leaf
    }

    def encode(x: Int, y: Int, threshold: Int, bw: HeaderWriter): Unit = {
      var lo = 0
      path(x, y).foreach { nd =>
        if (lo > low(nd)) low(nd) = lo else lo = low(nd)
        var brk = false
        while (!brk && threshold > low(nd)) {
          if (low(nd) >= value(nd)) {
            if (!known(nd)) { bw.bit(1); known(nd) = true }
            brk = true
          } else { bw.bit(0); low(nd) += 1 }
        }
        lo = low(nd)
      }
    }

    /** Returns 1 iff leaf value < threshold (pinning values as bits arrive). */
    def decode(x: Int, y: Int, threshold: Int, br: HeaderReader): Int = {
      var lo = 0
      var leaf = 0
      path(x, y).foreach { nd =>
        if (lo > low(nd)) low(nd) = lo else lo = low(nd)
        while (threshold > low(nd) && low(nd) < value(nd)) {
          if (br.bit() == 0) low(nd) += 1 else value(nd) = low(nd)
        }
        lo = low(nd)
        leaf = nd
      }
      if (value(leaf) < threshold) 1 else 0
    }

    /** Decoder: drive thresholds upward until the leaf value pins.
      * Bounded — a corrupt all-zeros bitstream must not spin. */
    def decodeValue(x: Int, y: Int, br: HeaderReader): Int = {
      var t = 1
      while (decode(x, y, t, br) == 0) {
        t += 1
        require(t <= 256, "jp2: tag-tree value out of range (corrupt packet header)")
      }
      value(path(x, y).last)
    }
  }

  // ------------------------------------------------------------ 5/3 reversible DWT (Annex F lifting)

  /** Symmetric (whole-point) reflection of full-grid index p into
    * [0, n): period 2(n−1), parity-preserving — Annex F's E(1,1)
    * extension expressed on the interleaved signal. */
  @inline private def refl(p: Int, n: Int): Int = {
    if (n == 1) return 0
    val per = 2 * (n - 1)
    var q = p % per
    if (q < 0) q += per
    if (q >= n) per - q else q
  }

  /** Forward 1D: in-place split of `buf(0 until n)` (stride 1) into
    * low `sn = ceil(n/2)` then high `floor(n/2)` halves. */
  private def fwd1d(buf: Array[Int], n: Int): Unit = {
    if (n <= 1) return
    val sn = (n + 1) / 2
    val dn = n / 2
    val d = new Array[Int](dn)
    val s = new Array[Int](sn)
    // predict on the interleaved signal: d(i) = x(2i+1) − ⌊(x(2i)+x(2i+2))/2⌋
    var i = 0
    while (i < dn) {
      d(i) = buf(2 * i + 1) - ((buf(2 * i) + buf(refl(2 * i + 2, n))) >> 1)
      i += 1
    }
    // update: s(i) = x(2i) + ⌊(D(i−1)+D(i)+2)/4⌋, D reflected on the full grid
    @inline def dval(k: Int): Int = d((refl(2 * k + 1, n) - 1) / 2)
    i = 0
    while (i < sn) {
      s(i) = buf(2 * i) + ((dval(i - 1) + dval(i) + 2) >> 2)
      i += 1
    }
    System.arraycopy(s, 0, buf, 0, sn)
    System.arraycopy(d, 0, buf, sn, dn)
  }

  /** Inverse of fwd1d. */
  private def inv1d(buf: Array[Int], n: Int): Unit = {
    if (n <= 1) return
    val sn = (n + 1) / 2
    val dn = n / 2
    val s = java.util.Arrays.copyOfRange(buf, 0, sn)
    val d = java.util.Arrays.copyOfRange(buf, sn, n)
    @inline def dval(k: Int): Int = d((refl(2 * k + 1, n) - 1) / 2)
    val x = new Array[Int](n)
    var i = 0
    while (i < sn) { x(2 * i) = s(i) - ((dval(i - 1) + dval(i) + 2) >> 2); i += 1 }
    i = 0
    while (i < dn) {
      x(2 * i + 1) = d(i) + ((x(2 * i) + x(refl(2 * i + 2, n))) >> 1)
      i += 1
    }
    System.arraycopy(x, 0, buf, 0, n)
  }

  /** Forward 2D multilevel into the Mallat layout (LL_N at top-left).
    * Per level: vertical pass over columns, then horizontal over rows. */
  def fdwt53(a: Array[Int], w: Int, h: Int, levels: Int): Unit = {
    var lw = w; var lh = h
    var lev = 0
    val col = new Array[Int](h)
    val row = new Array[Int](w)
    while (lev < levels) {
      var x = 0
      while (x < lw) {
        var y = 0
        while (y < lh) { col(y) = a(y * w + x); y += 1 }
        fwd1d(col, lh)
        y = 0
        while (y < lh) { a(y * w + x) = col(y); y += 1 }
        x += 1
      }
      var y = 0
      while (y < lh) {
        var i = 0
        while (i < lw) { row(i) = a(y * w + i); i += 1 }
        fwd1d(row, lw)
        i = 0
        while (i < lw) { a(y * w + i) = row(i); i += 1 }
        y += 1
      }
      lw = (lw + 1) / 2; lh = (lh + 1) / 2
      lev += 1
    }
  }

  /** Inverse 2D multilevel (mirrors fdwt53 exactly). */
  def idwt53(a: Array[Int], w: Int, h: Int, levels: Int): Unit = {
    val col = new Array[Int](h)
    val row = new Array[Int](w)
    var lev = levels - 1
    while (lev >= 0) {
      var lw = w; var lh = h
      var k = 0
      while (k < lev) { lw = (lw + 1) / 2; lh = (lh + 1) / 2; k += 1 }
      var y = 0
      while (y < lh) {
        var i = 0
        while (i < lw) { row(i) = a(y * w + i); i += 1 }
        inv1d(row, lw)
        i = 0
        while (i < lw) { a(y * w + i) = row(i); i += 1 }
        y += 1
      }
      var x = 0
      while (x < lw) {
        y = 0
        while (y < lh) { col(y) = a(y * w + x); y += 1 }
        inv1d(col, lh)
        y = 0
        while (y < lh) { a(y * w + x) = col(y); y += 1 }
        x += 1
      }
      lev -= 1
    }
  }

  // ------------------------------------------------------------ 9/7 irreversible DWT (Annex F)

  /** CDF 9/7 lifting constants (T.800 Annex F, irreversible filter). */
  private final val A97 = -1.586134342059924
  private final val B97 = -0.052980118572961
  private final val G97 = 0.882911075530934
  private final val D97 = 0.443506852043971
  private final val K97 = 1.230174104914001

  /** Forward 1D 9/7: same split layout and symmetric extension as the
    * 5/3, four lifting steps + scaling normalized like the reversible
    * path (low-pass DC gain 1, high-pass Nyquist gain 2 — so the
    * Rb = depth + gain exponent logic is shared between filters). */
  private def fwd1d97(buf: Array[Double], n: Int): Unit = {
    if (n <= 1) return
    val x = java.util.Arrays.copyOf(buf, n)
    @inline def e(p: Int): Double = x(refl(p, n))
    // step 1 (α): odd predict; step 2 (β): even update — in place over x
    var i = 1
    while (i < n) { x(i) = buf(i) + A97 * (e(i - 1) + e(i + 1)); i += 2 }
    i = 0
    while (i < n) { x(i) = buf(i) + B97 * (e(i - 1) + e(i + 1)); i += 2 }
    // steps 3 (γ) and 4 (δ) over the updated signal
    val y = java.util.Arrays.copyOf(x, n)
    @inline def e2(p: Int): Double = y(refl(p, n))
    i = 1
    while (i < n) { y(i) = x(i) + G97 * (e2(i - 1) + e2(i + 1)); i += 2 }
    i = 0
    while (i < n) { y(i) = x(i) + D97 * (e2(i - 1) + e2(i + 1)); i += 2 }
    // deinterleave with scaling: low ×1/K, high ×K
    val sn = (n + 1) / 2
    i = 0
    while (i < sn) { buf(i) = y(2 * i) / K97; i += 1 }
    i = 0
    while (i < n / 2) { buf(sn + i) = y(2 * i + 1) * K97; i += 1 }
  }

  private def inv1d97(buf: Array[Double], n: Int): Unit = {
    if (n <= 1) return
    val sn = (n + 1) / 2
    val y = new Array[Double](n)
    var i = 0
    while (i < sn) { y(2 * i) = buf(i) * K97; i += 1 }
    i = 0
    while (i < n / 2) { y(2 * i + 1) = buf(sn + i) / K97; i += 1 }
    // undo steps 4 (δ) and 3 (γ)
    val x = java.util.Arrays.copyOf(y, n)
    @inline def e2(p: Int): Double = y(refl(p, n))
    i = 0
    while (i < n) { x(i) = y(i) - D97 * (e2(i - 1) + e2(i + 1)); i += 2 }
    val x2 = java.util.Arrays.copyOf(x, n)
    @inline def e3(p: Int): Double = x2(refl(p, n))
    i = 1
    while (i < n) { x(i) = x2(i) - G97 * (e3(i - 1) + e3(i + 1)); i += 2 }
    // undo steps 2 (β) and 1 (α)
    val x3 = java.util.Arrays.copyOf(x, n)
    @inline def e4(p: Int): Double = x3(refl(p, n))
    i = 0
    while (i < n) { x(i) = x3(i) - B97 * (e4(i - 1) + e4(i + 1)); i += 2 }
    val x4 = java.util.Arrays.copyOf(x, n)
    @inline def e5(p: Int): Double = x4(refl(p, n))
    i = 1
    while (i < n) { x(i) = x4(i) - A97 * (e5(i - 1) + e5(i + 1)); i += 2 }
    System.arraycopy(x, 0, buf, 0, n)
  }

  /** Forward 2D multilevel 9/7 into the Mallat layout. */
  def fdwt97(a: Array[Double], w: Int, h: Int, levels: Int): Unit = {
    var lw = w; var lh = h
    var lev = 0
    val col = new Array[Double](h)
    val row = new Array[Double](w)
    while (lev < levels) {
      var x = 0
      while (x < lw) {
        var y = 0
        while (y < lh) { col(y) = a(y * w + x); y += 1 }
        fwd1d97(col, lh)
        y = 0
        while (y < lh) { a(y * w + x) = col(y); y += 1 }
        x += 1
      }
      var y = 0
      while (y < lh) {
        var i = 0
        while (i < lw) { row(i) = a(y * w + i); i += 1 }
        fwd1d97(row, lw)
        i = 0
        while (i < lw) { a(y * w + i) = row(i); i += 1 }
        y += 1
      }
      lw = (lw + 1) / 2; lh = (lh + 1) / 2
      lev += 1
    }
  }

  /** Inverse 2D multilevel 9/7 (mirrors fdwt97 exactly). */
  def idwt97(a: Array[Double], w: Int, h: Int, levels: Int): Unit = {
    val col = new Array[Double](h)
    val row = new Array[Double](w)
    var lev = levels - 1
    while (lev >= 0) {
      var lw = w; var lh = h
      var k = 0
      while (k < lev) { lw = (lw + 1) / 2; lh = (lh + 1) / 2; k += 1 }
      var y = 0
      while (y < lh) {
        var i = 0
        while (i < lw) { row(i) = a(y * w + i); i += 1 }
        inv1d97(row, lw)
        i = 0
        while (i < lw) { a(y * w + i) = row(i); i += 1 }
        y += 1
      }
      var x = 0
      while (x < lw) {
        y = 0
        while (y < lh) { col(y) = a(y * w + x); y += 1 }
        inv1d97(col, lh)
        y = 0
        while (y < lh) { a(y * w + x) = col(y); y += 1 }
        x += 1
      }
      lev -= 1
    }
  }

  // ------------------------------------------------------------ EBCOT Tier-1 (Annex D)

  /** Band orientation for context selection: 0=LL/LH-like, 1=HL, 2=HH. */
  final val OrientLL = 0
  final val OrientHL = 1
  final val OrientHH = 2

  // Zero-coding context from (h, v, d) significance counts, Table D-1.
  private def zcCtx(orient: Int, h0: Int, v0: Int, d: Int): Int = {
    // HL swaps the roles of h and v
    val (h, v) = if (orient == OrientHL) (v0, h0) else (h0, v0)
    if (orient == OrientHH) {
      if (d >= 3) 8
      else if (d == 2) { if (h + v >= 1) 7 else 6 }
      else if (d == 1) { if (h + v >= 2) 5 else if (h + v == 1) 4 else 3 }
      else { if (h + v >= 2) 2 else if (h + v == 1) 1 else 0 }
    } else {
      if (h == 2) 8
      else if (h == 1) { if (v >= 1) 7 else if (d >= 1) 6 else 5 }
      else {
        if (v == 2) 4
        else if (v == 1) 3
        else if (d >= 2) 2
        else if (d == 1) 1
        else 0
      }
    }
  }

  // Sign-coding context + XOR bit from clamped neighbor sign sums, Table D-3.
  private def scCtx(hc: Int, vc: Int): (Int, Int) = {
    if (hc == 1) vc match { case 1 => (13, 0); case 0 => (12, 0); case _ => (11, 0) }
    else if (hc == 0) vc match { case 1 => (10, 0); case 0 => (9, 0); case _ => (10, 1) }
    else vc match { case 1 => (11, 1); case 0 => (12, 1); case _ => (13, 1) }
  }

  /** Code-block coefficient state + the three passes, shared by both
    * directions through MqIo. `mag`/`sgn` are the coefficient planes:
    * the encoder reads them; the decoder fills them in. */
  final class T1Block(val w: Int, val h: Int, orient: Int, io: MqIo) {
    val mag = new Array[Int](w * h)
    val sgn = new Array[Int](w * h) // 1 = negative
    private val sig = new Array[Boolean](w * h)
    private val visited = new Array[Boolean](w * h)
    private val refined = new Array[Boolean](w * h)

    @inline private def at(x: Int, y: Int): Int = y * w + x
    @inline private def sigAt(x: Int, y: Int): Boolean = x >= 0 && x < w && y >= 0 && y < h && sig(at(x, y))
    @inline private def signAt(x: Int, y: Int): Int =
      if (!sigAt(x, y)) 0 else if (sgn(at(x, y)) == 1) -1 else 1

    private def counts(x: Int, y: Int): (Int, Int, Int) = {
      val hh = (if (sigAt(x - 1, y)) 1 else 0) + (if (sigAt(x + 1, y)) 1 else 0)
      val vv = (if (sigAt(x, y - 1)) 1 else 0) + (if (sigAt(x, y + 1)) 1 else 0)
      val dd = (if (sigAt(x - 1, y - 1)) 1 else 0) + (if (sigAt(x + 1, y - 1)) 1 else 0) +
        (if (sigAt(x - 1, y + 1)) 1 else 0) + (if (sigAt(x + 1, y + 1)) 1 else 0)
      (hh, vv, dd)
    }

    private def codeSign(x: Int, y: Int): Unit = {
      val i = at(x, y)
      val hc = math.max(-1, math.min(1, signAt(x - 1, y) + signAt(x + 1, y)))
      val vc = math.max(-1, math.min(1, signAt(x, y - 1) + signAt(x, y + 1)))
      val (cx, xor) = scCtx(hc, vc)
      val bit = io.code(sgn(i) ^ xor, cx)
      sgn(i) = bit ^ xor
    }

    /** Significance-propagation pass at plane p. */
    def sigPass(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val i = at(x, y)
            if (!sig(i)) {
              val (hh, vv, dd) = counts(x, y)
              if (hh + vv + dd > 0) {
                val bit = io.code((mag(i) >> p) & 1, zcCtx(orient, hh, vv, dd))
                if (bit == 1) {
                  mag(i) |= 1 << p
                  sig(i) = true
                  codeSign(x, y)
                }
                visited(i) = true
              }
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    /** Magnitude-refinement pass at plane p. */
    def refPass(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val i = at(x, y)
            if (sig(i) && !visited(i)) {
              val cx =
                if (refined(i)) 16
                else {
                  val (hh, vv, dd) = counts(x, y)
                  if (hh + vv + dd > 0) 15 else 14
                }
              val bit = io.code((mag(i) >> p) & 1, cx)
              mag(i) = (mag(i) & ~(1 << p)) | (bit << p)
              refined(i) = true
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    /** Cleanup pass at plane p (with run-length mode). */
    def cleanPass(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          // run-length mode: full stripe column, all 4 insignificant,
          // unvisited, and with no significant neighbors
          var runMode = yEnd - y0 == 4
          if (runMode) {
            var k = y0
            while (runMode && k < yEnd) {
              val i = at(x, k)
              if (sig(i) || visited(i)) runMode = false
              else {
                val (hh, vv, dd) = counts(x, k)
                if (hh + vv + dd > 0) runMode = false
              }
              k += 1
            }
          }
          if (runMode) {
            // any of the 4 becomes significant at this plane?
            var first = -1
            var k = 0
            while (k < 4 && first < 0) { if (((mag(at(x, y0 + k)) >> p) & 1) == 1) first = k; k += 1 }
            val any = io.code(if (first >= 0) 1 else 0, CtxRl)
            if (any == 1) {
              val r = if (first >= 0) first else 0
              val rd = (io.code((r >> 1) & 1, CtxUni) << 1) | io.code(r & 1, CtxUni)
              val i = at(x, y0 + rd)
              mag(i) |= 1 << p
              sig(i) = true
              codeSign(x, y0 + rd)
              y = y0 + rd + 1
            } else y = yEnd
          }
          while (y < yEnd) {
            val i = at(x, y)
            if (!sig(i) && !visited(i)) {
              val (hh, vv, dd) = counts(x, y)
              val bit = io.code((mag(i) >> p) & 1, zcCtx(orient, hh, vv, dd))
              if (bit == 1) {
                mag(i) |= 1 << p
                sig(i) = true
                codeSign(x, y)
              }
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
      java.util.Arrays.fill(visited, false)
    }
  }

  /** Encode one code-block; returns (numBitplanes, codeword). The
    * caller signals `missing = Mb - numBitplanes` zero planes. */
  def encodeBlock(w: Int, h: Int, orient: Int, mag: Array[Int], sgn: Array[Int]): (Int, Array[Byte]) = {
    var maxMag = 0
    mag.foreach(m => if (m > maxMag) maxMag = m)
    val nbps = 32 - Integer.numberOfLeadingZeros(maxMag)
    if (nbps == 0) return (0, Array.emptyByteArray)
    val enc = new MqEncoder
    val t1 = new T1Block(w, h, orient, enc)
    System.arraycopy(mag, 0, t1.mag, 0, mag.length)
    System.arraycopy(sgn, 0, t1.sgn, 0, sgn.length)
    var p = nbps - 1
    t1.cleanPass(p)
    p -= 1
    while (p >= 0) {
      t1.sigPass(p)
      t1.refPass(p)
      t1.cleanPass(p)
      p -= 1
    }
    (nbps, enc.finish())
  }

  /** Decode one code-block given its bitplane count and codeword. */
  def decodeBlock(w: Int, h: Int, orient: Int, nbps: Int, data: Array[Byte]): (Array[Int], Array[Int]) = {
    if (nbps == 0) return (new Array[Int](w * h), new Array[Int](w * h))
    val dec = new MqDecoder(data)
    val t1 = new T1Block(w, h, orient, dec)
    var p = nbps - 1
    t1.cleanPass(p)
    p -= 1
    while (p >= 0) {
      t1.sigPass(p)
      t1.refPass(p)
      t1.cleanPass(p)
      p -= 1
    }
    (t1.mag, t1.sgn)
  }
}
