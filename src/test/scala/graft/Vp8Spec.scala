package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.raster.{Vp8, Webp}

/** VP8 (lossy WebP) conformance.
  *
  * Decoder gate: every fixture in `src/test/resources/graft/vp8/` is
  * a REAL libwebp lossy encoding (q5..q100, odd dims, multi-segment
  * 320x240) paired with libwebp's own decoded YUV planes; this spec
  * requires byte-exact agreement, so the boolean decoder, every
  * normative table in Vp8Tables, token contexts, both transforms, all
  * 14 intra modes and the loop filter are each pinned against an
  * independent implementation — one wrong value desynchronizes the
  * arithmetic decoder and fails the gate.
  *
  * Encoder gate: the minimal conforming encoder round-trips through
  * this decoder within quantization bounds. Its cross-decoder
  * conformance was established with tools/check_vp8_enc.py (the
  * system libwebp decodes the Scala encoder's streams byte-identically
  * to this decoder — 12/12 across content x qIndex; see that script's
  * header for the recipe).
  */
class Vp8Spec extends AnyFunSuite {

  private val dir = new java.io.File("src/test/resources/graft/vp8")

  private def fixtures: Seq[String] = {
    val names = dir.listFiles().filter(_.getName.endsWith(".webp")).map(_.getName.stripSuffix(".webp")).sorted.toSeq
    assert(names.size >= 11, s"expected the full fixture set, found $names")
    names
  }

  private def vp8Chunk(webp: Array[Byte]): (Int, Int) = {
    var at = 12
    while (at + 8 <= webp.length) {
      val tag = new String(webp, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = (webp(at + 4) & 0xff) | ((webp(at + 5) & 0xff) << 8) | ((webp(at + 6) & 0xff) << 16) | ((webp(at + 7) & 0xff) << 24)
      if (tag == "VP8 ") return (at + 8, sz)
      at += 8 + sz + (sz & 1)
    }
    fail("no VP8 chunk")
  }

  test("decode: every libwebp-encoded fixture reconstructs byte-exact YUV vs libwebp's own decode") {
    fixtures.foreach { n =>
      val webp = java.nio.file.Files.readAllBytes(new java.io.File(dir, n + ".webp").toPath)
      val yuv = java.nio.file.Files.readAllBytes(new java.io.File(dir, n + ".yuv").toPath)
      val (off, len) = vp8Chunk(webp)
      val f = Vp8.decodeFrame(webp, off, len)
      def le32(i: Int) = (yuv(i) & 0xff) | ((yuv(i + 1) & 0xff) << 8) | ((yuv(i + 2) & 0xff) << 16) | ((yuv(i + 3) & 0xff) << 24)
      assert(new String(yuv, 0, 4, java.nio.charset.StandardCharsets.US_ASCII) == "VP8Y")
      val w = le32(4); val h = le32(8)
      assert(f.width == w && f.height == h, s"$n: dims")
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      assert(java.util.Arrays.equals(f.y, java.util.Arrays.copyOfRange(yuv, 12, 12 + w * h)), s"$n: Y plane drift")
      assert(java.util.Arrays.equals(f.u, java.util.Arrays.copyOfRange(yuv, 12 + w * h, 12 + w * h + cw * ch)), s"$n: U plane drift")
      assert(java.util.Arrays.equals(f.v, java.util.Arrays.copyOfRange(yuv, 12 + w * h + cw * ch, 12 + w * h + 2 * cw * ch)), s"$n: V plane drift")
    }
  }

  test("Webp.decode: a lossy container decodes to an RGB image with the right dimensions") {
    val webp = java.nio.file.Files.readAllBytes(new java.io.File(dir, "noise_33x17_q50.webp").toPath)
    val img = Webp.decode(webp).getOrElse(fail("lossy decode returned None"))
    assert(img.width == 33 && img.height == 17 && img.channels == 3)
    val f = Webp.decodeLossyYuv(webp).get
    assert(f.width == 33 && f.height == 17 && f.u.length == 17 * 9)
  }

  private def synth(w: Int, h: Int)(f: (Int, Int) => Int): (Array[Byte], Array[Byte], Array[Byte]) = {
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val y = Array.tabulate(w * h)(i => (f(i % w, i / w) & 0xff).toByte)
    val u = Array.tabulate(cw * ch)(i => ((f((i % cw) * 2, (i / cw) * 2) + 64) & 0xff).toByte)
    val v = Array.tabulate(cw * ch)(i => ((f((i % cw) * 2, (i / cw) * 2) + 192) & 0xff).toByte)
    (y, u, v)
  }

  private def maxDiff(a: Array[Byte], b: Array[Byte]): Int = {
    var m = 0
    var i = 0
    while (i < a.length) { val d = math.abs((a(i) & 0xff) - (b(i) & 0xff)); if (d > m) m = d; i += 1 }
    m
  }

  test("encode/decode: round-trip error is quantization-bounded, tighter at finer qIndex") {
    val cases = Seq(
      (64, 48, (x: Int, y: Int) => x * 3 + y), // gradient
      (33, 17, (x: Int, y: Int) => { var v = x * 2654435761L + y * 40503; v ^= v >> 13; (v & 0xff).toInt }), // noise, odd dims
      (16, 16, (_: Int, _: Int) => 128) // flat single MB
    )
    for ((w, h, f) <- cases) {
      val (y, u, v) = synth(w, h)(f)
      val fine = Vp8.decodeFrame(Vp8.encodeFrame(y, u, v, w, h, qIndex = 0), 0, Int.MaxValue)
      assert(maxDiff(y, fine.y) <= 3 && maxDiff(u, fine.u) <= 3 && maxDiff(v, fine.v) <= 3,
        s"${w}x$h q0: fine round-trip out of bounds")
      val coarse = Vp8.decodeFrame(Vp8.encodeFrame(y, u, v, w, h, qIndex = 40), 0, Int.MaxValue)
      assert(maxDiff(y, coarse.y) <= 48, s"${w}x$h q40: coarse bound")
      assert(maxDiff(y, fine.y) <= maxDiff(y, coarse.y) + 1, "finer quantizer must not be worse")
    }
  }

  test("encode: deterministic, and the RIFF face round-trips through Webp.decode") {
    val (y, u, v) = synth(40, 24)((x, yy) => x * 5 + yy * 2)
    val a = Webp.encodeLossy(y, u, v, 40, 24, qIndex = 8)
    val b = Webp.encodeLossy(y, u, v, 40, 24, qIndex = 8)
    assert(java.util.Arrays.equals(a, b), "encoder must be deterministic")
    assert(Webp.isWebp(a))
    assert(Webp.probe(a).contains(("vp8", 40, 24)))
    val img = Webp.decode(a).getOrElse(fail("decode of own encoding failed"))
    assert(img.width == 40 && img.height == 24)
  }

  test("decode: malformed input fails with Vp8Error, never raw index errors") {
    val (y, u, v) = synth(32, 32)((x, yy) => x ^ yy)
    val good = Vp8.encodeFrame(y, u, v, 32, 32, qIndex = 8)
    // cuts inside the header / first partition must raise; cuts inside
    // the token partition may legally decode (VP8 carries no checksum
    // and the boolean decoder's past-the-end reads are defined as
    // zero bits) — but must NEVER escape as an index error
    val part0Len = ((good(0) & 0xff) | ((good(1) & 0xff) << 8) | ((good(2) & 0xff) << 16)) >> 5
    (Seq(0, 1, 2, 3, 5, 9) ++ (10 until (10 + part0Len) by 3)).foreach { cut =>
      intercept[Vp8.Vp8Error](Vp8.decodeFrame(java.util.Arrays.copyOf(good, cut), 0, cut))
    }
    ((10 + part0Len) until good.length by 17).foreach { cut =>
      try { Vp8.decodeFrame(java.util.Arrays.copyOf(good, cut), 0, cut); () }
      catch { case _: Vp8.Vp8Error => () }
    }
    // interframe tag (bit 0 set) is a named refusal
    val inter = good.clone(); inter(0) = (inter(0) | 1).toByte
    val e1 = intercept[Vp8.Vp8Error](Vp8.decodeFrame(inter, 0, inter.length))
    assert(e1.getMessage.contains("keyframe"))
    // bad start code
    val bad = good.clone(); bad(3) = 0
    intercept[Vp8.Vp8Error](Vp8.decodeFrame(bad, 0, bad.length))
    // bit corruption across the stream must never escape as an
    // ArrayIndexOutOfBounds (untrusted-crawl-bytes contract)
    (6 until good.length by 7).foreach { i =>
      val c = good.clone(); c(i) = (c(i) ^ 0xff).toByte
      try { Vp8.decodeFrame(c, 0, c.length); () }
      catch { case _: Vp8.Vp8Error => () }
    }
  }
}
