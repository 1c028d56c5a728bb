package graft

import graft.multimodal.Flac

/** FLAC codec conformance. The encoder emits a strict subset, so
  * encode→decode identity proves both directions of that subset; the
  * decoder paths the encoder never writes (LPC, stereo decorrelation,
  * wasted bits, Rice2, multi-partition residuals, escape codes) are
  * exercised with hand-assembled frames whose CRCs come from an
  * INDEPENDENT in-spec implementation of the published polynomials —
  * so a table bug on either side fails the cross-check.
  */
class FlacSpec extends SparkSuite {

  // ---- independent bit/CRC helpers (deliberately re-derived here) ----

  private final class W {
    val out = collection.mutable.ArrayBuffer.empty[Byte]
    private var acc = 0
    private var n = 0
    def bits(v: Long, k: Int): Unit = {
      var i = k - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1L).toInt
        n += 1
        if (n == 8) { out += acc.toByte; acc = 0; n = 0 }
        i -= 1
      }
    }
    def unary(q: Int): Unit = { (0 until q).foreach(_ => bits(0, 1)); bits(1, 1) }
    def align(): Unit = while (n != 0) bits(0, 1)
    def toArray: Array[Byte] = out.toArray
  }

  private def crc8(b: Seq[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= x & 0xff
      (0 until 8).foreach(_ => c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff)
    }
    c
  }

  private def crc16(b: Seq[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= (x & 0xff) << 8
      (0 until 8).foreach(_ => c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff)
    }
    c
  }

  private def zig(v: Long): Long = if (v >= 0) v << 1 else (-v << 1) - 1

  /** Minimal stream: fLaC + STREAMINFO (zero MD5 = unchecked) + frames. */
  private def stream(rate: Int, ch: Int, bps: Int, total: Long, frames: Array[Byte]*): Array[Byte] = {
    val w = new W
    w.bits(4096, 16); w.bits(4096, 16); w.bits(0, 24); w.bits(0, 24)
    w.bits(rate, 20); w.bits(ch - 1, 3); w.bits(bps - 1, 5); w.bits(total, 36)
    (0 until 16).foreach(_ => w.bits(0, 8)) // zero MD5: decoder skips the check
    "fLaC".getBytes ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ w.toArray ++ frames.flatten
  }

  /** Frame header for fixed-blocksize frame 0, explicit 16-bit blocksize. */
  private def frameHeader(w: W, blockSize: Int, chCode: Int, ssCode: Int): Unit = {
    w.bits(0x3FFE, 14); w.bits(0, 1); w.bits(0, 1)
    w.bits(0x7, 4); w.bits(0x0, 4)
    w.bits(chCode, 4); w.bits(ssCode, 3); w.bits(0, 1)
    w.bits(0, 8) // frame number 0, one utf8 byte
    w.bits(blockSize - 1, 16)
    w.bits(crc8(w.out.toSeq), 8)
  }

  private def finishFrame(w: W): Array[Byte] = {
    w.align()
    w.bits(crc16(w.out.toSeq), 16)
    w.toArray
  }

  private def verbatim(w: W, x: Seq[Int], bps: Int): Unit = {
    w.bits(0, 1); w.bits(1, 6); w.bits(0, 1)
    x.foreach(v => w.bits(v.toLong & ((1L << bps) - 1), bps))
  }

  private def tone(n: Int, amp: Double, freq: Double, rate: Int): Array[Int] =
    Array.tabulate(n)(i => math.round(amp * math.sin(2 * math.Pi * freq * i / rate)).toInt)

  // ------------------------------------------------------------------

  test("round-trip identity: 16-bit mono tone, stereo, and deterministic noise; MD5 verifies") {
    val mono = tone(3000, 12000, 440.0, 8000)
    val s = Flac.decode(Flac.encode(8000, 1, 16, mono))
    assert(s.sampleRate == 8000 && s.channels == 1 && s.bitsPerSample == 16 && s.totalSamples == 3000)
    assert(s.md5Ok, "STREAMINFO MD5 must verify")
    assert(s.samples.toSeq == mono.toSeq)

    val stereo = mono.flatMap(v => Seq(v, -v / 2))
    val t = Flac.decode(Flac.encode(44100, 2, 16, stereo))
    assert(t.channels == 2 && t.samples.toSeq == stereo.toSeq && t.md5Ok)

    // xorshift noise forces the verbatim/high-k paths
    var st = 0x9e3779b9L
    val noise = Array.fill(5000) { st ^= st << 13; st ^= st >>> 7; st ^= st << 17; (st & 0xffff).toInt - 32768 }
    val u = Flac.decode(Flac.encode(48000, 1, 16, noise))
    assert(u.samples.toSeq == noise.toSeq && u.md5Ok)
  }

  test("round-trip identity at 8-bit and 24-bit depths, and across frame boundaries") {
    val x8 = Array.tabulate(5000)(i => (i * 37 % 256) - 128) // > one 4096 block
    val s8 = Flac.decode(Flac.encode(16000, 1, 8, x8))
    assert(s8.bitsPerSample == 8 && s8.samples.toSeq == x8.toSeq && s8.md5Ok)

    val x24 = Array.tabulate(9000)(i => ((i * 104729) % 16777216) - 8388608) // 3 frames
    val s24 = Flac.decode(Flac.encode(96000, 1, 24, x24))
    assert(s24.bitsPerSample == 24 && s24.samples.toSeq == x24.toSeq && s24.md5Ok)
  }

  test("silence collapses to CONSTANT subframes (tiny file) and still round-trips") {
    val silence = new Array[Int](8192)
    val enc = Flac.encode(8000, 1, 16, silence)
    assert(enc.length < 200, s"constant frames should be tiny, got ${enc.length}")
    assert(Flac.decode(enc).samples.toSeq == silence.toSeq)
  }

  test("hand-built LPC subframe reconstructs exactly") {
    // x[i] = (x[i-1] >> 1) + res — order-1 LPC, coef 1, shift 1 (bounded)
    val n = 64
    val coef = 1
    val shift = 1
    val x = new Array[Int](n)
    x(0) = 1000
    val res = Array.tabulate(n - 1)(i => (i % 7) - 3)
    (1 until n).foreach(i => x(i) = ((coef.toLong * x(i - 1)) >> shift).toInt + res(i - 1))

    val w = new W
    frameHeader(w, n, 0, 4) // mono, 16-bit
    w.bits(0, 1); w.bits(0x20, 6); w.bits(0, 1) // LPC order 1 (0b100000)
    w.bits(x(0).toLong & 0xffff, 16)            // warmup
    w.bits(4 - 1, 4)                            // precision 4 bits
    w.bits(shift, 5)
    w.bits(coef, 4)
    w.bits(0, 2); w.bits(0, 4); w.bits(2, 4)    // rice, partition order 0, k=2
    res.foreach { r => val u = zig(r); w.unary((u >>> 2).toInt); w.bits(u & 3, 2) }
    val s = Flac.decode(stream(8000, 1, 16, n, finishFrame(w)))
    assert(s.samples.toSeq == x.toSeq)
  }

  test("hand-built stereo decorrelation: left/side, right/side, mid/side all reconstruct") {
    val n = 16
    val left = Array.tabulate(n)(i => 500 * i - 3000)
    val right = Array.tabulate(n)(i => -400 * i + 1000)
    val side = Array.tabulate(n)(i => left(i) - right(i))
    val mid = Array.tabulate(n)(i => (left(i) + right(i)) >> 1)

    def build(chCode: Int, a: Seq[Int], aBps: Int, b: Seq[Int], bBps: Int): Array[Byte] = {
      val w = new W
      frameHeader(w, n, chCode, 4)
      verbatim(w, a, aBps); verbatim(w, b, bBps)
      finishFrame(w)
    }
    val ls = Flac.decode(stream(8000, 2, 16, n, build(8, left.toSeq, 16, side.toSeq, 17)))
    val ms = Flac.decode(stream(8000, 2, 16, n, build(10, mid.toSeq, 16, side.toSeq, 17)))
    def pairs(s: Flac.Stream): (Seq[Int], Seq[Int]) = {
      val l = s.samples.indices.collect { case i if i % 2 == 0 => s.samples(i) }
      val r = s.samples.indices.collect { case i if i % 2 == 1 => s.samples(i) }
      (l.toSeq, r.toSeq)
    }
    assert(pairs(ls) == (left.toSeq, right.toSeq), "left/side")
    assert(pairs(ms) == (left.toSeq, right.toSeq), "mid/side")
    // right/side frame needs its second channel too
    val w2 = new W
    frameHeader(w2, n, 9, 4)
    verbatim(w2, side.toSeq, 17); verbatim(w2, right.toSeq, 16)
    val rs2 = Flac.decode(stream(8000, 2, 16, n, finishFrame(w2)))
    assert(pairs(rs2) == (left.toSeq, right.toSeq), "right/side")
  }

  test("hand-built wasted bits, Rice2, escape partitions, and partition order > 0 decode") {
    val n = 32
    // wasted bits: samples are all multiples of 4 → 2 wasted bits
    val x = Array.tabulate(n)(i => 4 * (i - 16))
    val w = new W
    frameHeader(w, n, 0, 4)
    w.bits(0, 1); w.bits(1, 6)     // verbatim
    w.bits(1, 1); w.unary(1)       // wasted flag + unary(k-1=1) → k=2
    x.foreach(v => w.bits((v >> 2).toLong & 0x3fff, 14))
    val s = Flac.decode(stream(8000, 1, 16, n, finishFrame(w)))
    assert(s.samples.toSeq == x.toSeq, "wasted bits")

    // fixed order 0 with Rice2 method, partition order 2 (4 partitions), last partition escaped raw
    val y = Array.tabulate(n)(i => (i % 5) - 2)
    val w2 = new W
    frameHeader(w2, n, 0, 4)
    w2.bits(0, 1); w2.bits(8, 6); w2.bits(0, 1) // FIXED order 0
    w2.bits(1, 2)                               // method 1 = rice2 (5-bit params)
    w2.bits(2, 4)                               // partition order 2
    val per = n / 4
    (0 until 3).foreach { p =>
      w2.bits(1, 5) // k=1
      (0 until per).foreach { i => val u = zig(y(p * per + i)); w2.unary((u >>> 1).toInt); w2.bits(u & 1, 1) }
    }
    w2.bits(0x1F, 5) // escape
    w2.bits(6, 5)    // raw 6-bit residuals
    (0 until per).foreach(i => w2.bits(y(3 * per + i).toLong & 0x3f, 6))
    val s2 = Flac.decode(stream(8000, 1, 16, n, finishFrame(w2)))
    assert(s2.samples.toSeq == y.toSeq, "rice2 + escape + partitions")
  }

  test("corruption is detected: CRC-8, CRC-16, and bad sync all throw") {
    val enc = Flac.encode(8000, 1, 16, tone(1000, 9000, 300.0, 8000))
    def corrupt(at: Int): Array[Byte] = { val c = enc.clone(); c(at) = (c(at) ^ 0x01).toByte; c }
    // find the first frame: fLaC(4) + header(4) + STREAMINFO(34) = byte 42
    val frameAt = 42
    intercept[IllegalArgumentException](Flac.decode(corrupt(frameAt)))       // sync byte
    intercept[IllegalArgumentException](Flac.decode(corrupt(frameAt + 5)))   // header field → CRC-8
    intercept[IllegalArgumentException](Flac.decode(corrupt(enc.length - 40))) // body → CRC-16
    intercept[IllegalArgumentException](Flac.decode("fLaX".getBytes ++ new Array[Byte](60)))
  }

  test("metadata-block walk skips padding/vorbis-comment blocks before frames") {
    val x = Array.tabulate(100)(i => i * 11 - 550)
    val enc = Flac.encode(8000, 1, 16, x)
    // splice a PADDING block (type 1) and a VORBIS_COMMENT (type 4) after STREAMINFO
    val head = enc.take(4)
    val si = enc.slice(4, 42)
    val siNotLast = si.clone(); siNotLast(0) = 0x00 // clear last-block flag
    val pad = Array[Byte](0x01, 0, 0, 8) ++ new Array[Byte](8)
    val vc = Array[Byte](0x84.toByte, 0, 0, 4) ++ Array[Byte](1, 2, 3, 4) // last
    val spliced = head ++ siNotLast ++ pad ++ vc ++ enc.drop(42)
    assert(Flac.decode(spliced).samples.toSeq == x.toSeq)
  }
}
