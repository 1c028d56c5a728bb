package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Vorbis
import graft.multimodal.Vorbis.EncOpts

/** Ogg Vorbis codec. No external fixtures can exist in this sandbox,
  * so the proof strategy is the FLAC/JP2 one: a spec-subset encoder
  * drives the general decoder across every decode surface (residue
  * types 0/1/2, coupling, window switching, floor1, in-stream
  * codebooks), reconstruction is bounded by quantization error alone,
  * and the kernels are checked against closed forms independently
  * (codeword assignment prefix-freedom, custom float round-trip,
  * coupling involution, inverse-dB endpoints, TDAC identity). */
class VorbisSpec extends AnyFunSuite {

  private def tone(n: Int, amp: Double, f: Double, phase: Double = 0.3): Array[Double] =
    Array.tabulate(n)(i => amp * math.sin(2 * math.Pi * f * i + phase) + 0.3 * amp * math.sin(2 * math.Pi * f * 2.7 * i))

  /** Max abs error between original and decoded (after codec delay). */
  private def maxErr(orig: Array[Double], dec: Array[Double]): Double = {
    require(dec.length >= Vorbis.CodecDelay + orig.length,
      s"decoded too short: ${dec.length} < ${Vorbis.CodecDelay + orig.length}")
    var m = 0.0
    var i = 0
    while (i < orig.length) {
      m = math.max(m, math.abs(orig(i) - dec(Vorbis.CodecDelay + i)))
      i += 1
    }
    m
  }

  test("kernels: custom float32 round-trip, inverse-dB endpoints, coupling involution, codeword prefix-freedom") {
    // custom float: spec example values and lattice exactness
    for (v <- Seq(1.0, -1.0, 0.25, 1024.0, -32.0, 0.0078125))
      assert(Vorbis.float32Unpack(Vorbis.float32Pack(v)) == v, s"float $v")
    // inverse dB table endpoints (the spec's first and last entries)
    assert(math.abs(Vorbis.inverseDb(0) - 1.0649863e-7) < 1e-12)
    assert(Vorbis.inverseDb(255) == 1.0)
    assert(Vorbis.inverseDb(128) > Vorbis.inverseDb(127)) // monotone
    // square-polar coupling: exhaustive involution on the lattice
    for (x <- -20 to 20; y <- -20 to 20) {
      val (m, a) = Vorbis.couple(x, y)
      // decode rule (the spec's case table)
      val (dx, dy) =
        if (m > 0) { if (a > 0) (m, m - a) else (m + a, m) }
        else { if (a > 0) (m, m + a) else (m - a, m) }
      assert((dx, dy) == (x, y), s"couple($x,$y)=($m,$a) decoded to ($dx,$dy)")
    }
    // codeword assignment: prefix-free and complete for a two-length code
    val lens = Array.fill(257)(0)
    (0 until 255).foreach(lens(_) = 8)
    (255 until 257).foreach(lens(_) = 9)
    val words = Vorbis.assignCodewords(lens)
    val seen = scala.collection.mutable.Set.empty[String]
    def bitsOf(w: Int, l: Int) = (l - 1 to 0 by -1).map(i => (w >> i) & 1).mkString
    for (i <- 0 until 257) {
      val b = bitsOf(words(i), lens(i))
      assert(seen.add(b), s"duplicate codeword $b")
    }
    // prefix-freedom: no codeword is a prefix of another
    val all = (0 until 257).map(i => bitsOf(words(i), lens(i))).sorted
    all.sliding(2).foreach { case Seq(a, b) => assert(!b.startsWith(a), s"$a prefixes $b"); case _ => }
  }

  test("mono round-trip: type-1 residue, short blocks — error bounded by the quantization step") {
    val pcm = tone(2000, 1000.0, 0.013)
    val enc = Vorbis.encode(Array(pcm), EncOpts(resType = 1, quantStep = 0.25))
    assert(Vorbis.isVorbis(enc))
    val dec = Vorbis.decode(enc)
    assert(dec.channels == 1 && dec.sampleRate == 8000)
    // quantization error per spectral line ≤ δ/2; the synthesis spreads
    // it across the block — bound generously at a few δ·√n
    val err = maxErr(pcm, dec.samples(0))
    assert(err < 16.0, s"mono max err $err") // signal amplitude 1300, err ≤ 16 → >38 dB
  }

  test("mono round-trip: type-0 residue (interleaved VQ striding)") {
    val pcm = tone(1500, 30.0, 0.021) // small amplitude for the narrow pair grid
    val enc = Vorbis.encode(Array(pcm), EncOpts(resType = 0, quantStep = 0.5))
    val err = maxErr(pcm, Vorbis.decode(enc).samples(0))
    assert(err < 32.0, s"type-0 max err $err")
  }

  test("stereo round-trip: type-2 residue with square-polar coupling") {
    val l = tone(1800, 800.0, 0.017)
    val r = tone(1800, 780.0, 0.0171, phase = 1.1) // correlated but distinct
    val enc = Vorbis.encode(Array(l, r), EncOpts(channels = 2, resType = 2, coupling = true, quantStep = 0.25))
    val dec = Vorbis.decode(enc)
    assert(dec.channels == 2)
    val eL = maxErr(l, dec.samples(0))
    val eR = maxErr(r, dec.samples(1))
    assert(eL < 16.0 && eR < 16.0, s"stereo errs $eL $eR")
  }

  test("stereo round-trip: type-2 without coupling") {
    val l = tone(1200, 500.0, 0.019)
    val r = tone(1200, 450.0, 0.031)
    val enc = Vorbis.encode(Array(l, r), EncOpts(channels = 2, resType = 2, quantStep = 0.25))
    val dec = Vorbis.decode(enc)
    assert(maxErr(l, dec.samples(0)) < 16.0 && maxErr(r, dec.samples(1)) < 16.0)
  }

  test("window switching: long+short blocks with prev/next flags reconstruct across transitions") {
    val pcm = tone(6000, 900.0, 0.011)
    val enc = Vorbis.encode(Array(pcm), EncOpts(resType = 1, longBlocks = true, quantStep = 0.25))
    val err = maxErr(pcm, Vorbis.decode(enc).samples(0))
    assert(err < 24.0, s"switching max err $err")
  }

  test("partitioned floor1 (classes + masterbook + subbooks) round-trips") {
    val pcm = tone(1600, 700.0, 0.015)
    val enc = Vorbis.encode(Array(pcm), EncOpts(classedFloor = true, quantStep = 0.25))
    val err = maxErr(pcm, Vorbis.decode(enc).samples(0))
    assert(err < 16.0, s"classed-floor max err $err")
    // and composed with stereo coupling
    val l = tone(1400, 600.0, 0.018)
    val r = tone(1400, 580.0, 0.0181, phase = 0.9)
    val enc2 = Vorbis.encode(Array(l, r),
      EncOpts(channels = 2, resType = 2, coupling = true, classedFloor = true, quantStep = 0.25))
    val dec2 = Vorbis.decode(enc2)
    assert(maxErr(l, dec2.samples(0)) < 16.0 && maxErr(r, dec2.samples(1)) < 16.0)
  }

  test("finer quantization monotonically tightens reconstruction") {
    val pcm = tone(1000, 1000.0, 0.023)
    val coarse = maxErr(pcm, Vorbis.decode(Vorbis.encode(Array(pcm), EncOpts(quantStep = 2.0))).samples(0))
    val fine = maxErr(pcm, Vorbis.decode(Vorbis.encode(Array(pcm), EncOpts(quantStep = 0.125))).samples(0))
    assert(fine < coarse, s"fine $fine vs coarse $coarse")
    assert(fine < 8.0)
  }

  test("everything at once: stereo + coupling + classed floor + window switching") {
    val l = tone(5000, 700.0, 0.012)
    val r = tone(5000, 650.0, 0.0123, phase = 0.7)
    val enc = Vorbis.encode(Array(l, r), EncOpts(
      channels = 2, resType = 2, coupling = true, classedFloor = true,
      longBlocks = true, quantStep = 0.25))
    val dec = Vorbis.decode(enc)
    val eL = maxErr(l, dec.samples(0))
    val eR = maxErr(r, dec.samples(1))
    assert(eL < 24.0 && eR < 24.0, s"combo errs $eL $eR")
  }

  test("decodeAudio face: Ogg Vorbis payloads route to PCM; named refusals hold") {
    val pcm = tone(800, 2000.0, 0.02)
    val enc = Vorbis.encode(Array(pcm), EncOpts())
    val audio = graft.multimodal.Multimodal.decodeAudio(enc)
    assert(audio.exists(a => a.sampleRate == 8000 && a.channels == 1 && a.samples.length > 800))
    // Ogg sniff still classifies it
    assert(graft.multimodal.Ogg.sniff(enc).exists(_.codec == "vorbis"))
    // truncation → named error, not junk
    intercept[Exception](Vorbis.decode(enc.take(60)))
    assert(!Vorbis.isVorbis("OggS but not really a stream at all....".getBytes))
    assert(!Vorbis.isVorbis(null))
  }
}
