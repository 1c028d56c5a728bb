package graft

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.multimodal.Wav

/** WAV/PCM codec conformance against the JDK's own javax.sound
  * implementation (real independent fixtures, like JpegSpec): our
  * files parse through AudioSystem sample-exact, AudioSystem-written
  * files parse through our decoder sample-exact, and the audio
  * features (duration, RMS) match closed-form expectations.
  */
class WavSpec extends SparkSuite {

  private def tone(rate: Int, ms: Int, amp: Double, freq: Double): Array[Int] =
    Array.tabulate(rate * ms / 1000)(i => math.round(amp * 32767.0 * math.sin(2 * math.Pi * freq * i / rate)).toInt)

  test("round-trip: encode then decode is the identity on 16-bit PCM, mono and stereo") {
    val mono = tone(8000, 250, 0.5, 440.0)
    val a = Wav.decode(Wav.encode(8000, 1, mono)).get
    assert(a.sampleRate == 8000 && a.channels == 1 && a.bitsPerSample == 16)
    assert(a.samples.toSeq == mono.toSeq)
    val stereo = mono.flatMap(s => Seq(s, -s))
    val b = Wav.decode(Wav.encode(8000, 2, stereo)).get
    assert(b.channels == 2 && b.frames == mono.length && b.samples.toSeq == stereo.toSeq)
  }

  test("AudioSystem reads our files sample-exact") {
    val samples = tone(16000, 125, 0.8, 1000.0)
    val wav = Wav.encode(16000, 1, samples)
    val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
    val f = in.getFormat
    assert(f.getSampleRate == 16000f && f.getChannels == 1 && f.getSampleSizeInBits == 16)
    val raw = in.readAllBytes()
    assert(raw.length == samples.length * 2)
    val got = Array.tabulate(samples.length) { i =>
      val lo = raw(2 * i) & 0xff
      val hi = raw(2 * i + 1)
      (hi << 8) | lo
    }
    assert(got.toSeq == samples.toSeq)
  }

  test("our decoder reads AudioSystem-written files sample-exact") {
    val samples = tone(11025, 200, 0.6, 220.0)
    val pcm = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      pcm(2 * i) = samples(i).toByte
      pcm(2 * i + 1) = (samples(i) >> 8).toByte
    }
    val fmt = new AudioFormat(11025f, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val a = Wav.decode(bos.toByteArray).getOrElse(fail("decode of JDK WAV failed"))
    assert(a.sampleRate == 11025 && a.channels == 1 && a.bitsPerSample == 16)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("extractFeatures on a WAV payload yields REAL duration/rms; images keep null audio columns") {
    import spark.implicits._
    val wav = Wav.encode(8000, 1, tone(8000, 250, 0.5, 440.0))
    val png = graft.raster.Png.encodeGray(4, 4, Array.tabulate(16)(_.toByte))
    val media = Seq(
      (1L, "audio", wav),
      (2L, "image", png)
    ).toDF("media_id", "kind", "payload")
    val rows = graft.multimodal.Multimodal
      .extractFeatures(media)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    assert(rows(1L).getLong(5) == 250L) // duration_ms
    assert(math.abs(rows(1L).getDouble(6) - 0.5 / math.sqrt(2.0)) < 0.01)
    assert(rows(1L).getInt(7) == 8000 && rows(1L).getInt(8) == 1)
    assert(rows(2L).isNullAt(5) && rows(2L).isNullAt(6))
  }

  test("G.711: encode∘decode is the identity on all 256 A-law codes and 255 µ-law codes") {
    (0 until 256).foreach { c =>
      // µ-law has two zero codes (0x7F = −0, 0xFF = +0); encode canonically emits 0xFF
      val expectU = if (c == 0x7f) 0xff else c
      assert((Wav.muLawEncode(Wav.muLawDecode(c.toByte)) & 0xff) == expectU, s"ulaw code $c")
      assert((Wav.aLawEncode(Wav.aLawDecode(c.toByte)) & 0xff) == c, s"alaw code $c")
    }
  }

  test("G.711 decode matches the JDK's own ULAW/ALAW converters code-for-code") {
    import javax.sound.sampled.AudioFormat.Encoding
    def jdkDecode(enc: Encoding, codes: Array[Byte]): Array[Int] = {
      val src = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
      val dst = new AudioFormat(Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(codes), src, codes.length)
      val pcm = AudioSystem.getAudioInputStream(dst, ais).readAllBytes()
      Array.tabulate(codes.length)(i => (pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff))
    }
    val codes = Array.tabulate(256)(_.toByte)
    val ju = jdkDecode(Encoding.ULAW, codes)
    val ja = jdkDecode(Encoding.ALAW, codes)
    (0 until 256).foreach { c =>
      assert(ju(c) == Wav.muLawDecode(codes(c)), s"ulaw $c: jdk ${ju(c)} vs ${Wav.muLawDecode(codes(c))}")
      assert(ja(c) == Wav.aLawDecode(codes(c)), s"alaw $c: jdk ${ja(c)} vs ${Wav.aLawDecode(codes(c))}")
    }
  }

  test("G.711 WAV container: µ-law and A-law files decode with bounded quantization error") {
    val samples = tone(8000, 250, 0.7, 440.0)
    Seq(true, false).foreach { aLaw =>
      val wav = Wav.encodeG711(8000, 1, samples, aLaw)
      val a = Wav.decode(wav).getOrElse(fail(s"G.711 decode failed (aLaw=$aLaw)"))
      assert(a.sampleRate == 8000 && a.channels == 1 && a.bitsPerSample == 16)
      assert(a.samples.length == samples.length)
      val maxErr = samples.indices.map(i => math.abs(a.samples(i) - samples(i))).max
      assert(maxErr <= 1024, s"quantization error $maxErr (aLaw=$aLaw)") // half of the top-segment step
    }
  }

  test("IMA ADPCM: known-answer nibbles from the published step/index tables") {
    // predictor 0, step index 0 (step 7); nibbles 4,4,8+4,0 hand-walked:
    //  n=4: delta=7>>3+7=7 → pred 7,  idx 0+2=2 (step 9)
    //  n=4: delta=9>>3+9=10 → pred 17, idx 4 (step 11)
    //  n=12: delta=-(11>>3+11)=-12 → pred 5, idx 4+2=6 (step 13)
    //  n=0: delta=13>>3=1 → pred 6, idx 5
    val block = Array[Byte](0, 0, 0, 0, (4 | (4 << 4)).toByte, (12 | (0 << 4)).toByte, 0, 0)
    val wav = {
      // hand-assembled mono fmt 0x11 container around one 8-byte block
      val out = collection.mutable.ArrayBuffer.empty[Byte]
      def str(s: String) = out ++= s.getBytes("US-ASCII")
      def u16(v: Int) = { out += v.toByte; out += (v >> 8).toByte }
      def u32(v: Int) = (0 until 4).foreach(k => out += (v >> (8 * k)).toByte)
      str("RIFF"); u32(4 + 28 + 8 + block.length); str("WAVE")
      str("fmt "); u32(20); u16(0x11); u16(1); u32(8000); u32(4000); u16(8); u16(4); u16(2); u16(9)
      str("data"); u32(block.length)
      out ++= block
      out.toArray
    }
    val a = Wav.decode(wav).getOrElse(fail("ADPCM decode failed"))
    assert(a.samples.take(5).toSeq == Seq(0, 7, 17, 5, 6), a.samples.take(9).toSeq.toString)
  }

  test("IMA ADPCM round-trip: block-leading samples exact, overall SNR high, stereo interleave kept") {
    val mono = tone(8000, 1000, 0.6, 440.0)
    val a = Wav.decode(Wav.encodeImaAdpcm(8000, 1, mono)).getOrElse(fail("adpcm decode"))
    assert(a.sampleRate == 8000 && a.channels == 1 && a.bitsPerSample == 16)
    assert(a.samples.length >= mono.length) // last block may carry padding
    // block headers carry sample 0 of each block verbatim
    assert(a.samples(0) == mono(0) && a.samples(505) == mono(505))
    val err = mono.indices.map(i => { val d = (a.samples(i) - mono(i)).toDouble; d * d }).sum / mono.length
    val sig = mono.map(s => s.toDouble * s).sum / mono.length
    val snr = 10 * math.log10(sig / err)
    assert(snr > 20, s"ADPCM SNR $snr dB")

    val stereo = mono.flatMap(s => Seq(s, -s))
    val b = Wav.decode(Wav.encodeImaAdpcm(8000, 2, stereo)).getOrElse(fail("stereo adpcm"))
    assert(b.channels == 2)
    // channel 1 is the negation of channel 0 at matching quality
    val n = mono.length
    val errLR = (0 until n).map(i => math.abs(b.samples(2 * i) + b.samples(2 * i + 1))).max
    assert(errLR <= 2, s"stereo channels drifted: $errLR") // ±1 from independent rounding
  }

  test("unified audio decode: FLAC payloads yield the same features as their WAV twin") {
    val samples = tone(8000, 500, 0.5, 440.0)
    val viaWav = graft.multimodal.Multimodal.decodeAudio(Wav.encode(8000, 1, samples)).get
    val viaFlac = graft.multimodal.Multimodal
      .decodeAudio(graft.multimodal.Flac.encode(8000, 1, 16, samples)).get
    assert(viaFlac.samples.toSeq == viaWav.samples.toSeq)
    assert(viaFlac.durationMs == 500L && math.abs(viaFlac.rms - viaWav.rms) < 1e-12)
    assert(graft.multimodal.Multimodal.decodeAudio("fLaCgarbage!!".getBytes).isEmpty)
  }

  test("adversarial chunk length 2^31+ refuses instead of stalling the RIFF walk") {
    // 'JUNK' chunk with length 0xFFFFFFF8 (-8 as Int) previously re-read itself forever
    val out = collection.mutable.ArrayBuffer.empty[Byte]
    out ++= "RIFF".getBytes; out ++= Array[Byte](100, 0, 0, 0); out ++= "WAVE".getBytes
    out ++= "JUNK".getBytes; out ++= Array[Byte](0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    out ++= new Array[Byte](64)
    assert(Wav.decode(out.toArray).isEmpty)
  }

  test("features: duration and RMS match closed forms; refusal on non-WAV") {
    val samples = tone(8000, 500, 0.5, 440.0)
    val a = Wav.decode(Wav.encode(8000, 1, samples)).get
    assert(a.durationMs == 500L)
    // RMS of A·sin ≈ A/√2
    assert(math.abs(a.rms - 0.5 / math.sqrt(2.0)) < 0.01, s"rms ${a.rms}")
    assert(Wav.decode("RIFFxxxxJUNK".getBytes).isEmpty)
    assert(Wav.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Wav.decode(graft.raster.Png.encodeGray(4, 4, new Array[Byte](16))).isEmpty)
  }
}
