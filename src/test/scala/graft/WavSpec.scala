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
