package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM WAV/PCM audio codec — the audio half of the multimodal
  * decode tier (previously fully stubbed; images went real in r10 via
  * Png/Jpeg). RIFF/WAVE container, integer PCM 8/16/24-bit, mono or
  * interleaved multi-channel; both directions. Conformance fixture:
  * the JDK's own `javax.sound.sampled` reads and writes WAV, so
  * WavSpec proves the triangle the same way JpegSpec does.
  */
object Wav {

  /** Interleaved integer PCM. `samples` hold native-domain values
    * (8-bit: 0..255; 16-bit: −32768..32767; 24-bit: signed). */
  final case class Audio(sampleRate: Int, channels: Int, bitsPerSample: Int, samples: Array[Int]) {
    def frames: Int = samples.length / channels
    def durationMs: Long = if (sampleRate == 0) 0L else frames.toLong * 1000 / sampleRate
    /** RMS over all channels, normalized to [-1, 1]. */
    def rms: Double = {
      if (samples.isEmpty) return 0.0
      val (scale, center) = bitsPerSample match {
        case 8 => (128.0, 128.0)
        case 16 => (32768.0, 0.0)
        case _ => (8388608.0, 0.0)
      }
      var sq = 0.0
      samples.foreach { s => val v = (s - center) / scale; sq += v * v }
      math.sqrt(sq / samples.length)
    }
  }

  private def leU16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Decode a RIFF/WAVE integer-PCM stream. None for anything else
    * (compressed formats, float PCM, malformed or truncated
    * containers — flag, don't abort the scan). */
  def decode(bytes: Array[Byte]): Option[Audio] =
    try decode0(bytes)
    catch { case _: Exception => None }

  private def decode0(bytes: Array[Byte]): Option[Audio] = {
    if (bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')) return None
    if (!(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
    var pos = 12
    var fmtOk = false
    var channels = 0
    var rate = 0
    var bits = 0
    var audio: Option[Audio] = None
    while (pos + 8 <= bytes.length && audio.isEmpty) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = leU32(bytes, pos + 4).toInt
      val body = pos + 8
      if (id == "fmt " && len >= 16) {
        val fmt = leU16(bytes, body)
        channels = leU16(bytes, body + 2)
        rate = leU32(bytes, body + 4).toInt
        bits = leU16(bytes, body + 14)
        // 1 = integer PCM; 0xFFFE = extensible (sub-format unchecked —
        // the JDK writes plain PCM this way for >2 channels)
        fmtOk = (fmt == 1 || fmt == 0xFFFE) && (bits == 8 || bits == 16 || bits == 24) &&
          channels >= 1 && rate >= 1
      } else if (id == "data") {
        if (!fmtOk) return None
        val bytesPer = bits / 8
        val n = math.min(len, bytes.length - body) / bytesPer
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val at = body + i * bytesPer
          out(i) = bits match {
            case 8 => bytes(at) & 0xff
            case 16 => (leU16(bytes, at) << 16) >> 16
            case _ => ((bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8) | (bytes(at + 2) << 16))
          }
          i += 1
        }
        audio = Some(Audio(rate, channels, bits, out))
      }
      pos = body + len + (len & 1) // RIFF chunks are word-aligned
    }
    audio
  }

  /** Encode interleaved 16-bit PCM as a canonical 44-byte-header WAV. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Int]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0)
    val dataLen = samples.length * 2
    val out = new ArrayBuffer[Byte](44 + dataLen)
    def str(s: String): Unit = out ++= s.getBytes("US-ASCII")
    def u16(v: Int): Unit = { out += v.toByte; out += (v >> 8).toByte }
    def u32(v: Long): Unit = (0 until 4).foreach(k => out += (v >> (8 * k)).toByte)
    str("RIFF"); u32(36L + dataLen); str("WAVE")
    str("fmt "); u32(16L)
    u16(1); u16(channels); u32(sampleRate.toLong)
    u32(sampleRate.toLong * channels * 2); u16(channels * 2); u16(16)
    str("data"); u32(dataLen.toLong)
    samples.foreach(u16)
    out.toArray
  }
}
