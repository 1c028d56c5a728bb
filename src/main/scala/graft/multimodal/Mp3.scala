package graft.multimodal

/** MP3 (MPEG-1/2/2.5 Layer III) metadata probe — frame-header walk
  * with ID3v2 skip and Xing/Info VBR handling. Like the reference's
  * media handling (exiv2/ffprobe-style), this reads structure only:
  * duration, bitrate, sample rate, channel mode, frame count. Full
  * Layer-III synthesis (huffman + IMDCT) is out of scope and
  * documented as such — payloads fall to the byte-plane pipeline.
  */
object Mp3 {

  final case class Meta(
      durationMs: Long,
      avgBitrateKbps: Int,
      sampleRate: Int,
      channels: Int,
      frames: Int,
      vbr: Boolean,
      id3v2Bytes: Int
  )

  private val BitrateV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BitrateV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val RateV1 = Array(44100, 48000, 32000)
  private val RateV2 = Array(22050, 24000, 16000)
  private val RateV25 = Array(11025, 12000, 8000)

  /** Parse one frame header at `i`; returns (frameLen, samples,
    * rate, bitrateKbps, channels) or null. */
  private def frame(b: Array[Byte], i: Int): Array[Int] = {
    if (i + 4 > b.length) return null
    val h = ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    if ((h >>> 21) != 0x7ff) return null
    val version = (h >>> 19) & 3 // 0=2.5, 2=MPEG2, 3=MPEG1 (1 reserved)
    val layer = (h >>> 17) & 3 // 1 = Layer III
    if (version == 1 || layer != 1) return null
    val brIdx = (h >>> 12) & 0xf
    val srIdx = (h >>> 10) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return null // free-format unsupported
    val padding = (h >>> 9) & 1
    val mode = (h >>> 6) & 3
    val mpeg1 = version == 3
    val bitrate = (if (mpeg1) BitrateV1L3 else BitrateV2L3)(brIdx)
    val rate = (version match { case 3 => RateV1; case 2 => RateV2; case _ => RateV25 })(srIdx)
    val samples = if (mpeg1) 1152 else 576
    val len = samples / 8 * bitrate * 1000 / rate + padding
    if (len < 4) return null
    Array(len, samples, rate, bitrate, if (mode == 3) 1 else 2)
  }

  /** ID3v2 tag length at the stream head (syncsafe), 0 if absent. */
  def id3v2Length(b: Array[Byte]): Int = {
    if (b.length < 10 || !(b(0) == 'I' && b(1) == 'D' && b(2) == '3')) return 0
    val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) | ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    10 + size + (if ((b(5) & 0x10) != 0) 10 else 0) // footer flag
  }

  /** Probe: skip ID3v2, sync to the first valid frame (requiring the
    * NEXT header to parse too — the standard false-sync guard), then
    * walk every frame. None for non-MP3 payloads. */
  def sniff(b: Array[Byte]): Option[Meta] = {
    if (b == null || b.length < 128) return None
    val id3 = id3v2Length(b)
    var start = id3
    var found = -1
    val searchEnd = math.min(b.length - 4, start + 4096)
    while (found < 0 && start < searchEnd) {
      val f = frame(b, start)
      if (f != null) {
        val nxt = start + f(0)
        if (nxt + 4 > b.length || frame(b, nxt) != null) found = start
        else start += 1
      } else start += 1
    }
    if (found < 0) return None

    var pos = found
    var frames = 0
    var samples = 0L
    var rate = 0
    var channels = 0
    var brSum = 0L
    val brSeen = collection.mutable.Set.empty[Int]
    var bad = false
    while (!bad && pos + 4 <= b.length) {
      val f = frame(b, pos)
      if (f == null) {
        // tolerate trailing junk/ID3v1 only — anything mid-stream ends the walk
        bad = true
      } else {
        frames += 1
        samples += f(1)
        rate = f(2)
        channels = f(4)
        brSum += f(3)
        brSeen += f(3)
        pos += f(0)
      }
    }
    if (frames == 0 || rate == 0) return None
    // Xing (VBR) / Info (LAME CBR) header at the FIXED side-info
    // offset of the first frame overrides the walked frame count
    val xing = findXing(b, found)
    val totalFrames = xing.map(_._1).getOrElse(frames)
    val xingVbr = xing.exists(_._2)
    val dur = (samples / frames) * totalFrames.toLong * 1000 / rate
    Some(Meta(dur, (brSum / frames).toInt, rate, channels, totalFrames, brSeen.size > 1 || xingVbr, id3))
  }

  /** (frameCount, isVbr) from a Xing/Info tag at the canonical offset
    * (4 + Layer-III side-info size: MPEG-1 17/32, MPEG-2/2.5 9/17
    * bytes for mono/other); 'Xing' marks VBR, 'Info' is LAME's CBR
    * stamp. No substring scanning — payload bytes can't spoof it. */
  private def findXing(b: Array[Byte], frameAt: Int): Option[(Int, Boolean)] = {
    val f = frame(b, frameAt)
    if (f == null) return None
    val h = ((b(frameAt) & 0xff) << 24) | ((b(frameAt + 1) & 0xff) << 16) |
      ((b(frameAt + 2) & 0xff) << 8) | (b(frameAt + 3) & 0xff)
    val mpeg1 = ((h >>> 19) & 3) == 3
    val mono = ((h >>> 6) & 3) == 3
    val sideInfo = if (mpeg1) { if (mono) 17 else 32 } else { if (mono) 9 else 17 }
    val i = frameAt + 4 + sideInfo
    if (i + 12 > b.length) return None
    val tag = new String(b, i, 4, "US-ASCII")
    if (tag != "Xing" && tag != "Info") return None
    val flags = ((b(i + 4) & 0xff) << 24) | ((b(i + 5) & 0xff) << 16) | ((b(i + 6) & 0xff) << 8) | (b(i + 7) & 0xff)
    if ((flags & 1) == 0) return None
    val n = ((b(i + 8) & 0xff) << 24) | ((b(i + 9) & 0xff) << 16) | ((b(i + 10) & 0xff) << 8) | (b(i + 11) & 0xff)
    if (n > 0) Some((n, tag == "Xing")) else None
  }

  /** Synthesize a structurally valid CBR stream (zeroed payloads) —
    * the round-trip fixture for the probe; real encoders' headers
    * have the same layout. */
  def syntheticCbr(frames: Int, mpeg1: Boolean = true, brIdx: Int = 9, srIdx: Int = 0,
                   stereo: Boolean = true): Array[Byte] = {
    require(frames > 0 && brIdx >= 1 && brIdx <= 14 && srIdx >= 0 && srIdx <= 2)
    val version = if (mpeg1) 3 else 2
    val bitrate = (if (mpeg1) BitrateV1L3 else BitrateV2L3)(brIdx)
    val rate = (if (mpeg1) RateV1 else RateV2)(srIdx)
    val samples = if (mpeg1) 1152 else 576
    val len = samples / 8 * bitrate * 1000 / rate // no padding
    val h = (0x7ff << 21) | (version << 19) | (1 << 17) | (1 << 16) |
      (brIdx << 12) | (srIdx << 10) | ((if (stereo) 0 else 3) << 6)
    val out = new Array[Byte](frames * len)
    var f = 0
    while (f < frames) {
      val at = f * len
      out(at) = (h >> 24).toByte; out(at + 1) = (h >> 16).toByte
      out(at + 2) = (h >> 8).toByte; out(at + 3) = h.toByte
      f += 1
    }
    out
  }
}
