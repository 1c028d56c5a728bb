package graft.multimodal

import java.security.MessageDigest
import scala.collection.mutable.ArrayBuffer

/** Pure-JVM FLAC codec — closes the "compressed audio" row of the
  * media tier (the reference delegates audio/video metadata to
  * external tooling; we decode natively, like Png/Jpeg/Wav).
  *
  * Implements the published FLAC format (RFC 9639 / xiph spec):
  *  - decoder: STREAMINFO + metadata-block walk, fixed & variable
  *    blocking, all four subframe types (CONSTANT, VERBATIM, FIXED
  *    0–4, LPC 1–32), wasted bits, Rice/Rice2 residual partitions
  *    incl. escape codes, all stereo decorrelation modes
  *    (left/side, right/side, mid/side), frame-header CRC-8 and
  *    frame CRC-16 verification, and the STREAMINFO MD5 check.
  *  - encoder: fixed-blocksize stream, per-channel best fixed
  *    predictor (order 0–4) with CONSTANT/VERBATIM fallbacks,
  *    single-partition Rice residuals, canonical CRCs and MD5.
  *
  * The encoder emits a strict subset of the format the decoder
  * accepts, so FlacSpec proves encode→decode == identity and the
  * decoder's LPC/partition/decorrelation paths are exercised by
  * hand-built streams.
  */
object Flac {

  final case class Stream(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      totalSamples: Long,
      samples: Array[Int], // interleaved
      md5Ok: Boolean
  ) {
    def frames: Int = if (channels == 0) 0 else samples.length / channels
  }

  // ---------------------------------------------------------------- CRC

  private val crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; k += 1 }
      t(i) = c
      i += 1
    }
    t
  }

  private val crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; k += 1 }
      t(i) = c
      i += 1
    }
    t
  }

  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = crc8Table((c ^ b(i)) & 0xff); i += 1 }
    c
  }

  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = crc16Table(((c >> 8) ^ (b(i) & 0xff)) & 0xff) ^ ((c << 8) & 0xffff); i += 1 }
    c
  }

  // ---------------------------------------------------------------- bit IO

  private final class BitWriter {
    val bytes = new ArrayBuffer[Byte](1 << 16)
    private var acc = 0L
    private var nbits = 0
    def write(v: Long, bits: Int): Unit = {
      var remaining = bits
      while (remaining > 0) {
        val take = math.min(8 - nbits, remaining)
        val shift = remaining - take
        val chunk = ((v >>> shift) & ((1L << take) - 1)).toInt
        acc = (acc << take) | chunk
        nbits += take
        remaining -= take
        if (nbits == 8) { bytes += acc.toByte; acc = 0; nbits = 0 }
      }
    }
    def writeUnary(q: Int): Unit = { var i = 0; while (i < q) { write(0, 1); i += 1 }; write(1, 1) }
    def align(): Unit = if (nbits > 0) write(0, 8 - nbits)
    def position: Int = bytes.length
  }

  private final class BitReader(val b: Array[Byte], var pos: Int) {
    private var bit = 0
    def aligned: Boolean = bit == 0
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def read(bits: Int): Long = {
      var out = 0L
      var remaining = bits
      while (remaining > 0) {
        if (pos >= b.length) throw new IllegalArgumentException("flac: truncated stream")
        val avail = 8 - bit
        val take = math.min(avail, remaining)
        val cur = (b(pos) & 0xff) >> (avail - take) & ((1 << take) - 1)
        out = (out << take) | cur
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
        remaining -= take
      }
      out
    }
    def readSigned(bits: Int): Int = { val v = read(bits); ((v << (64 - bits)).toLong >> (64 - bits)).toInt }
    def readUnary(): Int = { var q = 0; while (read(1) == 0L) q += 1; q }
    def hasMore(n: Int): Boolean = pos + n <= b.length
  }

  // ---------------------------------------------------------------- UTF-8-style number coding (frame header)

  private def utf8Encode(v: Long): Array[Byte] = {
    if (v < 0x80) return Array(v.toByte)
    var n = 2
    while (n <= 7 && v >= (1L << (if (n < 7) n * 5 + 1 else 36))) n += 1
    val out = new Array[Byte](n)
    var x = v
    var i = n - 1
    while (i >= 1) { out(i) = (0x80 | (x & 0x3f)).toByte; x >>= 6; i -= 1 }
    val lead = if (n < 7) ((0xff << (8 - n)) & 0xff) | x.toInt else 0xfe
    out(0) = lead.toByte
    out
  }

  private def utf8Decode(r: BitReader): Long = {
    val b0 = r.read(8).toInt
    if ((b0 & 0x80) == 0) return b0.toLong
    var n = 0
    var mask = 0x40
    while (mask != 0 && (b0 & mask) != 0) { n += 1; mask >>= 1 }
    if (n < 1 || n > 6) throw new IllegalArgumentException("flac: bad utf8 number")
    var v: Long = if (n == 6) 0L else (b0 & (0x3f >> n)).toLong
    var i = 0
    while (i < n) {
      val c = r.read(8).toInt
      if ((c & 0xc0) != 0x80) throw new IllegalArgumentException("flac: bad utf8 continuation")
      v = (v << 6) | (c & 0x3f)
      i += 1
    }
    v
  }

  // ---------------------------------------------------------------- fixed predictors

  /** Residuals for fixed order k over x (first k samples are warmup). */
  private def fixedResidual(x: Array[Int], order: Int): Array[Long] = {
    val n = x.length - order
    val out = new Array[Long](math.max(n, 0))
    var i = order
    while (i < x.length) {
      val r = order match {
        case 0 => x(i).toLong
        case 1 => x(i).toLong - x(i - 1)
        case 2 => x(i).toLong - 2L * x(i - 1) + x(i - 2)
        case 3 => x(i).toLong - 3L * x(i - 1) + 3L * x(i - 2) - x(i - 3)
        case _ => x(i).toLong - 4L * x(i - 1) + 6L * x(i - 2) - 4L * x(i - 3) + x(i - 4)
      }
      out(i - order) = r
      i += 1
    }
    out
  }

  private def fixedRestore(warm: Array[Int], res: Array[Long], order: Int): Array[Int] = {
    val n = warm.length + res.length
    val x = new Array[Int](n)
    System.arraycopy(warm, 0, x, 0, warm.length)
    var i = order
    while (i < n) {
      val p = order match {
        case 0 => 0L
        case 1 => x(i - 1).toLong
        case 2 => 2L * x(i - 1) - x(i - 2)
        case 3 => 3L * x(i - 1) - 3L * x(i - 2) + x(i - 3)
        case _ => 4L * x(i - 1) - 6L * x(i - 2) + 4L * x(i - 3) - x(i - 4)
      }
      x(i) = (res(i - order) + p).toInt
      i += 1
    }
    x
  }

  private def zigzag(v: Long): Long = if (v >= 0) v << 1 else (-v << 1) - 1
  private def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  private def bestRiceParam(res: Array[Long]): (Int, Long) = {
    var bestK = 0
    var bestBits = Long.MaxValue
    var k = 0
    while (k <= 30) {
      var bits = 0L
      var i = 0
      while (i < res.length && bits < bestBits) { bits += (zigzag(res(i)) >>> k) + 1 + k; i += 1 }
      if (bits < bestBits) { bestBits = bits; bestK = k }
      k += 1
    }
    (bestK, bestBits)
  }

  // ---------------------------------------------------------------- encode

  private val BlockSize = 4096

  /** Encode interleaved PCM as a FLAC stream (fixed blocksize,
    * independent channels, best fixed predictor per subframe). */
  def encode(sampleRate: Int, channels: Int, bitsPerSample: Int, samples: Array[Int]): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), "flac: sample rate out of range")
    require(channels >= 1 && channels <= 8, "flac: 1..8 channels")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, "flac: 4..32 bps")
    require(samples.length % channels == 0, "flac: partial frame")
    val totalFrames = samples.length / channels

    // MD5 of the raw little-endian sample stream (per spec)
    val md = MessageDigest.getInstance("MD5")
    val bytesPer = (bitsPerSample + 7) / 8
    val mdBuf = new Array[Byte](samples.length * bytesPer)
    var mi = 0
    samples.foreach { s =>
      var k = 0
      while (k < bytesPer) { mdBuf(mi) = (s >> (8 * k)).toByte; mi += 1; k += 1 }
    }
    val md5 = md.digest(mdBuf)

    val out = new ArrayBuffer[Byte](samples.length * bytesPer / 2 + 1024)
    out ++= "fLaC".getBytes("US-ASCII")
    // STREAMINFO, last metadata block
    val si = new BitWriter
    si.write(BlockSize, 16); si.write(BlockSize, 16) // min/max blocksize
    si.write(0, 24); si.write(0, 24)                 // min/max framesize unknown
    si.write(sampleRate, 20)
    si.write(channels - 1, 3)
    si.write(bitsPerSample - 1, 5)
    si.write(totalFrames.toLong, 36)
    val siBytes = si.bytes.toArray ++ md5
    out += 0x80.toByte; out += 0.toByte; out += 0.toByte; out += 34.toByte
    out ++= siBytes

    var frameNo = 0L
    var off = 0
    while (off < totalFrames) { // zero-sample stream legitimately has no frames
      val n = math.min(BlockSize, totalFrames - off)
      val w = new BitWriter
      // frame header: sync 0xFFF8 (fixed blocksize strategy)
      w.write(0xFFF8, 16)
      w.write(0x7, 4) // blocksize: 16-bit value-1 follows
      w.write(0x0, 4) // samplerate: from STREAMINFO
      w.write(channels - 1, 4) // independent channels
      w.write(bitsPerSample match {
        case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6; case 32 => 7; case _ => 0
      }, 3)
      w.write(0, 1)
      utf8Encode(frameNo).foreach(b => w.write(b & 0xffL, 8))
      w.write(n - 1, 16)
      val headEnd = w.position
      w.write(crc8(w.bytes.toArray, 0, headEnd), 8)

      var ch = 0
      while (ch < channels) {
        val x = new Array[Int](n)
        var i = 0
        while (i < n) { x(i) = samples((off + i) * channels + ch); i += 1 }
        writeSubframe(w, x, bitsPerSample)
        ch += 1
      }
      w.align()
      val all = w.bytes.toArray
      w.write(crc16(all, 0, all.length), 16)
      out ++= w.bytes
      frameNo += 1
      off += n
    }
    out.toArray
  }

  private def writeSubframe(w: BitWriter, x: Array[Int], bps: Int): Unit = {
    // constant?
    if (x.nonEmpty && x.forall(_ == x(0))) {
      w.write(0, 1); w.write(0, 6); w.write(0, 1)
      w.write(x(0).toLong & ((1L << bps) - 1), bps)
      return
    }
    // best fixed order vs verbatim
    val maxOrder = math.min(4, x.length - 1)
    var bestOrder = 0
    var bestBits = Long.MaxValue
    var bestK = 0
    var o = 0
    while (o <= maxOrder) {
      val res = fixedResidual(x, o)
      val (k, bits) = bestRiceParam(res)
      val total = bits + o.toLong * bps
      if (total < bestBits) { bestBits = total; bestOrder = o; bestK = k }
      o += 1
    }
    if (bestBits >= x.length.toLong * bps || bestK > 14) {
      // verbatim
      w.write(0, 1); w.write(1, 6); w.write(0, 1)
      x.foreach(v => w.write(v.toLong & ((1L << bps) - 1), bps))
      return
    }
    w.write(0, 1); w.write(8 | bestOrder, 6); w.write(0, 1) // FIXED, no wasted bits
    var i = 0
    while (i < bestOrder) { w.write(x(i).toLong & ((1L << bps) - 1), bps); i += 1 }
    val res = fixedResidual(x, bestOrder)
    w.write(0, 2) // 4-bit rice params
    w.write(0, 4) // partition order 0
    w.write(bestK, 4)
    var j = 0
    while (j < res.length) {
      val u = zigzag(res(j))
      w.writeUnary((u >>> bestK).toInt)
      if (bestK > 0) w.write(u & ((1L << bestK) - 1), bestK)
      j += 1
    }
  }

  // ---------------------------------------------------------------- decode

  /** Decode a FLAC stream; throws on malformed input. */
  def decode(bytes: Array[Byte]): Stream = {
    require(bytes.length >= 42 && bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C',
      "flac: bad magic")
    var pos = 4
    var sampleRate = 0
    var channels = 0
    var bps = 0
    var total = 0L
    var md5Exp: Array[Byte] = null
    var last = false
    var sawStreamInfo = false
    while (!last) {
      require(pos + 4 <= bytes.length, "flac: truncated metadata")
      val h = bytes(pos) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      val body = pos + 4
      require(body + len <= bytes.length, "flac: truncated metadata body")
      if (btype == 0) {
        require(len == 34, "flac: STREAMINFO must be 34 bytes")
        val r = new BitReader(bytes, body)
        r.read(16); r.read(16); r.read(24); r.read(24)
        sampleRate = r.read(20).toInt
        channels = r.read(3).toInt + 1
        bps = r.read(5).toInt + 1
        total = r.read(36)
        md5Exp = java.util.Arrays.copyOfRange(bytes, body + 18, body + 34)
        sawStreamInfo = true
      }
      pos = body + len
    }
    require(sawStreamInfo, "flac: missing STREAMINFO")
    require(sampleRate > 0, "flac: zero sample rate")

    val cap = if (total > 0 && total * channels < (1 << 24)) (total * channels).toInt else 1 << 16
    val out = new ArrayBuffer[Int](math.max(cap, 16))
    var decoded = 0L
    while ((total == 0L || decoded < total) && pos + 2 <= bytes.length) {
      val r = new BitReader(bytes, pos)
      val frameStart = pos
      val sync = r.read(14)
      require(sync == 0x3FFE, "flac: bad frame sync")
      r.read(1) // reserved
      r.read(1) // blocking strategy
      val bsCode = r.read(4).toInt
      val srCode = r.read(4).toInt
      val chCode = r.read(4).toInt
      val ssCode = r.read(3).toInt
      r.read(1)
      utf8Decode(r)
      val blockSize = bsCode match {
        case 0 => throw new IllegalArgumentException("flac: reserved blocksize code")
        case 1 => 192
        case c if c <= 5 => 576 << (c - 2)
        case 6 => r.read(8).toInt + 1
        case 7 => r.read(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match {
        case 12 => r.read(8)
        case 13 | 14 => r.read(16)
        case _ => ()
      }
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8; case 2 => 12; case 4 => 16; case 5 => 20; case 6 => 24; case 7 => 32
        case _ => throw new IllegalArgumentException("flac: reserved sample size code")
      }
      val headerEnd = r.pos
      require(r.aligned, "flac: header should be byte aligned before CRC")
      val crcGot = r.read(8).toInt
      require(crc8(bytes, frameStart, headerEnd) == crcGot, "flac: frame header CRC-8 mismatch")

      val nCh = if (chCode < 8) chCode + 1 else 2
      require(nCh == channels, "flac: channel count change mid-stream")
      val chans = new Array[Array[Int]](nCh)
      var ch = 0
      while (ch < nCh) {
        val extra = chCode match {
          case 8 => if (ch == 1) 1 else 0  // left/side
          case 9 => if (ch == 0) 1 else 0  // right/side
          case 10 => if (ch == 1) 1 else 0 // mid/side
          case _ => 0
        }
        chans(ch) = readSubframe(r, blockSize, frameBps + extra)
        ch += 1
      }
      r.align()
      val bodyEnd = r.pos
      val crc16Got = r.read(16).toInt
      require(crc16(bytes, frameStart, bodyEnd) == crc16Got, "flac: frame CRC-16 mismatch")
      pos = r.pos

      // undo stereo decorrelation
      chCode match {
        case 8 => // left/side: right = left - side
          var i = 0
          while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
        case 9 => // right/side: left = side + right
          var i = 0
          while (i < blockSize) { val rch = chans(1)(i); chans(1)(i) = rch; chans(0)(i) = chans(0)(i) + rch; i += 1 }
        case 10 => // mid/side
          var i = 0
          while (i < blockSize) {
            val side = chans(1)(i)
            var mid = chans(0)(i) << 1
            mid |= (side & 1)
            chans(0)(i) = (mid + side) >> 1
            chans(1)(i) = (mid - side) >> 1
            i += 1
          }
        case _ => ()
      }
      var i = 0
      while (i < blockSize) {
        var c = 0
        while (c < nCh) { out += chans(c)(i); c += 1 }
        i += 1
      }
      decoded += blockSize
      if (total == 0L && !new BitReader(bytes, pos).hasMore(2)) pos = bytes.length
    }

    val samples = out.toArray
    // MD5 verification over the little-endian raw stream
    val bytesPer = (bps + 7) / 8
    val md = MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](samples.length * bytesPer)
    var mi = 0
    samples.foreach { s =>
      var k = 0
      while (k < bytesPer) { buf(mi) = (s >> (8 * k)).toByte; mi += 1; k += 1 }
    }
    val md5Ok = (md5Exp.forall(_ == 0)) || java.util.Arrays.equals(md.digest(buf), md5Exp)
    Stream(sampleRate, channels, bps, total, samples, md5Ok)
  }

  private def readSubframe(r: BitReader, blockSize: Int, bps: Int): Array[Int] = {
    require(r.read(1) == 0, "flac: subframe padding bit set")
    val typ = r.read(6).toInt
    val wastedFlag = r.read(1)
    val wasted = if (wastedFlag == 1) r.readUnary() + 1 else 0
    val ebps = bps - wasted
    val x: Array[Int] =
      if (typ == 0) {
        val v = r.readSigned(ebps)
        Array.fill(blockSize)(v)
      } else if (typ == 1) {
        Array.fill(blockSize)(r.readSigned(ebps))
      } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) {
        val order = typ & 0x07
        val warm = Array.fill(order)(r.readSigned(ebps))
        val res = readResidual(r, blockSize, order)
        fixedRestore(warm, res, order)
      } else if ((typ & 0x20) != 0) {
        val order = (typ & 0x1f) + 1
        val warm = Array.fill(order)(r.readSigned(ebps))
        val precision = r.read(4).toInt + 1
        require(precision <= 15, "flac: invalid qlp precision")
        val shift = {
          val s = r.read(5)
          ((s << 59) >> 59).toInt // signed 5-bit; negative shifts are spec-invalid but fold to 0 below
        }
        val coefs = Array.fill(order)(r.readSigned(precision))
        val res = readResidual(r, blockSize, order)
        val out = new Array[Int](blockSize)
        System.arraycopy(warm, 0, out, 0, order)
        val sh = math.max(shift, 0)
        var i = order
        while (i < blockSize) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
          out(i) = (res(i - order) + (acc >> sh)).toInt
          i += 1
        }
        out
      } else throw new IllegalArgumentException(s"flac: reserved subframe type $typ")
    if (wasted > 0) { var i = 0; while (i < x.length) { x(i) = x(i) << wasted; i += 1 } }
    x
  }

  private def readResidual(r: BitReader, blockSize: Int, order: Int): Array[Long] = {
    val method = r.read(2).toInt
    require(method <= 1, "flac: reserved residual method")
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    val partOrder = r.read(4).toInt
    val parts = 1 << partOrder
    require(blockSize % parts == 0, "flac: blocksize not divisible by partitions")
    val res = new Array[Long](blockSize - order)
    var idx = 0
    var p = 0
    while (p < parts) {
      val count = (blockSize >> partOrder) - (if (p == 0) order else 0)
      require(count >= 0, "flac: predictor order exceeds first partition")
      val param = r.read(paramBits).toInt
      if (param == escape) {
        val raw = r.read(5).toInt
        var i = 0
        while (i < count) { res(idx) = if (raw == 0) 0L else r.readSigned(raw).toLong; idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary()
          val low = if (param > 0) r.read(param) else 0L
          res(idx) = unzigzag((q.toLong << param) | low)
          idx += 1; i += 1
        }
      }
      p += 1
    }
    res
  }
}

/** Spark query face for the audio codec family (kept out of the
  * codec object so the decode section reads top-to-bottom — the
  * H264Queries shape). */
object FlacQueries {
  /** q_flac: per event_type, deterministic 16-bit PCM derived from
    * the group's own event ids cycles through the FLAC codec
    * (lossless — the decoded sum must equal the oracle's direct
    * aggregate, and STREAMINFO MD5 must verify) and through both
    * G.711 WAV containers (lossy — bounded-quantization requires
    * in-task: |err| ≤ half the top-segment step) plus an IMA-ADPCM
    * container (block-leading samples exact by construction). One
    * group = one task-local codec cycle, the q_splat shape. */
  def audioCodecQuery(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val cycle = udf { ids: Seq[Long] =>
      val pcm = ids.sorted.map(id => ((id * 37) % 1024).toInt * 16 - 8192).toArray
      val dec = Flac.decode(Flac.encode(8000, 1, 16, pcm))
      require(dec.md5Ok, "flac md5 mismatch")
      require(dec.samples.toSeq == pcm.toSeq, "flac cycle not lossless")
      Seq(true, false).foreach { aLaw =>
        val g = Wav.decode(Wav.encodeG711(8000, 1, pcm, aLaw)).getOrElse(sys.error("g711 decode failed"))
        require(g.samples.length == pcm.length, "g711 length drift")
        var i = 0
        while (i < pcm.length) {
          require(math.abs(g.samples(i) - pcm(i)) <= 1024, s"g711 quantization out of bounds (aLaw=$aLaw)")
          i += 1
        }
      }
      val ad = Wav.decode(Wav.encodeImaAdpcm(8000, 1, pcm, samplesPerBlock = 249)).getOrElse(sys.error("adpcm decode failed"))
      require(ad.samples.length >= pcm.length && ad.samples(0) == pcm(0), "adpcm block structure broken")
      Seq(pcm.length.toLong, pcm.map(_.toLong).sum)
    }
    graft.Tables
      .eventsRaw(s, dir)
      .groupBy($"event_type")
      .agg(collect_list($"event_id").as("ids"))
      .select($"event_type", cycle($"ids").as("a"))
      .select(
        $"event_type",
        $"a".getItem(0).as("n_samples"),
        $"a".getItem(1).as("pcm_sum")
      )
      .orderBy($"event_type")
  }
}
