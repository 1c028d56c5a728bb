package graft.sources

/** BCJ2 — the 7z 4-stream x86 branch converter (coder id 0x0303011B),
  * the filter 7-Zip's default x86 chains emit. Unlike the single-
  * stream BCJ x86 filter, BCJ2 splits its output: `main` carries the
  * instruction bytes, converted CALL/JMP targets go to the `call` /
  * `jump` streams as 4-byte big-endian ABSOLUTE addresses, and a
  * LZMA-style binary range coder (`rc` stream) records one
  * convert/skip decision bit per branch opcode (probability context:
  * one slot for 0F 8x jcc, one for E9, 256 keyed by the preceding
  * byte for E8 — reference layout, 7zFormat/Methods docs).
  *
  * Decode semantics were extracted BEHAVIORALLY against libarchive's
  * independent BCJ2 reader (bsdtar 3.8.2 in-container): our encoder's
  * archives over an adversarial corpus (branch opcodes at every
  * alignment, tail boundaries, 0F-prefix chains) are extracted by
  * bsdtar and pinned byte-exact — see Bcj2Spec and
  * tools/gen_bcj2_pins.sh. A branch decision bit is coded for every
  * branch opcode whose 4 operand bytes fit inside the stream; opcodes
  * in the last 4 positions are plain bytes on both sides.
  *
  * Untrusted-bytes contract: malformed streams raise
  * [[SevenZip.SevenZipError]] via the caller, never raw index errors
  * (decode bounds every read). */
object Bcj2 {

  final class Bcj2Error(msg: String) extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw new Bcj2Error(msg)
  @inline private def req(c: Boolean, msg: => String): Unit = if (!c) fail(msg)

  // original 7-Zip Bcj2 layout: 256 E8 slots keyed by the preceding
  // byte, then one E9 slot, then one jcc slot
  private val NumProbs = 256 + 2
  private def initProbs(): Array[Int] = Array.fill(NumProbs)(1024)

  @inline private def isBranch(prev: Int, b: Int): Boolean =
    b == 0xe8 || b == 0xe9 || (prev == 0x0f && (b & 0xf0) == 0x80)
  @inline private def probIndex(prev: Int, b: Int): Int =
    if (b == 0xe8) prev else if (b == 0xe9) 256 else 257

  // ------------------------------------------------- LZMA binary range coder

  private final class RcEnc {
    private var low = 0L
    private var range = 0xffffffffL
    private var cacheSize = 1L
    private var cache = 0
    val out = new java.io.ByteArrayOutputStream()
    def encodeBit(probs: Array[Int], i: Int, bit: Int): Unit = {
      val bound = (range >>> 11) * probs(i)
      if (bit == 0) { range = bound; probs(i) += (2048 - probs(i)) >> 5 }
      else { low += bound; range -= bound; probs(i) -= probs(i) >> 5 }
      while (range < (1L << 24)) { range <<= 8; shiftLow() }
    }
    private def shiftLow(): Unit = {
      if (low < 0xff000000L || low > 0xffffffffL) {
        var c = cache
        var n = cacheSize
        while (n != 0) { out.write(((c + (low >>> 32)) & 0xff).toInt); c = 0xff; n -= 1 }
        cacheSize = 0
        cache = ((low >>> 24) & 0xff).toInt
      }
      cacheSize += 1
      low = (low << 8) & 0xffffffffL
    }
    def flush(): Unit = { var i = 0; while (i < 5) { shiftLow(); i += 1 } }
  }

  private final class RcDec(b: Array[Byte]) {
    private var p = 0
    private var range = 0xffffffffL
    private var code = 0L
    // first byte is the encoder's cache-init zero; then 4 code bytes
    req(b.length >= 5, "bcj2: rc stream shorter than its 5-byte init")
    p = 1
    locally { var i = 0; while (i < 4) { code = (code << 8) | next(); i += 1 } }
    private def next(): Int = {
      // the LZMA rc may read one lookahead byte past the payload; the
      // encoder's flush guarantees 5 tail bytes so a VALID stream never
      // gets here — hostile truncation reads as zero and fails the
      // caller's size checks rather than crashing
      val v = if (p < b.length) b(p) & 0xff else 0
      p += 1; v
    }
    def decodeBit(probs: Array[Int], i: Int): Int = {
      val bound = (range >>> 11) * probs(i)
      var bit = 0
      if (code < bound) { range = bound; probs(i) += (2048 - probs(i)) >> 5 }
      else { code -= bound; range -= bound; probs(i) -= probs(i) >> 5; bit = 1 }
      if (range < (1L << 24)) { range <<= 8; code = ((code << 8) | next()) & 0xffffffffL }
      bit
    }
  }

  // ------------------------------------------------------------------ encode

  /** Split `data` into the four BCJ2 streams (main, call, jump, rc).
    * Policy: convert every branch whose 4-byte operand fits — maximal
    * stream exercise; the decision bits make any policy decodable. */
  def encode(data: Array[Byte]): (Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
    val main = new java.io.ByteArrayOutputStream()
    val call = new java.io.ByteArrayOutputStream()
    val jump = new java.io.ByteArrayOutputStream()
    val probs = initProbs()
    val rc = new RcEnc
    var i = 0
    var prev = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      main.write(b)
      if (isBranch(prev, b)) {
        // a decision bit exists for EVERY scanned branch opcode —
        // including ones in the last 4 positions, where it is forced
        // to 0 (libarchive's decoder consumes a bit there; extracted
        // behaviorally, see Bcj2Spec). The convert/skip POLICY is
        // encoder-local (the bit records it) — deterministically skip
        // some convertible branches so both rc paths stay exercised.
        val pi = probIndex(prev, b)
        if (i + 5 <= data.length && ((i ^ b) % 5) != 0) {
          rc.encodeBit(probs, pi, 1)
          val rel = (data(i + 1) & 0xffL) | ((data(i + 2) & 0xffL) << 8) |
            ((data(i + 3) & 0xffL) << 16) | ((data(i + 4) & 0xffL) << 24)
          val abs = (rel + i + 5) & 0xffffffffL
          val dst = if (b == 0xe8) call else jump
          dst.write(((abs >>> 24) & 0xff).toInt); dst.write(((abs >>> 16) & 0xff).toInt)
          dst.write(((abs >>> 8) & 0xff).toInt); dst.write((abs & 0xff).toInt)
          prev = data(i + 4) & 0xff
          i += 5
        } else {
          rc.encodeBit(probs, pi, 0)
          prev = b
          i += 1
        }
      } else {
        prev = b
        i += 1
      }
    }
    rc.flush()
    (main.toByteArray, call.toByteArray, jump.toByteArray, rc.out.toByteArray)
  }

  // ------------------------------------------------------------------ decode

  /** Reassemble `outSize` bytes from the four streams. Every read is
    * bounded; any overrun or leftover-bearing stream fails loudly. */
  def decode(main: Array[Byte], call: Array[Byte], jump: Array[Byte], rc: Array[Byte],
      outSize: Int): Array[Byte] = {
    req(outSize >= 0, s"bcj2: output size $outSize")
    req(call.length % 4 == 0, s"bcj2: call stream length ${call.length} not a multiple of 4")
    req(jump.length % 4 == 0, s"bcj2: jump stream length ${jump.length} not a multiple of 4")
    val out = new Array[Byte](outSize)
    val probs = initProbs()
    val dec = new RcDec(rc)
    var mi = 0; var ci = 0; var ji = 0; var o = 0; var prev = 0
    while (o < outSize) {
      req(mi < main.length, "bcj2: main stream exhausted before output complete")
      val b = main(mi) & 0xff; mi += 1
      out(o) = b.toByte; o += 1
      if (isBranch(prev, b)) {
        if (dec.decodeBit(probs, probIndex(prev, b)) == 1) {
          req(o + 4 <= outSize, "bcj2: converted branch overruns the declared output size")
          val (src, si) = if (b == 0xe8) (call, ci) else (jump, ji)
          req(si + 4 <= src.length, s"bcj2: ${if (b == 0xe8) "call" else "jump"} stream exhausted")
          val abs = ((src(si) & 0xffL) << 24) | ((src(si + 1) & 0xffL) << 16) |
            ((src(si + 2) & 0xffL) << 8) | (src(si + 3) & 0xffL)
          if (b == 0xe8) ci += 4 else ji += 4
          val rel = (abs - (o + 4)) & 0xffffffffL
          out(o) = (rel & 0xff).toByte
          out(o + 1) = ((rel >>> 8) & 0xff).toByte
          out(o + 2) = ((rel >>> 16) & 0xff).toByte
          out(o + 3) = ((rel >>> 24) & 0xff).toByte
          prev = out(o + 3) & 0xff
          o += 4
        } else prev = b
      } else prev = b
    }
    req(mi == main.length, s"bcj2: ${main.length - mi} unconsumed main bytes")
    req(ci == call.length, s"bcj2: ${call.length - ci} unconsumed call bytes")
    req(ji == jump.length, s"bcj2: ${jump.length - ji} unconsumed jump bytes")
    out
  }
}
