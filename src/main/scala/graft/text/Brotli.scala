package graft.text

/** Brotli (RFC 7932) decoder — pure JVM, complete: stream/meta-block
  * headers (incl. metadata-skip and uncompressed blocks), simple and
  * complex prefix codes with the code-length code and its 16/17
  * repeat extensions, block types with switch commands for all three
  * categories, literal context modes (LSB6/MSB6/UTF8/Signed) and
  * context maps with run-length encoding + inverse move-to-front,
  * insert&copy commands (the 704-code alphabet), the distance ring
  * buffer with short codes, NPOSTFIX/NDIRECT distance coding, and
  * the appendix-A static dictionary with all 121 appendix-B word
  * transforms (ferment = UTF-8-aware uppercasing).
  *
  * Why it's front-door: brotli is the dominant HTTP content-encoding
  * in modern crawls — `Content-Encoding: br` response bodies inside
  * WARC members, and `.br` sidecars. The JDK has no brotli.
  *
  * Normative tables ship in [[BrotliTables]] (extracted from the
  * system libbrotli with documented provenance); BrotliSpec pins the
  * decoder byte-exactly against REAL libbrotlienc streams across
  * qualities 0..11, window sizes 10..24 and content classes including
  * dictionary-transform-heavy prose — a wrong table value or
  * convention fails those gates, not just a self-cycle.
  *
  * The JDK provides no brotli ENCODER either, and a quality encoder
  * is a research project; for round-trip cycles the q_brotli oracle
  * uses [[encodeRaw]], which emits valid brotli containing only
  * uncompressed meta-blocks (the RFC's storage escape hatch, like
  * deflate stored blocks) — real-encoder decode conformance comes
  * from the fixtures.
  */
object Brotli {

  final class BrotliError(msg: String) extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw new BrotliError(msg)

  // ------------------------------------------------------------------
  // bit reader: LSB-first within bytes
  // ------------------------------------------------------------------

  private final class Bits(b: Array[Byte], start: Int, end: Int) {
    var bytePos = start
    var bitPos = 0
    def bit(): Int = {
      if (bytePos >= end) fail("brotli: bitstream truncated")
      val v = (b(bytePos) >> bitPos) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
    def alignByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def readBytes(dst: Array[Byte], off: Int, n: Int): Unit = {
      if (bytePos + n > end) fail("brotli: raw bytes past input end")
      System.arraycopy(b, bytePos, dst, off, n)
      bytePos += n
    }
  }

  // ------------------------------------------------------------------
  // canonical prefix codes, read bit-serially (deflate-style codes:
  // MSB of the code first in the stream)
  // ------------------------------------------------------------------

  private val MaxLen = 15

  private final class Code(lengths: Array[Int]) {
    private val count = new Array[Int](MaxLen + 1)
    lengths.foreach { l => if (l > 0) { if (l > MaxLen) fail("brotli: code length > 15"); count(l) += 1 } }
    private val total = count.sum
    if (total == 0) fail("brotli: empty prefix code")
    private val single = if (total == 1) lengths.indexWhere(_ > 0) else -1
    private val firstCode = new Array[Int](MaxLen + 1)
    private val offset = new Array[Int](MaxLen + 1)
    private val sorted = new Array[Int](total)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= MaxLen) {
        firstCode(l) = code
        offset(l) = k
        code = (code + count(l)) << 1
        k += count(l)
        l += 1
      }
      if (total > 1 && code != (1 << (MaxLen + 1))) fail("brotli: prefix code not complete")
      val byLen = new Array[Int](MaxLen + 1)
      var s = 0
      while (s < lengths.length) {
        val len = lengths(s)
        if (len > 0) { sorted(offset(len) + byLen(len)) = s; byLen(len) += 1 }
        s += 1
      }
    }
    def read(br: Bits): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < MaxLen) {
        code = (code << 1) | br.bit()
        len += 1
        if (count(len) > 0 && code >= firstCode(len) && code - firstCode(len) < count(len))
          return sorted(offset(len) + code - firstCode(len))
      }
      fail("brotli: invalid prefix code bits")
    }
  }

  /** code-length-code symbol order (RFC 7932 §3.5) */
  private val ClOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** the RFC's fixed variable-length code for the code-length code's
    * own lengths, decoded bit by bit (b0 read first):
    * 00->0, 10->4, 01->3, 110->2, 1110->1, 1111->5 */
  private def readClLen(br: Bits): Int = {
    val b0 = br.bit(); val b1 = br.bit()
    (b0 | (b1 << 1)) match {
      case 0 => 0
      case 1 => 4 // b0=1,b1=0
      case 2 => 3 // b0=0,b1=1
      case _ =>
        if (br.bit() == 0) 2
        else if (br.bit() == 0) 1
        else 5
    }
  }

  /** read one prefix code over `alphabet` symbols (§3.4/3.5) */
  private def readCode(br: Bits, alphabet: Int): Code = {
    val hskip = br.bits(2)
    if (hskip == 1) {
      // simple code: 1..4 explicit symbols
      var abits = 0
      while ((1 << abits) < alphabet) abits += 1
      val nsym = br.bits(2) + 1
      val syms = Array.fill(nsym)(br.bits(abits))
      syms.foreach(s => if (s >= alphabet) fail("brotli: simple-code symbol out of range"))
      if (syms.distinct.length != nsym) fail("brotli: duplicate simple-code symbols")
      val lengths = new Array[Int](alphabet)
      nsym match {
        case 1 => lengths(syms(0)) = 1 // Code's single-symbol path reads 0 bits
        case 2 =>
          val s = syms.sorted
          lengths(s(0)) = 1; lengths(s(1)) = 1
        case 3 =>
          val rest = Array(syms(1), syms(2)).sorted
          lengths(syms(0)) = 1; lengths(rest(0)) = 2; lengths(rest(1)) = 2
        case _ =>
          if (br.bit() == 1) {
            val rest = Array(syms(2), syms(3)).sorted
            lengths(syms(0)) = 1; lengths(syms(1)) = 2; lengths(rest(0)) = 3; lengths(rest(1)) = 3
          } else {
            val s = syms.sorted
            s.foreach(lengths(_) = 2)
          }
      }
      new Code(lengths)
    } else {
      // complex code: code-length code first
      val clLens = new Array[Int](18)
      var space = 0
      var numCl = 0
      var i = hskip
      while (i < 18 && space < 32) {
        val l = readClLen(br)
        clLens(ClOrder(i)) = l
        if (l != 0) { space += 32 >> l; numCl += 1 }
        i += 1
      }
      if (space > 32) fail("brotli: code-length code over-subscribed")
      if (numCl == 1) {
        // the symbol lengths are all implied... (single CL symbol =>
        // that length repeats; handled by the general path below with
        // a 0-bit CL code)
      }
      val clCode = new Code(clLens)
      val lengths = new Array[Int](alphabet)
      var sym = 0
      var prevLen = 8
      var prevRepeatLen = 0
      var repeat = 0
      var space2 = 0
      var lastSymbol = -1 // 16 or 17 for the extension rule
      while (sym < alphabet && space2 < 32768) {
        val cl = clCode.read(br)
        if (cl < 16) {
          lengths(sym) = cl
          sym += 1
          if (cl != 0) { prevLen = cl; space2 += 32768 >> cl }
          lastSymbol = -1
          repeat = 0
        } else {
          val (extraBits, newLen) = if (cl == 16) (2, prevLen) else (3, 0)
          if (lastSymbol != cl) { repeat = 0; prevRepeatLen = newLen }
          val oldRepeat = repeat
          if (repeat > 0) repeat = (repeat - 2) << extraBits
          repeat += br.bits(extraBits) + 3
          val delta = repeat - oldRepeat
          if (sym + delta > alphabet) fail("brotli: repeat past alphabet end")
          var r = 0
          while (r < delta) {
            lengths(sym) = prevRepeatLen
            if (prevRepeatLen != 0) space2 += 32768 >> prevRepeatLen
            sym += 1
            r += 1
          }
          lastSymbol = cl
        }
      }
      if (space2 > 32768) fail("brotli: symbol lengths over-subscribed")
      val nz = lengths.count(_ > 0)
      if (nz == 1) {
        // 0-bit code: Code's single-symbol path reads no bits
        val l = new Array[Int](alphabet); l(lengths.indexWhere(_ > 0)) = 1
        new Code(l)
      } else {
        if (space2 != 32768) fail("brotli: symbol lengths under-subscribed")
        new Code(lengths)
      }
    }
  }

  // ------------------------------------------------------------------
  // small helpers
  // ------------------------------------------------------------------

  /** variable-length count in 1..256 (§9.2 NBLTYPES / NTREES) */
  private def readVarCount(br: Bits): Int =
    if (br.bit() == 0) 1
    else {
      val k = br.bits(3)
      if (k == 0) 2 else (1 << k) + 1 + br.bits(k)
    }

  /** context map (§7.3): `size` entries selecting among `ntrees`. */
  private def readContextMap(br: Bits, size: Int, ntrees: Int): Array[Int] = {
    val map = new Array[Int](size)
    if (ntrees == 1) return map
    val rleMax = if (br.bit() == 1) br.bits(4) + 1 else 0
    val code = readCode(br, rleMax + ntrees)
    var i = 0
    while (i < size) {
      val v = code.read(br)
      if (v == 0) { map(i) = 0; i += 1 }
      else if (v <= rleMax) {
        val reps = (1 << v) + br.bits(v)
        if (i + reps > size) fail("brotli: context-map zero run overflow")
        var r = 0
        while (r < reps) { map(i) = 0; i += 1; r += 1 }
      } else {
        map(i) = v - rleMax
        i += 1
      }
    }
    if (br.bit() == 1) {
      // inverse move-to-front
      val mtf = Array.tabulate(256)(identity)
      var j = 0
      while (j < size) {
        val idx = map(j)
        val v = mtf(idx)
        var k = idx
        while (k > 0) { mtf(k) = mtf(k - 1); k -= 1 }
        mtf(0) = v
        map(j) = v
        j += 1
      }
    }
    map
  }

  /** per-category block-switch state */
  private final class BlockState(val nTypes: Int, var typeCode: Code, var lenCode: Code, br: Bits) {
    var btype = 0
    // the reference's block-type ring starts (second-to-last, last) =
    // (1, 0): switch code 0 from the initial state selects type 1
    var secondLast = 1
    var last = 0
    var remaining: Long = 1L << 60 // single-type: never switches
    if (nTypes > 1) remaining = readBlockLen(br, lenCode)
    def switchNow(br2: Bits): Unit = {
      val code = typeCode.read(br2)
      val next =
        if (code == 0) secondLast
        else if (code == 1) (last + 1) % nTypes
        else code - 2
      if (next >= nTypes) fail("brotli: block type out of range")
      secondLast = last
      last = next
      btype = next
      remaining = readBlockLen(br2, lenCode)
    }
    def tick(br2: Bits): Unit = {
      if (nTypes > 1) {
        if (remaining == 0) switchNow(br2)
        remaining -= 1
      }
    }
  }

  private def readBlockLen(br: Bits, code: Code): Long = {
    val sym = code.read(br)
    BrotliTables.BlockLenBase(sym).toLong + br.bits(BrotliTables.BlockLenExtra(sym))
  }

  // ------------------------------------------------------------------
  // transforms (appendix B)
  // ------------------------------------------------------------------

  private def ferment(b: Array[Byte], pos: Int, end: Int): Int = {
    val c = b(pos) & 0xff
    if (c < 192) {
      if (c >= 'a' && c <= 'z') b(pos) = (c ^ 32).toByte
      pos + 1
    } else if (c < 224) {
      if (pos + 1 < end) b(pos + 1) = (b(pos + 1) ^ 32).toByte
      pos + 2
    } else {
      if (pos + 2 < end) b(pos + 2) = (b(pos + 2) ^ 5).toByte
      pos + 3
    }
  }

  /** Apply transform `id` to the dictionary word; returns the bytes. */
  private[text] def transformWord(word: Array[Byte], id: Int): Array[Byte] = {
    val (prefix, t, suffix) = BrotliTables.Transforms(id)
    val omitFirst = if (t >= 12 && t <= 20) t - 11 else 0
    val omitLast = if (t >= 1 && t <= 9) t else 0
    val from = math.min(omitFirst, word.length)
    val to = math.max(from, word.length - omitLast)
    val core = java.util.Arrays.copyOfRange(word, from, to)
    if (t == 10) { if (core.nonEmpty) ferment(core, 0, core.length) } // UppercaseFirst
    else if (t == 11) { var p = 0; while (p < core.length) p = ferment(core, p, core.length) } // UppercaseAll
    val pb = prefix.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val sb = suffix.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](pb.length + core.length + sb.length)
    System.arraycopy(pb, 0, out, 0, pb.length)
    System.arraycopy(core, 0, out, pb.length, core.length)
    System.arraycopy(sb, 0, out, pb.length + core.length, sb.length)
    out
  }

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  /** growable output with back-reference copies */
  private final class Out(hint: Int) {
    var buf = new Array[Byte](math.max(64, hint))
    var len = 0
    def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        var cap = buf.length * 2
        while (cap < len + n) cap *= 2
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    def add(v: Byte): Unit = { ensure(1); buf(len) = v; len += 1 }
    def addAll(src: Array[Byte], off: Int, n: Int): Unit = { ensure(n); System.arraycopy(src, off, buf, len, n); len += n }
    def copyBack(dist: Int, n: Int): Unit = {
      ensure(n)
      var i = 0
      while (i < n) { buf(len) = buf(len - dist); len += 1; i += 1 }
    }
    def p1: Int = if (len > 0) buf(len - 1) & 0xff else 0
    def p2: Int = if (len > 1) buf(len - 2) & 0xff else 0
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  def decode(data: Array[Byte]): Array[Byte] = decode(data, 0, data.length)

  def decode(data: Array[Byte], off: Int, length: Int): Array[Byte] =
    try decodeImpl(data, off, length)
    catch {
      case e: BrotliError => throw e
      case _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException |
          _: IndexOutOfBoundsException =>
        fail("brotli: malformed input (out-of-range field)")
    }

  private def decodeImpl(data: Array[Byte], off: Int, length: Int): Array[Byte] = {
    val br = new Bits(data, off, off + length)
    // WBITS (§9.1)
    val wbits =
      if (br.bit() == 0) 16
      else {
        val n = br.bits(3)
        if (n != 0) 17 + n
        else {
          val m = br.bits(3)
          if (m == 0) 17
          else if (m == 1) fail("brotli: reserved WBITS pattern")
          else 8 + m
        }
      }
    val window = (1 << wbits) - 16
    val out = new Out(length * 4)
    val ringInit = Array(4, 11, 15, 16) // most-recent first
    val ring = ringInit.clone()

    var isLast = false
    while (!isLast) {
      isLast = br.bit() == 1
      if (isLast && br.bit() == 1) {
        // ISLASTEMPTY
        return out.toArray
      }
      val mnibblesCode = br.bits(2)
      if (mnibblesCode == 3) {
        // metadata block: skip
        if (br.bit() != 0) fail("brotli: reserved metadata bit set")
        val mskipBytes = br.bits(2)
        val mskip =
          if (mskipBytes == 0) 0
          else {
            val v = br.bits(mskipBytes * 8)
            if (mskipBytes > 1 && (v >> ((mskipBytes - 1) * 8)) == 0) fail("brotli: metadata length not minimal")
            v + 1
          }
        br.alignByte()
        val dump = new Array[Byte](mskip)
        br.readBytes(dump, 0, mskip)
      } else {
        val mnibbles = 4 + mnibblesCode
        var mlen = 0
        var i = 0
        while (i < mnibbles) { mlen |= br.bits(4) << (4 * i); i += 1 }
        if (mnibbles > 4 && (mlen >> ((mnibbles - 1) * 4)) == 0) fail("brotli: MLEN not minimal")
        mlen += 1
        val isUncompressed = !isLast && br.bit() == 1
        if (isUncompressed) {
          br.alignByte()
          out.ensure(mlen)
          br.readBytes(out.buf, out.len, mlen)
          out.len += mlen
        } else {
          decodeMetaBlock(br, out, mlen, window, ring)
        }
      }
    }
    out.toArray
  }

  private def decodeMetaBlock(br: Bits, out: Out, mlen: Int, window: Int, ring: Array[Int]): Unit = {
    // block-type machinery per category; codes read only when >1 type
    def blockState(): BlockState = {
      val n = readVarCount(br)
      if (n == 1) new BlockState(1, null, null, br)
      else {
        val tc = readCode(br, n + 2)
        val lc = readCode(br, 26)
        new BlockState(n, tc, lc, br)
      }
    }
    val litBlocks = blockState()
    val cmdBlocks = blockState()
    val distBlocks = blockState()

    val npostfix = br.bits(2)
    val ndirect = br.bits(4) << npostfix
    val postfixMask = (1 << npostfix) - 1

    val cmodes = Array.fill(litBlocks.nTypes)(br.bits(2))

    val ntreesL = readVarCount(br)
    val cmapL = readContextMap(br, 64 * litBlocks.nTypes, ntreesL)
    val ntreesD = readVarCount(br)
    val cmapD = readContextMap(br, 4 * distBlocks.nTypes, ntreesD)

    val litCodes = Array.fill(ntreesL)(readCode(br, 256))
    val cmdCodes = Array.fill(cmdBlocks.nTypes)(readCode(br, 704))
    val distAlphabet = 16 + ndirect + (48 << npostfix)
    val distCodes = Array.fill(ntreesD)(readCode(br, distAlphabet))

    val lut = BrotliTables.ContextLut
    val dict = BrotliTables.Dictionary
    var produced = 0
    while (produced < mlen) {
      cmdBlocks.tick(br)
      val cmd = cmdCodes(cmdBlocks.btype).read(br)
      val cell = cmd >> 6
      val insCode = BrotliTables.CmdCellIns(cell) + ((cmd >> 3) & 7)
      val copyCode = BrotliTables.CmdCellCopy(cell) + (cmd & 7)
      val insLen = BrotliTables.InsBase(insCode) + br.bits(BrotliTables.InsExtra(insCode))
      var copyLen = BrotliTables.CopyBase(copyCode) + br.bits(BrotliTables.CopyExtra(copyCode))
      // literals
      var i = 0
      while (i < insLen) {
        litBlocks.tick(br)
        val mode = cmodes(litBlocks.btype)
        val ctx = (lut(mode * 512 + out.p1) & 0xff) | (lut(mode * 512 + 256 + out.p2) & 0xff)
        val tree = litCodes(cmapL(litBlocks.btype * 64 + ctx))
        out.add(tree.read(br).toByte)
        produced += 1
        i += 1
      }
      if (produced >= mlen) {
        if (produced > mlen) fail("brotli: insert run past MLEN")
        return
      }
      // distance
      var distance = 0
      var dcode = -1
      if (cmd < 128) {
        distance = ring(0) // implicit distance code 0: last distance
        dcode = 0
      } else {
        distBlocks.tick(br)
        val dctx = if (copyLen > 4) 3 else copyLen - 2
        val tree = distCodes(cmapD(distBlocks.btype * 4 + dctx))
        dcode = tree.read(br)
        if (dcode < 16) {
          distance = dcode match {
            case 0 => ring(0)
            case 1 => ring(1)
            case 2 => ring(2)
            case 3 => ring(3)
            case k if k < 10 =>
              val delta = Array(-1, 1, -2, 2, -3, 3)(k - 4)
              ring(0) + delta
            case k =>
              val delta = Array(-1, 1, -2, 2, -3, 3)(k - 10)
              ring(1) + delta
          }
          if (distance <= 0) fail("brotli: short-code distance not positive")
        } else if (dcode < 16 + ndirect) {
          distance = dcode - 16 + 1
        } else {
          val x = dcode - ndirect - 16
          val hcode = x >> npostfix
          val lcode = x & postfixMask
          val ndistbits = 1 + (hcode >> 1)
          val extra = br.bits(ndistbits)
          val offset = ((2 + (hcode & 1)) << ndistbits) - 4
          distance = ((offset + extra) << npostfix) + lcode + ndirect + 1
        }
      }
      val maxDistance = math.min(out.len, window)
      if (distance > maxDistance) {
        // static dictionary reference
        if (copyLen < 4 || copyLen > 24 || BrotliTables.DictSizeBits(copyLen) == 0)
          fail(s"brotli: dictionary copy length $copyLen unsupported")
        val address = distance - maxDistance - 1
        val ndbits = BrotliTables.DictSizeBits(copyLen)
        val index = address & ((1 << ndbits) - 1)
        val transformId = address >> ndbits
        if (transformId >= BrotliTables.Transforms.length) fail("brotli: transform id out of range")
        val base = BrotliTables.DictOffsets(copyLen) + index * copyLen
        val word = java.util.Arrays.copyOfRange(dict, base, base + copyLen)
        val t = transformWord(word, transformId)
        out.addAll(t, 0, t.length)
        produced += t.length
        if (produced > mlen) fail("brotli: dictionary word past MLEN")
        // dictionary references never update the distance ring
      } else {
        if (distance <= 0) fail("brotli: distance not positive")
        if (copyLen > mlen - produced) fail("brotli: copy run past MLEN")
        out.copyBack(distance, copyLen)
        produced += copyLen
        if (dcode != 0) {
          ring(3) = ring(2); ring(2) = ring(1); ring(1) = ring(0); ring(0) = distance
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // minimal "encoder": uncompressed meta-blocks (the RFC's stored form)
  // ------------------------------------------------------------------

  /** Valid brotli for `data` using uncompressed meta-blocks only —
    * the storage escape hatch every decoder must support. Real
    * compression stays on the real encoders; this drives cycles. */
  def encodeRaw(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0
    var nbits = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nbits
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i += 1
      }
    }
    def align(): Unit = if (nbits > 0) { out.write(cur); cur = 0; nbits = 0 }
    putBits(0, 1) // WBITS = 16
    var off = 0
    val chunk = 1 << 22 // < 2^24 (max MLEN with 6 nibbles)
    while (off < data.length) {
      val n = math.min(chunk, data.length - off)
      putBits(0, 1) // not last
      val nibbles = if (n <= (1 << 16)) 4 else if (n <= (1 << 20)) 5 else 6
      putBits(nibbles - 4, 2)
      var i = 0
      while (i < nibbles) { putBits(((n - 1) >> (4 * i)) & 0xf, 4); i += 1 }
      putBits(1, 1) // ISUNCOMPRESSED
      align()
      out.write(data, off, n)
      off += n
    }
    putBits(1, 1) // ISLAST
    putBits(1, 1) // ISLASTEMPTY
    align()
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // q_brotli — oracle-checked cycle
  // ------------------------------------------------------------------

  /** Per (event_type, id%16 shard): the shard's jsonl round-trips
    * through the brotli container ([[encodeRaw]] -> [[decode]], byte
    * equality required) and the same payload travels as a
    * `Content-Encoding: br` HTTP body through the WARC decode face
    * (also required) — the crawl-pipeline shape. Line counts and char
    * sums have closed forms the oracle states; shard sums add.
    * Real-ENCODER decode conformance is BrotliSpec's fixture gate. */
  def brotliQuery(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val cycle = udf { ids: Seq[Long] =>
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      val sorted = ids.sorted
      val lines = sorted.map(id => s"""{"id":$id,"w":"w${id % 89}"}""")
      val payload = lines.mkString("", "\n", "\n").getBytes(utf8)
      val enc = encodeRaw(payload)
      require(java.util.Arrays.equals(Brotli.decode(enc), payload), "brotli container cycle drift")
      val viaWarc = graft.sources.Warc.decodeContentEncoding(Map("Content-Encoding" -> "br"), enc)
      require(java.util.Arrays.equals(viaWarc, payload), "brotli WARC face drift")
      Seq(lines.length.toLong, lines.map(_.length.toLong).sum)
    }
    graft.Tables
      .eventsRaw(s, dir)
      .groupBy($"event_type", pmod($"event_id", lit(16L)).as("shard"))
      .agg(collect_list($"event_id").as("ids"))
      .transform(d => graft.operators.Spread.wide(d)) // conf-width, not a local-core literal
      .select($"event_type", cycle($"ids").as("a"))
      .groupBy($"event_type")
      .agg(sum($"a".getItem(0)).as("n_lines"), sum($"a".getItem(1)).as("line_chars"))
      .orderBy($"event_type")
  }
}
