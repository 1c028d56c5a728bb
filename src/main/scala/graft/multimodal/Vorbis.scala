package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Ogg Vorbis I — full decoder for the published specification plus a
  * minimal conforming encoder driving the round-trip specs and the
  * q_vorbis oracle cycle. Everything here derives from the public
  * Vorbis I specification; no fixed data tables are needed because
  * Vorbis ships its codebooks IN the setup header, the window and the
  * floor dB curve are closed-form, and the MDCT is a formula.
  *
  * Decoder surface: in-stream codebooks (ordered/unordered/sparse
  * length lists, lookup types 0/1/2 with the Vorbis custom float),
  * floor type 1 (posts, amplitude prediction, render_line, inverse dB
  * curve), residue types 0/1/2 (cascade passes, classword decode),
  * square-polar channel coupling, both blocksizes with window
  * switching (prev/next flags, asymmetric slopes), IMDCT +
  * overlap-add. Floor type 0 (LSP) is a named refusal — real-world
  * encoders stopped emitting it two decades ago and no fixture can
  * exist in this sandbox; the refusal is explicit, not a mis-decode.
  *
  * Encoder subset: mono/stereo, flat floor1 (zero partitions — the
  * two root posts), uniform-length codebooks with scalar/VQ lookups,
  * residue type 0, 1 or 2 (one class, one pass), optional square-polar
  * coupling (lossless in the quantized lattice), long+short blocks
  * with correct switching flags. The same absolute-position
  * window/TDAC machinery is shared by both directions, so the specs
  * prove reconstruction against quantization-error bounds only.
  */
object Vorbis {

  // ------------------------------------------------------------------
  // bit packing (Vorbis: LSB-first within bytes, fields LSB-first)
  // ------------------------------------------------------------------

  private[multimodal] final class BR(b: Array[Byte]) {
    private var bytePos = 0
    private var bitPos = 0
    def eof: Boolean = bytePos >= b.length
    def bit(): Int = {
      if (bytePos >= b.length) throw new IllegalArgumentException("vorbis: packet truncated")
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
    def bitsL(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v |= bit().toLong << i; i += 1 }
      v
    }
  }

  private[multimodal] final class BW {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def bits(v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= (((v >> i) & 1L).toInt) << nbits
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i += 1
      }
    }
    /** Huffman codeword: root decision first (MSB of the len-bit word). */
    def code(c: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bits((c >> i) & 1, 1); i -= 1 }
    }
    def result(): Array[Byte] = {
      if (nbits > 0) { out.write(cur); cur = 0; nbits = 0 }
      out.toByteArray
    }
  }

  private def ilog(x0: Int): Int = {
    var x = x0
    var n = 0
    while (x > 0) { n += 1; x >>= 1 }
    n
  }

  /** Vorbis custom 32-bit float: sign(1) exponent(10, bias 788)
    * mantissa(21). */
  def float32Unpack(x: Long): Double = {
    val mant = (x & 0x1fffff).toDouble
    val sgn = if ((x & 0x80000000L) != 0) -1.0 else 1.0
    val exp = ((x & 0x7fe00000L) >> 21).toInt
    sgn * mant * math.pow(2.0, exp - 788)
  }

  /** Inverse of [[float32Unpack]] for lattice values the encoder needs
    * (exact for value = m·2^e with m < 2^21). */
  def float32Pack(v: Double): Long = {
    if (v == 0.0) return 0L
    val sgn = if (v < 0) 0x80000000L else 0L
    var m = math.abs(v)
    var e = 788
    while (m < (1 << 20) && e > 0) { m *= 2; e -= 1 }
    while (m >= (1 << 21)) { m /= 2; e += 1 }
    sgn | (e.toLong << 21) | math.round(m)
  }

  /** floor1 inverse dB table — the spec's 256-entry table follows the
    * closed form 10^(-7·(255-i)/256) exactly (entry 0 = 1.0649863e-7,
    * entry 255 = 1.0). */
  val inverseDb: Array[Double] = Array.tabulate(256)(i => math.pow(10.0, -7.0 * (255 - i) / 256.0))

  // ------------------------------------------------------------------
  // codebooks
  // ------------------------------------------------------------------

  /** Vorbis codeword assignment: each used entry takes, in entry
    * order, the lowest available leaf of its length (the spec's tree
    * algorithm; mirrors the reference implementation). Returns the
    * MSB-first codeword per entry, -1 for unused. */
  def assignCodewords(lengths: Array[Int]): Array[Int] = {
    val n = lengths.length
    val words = Array.fill(n)(-1)
    val used = lengths.count(_ > 0)
    if (used == 0) return words
    if (used == 1) { // single-entry book: zero-bit codeword
      words(lengths.indexWhere(_ > 0)) = 0
      return words
    }
    val available = new Array[Long](33)
    var first = true
    var i = 0
    while (i < n) {
      val len = lengths(i)
      if (len > 0) {
        require(len <= 32, "vorbis: codeword length > 32")
        if (first) {
          words(i) = 0
          var j = 1
          while (j <= len) { available(j) = 1L << (32 - j); j += 1 }
          first = false
        } else {
          var z = len
          while (z > 0 && available(z) == 0) z -= 1
          require(z > 0, "vorbis: overspecified codebook")
          val res = available(z)
          available(z) = 0
          words(i) = (res >>> (32 - len)).toInt // MSB-aligned → len-bit word
          var y = len
          while (y > z) { available(y) = res + (1L << (32 - y)); y -= 1 }
        }
      }
      i += 1
    }
    words
  }

  final class Codebook(
      val dims: Int,
      val entries: Int,
      val lengths: Array[Int],
      val lookupType: Int,
      val vq: Array[Array[Double]]) { // per entry value vector (lookup 1/2), null for 0
    private val words = assignCodewords(lengths)
    private val single = {
      val used = (0 until entries).filter(lengths(_) > 0)
      if (used.length == 1) used.head else -1
    }
    private val byCode = {
      val m = new java.util.HashMap[java.lang.Long, Integer]()
      var i = 0
      while (i < entries) {
        if (lengths(i) > 0)
          m.put(java.lang.Long.valueOf((lengths(i).toLong << 32) | (words(i).toLong & 0xffffffffL)), Integer.valueOf(i))
        i += 1
      }
      m
    }
    def codeword(entry: Int): (Int, Int) = (words(entry), lengths(entry))
    def decode(br: BR): Int = {
      if (single >= 0) return single
      var code = 0L
      var len = 0
      while (len < 33) {
        code = (code << 1) | br.bit()
        len += 1
        val hit = byCode.get(java.lang.Long.valueOf((len.toLong << 32) | code))
        if (hit ne null) return hit.intValue
      }
      throw new IllegalArgumentException("vorbis: invalid codeword")
    }
  }

  private def lookup1Values(entries: Int, dims: Int): Int = {
    var r = 1
    while (math.pow(r + 1, dims) <= entries) r += 1
    r
  }

  private[multimodal] def readCodebook(br: BR): Codebook = {
    require(br.bits(24) == 0x564342, "vorbis: codebook sync lost") // "BCV"
    val dims = br.bits(16)
    val entries = br.bits(24)
    val lengths = new Array[Int](entries)
    if (br.bit() == 0) { // unordered
      val sparse = br.bit() == 1
      var i = 0
      while (i < entries) {
        if (sparse) { if (br.bit() == 1) lengths(i) = br.bits(5) + 1 }
        else lengths(i) = br.bits(5) + 1
        i += 1
      }
    } else { // ordered
      var cur = br.bits(5) + 1
      var i = 0
      while (i < entries) {
        val num = br.bits(ilog(entries - i))
        require(i + num <= entries, "vorbis: ordered lengths overflow")
        var k = 0
        while (k < num) { lengths(i + k) = cur; k += 1 }
        i += num
        cur += 1
      }
    }
    val lookupType = br.bits(4)
    require(lookupType <= 2, "vorbis: reserved codebook lookup type")
    var vq: Array[Array[Double]] = null
    if (lookupType != 0) {
      val minV = float32Unpack(br.bitsL(32))
      val delta = float32Unpack(br.bitsL(32))
      val valueBits = br.bits(4) + 1
      val seqP = br.bit() == 1
      val count = if (lookupType == 1) lookup1Values(entries, dims) else entries * dims
      val mult = Array.fill(count)(br.bits(valueBits))
      vq = Array.tabulate(entries) { e =>
        val v = new Array[Double](dims)
        var last = 0.0
        if (lookupType == 1) {
          var divisor = 1
          var d = 0
          while (d < dims) {
            val off = (e / divisor) % count
            v(d) = mult(off) * delta + minV + last
            if (seqP) last = v(d)
            divisor *= count
            d += 1
          }
        } else {
          var d = 0
          while (d < dims) {
            v(d) = mult(e * dims + d) * delta + minV + last
            if (seqP) last = v(d)
            d += 1
          }
        }
        v
      }
    }
    new Codebook(dims, entries, lengths, lookupType, vq)
  }

  // ------------------------------------------------------------------
  // setup structures
  // ------------------------------------------------------------------

  private[multimodal] final case class Floor1(
      partitions: Int,
      classList: Array[Int],
      classDims: Array[Int],
      classSubs: Array[Int],
      classMaster: Array[Int],
      subBooks: Array[Array[Int]],
      multiplier: Int,
      xList: Array[Int])

  private[multimodal] final case class Residue(
      rType: Int,
      begin: Int,
      end: Int,
      partSize: Int,
      classifications: Int,
      classbook: Int,
      cascade: Array[Int],
      books: Array[Array[Int]])

  private[multimodal] final case class Mapping(
      couplingMag: Array[Int],
      couplingAng: Array[Int],
      mux: Array[Int],
      submapFloor: Array[Int],
      submapResidue: Array[Int])

  private[multimodal] final case class Mode(blockFlag: Int, mapping: Int)

  private[multimodal] final case class Setup(
      channels: Int,
      sampleRate: Int,
      blocksizes: Array[Int],
      books: Array[Codebook],
      floors: Array[Floor1],
      residues: Array[Residue],
      mappings: Array[Mapping],
      modes: Array[Mode])

  // ------------------------------------------------------------------
  // window + MDCT
  // ------------------------------------------------------------------

  /** Vorbis window slope y = sin(π/2 · sin²(π(x+0.5)/(2n))) over a
    * slope of length n. */
  private def slope(x: Int, n: Int): Double = {
    val s = math.sin(math.Pi * (x + 0.5) / (2.0 * n))
    math.sin(math.Pi / 2.0 * s * s)
  }

  /** Full window for a block of size n with the given slope sizes
    * (leftN/rightN = half the OVERLAP with the neighbour block;
    * n0/2 when the neighbour is short, n/2 when long). Slope centers
    * sit at n/4 and 3n/4. */
  private[multimodal] def window(n: Int, leftN: Int, rightN: Int): Array[Double] = {
    val w = new Array[Double](n)
    val leftStart = n / 4 - leftN / 2
    val rightEnd = 3 * n / 4 + rightN / 2
    var i = 0
    while (i < n) {
      w(i) =
        if (i < leftStart) 0.0
        else if (i < leftStart + leftN) slope(i - leftStart, leftN)
        else if (i < rightEnd - rightN) 1.0
        else if (i < rightEnd) slope(rightEnd - 1 - i, rightN) // falling mirror
        else 0.0
      i += 1
    }
    w
  }

  /** IMDCT: y[j] = Σ_k X[k]·cos(π/(2n)·(2j+1+n/2)·(2k+1)), n samples
    * from n/2 coefficients (direct form — test-scale blocks). */
  private[multimodal] def imdct(spec: Array[Double], n: Int): Array[Double] = {
    val out = new Array[Double](n)
    val n2 = n / 2
    var j = 0
    while (j < n) {
      var acc = 0.0
      var k = 0
      while (k < n2) {
        acc += spec(k) * math.cos(math.Pi / (2.0 * n) * (2 * j + 1 + n2) * (2 * k + 1))
        k += 1
      }
      out(j) = acc
      j += 1
    }
    out
  }

  /** Forward MDCT with the TDAC-complementary normalization 4/n (the
    * encoder-side scale that makes imdct→window→overlap-add the exact
    * inverse under the Princen-Bradley condition). */
  private[multimodal] def mdct(frame: Array[Double], n: Int): Array[Double] = {
    val n2 = n / 2
    val out = new Array[Double](n2)
    var k = 0
    while (k < n2) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        acc += frame(j) * math.cos(math.Pi / (2.0 * n) * (2 * j + 1 + n2) * (2 * k + 1))
        j += 1
      }
      out(k) = acc * 4.0 / n
      k += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // floor1 decode
  // ------------------------------------------------------------------

  private val F1Range = Array(256, 128, 86, 64)

  private def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int, x: Int): Int = {
    val dy = y1 - y0
    val adx = x1 - x0
    val err = math.abs(dy) * (x - x0)
    val off = err / adx
    if (dy < 0) y0 - off else y0 + off
  }

  private def renderLine(x0: Int, y0: Int, x1: Int, y1: Int, v: Array[Int]): Unit = {
    val dy = y1 - y0
    val adx = x1 - x0
    var ady = math.abs(dy)
    val base = dy / adx
    val sy = if (dy < 0) base - 1 else base + 1
    ady -= math.abs(base) * adx
    var x = x0
    var y = y0
    var err = 0
    if (x0 < v.length) v(x0) = y0
    x = x0 + 1
    while (x < x1) {
      err += ady
      if (err >= adx) { err -= adx; y += sy } else y += base
      if (x < v.length) v(x) = y
      x += 1
    }
  }

  /** Decode one channel's floor; None = unused (silent) channel. */
  private[multimodal] def decodeFloor1(br: BR, f: Floor1, books: Array[Codebook], n2: Int): Option[Array[Double]] = {
    if (br.bit() == 0) return None
    val range = F1Range(f.multiplier - 1)
    val posts = f.xList.length
    val y = new Array[Int](posts)
    y(0) = br.bits(ilog(range - 1))
    y(1) = br.bits(ilog(range - 1))
    var offset = 2
    var p = 0
    while (p < f.partitions) {
      val cls = f.classList(p)
      val cdim = f.classDims(cls)
      val cbits = f.classSubs(cls)
      val csub = (1 << cbits) - 1
      var cval = 0
      if (cbits > 0) cval = books(f.classMaster(cls)).decode(br)
      var j = 0
      while (j < cdim) {
        val book = f.subBooks(cls)(cval & csub)
        cval >>= cbits
        y(offset + j) = if (book >= 0) books(book).decode(br) else 0
        j += 1
      }
      offset += cdim
      p += 1
    }
    // amplitude prediction (step 2)
    val finalY = new Array[Int](posts)
    val step2 = new Array[Boolean](posts)
    step2(0) = true; step2(1) = true
    finalY(0) = y(0); finalY(1) = y(1)
    var i = 2
    while (i < posts) {
      // low/high neighbours among already-decoded posts
      var lo = 0; var hi = 1
      var k = 0
      while (k < i) {
        if (f.xList(k) < f.xList(i) && f.xList(k) >= f.xList(lo)) lo = k
        if (f.xList(k) > f.xList(i) && f.xList(k) <= f.xList(hi)) hi = k
        k += 1
      }
      val predicted = renderPoint(f.xList(lo), finalY(lo), f.xList(hi), finalY(hi), f.xList(i))
      val v = y(i)
      val highroom = range - predicted
      val lowroom = predicted
      val room = 2 * math.min(highroom, lowroom)
      if (v != 0) {
        step2(lo) = true; step2(hi) = true; step2(i) = true
        finalY(i) =
          if (v >= room) {
            if (highroom > lowroom) v - lowroom + predicted
            else predicted - v + highroom - 1
          } else if (v % 2 == 1) predicted - (v + 1) / 2
          else predicted + v / 2
      } else {
        step2(i) = false
        finalY(i) = predicted
      }
      i += 1
    }
    // curve synthesis over sorted X
    val order = f.xList.indices.sortBy(f.xList(_)).toArray
    val lowRes = new Array[Int](n2)
    var hx = 0
    var lx = 0
    var ly = finalY(order(0)) * f.multiplier
    var oi = 1
    while (oi < order.length) {
      val idx = order(oi)
      if (step2(idx)) {
        hx = f.xList(idx)
        val hy = finalY(idx) * f.multiplier
        if (lx < n2) renderLine(lx, ly, math.min(hx, n2), hy, lowRes)
        lx = hx
        ly = hy
      }
      oi += 1
    }
    if (hx < n2 && lx < n2) {
      var x = lx
      while (x < n2) { lowRes(x) = ly; x += 1 }
    }
    Some(Array.tabulate(n2)(k => inverseDb(math.max(0, math.min(255, lowRes(k))))))
  }

  // ------------------------------------------------------------------
  // residue decode
  // ------------------------------------------------------------------

  /** Decode a residue for `vectors` (null slot = do-not-decode), each
    * of size `size` (type 2 interleaves internally). */
  private[multimodal] def decodeResidue(br: BR, r: Residue, books: Array[Codebook],
                            vectors: Array[Array[Double]], size: Int): Unit = {
    if (r.rType == 2) {
      if (vectors.forall(_ == null)) return
      val joined = new Array[Double](size * vectors.length)
      decodeResidueInner(br, r, books, Array(joined), size * vectors.length)
      var ch = 0
      while (ch < vectors.length) {
        if (vectors(ch) != null) {
          var i = 0
          while (i < size) { vectors(ch)(i) = joined(i * vectors.length + ch); i += 1 }
        }
        ch += 1
      }
    } else decodeResidueInner(br, r, books, vectors, size)
  }

  private def decodeResidueInner(br: BR, r: Residue, books: Array[Codebook],
                                 vectors: Array[Array[Double]], size: Int): Unit = {
    val begin = math.min(r.begin, size)
    val end = math.min(r.end, size)
    val n = end - begin
    if (n <= 0) return
    val classbook = books(r.classbook)
    val cpc = classbook.dims // classwords per codeword
    val partitionsToRead = n / r.partSize
    val nch = vectors.length
    val classif = Array.ofDim[Int](nch, partitionsToRead + cpc)
    var pass = 0
    while (pass < 8) {
      var partition = 0
      while (partition < partitionsToRead) {
        if (pass == 0) {
          var ch = 0
          while (ch < nch) {
            if (vectors(ch) != null) {
              var temp = classbook.decode(br)
              var i = cpc - 1
              while (i >= 0) {
                classif(ch)(partition + i) = temp % r.classifications
                temp /= r.classifications
                i -= 1
              }
            }
            ch += 1
          }
        }
        var i = 0
        while (i < cpc && partition < partitionsToRead) {
          var ch = 0
          while (ch < nch) {
            if (vectors(ch) != null) {
              val vq = classif(ch)(partition)
              if ((r.cascade(vq) & (1 << pass)) != 0) {
                val book = books(r.books(vq)(pass))
                val offset = begin + partition * r.partSize
                if (r.rType == 0) {
                  val step = r.partSize / book.dims
                  var s = 0
                  while (s < step) {
                    val v = book.vq(book.decode(br))
                    var d = 0
                    while (d < book.dims) { vectors(ch)(offset + s + d * step) += v(d); d += 1 }
                    s += 1
                  }
                } else { // type 1 (and the joined type-2 vector)
                  var k = 0
                  while (k < r.partSize) {
                    val v = book.vq(book.decode(br))
                    var d = 0
                    while (d < book.dims) { vectors(ch)(offset + k) += v(d); k += 1; d += 1 }
                  }
                }
              }
            }
            ch += 1
          }
          partition += 1
          i += 1
        }
      }
      pass += 1
    }
  }

  // ------------------------------------------------------------------
  // header parse
  // ------------------------------------------------------------------

  private def checkHeader(p: Array[Byte], t: Int): BR = {
    require(p.length > 7 && (p(0) & 0xff) == t && new String(p, 1, 6, "US-ASCII") == "vorbis",
      s"vorbis: bad header packet type $t")
    val br = new BR(p)
    br.bits(8) // type
    (0 until 6).foreach(_ => br.bits(8))
    br
  }

  private[multimodal] def parseSetup(idPacket: Array[Byte], setupPacket: Array[Byte]): Setup = {
    val id = checkHeader(idPacket, 1)
    require(id.bits(32) == 0, "vorbis: unsupported version")
    val channels = id.bits(8)
    val rate = id.bits(32)
    require(channels >= 1 && channels <= 8 && rate > 0, "vorbis: bad id header")
    id.bits(32); id.bits(32); id.bits(32) // bitrates
    val bs0 = 1 << id.bits(4)
    val bs1 = 1 << id.bits(4)
    require(bs0 >= 64 && bs1 >= bs0 && bs1 <= 8192, "vorbis: bad blocksizes")
    require(id.bit() == 1, "vorbis: id framing bit")

    val br = checkHeader(setupPacket, 5)
    val books = Array.fill(br.bits(8) + 1)(readCodebook(br))
    val timeCount = br.bits(6) + 1
    (0 until timeCount).foreach(_ => require(br.bits(16) == 0, "vorbis: nonzero time transform"))
    val floors = Array.fill(br.bits(6) + 1) {
      val ftype = br.bits(16)
      require(ftype == 1, s"vorbis: floor type $ftype unsupported (floor0/LSP is a documented refusal)")
      val partitions = br.bits(5)
      val classList = Array.fill(partitions)(br.bits(4))
      val maxClass = if (partitions == 0) -1 else classList.max
      val classDims = new Array[Int](maxClass + 1)
      val classSubs = new Array[Int](maxClass + 1)
      val classMaster = new Array[Int](maxClass + 1)
      val subBooks = new Array[Array[Int]](maxClass + 1)
      var c = 0
      while (c <= maxClass) {
        classDims(c) = br.bits(3) + 1
        classSubs(c) = br.bits(2)
        if (classSubs(c) > 0) classMaster(c) = br.bits(8)
        subBooks(c) = Array.fill(1 << classSubs(c))(br.bits(8) - 1)
        c += 1
      }
      val multiplier = br.bits(2) + 1
      val rangeBits = br.bits(4)
      val xs = ArrayBuffer(0, 1 << rangeBits)
      classList.foreach { cls =>
        (0 until classDims(cls)).foreach(_ => xs += br.bits(rangeBits))
      }
      require(xs.distinct.length == xs.length, "vorbis: duplicate floor1 X")
      Floor1(partitions, classList, classDims, classSubs, classMaster, subBooks, multiplier, xs.toArray)
    }
    val residues = Array.fill(br.bits(6) + 1) {
      val rType = br.bits(16)
      require(rType <= 2, "vorbis: reserved residue type")
      val begin = br.bits(24)
      val end = br.bits(24)
      val partSize = br.bits(24) + 1
      val classifications = br.bits(6) + 1
      val classbook = br.bits(8)
      require(classbook < books.length, "vorbis: residue classbook out of range")
      val cascade = Array.fill(classifications) {
        val low = br.bits(3)
        val high = if (br.bit() == 1) br.bits(5) else 0
        (high << 3) | low
      }
      val rbooks = Array.tabulate(classifications) { c =>
        Array.tabulate(8) { pass =>
          if ((cascade(c) & (1 << pass)) != 0) {
            val b = br.bits(8)
            require(b < books.length && books(b).lookupType != 0, "vorbis: residue book invalid")
            b
          } else -1
        }
      }
      Residue(rType, begin, end, partSize, classifications, classbook, cascade, rbooks)
    }
    val mappings = Array.fill(br.bits(6) + 1) {
      require(br.bits(16) == 0, "vorbis: reserved mapping type")
      val submaps = if (br.bit() == 1) br.bits(4) + 1 else 1
      var magA = Array.empty[Int]
      var angA = Array.empty[Int]
      if (br.bit() == 1) {
        val steps = br.bits(8) + 1
        magA = new Array[Int](steps)
        angA = new Array[Int](steps)
        var s = 0
        while (s < steps) {
          magA(s) = br.bits(ilog(channels - 1))
          angA(s) = br.bits(ilog(channels - 1))
          require(magA(s) != angA(s) && magA(s) < channels && angA(s) < channels, "vorbis: bad coupling")
          s += 1
        }
      }
      require(br.bits(2) == 0, "vorbis: mapping reserved bits")
      val mux =
        if (submaps > 1) Array.fill(channels)(br.bits(4))
        else new Array[Int](channels)
      val sFloor = new Array[Int](submaps)
      val sRes = new Array[Int](submaps)
      var s = 0
      while (s < submaps) {
        br.bits(8) // time config (unused)
        sFloor(s) = br.bits(8)
        sRes(s) = br.bits(8)
        require(sFloor(s) < floors.length && sRes(s) < residues.length, "vorbis: submap out of range")
        s += 1
      }
      Mapping(magA, angA, mux, sFloor, sRes)
    }
    val modes = Array.fill(br.bits(6) + 1) {
      val blockFlag = br.bit()
      require(br.bits(16) == 0 && br.bits(16) == 0, "vorbis: reserved mode window/transform")
      val mapping = br.bits(8)
      require(mapping < mappings.length, "vorbis: mode mapping out of range")
      Mode(blockFlag, mapping)
    }
    require(br.bit() == 1, "vorbis: setup framing bit")
    Setup(channels, rate, Array(bs0, bs1), books, floors, residues, mappings, modes)
  }

  // ------------------------------------------------------------------
  // stream decode
  // ------------------------------------------------------------------

  /** Reassemble logical packets from an Ogg physical stream (lacing,
    * continued packets). */
  def oggPackets(b: Array[Byte]): Seq[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var carry = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos + 27 <= b.length && b(pos) == 'O' && b(pos + 1) == 'g' && b(pos + 2) == 'g' && b(pos + 3) == 'S') {
      val nseg = b(pos + 26) & 0xff
      var bodyLen = 0
      var s = 0
      while (s < nseg) { bodyLen += b(pos + 27 + s) & 0xff; s += 1 }
      var at = pos + 27 + nseg
      require(at + bodyLen <= b.length, "ogg: truncated page")
      s = 0
      while (s < nseg) {
        val l = b(pos + 27 + s) & 0xff
        carry.write(b, at, l)
        at += l
        if (l < 255) { out += carry.toByteArray; carry = new java.io.ByteArrayOutputStream() }
        s += 1
      }
      pos = at
    }
    out.result()
  }

  final case class Decoded(sampleRate: Int, channels: Int, samples: Array[Array[Double]])

  def isVorbis(b: Array[Byte]): Boolean =
    b != null && b.length > 40 && b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S' && {
      try oggPackets(b).headOption.exists(p =>
        p.length > 7 && (p(0) & 0xff) == 1 && new String(p, 1, 6, "US-ASCII") == "vorbis")
      catch { case _: Exception => false }
    }

  /** Decode a whole Ogg Vorbis stream to per-channel float PCM. */
  def decode(bytes: Array[Byte]): Decoded = {
    val packets = oggPackets(bytes)
    require(packets.length >= 4, "vorbis: need id/comment/setup + audio packets")
    checkHeader(packets(1), 3) // comment header must be present and typed
    val su = parseSetup(packets(0), packets(2))
    val nch = su.channels

    // absolute-position overlap-add accumulator: block k sits at
    // start s_k with its left slope center (at n/4) coinciding with
    // block k-1's right slope center (at 3n/4) — the TDAC alignment
    // both directions share. The first block's left slope center sits
    // at absolute 0.
    val est = packets.drop(3).length * su.blocksizes(1) + su.blocksizes(1) * 2
    val acc = Array.fill(nch)(new Array[Double](est))
    var rightCenter = Long.MinValue // absolute right slope center of the previous block

    packets.drop(3).foreach { pk =>
      val br = new BR(pk)
      if (br.bit() == 0) { // audio packet
        val modeBits = ilog(su.modes.length - 1)
        val mode = su.modes(if (modeBits > 0) br.bits(modeBits) else 0)
        val n = su.blocksizes(mode.blockFlag)
        val n2 = n / 2
        var pFlag = 1
        var nFlag = 1
        if (mode.blockFlag == 1) { pFlag = br.bit(); nFlag = br.bit() }
        val mp = su.mappings(mode.mapping)

        // floors
        val floorsOut = new Array[Array[Double]](nch)
        var ch = 0
        while (ch < nch) {
          val f = su.floors(mp.submapFloor(mp.mux(ch)))
          floorsOut(ch) = decodeFloor1(br, f, su.books, n2).orNull
          ch += 1
        }
        // zero-floor propagation through coupling: if one half of a
        // coupled pair is audible, both decode
        var s = 0
        while (s < mp.couplingMag.length) {
          if (floorsOut(mp.couplingMag(s)) != null || floorsOut(mp.couplingAng(s)) != null) {
            if (floorsOut(mp.couplingMag(s)) == null) floorsOut(mp.couplingMag(s)) = new Array[Double](n2)
            if (floorsOut(mp.couplingAng(s)) == null) floorsOut(mp.couplingAng(s)) = new Array[Double](n2)
          }
          s += 1
        }
        // residues per submap
        val spectra = new Array[Array[Double]](nch)
        var sm = 0
        while (sm < mp.submapFloor.length) {
          val chIdx = (0 until nch).filter(mp.mux(_) == sm)
          val vecs = chIdx.map(c => if (floorsOut(c) == null) null else new Array[Double](n2)).toArray
          decodeResidue(br, su.residues(mp.submapResidue(sm)), su.books, vecs, n2)
          chIdx.zipWithIndex.foreach { case (c, i) => spectra(c) = vecs(i) }
          sm += 1
        }
        // inverse coupling (reverse order)
        s = mp.couplingMag.length - 1
        while (s >= 0) {
          val mV = spectra(mp.couplingMag(s))
          val aV = spectra(mp.couplingAng(s))
          if (mV != null && aV != null) {
            var i = 0
            while (i < n2) {
              val m = mV(i); val a = aV(i)
              if (m > 0) {
                if (a > 0) { mV(i) = m; aV(i) = m - a } else { aV(i) = m; mV(i) = m + a }
              } else {
                if (a > 0) { mV(i) = m; aV(i) = m + a } else { aV(i) = m; mV(i) = m - a }
              }
              i += 1
            }
          }
          s -= 1
        }
        // floor curve × residue, IMDCT, window, overlap-add
        val leftN = if (mode.blockFlag == 1 && pFlag == 0) su.blocksizes(0) / 2 else n2
        val rightN = if (mode.blockFlag == 1 && nFlag == 0) su.blocksizes(0) / 2 else n2
        val w = window(n, leftN, rightN)
        val start = if (rightCenter == Long.MinValue) -(n / 4).toLong else rightCenter - n / 4
        ch = 0
        while (ch < nch) {
          if (spectra(ch) != null && floorsOut(ch) != null) {
            var i = 0
            while (i < n2) { spectra(ch)(i) *= floorsOut(ch)(i); i += 1 }
            val pcm = imdct(spectra(ch), n)
            var j = 0
            while (j < n) {
              val at = start + j
              if (at >= 0 && at < est) acc(ch)(at.toInt) += pcm(j) * w(j)
              j += 1
            }
          }
          ch += 1
        }
        rightCenter = start + 3L * n / 4
      }
    }
    val valid = if (rightCenter == Long.MinValue) 0 else math.max(0L, rightCenter).toInt
    Decoded(su.sampleRate, nch, acc.map(a => java.util.Arrays.copyOfRange(a, 0, math.min(valid, est))))
  }

  /** Interleaved 16-bit PCM view of a decoded stream (the
    * `decodeAudio` face). The encoder works in raw sample units, so
    * values are clamped, not rescaled. */
  def decodeToAudio(bytes: Array[Byte]): Wav.Audio = {
    val d = decode(bytes)
    val n = if (d.samples.isEmpty) 0 else d.samples.map(_.length).min
    val out = new Array[Int](n * d.channels)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < d.channels) {
        val v = math.round(d.samples(c)(i)).toInt
        out(i * d.channels + c) = math.max(-32768, math.min(32767, v))
        c += 1
      }
      i += 1
    }
    Wav.Audio(d.sampleRate, d.channels, 16, out)
  }

  // ------------------------------------------------------------------
  // encoder — minimal conforming streams for round-trip + oracle
  // ------------------------------------------------------------------

  /** Encoder options. `resType` 0 needs mono (its dim-2 VQ book uses
    * a narrow grid); `coupling` needs 2 channels and resType 2. */
  final case class EncOpts(
      channels: Int = 1,
      sampleRate: Int = 8000,
      resType: Int = 1,
      coupling: Boolean = false,
      longBlocks: Boolean = false,
      classedFloor: Boolean = false, // partitioned floor1 (classes + masterbook + subbooks)
      quantStep: Double = 0.25) {
    require(channels == 1 || channels == 2)
    require(resType >= 0 && resType <= 2)
    require(!coupling || (channels == 2 && resType == 2), "coupling needs stereo type-2 residue")
    require(resType != 0 || channels == 1, "type-0 config is mono")
    // the step must be exact in the Vorbis custom float (powers of two are)
    require(float32Unpack(float32Pack(quantStep)) == quantStep, "quantStep must be float32-exact")
  }

  /** Leading codec delay of [[encode]] in samples: the first block's
    * rising slope has no lap partner, so the signal starts at absolute
    * bs0/4 in the decoded timeline. */
  val CodecDelay: Int = 64

  /** q_vorbis: per (event_type, id%16 shard), a deterministic PCM ramp
    * built from the shard's own event ids cycles through the FULL
    * Vorbis pipeline in-task (flat floor1, two-pass cascade residue,
    * windowed MDCT, Ogg framing); reconstruction after the codec delay
    * must stay within a small quantization bound for EVERY sample (a
    * require), so the oracle can state the source sample sum in closed
    * form. Shard sums re-aggregate per group (additive — oracle
    * unchanged). */
  def vorbisQuery(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val cycle = udf { ids: Seq[Long] =>
      val sorted = ids.sorted
      val n = sorted.length
      val pcm = new Array[Double](n)
      var i = 0
      while (i < n) { pcm(i) = ((sorted(i) * 37) % 256 - 128) * 8.0; i += 1 }
      val enc = Vorbis.encode(Array(pcm), EncOpts(resType = 1, quantStep = 0.25))
      val dec = Vorbis.decode(enc)
      require(dec.channels == 1 && dec.samples(0).length >= CodecDelay + n, "vorbis meta drift")
      var maxErr = 0.0
      var srcSum = 0L
      i = 0
      while (i < n) {
        maxErr = math.max(maxErr, math.abs(pcm(i) - dec.samples(0)(CodecDelay + i)))
        srcSum += pcm(i).toLong
        i += 1
      }
      require(maxErr <= 16.0, s"vorbis reconstruction bound violated: $maxErr")
      Seq(n.toLong, srcSum)
    }
    graft.Tables
      .eventsRaw(s, dir)
      .groupBy($"event_type", pmod($"event_id", lit(16L)).as("shard"))
      .agg(collect_list($"event_id").as("ids"))
      .transform(d => graft.operators.Spread.wide(d)) // conf-width, not a local-core literal
      .select($"event_type", cycle($"ids").as("a"))
      .groupBy($"event_type")
      .agg(sum($"a".getItem(0)).as("n_samples"), sum($"a".getItem(1)).as("pcm_sum"))
      .orderBy($"event_type")
  }

  /** Square-polar coupling forward — exact inverse of the decode
    * rule on integers (VorbisSpec proves the involution exhaustively). */
  def couple(x: Int, y: Int): (Int, Int) =
    if (x > 0 && y < x) (x, x - y)
    else if (y > 0 && x <= y) (y, x - y)
    else if (x <= 0 && y > x) (x, y - x)
    else (y, y - x)

  private def writeUniformLens(n: Int): Array[Int] = {
    // 2^k < n <= 2^(k+1): 2^(k+1)-n entries at k bits, rest k+1
    var k = 1
    while ((1 << k) < n) k += 1
    if ((1 << k) == n) Array.fill(n)(k)
    else {
      val short = (1 << k) - n
      Array.tabulate(n)(i => if (i < short) k - 1 else k)
    }
  }

  private def writeCodebook(bw: BW, dims: Int, lengths: Array[Int],
                            lookup: Option[(Double, Double, Int, Array[Int])]): Unit = {
    bw.bits(0x564342, 24)
    bw.bits(dims, 16)
    bw.bits(lengths.length, 24)
    bw.bits(0, 1) // unordered
    bw.bits(0, 1) // not sparse
    lengths.foreach(l => bw.bits(l - 1, 5))
    lookup match {
      case None => bw.bits(0, 4)
      case Some((minV, delta, valueBits, mult)) =>
        bw.bits(1, 4)
        bw.bits(float32Pack(minV), 32)
        bw.bits(float32Pack(delta), 32)
        bw.bits(valueBits - 1, 4)
        bw.bits(0, 1) // no sequence
        mult.foreach(m => bw.bits(m, valueBits))
    }
  }

  /** Encode per-channel PCM (raw sample units) to a complete Ogg
    * Vorbis stream. */
  def encode(pcm: Array[Array[Double]], opts: EncOpts = EncOpts()): Array[Byte] = {
    require(pcm.length == opts.channels, "vorbis: channel count mismatch")
    val nSamples = pcm.head.length
    require(pcm.forall(_.length == nSamples), "vorbis: ragged channels")
    val bs0 = 256
    val bs1 = if (opts.longBlocks) 1024 else 256
    val delta = opts.quantStep

    // ---- headers
    val id = new BW
    id.bits(1, 8); "vorbis".foreach(c => id.bits(c.toInt, 8))
    id.bits(0, 32)
    id.bits(opts.channels, 8)
    id.bits(opts.sampleRate, 32)
    id.bits(0, 32); id.bits(0, 32); id.bits(0, 32)
    id.bits(Integer.numberOfTrailingZeros(bs0), 4)
    id.bits(Integer.numberOfTrailingZeros(bs1), 4)
    id.bits(1, 1)

    val cm = new BW
    cm.bits(3, 8); "vorbis".foreach(c => cm.bits(c.toInt, 8))
    val vendor = "graft-vorbis".getBytes("UTF-8")
    cm.bits(vendor.length, 32)
    vendor.foreach(b => cm.bits(b & 0xff, 8))
    cm.bits(0, 32) // no user comments
    cm.bits(1, 1)

    // ---- codebooks
    // book 0: residue classbook — dims 2, 4 entries, flat 2-bit, scalar
    // book 1: FINE value book (step δ); book 2: COARSE value book
    // (step coarseMul·δ) — the residue is coded in TWO cascade passes
    // (coarse + fine), the shape real Vorbis streams use, so the
    // multi-pass decode path is exercised and the dynamic range is
    // coarseRange·coarseMul + fineRange steps at fine precision.
    val (valDims, fineQ, coarseQ, coarseMul) =
      if (opts.resType == 0) (2, 8, 8, 16) // 17^2 pair grids, ±8 steps each
      else (1, 128, 64, 256) // scalar grids: fine ±128·δ, coarse ±64·256δ
    val fineEntries = if (opts.resType == 0) 289 else 257
    val coarseEntries = if (opts.resType == 0) 289 else 129
    val fineLens = writeUniformLens(fineEntries)
    val coarseLens = writeUniformLens(coarseEntries)
    val fineCount = if (opts.resType == 0) 17 else 257
    val coarseCount = if (opts.resType == 0) 17 else 129
    val su = new BW
    su.bits(5, 8); "vorbis".foreach(c => su.bits(c.toInt, 8))
    val nBooks = if (opts.classedFloor) 5 else 3
    su.bits(nBooks - 1, 8)
    writeCodebook(su, 2, Array.fill(4)(2), None)
    writeCodebook(su, valDims, fineLens,
      Some((-fineQ * delta, delta, ilog(fineCount - 1), Array.tabulate(fineCount)(identity))))
    writeCodebook(su, valDims, coarseLens,
      Some((-coarseQ * coarseMul * delta, coarseMul * delta, ilog(coarseCount - 1), Array.tabulate(coarseCount)(identity))))
    if (opts.classedFloor) {
      writeCodebook(su, 1, Array.fill(256)(8), None) // book 3: floor post values
      writeCodebook(su, 1, Array.fill(2)(1), None) // book 4: floor class masterbook
    }
    su.bits(0, 6); su.bits(0, 16) // one time transform, type 0
    su.bits(0, 6) // floor_count - 1
    su.bits(1, 16) // floor type 1
    if (opts.classedFloor) {
      // partitioned floor: 2 partitions of class 0 (dims 2, 1 subclass
      // bit, masterbook + subbooks) — still encoding a FLAT curve, but
      // through the class/masterbook/subbook decode machinery
      su.bits(2, 5) // partitions
      su.bits(0, 4); su.bits(0, 4) // classList = [0, 0]
      su.bits(2 - 1, 3) // class 0 dims
      su.bits(1, 2) // 1 subclass bit
      su.bits(4, 8) // masterbook = book 4
      su.bits(3 + 1, 8); su.bits(3 + 1, 8) // both subbooks = book 3 (stored +1)
      su.bits(0, 2) // multiplier - 1
      su.bits(6, 4) // rangebits
      Seq(16, 32, 48, 56).foreach(x => su.bits(x, 6)) // partition posts
    } else {
      // flat floor: zero partitions, the two root posts, X = [0, 64]
      su.bits(0, 5) // partitions
      su.bits(0, 2) // multiplier - 1
      su.bits(6, 4) // rangebits
    }
    // residues: one per blocksize in use
    val nRes = if (opts.longBlocks) 2 else 1
    su.bits(nRes - 1, 6)
    (0 until nRes).foreach { ri =>
      val n2 = (if (ri == 0) bs0 else bs1) / 2
      val vecLen = if (opts.resType == 2) n2 * opts.channels else n2
      su.bits(opts.resType, 16)
      su.bits(0, 24) // begin
      su.bits(vecLen, 24) // end
      su.bits(8 - 1, 24) // partition size 8
      su.bits(2 - 1, 6) // classifications = 2
      su.bits(0, 8) // classbook = book 0
      // cascade: class 0 → passes 0 (coarse) + 1 (fine); class 1 → none
      su.bits(3, 3); su.bits(0, 1)
      su.bits(0, 3); su.bits(0, 1)
      su.bits(2, 8) // class 0 pass 0 → book 2 (coarse)
      su.bits(1, 8) // class 0 pass 1 → book 1 (fine)
    }
    // mappings: one per blocksize
    su.bits(nRes - 1, 6)
    (0 until nRes).foreach { ri =>
      su.bits(0, 16) // type 0
      su.bits(0, 1) // one submap
      if (opts.coupling) {
        su.bits(1, 1)
        su.bits(0, 8) // one step
        su.bits(0, ilog(opts.channels - 1)) // magnitude = ch 0
        su.bits(1, ilog(opts.channels - 1)) // angle = ch 1
      } else su.bits(0, 1)
      su.bits(0, 2) // reserved
      su.bits(0, 8) // time placeholder
      su.bits(0, 8) // floor 0
      su.bits(ri, 8) // residue ri
    }
    // modes: one per blocksize
    su.bits(nRes - 1, 6)
    (0 until nRes).foreach { ri =>
      su.bits(ri, 1) // blockflag
      su.bits(0, 16); su.bits(0, 16)
      su.bits(ri, 8) // mapping
    }
    su.bits(1, 1)

    // ---- frame schedule: alternate short/long when enabled. The
    // first block's rising slope has no lap partner, so the signal is
    // placed at absolute bs0/4 (codec delay, like every MDCT codec) —
    // full two-window coverage starts exactly there.
    val pad = bs0 / 4
    final case class Blk(n: Int, flag: Int)
    val schedule = ArrayBuffer.empty[Blk]
    var rc = bs0.toLong / 2 // right slope center of the first block (start −bs0/4)
    schedule += Blk(bs0, 0)
    var k = 1
    while (rc < pad + nSamples) {
      val useLong = opts.longBlocks && k % 2 == 1
      val n = if (useLong) bs1 else bs0
      schedule += Blk(n, if (useLong) 1 else 0)
      rc += n / 2 // advance of the right slope center when this block is placed
      k += 1
    }
    schedule += Blk(bs0, 0) // one tail block to close the lap

    val classbookLens = Array.fill(4)(2)
    val classWords = assignCodewords(classbookLens)
    val fineWords = assignCodewords(fineLens)
    val coarseWords = assignCodewords(coarseLens)
    val qRange = coarseQ * coarseMul + fineQ // max |q| the two passes represent

    val packets = ArrayBuffer[Array[Byte]](id.result(), cm.result(), su.result())
    var start = -(schedule.head.n.toLong / 4)
    val prevFlagArr = schedule.map(_.flag).toArray
    var bi = 0
    while (bi < schedule.length) {
      val blk = schedule(bi)
      val n = blk.n
      val n2 = n / 2
      val pFlag = if (bi == 0) 0 else prevFlagArr(bi - 1)
      val nFlag = if (bi + 1 < schedule.length) prevFlagArr(bi + 1) else 0
      val leftN = if (blk.flag == 1 && pFlag == 0) bs0 / 2 else n2
      val rightN = if (blk.flag == 1 && nFlag == 0) bs0 / 2 else n2
      val w = window(n, leftN, rightN)
      // analysis: windowed frame → MDCT → quantize to the lattice
      val qs = Array.ofDim[Int](opts.channels, n2)
      var ch = 0
      while (ch < opts.channels) {
        val frame = new Array[Double](n)
        var j = 0
        while (j < n) {
          val at = start + j - pad // signal sits at absolute [pad, pad+nSamples)
          frame(j) = (if (at >= 0 && at < nSamples) pcm(ch)(at.toInt) else 0.0) * w(j)
          j += 1
        }
        val spec = mdct(frame, n)
        var i = 0
        while (i < n2) {
          qs(ch)(i) = math.round(spec(i) / delta).toInt
          i += 1
        }
        ch += 1
      }
      if (opts.coupling) {
        var i = 0
        while (i < n2) {
          val (m, a) = couple(qs(0)(i), qs(1)(i))
          qs(0)(i) = m; qs(1)(i) = a
          i += 1
        }
      }
      qs.foreach(_.foreach(q =>
        require(q >= -qRange && q < qRange, // round-half-up eats the +edge
          s"vorbis: sample dynamics exceed the two-pass book range ($q vs ±$qRange at step $delta)")))
      // ---- packet bits
      val bw = new BW
      bw.bits(0, 1) // audio
      if (nRes > 1) bw.bits(blk.flag, 1) // mode number (mode ri == blocksize ri)
      if (blk.flag == 1) { bw.bits(pFlag, 1); bw.bits(nFlag, 1) }
      // floors: flat at the table top (gain 1.0). The classed variant
      // still encodes the flat curve — every partition post codes the
      // residual 0 (finalY = predicted = 255) through masterbook +
      // subbook codewords, driving the class decode machinery.
      ch = 0
      while (ch < opts.channels) {
        bw.bits(1, 1)
        bw.bits(255, 8); bw.bits(255, 8)
        if (opts.classedFloor) {
          var p = 0
          while (p < 2) {
            bw.code(0, 1) // masterbook entry 0 → subbook 0 for both dims
            bw.code(0, 8); bw.code(0, 8) // post residuals 0 (book 3 entry 0)
            p += 1
          }
        }
        ch += 1
      }
      // residue: mirror of the decoder's partition walk, pass 0 only
      val vecs: Array[Array[Int]] =
        if (opts.resType == 2) {
          val joined = new Array[Int](n2 * opts.channels)
          var i = 0
          while (i < n2) {
            var c = 0
            while (c < opts.channels) { joined(i * opts.channels + c) = qs(c)(i); c += 1 }
            i += 1
          }
          Array(joined)
        } else qs
      // decompose each lattice value into coarse + fine pass values
      val cParts = vecs.map(_.map(q => math.floorDiv(q + coarseMul / 2, coarseMul)))
      val fParts = vecs.indices.map(vi => vecs(vi).indices.map(i => vecs(vi)(i) - cParts(vi)(i) * coarseMul).toArray).toArray
      cParts.foreach(_.foreach(c => require(math.abs(c) <= coarseQ, "vorbis: coarse pass overflow")))
      fParts.foreach(_.foreach(f => require(math.abs(f) <= fineQ, "vorbis: fine pass overflow")))
      val vecLen = vecs.head.length
      val partsToRead = vecLen / 8
      // pass 0: classwords + coarse books, walking all partitions —
      // then pass 1: fine books over the same walk (the decoder's
      // pass-major order)
      def emitPass(values: Array[Array[Int]], words: Array[Int], lens: Array[Int],
                   q0: Int, count: Int, withClasswords: Boolean): Unit = {
        var partition = 0
        while (partition < partsToRead) {
          if (withClasswords)
            vecs.indices.foreach(_ => bw.code(classWords(0), classbookLens(0)))
          var i = 0
          while (i < 2 && partition < partsToRead) {
            values.foreach { v =>
              val off = partition * 8
              if (opts.resType == 0) {
                var s = 0
                while (s < 4) { // step = 8 / dims(2)
                  val e = (v(off + s) + q0) + count * (v(off + s + 4) + q0)
                  bw.code(words(e), lens(e))
                  s += 1
                }
              } else {
                var kk = 0
                while (kk < 8) {
                  val e = v(off + kk) + q0
                  bw.code(words(e), lens(e))
                  kk += 1
                }
              }
            }
            partition += 1
            i += 1
          }
        }
      }
      emitPass(cParts, coarseWords, coarseLens, coarseQ, coarseCount, withClasswords = true)
      emitPass(fParts, fineWords, fineLens, fineQ, fineCount, withClasswords = false)
      packets += bw.result()
      start = (start + 3L * n / 4) - (if (bi + 1 < schedule.length) schedule(bi + 1).n / 4 else 0)
      bi += 1
    }

    // ---- Ogg pages: one packet per page
    val out = new java.io.ByteArrayOutputStream()
    var granule = 0L
    packets.zipWithIndex.foreach { case (p, i) =>
      val htype = if (i == 0) 2 else if (i == packets.length - 1) 4 else 0
      if (i >= 3) granule += bs0 / 2
      val g = if (i < 3) 0L else granule
      out.write(Ogg.writePage(0x67726166, i, g, htype, p))
    }
    out.toByteArray
  }
}
