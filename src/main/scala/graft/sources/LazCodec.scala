package graft.sources

/** Pure-JVM LASzip v2 entropy codec — the arithmetic-coded point
  * compressor the reference shells out to for .laz / .copc.laz point
  * clouds (`src/library/pointcloud.cpp` reads LAZ through PDAL;
  * `pctiler.cpp`'s chunks are laszip streams). Implemented from the
  * published format: Isenburg, "LASzip: lossless compression of LiDAR
  * data" (PE&RS 2013) — an adaptive arithmetic coder (Amir Said's
  * FastAC scheme) over per-field predictive models:
  *
  *  - [[AcEncoder]]/[[AcDecoder]] — 32-bit renormalizing arithmetic
  *    coder with carry propagation (renorm at 2^24).
  *  - [[AcBitModel]]/[[AcModel]] — adaptive binary / n-ary frequency
  *    models with periodic rescaling and a decode lookup table.
  *  - [[IntCompressor]] — the k-bit "integer corrector": a predicted
  *    int's residual is coded as (k, position-in-interval) where
  *    [-(2^k -1), 2^k] is the tightest interval holding the residual.
  *  - [[Point10V2]], [[Gps11V2]], [[Rgb12V2]] — the POINT10 /
  *    GPSTIME11 / RGB12 item codecs (streaming-median XY prediction
  *    with return-context model banks, 4-sequence delta/multiplier
  *    GPS-time model, inter-channel RGB byte-difference model).
  *
  * Byte-exact round-trip (encode∘decode ≡ id on the raw item bytes)
  * is proven by LazSpec over adversarial point streams; conformance
  * against external laszip output is untestable in this sandbox (no
  * LAZ fixture or laszip binary exists here), which LazSpec documents.
  */
private[sources] object Ac {
  val MinLen = 0x01000000L // renormalize when the interval drops below 2^24
  val MaxLen = 0xFFFFFFFFL
  val BmShift = 13
  val BmMax = 1 << 13
  val DmShift = 15
  val DmMax = 1 << 15
}

/** Adaptive binary model: scaled probability of the 0-bit, rescaled
  * every updateCycle observations. */
private[sources] final class AcBitModel {
  var bit0Prob = 1 << (Ac.BmShift - 1)
  var bit0Count = 1
  var bitCount = 2
  var updateCycle = 4
  var bitsUntil = 4

  def update(): Unit = {
    bitCount += updateCycle
    if (bitCount > Ac.BmMax) {
      bitCount = (bitCount + 1) >> 1
      bit0Count = (bit0Count + 1) >> 1
      if (bit0Count == bitCount) bitCount += 1
    }
    bit0Prob = (bit0Count << Ac.BmShift) / bitCount
    updateCycle = (5 * updateCycle) >> 2
    if (updateCycle > 64) updateCycle = 64
    bitsUntil = updateCycle
  }
}

/** Adaptive n-symbol frequency model. Decoder-side models with >16
  * symbols carry a bucketed lookup table over the cumulative
  * distribution to start the symbol search. */
private[sources] final class AcModel(val numSym: Int, forEncode: Boolean) {
  val distribution = new Array[Int](numSym)
  val symbolCount = new Array[Int](numSym)
  val lastSymbol = numSym - 1
  var decoderTable: Array[Int] = null
  var tableShift = 0
  private var tableSize = 0
  var totalCount = 0
  var updateCycle = 0
  var symUntil = 0

  if (numSym > 16 && !forEncode) {
    var tableBits = 3
    while (numSym > (1 << (tableBits + 2))) tableBits += 1
    tableSize = 1 << tableBits
    tableShift = Ac.DmShift - tableBits
    decoderTable = new Array[Int](tableSize + 2)
  }
  locally {
    java.util.Arrays.fill(symbolCount, 1)
    totalCount = 0
    updateCycle = numSym
    update()
    updateCycle = (numSym + 6) >> 1
    symUntil = updateCycle
  }

  def update(): Unit = {
    totalCount += updateCycle
    if (totalCount > Ac.DmMax) {
      totalCount = 0
      var i = 0
      while (i < numSym) { symbolCount(i) = (symbolCount(i) + 1) >> 1; totalCount += symbolCount(i); i += 1 }
    }
    val scale = 0x80000000L / totalCount
    var k = 0
    var sum = 0L
    if (decoderTable == null) {
      while (k < numSym) { distribution(k) = ((scale * sum) >>> (31 - Ac.DmShift)).toInt; sum += symbolCount(k); k += 1 }
    } else {
      var s = 0
      while (k < numSym) {
        distribution(k) = ((scale * sum) >>> (31 - Ac.DmShift)).toInt
        sum += symbolCount(k)
        val w = distribution(k) >>> tableShift
        while (s < w) { s += 1; decoderTable(s) = k - 1 }
        k += 1
      }
      decoderTable(0) = 0
      while (s <= tableSize) { s += 1; decoderTable(s) = numSym - 1 }
    }
    updateCycle = (5 * updateCycle) >> 2
    val maxCycle = (numSym + 6) << 3
    if (updateCycle > maxCycle) updateCycle = maxCycle
    symUntil = updateCycle
  }
}

/** Renormalizing arithmetic encoder (u32 state held in masked Longs). */
private[sources] final class AcEncoder {
  private var base = 0L
  private var length = Ac.MaxLen
  private val out = new scala.collection.mutable.ArrayBuffer[Byte](1 << 12)

  def result(): Array[Byte] = out.toArray

  private def propagateCarry(): Unit = {
    var p = out.length - 1
    var going = true
    while (going) {
      if (out(p) == -1) { out(p) = 0; p -= 1 }
      else { out(p) = (out(p) + 1).toByte; going = false }
    }
  }

  private def renorm(): Unit =
    while (length < Ac.MinLen) {
      out += ((base >>> 24) & 0xFF).toByte
      base = (base << 8) & Ac.MaxLen
      length = (length << 8) & Ac.MaxLen
    }

  def encodeBit(m: AcBitModel, bit: Int): Unit = {
    val x = m.bit0Prob.toLong * (length >>> Ac.BmShift)
    if (bit == 0) { length = x; m.bit0Count += 1 }
    else {
      val init = base
      base = (base + x) & Ac.MaxLen
      if (init > base) propagateCarry()
      length -= x
    }
    if (length < Ac.MinLen) renorm()
    m.bitsUntil -= 1
    if (m.bitsUntil == 0) m.update()
  }

  def encodeSymbol(m: AcModel, sym: Int): Unit = {
    val init = base
    if (sym == m.lastSymbol) {
      val x = m.distribution(sym).toLong * (length >>> Ac.DmShift)
      base = (base + x) & Ac.MaxLen
      length -= x
    } else {
      length = length >>> Ac.DmShift
      val x = m.distribution(sym).toLong * length
      base = (base + x) & Ac.MaxLen
      length = m.distribution(sym + 1).toLong * length - x
    }
    if (init > base) propagateCarry()
    if (length < Ac.MinLen) renorm()
    m.symbolCount(sym) += 1
    m.symUntil -= 1
    if (m.symUntil == 0) m.update()
  }

  private def writeShort(sym: Long): Unit = {
    val init = base
    length = length >>> 16
    base = (base + sym * length) & Ac.MaxLen
    if (init > base) propagateCarry()
    if (length < Ac.MinLen) renorm()
  }

  def writeBits(bits0: Int, sym0: Long): Unit = {
    var bits = bits0
    var sym = sym0 & Ac.MaxLen
    if (bits > 19) { writeShort(sym & 0xFFFF); sym = sym >>> 16; bits -= 16 }
    val init = base
    length = length >>> bits
    base = (base + sym * length) & Ac.MaxLen
    if (init > base) propagateCarry()
    if (length < Ac.MinLen) renorm()
  }

  def writeInt(v: Int): Unit = writeBits(32, v.toLong & Ac.MaxLen)

  /** Pin the interval and flush: after this the stream decodes fully
    * regardless of what bytes follow it (chunks pack back-to-back). */
  def done(): Unit = {
    val init = base
    if (length > 2 * Ac.MinLen) { base = (base + Ac.MinLen) & Ac.MaxLen; length = Ac.MinLen >>> 1 }
    else { base = (base + (Ac.MinLen >>> 1)) & Ac.MaxLen; length = Ac.MinLen >>> 9 }
    if (init > base) propagateCarry()
    renorm()
  }
}

/** Arithmetic decoder over a byte range; reads past `end` yield 0 so a
  * final short chunk decodes without tail padding. */
private[sources] final class AcDecoder(buf: Array[Byte], start: Int, end: Int) {
  private var pos = start
  private def nextByte(): Long = {
    val b = if (pos < end) buf(pos) & 0xFFL else 0L
    pos += 1
    b
  }
  private var value = (nextByte() << 24) | (nextByte() << 16) | (nextByte() << 8) | nextByte()
  private var length = Ac.MaxLen

  /** Bytes consumed so far (diagnostic). */
  def position: Int = pos

  private def renorm(): Unit =
    while (length < Ac.MinLen) {
      value = ((value << 8) | nextByte()) & Ac.MaxLen
      length = (length << 8) & Ac.MaxLen
    }

  def decodeBit(m: AcBitModel): Int = {
    val x = m.bit0Prob.toLong * (length >>> Ac.BmShift)
    val sym = if (value >= x) 1 else 0
    if (sym == 0) { length = x; m.bit0Count += 1 }
    else { value -= x; length -= x }
    if (length < Ac.MinLen) renorm()
    m.bitsUntil -= 1
    if (m.bitsUntil == 0) m.update()
    sym
  }

  def decodeSymbol(m: AcModel): Int = {
    var sym = 0
    var x = 0L
    var y = length
    if (m.decoderTable != null) {
      length = length >>> Ac.DmShift
      val dv = value / length
      val t = (dv >>> m.tableShift).toInt
      sym = m.decoderTable(t)
      var n = m.decoderTable(t + 1) + 1
      while (n > sym + 1) {
        val k = (sym + n) >>> 1
        if (m.distribution(k) > dv) n = k else sym = k
      }
      x = m.distribution(sym).toLong * length
      if (sym != m.lastSymbol) y = m.distribution(sym + 1).toLong * length
    } else {
      length = length >>> Ac.DmShift
      var n = m.numSym
      var k = n >>> 1
      while (k != sym) {
        val z = m.distribution(k).toLong * length
        if (z > value) { n = k; y = z } else { sym = k; x = z }
        k = (sym + n) >>> 1
      }
    }
    value -= x
    length = y - x
    if (length < Ac.MinLen) renorm()
    m.symbolCount(sym) += 1
    m.symUntil -= 1
    if (m.symUntil == 0) m.update()
    sym
  }

  private def readShort(): Long = {
    length = length >>> 16
    val sym = value / length
    value -= sym * length
    if (length < Ac.MinLen) renorm()
    sym
  }

  def readBits(bits: Int): Long =
    if (bits > 19) {
      val lo = readShort()
      val hi = readBits(bits - 16) << 16
      hi | lo
    } else {
      length = length >>> bits
      val sym = value / length
      value -= sym * length
      if (length < Ac.MinLen) renorm()
      sym
    }

  def readInt(): Int = readBits(32).toInt
}

/** k-bit integer corrector: residual vs a prediction coded as the
  * interval index k (per-context model) plus the in-interval position
  * (k-symbol model for small k; model + raw low bits for large k). */
private[sources] final class IntCompressor(numContexts: Int, bits: Int, forEncode: Boolean) {
  private val bitsHigh = 8
  private val corrBits = if (bits < 32) bits else 32
  private val corrRange = if (bits < 32) 1 << bits else 0
  private val corrMin = if (bits < 32) -(corrRange / 2) else Int.MinValue
  private val corrMax = if (bits < 32) -(corrRange / 2) + corrRange - 1 else Int.MaxValue
  /** The k chosen by the most recent corrector — point10 reuses it as
    * cross-field context (dx's k steers dy's context, etc). */
  var k = 0

  private val mBits = Array.fill(numContexts)(new AcModel(corrBits + 1, forEncode))
  private val mCorr0 = new AcBitModel
  private val mCorr: Array[AcModel] = {
    val a = new Array[AcModel](corrBits + 1)
    var i = 1
    while (i <= corrBits) {
      a(i) = new AcModel(if (i <= bitsHigh) 1 << i else 1 << bitsHigh, forEncode)
      i += 1
    }
    a
  }

  def compress(enc: AcEncoder, pred: Int, real: Int, ctx: Int): Unit = {
    var corr = real - pred
    if (corr < corrMin) corr += corrRange
    else if (corr > corrMax) corr -= corrRange
    writeCorrector(enc, corr, mBits(ctx))
  }

  private def writeCorrector(enc: AcEncoder, c0: Int, mB: AcModel): Unit = {
    var c = c0
    k = 0
    // tightest interval [-(2^k - 1), 2^k] containing c
    var c1 = if (c <= 0) -c.toLong else c.toLong - 1
    while (c1 != 0) { c1 >>>= 1; k += 1 }
    enc.encodeSymbol(mB, k)
    if (k != 0) {
      if (k < 32) {
        // map [2^(k-1)+1, 2^k] -> [2^(k-1), 2^k-1] and
        // [-(2^k-1), -2^(k-1)] -> [0, 2^(k-1)-1]
        if (c >= 0) c -= 1
        else c += (1 << k) - 1
        if (k <= bitsHigh) enc.encodeSymbol(mCorr(k), c)
        else {
          val k1 = k - bitsHigh
          val lo = c & ((1 << k1) - 1)
          enc.encodeSymbol(mCorr(k), c >>> k1)
          enc.writeBits(k1, lo.toLong)
        }
      }
    } else enc.encodeBit(mCorr0, c)
  }

  def decompress(dec: AcDecoder, pred: Int, ctx: Int): Int = {
    var real = pred + readCorrector(dec, mBits(ctx))
    if (real < 0) real += corrRange
    else if (corrRange != 0 && real >= corrRange) real -= corrRange
    real
  }

  private def readCorrector(dec: AcDecoder, mB: AcModel): Int = {
    k = dec.decodeSymbol(mB)
    if (k != 0) {
      if (k < 32) {
        var c =
          if (k <= bitsHigh) dec.decodeSymbol(mCorr(k))
          else {
            val k1 = k - bitsHigh
            val hi = dec.decodeSymbol(mCorr(k))
            (hi << k1) | dec.readBits(k1).toInt
          }
        if (c >= (1 << (k - 1))) c += 1
        else c -= (1 << k) - 1
        c
      } else Int.MinValue
    } else dec.decodeBit(mCorr0)
  }
}

/** Mutable point record shared by the item codecs (one LAS point
  * across the POINT10 / GPSTIME11 / RGB12 items). */
private[sources] final class PointBuf {
  var x = 0; var y = 0; var z = 0
  var intensity = 0 // u16
  var returnByte = 0 // u8: ret 0-2, numRet 3-5, scanDir 6, edge 7
  var classification = 0 // u8
  var scanAngle = 0 // raw u8 (i8 reinterpreted)
  var userData = 0 // u8
  var pointSource = 0 // u16
  var gpsBits = 0L // f64 raw bits
  var red = 0; var green = 0; var blue = 0 // u16 each
  // wave packet (formats 4/5/9/10): descriptor index, byte offset to
  // the waveform, packet size, and the four f32s as raw bit patterns
  var wpIndex = 0 // u8
  var wpOffset = 0L // u64
  var wpSize = 0 // u32
  var wpRetBits = 0 // f32 bits (return point waveform location)
  var wpXtBits = 0; var wpYtBits = 0; var wpZtBits = 0 // f32 bits
}

private[sources] object LazTables {
  // return-count context folding tables (laszip common v2 constants)
  val NumberReturnMap: Array[Array[Int]] = Array(
    Array(15, 14, 13, 12, 11, 10, 9, 8),
    Array(14, 0, 1, 3, 6, 10, 10, 9),
    Array(13, 1, 2, 4, 7, 11, 11, 10),
    Array(12, 3, 4, 5, 8, 12, 12, 11),
    Array(11, 6, 7, 8, 9, 13, 13, 12),
    Array(10, 10, 11, 12, 13, 14, 14, 13),
    Array(9, 10, 11, 12, 13, 14, 15, 14),
    Array(8, 9, 10, 11, 12, 13, 14, 15)
  )
  val NumberReturnLevel: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7),
    Array(1, 0, 1, 2, 3, 4, 5, 6),
    Array(2, 1, 0, 1, 2, 3, 4, 5),
    Array(3, 2, 1, 0, 1, 2, 3, 4),
    Array(4, 3, 2, 1, 0, 1, 2, 3),
    Array(5, 4, 3, 2, 1, 0, 1, 2),
    Array(6, 5, 4, 3, 2, 1, 0, 1),
    Array(7, 6, 5, 4, 3, 2, 1, 0)
  )
  def u8Fold(n: Int): Int = if (n < 0) n + 256 else if (n > 255) n - 256 else n
  def u8Clamp(n: Int): Int = if (n <= 0) 0 else if (n >= 255) 255 else n
}

/** Streaming median-of-5 used to predict XY deltas. */
private[sources] final class Median5 {
  private val v = new Array[Int](5)
  private var high = true
  def get: Int = v(2)
  def add(x: Int): Unit = {
    if (high) {
      if (x < v(2)) {
        v(4) = v(3); v(3) = v(2)
        if (x < v(0)) { v(2) = v(1); v(1) = v(0); v(0) = x }
        else if (x < v(1)) { v(2) = v(1); v(1) = x }
        else v(2) = x
      } else {
        if (x < v(3)) { v(4) = v(3); v(3) = x }
        else v(4) = x
        high = false
      }
    } else {
      if (v(2) < x) {
        v(0) = v(1); v(1) = v(2)
        if (v(4) < x) { v(2) = v(3); v(3) = v(4); v(4) = x }
        else if (v(3) < x) { v(2) = v(3); v(3) = x }
        else v(2) = x
      } else {
        if (v(1) < x) { v(0) = v(1); v(1) = x }
        else v(0) = x
        high = true
      }
    }
  }
}

/** POINT10 v2 item codec: changed-field mask, per-return-context
  * streaming-median XY delta prediction, height bank for Z, byte
  * models keyed on the previous byte value. State seeds from the raw
  * first point of the chunk. */
private[sources] final class Point10V2(forEncode: Boolean, first: PointBuf) {
  import LazTables._
  private var lastX = first.x
  private var lastY = first.y
  private var lastZ = first.z
  private var lastReturnByte = first.returnByte & 0xFF
  private var lastClassification = first.classification & 0xFF
  private var lastScanAngle = first.scanAngle & 0xFF
  private var lastUserData = first.userData & 0xFF
  private var lastPointSource = first.pointSource & 0xFFFF
  private val lastIntensity = new Array[Int](16)
  private val xMed = Array.fill(16)(new Median5)
  private val yMed = Array.fill(16)(new Median5)
  private val lastHeight = new Array[Int](8)

  private val mChanged = new AcModel(64, forEncode)
  private val icIntensity = new IntCompressor(4, 16, forEncode)
  private val mScanAngleRank = Array(new AcModel(256, forEncode), new AcModel(256, forEncode))
  private val icPointSource = new IntCompressor(1, 16, forEncode)
  private val mBitByte = new Array[AcModel](256)
  private val mClassification = new Array[AcModel](256)
  private val mUserData = new Array[AcModel](256)
  private val icDx = new IntCompressor(2, 32, forEncode)
  private val icDy = new IntCompressor(22, 32, forEncode)
  private val icZ = new IntCompressor(20, 32, forEncode)

  private def byteModel(bank: Array[AcModel], idx: Int): AcModel = {
    if (bank(idx) == null) bank(idx) = new AcModel(256, forEncode)
    bank(idx)
  }

  def write(enc: AcEncoder, p: PointBuf): Unit = {
    val rb = p.returnByte & 0xFF
    val r = rb & 7
    val n = (rb >>> 3) & 7
    val m = NumberReturnMap(n)(r)
    val l = NumberReturnLevel(n)(r)
    val intensity = p.intensity & 0xFFFF
    val cls = p.classification & 0xFF
    val sa = p.scanAngle & 0xFF
    val ud = p.userData & 0xFF
    val ps = p.pointSource & 0xFFFF

    var changed = 0
    if (lastReturnByte != rb) changed |= 32
    if (lastIntensity(m) != intensity) changed |= 16
    if (lastClassification != cls) changed |= 8
    if (lastScanAngle != sa) changed |= 4
    if (lastUserData != ud) changed |= 2
    if (lastPointSource != ps) changed |= 1
    enc.encodeSymbol(mChanged, changed)

    if ((changed & 32) != 0) { enc.encodeSymbol(byteModel(mBitByte, lastReturnByte), rb); lastReturnByte = rb }
    if ((changed & 16) != 0) {
      icIntensity.compress(enc, lastIntensity(m), intensity, if (m < 3) m else 3)
      lastIntensity(m) = intensity
    }
    if ((changed & 8) != 0) { enc.encodeSymbol(byteModel(mClassification, lastClassification), cls); lastClassification = cls }
    if ((changed & 4) != 0) {
      enc.encodeSymbol(mScanAngleRank((rb >>> 6) & 1), u8Fold(sa - lastScanAngle))
      lastScanAngle = sa
    }
    if ((changed & 2) != 0) { enc.encodeSymbol(byteModel(mUserData, lastUserData), ud); lastUserData = ud }
    if ((changed & 1) != 0) { icPointSource.compress(enc, lastPointSource, ps, 0); lastPointSource = ps }

    val ctx1 = if (n == 1) 1 else 0
    val dx = p.x - lastX
    icDx.compress(enc, xMed(m).get, dx, ctx1)
    xMed(m).add(dx)
    lastX = p.x

    val kx = icDx.k
    val dy = p.y - lastY
    icDy.compress(enc, yMed(m).get, dy, ctx1 + (if (kx < 20) kx & 0xFE else 20))
    yMed(m).add(dy)
    lastY = p.y

    val kz = (icDx.k + icDy.k) / 2
    icZ.compress(enc, lastHeight(l), p.z, ctx1 + (if (kz < 18) kz & 0xFE else 18))
    lastHeight(l) = p.z
    lastZ = p.z
  }

  def read(dec: AcDecoder, p: PointBuf): Unit = {
    val changed = dec.decodeSymbol(mChanged)
    if ((changed & 32) != 0) lastReturnByte = dec.decodeSymbol(byteModel(mBitByte, lastReturnByte))
    val rb = lastReturnByte
    val r = rb & 7
    val n = (rb >>> 3) & 7
    val m = NumberReturnMap(n)(r)
    val l = NumberReturnLevel(n)(r)

    if ((changed & 16) != 0)
      lastIntensity(m) = icIntensity.decompress(dec, lastIntensity(m), if (m < 3) m else 3) & 0xFFFF
    val intensity = lastIntensity(m)
    if ((changed & 8) != 0) lastClassification = dec.decodeSymbol(byteModel(mClassification, lastClassification))
    if ((changed & 4) != 0)
      lastScanAngle = u8Fold(dec.decodeSymbol(mScanAngleRank((rb >>> 6) & 1)) + lastScanAngle)
    if ((changed & 2) != 0) lastUserData = dec.decodeSymbol(byteModel(mUserData, lastUserData))
    if ((changed & 1) != 0) lastPointSource = icPointSource.decompress(dec, lastPointSource, 0) & 0xFFFF

    val ctx1 = if (n == 1) 1 else 0
    val dx = icDx.decompress(dec, xMed(m).get, ctx1)
    lastX += dx
    xMed(m).add(dx)

    val kx = icDx.k
    val dy = icDy.decompress(dec, yMed(m).get, ctx1 + (if (kx < 20) kx & 0xFE else 20))
    lastY += dy
    yMed(m).add(dy)

    val kz = (icDx.k + icDy.k) / 2
    lastZ = icZ.decompress(dec, lastHeight(l), ctx1 + (if (kz < 18) kz & 0xFE else 18))
    lastHeight(l) = lastZ

    p.x = lastX; p.y = lastY; p.z = lastZ
    p.intensity = intensity
    p.returnByte = rb
    p.classification = lastClassification
    p.scanAngle = lastScanAngle
    p.userData = lastUserData
    p.pointSource = lastPointSource
  }
}

/** GPSTIME11 v2 item codec: four last-time sequences, per-sequence
  * last integer delta and multiplier coding of the current delta
  * against it; full 64-bit re-sync for "huge" jumps. */
private[sources] final class Gps11V2(forEncode: Boolean, firstBits: Long) {
  private val Multi = 500
  private val MultiMinus = -10
  private val MultiUnchanged = Multi - MultiMinus + 1 // 511
  private val MultiCodeFull = Multi - MultiMinus + 2 // 512

  private var last = 0
  private var next = 0
  private val lastGps = new Array[Long](4)
  private val lastDiff = new Array[Int](4)
  private val extreme = new Array[Int](4)
  private val mMulti = new AcModel(Multi - MultiMinus + 6, forEncode) // 516
  private val m0Diff = new AcModel(6, forEncode)
  private val icGps = new IntCompressor(9, 32, forEncode)

  lastGps(0) = firstBits

  private def quantize(f: Float): Int = if (f >= 0) (f + 0.5f).toInt else (f - 0.5f).toInt

  def write(enc: AcEncoder, bits: Long): Unit = {
    if (lastDiff(last) == 0) {
      if (bits == lastGps(last)) enc.encodeSymbol(m0Diff, 0)
      else {
        val diff64 = bits - lastGps(last)
        val diff32 = diff64.toInt
        if (diff64 == diff32.toLong) {
          enc.encodeSymbol(m0Diff, 1)
          icGps.compress(enc, 0, diff32, 0)
          lastDiff(last) = diff32
          extreme(last) = 0
          lastGps(last) = bits
        } else {
          var i = 1
          while (i < 4) {
            val od64 = bits - lastGps((last + i) & 3)
            if (od64 == od64.toInt.toLong) {
              enc.encodeSymbol(m0Diff, i + 2)
              last = (last + i) & 3
              write(enc, bits)
              return
            }
            i += 1
          }
          enc.encodeSymbol(m0Diff, 2)
          icGps.compress(enc, (lastGps(last) >>> 32).toInt, (bits >>> 32).toInt, 8)
          enc.writeInt(bits.toInt)
          next = (next + 1) & 3
          last = next
          lastGps(last) = bits
          lastDiff(last) = 0
          extreme(last) = 0
        }
      }
    } else {
      if (bits == lastGps(last)) enc.encodeSymbol(mMulti, MultiUnchanged)
      else {
        val diff64 = bits - lastGps(last)
        val diff32 = diff64.toInt
        if (diff64 == diff32.toLong) {
          val multi = quantize(diff32.toFloat / lastDiff(last).toFloat)
          if (multi == 1) {
            enc.encodeSymbol(mMulti, 1)
            icGps.compress(enc, lastDiff(last), diff32, 1)
            extreme(last) = 0
          } else if (multi > 0) {
            if (multi < Multi) {
              enc.encodeSymbol(mMulti, multi)
              icGps.compress(enc, multi * lastDiff(last), diff32, if (multi < 10) 2 else 3)
            } else {
              enc.encodeSymbol(mMulti, Multi)
              icGps.compress(enc, Multi * lastDiff(last), diff32, 4)
              extreme(last) += 1
              if (extreme(last) > 3) { lastDiff(last) = diff32; extreme(last) = 0 }
            }
          } else if (multi < 0) {
            if (multi > MultiMinus) {
              enc.encodeSymbol(mMulti, Multi - multi)
              icGps.compress(enc, multi * lastDiff(last), diff32, 5)
            } else {
              enc.encodeSymbol(mMulti, Multi - MultiMinus)
              icGps.compress(enc, MultiMinus * lastDiff(last), diff32, 6)
              extreme(last) += 1
              if (extreme(last) > 3) { lastDiff(last) = diff32; extreme(last) = 0 }
            }
          } else {
            enc.encodeSymbol(mMulti, 0)
            icGps.compress(enc, 0, diff32, 7)
            extreme(last) += 1
            if (extreme(last) > 3) { lastDiff(last) = diff32; extreme(last) = 0 }
          }
          lastGps(last) = bits
        } else {
          var i = 1
          while (i < 4) {
            val od64 = bits - lastGps((last + i) & 3)
            if (od64 == od64.toInt.toLong) {
              enc.encodeSymbol(mMulti, MultiCodeFull + i)
              last = (last + i) & 3
              write(enc, bits)
              return
            }
            i += 1
          }
          enc.encodeSymbol(mMulti, MultiCodeFull)
          icGps.compress(enc, (lastGps(last) >>> 32).toInt, (bits >>> 32).toInt, 8)
          enc.writeInt(bits.toInt)
          next = (next + 1) & 3
          last = next
          lastGps(last) = bits
          lastDiff(last) = 0
          extreme(last) = 0
        }
      }
    }
  }

  def read(dec: AcDecoder): Long = {
    if (lastDiff(last) == 0) {
      val multi = dec.decodeSymbol(m0Diff)
      if (multi == 1) {
        lastDiff(last) = icGps.decompress(dec, 0, 0)
        lastGps(last) += lastDiff(last).toLong
        extreme(last) = 0
      } else if (multi == 2) {
        next = (next + 1) & 3
        val hi = icGps.decompress(dec, (lastGps(last) >>> 32).toInt, 8)
        lastGps(next) = (hi.toLong << 32) | (dec.readInt().toLong & 0xFFFFFFFFL)
        last = next
        lastDiff(last) = 0
        extreme(last) = 0
      } else if (multi > 2) {
        last = (last + multi - 2) & 3
        return read(dec)
      }
    } else {
      val multi = dec.decodeSymbol(mMulti)
      if (multi == 1) {
        lastGps(last) += icGps.decompress(dec, lastDiff(last), 1).toLong
        extreme(last) = 0
      } else if (multi < MultiUnchanged) {
        var diff = 0
        if (multi == 0) {
          diff = icGps.decompress(dec, 0, 7)
          extreme(last) += 1
          if (extreme(last) > 3) { lastDiff(last) = diff; extreme(last) = 0 }
        } else if (multi < Multi) {
          diff = icGps.decompress(dec, multi * lastDiff(last), if (multi < 10) 2 else 3)
        } else if (multi == Multi) {
          diff = icGps.decompress(dec, Multi * lastDiff(last), 4)
          extreme(last) += 1
          if (extreme(last) > 3) { lastDiff(last) = diff; extreme(last) = 0 }
        } else {
          val neg = Multi - multi
          if (neg > MultiMinus) diff = icGps.decompress(dec, neg * lastDiff(last), 5)
          else {
            diff = icGps.decompress(dec, MultiMinus * lastDiff(last), 6)
            extreme(last) += 1
            if (extreme(last) > 3) { lastDiff(last) = diff; extreme(last) = 0 }
          }
        }
        lastGps(last) += diff.toLong
      } else if (multi == MultiCodeFull) {
        next = (next + 1) & 3
        val hi = icGps.decompress(dec, (lastGps(last) >>> 32).toInt, 8)
        lastGps(next) = (hi.toLong << 32) | (dec.readInt().toLong & 0xFFFFFFFFL)
        last = next
        lastDiff(last) = 0
        extreme(last) = 0
      } else if (multi >= MultiCodeFull) {
        last = (last + multi - MultiCodeFull) & 3
        return read(dec)
      }
    }
    lastGps(last)
  }
}

/** RGB12 v2 item codec: per-byte change mask (bit 6 = "not gray"),
  * red coded against last red, green/blue against the inter-channel
  * byte difference cascade. */
private[sources] final class Rgb12V2(forEncode: Boolean, first: PointBuf) {
  import LazTables._
  private var lastR = first.red & 0xFFFF
  private var lastG = first.green & 0xFFFF
  private var lastB = first.blue & 0xFFFF
  private val mByteUsed = new AcModel(128, forEncode)
  private val mDiff = Array.fill(6)(new AcModel(256, forEncode))

  def write(enc: AcEncoder, p: PointBuf): Unit = {
    val r = p.red & 0xFFFF; val g = p.green & 0xFFFF; val b = p.blue & 0xFFFF
    var sym = 0
    if ((r & 0xFF) != (lastR & 0xFF)) sym |= 1
    if ((r & 0xFF00) != (lastR & 0xFF00)) sym |= 2
    val notGray = (r & 0xFF) != (g & 0xFF) || (r & 0xFF) != (b & 0xFF) ||
      (r & 0xFF00) != (g & 0xFF00) || (r & 0xFF00) != (b & 0xFF00)
    if (notGray) {
      sym |= 64
      if ((g & 0xFF) != (lastG & 0xFF)) sym |= 4
      if ((g & 0xFF00) != (lastG & 0xFF00)) sym |= 8
      if ((b & 0xFF) != (lastB & 0xFF)) sym |= 16
      if ((b & 0xFF00) != (lastB & 0xFF00)) sym |= 32
    }
    enc.encodeSymbol(mByteUsed, sym)
    if ((sym & 1) != 0) enc.encodeSymbol(mDiff(0), u8Fold((r & 0xFF) - (lastR & 0xFF)))
    if ((sym & 2) != 0) enc.encodeSymbol(mDiff(1), u8Fold((r >>> 8) - (lastR >>> 8)))
    if ((sym & 64) != 0) {
      var diffL = (r & 0xFF) - (lastR & 0xFF)
      if ((sym & 4) != 0) enc.encodeSymbol(mDiff(2), u8Fold((g & 0xFF) - u8Clamp(diffL + (lastG & 0xFF))))
      if ((sym & 16) != 0) {
        diffL = (diffL + (g & 0xFF) - (lastG & 0xFF)) / 2
        enc.encodeSymbol(mDiff(4), u8Fold((b & 0xFF) - u8Clamp(diffL + (lastB & 0xFF))))
      }
      var diffH = (r >>> 8) - (lastR >>> 8)
      if ((sym & 8) != 0) enc.encodeSymbol(mDiff(3), u8Fold((g >>> 8) - u8Clamp(diffH + (lastG >>> 8))))
      if ((sym & 32) != 0) {
        diffH = (diffH + (g >>> 8) - (lastG >>> 8)) / 2
        enc.encodeSymbol(mDiff(5), u8Fold((b >>> 8) - u8Clamp(diffH + (lastB >>> 8))))
      }
    }
    lastR = r; lastG = g; lastB = b
  }

  def read(dec: AcDecoder, p: PointBuf): Unit = {
    val sym = dec.decodeSymbol(mByteUsed)
    var r =
      if ((sym & 1) != 0) u8Fold(dec.decodeSymbol(mDiff(0)) + (lastR & 0xFF))
      else lastR & 0xFF
    r |=
      (if ((sym & 2) != 0) u8Fold(dec.decodeSymbol(mDiff(1)) + (lastR >>> 8)) << 8
       else lastR & 0xFF00)
    var g = 0
    var b = 0
    if ((sym & 64) != 0) {
      var diffL = (r & 0xFF) - (lastR & 0xFF)
      g =
        if ((sym & 4) != 0) u8Fold(dec.decodeSymbol(mDiff(2)) + u8Clamp(diffL + (lastG & 0xFF)))
        else lastG & 0xFF
      if ((sym & 16) != 0) {
        diffL = (diffL + (g & 0xFF) - (lastG & 0xFF)) / 2
        b = u8Fold(dec.decodeSymbol(mDiff(4)) + u8Clamp(diffL + (lastB & 0xFF)))
      } else b = lastB & 0xFF
      var diffH = (r >>> 8) - (lastR >>> 8)
      if ((sym & 8) != 0) g |= u8Fold(dec.decodeSymbol(mDiff(3)) + u8Clamp(diffH + (lastG >>> 8))) << 8
      else g |= lastG & 0xFF00
      if ((sym & 32) != 0) {
        diffH = (diffH + (g >>> 8) - (lastG >>> 8)) / 2
        b |= u8Fold(dec.decodeSymbol(mDiff(5)) + u8Clamp(diffH + (lastB >>> 8))) << 8
      } else b |= lastB & 0xFF00
    } else { g = r; b = r }
    lastR = r; lastG = g; lastB = b
    p.red = r; p.green = g; p.blue = b
  }
}

/** WAVEPACKET13 v2 item codec (LAS formats 4/5/9/10's 29-byte wave
  * packet record): descriptor index through a 256-symbol model; the
  * u64 waveform offset through a 4-symbol "how does it relate to the
  * previous packet" alphabet (same offset / contiguous after the
  * previous packet / i32 delta through the integer corrector seeded
  * by the previous delta / raw 64-bit), conditioned on the PREVIOUS
  * offset symbol; packet size, return-point location and the x/y/z_t
  * direction f32 bit patterns each through their own 32-bit integer
  * corrector predicted by the previous value. Published LASzip v2
  * wavepacket scheme; conformance to external waveform .laz files is
  * round-trip-proven only (no waveform fixtures exist in-sandbox),
  * the same documented boundary as the rest of the codec family. */
private[sources] final class Wavepacket13V2(forEncode: Boolean, first: PointBuf) {
  private var lastIndex = first.wpIndex & 0xFF
  private var lastOffset = first.wpOffset
  private var lastSize = first.wpSize
  private var lastRet = first.wpRetBits
  private var lastXt = first.wpXtBits
  private var lastYt = first.wpYtBits
  private var lastZt = first.wpZtBits
  private var symLast = 0
  private var lastDiff32 = 0
  private val mIndex = new AcModel(256, forEncode)
  private val mOffsetSym = Array.fill(4)(new AcModel(4, forEncode))
  private val icOffsetDiff = new IntCompressor(1, 32, forEncode)
  private val icPacketSize = new IntCompressor(1, 32, forEncode)
  private val icReturnPoint = new IntCompressor(1, 32, forEncode)
  private val icXyz = new IntCompressor(3, 32, forEncode)

  def write(enc: AcEncoder, p: PointBuf): Unit = {
    enc.encodeSymbol(mIndex, p.wpIndex & 0xFF)
    val diff = p.wpOffset - lastOffset
    val sym =
      if (p.wpOffset == lastOffset) 0
      else if (p.wpOffset == lastOffset + (lastSize.toLong & 0xFFFFFFFFL)) 1
      else if (diff >= Int.MinValue.toLong && diff <= Int.MaxValue.toLong) 2
      else 3
    enc.encodeSymbol(mOffsetSym(symLast), sym)
    symLast = sym
    if (sym == 2) {
      icOffsetDiff.compress(enc, lastDiff32, diff.toInt, 0)
      lastDiff32 = diff.toInt
    } else if (sym == 3) {
      // laszip writeInt64 order: LOW word first, then high
      enc.writeBits(32, p.wpOffset & 0xFFFFFFFFL)
      enc.writeBits(32, (p.wpOffset >>> 32) & 0xFFFFFFFFL)
    }
    icPacketSize.compress(enc, lastSize, p.wpSize, 0)
    icReturnPoint.compress(enc, lastRet, p.wpRetBits, 0)
    icXyz.compress(enc, lastXt, p.wpXtBits, 0)
    icXyz.compress(enc, lastYt, p.wpYtBits, 1)
    icXyz.compress(enc, lastZt, p.wpZtBits, 2)
    lastIndex = p.wpIndex & 0xFF
    lastOffset = p.wpOffset
    lastSize = p.wpSize
    lastRet = p.wpRetBits
    lastXt = p.wpXtBits; lastYt = p.wpYtBits; lastZt = p.wpZtBits
  }

  def read(dec: AcDecoder, p: PointBuf): Unit = {
    p.wpIndex = dec.decodeSymbol(mIndex)
    val sym = dec.decodeSymbol(mOffsetSym(symLast))
    symLast = sym
    p.wpOffset = sym match {
      case 0 => lastOffset
      case 1 => lastOffset + (lastSize.toLong & 0xFFFFFFFFL)
      case 2 =>
        val d = icOffsetDiff.decompress(dec, lastDiff32, 0)
        lastDiff32 = d
        lastOffset + d.toLong
      case _ =>
        // laszip readInt64 order: LOW word first, then high
        val lo = dec.readBits(32) & 0xFFFFFFFFL
        val hi = dec.readBits(32) & 0xFFFFFFFFL
        (hi << 32) | lo
    }
    p.wpSize = icPacketSize.decompress(dec, lastSize, 0)
    p.wpRetBits = icReturnPoint.decompress(dec, lastRet, 0)
    p.wpXtBits = icXyz.decompress(dec, lastXt, 0)
    p.wpYtBits = icXyz.decompress(dec, lastYt, 1)
    p.wpZtBits = icXyz.decompress(dec, lastZt, 2)
    lastIndex = p.wpIndex
    lastOffset = p.wpOffset
    lastSize = p.wpSize
    lastRet = p.wpRetBits
    lastXt = p.wpXtBits; lastYt = p.wpYtBits; lastZt = p.wpZtBits
  }
}
