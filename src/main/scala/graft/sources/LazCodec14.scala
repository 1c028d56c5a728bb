package graft.sources

/** Pure-JVM LASzip v3 ("native LAS 1.4 extension") item codecs —
  * POINT14 / RGB14 / RGBNIR14, the layered codec family conformant
  * COPC stores its point chunks in (COPC 1.0 requires LAS 1.4 point
  * formats 6-8; reference `src/library/pctiler.cpp` produces exactly
  * such chunks through untwine). Implemented from the published
  * native-extension design (Isenburg, "LASzip lossless compression",
  * PE&RS 2013 + the native LAS 1.4 extension notes): the same FastAC
  * arithmetic coder and k-bit integer corrector as the v2 codecs in
  * [[LazCodec14$ LazCodec]], but
  *
  *  - **layered**: one point record is split across independent
  *    entropy streams (XY+returns+channel, Z, classification, flags,
  *    intensity, scan angle, user data, point source, GPS time, RGB,
  *    NIR). A reader decodes ONLY the layers its projection needs —
  *    column pruning reaches the codec — and layers whose field never
  *    changes inside a chunk are dropped to zero bytes.
  *  - **scanner-channel contexts**: four complete model banks, one per
  *    LAS 1.4 scanner channel; a channel switch is coded in the XY
  *    layer and prediction continues from that channel's own history
  *    (a fresh channel seeds from the switching point's context).
  *  - **change-flag driven**: a per-point symbol in the XY layer says
  *    which fields changed, so every cross-layer context (GPS-change,
  *    scan-angle-change, return shape) is decodable from the XY layer
  *    alone — the property that makes layer pruning sound.
  *
  * Conformance note (same boundary LazSpec documents for v2): no
  * external laszip binary or LAS 1.4 .laz fixture exists in this
  * sandbox, so wire-level conformance is unprovable here; encoder and
  * decoder are proven byte-exact round-trip (Laz14Spec). Two details
  * the published sources pin with constants we cannot reproduce
  * in-sandbox are implemented as documented deterministic choices:
  * the 16×16 return-count context fold tables (derived here by
  * clamping the published 8×8 v2 tables and bucketing to 6/8
  * contexts), and change-flag comparisons on a channel switch (made
  * against the TARGET channel's own last point — the self-consistent
  * reading; a fresh target seeds from the switching point, so the two
  * readings coincide everywhere except re-entry into an already-used
  * channel).
  */
private[sources] final class Point14 {
  var x = 0; var y = 0; var z = 0
  var intensity = 0 // u16
  var returnNumber = 0 // 0-15
  var numberOfReturns = 0 // 0-15
  var classificationFlags = 0 // 0-15
  var scannerChannel = 0 // 0-3
  var scanDirection = 0 // 0/1
  var edgeOfFlight = 0 // 0/1
  var classification = 0 // u8
  var userData = 0 // u8
  var scanAngle = 0 // raw u16 (i16 reinterpreted)
  var pointSource = 0 // u16
  var gpsBits = 0L // f64 raw bits
  var red = 0; var green = 0; var blue = 0; var nir = 0 // u16 each
  var extra: Array[Int] = null // LAS extra bytes (u8 each), BYTE14 item
  // wave packet (formats 9/10): WAVEPACKET14 item fields
  var wpIndex = 0 // u8
  var wpOffset = 0L // u64
  var wpSize = 0 // u32
  var wpRetBits = 0 // f32 bits
  var wpXtBits = 0; var wpYtBits = 0; var wpZtBits = 0 // f32 bits
  /** Whether GPS time changed on the transition INTO this point —
    * model context for the NEXT point's change symbol. */
  var gpsTimeChange = false

  def copyFrom(o: Point14): Unit = {
    x = o.x; y = o.y; z = o.z
    intensity = o.intensity
    returnNumber = o.returnNumber; numberOfReturns = o.numberOfReturns
    classificationFlags = o.classificationFlags; scannerChannel = o.scannerChannel
    scanDirection = o.scanDirection; edgeOfFlight = o.edgeOfFlight
    classification = o.classification; userData = o.userData
    scanAngle = o.scanAngle; pointSource = o.pointSource
    gpsBits = o.gpsBits
    red = o.red; green = o.green; blue = o.blue; nir = o.nir
    extra = if (o.extra == null) null else o.extra.clone()
    wpIndex = o.wpIndex; wpOffset = o.wpOffset; wpSize = o.wpSize
    wpRetBits = o.wpRetBits; wpXtBits = o.wpXtBits; wpYtBits = o.wpYtBits; wpZtBits = o.wpZtBits
    gpsTimeChange = o.gpsTimeChange
  }
}

private[sources] object Laz14Tables {
  import LazTables.{NumberReturnMap, NumberReturnLevel}
  private def clamp7(v: Int): Int = if (v > 7) 7 else v
  /** 6-context return fold: the v2 16-value map bucketed monotonically
    * to {0..5}; indices clamped to the published 8×8 domain. */
  val M6: Array[Array[Int]] = Array.tabulate(16, 16) { (n, r) =>
    NumberReturnMap(clamp7(n))(clamp7(r)) match {
      case v if v <= 2 => v
      case v if v <= 4 => 3
      case v if v <= 7 => 4
      case _ => 5
    }
  }
  /** 8-context return level (already 0..7 on the clamped domain). */
  val L8: Array[Array[Int]] = Array.tabulate(16, 16)((n, r) => NumberReturnLevel(clamp7(n))(clamp7(r)))
}

/** One scanner channel's complete model bank + prediction history for
  * the POINT14 layers. Model banks with many members are lazy — real
  * clouds touch a handful of classifications/flag bytes. */
private[sources] final class Ctx14(forEncode: Boolean) {
  var unused = true
  val last = new Point14
  // XY / Z history
  var xMed: Array[Median5] = null
  var yMed: Array[Median5] = null
  val lastZ = new Array[Int](8)
  val lastIntensity = new Array[Int](8)
  // models (created by init)
  var mChanged: Array[AcModel] = null // 8 × 128-symbol
  var mScannerChannel: AcModel = null // 3
  var mNumReturns: Array[AcModel] = null // 16 × 16, lazy
  var mReturnNoGps: AcModel = null // 13
  var mReturnGps: Array[AcModel] = null // 16 × 16, lazy
  var icDx: IntCompressor = null
  var icDy: IntCompressor = null
  var icZ: IntCompressor = null
  var mClass: Array[AcModel] = null // 64 × 256, lazy
  var mFlags: Array[AcModel] = null // 64 × 64, lazy
  var mUserData: Array[AcModel] = null // 64 × 256, lazy
  var icIntensity: IntCompressor = null
  var icScanAngle: IntCompressor = null
  var icPointSource: IntCompressor = null
  // GPS time: four sequences (the v2 GPSTIME11 state, per channel)
  var gpsLast = 0
  var gpsNext = 0
  val lastGps = new Array[Long](4)
  val lastGpsDiff = new Array[Int](4)
  val gpsExtreme = new Array[Int](4)
  var mGpsMulti: AcModel = null // 516
  var mGps0Diff: AcModel = null // 6
  var icGps: IntCompressor = null

  def init(seed: Point14): Unit = {
    last.copyFrom(seed)
    last.gpsTimeChange = false
    xMed = Array.fill(12)(new Median5)
    yMed = Array.fill(12)(new Median5)
    java.util.Arrays.fill(lastZ, seed.z)
    java.util.Arrays.fill(lastIntensity, seed.intensity)
    mChanged = Array.fill(8)(new AcModel(128, forEncode))
    mScannerChannel = new AcModel(3, forEncode)
    mNumReturns = new Array[AcModel](16)
    mReturnNoGps = new AcModel(13, forEncode)
    mReturnGps = new Array[AcModel](16)
    icDx = new IntCompressor(2, 32, forEncode)
    icDy = new IntCompressor(22, 32, forEncode)
    icZ = new IntCompressor(20, 32, forEncode)
    mClass = new Array[AcModel](64)
    mFlags = new Array[AcModel](64)
    mUserData = new Array[AcModel](64)
    icIntensity = new IntCompressor(4, 16, forEncode)
    icScanAngle = new IntCompressor(2, 16, forEncode)
    icPointSource = new IntCompressor(1, 16, forEncode)
    gpsLast = 0; gpsNext = 0
    java.util.Arrays.fill(lastGps, 0L)
    java.util.Arrays.fill(lastGpsDiff, 0)
    java.util.Arrays.fill(gpsExtreme, 0)
    lastGps(0) = seed.gpsBits
    mGpsMulti = new AcModel(516, forEncode)
    mGps0Diff = new AcModel(6, forEncode)
    icGps = new IntCompressor(9, 32, forEncode)
    unused = false
  }

  private val fe = forEncode
  def numReturnsModel(i: Int): AcModel = {
    if (mNumReturns(i) == null) mNumReturns(i) = new AcModel(16, fe); mNumReturns(i)
  }
  def returnGpsModel(i: Int): AcModel = {
    if (mReturnGps(i) == null) mReturnGps(i) = new AcModel(16, fe); mReturnGps(i)
  }
  def classModel(i: Int): AcModel = { if (mClass(i) == null) mClass(i) = new AcModel(256, fe); mClass(i) }
  def flagsModel(i: Int): AcModel = { if (mFlags(i) == null) mFlags(i) = new AcModel(64, fe); mFlags(i) }
  def userDataModel(i: Int): AcModel = {
    if (mUserData(i) == null) mUserData(i) = new AcModel(256, fe); mUserData(i)
  }
}

private[sources] object Point14V3 {
  // GPSTIME11 constants (identical to the v2 item, per-channel here)
  val Multi = 500
  val MultiMinus = -10
  val MultiUnchanged: Int = Multi - MultiMinus + 1 // 511
  val MultiCodeFull: Int = Multi - MultiMinus + 2 // 512
  def quantize(f: Float): Int = if (f >= 0) (f + 0.5f).toInt else (f - 0.5f).toInt

  // layer indices (point item); RGB / NIR ride in their own streams
  val LayerXY = 0
  val LayerZ = 1
  val LayerCls = 2
  val LayerFlg = 3
  val LayerInt = 4
  val LayerSca = 5
  val LayerUsr = 6
  val LayerPsr = 7
  val LayerGps = 8
  val NumPointLayers = 9
}

/** POINT14 v3 layered encoder: nine per-field entropy streams behind
  * four scanner-channel contexts. [[layers]] returns each stream's
  * bytes, empty for field layers no point ever changed. */
private[sources] final class Point14V3Enc(seed: Point14) {
  import Point14V3._
  import Laz14Tables._

  private val ctxs = Array.fill(4)(new Ctx14(forEncode = true))
  private var cur = seed.scannerChannel & 3
  ctxs(cur).init(seed)

  val encXY = new AcEncoder
  val encZ = new AcEncoder
  private val encCls = new AcEncoder
  private val encFlg = new AcEncoder
  private val encInt = new AcEncoder
  private val encSca = new AcEncoder
  private val encUsr = new AcEncoder
  private val encPsr = new AcEncoder
  private val encGps = new AcEncoder
  private var changedCls = false
  private var changedFlg = false
  private var changedInt = false
  private var changedSca = false
  private var changedUsr = false
  private var changedPsr = false
  private var changedGps = false

  /** The channel context after the last write — RGB/NIR codecs follow it. */
  def currentContext: Int = cur

  def write(p: Point14): Unit = {
    val old = ctxs(cur)
    // change-symbol model context from the LAST point's return shape
    val lpr = (if (old.last.returnNumber == 1) 1 else 0) +
      (if (old.last.returnNumber >= old.last.numberOfReturns) 2 else 0) +
      (if (old.last.gpsTimeChange) 4 else 0)
    val target = p.scannerChannel & 3
    val scChange = target != cur
    // comparisons run against the TARGET channel's own history (a
    // fresh target seeds from the switching point's context) — see
    // the conformance note in the file Scaladoc
    if (scChange && ctxs(target).unused) ctxs(target).init(old.last)
    val c = ctxs(target)
    val lastN = c.last.numberOfReturns
    val lastR = c.last.returnNumber
    val n = p.numberOfReturns & 15
    val r = p.returnNumber & 15
    val psChange = p.pointSource != c.last.pointSource
    val gpsChange = p.gpsBits != c.last.gpsBits
    val saChange = p.scanAngle != c.last.scanAngle
    val rBits =
      if (r == lastR) 0
      else if (r == ((lastR + 1) & 15)) 1
      else if (r == ((lastR + 15) & 15)) 2
      else 3
    val changed = (if (scChange) 64 else 0) | (if (psChange) 32 else 0) |
      (if (gpsChange) 16 else 0) | (if (saChange) 8 else 0) |
      (if (n != lastN) 4 else 0) | rBits
    encXY.encodeSymbol(old.mChanged(lpr), changed)
    if (scChange) {
      encXY.encodeSymbol(old.mScannerChannel, ((target - cur + 4) & 3) - 1)
      cur = target
    }
    if ((changed & 4) != 0) encXY.encodeSymbol(c.numReturnsModel(lastN), n)
    if (rBits == 3) {
      if (gpsChange) encXY.encodeSymbol(c.returnGpsModel(lastR), r)
      else encXY.encodeSymbol(c.mReturnNoGps, ((r + 16 - lastR) & 15) - 2)
    }

    val m = M6(n)(r)
    val l = L8(n)(r)
    val cpr = (if (r == 1) 2 else 0) + (if (r >= n) 1 else 0)
    val gBit = if (gpsChange) 1 else 0
    val mIdx = (m << 1) | gBit
    val ctx1 = if (n == 1) 1 else 0

    val dx = p.x - c.last.x
    c.icDx.compress(encXY, c.xMed(mIdx).get, dx, ctx1)
    c.xMed(mIdx).add(dx)
    val kx = c.icDx.k
    val dy = p.y - c.last.y
    c.icDy.compress(encXY, c.yMed(mIdx).get, dy, ctx1 + (if (kx < 20) kx & 0xFE else 20))
    c.yMed(mIdx).add(dy)

    val kz = (c.icDx.k + c.icDy.k) / 2
    c.icZ.compress(encZ, c.lastZ(l), p.z, ctx1 + (if (kz < 18) kz & 0xFE else 18))
    c.lastZ(l) = p.z

    if (p.classification != c.last.classification) changedCls = true
    val ccc = ((c.last.classification & 0x1F) << 1) + (if (cpr == 3) 1 else 0)
    encCls.encodeSymbol(c.classModel(ccc), p.classification)

    val lastFlg = (c.last.edgeOfFlight << 5) | (c.last.scanDirection << 4) | c.last.classificationFlags
    val flg = (p.edgeOfFlight << 5) | (p.scanDirection << 4) | p.classificationFlags
    if (flg != lastFlg) changedFlg = true
    encFlg.encodeSymbol(c.flagsModel(lastFlg), flg)

    if (p.intensity != c.last.intensity) changedInt = true
    val iIdx = (cpr << 1) | gBit
    c.icIntensity.compress(encInt, c.lastIntensity(iIdx), p.intensity, cpr)
    c.lastIntensity(iIdx) = p.intensity

    if (saChange) {
      changedSca = true
      c.icScanAngle.compress(encSca, c.last.scanAngle, p.scanAngle, gBit)
    }

    if (p.userData != c.last.userData) changedUsr = true
    encUsr.encodeSymbol(c.userDataModel(c.last.userData / 4), p.userData)

    if (psChange) {
      changedPsr = true
      c.icPointSource.compress(encPsr, c.last.pointSource, p.pointSource, 0)
    }

    if (gpsChange) { changedGps = true; writeGps(c, p.gpsBits) }

    c.last.copyFrom(p)
    c.last.gpsTimeChange = gpsChange
  }

  private def writeGps(c: Ctx14, bits: Long): Unit = {
    if (c.lastGpsDiff(c.gpsLast) == 0) {
      if (bits == c.lastGps(c.gpsLast)) encGps.encodeSymbol(c.mGps0Diff, 0)
      else {
        val diff64 = bits - c.lastGps(c.gpsLast)
        val diff32 = diff64.toInt
        if (diff64 == diff32.toLong) {
          encGps.encodeSymbol(c.mGps0Diff, 1)
          c.icGps.compress(encGps, 0, diff32, 0)
          c.lastGpsDiff(c.gpsLast) = diff32
          c.gpsExtreme(c.gpsLast) = 0
          c.lastGps(c.gpsLast) = bits
        } else {
          var i = 1
          while (i < 4) {
            val od = bits - c.lastGps((c.gpsLast + i) & 3)
            if (od == od.toInt.toLong) {
              encGps.encodeSymbol(c.mGps0Diff, i + 2)
              c.gpsLast = (c.gpsLast + i) & 3
              writeGps(c, bits)
              return
            }
            i += 1
          }
          encGps.encodeSymbol(c.mGps0Diff, 2)
          c.icGps.compress(encGps, (c.lastGps(c.gpsLast) >>> 32).toInt, (bits >>> 32).toInt, 8)
          encGps.writeInt(bits.toInt)
          c.gpsNext = (c.gpsNext + 1) & 3
          c.gpsLast = c.gpsNext
          c.lastGps(c.gpsLast) = bits
          c.lastGpsDiff(c.gpsLast) = 0
          c.gpsExtreme(c.gpsLast) = 0
        }
      }
    } else {
      if (bits == c.lastGps(c.gpsLast)) encGps.encodeSymbol(c.mGpsMulti, Point14V3.MultiUnchanged)
      else {
        val diff64 = bits - c.lastGps(c.gpsLast)
        val diff32 = diff64.toInt
        if (diff64 == diff32.toLong) {
          val multi = Point14V3.quantize(diff32.toFloat / c.lastGpsDiff(c.gpsLast).toFloat)
          if (multi == 1) {
            encGps.encodeSymbol(c.mGpsMulti, 1)
            c.icGps.compress(encGps, c.lastGpsDiff(c.gpsLast), diff32, 1)
            c.gpsExtreme(c.gpsLast) = 0
          } else if (multi > 0) {
            if (multi < Point14V3.Multi) {
              encGps.encodeSymbol(c.mGpsMulti, multi)
              c.icGps.compress(encGps, multi * c.lastGpsDiff(c.gpsLast), diff32, if (multi < 10) 2 else 3)
            } else {
              encGps.encodeSymbol(c.mGpsMulti, Point14V3.Multi)
              c.icGps.compress(encGps, Point14V3.Multi * c.lastGpsDiff(c.gpsLast), diff32, 4)
              c.gpsExtreme(c.gpsLast) += 1
              if (c.gpsExtreme(c.gpsLast) > 3) { c.lastGpsDiff(c.gpsLast) = diff32; c.gpsExtreme(c.gpsLast) = 0 }
            }
          } else if (multi < 0) {
            if (multi > Point14V3.MultiMinus) {
              encGps.encodeSymbol(c.mGpsMulti, Point14V3.Multi - multi)
              c.icGps.compress(encGps, multi * c.lastGpsDiff(c.gpsLast), diff32, 5)
            } else {
              encGps.encodeSymbol(c.mGpsMulti, Point14V3.Multi - Point14V3.MultiMinus)
              c.icGps.compress(encGps, Point14V3.MultiMinus * c.lastGpsDiff(c.gpsLast), diff32, 6)
              c.gpsExtreme(c.gpsLast) += 1
              if (c.gpsExtreme(c.gpsLast) > 3) { c.lastGpsDiff(c.gpsLast) = diff32; c.gpsExtreme(c.gpsLast) = 0 }
            }
          } else {
            encGps.encodeSymbol(c.mGpsMulti, 0)
            c.icGps.compress(encGps, 0, diff32, 7)
            c.gpsExtreme(c.gpsLast) += 1
            if (c.gpsExtreme(c.gpsLast) > 3) { c.lastGpsDiff(c.gpsLast) = diff32; c.gpsExtreme(c.gpsLast) = 0 }
          }
          c.lastGps(c.gpsLast) = bits
        } else {
          var i = 1
          while (i < 4) {
            val od = bits - c.lastGps((c.gpsLast + i) & 3)
            if (od == od.toInt.toLong) {
              encGps.encodeSymbol(c.mGpsMulti, Point14V3.MultiCodeFull + i)
              c.gpsLast = (c.gpsLast + i) & 3
              writeGps(c, bits)
              return
            }
            i += 1
          }
          encGps.encodeSymbol(c.mGpsMulti, Point14V3.MultiCodeFull)
          c.icGps.compress(encGps, (c.lastGps(c.gpsLast) >>> 32).toInt, (bits >>> 32).toInt, 8)
          encGps.writeInt(bits.toInt)
          c.gpsNext = (c.gpsNext + 1) & 3
          c.gpsLast = c.gpsNext
          c.lastGps(c.gpsLast) = bits
          c.lastGpsDiff(c.gpsLast) = 0
          c.gpsExtreme(c.gpsLast) = 0
        }
      }
    }
  }

  /** Finish all streams; field layers nothing changed collapse to 0
    * bytes (the decoder reconstructs them as constant = seed). */
  def layers(): Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](Point14V3.NumPointLayers)
    def fin(e: AcEncoder, keep: Boolean): Array[Byte] =
      if (keep) { e.done(); e.result() } else Array.empty[Byte]
    out(Point14V3.LayerXY) = fin(encXY, keep = true)
    out(Point14V3.LayerZ) = fin(encZ, keep = true)
    out(Point14V3.LayerCls) = fin(encCls, changedCls)
    out(Point14V3.LayerFlg) = fin(encFlg, changedFlg)
    out(Point14V3.LayerInt) = fin(encInt, changedInt)
    out(Point14V3.LayerSca) = fin(encSca, changedSca)
    out(Point14V3.LayerUsr) = fin(encUsr, changedUsr)
    out(Point14V3.LayerPsr) = fin(encPsr, changedPsr)
    out(Point14V3.LayerGps) = fin(encGps, changedGps)
    out
  }
}

/** POINT14 v3 layered decoder. `want*` flags prune layers — skipped
  * layers cost zero decode work and their fields hold the chunk seed
  * (callers never project them). A zero-length layer means the field
  * never changed in the chunk. */
private[sources] final class Point14V3Dec(
    seed: Point14,
    buf: Array[Byte],
    layerStart: Array[Int],
    layerEnd: Array[Int],
    wantZ: Boolean,
    wantCls: Boolean,
    wantFlg: Boolean,
    wantInt: Boolean,
    wantSca: Boolean,
    wantUsr: Boolean,
    wantPsr: Boolean,
    wantGps: Boolean
) {
  import Point14V3._
  import Laz14Tables._

  private val ctxs = Array.fill(4)(new Ctx14(forEncode = false))
  private var cur = seed.scannerChannel & 3
  ctxs(cur).init(seed)

  private def mk(layer: Int, want: Boolean): AcDecoder =
    if (want && layerEnd(layer) > layerStart(layer)) new AcDecoder(buf, layerStart(layer), layerEnd(layer))
    else null
  private val decXY = new AcDecoder(buf, layerStart(LayerXY), layerEnd(LayerXY))
  private val decZ = mk(LayerZ, wantZ)
  private val decCls = mk(LayerCls, wantCls)
  private val decFlg = mk(LayerFlg, wantFlg)
  private val decInt = mk(LayerInt, wantInt)
  private val decSca = mk(LayerSca, wantSca)
  private val decUsr = mk(LayerUsr, wantUsr)
  private val decPsr = mk(LayerPsr, wantPsr)
  private val decGps = mk(LayerGps, wantGps)

  def currentContext: Int = cur

  def read(p: Point14): Unit = {
    val old = ctxs(cur)
    val lpr = (if (old.last.returnNumber == 1) 1 else 0) +
      (if (old.last.returnNumber >= old.last.numberOfReturns) 2 else 0) +
      (if (old.last.gpsTimeChange) 4 else 0)
    val changed = decXY.decodeSymbol(old.mChanged(lpr))
    if ((changed & 64) != 0) {
      val target = (cur + decXY.decodeSymbol(old.mScannerChannel) + 1) & 3
      if (ctxs(target).unused) ctxs(target).init(old.last)
      cur = target
    }
    val c = ctxs(cur)
    val lastN = c.last.numberOfReturns
    val lastR = c.last.returnNumber
    val gpsChange = (changed & 16) != 0
    val n = if ((changed & 4) != 0) decXY.decodeSymbol(c.numReturnsModel(lastN)) else lastN
    val r = (changed & 3) match {
      case 0 => lastR
      case 1 => (lastR + 1) & 15
      case 2 => (lastR + 15) & 15
      case _ =>
        if (gpsChange) decXY.decodeSymbol(c.returnGpsModel(lastR))
        else (lastR + decXY.decodeSymbol(c.mReturnNoGps) + 2) & 15
    }

    val m = M6(n)(r)
    val l = L8(n)(r)
    val cpr = (if (r == 1) 2 else 0) + (if (r >= n) 1 else 0)
    val gBit = if (gpsChange) 1 else 0
    val mIdx = (m << 1) | gBit
    val ctx1 = if (n == 1) 1 else 0

    val dx = c.icDx.decompress(decXY, c.xMed(mIdx).get, ctx1)
    p.x = c.last.x + dx
    c.xMed(mIdx).add(dx)
    val kx = c.icDx.k
    val dy = c.icDy.decompress(decXY, c.yMed(mIdx).get, ctx1 + (if (kx < 20) kx & 0xFE else 20))
    p.y = c.last.y + dy
    c.yMed(mIdx).add(dy)

    if (decZ != null) {
      val kz = (c.icDx.k + c.icDy.k) / 2
      p.z = c.icZ.decompress(decZ, c.lastZ(l), ctx1 + (if (kz < 18) kz & 0xFE else 18))
      c.lastZ(l) = p.z
    } else p.z = c.last.z

    if (decCls != null) {
      val ccc = ((c.last.classification & 0x1F) << 1) + (if (cpr == 3) 1 else 0)
      p.classification = decCls.decodeSymbol(c.classModel(ccc))
    } else p.classification = c.last.classification

    if (decFlg != null) {
      val lastFlg = (c.last.edgeOfFlight << 5) | (c.last.scanDirection << 4) | c.last.classificationFlags
      val flg = decFlg.decodeSymbol(c.flagsModel(lastFlg))
      p.classificationFlags = flg & 15
      p.scanDirection = (flg >>> 4) & 1
      p.edgeOfFlight = (flg >>> 5) & 1
    } else {
      p.classificationFlags = c.last.classificationFlags
      p.scanDirection = c.last.scanDirection
      p.edgeOfFlight = c.last.edgeOfFlight
    }

    if (decInt != null) {
      val iIdx = (cpr << 1) | gBit
      p.intensity = c.icIntensity.decompress(decInt, c.lastIntensity(iIdx), cpr) & 0xFFFF
      c.lastIntensity(iIdx) = p.intensity
    } else p.intensity = c.last.intensity

    if ((changed & 8) != 0 && decSca != null)
      p.scanAngle = c.icScanAngle.decompress(decSca, c.last.scanAngle, gBit) & 0xFFFF
    else p.scanAngle = c.last.scanAngle

    if (decUsr != null) p.userData = decUsr.decodeSymbol(c.userDataModel(c.last.userData / 4))
    else p.userData = c.last.userData

    if ((changed & 32) != 0 && decPsr != null)
      p.pointSource = c.icPointSource.decompress(decPsr, c.last.pointSource, 0) & 0xFFFF
    else p.pointSource = c.last.pointSource

    if (gpsChange && decGps != null) p.gpsBits = readGps(c)
    else p.gpsBits = c.last.gpsBits

    p.returnNumber = r
    p.numberOfReturns = n
    p.scannerChannel = cur
    c.last.copyFrom(p)
    c.last.gpsTimeChange = gpsChange
  }

  private def readGps(c: Ctx14): Long = {
    if (c.lastGpsDiff(c.gpsLast) == 0) {
      val multi = decGps.decodeSymbol(c.mGps0Diff)
      if (multi == 1) {
        c.lastGpsDiff(c.gpsLast) = c.icGps.decompress(decGps, 0, 0)
        c.lastGps(c.gpsLast) += c.lastGpsDiff(c.gpsLast).toLong
        c.gpsExtreme(c.gpsLast) = 0
      } else if (multi == 2) {
        c.gpsNext = (c.gpsNext + 1) & 3
        val hi = c.icGps.decompress(decGps, (c.lastGps(c.gpsLast) >>> 32).toInt, 8)
        c.lastGps(c.gpsNext) = (hi.toLong << 32) | (decGps.readInt().toLong & 0xFFFFFFFFL)
        c.gpsLast = c.gpsNext
        c.lastGpsDiff(c.gpsLast) = 0
        c.gpsExtreme(c.gpsLast) = 0
      } else if (multi > 2) {
        c.gpsLast = (c.gpsLast + multi - 2) & 3
        return readGps(c)
      }
    } else {
      val multi = decGps.decodeSymbol(c.mGpsMulti)
      if (multi == 1) {
        c.lastGps(c.gpsLast) += c.icGps.decompress(decGps, c.lastGpsDiff(c.gpsLast), 1).toLong
        c.gpsExtreme(c.gpsLast) = 0
      } else if (multi < Point14V3.MultiUnchanged) {
        var diff = 0
        if (multi == 0) {
          diff = c.icGps.decompress(decGps, 0, 7)
          c.gpsExtreme(c.gpsLast) += 1
          if (c.gpsExtreme(c.gpsLast) > 3) { c.lastGpsDiff(c.gpsLast) = diff; c.gpsExtreme(c.gpsLast) = 0 }
        } else if (multi < Point14V3.Multi) {
          diff = c.icGps.decompress(decGps, multi * c.lastGpsDiff(c.gpsLast), if (multi < 10) 2 else 3)
        } else if (multi == Point14V3.Multi) {
          diff = c.icGps.decompress(decGps, Point14V3.Multi * c.lastGpsDiff(c.gpsLast), 4)
          c.gpsExtreme(c.gpsLast) += 1
          if (c.gpsExtreme(c.gpsLast) > 3) { c.lastGpsDiff(c.gpsLast) = diff; c.gpsExtreme(c.gpsLast) = 0 }
        } else {
          val neg = Point14V3.Multi - multi
          if (neg > Point14V3.MultiMinus) diff = c.icGps.decompress(decGps, neg * c.lastGpsDiff(c.gpsLast), 5)
          else {
            diff = c.icGps.decompress(decGps, Point14V3.MultiMinus * c.lastGpsDiff(c.gpsLast), 6)
            c.gpsExtreme(c.gpsLast) += 1
            if (c.gpsExtreme(c.gpsLast) > 3) { c.lastGpsDiff(c.gpsLast) = diff; c.gpsExtreme(c.gpsLast) = 0 }
          }
        }
        c.lastGps(c.gpsLast) += diff.toLong
      } else if (multi == Point14V3.MultiCodeFull) {
        c.gpsNext = (c.gpsNext + 1) & 3
        val hi = c.icGps.decompress(decGps, (c.lastGps(c.gpsLast) >>> 32).toInt, 8)
        c.lastGps(c.gpsNext) = (hi.toLong << 32) | (decGps.readInt().toLong & 0xFFFFFFFFL)
        c.gpsLast = c.gpsNext
        c.lastGpsDiff(c.gpsLast) = 0
        c.gpsExtreme(c.gpsLast) = 0
      } else if (multi > Point14V3.MultiCodeFull) {
        c.gpsLast = (c.gpsLast + multi - Point14V3.MultiCodeFull) & 3
        return readGps(c)
      }
    }
    c.lastGps(c.gpsLast)
  }
}

/** RGB14 v3: the RGB12 inter-channel byte-difference model behind
  * four scanner-channel contexts, in its own layer. */
private[sources] final class Rgb14V3(forEncode: Boolean, seed: Point14) {
  import LazTables._
  private final class RgbCtx {
    var unused = true
    var lastR = 0; var lastG = 0; var lastB = 0
    var mByteUsed: AcModel = null
    var mDiff: Array[AcModel] = null
    def init(r: Int, g: Int, b: Int): Unit = {
      lastR = r; lastG = g; lastB = b
      mByteUsed = new AcModel(128, forEncode)
      mDiff = Array.fill(6)(new AcModel(256, forEncode))
      unused = false
    }
  }
  private val ctxs = Array.fill(4)(new RgbCtx)
  private var cur = seed.scannerChannel & 3
  ctxs(cur).init(seed.red, seed.green, seed.blue)
  var changed = false

  private def switchTo(context: Int): RgbCtx = {
    if (context != cur) {
      val old = ctxs(cur)
      if (ctxs(context).unused) ctxs(context).init(old.lastR, old.lastG, old.lastB)
      cur = context
    }
    ctxs(cur)
  }

  def write(enc: AcEncoder, p: Point14, context: Int): Unit = {
    val c = switchTo(context)
    val r = p.red & 0xFFFF; val g = p.green & 0xFFFF; val b = p.blue & 0xFFFF
    if (r != c.lastR || g != c.lastG || b != c.lastB) changed = true
    var sym = 0
    if ((r & 0xFF) != (c.lastR & 0xFF)) sym |= 1
    if ((r & 0xFF00) != (c.lastR & 0xFF00)) sym |= 2
    val notGray = (r & 0xFF) != (g & 0xFF) || (r & 0xFF) != (b & 0xFF) ||
      (r & 0xFF00) != (g & 0xFF00) || (r & 0xFF00) != (b & 0xFF00)
    if (notGray) {
      sym |= 64
      if ((g & 0xFF) != (c.lastG & 0xFF)) sym |= 4
      if ((g & 0xFF00) != (c.lastG & 0xFF00)) sym |= 8
      if ((b & 0xFF) != (c.lastB & 0xFF)) sym |= 16
      if ((b & 0xFF00) != (c.lastB & 0xFF00)) sym |= 32
    }
    enc.encodeSymbol(c.mByteUsed, sym)
    if ((sym & 1) != 0) enc.encodeSymbol(c.mDiff(0), u8Fold((r & 0xFF) - (c.lastR & 0xFF)))
    if ((sym & 2) != 0) enc.encodeSymbol(c.mDiff(1), u8Fold((r >>> 8) - (c.lastR >>> 8)))
    if ((sym & 64) != 0) {
      var diffL = (r & 0xFF) - (c.lastR & 0xFF)
      if ((sym & 4) != 0) enc.encodeSymbol(c.mDiff(2), u8Fold((g & 0xFF) - u8Clamp(diffL + (c.lastG & 0xFF))))
      if ((sym & 16) != 0) {
        diffL = (diffL + (g & 0xFF) - (c.lastG & 0xFF)) / 2
        enc.encodeSymbol(c.mDiff(4), u8Fold((b & 0xFF) - u8Clamp(diffL + (c.lastB & 0xFF))))
      }
      var diffH = (r >>> 8) - (c.lastR >>> 8)
      if ((sym & 8) != 0) enc.encodeSymbol(c.mDiff(3), u8Fold((g >>> 8) - u8Clamp(diffH + (c.lastG >>> 8))))
      if ((sym & 32) != 0) {
        diffH = (diffH + (g >>> 8) - (c.lastG >>> 8)) / 2
        enc.encodeSymbol(c.mDiff(5), u8Fold((b >>> 8) - u8Clamp(diffH + (c.lastB >>> 8))))
      }
    }
    c.lastR = r; c.lastG = g; c.lastB = b
  }

  def read(dec: AcDecoder, p: Point14, context: Int): Unit = {
    val c = switchTo(context)
    if (dec == null) { p.red = c.lastR; p.green = c.lastG; p.blue = c.lastB; return }
    val sym = dec.decodeSymbol(c.mByteUsed)
    var r =
      if ((sym & 1) != 0) u8Fold(dec.decodeSymbol(c.mDiff(0)) + (c.lastR & 0xFF))
      else c.lastR & 0xFF
    r |=
      (if ((sym & 2) != 0) u8Fold(dec.decodeSymbol(c.mDiff(1)) + (c.lastR >>> 8)) << 8
       else c.lastR & 0xFF00)
    var g = 0
    var b = 0
    if ((sym & 64) != 0) {
      var diffL = (r & 0xFF) - (c.lastR & 0xFF)
      g =
        if ((sym & 4) != 0) u8Fold(dec.decodeSymbol(c.mDiff(2)) + u8Clamp(diffL + (c.lastG & 0xFF)))
        else c.lastG & 0xFF
      if ((sym & 16) != 0) {
        diffL = (diffL + (g & 0xFF) - (c.lastG & 0xFF)) / 2
        b = u8Fold(dec.decodeSymbol(c.mDiff(4)) + u8Clamp(diffL + (c.lastB & 0xFF)))
      } else b = c.lastB & 0xFF
      var diffH = (r >>> 8) - (c.lastR >>> 8)
      if ((sym & 8) != 0) g |= u8Fold(dec.decodeSymbol(c.mDiff(3)) + u8Clamp(diffH + (c.lastG >>> 8))) << 8
      else g |= c.lastG & 0xFF00
      if ((sym & 32) != 0) {
        diffH = (diffH + (g >>> 8) - (c.lastG >>> 8)) / 2
        b |= u8Fold(dec.decodeSymbol(c.mDiff(5)) + u8Clamp(diffH + (c.lastB >>> 8))) << 8
      } else b |= c.lastB & 0xFF00
    } else { g = r; b = r }
    c.lastR = r; c.lastG = g; c.lastB = b
    p.red = r; p.green = g; p.blue = b
  }
}

/** BYTE14 v3 (LAS extra bytes): ONE layer per byte index — an
  * attribute subset decodes only its own streams — each byte coded as
  * a folded difference against its per-context last value, with a
  * 256-symbol model per (context, byte index). Constant bytes
  * collapse to zero-byte layers like every other v3 field. */
private[sources] final class Byte14V3(forEncode: Boolean, seed: Array[Int], channel: Int) {
  import LazTables._
  val num: Int = seed.length
  private final class ByteCtx {
    var unused = true
    var lastB: Array[Int] = null
    var models: Array[AcModel] = null
    def init(from: Array[Int]): Unit = {
      lastB = java.util.Arrays.copyOf(from, num)
      models = new Array[AcModel](num)
      unused = false
    }
    def model(i: Int): AcModel = {
      if (models(i) == null) models(i) = new AcModel(256, forEncode)
      models(i)
    }
  }
  private val ctxs = Array.fill(4)(new ByteCtx)
  private var cur = channel & 3
  ctxs(cur).init(seed)
  val changed = new Array[Boolean](num)

  private def switchTo(context: Int): ByteCtx = {
    if (context != cur) {
      val old = ctxs(cur)
      if (ctxs(context).unused) ctxs(context).init(old.lastB)
      cur = context
    }
    ctxs(cur)
  }

  def write(encs: Array[AcEncoder], bytes: Array[Int], context: Int): Unit = {
    val c = switchTo(context)
    var i = 0
    while (i < num) {
      val v = bytes(i) & 0xFF
      if (v != c.lastB(i)) changed(i) = true
      encs(i).encodeSymbol(c.model(i), u8Fold(v - c.lastB(i)))
      c.lastB(i) = v
      i += 1
    }
  }

  /** `decs(i)` null ⇒ layer i skipped (pruned or constant): the byte
    * holds its per-context last value. */
  def read(decs: Array[AcDecoder], out: Array[Int], context: Int): Unit = {
    val c = switchTo(context)
    var i = 0
    while (i < num) {
      if (decs(i) != null) c.lastB(i) = u8Fold(decs(i).decodeSymbol(c.model(i)) + c.lastB(i))
      out(i) = c.lastB(i)
      i += 1
    }
  }
}

/** NIR14 v3 (the near-infrared half of RGBNIR14): per-byte change
  * mask + byte-difference models, per scanner-channel context, own
  * layer. */
private[sources] final class Nir14V3(forEncode: Boolean, seed: Point14) {
  import LazTables._
  private final class NirCtx {
    var unused = true
    var lastNir = 0
    var mUsed: AcModel = null
    var mDiff0: AcModel = null
    var mDiff1: AcModel = null
    def init(v: Int): Unit = {
      lastNir = v
      mUsed = new AcModel(4, forEncode)
      mDiff0 = new AcModel(256, forEncode)
      mDiff1 = new AcModel(256, forEncode)
      unused = false
    }
  }
  private val ctxs = Array.fill(4)(new NirCtx)
  private var cur = seed.scannerChannel & 3
  ctxs(cur).init(seed.nir)
  var changed = false

  private def switchTo(context: Int): NirCtx = {
    if (context != cur) {
      val old = ctxs(cur)
      if (ctxs(context).unused) ctxs(context).init(old.lastNir)
      cur = context
    }
    ctxs(cur)
  }

  def write(enc: AcEncoder, p: Point14, context: Int): Unit = {
    val c = switchTo(context)
    val v = p.nir & 0xFFFF
    if (v != c.lastNir) changed = true
    var sym = 0
    if ((v & 0xFF) != (c.lastNir & 0xFF)) sym |= 1
    if ((v & 0xFF00) != (c.lastNir & 0xFF00)) sym |= 2
    enc.encodeSymbol(c.mUsed, sym)
    if ((sym & 1) != 0) enc.encodeSymbol(c.mDiff0, u8Fold((v & 0xFF) - (c.lastNir & 0xFF)))
    if ((sym & 2) != 0) enc.encodeSymbol(c.mDiff1, u8Fold((v >>> 8) - (c.lastNir >>> 8)))
    c.lastNir = v
  }

  def read(dec: AcDecoder, p: Point14, context: Int): Unit = {
    val c = switchTo(context)
    if (dec == null) { p.nir = c.lastNir; return }
    val sym = dec.decodeSymbol(c.mUsed)
    var v =
      if ((sym & 1) != 0) u8Fold(dec.decodeSymbol(c.mDiff0) + (c.lastNir & 0xFF))
      else c.lastNir & 0xFF
    v |=
      (if ((sym & 2) != 0) u8Fold(dec.decodeSymbol(c.mDiff1) + (c.lastNir >>> 8)) << 8
       else c.lastNir & 0xFF00)
    c.lastNir = v
    p.nir = v
  }
}

/** WAVEPACKET14 v3 item codec — the [[Wavepacket13V2]] scheme behind
  * the four scanner-channel contexts the other v3 items use: each
  * context keeps its own last packet + models, a fresh context seeds
  * from the channel it switched away from, and the whole layer
  * collapses to zero bytes when no packet field ever changes. */
private[sources] final class Wavepacket14V3(forEncode: Boolean, seed: Point14) {
  private final class WpCtx {
    var unused = true
    var lastIndex = 0
    var lastOffset = 0L
    var lastSize = 0
    var lastRet = 0
    var lastXt = 0; var lastYt = 0; var lastZt = 0
    var symLast = 0
    var lastDiff32 = 0
    var mIndex: AcModel = null
    var mOffsetSym: Array[AcModel] = null
    var icOffsetDiff: IntCompressor = null
    var icPacketSize: IntCompressor = null
    var icReturnPoint: IntCompressor = null
    var icXyz: IntCompressor = null
    def init(o: WpCtx): Unit = {
      lastIndex = o.lastIndex; lastOffset = o.lastOffset; lastSize = o.lastSize
      lastRet = o.lastRet; lastXt = o.lastXt; lastYt = o.lastYt; lastZt = o.lastZt
      initModels()
    }
    def initFrom(p: Point14): Unit = {
      lastIndex = p.wpIndex & 0xFF; lastOffset = p.wpOffset; lastSize = p.wpSize
      lastRet = p.wpRetBits; lastXt = p.wpXtBits; lastYt = p.wpYtBits; lastZt = p.wpZtBits
      initModels()
    }
    private def initModels(): Unit = {
      symLast = 0; lastDiff32 = 0
      mIndex = new AcModel(256, forEncode)
      mOffsetSym = Array.fill(4)(new AcModel(4, forEncode))
      icOffsetDiff = new IntCompressor(1, 32, forEncode)
      icPacketSize = new IntCompressor(1, 32, forEncode)
      icReturnPoint = new IntCompressor(1, 32, forEncode)
      icXyz = new IntCompressor(3, 32, forEncode)
      unused = false
    }
  }
  private val ctxs = Array.fill(4)(new WpCtx)
  private var cur = seed.scannerChannel & 3
  ctxs(cur).initFrom(seed)
  var changed = false

  private def switchTo(context: Int): WpCtx = {
    if (context != cur) {
      val old = ctxs(cur)
      if (ctxs(context).unused) ctxs(context).init(old)
      cur = context
    }
    ctxs(cur)
  }

  def write(enc: AcEncoder, p: Point14, context: Int): Unit = {
    val c = switchTo(context)
    if ((p.wpIndex & 0xFF) != c.lastIndex || p.wpOffset != c.lastOffset || p.wpSize != c.lastSize ||
      p.wpRetBits != c.lastRet || p.wpXtBits != c.lastXt || p.wpYtBits != c.lastYt || p.wpZtBits != c.lastZt)
      changed = true
    enc.encodeSymbol(c.mIndex, p.wpIndex & 0xFF)
    val diff = p.wpOffset - c.lastOffset
    val sym =
      if (p.wpOffset == c.lastOffset) 0
      else if (p.wpOffset == c.lastOffset + (c.lastSize.toLong & 0xFFFFFFFFL)) 1
      else if (diff >= Int.MinValue.toLong && diff <= Int.MaxValue.toLong) 2
      else 3
    enc.encodeSymbol(c.mOffsetSym(c.symLast), sym)
    c.symLast = sym
    if (sym == 2) {
      c.icOffsetDiff.compress(enc, c.lastDiff32, diff.toInt, 0)
      c.lastDiff32 = diff.toInt
    } else if (sym == 3) {
      // laszip writeInt64 order: LOW word first, then high
      enc.writeBits(32, p.wpOffset & 0xFFFFFFFFL)
      enc.writeBits(32, (p.wpOffset >>> 32) & 0xFFFFFFFFL)
    }
    c.icPacketSize.compress(enc, c.lastSize, p.wpSize, 0)
    c.icReturnPoint.compress(enc, c.lastRet, p.wpRetBits, 0)
    c.icXyz.compress(enc, c.lastXt, p.wpXtBits, 0)
    c.icXyz.compress(enc, c.lastYt, p.wpYtBits, 1)
    c.icXyz.compress(enc, c.lastZt, p.wpZtBits, 2)
    c.lastIndex = p.wpIndex & 0xFF
    c.lastOffset = p.wpOffset
    c.lastSize = p.wpSize
    c.lastRet = p.wpRetBits
    c.lastXt = p.wpXtBits; c.lastYt = p.wpYtBits; c.lastZt = p.wpZtBits
  }

  def read(dec: AcDecoder, p: Point14, context: Int): Unit = {
    val c = switchTo(context)
    if (dec == null) {
      p.wpIndex = c.lastIndex; p.wpOffset = c.lastOffset; p.wpSize = c.lastSize
      p.wpRetBits = c.lastRet; p.wpXtBits = c.lastXt; p.wpYtBits = c.lastYt; p.wpZtBits = c.lastZt
      return
    }
    p.wpIndex = dec.decodeSymbol(c.mIndex)
    val sym = dec.decodeSymbol(c.mOffsetSym(c.symLast))
    c.symLast = sym
    p.wpOffset = sym match {
      case 0 => c.lastOffset
      case 1 => c.lastOffset + (c.lastSize.toLong & 0xFFFFFFFFL)
      case 2 =>
        val d = c.icOffsetDiff.decompress(dec, c.lastDiff32, 0)
        c.lastDiff32 = d
        c.lastOffset + d.toLong
      case _ =>
        // laszip readInt64 order: LOW word first, then high
        val lo = dec.readBits(32) & 0xFFFFFFFFL
        val hi = dec.readBits(32) & 0xFFFFFFFFL
        (hi << 32) | lo
    }
    p.wpSize = c.icPacketSize.decompress(dec, c.lastSize, 0)
    p.wpRetBits = c.icReturnPoint.decompress(dec, c.lastRet, 0)
    p.wpXtBits = c.icXyz.decompress(dec, c.lastXt, 0)
    p.wpYtBits = c.icXyz.decompress(dec, c.lastYt, 1)
    p.wpZtBits = c.icXyz.decompress(dec, c.lastZt, 2)
    c.lastIndex = p.wpIndex
    c.lastOffset = p.wpOffset
    c.lastSize = p.wpSize
    c.lastRet = p.wpRetBits
    c.lastXt = p.wpXtBits; c.lastYt = p.wpYtBits; c.lastZt = p.wpZtBits
  }
}
