package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Hostile-input error for the portable roaring wire format: every
  * structural violation names what was wrong, nothing is decoded
  * past the first inconsistency. */
final case class RoaringError(msg: String) extends RuntimeException(msg)

/** Roaring bitmap — the compressed integer-set interchange format of
  * the indexing world (Lucene, Druid, Pinot, ClickHouse all speak it),
  * hand-rolled from the published portable spec
  * (github.com/RoaringBitmap/RoaringFormatSpec): a u16-keyed sequence
  * of containers, each an ARRAY (sorted u16s, card ≤ 4096), a BITMAP
  * (1024 u64 words), or a RUN ([start, start+length] pairs), with the
  * two cookie layouts (12346 no-run / 12347 run-flag bitset) and the
  * ≥4-container offset index. LIVE-validated both directions against
  * org.roaringbitmap (RoaringBitmap 1.3.0, already on the Spark
  * classpath — Spark itself uses it for shuffle tracking).
  *
  * In-memory rep: one dense 1024-word bitset per populated high-16-bit
  * block, so and/or/xor/andNot are branch-free word loops and
  * cardinality is a popcount sweep; the ARRAY/RUN forms exist at the
  * WIRE, chosen per container by the published size rule (run iff
  * 2+4·r beats both 2·card and 8192; else array iff card ≤ 4096).
  * That makes the no-run serialization byte-identical to the
  * reference's own (same forced form, same header/offset layout) —
  * RoaringSpec pins it — while run-form bytes are validated by
  * set-equality through the reference reader.
  *
  * Scale shape: a bitmap over a k-bit id domain is ≤ 2^k/8 bytes
  * REGARDLESS of row count — the distributed build below turns an
  * events-scale scan into one partial-aggregated `bit_or` shuffle of
  * at most domain/64 word rows (the bitmap IS the dedup: OR-ing a
  * duplicate id is a no-op, so no `distinct` pre-shuffle is needed),
  * and set algebra on the assembled bitmaps is driver-side on
  * kilobytes. That is the standard 100 TB membership-index pattern:
  * build per-segment bitmaps in parallel, OR-merge, intersect
  * cheaply at query time.
  */
object Roaring {

  private val CookieNoRun = 12346
  private val CookieRun = 12347
  private val NoOffsetThreshold = 4

  /** Mutable 32-bit roaring bitmap (ints are UNSIGNED, matching the
    * reference: add(-1) sets 0xFFFFFFFF, the largest value). */
  final class RBitmap private[Roaring] (
      private[Roaring] val blocks: java.util.TreeMap[Integer, Array[Long]]) {

    def add(x: Int): Unit = {
      val hi = x >>> 16
      val w = blocks.computeIfAbsent(hi, _ => new Array[Long](1024))
      val lo = x & 0xffff
      w(lo >>> 6) |= 1L << (lo & 63)
    }

    def contains(x: Int): Boolean = {
      val w = blocks.get(x >>> 16)
      w != null && ((w((x & 0xffff) >>> 6) >> (x & 63)) & 1L) == 1L
    }

    def cardinality: Long = {
      var n = 0L
      blocks.values.forEach { w =>
        var i = 0; while (i < 1024) { n += java.lang.Long.bitCount(w(i)); i += 1 }
      }
      n
    }

    /** Unsigned-ascending materialization (LIVE compared against the
      * reference's iterator order in RoaringSpec). */
    def toArray: Array[Int] = {
      val out = new java.util.ArrayList[Integer]()
      blocks.forEach { (hi, w) =>
        var i = 0
        while (i < 1024) {
          var bits = w(i)
          while (bits != 0L) {
            val b = java.lang.Long.numberOfTrailingZeros(bits)
            out.add((hi << 16) | (i << 6) | b)
            bits &= bits - 1
          }
          i += 1
        }
      }
      val a = new Array[Int](out.size())
      var i = 0; while (i < a.length) { a(i) = out.get(i); i += 1 }
      a
    }

    private def zipWith(o: RBitmap)(f: (Long, Long) => Long): RBitmap = {
      val r = new java.util.TreeMap[Integer, Array[Long]]()
      val keys = new java.util.TreeSet[Integer]()
      keys.addAll(blocks.keySet()); keys.addAll(o.blocks.keySet())
      keys.forEach { k =>
        val a = blocks.get(k); val b = o.blocks.get(k)
        val w = new Array[Long](1024)
        var nz = false
        var i = 0
        while (i < 1024) {
          w(i) = f(if (a == null) 0L else a(i), if (b == null) 0L else b(i))
          nz ||= w(i) != 0L
          i += 1
        }
        if (nz) r.put(k, w)
      }
      new RBitmap(r)
    }

    def and(o: RBitmap): RBitmap = zipWith(o)(_ & _)
    def or(o: RBitmap): RBitmap = zipWith(o)(_ | _)
    def xor(o: RBitmap): RBitmap = zipWith(o)(_ ^ _)
    def andNot(o: RBitmap): RBitmap = zipWith(o)(_ & ~_)

    /** Wire form per container: (key, card, runs-as-(start,len-1) or
      * null). Runs counted once here, reused by both size rule and
      * payload emit. */
    private def containerPlans(runOpt: Boolean): Seq[(Int, Int, Array[Long], Option[Array[(Int, Int)]])] = {
      val out = Seq.newBuilder[(Int, Int, Array[Long], Option[Array[(Int, Int)]])]
      blocks.forEach { (hi, w) =>
        var card = 0
        var i = 0; while (i < 1024) { card += java.lang.Long.bitCount(w(i)); i += 1 }
        if (card > 0) {
          val runs = if (runOpt) {
            val rs = Array.newBuilder[(Int, Int)]
            var nruns = 0
            var start = -1
            var v = 0
            while (v < 65536) {
              val set = ((w(v >>> 6) >> (v & 63)) & 1L) == 1L
              if (set && start < 0) start = v
              if (!set && start >= 0) { rs += ((start, v - 1 - start)); nruns += 1; start = -1 }
              v += 1
            }
            if (start >= 0) { rs += ((start, 65535 - start)); nruns += 1 }
            val runBytes = 2 + 4 * nruns
            val altBytes = if (card <= 4096) 2 * card else 8192
            if (runBytes < altBytes) Some(rs.result()) else None
          } else None
          out += ((hi.intValue(), card, w, runs))
        }
      }
      out.result()
    }

    /** Portable serialization. `runOpt = false` emits the no-run
      * cookie layout (byte-identical to the reference's un-optimized
      * serialize); `runOpt = true` applies the published size rule
      * per container and emits the run cookie layout when any run
      * container wins. */
    def serialize(runOpt: Boolean = false): Array[Byte] = {
      val plans = containerPlans(runOpt)
      val size = plans.length
      val hasRun = plans.exists(_._4.isDefined)
      val payloadSizes = plans.map { case (_, card, _, runs) =>
        runs match {
          case Some(rs) => 2 + 4 * rs.length
          case None => if (card <= 4096) 2 * card else 8192
        }
      }
      val withOffsets = !hasRun || size >= NoOffsetThreshold
      val headerLen =
        (if (hasRun) 4 + (size + 7) / 8 else 8) + 4 * size + (if (withOffsets) 4 * size else 0)
      val buf = ByteBuffer.allocate(headerLen + payloadSizes.sum).order(ByteOrder.LITTLE_ENDIAN)
      if (hasRun) {
        buf.putInt(CookieRun | ((size - 1) << 16))
        val flags = new Array[Byte]((size + 7) / 8)
        plans.zipWithIndex.foreach { case ((_, _, _, runs), i) =>
          if (runs.isDefined) flags(i / 8) = (flags(i / 8) | (1 << (i % 8))).toByte
        }
        buf.put(flags)
      } else { buf.putInt(CookieNoRun); buf.putInt(size) }
      plans.foreach { case (hi, card, _, _) =>
        buf.putShort(hi.toShort); buf.putShort((card - 1).toShort)
      }
      if (withOffsets) {
        var off = headerLen
        payloadSizes.foreach { s => buf.putInt(off); off += s }
      }
      plans.foreach { case (_, card, w, runs) =>
        runs match {
          case Some(rs) =>
            buf.putShort(rs.length.toShort)
            rs.foreach { case (s, lm1) => buf.putShort(s.toShort); buf.putShort(lm1.toShort) }
          case None if card <= 4096 =>
            var v = 0
            while (v < 65536) {
              if (((w(v >>> 6) >> (v & 63)) & 1L) == 1L) buf.putShort(v.toShort)
              v += 1
            }
          case None =>
            var i = 0; while (i < 1024) { buf.putLong(w(i)); i += 1 }
        }
      }
      buf.array()
    }
  }

  def empty: RBitmap = new RBitmap(new java.util.TreeMap[Integer, Array[Long]]())

  def of(xs: Iterable[Int]): RBitmap = { val b = empty; xs.foreach(b.add); b }

  /** Parse the portable format. Canonical-input contract: keys must be
    * strictly increasing, cardinalities consistent, offsets (when
    * present) must match the sequential payload layout, array values
    * strictly increasing, runs in-range and non-overlapping — any
    * violation raises [[RoaringError]] naming it. */
  def deserialize(bytes: Array[Byte]): RBitmap = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def req(ok: Boolean, msg: => String): Unit = if (!ok) throw RoaringError(msg)
    def need(n: Int, what: String): Unit = req(buf.remaining() >= n, s"roaring: truncated in $what")

    need(4, "cookie")
    val cookie = buf.getInt()
    val hasRun = (cookie & 0xffff) == CookieRun
    req(hasRun || cookie == CookieNoRun, f"roaring: bad cookie 0x$cookie%08x")
    val size =
      if (hasRun) (cookie >>> 16) + 1
      else { need(4, "size"); val s = buf.getInt(); req(s >= 0, s"roaring: negative size $s"); s }
    req(size <= 65536, s"roaring: $size containers exceeds the 65536 key space")
    val runFlags = new Array[Byte](if (hasRun) (size + 7) / 8 else 0)
    if (hasRun) { need(runFlags.length, "run flags"); buf.get(runFlags) }
    def isRun(i: Int) = hasRun && ((runFlags(i / 8) >> (i % 8)) & 1) == 1

    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    var i = 0
    while (i < size) {
      need(4, "container header")
      keys(i) = buf.getShort() & 0xffff
      cards(i) = (buf.getShort() & 0xffff) + 1
      req(i == 0 || keys(i) > keys(i - 1), s"roaring: container keys not increasing at #$i")
      i += 1
    }
    val withOffsets = !hasRun || size >= NoOffsetThreshold
    val offsets = new Array[Int](if (withOffsets) size else 0)
    if (withOffsets) { i = 0; while (i < size) { need(4, "offsets"); offsets(i) = buf.getInt(); i += 1 } }

    val b = empty
    i = 0
    while (i < size) {
      if (withOffsets)
        req(offsets(i) == buf.position(), s"roaring: container #$i offset ${offsets(i)} != actual ${buf.position()}")
      val w = new Array[Long](1024)
      if (isRun(i)) {
        need(2, "run count")
        val nruns = buf.getShort() & 0xffff
        need(4 * nruns, "runs")
        var card = 0
        var prevEnd = -1
        var r = 0
        while (r < nruns) {
          val start = buf.getShort() & 0xffff
          val len = buf.getShort() & 0xffff
          req(start > prevEnd, s"roaring: overlapping/unsorted run at container #$i")
          req(start + len <= 65535, s"roaring: run overruns container #$i")
          var v = start
          while (v <= start + len) { w(v >>> 6) |= 1L << (v & 63); v += 1 }
          card += len + 1
          prevEnd = start + len
          r += 1
        }
        req(card == cards(i), s"roaring: run container #$i card $card != declared ${cards(i)}")
      } else if (cards(i) <= 4096) {
        need(2 * cards(i), "array container")
        var prev = -1
        var j = 0
        while (j < cards(i)) {
          val v = buf.getShort() & 0xffff
          req(v > prev, s"roaring: array container #$i values not increasing")
          w(v >>> 6) |= 1L << (v & 63)
          prev = v
          j += 1
        }
      } else {
        need(8192, "bitmap container")
        var card = 0
        var j = 0
        while (j < 1024) { w(j) = buf.getLong(); card += java.lang.Long.bitCount(w(j)); j += 1 }
        req(card == cards(i), s"roaring: bitmap container #$i popcount $card != declared ${cards(i)}")
      }
      b.blocks.put(keys(i), w)
      i += 1
    }
    req(!buf.hasRemaining, s"roaring: ${buf.remaining()} trailing bytes")
    b
  }

  /** Distributed bitmap build over an id column: ONE partial-aggregated
    * `bit_or` shuffle of (group, block, word) rows — at most
    * domain/64 per group regardless of input row count (duplicate ids
    * OR into the same bit, so the bitmap is the dedup and no
    * `distinct` pre-pass is needed). Returns the word rows; callers
    * assemble per-group [[RBitmap]]s from this bounded frame. */
  def buildWords(df: DataFrame, groupCol: String, idCol: String): DataFrame =
    df.select(
        col(groupCol).as("grp"),
        (col(idCol).cast("long") / 65536L).cast("int").as("block"),
        ((col(idCol).cast("long") % 65536L) / 64L).cast("int").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST($idCol % 64 AS INT))").as("b"))
      .groupBy(col("grp"), col("block"), col("word"))
      .agg(bit_or(col("b")).as("bits"))

  /** Assemble per-group bitmaps from [[buildWords]] output (driver-side,
    * bounded by groups × domain/64 words). Out-of-domain ids surface
    * as out-of-range block keys and refuse loudly. */
  def assemble(words: DataFrame): Map[String, RBitmap] = {
    val rows = words.collect()
    val out = scala.collection.mutable.Map[String, RBitmap]()
    rows.foreach { r =>
      val grp = r.getString(0)
      val block = r.getInt(1)
      if (block < 0 || block > 0xffff)
        throw RoaringError(s"roaring: id outside the unsigned 32-bit domain (block $block) in group $grp")
      val w = out.getOrElseUpdate(grp, empty).blocks
        .computeIfAbsent(block, _ => new Array[Long](1024))
      w(r.getInt(2)) |= r.getLong(3)
    }
    out.toMap
  }

  /** ◆ Bitmap set-algebra under the oracle: per-event-type bitmaps of
    * user ids built by the one-shuffle word aggregation, then every
    * pairwise intersection cardinality (diagonal = per-type distinct
    * users) computed by driver-side word AND — each count re-derived
    * relationally by DuckDB's distinct self-join. The require-lane
    * round-trips every bitmap through the PORTABLE wire format (both
    * cookie layouts) before counting, so a serialization regression
    * fails the oracle, not just the spec. */
  def bitmapQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"event_type", $"user_id")
    val bitmaps = assemble(buildWords(ev, "event_type", "user_id"))
    val types = bitmaps.keys.toSeq.sorted
    val rows = for {
      ta <- types
      tb <- types if ta <= tb
      a = deserialize(bitmaps(ta).serialize(runOpt = false))
      b = deserialize(bitmaps(tb).serialize(runOpt = true))
      n = a.and(b).cardinality
      if n > 0L
    } yield {
      require(a.cardinality == bitmaps(ta).cardinality, s"roaring round-trip drift for $ta")
      require(b.cardinality == bitmaps(tb).cardinality, s"roaring run round-trip drift for $tb")
      Row(ta, tb, n)
    }
    val schema = StructType(Seq(
      StructField("ta", StringType, nullable = false),
      StructField("tb", StringType, nullable = false),
      StructField("n_common", LongType, nullable = false)))
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema).orderBy($"ta", $"tb")
  }
}
