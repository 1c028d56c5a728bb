package graft

import java.nio.ByteBuffer

import org.scalatest.funsuite.AnyFunSuite

import org.roaringbitmap.RoaringBitmap

import graft.operators.{Roaring, RoaringError}

/** Portable roaring wire format vs the LIVE reference implementation
  * (org.roaringbitmap 1.3.0, on the Spark classpath): byte-exactness
  * where the container form is forced, set-equality through the
  * reference reader for run-optimized bytes, op-by-op differential
  * fuzz, and the hostile-bytes contract. */
class RoaringSpec extends AnyFunSuite {

  private def ref(xs: Array[Int]): RoaringBitmap = {
    val r = new RoaringBitmap(); xs.foreach(r.add); r
  }

  private def refBytes(r: RoaringBitmap): Array[Byte] = {
    val buf = ByteBuffer.allocate(r.serializedSizeInBytes())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    r.serialize(buf)
    buf.array()
  }

  private def refRead(bytes: Array[Byte]): RoaringBitmap = {
    val r = new RoaringBitmap()
    r.deserialize(ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN))
    r
  }

  // Container-shape menagerie: array / bitmap / run winners, block-key
  // edges 0 and 0xFFFF, the unsigned top value -1 (= 0xFFFFFFFF),
  // card exactly 4096 and 4097 (the array/bitmap boundary).
  private val cases: Seq[(String, Array[Int])] = Seq(
    "single" -> Array(42),
    "array" -> Array(1, 5, 7, 100, 65535),
    "two blocks" -> Array(3, 65536 + 3, 65536 + 4),
    "top block" -> Array(-1, -2, -65536),
    "dense bitmap" -> (0 until 9000 by 2).toArray,
    "card 4096" -> (0 until 4096).map(_ * 3).toArray,
    "card 4097" -> (0 until 4097).map(_ * 3).toArray,
    "long runs" -> ((1000 to 9000) ++ (20000 to 21000)).toArray,
    "full block" -> (0 until 65536).map(65536 * 7 + _).toArray,
    "mixed" -> ((0 until 500).map(_ * 131) ++ (65536 * 2 until 65536 * 2 + 6000) ++
      Seq(-5, -6, -7)).toArray
  )

  test("our no-run serialize is BYTE-EXACT vs the reference (forced forms)") {
    for ((name, xs) <- cases) {
      val ours = Roaring.of(xs).serialize(runOpt = false)
      val theirs = refBytes(ref(xs))
      assert(ours.sameElements(theirs), s"$name: byte drift (ours ${ours.length}, theirs ${theirs.length})")
    }
  }

  test("our serialize (both layouts) -> reference reader: set equality") {
    for ((name, xs) <- cases; runOpt <- Seq(false, true)) {
      val got = refRead(Roaring.of(xs).serialize(runOpt)).toArray
      assert(got.sameElements(ref(xs).toArray), s"$name runOpt=$runOpt")
    }
  }

  test("reference runOptimize'd bytes -> our reader: set equality (run + no-offset paths)") {
    for ((name, xs) <- cases) {
      val r = ref(xs)
      r.runOptimize()
      val got = Roaring.deserialize(refBytes(r)).toArray
      assert(got.sameElements(r.toArray), name)
    }
  }

  test("a run-heavy set actually exercises OUR run container emit") {
    val want: Array[Int] = (1000 to 60000).toArray
    val bytes = Roaring.of(want).serialize(runOpt = true)
    val cookie = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
    assert((cookie & 0xffff) == 12347, "expected the run cookie layout")
    assert(refRead(bytes).toArray.sameElements(want))
  }

  test("differential op fuzz: and/or/xor/andNot vs the reference, 200 rounds") {
    val rnd = new scala.util.Random(181)
    for (round <- 0 until 200) {
      def randSet(): Array[Int] = {
        val n = rnd.nextInt(3000)
        val span = if (rnd.nextBoolean()) 1 << 18 else 1 << 30
        Array.fill(n)(rnd.nextInt(span)) ++
          (if (rnd.nextInt(4) == 0) (0 until 5000).map(_ + span / 2) else Nil)
      }
      val (xa, xb) = (randSet(), randSet())
      val (oa, ob) = (Roaring.of(xa), Roaring.of(xb))
      val (ra, rb) = (ref(xa), ref(xb))
      assert(oa.and(ob).toArray.sameElements(RoaringBitmap.and(ra, rb).toArray), s"and r$round")
      assert(oa.or(ob).toArray.sameElements(RoaringBitmap.or(ra, rb).toArray), s"or r$round")
      assert(oa.xor(ob).toArray.sameElements(RoaringBitmap.xor(ra, rb).toArray), s"xor r$round")
      assert(oa.andNot(ob).toArray.sameElements(RoaringBitmap.andNot(ra, rb).toArray), s"andNot r$round")
      assert(oa.cardinality == ra.getLongCardinality, s"card r$round")
    }
  }

  test("round-trip through our own reader, both layouts") {
    for ((name, xs) <- cases; runOpt <- Seq(false, true)) {
      val rt = Roaring.deserialize(Roaring.of(xs).serialize(runOpt))
      assert(rt.toArray.sameElements(ref(xs).toArray), s"$name runOpt=$runOpt")
      xs.foreach(x => assert(rt.contains(x), s"$name contains $x"))
    }
  }

  test("hostile bytes refuse loudly, by name") {
    val good = Roaring.of(Array(1, 2, 3, 70000)).serialize()
    def mut(f: Array[Byte] => Array[Byte]): Array[Byte] = f(good.clone())

    val badCookie = mut { b => b(0) = 9; b }
    assert(intercept[RoaringError](Roaring.deserialize(badCookie)).msg.contains("cookie"))

    assert(intercept[RoaringError](Roaring.deserialize(good.take(10))).msg.contains("truncated"))
    assert(intercept[RoaringError](Roaring.deserialize(good ++ Array[Byte](0))).msg.contains("trailing"))

    // swap the two container keys out of order
    val unsorted = mut { b => val k = b(8); b(8) = b(12); b(12) = k; b }
    assert(intercept[RoaringError](Roaring.deserialize(unsorted)).msg.contains("not increasing"))

    // corrupt the first offset
    val badOff = mut { b => b(16) = (b(16) + 1).toByte; b }
    assert(intercept[RoaringError](Roaring.deserialize(badOff)).msg.contains("offset"))

    // declared bitmap cardinality vs popcount
    val dense = Roaring.of((0 until 5000).toArray).serialize()
    val badCard = dense.clone(); badCard(10) = (badCard(10) ^ 1).toByte
    assert(intercept[RoaringError](Roaring.deserialize(badCard)).msg.toLowerCase.contains("card") ||
      intercept[RoaringError](Roaring.deserialize(badCard)).msg.contains("popcount"))

    // run overrunning the container
    val runs = Roaring.of((60000 to 65535).toArray).serialize(runOpt = true)
    val overrun = runs.clone()
    // run payload: [u16 nruns][start][len]; bump the length past 65535
    val bb = ByteBuffer.wrap(overrun).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(overrun.length - 2, (bb.getShort(overrun.length - 2) + 1).toShort)
    assert(intercept[RoaringError](Roaring.deserialize(overrun)).msg.contains("overrun"))
  }

  test("fuzz: reference-serialized random sets survive our reader, 150 rounds") {
    val rnd = new scala.util.Random(182)
    for (round <- 0 until 150) {
      val xs = Array.fill(rnd.nextInt(6000))(rnd.nextInt())
      val r = ref(xs)
      if (rnd.nextBoolean()) r.runOptimize()
      assert(Roaring.deserialize(refBytes(r)).toArray.sameElements(r.toArray), s"r$round")
    }
  }
}
