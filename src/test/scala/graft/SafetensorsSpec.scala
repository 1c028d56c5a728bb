package graft

import graft.sources.Safetensors
import graft.sources.Safetensors._
import org.scalatest.funsuite.AnyFunSuite

/** safetensors conformance. No conforming implementation ships in
  * this container (python safetensors/torch absent — probe recorded
  * in NOTES_r17), so the pins are: the published spec's own canonical
  * layout built byte-by-byte from the spec text, writer-vs-reader
  * round-trips across the dtype matrix, the reference validator's
  * coverage rules (gaps/overlaps/holes refuse), and mutation fuzz. */
class SafetensorsSpec extends AnyFunSuite {

  test("spec-canonical layout: u64 header length + JSON + zeroed I32 buffer") {
    // the format doc's example: {"test":{"dtype":"I32","shape":[2,2],"data_offsets":[0,16]}}
    val json = """{"test":{"dtype":"I32","shape":[2,2],"data_offsets":[0,16]}}"""
    val out = new java.io.ByteArrayOutputStream()
    var v = json.length.toLong
    for (_ <- 0 until 8) { out.write((v & 0xff).toInt); v >>= 8 }
    out.write(json.getBytes("UTF-8"))
    out.write(new Array[Byte](16))
    val (h, tensors) = Safetensors.readBytes(out.toByteArray)
    assert(h.tensors.map(_.name) == Seq("test"))
    val t = tensors("test")
    assert(t.info.shape == Seq(2L, 2L) && t.n == 4)
    for (i <- 0 until 4) assert(t.longAt(i) == 0L)
  }

  test("writer -> reader round-trip across the dtype matrix") {
    val n = 13
    def le(width: Int, f: Int => Long): Array[Byte] = {
      val out = new Array[Byte](n * width)
      for (i <- 0 until n; j <- 0 until width) out(i * width + j) = ((f(i) >>> (8 * j)) & 0xff).toByte
      out
    }
    val bf16 = le(2, i => (java.lang.Float.floatToIntBits(i * 2.5f - 4f) >>> 16).toLong)
    val bytes = Safetensors.encode(Seq(
      ("b", "BOOL", Seq(n.toLong), Array.tabulate(n)(i => if (i % 3 == 0) 1.toByte else 0.toByte)),
      ("i8", "I8", Seq(n.toLong), Array.tabulate(n)(i => (i * 9 - 50).toByte)),
      ("u8", "U8", Seq(n.toLong), Array.tabulate(n)(i => ((i * 29) % 256).toByte)),
      ("i16", "I16", Seq(n.toLong), le(2, i => (i * 1001 - 4000).toLong)),
      ("u16", "U16", Seq(n.toLong), le(2, i => ((i * 7001) % 65536).toLong)),
      ("i32", "I32", Seq(n.toLong), le(4, i => (i * 100000 - 350000).toLong)),
      ("u32", "U32", Seq(n.toLong), le(4, i => (i.toLong * 900000007L) % 4294967296L)),
      ("i64", "I64", Seq(n.toLong), Safetensors.leI64(Array.tabulate(n)(i => i * 123456789L - 400000000L))),
      ("f16", "F16", Seq(n.toLong), Safetensors.leF16(Array.tabulate(n)(i => i * 0.25f - 2f))),
      ("bf16", "BF16", Seq(n.toLong), bf16),
      ("f32", "F32", Seq(n.toLong), Safetensors.leF32(Array.tabulate(n)(i => i * 1.5f - 3f))),
      ("f64", "F64", Seq(n.toLong), le(8, i => java.lang.Double.doubleToLongBits(i * 2.25 - 9.0)))
    ), Map("origin" -> "spec", "k" -> "v"))
    val (h, ts) = Safetensors.readBytes(bytes)
    assert(h.metadata == Map("origin" -> "spec", "k" -> "v"))
    assert(h.tensors.length == 12)
    for (i <- 0 until n) {
      assert(ts("b").boolAt(i) == (i % 3 == 0))
      assert(ts("i8").longAt(i) == i * 9 - 50)
      assert(ts("u8").longAt(i) == (i * 29) % 256)
      assert(ts("i16").longAt(i) == i * 1001 - 4000)
      assert(ts("u16").longAt(i) == (i * 7001) % 65536)
      assert(ts("i32").longAt(i) == i * 100000 - 350000)
      assert(ts("u32").longAt(i) == (i.toLong * 900000007L) % 4294967296L)
      assert(ts("i64").longAt(i) == i * 123456789L - 400000000L)
      assert(ts("f16").doubleAt(i) == i * 0.25 - 2.0)
      assert(ts("bf16").doubleAt(i) == (i * 2.5f - 4f).toDouble)
      assert(ts("f32").doubleAt(i) == (i * 1.5f - 3f).toDouble)
      assert(ts("f64").doubleAt(i) == i * 2.25 - 9.0)
    }
  }

  test("ranged-read audit: header parse reads only the 8-byte prefix and the header bytes") {
    val big = Safetensors.encode(Seq(
      ("x", "I64", Seq(20000L), Safetensors.leI64(Array.tabulate(20000)(_.toLong)))))
    val reads = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    val ranged: (Long, Int) => Array[Byte] = (off, n) => {
      reads += ((off, n))
      java.util.Arrays.copyOfRange(big, off.toInt, off.toInt + n)
    }
    val h = Safetensors.header(ranged, big.length.toLong)
    assert(h.tensors.head.elems == 20000L)
    assert(reads.forall { case (off, n) => off + n <= h.dataStart }, s"driver read into the buffer: $reads")
    assert(reads.map(_._2).sum < big.length / 10)
  }

  test("reference validator rules: gaps, overlaps, uncovered tail, oversize extents refuse") {
    def file(json: String, bufLen: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var v = json.length.toLong
      for (_ <- 0 until 8) { out.write((v & 0xff).toInt); v >>= 8 }
      out.write(json.getBytes("UTF-8"))
      out.write(new Array[Byte](bufLen))
      out.toByteArray
    }
    def mustFail(b: Array[Byte], what: String): Unit =
      try { Safetensors.readBytes(b); fail(s"$what: decoded silently") }
      catch {
        case _: SafetensorsError => ()
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case e: Throwable => fail(s"$what: escaped as ${e.getClass.getName}")
      }
    // gap: tensor starts at 8, buffer starts at 0
    mustFail(file("""{"a":{"dtype":"I64","shape":[1],"data_offsets":[8,16]}}""", 16), "leading hole")
    // overlap
    mustFail(file(
      """{"a":{"dtype":"I64","shape":[1],"data_offsets":[0,8]},"b":{"dtype":"I64","shape":[1],"data_offsets":[4,12]}}""",
      12), "overlap")
    // uncovered tail
    mustFail(file("""{"a":{"dtype":"I64","shape":[1],"data_offsets":[0,8]}}""", 24), "uncovered tail")
    // extent beyond buffer
    mustFail(file("""{"a":{"dtype":"I64","shape":[4],"data_offsets":[0,32]}}""", 8), "extent beyond buffer")
    // shape/extent mismatch
    mustFail(file("""{"a":{"dtype":"I64","shape":[3],"data_offsets":[0,16]}}""", 16), "shape bytes mismatch")
    // refusals by dtype
    mustFail(file("""{"a":{"dtype":"U64","shape":[2],"data_offsets":[0,16]}}""", 16), "U64")
    mustFail(file("""{"a":{"dtype":"Q4","shape":[16],"data_offsets":[0,16]}}""", 16), "unknown dtype")
    // header length lies
    mustFail(Array[Byte](-1, -1, -1, -1, -1, -1, -1, 0x7f), "absurd header length")
    mustFail(Array.emptyByteArray, "empty")
  }

  test("OCP FP8: E4M3 and E5M2 decode against hand-computed spec vectors") {
    // E4M3: bias 7, no infinities, 0x7F/0xFF = NaN, max finite 448
    val e4 = Array[Byte](0x00, 0x80.toByte, 0x38, 0x30, 0xC8.toByte, 0x7E, 0x01, 0x81.toByte)
    // E5M2: bias 15, IEEE infinities/NaN, max finite 57344
    val e5 = Array[Byte](0x3C, 0x3E, 0x7B, 0x34, 0x01, 0xFC.toByte, 0x7C)
    val bytes = Safetensors.encode(Seq(
      ("a", "F8_E4M3", Seq(e4.length.toLong), e4),
      ("b", "F8_E5M2", Seq(e5.length.toLong), e5)))
    val (_, ts) = Safetensors.readBytes(bytes)
    val a = ts("a"); val b = ts("b")
    assert(a.doubleAt(0) == 0.0 && (1.0 / a.doubleAt(1)).isNegInfinity) // -0.0
    assert(a.doubleAt(2) == 1.0 && a.doubleAt(3) == 0.5)
    assert(a.doubleAt(4) == -4.0 && a.doubleAt(5) == 448.0)
    assert(a.doubleAt(6) == math.pow(2, -9) && a.doubleAt(7) == -math.pow(2, -9))
    // 0x7F is NaN, not infinity, in E4M3
    val nan = Safetensors.encode(Seq(("n", "F8_E4M3", Seq(1L), Array[Byte](0x7F))))
    assert(Safetensors.readBytes(nan)._2("n").doubleAt(0).isNaN)
    assert(b.doubleAt(0) == 1.0 && b.doubleAt(1) == 1.5)
    assert(b.doubleAt(2) == 57344.0 && b.doubleAt(3) == 0.25)
    assert(b.doubleAt(4) == math.pow(2, -16))
    assert(b.doubleAt(5).isNegInfinity && b.doubleAt(6).isPosInfinity)
  }

  test("empty tensors and an empty file body are valid (coverage of a 0-length buffer)") {
    val bytes = Safetensors.encode(Seq(("e", "F32", Seq(0L), Array.emptyByteArray)))
    val (_, ts) = Safetensors.readBytes(bytes)
    assert(ts("e").n == 0)
  }

  test("mutation fuzz: decode-or-SafetensorsError, never raw errors") {
    val base = Safetensors.encode(Seq(
      ("ids", "I64", Seq(40L), Safetensors.leI64(Array.tabulate(40)(_.toLong * 7))),
      ("emb", "F32", Seq(40L, 3L), Safetensors.leF32(Array.tabulate(120)(_.toFloat)))),
      Map("m" -> "x"))
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 500) {
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      try { Safetensors.readBytes(b); () }
      catch {
        case _: SafetensorsError => ()
        case e: Throwable => fail(s"mutation escaped as ${e.getClass.getName}: ${e.getMessage}")
      }
      val t = java.util.Arrays.copyOfRange(base, 0, rnd.nextInt(base.length))
      try { Safetensors.readBytes(t); () }
      catch {
        case _: SafetensorsError => ()
        case e: Throwable => fail(s"truncation escaped as ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }
}
