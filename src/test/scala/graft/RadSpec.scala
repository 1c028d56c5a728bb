package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.MiniJson
import graft.multimodal.Rad
import graft.multimodal.Rad.{Chunk, Property}

/** RAD LOD-preview container (rad.cpp): header/chunk walk, all six
  * property encodings, raw-DEFLATE compression, half-float semantics,
  * defaults, and the reference's named-error guards. */
class RadSpec extends AnyFunSuite {

  private def centers(n: Int, seed: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n * 3)((rnd.nextFloat() - 0.5f) * 200f)
  }

  test("half-float decode matches IEEE semantics incl. subnormals, inf and nan") {
    assert(Rad.halfToFloat(0x0000) == 0f)
    assert(Rad.halfToFloat(0x8000) == -0f && (1f / Rad.halfToFloat(0x8000)).isNegInfinity)
    assert(Rad.halfToFloat(0x3c00) == 1f)
    assert(Rad.halfToFloat(0xc000) == -2f)
    assert(Rad.halfToFloat(0x7bff) == 65504f) // max finite half
    assert(Rad.halfToFloat(0x0001) == 5.9604645e-8f) // smallest subnormal
    assert(Rad.halfToFloat(0x03ff) == 6.097555e-5f) // largest subnormal
    assert(Rad.halfToFloat(0x7c00).isPosInfinity && Rad.halfToFloat(0xfc00).isNegInfinity)
    assert(Rad.halfToFloat(0x7e00).isNaN)
    // encoder round-trips every representable half
    for (h <- Seq(0x0000, 0x3c00, 0xc000, 0x7bff, 0x0001, 0x03ff, 0x3555)) {
      assert(Rad.floatToHalf(Rad.halfToFloat(h)) == h, f"half 0x$h%04x")
    }
  }

  test("f32/f16 planar and lebytes encodings round-trip; r8/r8_delta quantize within a step") {
    val n = 400
    val pos = centers(n, 1)
    for (enc <- Seq("f32", "f32_lebytes")) {
      val rad = Rad.write(Seq(Chunk(n, Seq(Property("center", enc, pos, 3)))))
      val got = Rad.coarseSplats(rad)
      assert(got.count == n && got.positions.toSeq == pos.toSeq, enc)
    }
    for (enc <- Seq("f16", "f16_lebytes")) {
      val rad = Rad.write(Seq(Chunk(n, Seq(Property("center", enc, pos, 3)))))
      val got = Rad.coarseSplats(rad)
      // half precision: relative error ≤ 2^-11
      pos.zip(got.positions).foreach { case (a, b) => assert(math.abs(a - b) <= math.abs(a) / 1024f + 1e-6f) }
    }
    val mn = pos.min; val mx = pos.max
    for (enc <- Seq("r8", "r8_delta")) {
      val rad = Rad.write(Seq(Chunk(n, Seq(Property("center", enc, pos, 3, mn, mx)))))
      val got = Rad.coarseSplats(rad)
      val step = (mx - mn) / 255f
      pos.zip(got.positions).foreach { case (a, b) => assert(math.abs(a - b) <= step, enc) }
    }
  }

  test("gz (raw DEFLATE) property compression round-trips and actually compresses") {
    val n = 2000
    val smooth = Array.tabulate(n * 3)(i => (i / 3).toFloat * 0.01f) // very compressible
    val plain = Rad.write(Seq(Chunk(n, Seq(Property("center", "f32_lebytes", smooth, 3)))))
    val gz = Rad.write(Seq(Chunk(n, Seq(Property("center", "f32_lebytes", smooth, 3, gz = true)))))
    assert(gz.length < plain.length / 2, s"gz should shrink a smooth stream: ${gz.length} vs ${plain.length}")
    assert(Rad.coarseSplats(gz).positions.toSeq == smooth.toSeq)
  }

  test("colour/alpha surface with defaults when absent; maxChunks limits the read") {
    val n = 100
    val pos = centers(n, 2)
    val rgb = Array.fill(n * 3)(0.25f)
    val alpha = Array.fill(n)(0.75f)
    val full = Rad.write(Seq(
      Chunk(n, Seq(
        Property("center", "f32_lebytes", pos, 3),
        Property("rgb", "r8", rgb, 3, 0f, 1f),
        Property("alpha", "r8", alpha, 1, 0f, 1f))),
      Chunk(n, Seq(Property("center", "f32_lebytes", centers(n, 3), 3)))
    ))
    val first = Rad.coarseSplats(full, maxChunks = 1)
    assert(first.count == n)
    assert(math.abs(first.colors(0) - 0.25f) <= 1f / 255f && math.abs(first.opacities(0) - 0.75f) <= 1f / 255f)
    val all = Rad.coarseSplats(full, maxChunks = 0)
    assert(all.count == 2 * n)
    // second chunk lacked colour → mid-grey / opaque defaults
    assert(all.colors(n * 3) == 0.5f && all.opacities(n) == 1f)
    val (mn, mx) = Rad.bounds(full)
    assert(mn(0) <= mx(0) && mn(0) >= -110 && mx(0) <= 110)
  }

  test("reference error behavior: bad magic, .radc chunks, truncation, missing centers") {
    val good = Rad.write(Seq(Chunk(10, Seq(Property("center", "f32", centers(10, 4), 3)))))
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(intercept[IllegalArgumentException](Rad.coarseSplats(badMagic)).getMessage.contains("magic"))
    // external .radc reference
    val radc = {
      val meta = """{"chunks":[{"filename":"x.radc","offset":0,"bytes":0}]}""".getBytes
      val out = new scala.collection.mutable.ArrayBuffer[Byte]()
      out ++= Array[Byte](0x52, 0x41, 0x44, 0x30)
      out ++= Array[Byte](meta.length.toByte, 0, 0, 0)
      out ++= meta
      while (out.length % 8 != 0) out += 0
      out.toArray
    }
    assert(intercept[IllegalArgumentException](Rad.coarseSplats(radc)).getMessage.contains(".radc"))
    assert(intercept[IllegalArgumentException](Rad.coarseSplats(good.take(6))).getMessage.contains("header"))
    // chunk with only rgb (no center) must be a named error
    val noCenter = Rad.write(Seq(Chunk(5, Seq(Property("rgb", "r8", Array.fill(15)(0.5f), 3, 0f, 1f)))))
    assert(intercept[IllegalArgumentException](Rad.coarseSplats(noCenter)).getMessage.contains("center"))
  }

  test("MiniJson parses the metadata dialect (nested objects, escapes, numbers) and rejects garbage") {
    val v = MiniJson.parse("""{"a":[1,2.5,-3e2],"s":"x\n\"y\"","t":true,"n":null,"o":{"k":0}}""")
    val m = MiniJson.obj(v)
    assert(MiniJson.arr(m("a")) == Vector(1.0, 2.5, -300.0))
    assert(m("s") == "x\n\"y\"" && m("t") == true && m("n") == null)
    assert(MiniJson.obj(m("o"))("k") == 0.0)
    assert(intercept[IllegalArgumentException](MiniJson.parse("{bad")).getMessage.contains("json"))
    assert(intercept[IllegalArgumentException](MiniJson.parse("""{"a":1} extra""")).getMessage.contains("json"))
  }
}
