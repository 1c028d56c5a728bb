package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.EntryType
import graft.multimodal.Splats
import graft.multimodal.Splats.Splat
import graft.sources.Ply

/** Gaussian-splat containers (gsplat.cpp conversion tier): .splat
  * 32-byte records, the SPZ gzip container, and the 3DGS PLY bridge. */
class SplatsSpec extends AnyFunSuite {

  private def mk(n: Int, shDeg: Int, seed: Int): Seq[Splat] = {
    val rnd = new scala.util.Random(seed)
    val nsh = (shDeg match { case 0 => 0; case 1 => 3; case 2 => 8; case 3 => 15 }) * 3
    (0 until n).map { _ =>
      // unit quaternion with w > 0
      val q = Array.fill(4)(rnd.nextGaussian())
      val norm = math.sqrt(q.map(v => v * v).sum)
      val sgn = if (q(3) < 0) -1.0 else 1.0
      Splat(
        x = (rnd.nextFloat() - 0.5f) * 100f,
        y = (rnd.nextFloat() - 0.5f) * 100f,
        z = (rnd.nextFloat() - 0.5f) * 100f,
        scaleX = rnd.nextFloat() * 6f - 8f,
        scaleY = rnd.nextFloat() * 6f - 8f,
        scaleZ = rnd.nextFloat() * 6f - 8f,
        r = (rnd.nextFloat() - 0.5f) * 2f,
        g = (rnd.nextFloat() - 0.5f) * 2f,
        b = (rnd.nextFloat() - 0.5f) * 2f,
        alpha = rnd.nextFloat() * 8f - 4f,
        rotX = (sgn * q(0) / norm).toFloat,
        rotY = (sgn * q(1) / norm).toFloat,
        rotZ = (sgn * q(2) / norm).toFloat,
        rotW = (sgn * q(3) / norm).toFloat,
        sh = Seq.fill(nsh)((rnd.nextFloat() - 0.5f) * 0.5f)
      )
    }
  }

  test(".splat 32-byte records round-trip within quantization error") {
    val splats = mk(500, 0, 1)
    val bytes = Splats.writeSplat(splats)
    assert(bytes.length == 500 * 32)
    val back = Splats.readSplat(bytes)
    assert(back.length == 500)
    splats.zip(back).foreach { case (a, b) =>
      assert(a.x == b.x && a.y == b.y && a.z == b.z, "positions are exact f32")
      assert(math.abs(a.scaleX - b.scaleX) < 1e-5, "scales survive the exp/log cycle")
      assert(math.abs(a.r - b.r) < 0.01, "color within one u8 step")
      assert(math.abs(1.0 / (1 + math.exp(-a.alpha)) - 1.0 / (1 + math.exp(-b.alpha))) < 0.005,
        "opacity within one u8 step in sigmoid space")
      assert(math.abs(a.rotW - b.rotW) < 0.01 && math.abs(a.rotX - b.rotX) < 0.01)
    }
    assertThrows[IllegalArgumentException](Splats.readSplat(new Array[Byte](33)))
  }

  test("SPZ: gzip container with the NGSP header; round-trip within quantization error") {
    for (shDeg <- Seq(0, 1, 2)) {
      val splats = mk(300, shDeg, 10 + shDeg)
      val spz = Splats.writeSpz(splats)
      // it IS a gzip stream
      assert((spz(0) & 0xff) == 0x1f && (spz(1) & 0xff) == 0x8b)
      val (info, back) = Splats.readSpz(spz)
      assert(info.numPoints == 300 && info.shDegree == shDeg && info.fractionalBits == 12)
      splats.zip(back).foreach { case (a, b) =>
        assert(math.abs(a.x - b.x) <= 1f / 4096 && math.abs(a.z - b.z) <= 1f / 4096,
          "positions within the 24-bit fixed-point step")
        assert(math.abs(a.scaleX - b.scaleX) <= 1f / 16 + 1e-4, "log scales within one u8 step")
        assert(math.abs(a.r - b.r) < 0.01)
        // quaternion: the STORED xyz components are within one u8 step
        // unconditionally; the rotation-distance bound applies only
        // when |w| isn't tiny (w is recovered from the unit norm, so
        // its error is amplified near w = 0 — inherent to any
        // 8-bit xyz-only storage, including the real SPZ)
        assert(math.abs(a.rotX - b.rotX) <= 1f / 127.5f + 1e-4)
        assert(math.abs(a.rotY - b.rotY) <= 1f / 127.5f + 1e-4)
        assert(math.abs(a.rotZ - b.rotZ) <= 1f / 127.5f + 1e-4)
        if (math.abs(a.rotW) > 0.2f) {
          val dot = a.rotX * b.rotX + a.rotY * b.rotY + a.rotZ * b.rotZ + a.rotW * b.rotW
          assert(math.abs(dot) > 0.999, s"quaternion drifted: dot=$dot (w=${a.rotW})")
        }
        if (shDeg > 0) a.sh.zip(b.sh).foreach { case (u, v) => assert(math.abs(u - v) <= 1f / 128 + 1e-4) }
      }
    }
  }

  test("SPZ guards: bad magic, truncated payloads, unsupported version are named errors") {
    val good = Splats.writeSpz(mk(5, 0, 3))
    val raw = {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(good))
      try in.readAllBytes() finally in.close()
    }
    def regzip(r: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(r); gz.close(); bos.toByteArray
    }
    val badMagic = raw.clone(); badMagic(0) = 'X'
    assert(intercept[IllegalArgumentException](Splats.readSpz(regzip(badMagic))).getMessage.contains("magic"))
    val badVer = raw.clone(); badVer(4) = 9
    assert(intercept[IllegalArgumentException](Splats.readSpz(regzip(badVer))).getMessage.contains("version"))
    assert(intercept[IllegalArgumentException](Splats.readSpz(regzip(raw.take(20)))).getMessage.contains("need"))
  }

  test("extension dispatch + looksLike helpers mirror gsplat_test") {
    import graft.sources.Extractors
    // .splat content fingerprints by extension (gsplat_test detectByExtension)
    val splatBytes = Splats.writeSplat(mk(4, 0, 8))
    assert(Extractors.fingerprint("a.splat", splatBytes) == EntryType.GaussianSplat)
    // .spz with bare NGSP magic
    assert(Extractors.fingerprint("a.spz", "NGSP".getBytes) == EntryType.GaussianSplat)
    // .ksplat with arbitrary bytes — extension is the explicit signal
    assert(Extractors.fingerprint("a.ksplat", "anything".getBytes) == EntryType.GaussianSplat)
    // looksLikeSpz: NGSP or gzip magic, junk rejected
    assert(Splats.looksLikeSpz("NGSP".getBytes))
    assert(Splats.looksLikeSpz(Splats.writeSpz(mk(3, 0, 9)))) // gzip (legacy v1-3)
    assert(!Splats.looksLikeSpz("junk".getBytes))
    assert(!Splats.looksLikeSpz(Array[Byte](1)))
    // looksLikeSplatBinary: multiple of 32
    assert(Splats.looksLikeSplatBinary(splatBytes))
    assert(!Splats.looksLikeSplatBinary("12345".getBytes))
    assert(!Splats.looksLikeSplatBinary(Array.emptyByteArray))
    // getGaussianSplatInfo: count + SH degree (gsplat_test getInfoPlyAndSplat)
    assert(Splats.binaryInfo("splat", Splats.writeSplat(mk(7, 0, 10))) ==
      Some(Splats.SplatInfo(7L, 0)))
    assert(Splats.binaryInfo("spz", Splats.writeSpz(mk(42, 2, 11))) ==
      Some(Splats.SplatInfo(42L, 2)))
    // extractor carries the metadata as properties
    val ex = Extractors.extract("scene.splat", splatBytes)
    assert(ex.entryType == EntryType.GaussianSplat && ex.properties.contains("\"splatCount\":4"))
  }

  test("convertToSpz dispatch mirrors gsplat.cpp:398-460") {
    val splats = mk(48, 1, seed = 9)
    // .splat → gzip SPZ delivery artifact
    val fromSplat = Splats.convertToSpz("scene.splat", Splats.writeSplat(splats))
    assert((fromSplat(0) & 0xff) === 0x1f && (fromSplat(1) & 0xff) === 0x8b, "delivery artifact is gzip SPZ")
    assert(Splats.readSpz(fromSplat)._1.numPoints === 48)
    // 3DGS PLY → SPZ
    val fromPly = Splats.convertToSpz("scene.ply", Splats.toPly(splats))
    assert(Splats.readSpz(fromPly)._1.numPoints === 48)
    // gzip SPZ input: viewer-compatible, copied through UNCHANGED
    assert(Splats.convertToSpz("scene.spz", fromSplat) eq fromSplat)
  }

  test("convertToSpz refusals mirror gsplat_test.cpp (ksplat / unknown / non-splat PLY)") {
    // ksplatRequiresExternalTool (gsplat_test.cpp:495): arbitrary bytes,
    // extension is the signal, the missing dependency is NAMED
    val e = intercept[Splats.BuildDepMissing] {
      Splats.convertToSpz("scene.ksplat", "ksplatdata".getBytes)
    }
    assert(e.tool === "splat-transform")
    assert(e.getMessage.contains("splat-transform"))
    // unsupported extension (gsplat.cpp:406-407)
    val u = intercept[IllegalArgumentException] { Splats.convertToSpz("scene.xyz", Array[Byte](1)) }
    assert(u.getMessage.contains("Unsupported Gaussian Splat format"))
    // nonSplatPlyConversionThrows: a plain point-cloud PLY is not a splat
    val cloudPly = ("ply\nformat ascii 1.0\nelement vertex 2\n" +
      "property float x\nproperty float y\nproperty float z\nend_header\n" +
      "0 0 0\n1 1 1\n").getBytes("UTF-8")
    val p = intercept[IllegalArgumentException] { Splats.convertToSpz("cloud.ply", cloudPly) }
    assert(p.getMessage.contains("no splats decoded"))
    // spz that is neither gzip nor NGSP refuses by sniff
    intercept[IllegalArgumentException] { Splats.convertToSpz("x.spz", Array[Byte](0, 1, 2, 3)) }
  }

  test("PLY 3DGS bridge: fromPly(toPly) is exact; the written PLY dispatches as a splat") {
    val splats = mk(120, 1, 42)
    val ply = Splats.toPly(splats)
    assert(Ply.identify(ply) == EntryType.GaussianSplat)
    assert(Ply.info(ply).get.shDegree == 1)
    val back = Splats.fromPly(ply)
    assert(back == splats, "f32-exact through the PLY float32 cycle")
    // full conversion chain: PLY -> SPZ -> model stays within quantization
    val (info, viaSpz) = Splats.readSpz(Splats.writeSpz(back))
    assert(info.shDegree == 1)
    splats.zip(viaSpz).foreach { case (a, b) => assert(math.abs(a.x - b.x) <= 1f / 4096) }
  }
}
