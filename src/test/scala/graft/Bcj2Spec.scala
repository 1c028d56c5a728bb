package graft

import graft.sources.{Bcj2, SevenZip}
import org.scalatest.funsuite.AnyFunSuite

/** BCJ2 (7z 4-stream x86 coder) conformance.
  *
  * No BCJ2 PRODUCER exists in this container (bsdtar's 7z writer
  * stops at copy/deflate/bzip2/lzma1/lzma2/ppmd; no 7z binary, no
  * py7zr — probe in NOTES_r18), but libarchive READS BCJ2 — so the
  * closure pattern inverts: OUR encoder's archives were extracted by
  * bsdtar 3.8.2 at capture (tools/gen_bcj2_pins.sh, byte-exact or the
  * capture aborts; the full differential ran 150 corpora through the
  * libarchive-readable 2-coder folder form with 150/150 byte-exact).
  * The committed pins keep that validation honest: this spec
  * regenerates every pinned archive from the same corpus and requires
  * byte-identity — any encoder drift breaks the bsdtar-validated
  * bytes — and decodes every pin back through our reader against the
  * manifest sha256s.
  *
  * Behavioral findings the pins encode (extracted against libarchive,
  * not assumed): the original 7-Zip probability layout (256 E8 slots
  * keyed by previous byte, then E9, then jcc), and a decision bit for
  * EVERY scanned branch opcode — including ones whose 4-byte operand
  * would overrun the stream (forced 0); the first tail-rule guess
  * (no bit) passed or failed per-corpus depending on residual rc bits,
  * which is exactly why the differential had to be adversarial. */
class Bcj2Spec extends AnyFunSuite {

  private def sha256(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b).map("%02x".format(_)).mkString

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/sevenzip/bcj2/$name")
    assert(in != null, s"missing pin $name")
    try in.readAllBytes()
    finally in.close()
  }

  private lazy val manifest: Map[String, Map[String, String]] = {
    val txt = new String(resource("manifest.json"), java.nio.charset.StandardCharsets.UTF_8)
    // flat two-level {name: {k: v}} — parse without a json lib
    val entry = """"(bcj2_[^"]+)":\{([^}]*)\}""".r
    val kv = """"([^"]+)":"([^"]*)"""".r
    entry.findAllMatchIn(txt).map { m =>
      m.group(1) -> kv.findAllMatchIn(m.group(2)).map(k => k.group(1) -> k.group(2)).toMap
    }.toMap
  }

  test("determinism pin: every committed bsdtar-validated archive regenerates byte-identically") {
    val byName = graft.tools.Bcj2Capture.pinCorpus.toMap
    assert(manifest.nonEmpty)
    for ((pin, meta) <- manifest) {
      val corpusName = pin.stripPrefix("bcj2_two_")
      val data = byName.getOrElse(corpusName, fail(s"pin $pin has no corpus entry"))
      val rebuilt = SevenZip.buildBcj2Archive(Seq((s"$corpusName.bin", data)), "two")
      assert(sha256(rebuilt) == meta("archive_sha256"),
        s"$pin: encoder drifted from the bsdtar-validated bytes")
      assert(sha256(data) == meta("payload_sha256"), s"$pin: corpus drift")
    }
  }

  test("our reader decodes every pinned archive to the manifest payload") {
    for ((pin, meta) <- manifest) {
      val got = SevenZip.unpackAll(resource(s"$pin.7z"))
      assert(got.length == 1)
      assert(sha256(got.head._2) == meta("payload_sha256"), s"$pin: reader payload drift")
    }
  }

  test("all three folder shapes round-trip through our reader over the full corpus") {
    for ((name, data) <- graft.tools.Bcj2Capture.corpus; shape <- Seq("two", "copy", "packed")) {
      val got = SevenZip.unpackAll(SevenZip.buildBcj2Archive(Seq((s"$name.bin", data)), shape))
      assert(got.length == 1 && java.util.Arrays.equals(got.head._2, data), s"$shape/$name drift")
    }
  }

  test("stream-level encode/decode round-trip over branch-dense random corpora") {
    val rnd = new scala.util.Random(77)
    for (k <- 0 until 300) {
      val n = rnd.nextInt(3000)
      val data = new Array[Byte](n)
      rnd.nextBytes(data)
      var p = 0
      while (p < n) { // branch-dense
        data(p) = Seq(0xe8, 0xe9, 0x0f)(rnd.nextInt(3)).toByte
        if (p + 1 < n && rnd.nextBoolean()) data(p + 1) = (0x80 + rnd.nextInt(16)).toByte
        p += 1 + rnd.nextInt(9)
      }
      val (m, c, j, r) = Bcj2.encode(data)
      assert(java.util.Arrays.equals(Bcj2.decode(m, c, j, r, n), data), s"fuzz #$k drift")
    }
  }

  test("hostility: truncated/odd/overrunning streams raise named errors, never raw ones") {
    val data = Array.tabulate(600)(i => (if (i % 9 == 0) 0xe8 else i * 31).toByte)
    val (m, c, j, r) = Bcj2.encode(data)
    intercept[Bcj2.Bcj2Error](Bcj2.decode(m, c.take(c.length - 4), j, r, data.length))
    intercept[Bcj2.Bcj2Error](Bcj2.decode(m, c.take(3), j, r, data.length)) // not 4-aligned
    intercept[Bcj2.Bcj2Error](Bcj2.decode(m, c, j, Array[Byte](0, 0), data.length)) // rc < 5
    intercept[Bcj2.Bcj2Error](Bcj2.decode(m.take(m.length - 2), c, j, r, data.length))
    intercept[Bcj2.Bcj2Error](Bcj2.decode(m, c ++ Array[Byte](1, 2, 3, 4), j, r, data.length)) // leftover
    // declared output larger than the streams can produce
    intercept[Bcj2.Bcj2Error](Bcj2.decode(m, c, j, r, data.length + 64))
    // mutation fuzz on a full archive: decode equal-bytes or a named error
    val arc = SevenZip.buildBcj2Archive(Seq(("f.bin", data)), "two")
    val rnd = new scala.util.Random(181)
    for (_ <- 0 until 300) {
      val mu = arc.clone()
      val at = rnd.nextInt(mu.length)
      mu(at) = (mu(at) ^ (1 + rnd.nextInt(255))).toByte
      try { SevenZip.unpackAll(mu); () }
      catch { case _: SevenZip.SevenZipError => () }
    }
  }
}
