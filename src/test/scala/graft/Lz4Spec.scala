package graft

import java.nio.file.Files

import graft.sources.Lz4

/** LZ4 conformance. Fixtures are REAL lz4 CLI output (v1.9.4): block
  * sizes 64K..4M, dependent blocks (cross-block matches), block
  * checksums, no-frame-crc, -9 HC sequences, stored (incompressible)
  * blocks, the legacy format, tiny/empty payloads, and a concatenated
  * multi-frame file with a leading skippable frame — all must decode
  * byte-exactly. Then: the header-only frame walk, a split-size sweep
  * through the real [[Lz4.jsonlLines]] Spark face, the encoder (whose
  * output the CLI accepted at capture time, pinned), and the
  * untrusted-bytes contract. */
class Lz4Spec extends SparkSuite {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val dir = new java.io.File("src/test/resources/graft/lz4")

  private def fixtures: Seq[String] =
    dir.listFiles().filter(_.getName.endsWith(".lz4")).map(_.getName.stripSuffix(".lz4")).sorted.toSeq

  test("decode: every real lz4-CLI fixture decodes byte-exactly") {
    // dict_* fixtures need their external dictionary — own test below
    val names = fixtures.filterNot(_.startsWith("dict_"))
    assert(names.size >= 11)
    assert(names.exists(_.contains("dep")) && names.exists(_.contains("legacy")) &&
      names.exists(_.contains("bx")) && names.exists(_.contains("hc")), "variant coverage")
    names.foreach { n =>
      val lz4 = Files.readAllBytes(new java.io.File(dir, n + ".lz4").toPath)
      val want = Files.readAllBytes(new java.io.File(dir, n + ".bin").toPath)
      val got = Lz4.decode(lz4)
      assert(java.util.Arrays.equals(got, want), s"$n: decode mismatch (${got.length} vs ${want.length})")
    }
  }

  test("xxh32 matches the published vectors") {
    assert(Lz4.xxh32(Array.emptyByteArray, 0, 0, 0) == 0x02cc5d05)
    // non-trivial values are transitively pinned by every fixture's
    // frame/content checksum; this is the degenerate-input anchor
  }

  test("framesOf: header-only walk finds every frame; each range decodes standalone") {
    val lz4 = Files.readAllBytes(new java.io.File(dir, "concat_skippable.lz4").toPath)
    val want = Files.readAllBytes(new java.io.File(dir, "concat_skippable.bin").toPath)
    val frames = Lz4.framesOf(lz4)
    assert(frames.length == 2, s"expected 2 content frames, got ${frames.length}")
    assert(frames.head._1 == 0, "leading skippable folds into the first frame's range")
    val cat = frames.flatMap { case (o, l) =>
      Lz4.decodeFrame(java.util.Arrays.copyOfRange(lz4, o.toInt, (o + l).toInt), 0)._1
    }.toArray
    assert(java.util.Arrays.equals(cat, want))
  }

  test("encode: greedy frames round-trip at every block size; CLI-validated bytes pinned") {
    val payload = Files.readAllBytes(new java.io.File(dir, "jsonl_b7.bin").toPath)
    for (bmax <- 4 to 7; bx <- Seq(false, true)) {
      val enc = Lz4.encode(payload, bmax = bmax, blockChecksum = bx, contentSize = bx)
      assert(java.util.Arrays.equals(Lz4.decode(enc), payload), s"encode round-trip drift b=$bmax bx=$bx")
    }
    // incompressible input falls back to stored blocks and round-trips
    val rnd = Files.readAllBytes(new java.io.File(dir, "rnd_b6.bin").toPath)
    assert(java.util.Arrays.equals(Lz4.decode(Lz4.encode(rnd)), rnd))
    assert(java.util.Arrays.equals(Lz4.decode(Lz4.encode(Array.emptyByteArray)), Array.emptyByteArray))
    // encoder.validated IS Lz4.encode(payload) captured once and
    // accepted by `lz4 -t` + `lz4 -d` byte-exact (r16) — pinning keeps
    // the writer CLI-conformant without a subprocess here
    val validated = new java.io.File(dir, "encoder.validated")
    assert(validated.exists(), "missing CLI-validated encoder fixture")
    assert(
      java.util.Arrays.equals(Lz4.encode(payload), Files.readAllBytes(validated.toPath)),
      "writer drifted from the CLI-validated bytes")
  }

  test("dictionary frames: every real lz4-CLI -D fixture decodes byte-exact with the dict") {
    val dict = Files.readAllBytes(new java.io.File(dir, "dict.bin").toPath)
    val bigDict = Files.readAllBytes(new java.io.File(dir, "dict_big.bin").toPath)
    for ((name, d) <- Seq(("dict_b4", dict), ("dict_dep", dict), ("dict_hc", dict), ("dict_bigd", bigDict))) {
      val enc = Files.readAllBytes(new java.io.File(dir, name + ".lz4").toPath)
      val want = Files.readAllBytes(new java.io.File(dir, name + ".bin").toPath)
      assert(java.util.Arrays.equals(Lz4.decode(enc, d), want), s"$name: dict decode drift")
      // the dict is load-bearing (asserted against the CLI at capture):
      // without it the frame must refuse, never mis-decode
      val e = intercept[Lz4.Lz4Error](Lz4.decode(enc))
      assert(e.getMessage.contains("window") || e.getMessage.contains("dictionary"), s"$name: $e")
    }
    // dict_bigd used a >64 KiB dictionary: only the last 64 KiB are the
    // window, so trimming the head off ourselves decodes identically
    val encBig = Files.readAllBytes(new java.io.File(dir, "dict_bigd.lz4").toPath)
    val tail = java.util.Arrays.copyOfRange(bigDict, bigDict.length - 65536, bigDict.length)
    assert(java.util.Arrays.equals(Lz4.decode(encBig, tail), Lz4.decode(encBig, bigDict)))
  }

  test("dictionary-ID frames: decode with a dict, refuse loudly without") {
    // the CLI never writes the Dictionary-ID field, so the id-present
    // path is crafted here: set FLG bit 0, splice a 4-byte id, and
    // recompute the header checksum per the frame spec
    val dict = Files.readAllBytes(new java.io.File(dir, "dict.bin").toPath)
    val enc = Files.readAllBytes(new java.io.File(dir, "dict_b4.lz4").toPath)
    val flg = enc(4)
    assert((flg & 0x01) == 0, "CLI fixture unexpectedly carries a dict id")
    val crafted = new java.io.ByteArrayOutputStream()
    crafted.write(enc, 0, 4)
    val desc = Array[Byte]((flg | 0x01).toByte, enc(5), 0x2a, 0x5c, 0x1f, 0x04.toByte)
    crafted.write(desc)
    crafted.write((Lz4.xxh32(desc, 0, desc.length, 0) >>> 8) & 0xff)
    crafted.write(enc, 7, enc.length - 7) // blocks + trailer (after old 1-byte HC)
    val bytes = crafted.toByteArray
    assert(java.util.Arrays.equals(Lz4.decode(bytes, dict), Lz4.decode(enc, dict)))
    val e = intercept[Lz4.Lz4Error](Lz4.decode(bytes))
    assert(e.getMessage.contains("external dictionary"), e.getMessage)
  }

  test("encodeDict: dict frames round-trip; CLI-validated bytes pinned") {
    val dict = Files.readAllBytes(new java.io.File(dir, "dict.bin").toPath)
    val payload = Files.readAllBytes(new java.io.File(dir, "dict_b4.bin").toPath)
    for (bmax <- Seq(4, 6)) {
      val enc = Lz4.encodeDict(payload, dict, bmax = bmax)
      assert(java.util.Arrays.equals(Lz4.decode(enc, dict), payload), s"encodeDict round-trip drift b=$bmax")
      // the dict must be load-bearing in our output too (shared vocab)
      intercept[Lz4.Lz4Error](Lz4.decode(enc))
    }
    // >64 KiB dict: the writer trims to the window; both spellings agree
    val bigDict = Files.readAllBytes(new java.io.File(dir, "dict_big.bin").toPath)
    val tail = java.util.Arrays.copyOfRange(bigDict, bigDict.length - 65536, bigDict.length)
    assert(java.util.Arrays.equals(Lz4.encodeDict(payload, bigDict), Lz4.encodeDict(payload, tail)))
    // encoder_dict.validated IS Lz4.encodeDict(payload, dict) captured
    // once and decoded byte-exact by `lz4 -D dict.bin -d` (r17 —
    // Lz4DictCapture regenerates) — pinning keeps the writer
    // CLI-conformant without a subprocess here
    val validated = new java.io.File(dir, "encoder_dict.validated")
    assert(validated.exists(), "missing CLI-validated dict-encoder fixture")
    assert(
      java.util.Arrays.equals(Lz4.encodeDict(payload, dict), Files.readAllBytes(validated.toPath)),
      "dict writer drifted from the CLI-validated bytes")
  }

  test("jsonlLines: split sweep over a multi-frame shard equals the whole decode") {
    val tmp = Files.createTempDirectory("lz4spec")
    try {
      val lines = (0 until 4000).map(i => s"""{"i":$i,"w":"w${i % 31}"}""")
      val file = {
        val o = new java.io.ByteArrayOutputStream()
        lines.grouped(500).foreach { g =>
          o.write(Lz4.encode(g.mkString("", "\n", "\n").getBytes(Utf8), bmax = 4))
        }
        o.toByteArray
      }
      val p = tmp.resolve("shard.jsonl.lz4")
      Files.write(p, file)
      for (split <- Seq(file.length.toLong + 7, 4096L, 512L)) {
        val got = Lz4.jsonlLines(spark, p.toString, splitSize = split)
          .collect()
          .map(r => (r.getInt(0), r.getString(1)))
          .sortBy(t => (t._1, t._2))
        assert(got.length == lines.length, s"split $split: ${got.length} lines")
        assert(got.map(_._2).sorted.sameElements(lines.sorted), s"split $split: line set drift")
      }
    } finally {
      tmp.toFile.listFiles().foreach(_.delete()); Files.deleteIfExists(tmp)
    }
  }

  test("malformed input raises Lz4Error, never raw index errors") {
    val good = Files.readAllBytes(new java.io.File(dir, "jsonl_b4.lz4").toPath)
    // truncations at every interesting boundary
    for (cut <- Seq(2, 6, 9, 40, good.length - 3))
      intercept[Lz4.Lz4Error](Lz4.decode(java.util.Arrays.copyOf(good, cut)))
    // bit flips: either a named error or (rarely) a clean decode —
    // never a raw exception
    for (pos <- Seq(4, 5, 7, 20, 100, 5000)) {
      val bad = good.clone()
      bad(pos) = (bad(pos) ^ 0x41).toByte
      try { Lz4.decode(bad); () }
      catch { case _: Lz4.Lz4Error => () }
    }
    // legacy-frame varlen bomb: a literal-length extension long enough
    // to wrap a 32-bit accumulator must raise, never decode misaligned
    {
      val block = new java.io.ByteArrayOutputStream()
      block.write(0xf0) // token: litLen 15 + extensions
      block.write(Array.fill(2 << 20)(0xff.toByte)) // ~536M accumulated
      val bomb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(0x184c2102).putInt(block.size()).array() ++ block.toByteArray
      intercept[Lz4.Lz4Error](Lz4.decode(bomb))
    }
    // hostile skippable size (signed-read trap)
    val hostile = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(0x184d2a50).putInt(0xfffffff8).putInt(0).putInt(0).array()
    intercept[Lz4.Lz4Error](Lz4.decode(hostile))
    intercept[Lz4.Lz4Error](Lz4.framesOf(hostile))
    // allocation bomb: a ~20-byte frame with a VALID header CRC
    // declaring a 1 GiB content size must raise (and, since r17, never
    // preallocates the declared size — the buffer starts at one block)
    locally {
      val o = new java.io.ByteArrayOutputStream()
      o.write(Array[Byte](0x04, 0x22, 0x4d, 0x18)) // frame magic LE
      val desc = Array[Byte]((0x40 | 0x20 | 0x08).toByte, 0x40, // FLG: v1+indep+contentSize; BD: 64K
        0, 0, 0, 0x40, 0, 0, 0, 0) // content size 1 GiB LE
      o.write(desc)
      o.write((Lz4.xxh32(desc, 0, desc.length, 0) >>> 8) & 0xff)
      o.write(Array[Byte](0, 0, 0, 0)) // EndMark with no blocks
      val e = intercept[Lz4.Lz4Error](Lz4.decode(o.toByteArray))
      assert(e.getMessage.contains("content size"))
    }
  }
}
