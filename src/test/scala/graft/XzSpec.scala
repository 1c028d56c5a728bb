package graft

import java.nio.file.{Files, Path}

import graft.sources.Xz

/** XZ / LZMA conformance. Fixtures are REAL liblzma output (python's
  * stdlib lzma binding): presets 0/3/6/9e, check types
  * none/CRC32/CRC64/SHA256, custom lc/lp/pb filter chains, a
  * delta+LZMA2 chain, the legacy alone format, concatenated streams,
  * empty and tiny payloads — all must decode byte-exactly. Then: the
  * metadata-only stream walk, a split-size sweep through the real
  * [[Xz.jsonlLines]] Spark face, the raw-chunk writer round-trip, and
  * the untrusted-bytes contract. */
class XzSpec extends SparkSuite {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val dir = new java.io.File("src/test/resources/graft/xz")

  private def fixtures: Seq[String] =
    dir.listFiles().filter(_.getName.endsWith(".xz")).map(_.getName.stripSuffix(".xz")).sorted.toSeq

  test("decode: every real liblzma fixture decodes byte-exactly") {
    val names = fixtures
    assert(names.size >= 11)
    assert(names.exists(_.contains("sha256")) && names.exists(_.contains("crc64")) &&
      names.exists(_.contains("none")), "check-type coverage")
    names.foreach { n =>
      val xz = Files.readAllBytes(new java.io.File(dir, n + ".xz").toPath)
      val want = Files.readAllBytes(new java.io.File(dir, n + ".bin").toPath)
      val got = if (n.contains("alone")) Xz.decodeAlone(xz) else Xz.decode(xz)
      assert(java.util.Arrays.equals(got, want), s"$n: decode mismatch (${got.length} vs ${want.length})")
    }
  }

  test("streamsOf: metadata-only walk finds every concatenated stream boundary") {
    val xz = Files.readAllBytes(new java.io.File(dir, "concat_2streams.xz").toPath)
    val streams = Xz.streamsOf(xz)
    assert(streams.length == 2)
    assert(streams.head._1 == 0)
    // each discovered range must decode standalone
    val want = Files.readAllBytes(new java.io.File(dir, "concat_2streams.bin").toPath)
    val cat = streams.sortBy(_._1).flatMap { case (o, l) =>
      Xz.decodeStream(java.util.Arrays.copyOfRange(xz, o.toInt, (o + l).toInt), 0)._1
    }.toArray
    assert(java.util.Arrays.equals(cat, want))
  }

  test("encodeRawXz: output is byte-exactly the liblzma-validated container") {
    // rawwriter{,_empty}.xz ARE encodeRawXz output, captured once and
    // validated externally: python's lzma.decompress returns the exact
    // payload and `xz -t` passes (r16 — the earlier 8-byte block header
    // left no room for the filter entry, so its props byte sat where
    // the header CRC goes and liblzma rejected the stream as corrupt).
    // Pinning the bytes keeps the writer conformant without a
    // subprocess in the test.
    val want = Files.readAllBytes(new java.io.File(dir, "rawwriter.xz").toPath)
    val bin = Files.readAllBytes(new java.io.File(dir, "rawwriter.bin").toPath)
    assert(java.util.Arrays.equals(Xz.encodeRawXz(bin), want), "writer drifted from the liblzma-validated bytes")
    val emptyWant = Files.readAllBytes(new java.io.File(dir, "rawwriter_empty.xz").toPath)
    assert(java.util.Arrays.equals(Xz.encodeRawXz(Array.emptyByteArray), emptyWant))
  }

  test("decodeStream: filter fields overrunning the block header fail loudly") {
    // craft: take a valid raw-writer stream and shrink the declared
    // block-header size so the filter entry would spill into the CRC
    val xz = Xz.encodeRawXz("abc".getBytes(Utf8))
    val bad = xz.clone()
    bad(12) = 1 // header size byte: 12 -> 8, filter props now overlap the CRC
    // re-fix the header CRC so the size tamper itself isn't what trips
    val crc = { val c = new java.util.zip.CRC32(); c.update(bad, 12, 4); c.getValue.toInt }
    bad(16) = (crc & 0xff).toByte; bad(17) = ((crc >> 8) & 0xff).toByte
    bad(18) = ((crc >> 16) & 0xff).toByte; bad(19) = ((crc >> 24) & 0xff).toByte
    intercept[Xz.XzError](Xz.decode(bad))
  }

  test("BCJ filters: all ten real-liblzma fixtures present, byte-exact, and transforms round-trip") {
    // fixture sweep above already decodes these byte-exactly; this
    // pins COVERAGE (a deleted fixture may not silently shrink the
    // conformance surface) and the transform identities
    val expected = Seq("bcj_x86", "bcj_x86_start16", "bcj_powerpc", "bcj_ia64",
      "bcj_arm", "bcj_armthumb", "bcj_sparc", "bcj_arm64", "bcj_riscv", "bcj_riscv_start64")
    expected.foreach(n => assert(fixtures.contains(n), s"missing BCJ fixture $n"))
    // encode→decode identity per filter over branch-dense bytes
    val ids = Seq(0x04L, 0x05L, 0x06L, 0x07L, 0x08L, 0x09L, 0x0aL, 0x0bL)
    val base = Files.readAllBytes(new java.io.File(dir, "bcj_x86.bin").toPath)
    for (id <- ids; start <- Seq(0L, 4096L)) {
      val enc = base.clone()
      Xz.Bcj(id, enc, 0, enc.length, start, encode = true)
      Xz.Bcj(id, enc, 0, enc.length, start, encode = false)
      assert(java.util.Arrays.equals(enc, base), s"BCJ $id start=$start round-trip drift")
    }
    // riscv ENCODER pinned byte-exact against liblzma's own filter
    // output (the CLI's riscv+lzma2 raw stream with the LZMA2 layer
    // stripped at capture — see gen_bcj_fixtures.py provenance)
    val rvBin = Files.readAllBytes(new java.io.File(dir, "bcj_riscv.bin").toPath)
    val rvValidated = Files.readAllBytes(new java.io.File(dir, "bcj_riscv_filtered.validated").toPath)
    val rvEnc = rvBin.clone()
    Xz.Bcj(0x0bL, rvEnc, 0, rvEnc.length, 0L, encode = true)
    assert(java.util.Arrays.equals(rvEnc, rvValidated), "riscv encode drifts from liblzma's filter output")
    Xz.Bcj(0x0bL, rvEnc, 0, rvEnc.length, 0L, encode = false)
    assert(java.util.Arrays.equals(rvEnc, rvBin), "riscv decode does not invert")
    // riscv over the ADVERSARIAL corpus (artifact shapes, escapes,
    // dual-match corners — the differential-fuzz generator family):
    // encoder matches liblzma byte-exactly, decoder inverts
    val adv = Files.readAllBytes(new java.io.File(dir, "bcj_riscv_adv.bin").toPath)
    val advValidated = Files.readAllBytes(new java.io.File(dir, "bcj_riscv_adv.validated").toPath)
    val advEnc = adv.clone()
    Xz.Bcj(0x0bL, advEnc, 0, advEnc.length, 0L, encode = true)
    assert(java.util.Arrays.equals(advEnc, advValidated), "riscv adversarial encode drifts from liblzma")
    Xz.Bcj(0x0bL, advEnc, 0, advEnc.length, 0L, encode = false)
    assert(java.util.Arrays.equals(advEnc, adv), "riscv adversarial decode does not invert")
    // unknown filter id refuses cleanly
    intercept[Xz.XzError](Xz.Bcj(0x0cL, base.clone(), 0, base.length, 0L, encode = false))
  }

  test("encodeRawXz: BCJ-chained streams decode back and match the liblzma-validated bytes") {
    // the q_xz filtered lane: a two-entry chain [bcj, lzma2] written by
    // encodeRawXz must decode to the original through the real header
    // parse (filters applied in reverse declared order). The
    // rawbcj_*.validated fixtures ARE this writer's output, captured
    // once and accepted by python lzma.decompress + `xz -t` (r16) —
    // pinning them keeps the 2-filter header liblzma-conformant
    // without a subprocess in the test.
    val payload = Files.readAllBytes(new java.io.File(dir, "bcj_arm.bin").toPath)
    for ((id, name) <- Seq(0x04L -> "x86", 0x07L -> "arm", 0x0aL -> "arm64")) {
      val xz = Xz.encodeRawXz(payload, id)
      assert(java.util.Arrays.equals(Xz.decode(xz), payload), s"BCJ-chained raw stream drift (id $id)")
      val validated = Files.readAllBytes(new java.io.File(dir, s"rawbcj_$name.validated").toPath)
      assert(java.util.Arrays.equals(xz, validated), s"writer drifted from liblzma-validated bytes ($name)")
    }
  }

  test("encodeRawXz: real-container raw chunks round-trip, incl. empty and multi-chunk") {
    Seq(
      Array.emptyByteArray,
      "x".getBytes(Utf8),
      Array.tabulate(200000)(i => (i * 7).toByte) // several 64 KiB chunks
    ).foreach { data =>
      val enc = Xz.encodeRawXz(data)
      assert(java.util.Arrays.equals(Xz.decode(enc), data), s"raw round-trip drift at ${data.length} B")
    }
  }

  test("jsonlLines: split sweep over a many-stream shard equals the whole decode") {
    val tmp = Files.createTempDirectory("xz-jsonl")
    try {
      val lines = (0 until 900).map(i => s"""{"id":$i,"w":"${"w" * (i % 41)}"}""")
      // 12 streams with stream padding between some of them
      val streams = lines.grouped(75).map { g =>
        Xz.encodeRawXz(g.mkString("", "\n", "\n").getBytes(Utf8))
      }.toSeq
      val out = new java.io.ByteArrayOutputStream()
      streams.zipWithIndex.foreach { case (s, i) =>
        out.write(s)
        if (i % 3 == 1) out.write(new Array[Byte](4)) // stream padding
      }
      val file = out.toByteArray
      assert(Xz.streamsOf(file).length == 12)
      val p = tmp.resolve("many.jsonl.xz")
      Files.write(p, file)
      for (split <- Seq(file.length.toLong + 3, file.length.toLong / 4, 512L)) {
        val got = Xz.jsonlLines(spark, p.toString, splitSize = split)
          .collect().map(r => (r.getInt(0), r.getString(1)))
        assert(got.length == lines.length, s"split $split: ${got.length} lines")
        assert(got.map(_._2).sorted.toSeq == lines.sorted, s"split $split: line multiset drift")
        got.groupBy(_._1).foreach { case (si, ls) =>
          assert(ls.map(_._2).toSeq.sorted == lines.grouped(75).toSeq(si).sorted, s"split $split: stream $si drift")
        }
      }
    } finally {
      tmp.toFile.listFiles().foreach(_.delete()); Files.deleteIfExists(tmp)
    }
  }

  test("streamsOfRanged: the metadata-only driver walk equals the in-memory walk (no payload reads)") {
    val xz = Files.readAllBytes(new java.io.File(dir, "concat_2streams.xz").toPath)
    var bytesRead = 0L
    val ranged: (Long, Int) => Array[Byte] = { (off, n) =>
      bytesRead += n
      java.util.Arrays.copyOfRange(xz, off.toInt, off.toInt + n)
    }
    assert(Xz.streamsOfRanged(ranged, xz.length.toLong) == Xz.streamsOf(xz))
    // and on a many-stream composite
    val streams = (0 until 9).map(i =>
      Xz.encodeRawXz((s"payload $i " + "x" * (i * 50) + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val cat = streams.reduce(_ ++ _)
    assert(Xz.streamsOfRanged((o, n) => java.util.Arrays.copyOfRange(cat, o.toInt, o.toInt + n), cat.length.toLong)
      == Xz.streamsOf(cat))
  }

  test("malformed input raises XzError, never raw index errors; checksums reject corruption") {
    val good = Files.readAllBytes(new java.io.File(dir, "jsonl_p6_crc64.xz").toPath)
    (Seq(1, 3, 5, 7, 11, 13) ++ (14 until good.length by 31)).foreach { cut =>
      intercept[Xz.XzError](Xz.decode(java.util.Arrays.copyOf(good, cut)))
    }
    // flip one payload byte: the CRC64 must catch any silent mis-decode
    (12 until good.length - 24 by 9).foreach { i =>
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x41).toByte
      try { Xz.decode(bad); () }
      catch { case _: Xz.XzError => () }
    }
    // corrupt the stored check itself
    val bad2 = good.clone()
    bad2(good.length - 20) = (bad2(good.length - 20) ^ 1).toByte
    intercept[Xz.XzError](Xz.decode(bad2))
  }

  test("block header: nonzero padding and misaligned BCJ start offsets reject (liblzma parity)") {
    def crc32(b: Array[Byte], off: Int, len: Int): Int = {
      val c = new java.util.zip.CRC32
      c.update(b, off, len)
      c.getValue.toInt
    }
    def putCrc(h: Array[Byte]): Array[Byte] = {
      val v = crc32(h, 0, h.length - 4)
      h(h.length - 4) = (v & 0xff).toByte; h(h.length - 3) = ((v >> 8) & 0xff).toByte
      h(h.length - 2) = ((v >> 16) & 0xff).toByte; h(h.length - 1) = ((v >> 24) & 0xff).toByte
      h
    }
    def stream(header: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(Array[Byte](0xfd.toByte, '7', 'z', 'X', 'Z', 0))
      val flags = Array[Byte](0, 1)
      o.write(flags)
      val fc = crc32(flags, 0, 2)
      o.write(Array[Byte]((fc & 0xff).toByte, ((fc >> 8) & 0xff).toByte, ((fc >> 16) & 0xff).toByte, ((fc >> 24) & 0xff).toByte))
      o.write(header)
      o.write(new Array[Byte](16)) // never reached: the header must reject first
      o.toByteArray
    }
    // 1-filter header with a NONZERO padding byte (valid CRC): spec
    // requires zero padding between the last filter entry and the CRC
    val padded = putCrc(Array[Byte](2, 0, 0x21, 1, 0x16, 1, 0, 0, 0, 0, 0, 0))
    val e1 = intercept[Xz.XzError](Xz.decodeStream(stream(padded), 0))
    assert(e1.getMessage.contains("padding"))
    // 2-filter header: PPC BCJ with start offset 2 (alignment is 4)
    val misaligned = putCrc(Array[Byte](3, 1, 0x05, 4, 2, 0, 0, 0, 0x21, 1, 0x16, 0, 0, 0, 0, 0))
    val e2 = intercept[Xz.XzError](Xz.decodeStream(stream(misaligned), 0))
    assert(e2.getMessage.contains("aligned"))
    // control: the same PPC chain with start offset 8 parses past the
    // header (fails later in block data, not at the header checks)
    val aligned = putCrc(Array[Byte](3, 1, 0x05, 4, 8, 0, 0, 0, 0x21, 1, 0x16, 0, 0, 0, 0, 0))
    val e3 = intercept[Xz.XzError](Xz.decodeStream(stream(aligned), 0))
    assert(!e3.getMessage.contains("padding") && !e3.getMessage.contains("aligned"))
  }
}
