package graft.tools

import graft.sources.{Bcj2, SevenZip}

/** Capture tool for the BCJ2 behavioral pins: writes BCJ2 archives
  * over an adversarial corpus to args(0); tools/gen_bcj2_pins.sh then
  * extracts each with bsdtar (libarchive's independent BCJ2 decoder)
  * and records byte-equality + sha256 pins consumed by Bcj2Spec. */
object Bcj2Capture {

  /** Adversarial corpus: branch opcodes at every alignment, 0F-prefix
    * chains, operands that wrap, opcodes in the tail positions, dense
    * E8 runs, plus realistic x86-ish machine bytes. Deterministic. */
  def corpus: Seq[(String, Array[Byte])] = {
    val rnd = new scala.util.Random(0x18b2L)
    def rand(n: Int): Array[Byte] = { val b = new Array[Byte](n); rnd.nextBytes(b); b }
    val dense = Array.tabulate(4096) { i =>
      (i % 7 match {
        case 0 => 0xe8
        case 1 => 0xe9
        case 2 => 0x0f
        case 3 => 0x80 + (i % 16)
        case _ => i * 37
      }).toByte
    }
    val tails = (0 until 8).map { k =>
      s"tail_$k" -> (rand(64) ++ Array.fill(k)(0xe8.toByte))
    }
    val x86ish = {
      val o = new java.io.ByteArrayOutputStream()
      var i = 0
      while (o.size < 30000) {
        // call rel32; jmp rel32; jcc rel32; filler
        o.write(0xe8); (0 until 4).foreach(_ => o.write(rnd.nextInt(256)))
        o.write(0x89); o.write(0x45); o.write(i & 0xff)
        o.write(0xe9); (0 until 4).foreach(_ => o.write(rnd.nextInt(256)))
        o.write(0x0f); o.write(0x84 + (i % 12)); (0 until 4).foreach(_ => o.write(rnd.nextInt(256)))
        i += 1
      }
      o.toByteArray
    }
    Seq(
      "empty" -> Array.emptyByteArray,
      "one_e8" -> Array[Byte](0xe8.toByte),
      "five_e8" -> Array.fill(5)(0xe8.toByte),
      "dense_branches" -> dense,
      "x86ish_30k" -> x86ish,
      "random_16k" -> rand(16384),
      "zero_4k" -> new Array[Byte](4096),
      "0f_chain" -> Array.tabulate(512)(i => (if (i % 2 == 0) 0x0f else 0x80 + (i / 2) % 16).toByte),
      "only_e9" -> (Array[Byte](0xe9.toByte) ++ Array.fill(8)(0x11.toByte)),
      "only_e8" -> (Array[Byte](0xe8.toByte) ++ Array.fill(8)(0x22.toByte)),
      "e9_then_e8" -> (Array[Byte](0xe9.toByte) ++ Array.fill(6)(0x33.toByte) ++ Array[Byte](0xe8.toByte) ++ Array.fill(6)(0x44.toByte)),
      "jcc_once" -> Array[Byte](0x0f.toByte, 0x84.toByte, 0xaa.toByte, 0xbb.toByte, 0xcc.toByte, 0xdd.toByte, 0x11, 0x22),
      "jcc_x2" -> Array.tabulate(16)(i => (if (i % 2 == 0) 0x0f else 0x80 + (i / 2) % 16).toByte),
      "jcc_x8" -> Array.tabulate(32)(i => (if (i % 2 == 0) 0x0f else 0x80 + (i / 2) % 16).toByte),
      "jcc_pad" -> (Array.tabulate(20)(i => (if (i % 2 == 0) 0x0f else 0x80 + (i / 2) % 16).toByte) ++ Array.fill(16)(0x55.toByte))
    ) ++ tails ++ Seq(48, 64, 96, 128, 192, 256, 384).map(n =>
      s"jcc_len_$n" -> Array.tabulate(n)(i => (if (i % 2 == 0) 0x0f else 0x80 + (i / 2) % 16).toByte)) ++
      (0 until 120).map { k =>
        // mixed-density fuzz: branch bytes seeded at random positions
        val n = 1 + rnd.nextInt(6000)
        val b = rand(n)
        val density = 2 + rnd.nextInt(24)
        var p = rnd.nextInt(density + 1)
        while (p < n) {
          b(p) = Seq(0xe8, 0xe9, 0x0f)(rnd.nextInt(3)).toByte
          if (p + 1 < n && rnd.nextBoolean()) b(p + 1) = (0x80 + rnd.nextInt(16)).toByte
          p += 1 + rnd.nextInt(density)
        }
        s"fuzz_$k" -> b
      }
  }

  /** The subset committed as pins (named cases + a fuzz sample). */
  def pinCorpus: Seq[(String, Array[Byte])] =
    corpus.filter { case (n, _) => !n.startsWith("fuzz_") || n.stripPrefix("fuzz_").toInt < 16 }

  def main(args: Array[String]): Unit = {
    val outDir = new java.io.File(args(0))
    val mode = if (args.length > 1) args(1) else "full"
    outDir.mkdirs()
    val (set, shapes) =
      if (mode == "pins") (pinCorpus, Seq("two"))
      else (corpus, Seq("two", "copy", "packed"))
    for ((name, data) <- set; shape <- shapes) {
      val archive = SevenZip.buildBcj2Archive(Seq((s"$name.bin", data)), shape)
      java.nio.file.Files.write(new java.io.File(outDir, s"bcj2_${shape}_$name.7z").toPath, archive)
      java.nio.file.Files.write(new java.io.File(outDir, s"bcj2_${shape}_$name.expected").toPath, data)
      // self round-trip sanity before the bsdtar pass
      val (m, c, j, r) = Bcj2.encode(data)
      val back = Bcj2.decode(m, c, j, r, data.length)
      require(java.util.Arrays.equals(back, data), s"bcj2 self round-trip drift on $name")
    }
    println(s"wrote ${set.size * shapes.size} archives to $outDir ($mode)")
  }
}
