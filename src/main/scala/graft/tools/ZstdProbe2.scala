package graft.tools

// scratch: encoder round-trips + dump encodings for CLI cross-check
object ZstdProbe2 {
  def main(args: Array[String]): Unit = {
    import graft.sources.Zstd
    val rnd = new scala.util.Random(7)
    val cases: Seq[(String, Array[Byte], Zstd.EncOpts)] = Seq(
      ("empty", Array.emptyByteArray, Zstd.EncOpts()),
      ("tiny", "hello zstd".getBytes, Zstd.EncOpts()),
      ("json", (0 until 500).map(i => s"""{"id":$i,"t":"word${i % 37} common phrase"}""").mkString("\n").getBytes, Zstd.EncOpts()),
      ("json4s", (0 until 500).map(i => s"""{"id":$i,"t":"word${i % 37} common phrase"}""").mkString("\n").getBytes, Zstd.EncOpts(fourStreams = true)),
      ("jsonfse", (0 until 500).map(i => s"""{"id":$i,"t":"word${i % 37} common phrase"}""").mkString("\n").getBytes, Zstd.EncOpts(fseWeights = true)),
      ("rle", Array.fill[Byte](9000)(0x55), Zstd.EncOpts()),
      ("rand", Array.fill[Byte](4000)(rnd.nextInt().toByte), Zstd.EncOpts()),
      ("big", (0 until 8000).map(i => s"line $i of the corpus with repeated structure ${i % 11}").mkString("\n").getBytes, Zstd.EncOpts(fourStreams = true, fseWeights = true)),
      ("nocheck", "abcabcabcabc".getBytes, Zstd.EncOpts(checksum = false))
    )
    cases.foreach { case (name, data, opts) =>
      try {
        val enc = Zstd.encode(data, opts)
        val dec = Zstd.decode(enc)
        val ok = java.util.Arrays.equals(dec, data)
        java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/zenc_$name.zst"), enc)
        println(s"$name ${if (ok) "OK" else "MISMATCH"} ratio=${enc.length}/${data.length}")
      } catch { case e: Throwable => println(s"$name FAIL ${e.getMessage}") }
    }
  }
}
