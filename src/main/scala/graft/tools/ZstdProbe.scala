package graft.tools

// scratch dev harness: decode golden fixtures with the pure-JVM decoder
object ZstdProbe {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("src/test/resources/graft/zstd")
    val names = dir.listFiles().filter(_.getName.endsWith(".zst")).map(_.getName.stripSuffix(".zst")).sorted
    names.foreach { n =>
      val zst = java.nio.file.Files.readAllBytes(new java.io.File(dir, n + ".zst").toPath)
      val want = java.nio.file.Files.readAllBytes(new java.io.File(dir, n + ".bin").toPath)
      try {
        val got = graft.sources.Zstd.decode(zst)
        val ok = java.util.Arrays.equals(got, want)
        println(s"$n ${if (ok) "OK" else s"MISMATCH got=${got.length} want=${want.length}"}")
      } catch {
        case e: Throwable => println(s"$n FAIL ${e.getMessage}")
      }
    }
  }
}
