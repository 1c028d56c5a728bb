package graft

import java.nio.file.{Files, Paths}

/** Capture tool for `encoder_dict.validated` (test scope; run via
  * `sbt "Test/runMain graft.Lz4DictCapture"`): writes
  * `Lz4.encodeDict(dict_b4.bin, dict.bin)` to /tmp so the lz4 CLI can
  * validate it (`lz4 -D dict.bin -d`) before the bytes are pinned into
  * resources. The pinned fixture is what Lz4Spec gates against, so the
  * writer cannot drift unconformant without this capture re-running. */
object Lz4DictCapture {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get("src/test/resources/graft/lz4")
    val dict = Files.readAllBytes(dir.resolve("dict.bin"))
    val payload = Files.readAllBytes(dir.resolve("dict_b4.bin"))
    val enc = graft.sources.Lz4.encodeDict(payload, dict)
    Files.write(Paths.get("/tmp/lz4_encoder_dict.lz4"), enc)
    println(s"wrote /tmp/lz4_encoder_dict.lz4 (${enc.length} bytes); validate with:")
    println("  lz4 -D src/test/resources/graft/lz4/dict.bin -d -f /tmp/lz4_encoder_dict.lz4 /tmp/lz4_encoder_dict.out")
    println("  cmp /tmp/lz4_encoder_dict.out src/test/resources/graft/lz4/dict_b4.bin")
  }
}
