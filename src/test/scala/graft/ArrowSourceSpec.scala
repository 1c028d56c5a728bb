package graft

import graft.sources.ArrowIpc
import graft.sources.ArrowIpc._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 face: `spark.read.format("arrowipc")`. Pruning is proven to
  * skip pruned columns' DECOMPRESSION by poisoning a pruned column's
  * compressed buffer: the full read must fail, the pruned read must
  * succeed around it. */
class ArrowSourceSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** `poison` is LAST so its data buffer is the final body buffer —
    * the poisoning test aims there. */
  private def laneFile(n: Int, codec: Int): Array[Byte] = {
    val schema = ASchema(Seq(
      AField("keep", nullable = false, AInt(64, signed = true)),
      AField("emb", nullable = true, AFixedSizeList(2), Seq(AField("item", nullable = false, AFloat(2)))),
      AField("poison", nullable = true, AUtf8)))
    val cols: Array[Array[Any]] = Array(
      Array.tabulate[Any](n)(i => java.lang.Long.valueOf(i * 3L)),
      Array.tabulate[Any](n)(i => Vector[Any](java.lang.Double.valueOf(i * 0.5), java.lang.Double.valueOf(i * 0.25))),
      Array.tabulate[Any](n)(i => s"verbose-string-payload-$i-" + ("pad" * 40)))
    ArrowIpc.encodeFile(schema, Seq((cols, n)), codec)
  }

  test("load + full schema read over two files; values and count match") {
    val dir = java.nio.file.Files.createTempDirectory("arrowsrc")
    try {
      val bytes = laneFile(500, codec = -1)
      java.nio.file.Files.write(dir.resolve("a.arrow"), bytes)
      java.nio.file.Files.write(dir.resolve("b.arrow"), bytes)
      val df = spark.read.format("arrowipc").load(dir.toString) // dir expansion
      assert(df.schema.fieldNames.toSeq == Seq("keep", "emb", "poison"))
      assert(df.count() == 1000)
      val row = df.selectExpr("sum(keep)", "sum(length(poison))", "sum(emb[0] + emb[1])").collect().head
      assert(row.getLong(0) == 2L * (0 until 500).map(_ * 3L).sum)
      assert(row.getLong(1) == 2L * (0 until 500).map(i => s"verbose-string-payload-$i-".length + 120).sum)
      assert(row.getDouble(2) == 2.0 * (0 until 500).map(i => i * 0.75).sum)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("column pruning reaches the scan (readSchema) and the plan") {
    val dir = java.nio.file.Files.createTempDirectory("arrowprune")
    try {
      java.nio.file.Files.write(dir.resolve("a.arrow"), laneFile(200, codec = -1))
      val df = spark.read.format("arrowipc").load(dir.resolve("a.arrow").toString).select("keep")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("columns [keep]"), s"scan description not pruned:\n$plan")
      assert(df.agg(org.apache.spark.sql.functions.sum("keep")).collect().head.getLong(0) ==
        (0 until 200).map(_ * 3L).sum)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("PROOF pruning skips decompression: poisoned pruned column reads fine, full read fails") {
    val bytes = laneFile(800, codec = 1) // zstd, checksummed frames
    // locate the footer; the last body buffer (poison's data, by far
    // the largest) ends just before the EOS marker that precedes it
    val fLen = {
      val t = bytes.length - 10
      (bytes(t) & 0xff) | ((bytes(t + 1) & 0xff) << 8) | ((bytes(t + 2) & 0xff) << 16) | ((bytes(t + 3) & 0xff) << 24)
    }
    val footerStart = bytes.length - 10 - fLen
    val eosStart = footerStart - 8
    val poisoned = bytes.clone()
    for (p <- eosStart - 76 until eosStart - 12) poisoned(p) = (poisoned(p) ^ 0x5a).toByte
    // sanity: whole-file decode must fail on the poisoned column
    intercept[ArrowIpc.ArrowError] { ArrowIpc.readFileBytes(poisoned) }
    val dir = java.nio.file.Files.createTempDirectory("arrowpoison")
    try {
      val p = dir.resolve("p.arrow")
      java.nio.file.Files.write(p, poisoned)
      // a read that NEEDS the poisoned column fails through the DSv2
      // face too (count() alone prunes every column and would — by
      // design — succeed)
      val full = spark.read.format("arrowipc").load(p.toString)
      val e = intercept[Exception] { full.selectExpr("sum(length(poison))").collect() }
      def mentionsArrow(t: Throwable): Boolean =
        t != null && (t.toString.contains("arrow") || t.toString.contains("Arrow") || mentionsArrow(t.getCause))
      assert(mentionsArrow(e), s"unexpected failure: $e")
      // pruned read never touches the poisoned buffers
      val pruned = spark.read.format("arrowipc").load(p.toString).select("keep", "emb")
      val row = pruned.selectExpr("sum(keep)", "sum(emb[1])").collect().head
      assert(row.getLong(0) == (0 until 800).map(_ * 3L).sum)
      assert(row.getDouble(1) == (0 until 800).map(_ * 0.25).sum)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("dictionary-encoded column through the DSv2 face") {
    val dir = java.nio.file.Files.createTempDirectory("arrowdict")
    try {
      val p = dir.resolve("d.arrow")
      val in = getClass.getResourceAsStream("/graft/arrow/dict.arrow")
      java.nio.file.Files.write(p, in.readAllBytes()); in.close()
      val df = spark.read.format("arrowipc").load(p.toString)
      assert(df.count() == 50)
      val words = df.select("w").collect().map(_.getString(0))
      val expect = Seq("alpha", "beta", "gamma", "δelta", "epsilon")
      for (i <- 0 until 50)
        if (i % 7 == 6) assert(words(i) == null) else assert(words(i) == expect(i % 5))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("one InputPartition per record batch") {
    val dir = java.nio.file.Files.createTempDirectory("arrowparts")
    try {
      val p = dir.resolve("m.arrow")
      // our writer: 5 batches of 100
      val schema = ASchema(Seq(AField("x", nullable = false, AInt(64, signed = true))))
      val batches = (0 until 5).map { b =>
        (Array(Array.tabulate[Any](100)(i => java.lang.Long.valueOf(b * 100L + i))), 100)
      }
      java.nio.file.Files.write(p, ArrowIpc.encodeFile(schema, batches))
      val df = spark.read.format("arrowipc").load(p.toString)
      assert(df.rdd.getNumPartitions == 5)
      assert(df.count() == 500)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }
}
