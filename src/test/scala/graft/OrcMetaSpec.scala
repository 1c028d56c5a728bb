package graft

import graft.sources.OrcMeta
import graft.sources.OrcMeta._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** ORC tail-parser conformance, LIVE against orc-core 2.2.2 (the
  * reference implementation, on the Spark classpath): stripe layout,
  * row counts, compression kind, type tree and integer column
  * statistics must match OrcFile.createReader on Spark-written files
  * across every codec this build can write. */
class OrcMetaSpec extends AnyFunSuite {

  private def partFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(c => c.isFile && c.getName.endsWith(".orc")).map(_.getPath).sorted.toSeq
    else Seq(path)
  }

  private def compareFile(p: String): Unit = {
    val ours = OrcMeta.readTail(p)
    val conf = new org.apache.hadoop.conf.Configuration()
    val ref = org.apache.orc.OrcFile.createReader(
      new org.apache.hadoop.fs.Path(p), org.apache.orc.OrcFile.readerOptions(conf))
    try {
      assert(CompressionNames(ours.postScript.compression) == ref.getCompressionKind.name(), s"$p codec")
      assert(ours.footer.numberOfRows == ref.getNumberOfRows, s"$p rows")
      assert(ours.footer.contentLength == ref.getContentLength, s"$p content length")
      val refStripes = ref.getStripes.asScala.toSeq
      assert(ours.footer.stripes.length == refStripes.length, s"$p stripe count")
      ours.footer.stripes.zip(refStripes).zipWithIndex.foreach { case ((o, r), i) =>
        assert(o.offset == r.getOffset, s"$p stripe $i offset")
        assert(o.indexLength == r.getIndexLength, s"$p stripe $i index")
        assert(o.dataLength == r.getDataLength, s"$p stripe $i data")
        assert(o.footerLength == r.getFooterLength, s"$p stripe $i footer")
        assert(o.numberOfRows == r.getNumberOfRows, s"$p stripe $i rows")
      }
      // type tree: flatten the reference TypeDescription pre-order and
      // compare kinds + struct field names
      def flat(t: org.apache.orc.TypeDescription): Seq[org.apache.orc.TypeDescription] =
        t +: Option(t.getChildren).map(_.asScala.toSeq).getOrElse(Nil).flatMap(flat)
      val refTypes = flat(ref.getSchema)
      assert(ours.footer.types.length == refTypes.length, s"$p type count")
      ours.footer.types.zip(refTypes).foreach { case (o, r) =>
        assert(KindNames(o.kind) == r.getCategory.name()
          .replace("TIMESTAMP_INSTANT", "TIMESTAMP_INSTANT"), s"$p type kind ${o.kind} vs ${r.getCategory}")
      }
      // integer column statistics
      val refStats = ref.getStatistics
      assert(ours.footer.statistics.length == refStats.length, s"$p stats count")
      ours.footer.statistics.zip(refStats).zipWithIndex.foreach { case ((o, r), i) =>
        assert(o.numberOfValues == r.getNumberOfValues, s"$p col $i numberOfValues")
        assert(o.hasNull == r.hasNull, s"$p col $i hasNull")
        r match {
          case is: org.apache.orc.IntegerColumnStatistics if r.getNumberOfValues > 0 =>
            val oi = o.intStats.getOrElse(fail2(s"$p col $i: ref has int stats, ours missing"))
            assert(oi.min.contains(is.getMinimum), s"$p col $i min")
            assert(oi.max.contains(is.getMaximum), s"$p col $i max")
            if (is.isSumDefined) assert(oi.sum.contains(is.getSum), s"$p col $i sum")
          case _ => ()
        }
      }
    } finally ref.close()
  }

  private def fail2(msg: String): Nothing = throw new AssertionError(msg)

  test("Spark-written ORC across all writable codecs matches orc-core field-for-field") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orcmeta").toFile
    try {
      val df = (0 until 50000)
        .map(i => (i.toLong, i * 37 % 1000, s"s${i % 97}", if (i % 11 == 0) None else Some(i * 3L)))
        .toDF("id", "bucket", "tag", "opt")
      for (codec <- Seq("none", "zlib", "snappy", "lz4", "zstd")) {
        val out = new java.io.File(dir, codec).getPath
        df.coalesce(1).write.option("compression", codec).orc(out)
        val files = partFiles(out)
        assert(files.nonEmpty, s"$codec: no files written")
        files.foreach(compareFile)
      }
      // multi-stripe: small stripe size forces several stripes
      val big = new java.io.File(dir, "multistripe").getPath
      df.coalesce(1).write
        .option("compression", "zstd")
        .option("orc.stripe.size", (256 * 1024).toString)
        .orc(big)
      val multi = partFiles(big)
      multi.foreach(compareFile)
      assert(OrcMeta.readTail(multi.head).footer.stripes.length > 1, "expected several stripes")
    } finally {
      def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
      rm(dir)
    }
  }

  test("stripes() catalog view: one row per stripe, rows sum to the file") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orcmeta_view").toFile
    try {
      val out = new java.io.File(dir, "t").getPath
      (0 until 20000).map(i => (i.toLong, s"x$i")).toDF("id", "s")
        .coalesce(1).write.option("compression", "zstd")
        .option("orc.stripe.size", (128 * 1024).toString).orc(out)
      val files = partFiles(out)
      val df = OrcMeta.stripes(spark, files)
      val rows = df.collect()
      assert(rows.nonEmpty)
      assert(rows.map(r => r.getLong(r.fieldIndex("rows"))).sum ==
        rows.head.getLong(rows.head.fieldIndex("file_rows")) * files.length ||
        rows.map(r => r.getLong(r.fieldIndex("rows"))).sum == 20000L)
      assert(rows.forall(_.getString(7) == "ZSTD"))
    } finally {
      def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
      rm(dir)
    }
  }

  test("hostility: corrupt postscripts and tail byte-flips raise OrcMetaError") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orcmeta_hostile").toFile
    try {
      val out = new java.io.File(dir, "t").getPath
      (0 until 5000).map(i => (i.toLong, s"x$i")).toDF("id", "s")
        .coalesce(1).write.option("compression", "zlib").orc(out)
      val p = partFiles(out).head
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
      def withBytes[T](b: Array[Byte])(f: java.io.RandomAccessFile => T): T = {
        val tmp = java.io.File.createTempFile("orc_hostile", ".orc")
        try {
          java.nio.file.Files.write(tmp.toPath, b)
          val raf = new java.io.RandomAccessFile(tmp, "r")
          try f(raf)
          finally raf.close()
        } finally tmp.delete()
      }
      // truncated to a stub
      intercept[OrcMetaError] { withBytes(bytes.take(8))(OrcMeta.readTail) }
      // absurd postscript length
      val badPs = bytes.clone(); badPs(badPs.length - 1) = 0xff.toByte
      intercept[OrcMetaError] { withBytes(badPs)(OrcMeta.readTail) }
      // byte-flip fuzz over the last 2 KiB (the region we parse)
      val rnd = new scala.util.Random(186)
      val window = math.min(2048, bytes.length)
      for (_ <- 0 until 400) {
        val mutated = bytes.clone()
        val at = bytes.length - 1 - rnd.nextInt(window)
        mutated(at) = (mutated(at) ^ (1 + rnd.nextInt(255))).toByte
        try { withBytes(mutated)(OrcMeta.readTail); () }
        catch { case _: OrcMetaError => () }
      }
    } finally {
      def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
      rm(dir)
    }
  }
}
