package graft

import graft.sources.ParquetMeta
import graft.sources.ParquetMeta._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Footer-parser conformance, LIVE against parquet-hadoop 1.16 (the
  * reference implementation, on the Spark classpath): every surfaced
  * field — row counts, byte sizes, codecs, value counts, offsets,
  * int64/int32 stats, created_by — must match ParquetFileReader's
  * footer on the driver-written testdata files AND on Spark-written
  * files across every codec this Spark build can write. */
class ParquetMetaSpec extends AnyFunSuite {

  private def hadoopFooter(p: String) = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p), new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter
    finally r.close()
  }

  private def partFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(c => c.isFile && c.getName.endsWith(".parquet")).map(_.getPath).sorted.toSeq
    else Seq(path)
  }

  private def compareFile(p: String): Unit = {
    val ours = ParquetMeta.readFooter(p)
    val ref = hadoopFooter(p)
    assert(ours.createdBy == Option(ref.getFileMetaData.getCreatedBy), s"$p created_by")
    val blocks = ref.getBlocks.asScala.toSeq
    assert(ours.rowGroups.length == blocks.length, s"$p row group count")
    assert(ours.numRows == blocks.map(_.getRowCount).sum, s"$p num_rows")
    ours.rowGroups.zip(blocks).zipWithIndex.foreach { case ((og, rb), gi) =>
      assert(og.numRows == rb.getRowCount, s"$p rg$gi rows")
      assert(og.totalByteSize == rb.getTotalByteSize, s"$p rg$gi bytes")
      val refCols = rb.getColumns.asScala.toSeq
      assert(og.columns.length == refCols.length, s"$p rg$gi column count")
      og.columns.zip(refCols).foreach { case (oc, rc) =>
        val cn = rc.getPath.toDotString
        assert(oc.pathInSchema.mkString(".") == cn, s"$p rg$gi column path")
        assert(CodecNames(oc.codec) == rc.getCodec.name(), s"$p $cn codec")
        assert(oc.numValues == rc.getValueCount, s"$p $cn num_values")
        assert(oc.totalCompressedSize == rc.getTotalSize, s"$p $cn compressed")
        assert(oc.totalUncompressedSize == rc.getTotalUncompressedSize, s"$p $cn uncompressed")
        val refEnc = rc.getEncodings.asScala.map(_.name()).toSet
        assert(oc.encodings.map(e => EncodingNames.getOrElse(e, e.toString)).toSet == refEnc, s"$p $cn encodings")
        assert(oc.dictionaryPageOffset.isDefined == rc.hasDictionaryPage, s"$p $cn dictionary")
        val refStats = rc.getStatistics
        if (refStats != null && !refStats.isEmpty) {
          val os = oc.stats.getOrElse(fail2(s"$p $cn: ref has stats, ours missing"))
          if (refStats.isNumNullsSet)
            assert(os.nullCount.contains(refStats.getNumNulls), s"$p $cn null_count")
          refStats match {
            case ls: org.apache.parquet.column.statistics.LongStatistics if refStats.hasNonNullValue =>
              assert(os.min.flatMap(decodeStatLong(oc.physicalType, _)).contains(ls.getMin), s"$p $cn min")
              assert(os.max.flatMap(decodeStatLong(oc.physicalType, _)).contains(ls.getMax), s"$p $cn max")
            case is: org.apache.parquet.column.statistics.IntStatistics if refStats.hasNonNullValue =>
              assert(os.min.flatMap(decodeStatLong(oc.physicalType, _)).contains(is.getMin.toLong), s"$p $cn min")
              assert(os.max.flatMap(decodeStatLong(oc.physicalType, _)).contains(is.getMax.toLong), s"$p $cn max")
            case _ => ()
          }
        }
      }
    }
  }

  private def fail2(msg: String): Nothing = throw new AssertionError(msg)

  test("testdata footers match parquet-hadoop field-for-field (events + lineitem + documents)") {
    for (table <- Seq("events", "lineitem", "documents");
         p <- partFiles(s"/root/testdata/sf0.001/$table.parquet"))
      compareFile(p)
  }

  test("Spark-written files across all writable codecs match parquet-hadoop") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pqmeta").toFile
    try {
      val df = (0 until 5000)
        .map(i => (i.toLong, i * 37 % 1000, s"s${i % 97}", if (i % 11 == 0) None else Some(i * 0.5)))
        .toDF("id", "bucket", "tag", "score")
      for (codec <- Seq("uncompressed", "snappy", "gzip", "zstd", "lz4")) {
        val out = new java.io.File(dir, codec).getPath
        df.coalesce(1).write.option("compression", codec).parquet(out)
        partFiles(out).foreach(compareFile)
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("chunks() catalog view: one row per chunk, stats decoded, driver reads tails only") {
    val spark = TestSpark.spark
    val files = partFiles("/root/testdata/sf0.001/events.parquet")
    val df = ParquetMeta.chunks(spark, files)
    val eventId = df.where(org.apache.spark.sql.functions.col("column") === "event_id").collect()
    assert(eventId.nonEmpty)
    val totalRows = eventId.map(r => r.getLong(r.fieldIndex("rg_rows"))).sum
    val refRows = files.map(p => hadoopFooter(p).getBlocks.asScala.map(_.getRowCount).sum).sum
    assert(totalRows == refRows)
    eventId.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("min_int64")) && !r.isNullAt(r.fieldIndex("max_int64")))
      assert(r.getLong(r.fieldIndex("min_int64")) <= r.getLong(r.fieldIndex("max_int64")))
      assert(r.getString(r.fieldIndex("physical_type")) == "INT64")
    }
  }

  test("hostility: corrupt tails and footer byte-flips raise ParquetMetaError") {
    val p = partFiles("/root/testdata/sf0.001/events.parquet").head
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    def withBytes[T](b: Array[Byte])(f: java.io.RandomAccessFile => T): T = {
      val tmp = java.io.File.createTempFile("pq_hostile", ".parquet")
      try {
        java.nio.file.Files.write(tmp.toPath, b)
        val raf = new java.io.RandomAccessFile(tmp, "r")
        try f(raf)
        finally raf.close()
      } finally tmp.delete()
    }
    // bad tail magic
    val badMagic = bytes.clone(); badMagic(badMagic.length - 1) = 'X'
    intercept[ParquetMetaError] { withBytes(badMagic)(ParquetMeta.readFooter) }
    // absurd footer length
    val badLen = bytes.clone()
    badLen(badLen.length - 8) = 0xff.toByte; badLen(badLen.length - 7) = 0xff.toByte
    badLen(badLen.length - 6) = 0xff.toByte; badLen(badLen.length - 5) = 0x7f.toByte
    intercept[ParquetMetaError] { withBytes(badLen)(ParquetMeta.readFooter) }
    // byte-flip fuzz over the footer region only (the part we parse)
    val fLen = (bytes(bytes.length - 8) & 0xff) | ((bytes(bytes.length - 7) & 0xff) << 8) |
      ((bytes(bytes.length - 6) & 0xff) << 16) | ((bytes(bytes.length - 5) & 0xff) << 24)
    val fStart = bytes.length - 8 - fLen
    val rnd = new scala.util.Random(185)
    for (_ <- 0 until 400) {
      val mutated = bytes.clone()
      val at = fStart + rnd.nextInt(fLen)
      mutated(at) = (mutated(at) ^ (1 + rnd.nextInt(255))).toByte
      try { withBytes(mutated)(ParquetMeta.readFooter); () }
      catch { case _: ParquetMetaError => () }
    }
  }
}
