package graft

import graft.sources.SeqFile
import graft.sources.SeqFile._
import org.scalatest.funsuite.AnyFunSuite

/** SequenceFile conformance, LIVE against hadoop-client 3.4.2 (the
  * reference implementation, on the Spark classpath) in both
  * directions: hadoop's Writer (none / record-DefaultCodec /
  * record-Gzip) through our reader, our writer through hadoop's
  * Reader, plus the ranged-split ownership rule and hostility. */
class SeqFileSpec extends AnyFunSuite {

  import org.apache.hadoop.conf.Configuration
  import org.apache.hadoop.fs.Path
  import org.apache.hadoop.io.{BytesWritable, LongWritable, SequenceFile => HSeq, Text}

  private val N = 300
  private def tagOf(i: Int): String = s"v$i-é中${"x" * (i % 17)}"

  private def hadoopWrite(codec: Option[String]): Array[Byte] = {
    val tmp = java.io.File.createTempFile("seq_spec", ".seq")
    try {
      val conf = new Configuration()
      val compressOpt = codec match {
        case None => HSeq.Writer.compression(HSeq.CompressionType.NONE)
        case Some(DefaultCodecClass) =>
          HSeq.Writer.compression(HSeq.CompressionType.RECORD, new org.apache.hadoop.io.compress.DefaultCodec)
        case Some(GzipCodecClass) =>
          HSeq.Writer.compression(HSeq.CompressionType.RECORD, new org.apache.hadoop.io.compress.GzipCodec)
        case Some(c) => fail2(s"unexpected codec $c")
      }
      val w = HSeq.createWriter(conf,
        HSeq.Writer.file(new Path(tmp.getAbsolutePath)),
        HSeq.Writer.keyClass(classOf[LongWritable]),
        HSeq.Writer.valueClass(classOf[Text]),
        compressOpt)
      try {
        for (i <- 0 until N) {
          w.append(new LongWritable(i * 37L), new Text(tagOf(i)))
          if (i % 25 == 24) w.sync() // force several inline syncs
        }
      } finally w.close()
      java.nio.file.Files.readAllBytes(tmp.toPath)
    } finally tmp.delete()
  }

  private def fail2(msg: String): Nothing = throw new AssertionError(msg)

  private def ourRead(bytes: Array[Byte]): Vector[(Any, Any)] = {
    val tmp = java.io.File.createTempFile("seq_read", ".seq")
    try {
      java.nio.file.Files.write(tmp.toPath, bytes)
      val raf = new java.io.RandomAccessFile(tmp, "r")
      try {
        val h = SeqFile.readHeader(raf)
        SeqFile.recordsInRange(raf, h, 0L, raf.length()).map { case (k, v) =>
          (SeqFile.decodeWritable(h.keyClass, k), SeqFile.decodeWritable(h.valClass, v))
        }.toVector
      } finally raf.close()
    } finally tmp.delete()
  }

  test("hadoop Writer -> our reader: none / DefaultCodec / Gzip record compression") {
    for (codec <- Seq(None, Some(DefaultCodecClass), Some(GzipCodecClass))) {
      val rows = ourRead(hadoopWrite(codec))
      assert(rows.length == N, s"codec=$codec")
      for (i <- 0 until N) {
        assert(rows(i)._1 == i * 37L, s"codec=$codec key $i")
        assert(rows(i)._2 == tagOf(i), s"codec=$codec value $i")
      }
    }
  }

  test("our writer -> hadoop Reader: Long->Text and Bytes payloads, both codecs") {
    for (codec <- Seq(None, Some(DefaultCodecClass), Some(GzipCodecClass))) {
      val pairs = (0 until N).map(i => (i * 37L: Any, tagOf(i): Any))
      val bytes = SeqFile.encodeFile(LongClass, TextClass, pairs, codec, syncEvery = 512)
      val tmp = java.io.File.createTempFile("seq_h", ".seq")
      try {
        java.nio.file.Files.write(tmp.toPath, bytes)
        val conf = new Configuration()
        val r = new HSeq.Reader(conf, HSeq.Reader.file(new Path(tmp.getAbsolutePath)))
        try {
          val k = new LongWritable()
          val v = new Text()
          var i = 0
          while (r.next(k, v)) {
            assert(k.get == i * 37L, s"codec=$codec key $i")
            assert(v.toString == tagOf(i), s"codec=$codec value $i")
            i += 1
          }
          assert(i == N, s"codec=$codec rows")
        } finally r.close()
      } finally tmp.delete()
    }
    // BytesWritable payload through hadoop
    val bpairs = (0 until 40).map(i => (i.toLong: Any, Array.tabulate(i % 9)(j => (i + j).toByte): Any))
    val bbytes = SeqFile.encodeFile(LongClass, BytesClass, bpairs, None)
    val tmp = java.io.File.createTempFile("seq_b", ".seq")
    try {
      java.nio.file.Files.write(tmp.toPath, bbytes)
      val r = new HSeq.Reader(new Configuration(), HSeq.Reader.file(new Path(tmp.getAbsolutePath)))
      try {
        val k = new LongWritable()
        val v = new BytesWritable()
        var i = 0
        while (r.next(k, v)) {
          assert(java.util.Arrays.equals(java.util.Arrays.copyOf(v.getBytes, v.getLength),
            Array.tabulate(i % 9)(j => (i + j).toByte)), s"bytes $i")
          i += 1
        }
        assert(i == 40)
      } finally r.close()
    } finally tmp.delete()
  }

  test("ranged splits: every split size yields exactly the file's records") {
    val spark = TestSpark.spark
    val bytes = hadoopWrite(Some(DefaultCodecClass))
    val dir = java.nio.file.Files.createTempDirectory("seq_scan").toFile
    try {
      val p = new java.io.File(dir, "r.seq")
      java.nio.file.Files.write(p.toPath, bytes)
      val whole = SeqFile.scan(spark, Seq(p.getPath))
      assert(whole.schema.fieldNames.toSeq == Seq("key", "value"))
      assert(whole.collect().map(_.getLong(0)).sorted.toSeq == (0 until N).map(_ * 37L))
      for (split <- Seq(512L, 1000L, 4096L)) {
        val got = SeqFile.scan(spark, Seq(p.getPath), splitBytes = split)
          .collect().map(_.getLong(0)).sorted.toSeq
        assert(got == (0 until N).map(_ * 37L), s"split=$split lost or duplicated records")
      }
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("hostility: bad magic / block-compressed / vint bombs / byte-flip fuzz") {
    intercept[SeqFileError] { SeqFile.parseHeader("NOTSEQ".getBytes) }
    intercept[SeqFileError] { SeqFile.parseHeader(Array[Byte]('S', 'E', 'Q', 4)) } // old version
    // block-compressed flag refuses by name
    val pairs = (0 until 50).map(i => (i.toLong: Any, s"x$i": Any))
    val good = SeqFile.encodeFile(LongClass, TextClass, pairs, Some(DefaultCodecClass), syncEvery = 256)
    val blocky = good.clone()
    // flags sit right after the two class-name strings; find them by
    // re-parsing the good header, then flip blockCompressed on
    val h = SeqFile.parseHeader(good)
    var q = 4
    for (_ <- 0 until 2) { // skip two vint-length strings
      val first = blocky(q)
      val len = if (first >= -112) first.toInt
        else { val n = if (first < -120) -(first + 124) else -(first + 112)
          var v = 0L; for (i <- 0 until n) v = (v << 8) | (blocky(q + 1 + i) & 0xffL)
          q += n; v.toInt }
      q += 1 + len
    }
    blocky(q + 1) = 1 // blockCompressed = true
    intercept[SeqFileError] { SeqFile.parseHeader(blocky) }
    // byte-flip fuzz: decode is equal or SeqFileError
    val rnd = new scala.util.Random(187)
    for (_ <- 0 until 300) {
      val mutated = good.clone()
      val at = rnd.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 + rnd.nextInt(255))).toByte
      try { ourRead(mutated); () }
      catch { case _: SeqFileError => () }
    }
    assert(h.sync.length == 16)
  }
}
