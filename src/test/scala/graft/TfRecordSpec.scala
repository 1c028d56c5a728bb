package graft

import graft.sources.TfRecord
import graft.sources.TfRecord._
import org.scalatest.funsuite.AnyFunSuite

/** TFRecord + tf.train.Example conformance. The protobuf WIRE layer
  * is cross-checked LIVE against the reference protobuf runtime on
  * the Spark classpath (orc's shaded CodedOutput/InputStream): our
  * parser over reference-emitted Examples (UNPACKED lists + unknown
  * fields planted at every level), the reference reader re-walking
  * our writer's bytes. Framing is the published TFRecord layout over
  * the JDK's CRC32C; no TensorFlow ships in-container (probe:
  * NOTES_r17), so framing hostility demands every corrupted byte be
  * caught by a CRC. */
class TfRecordSpec extends AnyFunSuite {

  import org.apache.orc.protobuf.{CodedInputStream, CodedOutputStream}

  private def msg(build: CodedOutputStream => Unit): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val cos = CodedOutputStream.newInstance(bos)
    build(cos)
    cos.flush()
    bos.toByteArray
  }

  /** Reference-emit one Example: UNPACKED numeric lists (the other
    * legal wire form from our packed writer) + unknown fields. */
  private def refExample(id: Long, tag: String, vals: Seq[Float], planted: Boolean): Array[Byte] = {
    val i64 = msg { c => c.writeInt64(1, id); if (planted) c.writeInt64(99, 7L) }
    val fl = msg { c => vals.foreach(v => c.writeFloat(1, v)); if (planted) c.writeFixed64(8, 0x1234L) }
    val bl = msg(c => c.writeByteArray(1, tag.getBytes("UTF-8")))
    val fId = msg(c => c.writeByteArray(3, i64))
    val fTag = msg(c => c.writeByteArray(1, bl))
    val fVals = msg { c => c.writeByteArray(2, fl); if (planted) c.writeInt32(50, 5) }
    def entry(k: String, f: Array[Byte]) = msg { c => c.writeString(1, k); c.writeByteArray(2, f) }
    val feats = msg { c =>
      c.writeByteArray(1, entry("id", fId))
      c.writeByteArray(1, entry("tag", fTag))
      c.writeByteArray(1, entry("vals", fVals))
      if (planted) c.writeString(77, "ignore me")
    }
    msg { c => c.writeByteArray(1, feats); if (planted) c.writeInt64(12, -1L) }
  }

  test("our parser over reference-runtime Examples (unpacked lists, unknown fields, negative/huge ints)") {
    for ((id, planted) <- Seq((5L, false), (-3L, true), (1L << 45, true), (Long.MinValue, false))) {
      val rec = refExample(id, s"t$id", Seq(1.5f, -2.25f), planted)
      val ex = TfRecord.parseExample(rec)
      assert(ex.keySet == Set("id", "tag", "vals"))
      assert(ex("id") == Int64List(Seq(id)))
      assert(new String(ex("tag").asInstanceOf[BytesList].values.head, "UTF-8") == s"t$id")
      assert(ex("vals") == FloatList(Seq(1.5f, -2.25f)))
    }
  }

  test("reference runtime re-walks our writer's bytes (packed lists)") {
    val rec = TfRecord.encodeExample(Seq(
      "id" -> Int64List(Seq(42L, -7L, 1L << 40)),
      "name" -> BytesList(Seq("héllo".getBytes("UTF-8"), Array.emptyByteArray)),
      "emb" -> FloatList(Seq(0.5f, -1.25f, 3e8f))))
    // walk: Example(1: Features(1: repeated MapEntry(1: key, 2: Feature)))
    val got = scala.collection.mutable.Map.empty[String, Any]
    val ex = CodedInputStream.newInstance(rec)
    assert(ex.readTag() == ((1 << 3) | 2))
    val exLimit = ex.pushLimit(ex.readRawVarint32())
    while (!ex.isAtEnd) {
      assert(ex.readTag() == ((1 << 3) | 2)) // map entry
      val eLimit = ex.pushLimit(ex.readRawVarint32())
      assert(ex.readTag() == ((1 << 3) | 2))
      val key = ex.readStringRequireUtf8()
      assert(ex.readTag() == ((2 << 3) | 2)) // Feature
      val fLimit = ex.pushLimit(ex.readRawVarint32())
      val ftag = ex.readTag()
      (ftag >> 3) match {
        case 1 => // BytesList
          val bLimit = ex.pushLimit(ex.readRawVarint32())
          val vals = scala.collection.mutable.ArrayBuffer.empty[String]
          while (!ex.isAtEnd) { assert(ex.readTag() == ((1 << 3) | 2)); vals += new String(ex.readByteArray(), "UTF-8") }
          ex.popLimit(bLimit)
          got(key) = vals.toSeq
        case 2 => // FloatList, packed
          val lLimit = ex.pushLimit(ex.readRawVarint32())
          assert(ex.readTag() == ((1 << 3) | 2))
          val pLimit = ex.pushLimit(ex.readRawVarint32())
          val vals = scala.collection.mutable.ArrayBuffer.empty[Float]
          while (!ex.isAtEnd) vals += ex.readFloat()
          ex.popLimit(pLimit); ex.popLimit(lLimit)
          got(key) = vals.toSeq
        case 3 => // Int64List, packed
          val lLimit = ex.pushLimit(ex.readRawVarint32())
          assert(ex.readTag() == ((1 << 3) | 2))
          val pLimit = ex.pushLimit(ex.readRawVarint32())
          val vals = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (!ex.isAtEnd) vals += ex.readInt64()
          ex.popLimit(pLimit); ex.popLimit(lLimit)
          got(key) = vals.toSeq
      }
      ex.popLimit(fLimit)
      ex.popLimit(eLimit)
    }
    ex.popLimit(exLimit)
    assert(got("id") == Seq(42L, -7L, 1L << 40))
    assert(got("name") == Seq("héllo", ""))
    assert(got("emb") == Seq(0.5f, -1.25f, 3e8f))
    // and our own parser agrees
    val back = TfRecord.parseExample(rec)
    assert(back("id") == Int64List(Seq(42L, -7L, 1L << 40)))
  }

  test("kind-unset Feature (zero-length value, the protobuf-map shape) parses as an empty BytesList") {
    // python proto map autovivification serializes a touched-but-
    // unassigned Feature as key + a zero-length value field
    val entry = msg { c => c.writeString(1, "ghost"); c.writeByteArray(2, Array.emptyByteArray) }
    val feats = msg(c => c.writeByteArray(1, entry))
    val rec = msg(c => c.writeByteArray(1, feats))
    val ex = TfRecord.parseExample(rec)
    assert(ex == Map("ghost" -> BytesList(Nil)))
    // but a Feature whose ONLY content is an unknown future kind
    // carries real data — reading it as empty would be silent loss
    val unknownKind = msg(c => c.writeByteArray(4, "future-data".getBytes("UTF-8")))
    val entry2 = msg { c => c.writeString(1, "mystery"); c.writeByteArray(2, unknownKind) }
    val feats2 = msg(c => c.writeByteArray(1, entry2))
    val rec2 = msg(c => c.writeByteArray(1, feats2))
    intercept[TfRecord.TfRecordError] { TfRecord.parseExample(rec2) }
  }

  test("framing: round-trip, empty records, gz shard") {
    val recs = Seq(
      "first".getBytes("UTF-8"),
      Array.emptyByteArray,
      Array.tabulate(5000)(i => (i * 31).toByte))
    val shard = TfRecord.frame(recs)
    val back = TfRecord.records(shard).toSeq
    assert(back.length == 3)
    recs.zip(back).foreach { case (a, b) => assert(java.util.Arrays.equals(a, b)) }
    val bos = new java.io.ByteArrayOutputStream()
    val go = new java.util.zip.GZIPOutputStream(bos)
    go.write(shard); go.close()
    val back2 = TfRecord.records(TfRecord.gunzip(bos.toByteArray)).toSeq
    assert(back2.length == 3 && java.util.Arrays.equals(back2(2), recs(2)))
  }

  test("framing hostility: EVERY single-byte flip is caught (CRC or structural), truncation too") {
    val shard = TfRecord.frame(Seq(
      TfRecord.encodeExample(Seq("id" -> Int64List(Seq(9L)))),
      TfRecord.encodeExample(Seq("t" -> BytesList(Seq("abc".getBytes))))))
    for (pos <- shard.indices; bit <- Seq(1, 0x80)) {
      val b = shard.clone()
      b(pos) = (b(pos) ^ bit).toByte
      val r = try { TfRecord.records(b).foreach(_ => ()); false }
      catch {
        case _: TfRecordError => true
        case e: Throwable => fail(s"flip at $pos escaped as ${e.getClass.getName}: ${e.getMessage}")
      }
      assert(r, s"single-byte flip at $pos decoded silently — a CRC must catch it")
    }
    // truncation: every cut NOT on a record boundary must raise; cuts
    // exactly between records are valid prefixes by design (the
    // format has no trailer or record count — shard-level integrity
    // is the ecosystem's file-count convention)
    val boundaries = {
      var p = 0
      val b = scala.collection.mutable.Set(0)
      TfRecord.records(shard).foreach { r => p += 12 + r.length + 4; b += p }
      b.toSet
    }
    for (cut <- 1 until shard.length if !boundaries.contains(cut)) {
      try { TfRecord.records(java.util.Arrays.copyOfRange(shard, 0, cut)).foreach(_ => ()); fail(s"cut $cut silent") }
      catch {
        case _: TfRecordError => ()
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case e: Throwable => fail(s"cut at $cut escaped as ${e.getClass.getName}")
      }
    }
  }

  test("example hostility: mutated payloads (CRC re-stamped) parse-or-TfRecordError, never raw errors") {
    val base = TfRecord.encodeExample(Seq(
      "id" -> Int64List(Seq(1L, 2L, 3L)),
      "s" -> BytesList(Seq("xyz".getBytes)),
      "f" -> FloatList(Seq(1f, 2f))))
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 800) {
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      try { TfRecord.parseExample(b); () }
      catch {
        case _: TfRecordError => ()
        case e: Throwable => fail(s"payload mutation escaped as ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("Spark face: one task per shard file, gz transparent") {
    val dir = java.nio.file.Files.createTempDirectory("tfrec")
    try {
      val recs = (0 until 100).map(i => TfRecord.encodeExample(Seq("id" -> Int64List(Seq(i.toLong)))))
      val shard = TfRecord.frame(recs)
      java.nio.file.Files.write(dir.resolve("a.tfrecord"), shard)
      val bos = new java.io.ByteArrayOutputStream()
      val go = new java.util.zip.GZIPOutputStream(bos); go.write(shard); go.close()
      java.nio.file.Files.write(dir.resolve("b.tfrecord.gz"), bos.toByteArray)
      val df = TfRecord.examples(TestSpark.spark,
        Seq(dir.resolve("a.tfrecord").toString, dir.resolve("b.tfrecord.gz").toString))
      assert(df.count() == 200)
      val ids = df.collect().map { r =>
        TfRecord.parseExample(r.getAs[Array[Byte]]("record"))("id").asInstanceOf[Int64List].values.head
      }
      assert(ids.sorted.toSeq == (0 until 100).flatMap(i => Seq(i.toLong, i.toLong)).sorted)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }
}
