package graft

import graft.sources.TfRecord
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 faces for the high-traffic container sources:
  * `spark.read.format("tfrecord")` and
  * `spark.read.format("zipentries")`. Pruning/pushdown is proven the
  * ArrowSourceSpec way — by POISONING bytes that a pruned/filtered
  * read must never touch: the full read fails, the pruned read
  * succeeds around it. */
class ContainerSourceSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  // ------------------------------------------------------- proto wire tools

  private def varint(v: Long): Array[Byte] = {
    var x = v
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    while ((x & ~0x7fL) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
    out += x.toByte
    out.toArray
  }
  private def ld(fieldNum: Int, payload: Array[Byte]): Array[Byte] =
    varint((fieldNum << 3) | 2) ++ varint(payload.length) ++ payload
  private def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def featureEntry(name: String, feature: Array[Byte]): Array[Byte] =
    ld(1, ld(1, utf8(name)) ++ ld(2, feature))
  private def int64Feature(vs: Long*): Array[Byte] = ld(3, ld(1, vs.toArray.flatMap(varint)))
  private def floatFeature(vs: Float*): Array[Byte] =
    ld(2, ld(1, vs.toArray.flatMap { f =>
      val b = java.lang.Float.floatToIntBits(f)
      Array[Byte](b.toByte, (b >> 8).toByte, (b >> 16).toByte, (b >> 24).toByte)
    }))

  // ---------------------------------------------------------------- tfrecord

  test("tfrecord face: schema inference, typed arrays, gz shards, per-shard partitions") {
    val dir = java.nio.file.Files.createTempDirectory("tfsrc")
    try {
      def rec(id: Long) = TfRecord.encodeExample(Seq(
        "id" -> TfRecord.Int64List(Seq(id)),
        "tag" -> TfRecord.BytesList(Seq(utf8(s"t$id"))),
        "vals" -> TfRecord.FloatList(Seq(id.toFloat, id + 0.5f))))
      java.nio.file.Files.write(dir.resolve("a.tfrecord"), TfRecord.frame((0L until 40L).map(rec)))
      val gz = {
        val bos = new java.io.ByteArrayOutputStream()
        val go = new java.util.zip.GZIPOutputStream(bos)
        go.write(TfRecord.frame((40L until 60L).map(rec))); go.close()
        bos.toByteArray
      }
      java.nio.file.Files.write(dir.resolve("b.tfrecord.gz"), gz)

      val df = spark.read.format("tfrecord").load(dir.toString)
      assert(df.schema.fieldNames.toSet == Set("id", "tag", "vals"))
      assert(df.rdd.getNumPartitions == 2) // one per shard
      val rows = df.selectExpr("id[0] as id", "cast(tag[0] as string) as tag", "vals[1] as v")
        .collect().sortBy(_.getLong(0))
      assert(rows.length == 60)
      assert(rows(17).getLong(0) == 17L && rows(17).getString(1) == "t17" && rows(17).getFloat(2) == 17.5f)
      assert(rows(55).getLong(0) == 55L) // from the gz shard
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); java.nio.file.Files.delete(dir)
    }
  }

  test("tfrecord face: wire-level pruning skips a poisoned feature's value bytes") {
    val dir = java.nio.file.Files.createTempDirectory("tfpoison")
    try {
      // FloatList whose packed payload is 3 bytes (not a multiple of
      // 4): decoding it MUST fail; skipping it must not even look
      val poisonedFloat = ld(2, ld(1, Array[Byte](1, 2, 3)))
      val rec = ld(1,
        featureEntry("id", int64Feature(7L)) ++
          featureEntry("bad", poisonedFloat) ++
          featureEntry("ok", floatFeature(1.25f)))
      val shard = TfRecord.frame(Seq(rec)) // framing CRCs cover the poisoned bytes — valid shard
      java.nio.file.Files.write(dir.resolve("p.tfrecord"), shard)

      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("id", ArrayType(LongType, containsNull = false)),
        StructField("bad", ArrayType(FloatType, containsNull = false)),
        StructField("ok", ArrayType(FloatType, containsNull = false))))
      val df = spark.read.format("tfrecord").schema(schema).load(dir.resolve("p.tfrecord").toString)

      // full read touches 'bad' -> must fail with the named error
      val e = intercept[org.apache.spark.SparkException](df.collect())
      assert(e.getCause.isInstanceOf[TfRecord.TfRecordError] ||
        e.getMessage.contains("packed float length"))
      // pruned read never decodes 'bad' -> succeeds
      val pruned = df.selectExpr("id[0] as id", "ok[0] as ok").collect()
      assert(pruned.length == 1 && pruned(0).getLong(0) == 7L && pruned(0).getFloat(1) == 1.25f)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); java.nio.file.Files.delete(dir)
    }
  }

  // -------------------------------------------------------------- zipentries

  private def buildZip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (n, b) =>
      zo.putNextEntry(new java.util.zip.ZipEntry(n))
      zo.write(b)
      zo.closeEntry()
    }
    zo.close()
    bos.toByteArray
  }

  test("zipentries face: name-predicate pushdown and content pruning route around a poisoned entry") {
    val dir = java.nio.file.Files.createTempDirectory("zipsrc")
    try {
      val rnd = new scala.util.Random(7)
      val big = new Array[Byte](8192); rnd.nextBytes(big)
      val entries = Seq(
        "docs/a.txt" -> utf8("alpha body"),
        "docs/b.txt" -> utf8("beta body"),
        "blob/poison.bin" -> big)
      val zip = buildZip(entries)
      // poison: corrupt bytes well inside poison.bin's stored payload
      // (locate its local header by name, then damage past the header)
      val nameBytes = utf8("blob/poison.bin")
      val at = zip.indexOfSlice(nameBytes)
      assert(at > 0)
      for (k <- 200 until 240) zip(at + k) = (zip(at + k) ^ 0x5a).toByte
      val p = dir.resolve("shard.zip")
      java.nio.file.Files.write(p, zip)

      val df = spark.read.format("zipentries").load(p.toString)
      // full content read must hit the poisoned entry
      intercept[org.apache.spark.SparkException](df.select("name", "content").collect())
      // name pushdown: only .txt entries are fetched — plan carries the filter
      val filtered = df.where("name LIKE '%.txt'").selectExpr("name", "cast(content as string) as body")
      val plan = filtered.queryExecution.executedPlan.toString
      assert(plan.contains("pushed name filters"), s"no pushdown in plan:\n$plan")
      val got = filtered.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == Map("docs/a.txt" -> "alpha body", "docs/b.txt" -> "beta body"))
      // content pruning: catalog-only scan reads all THREE entries' metadata
      val catalog = df.select("name", "size").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(catalog == Map("docs/a.txt" -> 10L, "docs/b.txt" -> 9L, "blob/poison.bin" -> 8192L))
      // equality pushdown fetches exactly one entry's payload
      val one = df.where("name = 'docs/a.txt'").select("content").collect()
      assert(one.length == 1 && new String(one(0).getAs[Array[Byte]](0)) == "alpha body")
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); java.nio.file.Files.delete(dir)
    }
  }
}
