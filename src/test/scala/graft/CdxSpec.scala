package graft

import java.nio.file.{Files, Path}

import graft.sources.{Cdx, Warc}

/** CDX capture index: SURT canonicalization pins, the CDXJ line codec
  * round-trip, index-vs-scan agreement, a written shard read back
  * through the real text face, and — the point of the module —
  * random-access [[Cdx.fetch]] returning byte-exact records from
  * (filename, offset, length) extents alone, for gz and plain
  * containers, multi-file and multi-record-member cases included. */
class CdxSpec extends SparkSuite {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def writeTmp(dir: Path, name: String, bytes: Array[Byte]): String = {
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p.toString
  }

  private def resourceRec(id: Int, text: String): Array[Byte] =
    Warc.writeRecord(
      "resource", s"https://site.invalid/doc/$id", "2024-03-05T06:07:08Z",
      s"urn:uuid:cdx-$id", "text/plain", text.getBytes(Utf8))

  test("surtKey: published canonical form — case, www, default ports, query sort, reversal") {
    assert(Cdx.surtKey("https://www.Example.COM/Path/File.html") == "com,example)/path/file.html")
    assert(Cdx.surtKey("http://example.com:80/") == "com,example)/")
    assert(Cdx.surtKey("https://example.com:443/") == "com,example)/")
    assert(Cdx.surtKey("https://example.com:8443/x") == "com,example:8443)/x")
    assert(Cdx.surtKey("https://a.b.example.co.uk/p") == "uk,co,example,b,a)/p")
    assert(Cdx.surtKey("https://example.com/p?b=2&a=1&c=3") == "com,example)/p?a=1&b=2&c=3")
    assert(Cdx.surtKey("https://example.com") == "com,example)/") // empty path -> /
    // only ONE leading www. strips; www in the middle stays
    assert(Cdx.surtKey("https://www.www2.example.com/") == "com,example,www2)/")
    assert(Cdx.surtKey("not a url") == "")
    assert(Cdx.surtKey("mailto:x@example.com") == "")
  }

  test("sha1Base32 known answers and ts14") {
    // SHA-1("") in base32 — the well-known CDX empty-payload digest
    assert(Cdx.sha1Base32(Array.emptyByteArray) == "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
    assert(Cdx.sha1Base32("abc".getBytes(Utf8)).length == 32)
    assert(Cdx.ts14("2024-03-05T06:07:08Z") == "20240305060708")
    assert(Cdx.ts14("2024-03-05T06:07:08.123456Z") == "20240305060708") // fractional digits truncate
    assert(Cdx.ts14("") == "00000000000000")
  }

  test("CDXJ line codec round-trips, including quotes in URLs and spaces in the key") {
    val e = Cdx.Entry(
      "com,example)/p?a=%22q%22", "20240305060708", "https://example.com/p?a=\"q\"",
      "text/html; charset=utf-8", 200, "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ", 123456789L, 4321L,
      "crawl-data/seg/warc/file-00001.warc.gz")
    assert(Cdx.parseLine(Cdx.formatLine(e)).contains(e))
    // malformed lines are a None, never a throw
    assert(Cdx.parseLine("").isEmpty)
    assert(Cdx.parseLine("key 2024 not-json").isEmpty)
    assert(Cdx.parseLine("""key 2024 {"url":"u","offset":"x","length":"1"}""").isEmpty)
  }

  test("index agrees with records(); shard write/read through the real text face; fetch is byte-exact (gz, two files)") {
    val dir = Files.createTempDirectory("cdx")
    try {
      def container(ids: Range): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        ids.foreach(i => bos.write(Warc.gzipMember(resourceRec(i, s"text $i ${"x" * (i % 53)}"))))
        bos.toByteArray
      }
      writeTmp(dir, "a.warc.gz", container(0 until 17))
      writeTmp(dir, "b.warc.gz", container(100 until 119))
      val pattern = dir.toString
      val idx = Cdx.index(spark, pattern, splitSize = 512L)
      assert(idx.count() == 36)
      // surt + digest flow from the real kernels
      val row0 = idx.where("url = 'https://site.invalid/doc/3'").collect().head
      assert(row0.getAs[String]("url_surtkey") == "invalid,site)/doc/3")
      assert(row0.getAs[String]("fetch_time") == "20240305060708")
      assert(row0.getAs[String]("content_digest") ==
        Cdx.sha1Base32(s"text 3 ${"x" * 3}".getBytes(Utf8)))
      // shard out + back through the real text face (gz compression)
      val shardDir = dir.resolve("shards").toString
      Cdx.toCdxjLines(idx).write.option("compression", "gzip").text(shardDir)
      val back = Cdx.readCdxj(spark, shardDir + "/*.txt.gz")
      assert(back.count() == 36)
      val a = idx.collect().map(_.toSeq).toSet
      val b = back.collect().map(_.toSeq).toSet
      assert(a == b, "shard round-trip changed the index")
      // random-access fetch of a subset: byte-exact bodies, no scan
      val subset = back.where("url like '%/doc/10%'") // 10, 100..109 -> 11 rows
      val fetched = Cdx.fetch(spark, subset).collect()
      assert(fetched.length == 11)
      fetched.foreach { r =>
        val id = r.getAs[String]("target_uri").split('/').last.toInt
        assert(new String(r.getAs[Array[Byte]]("body"), Utf8) == s"text $id ${"x" * (id % 53)}")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir.toFile)
    }
  }

  test("fetch: plain .warc extents and a multi-record gz member emit every record") {
    val dir = Files.createTempDirectory("cdx-edge")
    try {
      // plain container: extents are serialized record extents
      val plain = (0 until 9).map(i => resourceRec(i, s"p$i")).reduce(_ ++ _)
      writeTmp(dir, "c.warc", plain)
      val idxPlain = Cdx.index(spark, dir.resolve("c.warc").toString, splitSize = 256L)
      assert(idxPlain.count() == 9)
      val fetchedPlain = Cdx.fetch(spark, idxPlain).collect()
      assert(fetchedPlain.length == 9)
      assert(fetchedPlain.map(r => new String(r.getAs[Array[Byte]]("body"), Utf8)).sorted.toSeq ==
        (0 until 9).map(i => s"p$i").sorted)
      // one gz member holding three records: the three index rows share
      // the member extent; fetching ONE of them yields all three (the
      // member is the access unit), deduped here by record id
      val multi = Warc.gzipMember(resourceRec(50, "m0") ++ resourceRec(51, "m1") ++ resourceRec(52, "m2"))
      writeTmp(dir, "d.warc.gz", multi)
      val idxMulti = Cdx.index(spark, dir.resolve("d.warc.gz").toString)
      assert(idxMulti.count() == 3)
      assert(idxMulti.select("warc_record_offset").distinct().count() == 1)
      val one = idxMulti.where("url like '%/51'")
      val got = Cdx.fetch(spark, one).collect()
      assert(got.length == 3, "a multi-record member must emit every record it holds")
      assert(got.map(_.getAs[String]("target_uri")).sorted.toSeq ==
        Seq(50, 51, 52).map(i => s"https://site.invalid/doc/$i"))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir.toFile)
    }
  }
}
