package graft

import java.nio.file.{Files, Path}

import graft.sources.Warc

/** WARC container scan — the promised proof that the range-split scan
  * is exactly-once: the union over ANY split-size partition, read
  * through the REAL `records()` Spark face, equals the whole-file
  * parse. Plus the adversarial cases the split design must survive:
  * `1f 8b 08` planted inside a member payload, a multi-record gzip
  * member, an oversized header section, the uncompressed-`.warc`
  * range scan, and HTTP-message edge parsing. */
class WarcSpec extends SparkSuite {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def rec(id: Int, body: Array[Byte], ctype: String = "application/http;msgtype=response"): Array[Byte] =
    Warc.writeRecord(
      "response", s"https://example.invalid/p/$id", "2024-01-01T00:00:00Z",
      s"urn:uuid:$id", ctype, body)

  private def httpHtml(html: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + html).getBytes(Utf8)

  /** n-record container: one gzip member per record, deterministic
    * bodies; returns (gz image, plain image, expected record ids). */
  private def container(n: Int): (Array[Byte], Array[Byte], Seq[Int]) = {
    val gz = new java.io.ByteArrayOutputStream()
    val plain = new java.io.ByteArrayOutputStream()
    (0 until n).foreach { i =>
      val r = rec(i, httpHtml(s"<html><body><p>body $i ${"x" * (i % 211)}</p></body></html>"))
      gz.write(Warc.gzipMember(r))
      plain.write(r)
    }
    (gz.toByteArray, plain.toByteArray, 0 until n)
  }

  private def writeTmp(dir: Path, name: String, bytes: Array[Byte]): String = {
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p.toString
  }

  private def readIds(df: org.apache.spark.sql.DataFrame): Seq[Int] =
    df.select("target_uri").collect().map(_.getString(0)).map(_.split('/').last.toInt).sorted.toSeq

  test("records(): gz split-size sweep — union over any range partition equals the whole-file parse") {
    val dir = Files.createTempDirectory("warc-gz")
    try {
      val (gz, _, ids) = container(41)
      val path = writeTmp(dir, "crawl.warc.gz", gz)
      val whole = Warc.parseAll(
        Warc.membersInRange(gz, 0, gz.length).flatMap(_._2).toArray)
      assert(whole.length == 41)
      // splits from "everything in one task" down to ranges far smaller
      // than a member (most tasks own zero members) — every partition of
      // the byte space must yield the same multiset of records
      for (split <- Seq(gz.length.toLong + 10, gz.length.toLong / 2, 1024L, 257L, 64L)) {
        val got = Warc.records(spark, path, splitSize = split)
        assert(readIds(got) == ids, s"splitSize=$split lost or duplicated records")
      }
      // offsets are file-absolute and unique (exactly-once, not re-labeled)
      val offs = Warc.records(spark, path, splitSize = 257L).select("offset").collect().map(_.getLong(0))
      assert(offs.distinct.length == 41)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("records(): uncompressed .warc split sweep matches the whole-file parse") {
    val dir = Files.createTempDirectory("warc-plain")
    try {
      val (_, plain, ids) = container(23)
      val path = writeTmp(dir, "crawl.warc", plain)
      assert(Warc.parseAll(plain).length == 23)
      for (split <- Seq(plain.length.toLong + 1, plain.length.toLong / 3, 511L, 100L)) {
        val got = Warc.records(spark, path, splitSize = split)
        assert(readIds(got) == ids, s"plain splitSize=$split lost or duplicated records")
      }
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("gzip magic that is not a WARC member cannot fork a bogus record") {
    // the probe's two rejection paths, deterministically:
    //  (a) a VALID gzip member whose payload lacks the WARC/ prefix —
    //      header parses, inflate succeeds, prefix check must reject
    //  (b) bare `1f 8b 08` magic followed by garbage — inflate fails
    val memberA = Warc.gzipMember(rec(0, httpHtml("<p>a</p>")))
    val memberB = Warc.gzipMember(rec(1, httpHtml("<p>b</p>")))
    val notWarc = Warc.gzipMember("NOTWARC payload that inflates fine".getBytes(Utf8))
    val magicGarbage = Array[Byte](0x1f, 0x8b.toByte, 0x08, 0, 0, 0, 0, 0, 0, 0) ++
      Array.tabulate[Byte](40)(i => (0xf0 | i).toByte) // invalid deflate stream
    val image = memberA ++ notWarc ++ magicGarbage ++ memberB
    // sweep every byte offset as its own range: the union must contain
    // exactly the two real records, with neither plant forking a third
    val all = (0 until image.length).flatMap { cut =>
      Warc.membersInRange(image, cut, cut + 1)
    }.flatMap { case (_, p) => Warc.parseAll(p) }
    assert(all.map(_.targetUri).sorted == Seq("https://example.invalid/p/0", "https://example.invalid/p/1"))
  }

  test("a multi-record gzip member emits every record, not only the first") {
    val r0 = rec(10, httpHtml("<p>a</p>"))
    val r1 = rec(11, httpHtml("<p>b</p>"))
    val r2 = rec(12, httpHtml("<p>c</p>"))
    val member = Warc.gzipMember(r0 ++ r1 ++ r2) // legal WARC, unconventional packing
    val single = Warc.gzipMember(rec(13, httpHtml("<p>d</p>")))
    val dir = Files.createTempDirectory("warc-multi")
    try {
      val path = writeTmp(dir, "multi.warc.gz", member ++ single)
      val got = Warc.records(spark, path, splitSize = 128L)
      assert(readIds(got) == Seq(10, 11, 12, 13))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("oversized header sections: 100 KB parses through the split scan; past the 1 MiB cap is a documented skip") {
    val bigVal = "v" * (100 * 1024)
    val blk = httpHtml("<p>big-header</p>")
    val big = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://example.invalid/p/7\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Record-ID: <urn:uuid:7>\r\n" +
      s"X-Big: $bigVal\r\nContent-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${blk.length}\r\n\r\n").getBytes(Utf8) ++ blk ++ "\r\n\r\n".getBytes(Utf8)
    val normal = rec(8, httpHtml("<p>n</p>"))
    val dir = Files.createTempDirectory("warc-hdr")
    try {
      val path = writeTmp(dir, "hdr.warc", big ++ normal)
      // the old 8 KB pre-parse cap would have dropped the big-header record
      val got = Warc.records(spark, path, splitSize = 4096L)
      assert(readIds(got) == Seq(7, 8))

      // past the cap: pinned as a skip for SPLIT scans (parseAll at offset
      // 0 still parses it — the limit is the split scan's, by design)
      val hugeVal = "w" * (Warc.MaxHeaderBytes + 64)
      val huge = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://example.invalid/p/9\r\n" +
        s"WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Record-ID: <urn:uuid:9>\r\n" +
        s"X-Huge: $hugeVal\r\nContent-Length: ${blk.length}\r\n\r\n").getBytes(Utf8) ++ blk ++ "\r\n\r\n".getBytes(Utf8)
      val path2 = writeTmp(dir, "huge.warc", huge ++ normal)
      assert(Warc.parseAll(huge).length == 1) // sequential parse has no cap
      val got2 = Warc.records(spark, path2, splitSize = 1L << 22)
      assert(readIds(got2) == Seq(8), "past-cap header record must be skipped by split scans, not mis-parsed")
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("htmlDocs: 200 text/html responses only, canonical url + extracted main text") {
    val dir = Files.createTempDirectory("warc-html")
    try {
      val html =
        """<html><head><title>d0</title><style>.x{color:red}</style></head><body>
          |<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
          |<p>real article text here padded well past the jusText eighty character block threshold so it survives</p>
          |<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>
          |</body></html>""".stripMargin
      val okRec = rec(0, httpHtml(html))
      val nfRec = rec(1, ("HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n<p>gone</p>").getBytes(Utf8))
      val jsonRec = rec(2, ("HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n{}").getBytes(Utf8))
      val infoRec = Warc.writeRecord("warcinfo", "", "2024-01-01T00:00:00Z", "urn:uuid:info",
        "application/warc-fields", "software: graft\r\n".getBytes(Utf8))
      val gz = Warc.gzipMember(infoRec) ++ Warc.gzipMember(okRec) ++ Warc.gzipMember(nfRec) ++ Warc.gzipMember(jsonRec)
      val path = writeTmp(dir, "docs.warc.gz", gz)
      val docs = Warc.htmlDocs(spark, path).collect()
      assert(docs.length == 1)
      val row = docs.head
      assert(row.getAs[String]("url") == "https://example.invalid/p/0")
      assert(row.getAs[String]("canonical_url") == graft.text.UrlCanon.canonical("https://example.invalid/p/0"))
      assert(row.getAs[String]("text") ==
        "real article text here padded well past the jusText eighty character block threshold so it survives")
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("parseHttp edges: header-only message, no CRLFCRLF, non-HTTP block, LWS status text") {
    // minimal valid: empty body after separator
    val h = Warc.parseHttp("HTTP/1.1 204 No Content\r\nX-A: b\r\n\r\n".getBytes(Utf8))
    assert(h.exists(m => m.status == 204 && m.headers("X-A") == "b" && m.body.isEmpty))
    // missing separator → None, not a crash
    assert(Warc.parseHttp("HTTP/1.1 200 OK\r\nX: y".getBytes(Utf8)).isEmpty)
    // non-HTTP block → None
    assert(Warc.parseHttp("<html>not http</html> padding padding".getBytes(Utf8)).isEmpty)
    // malformed status line (no code) → None
    assert(Warc.parseHttp("HTTP/1.1\r\n\r\nbody".getBytes(Utf8)).isEmpty)
    // body bytes preserved exactly
    val body = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val raw = "HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n\r\n".getBytes(Utf8) ++ body
    assert(Warc.parseHttp(raw).exists(_.body.sameElements(body)))
  }

  test("record grammar: LWS continuation folds, angle-bracket strip, truncated separator at EOF") {
    val blk = "x".getBytes(Utf8)
    val raw = ("WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: <https://e.invalid/a>\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Record-ID: <urn:uuid:1>\r\n" +
      "X-Folded: first\r\n  second\r\nContent-Length: 1\r\n\r\n").getBytes(Utf8) ++ blk // no trailing CRLFCRLF
    val parsed = Warc.parseRecord(raw, 0)
    assert(parsed.isDefined)
    val r = parsed.get._1
    assert(r.targetUri == "https://e.invalid/a") // angle brackets stripped
    assert(r.headers("X-Folded") == "first second") // LWS continuation folded
    assert(r.contentLength == 1 && r.block.sameElements(blk))
    assert(parsed.get._2 == raw.length) // truncated separator tolerated at EOF
  }
}
