package graft

import java.nio.file.{Files, Path}

import graft.sources.{Warc, Wet}

/** WET / WAT sidecar support: the Common Crawl `*.warc.wet.gz` /
  * `*.warc.wat.gz` names must be picked up by `records()` (regression
  * pin — the original filter accepted only `.warc[.gz]` and silently
  * skipped every sidecar), split-size sweeps through the real Spark
  * faces must equal the whole-file parse, the WAT envelope walker must
  * round-trip titles/links including unicode, and the host-level link
  * graph must resolve relative hrefs and drop self-loops. */
class WetWatSpec extends SparkSuite {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def writeTmp(dir: Path, name: String, bytes: Array[Byte]): String = {
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p.toString
  }

  private def wetContainer(n: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    (0 until n).foreach { i =>
      bos.write(Warc.gzipMember(Wet.writeConversion(
        s"https://site$i.invalid/page/$i", "2024-01-01T00:00:00Z", s"urn:uuid:wet-$i",
        s"extracted text $i ${"t" * (i % 97)}")))
    }
    bos.toByteArray
  }

  test("wetDocs: .warc.wet.gz sidecar names are scanned (regression pin) and split sweeps agree") {
    val dir = Files.createTempDirectory("wet")
    try {
      val gz = wetContainer(29)
      // the Common Crawl name: ends in .wet.gz, NOT .warc.gz
      val path = writeTmp(dir, "seg-00000.warc.wet.gz", gz)
      for (split <- Seq(gz.length.toLong + 5, gz.length.toLong / 2, 300L, 77L)) {
        val got = Wet.wetDocs(spark, path, splitSize = split)
          .collect()
          .map(r => (r.getAs[String]("url"), r.getAs[String]("text")))
          .sortBy(_._1)
        assert(got.length == 29, s"splitSize=$split lost or duplicated conversion records")
        got.foreach { case (url, text) =>
          val i = url.split('/').last.toInt
          assert(text == s"extracted text $i ${"t" * (i % 97)}", s"text drifted for $url")
        }
      }
      // canonical_url flows through the real UrlCanon kernel
      val row = Wet.wetDocs(spark, path).where("url = 'https://site3.invalid/page/3'").collect().head
      assert(row.getAs[String]("canonical_url") == graft.text.UrlCanon.canonical("https://site3.invalid/page/3"))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("watPages: envelope walker round-trips title and links through the .wat.gz face, unicode intact") {
    val dir = Files.createTempDirectory("wat")
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val links0 = Seq("https://a.invalid/x", "/relative/path", "mailto:n@e.invalid")
      bos.write(Warc.gzipMember(Wet.writeWatRecord(
        "https://www.src.invalid/dir/page.html", "2024-01-01T00:00:00Z", "urn:uuid:wat-0",
        "Tïtle \"0\" — em", links0)))
      bos.write(Warc.gzipMember(Wet.writeWatRecord(
        "https://other.invalid/", "2024-01-01T00:00:00Z", "urn:uuid:wat-1", "plain", Seq.empty)))
      // a conversion record in the same container must NOT appear as a page
      bos.write(Warc.gzipMember(Wet.writeConversion(
        "https://x.invalid/t", "2024-01-01T00:00:00Z", "urn:uuid:wet-x", "text")))
      val path = writeTmp(dir, "seg-00000.warc.wat.gz", bos.toByteArray)
      val pages = Wet.watPages(spark, path).collect().sortBy(_.getAs[String]("url"))
      assert(pages.length == 2)
      val p0 = pages.find(_.getAs[String]("url").contains("src.invalid")).get
      assert(p0.getAs[String]("title") == "Tïtle \"0\" — em") // quotes + non-ascii through the JSON cycle
      assert(p0.getAs[Int]("n_links") == 3)
      assert(p0.getSeq[String](3) == links0)
      assert(pages.find(_.getAs[String]("url") == "https://other.invalid/").get.getAs[Int]("n_links") == 0)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("watLinkGraph: relative hrefs resolve against the page, non-http and self-loop edges drop, www. folds") {
    val dir = Files.createTempDirectory("watg")
    try {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Warc.gzipMember(Wet.writeWatRecord(
        "https://www.src.invalid/dir/page.html", "2024-01-01T00:00:00Z", "urn:uuid:g0", "t",
        Seq(
          "https://dst.invalid/a", // absolute → edge
          "/under/root", // relative, same host → self-loop, dropped
          "//proto.invalid/x", // protocol-relative → edge
          "mailto:someone@e.invalid", // non-http → dropped
          "https://www.dst.invalid/b" // www. folds into dst.invalid → one distinct edge
        ))))
      bos.write(Warc.gzipMember(Wet.writeWatRecord(
        "https://second.invalid/", "2024-01-01T00:00:00Z", "urn:uuid:g1", "t",
        Seq("https://dst.invalid/c"))))
      val path = writeTmp(dir, "g.warc.wat.gz", bos.toByteArray)
      val edges = Wet.watLinkGraph(spark, path)
        .collect()
        .map(r => (r.getString(0), r.getString(1)))
        .sorted
        .toSeq
      assert(edges == Seq(
        "second.invalid" -> "dst.invalid",
        "src.invalid" -> "dst.invalid",
        "src.invalid" -> "proto.invalid"))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("parseWat tolerance: absent branches yield empty fields; non-JSON blocks yield None") {
    val bare = Wet.parseWat("""{"Envelope":{}}""".getBytes(Utf8))
    assert(bare.contains(Wet.WatPage("", "", Vector.empty)))
    val noHtml = Wet.parseWat(
      """{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"https://u.invalid/"},
        |"Payload-Metadata":{"HTTP-Response-Metadata":{}}}}""".stripMargin.getBytes(Utf8))
    assert(noHtml.contains(Wet.WatPage("https://u.invalid/", "", Vector.empty)))
    assert(Wet.parseWat("not json at all".getBytes(Utf8)).isEmpty)
    assert(Wet.parseWat(Array[Byte](0, 1, 2, 3)).isEmpty)
  }

  test("resolveLink / hostOf edges") {
    assert(Wet.resolveLink("https://a.invalid/dir/p.html", "x.html").contains("https://a.invalid/dir/x.html"))
    assert(Wet.resolveLink("https://a.invalid/dir/p.html", "/root").contains("https://a.invalid/root"))
    assert(Wet.resolveLink("https://a.invalid/p", "//b.invalid/q").contains("https://b.invalid/q"))
    assert(Wet.resolveLink("https://a.invalid/p", "javascript:void(0)").isEmpty)
    assert(Wet.resolveLink("https://a.invalid/p", "mailto:x@y.invalid").isEmpty)
    assert(Wet.resolveLink("not a url", "also bad ::").isEmpty)
    assert(Wet.hostOf("https://WWW.Example.INVALID/p") == "example.invalid")
    assert(Wet.hostOf("nonsense") == "")
  }
}
