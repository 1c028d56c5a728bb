package graft

import java.nio.file.Files

import graft.text.Brotli

/** Brotli (RFC 7932) conformance: every fixture is a REAL libbrotlienc
  * stream (qualities 0/1/5/9/10/11, window sizes 10..24, HTML / JSON /
  * prose / binary / RLE / UTF-8 content — the prose fixtures compress
  * 8880->65 bytes, which only happens through static-dictionary
  * references with transforms, so appendix A+B are fully exercised)
  * and must decode byte-exactly. Plus: the uncompressed-meta-block
  * encoder round-trip, metadata-skip blocks, the WARC
  * Content-Encoding face, and the untrusted-bytes contract. */
class BrotliSpec extends SparkSuite {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val dir = new java.io.File("src/test/resources/graft/brotli")

  private def fixtures: Seq[String] =
    dir.listFiles().filter(_.getName.endsWith(".br")).map(_.getName.stripSuffix(".br")).sorted.toSeq

  test("decode: every real-encoder fixture decodes byte-exactly") {
    val names = fixtures
    assert(names.size >= 12)
    assert(names.exists(_.contains("_q0_")) && names.exists(_.contains("_q11_")), "quality coverage")
    names.foreach { n =>
      val br = Files.readAllBytes(new java.io.File(dir, n + ".br").toPath)
      val want = Files.readAllBytes(new java.io.File(dir, n + ".bin").toPath)
      val got = Brotli.decode(br)
      assert(java.util.Arrays.equals(got, want), s"$n: decode mismatch (${got.length} vs ${want.length})")
    }
  }

  test("decode: the q11 prose fixture really is dictionary-built (compression no LZ window explains)") {
    val br = Files.readAllBytes(new java.io.File(dir, "prose_q11_w22.br").toPath)
    val want = Files.readAllBytes(new java.io.File(dir, "prose_q11_w22.bin").toPath)
    assert(br.length < 100 && want.length > 8000, "fixture must be dictionary-dominated")
    assert(java.util.Arrays.equals(Brotli.decode(br), want))
  }

  test("encodeRaw: uncompressed-meta-block streams round-trip, incl. empty and multi-block") {
    Seq(
      Array.emptyByteArray,
      "x".getBytes(Utf8),
      ("word " * 100000).getBytes(Utf8), // > one 4 MiB chunk? (500 KB — single block)
      Array.tabulate(5 << 20)(i => (i * 31).toByte) // 5 MiB: multiple meta-blocks
    ).foreach { data =>
      val enc = Brotli.encodeRaw(data)
      assert(java.util.Arrays.equals(Brotli.decode(enc), data), s"raw round-trip drift at ${data.length} B")
    }
  }

  test("metadata meta-blocks are skipped transparently") {
    // hand-compose: WBITS=16 bit, then a metadata block skipping 3 bytes,
    // then an uncompressed block 'ab', then ISLAST+ISLASTEMPTY
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0; var n = 0
    def put(v: Int, bits: Int): Unit = {
      (0 until bits).foreach { i =>
        cur |= ((v >> i) & 1) << n; n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
      }
    }
    def align(): Unit = if (n > 0) { out.write(cur); cur = 0; n = 0 }
    put(0, 1) // wbits 16
    put(0, 1) // not last
    put(3, 2) // MNIBBLES code 3 = metadata
    put(0, 1) // reserved
    put(1, 2) // MSKIPBYTES = 1
    put(2, 8) // skip 3 bytes (value+1)
    align(); out.write(Array[Byte](9, 9, 9))
    put(0, 1) // not last
    put(0, 2) // 4 nibbles
    put(1, 16) // MLEN = 2
    put(1, 1) // uncompressed
    align(); out.write("ab".getBytes(Utf8))
    put(1, 1); put(1, 1) // last + empty
    align()
    assert(new String(Brotli.decode(out.toByteArray), Utf8) == "ab")
  }

  test("WARC integration: Content-Encoding br/gzip/deflate bodies decode; unknown passes through") {
    import graft.sources.Warc
    val payload = ("<html><body>" + "the description of the information " * 50 + "</body></html>").getBytes(Utf8)
    val brBody = Brotli.encodeRaw(payload)
    assert(java.util.Arrays.equals(
      Warc.decodeContentEncoding(Map("Content-Encoding" -> "br"), brBody), payload))
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(payload); g.close(); bos.toByteArray
    }
    assert(java.util.Arrays.equals(
      Warc.decodeContentEncoding(Map("content-encoding" -> "gzip"), gz), payload))
    val zlib = {
      val d = new java.util.zip.Deflater()
      d.setInput(payload); d.finish()
      val buf = new Array[Byte](payload.length * 2 + 64)
      val m = d.deflate(buf)
      java.util.Arrays.copyOf(buf, m)
    }
    assert(java.util.Arrays.equals(
      Warc.decodeContentEncoding(Map("Content-Encoding" -> "deflate"), zlib), payload))
    // unknown/corrupt: tolerant passthrough, never an exception
    assert(java.util.Arrays.equals(
      Warc.decodeContentEncoding(Map("Content-Encoding" -> "zstd-nonsense"), payload), payload))
    assert(java.util.Arrays.equals(
      Warc.decodeContentEncoding(Map("Content-Encoding" -> "br"), payload), payload))
  }

  test("end-to-end: a br-encoded HTML response inside a WARC member reaches htmlDocs as text") {
    import graft.sources.Warc
    val html = "<html><body><p>" + ("brotli body text sentence. " * 30) + "</p></body></html>"
    val body = Brotli.encodeRaw(html.getBytes(Utf8))
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Encoding: br\r\n\r\n").getBytes(Utf8) ++ body
    val rec = Warc.writeRecord("response", "https://x.invalid/br-page", "2024-01-01T00:00:00Z",
      "urn:uuid:br1", "application/http;msgtype=response", http)
    val dir2 = Files.createTempDirectory("warc-br")
    try {
      val p = dir2.resolve("one.warc.gz")
      Files.write(p, Warc.gzipMember(rec))
      val rows = Warc.htmlDocs(spark, p.toString).collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[String]("text").contains("brotli body text sentence"))
    } finally {
      dir2.toFile.listFiles().foreach(_.delete()); Files.deleteIfExists(dir2)
    }
  }

  test("malformed input raises BrotliError, never raw index errors") {
    val good = Files.readAllBytes(new java.io.File(dir, "json_q9_w20.br").toPath)
    (Seq(1, 2, 3) ++ (4 until good.length by 23)).foreach { cut =>
      try { Brotli.decode(java.util.Arrays.copyOf(good, cut)); () }
      catch { case _: Brotli.BrotliError => () }
    }
    (0 until good.length by 11).foreach { i =>
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x6d).toByte
      try { Brotli.decode(bad); () }
      catch { case _: Brotli.BrotliError => () }
    }
  }
}
