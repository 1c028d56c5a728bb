package graft

import java.nio.file.{Files, Path}

import graft.sources.{Warc, WarcZst, Zstd}

/** `.warc.zst` reader: fixtures are containers whose dictionary is
  * libzstd-TRAINED on the records and whose content frames were
  * compressed by libzstd WITH that dictionary — one carrying the dict
  * raw in the skippable frame, one carrying it zstd-compressed (both
  * layouts the convention allows). The reader must surface every
  * record through the real Spark face at any split size; the writer
  * round-trips with a raw dict. */
class WarcZstSpec extends SparkSuite {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val dir = new java.io.File("src/test/resources/graft/warczst")

  private def expectUris: Seq[String] =
    new String(Files.readAllBytes(new java.io.File(dir, "expected_uris.txt").toPath), Utf8)
      .split("\n").toSeq

  test("records(): trained-dict containers (raw + compressed dict layouts) surface every record at any split") {
    val tmp = Files.createTempDirectory("warczst")
    try {
      Seq("trained_raw_dict", "trained_zdict").foreach { n =>
        val bytes = Files.readAllBytes(new java.io.File(dir, n + ".warc.zst").toPath)
        val p = tmp.resolve(n + ".warc.zst")
        Files.write(p, bytes)
        for (split <- Seq(bytes.length.toLong + 9, bytes.length.toLong / 3, 257L)) {
          val rows = WarcZst.records(spark, p.toString, splitSize = split).collect()
          assert(rows.length == 60, s"$n split $split: ${rows.length} records")
          val uris = rows.map(_.getAs[String]("target_uri")).sorted.toSeq
          assert(uris == expectUris.sorted, s"$n split $split: uri drift")
          val body = rows.find(_.getAs[String]("target_uri").endsWith("/p/7")).get.getAs[Array[Byte]]("body")
          assert(new String(body, Utf8).contains("page 7"), s"$n: body decode drift")
        }
      }
    } finally {
      tmp.toFile.listFiles().foreach(_.delete()); Files.deleteIfExists(tmp)
    }
  }

  test("dictionaryOf: raw blob and zstd-compressed blob both resolve; absent dict means offset 0") {
    val raw = Files.readAllBytes(new java.io.File(dir, "trained_raw_dict.warc.zst").toPath)
    val (d1, off1) = WarcZst.dictionaryOf(raw)
    assert(d1.exists(d => Zstd.parseDict(d).isDefined) && off1 > 0)
    val comp = Files.readAllBytes(new java.io.File(dir, "trained_zdict.warc.zst").toPath)
    val (d2, off2) = WarcZst.dictionaryOf(comp)
    assert(d2.isDefined && java.util.Arrays.equals(d1.get, d2.get), "compressed-dict layout must yield the same dictionary")
    assert(off2 > 0 && off2 < off1, "compressed dict head is smaller")
    val plain = WarcZst.write(Seq("WARC/1.0\r\n\r\nx".getBytes(Utf8)))
    assert(WarcZst.dictionaryOf(plain) == (None, 0L))
  }

  test("write/records round-trip with a raw in-band dictionary; planted frame magic inside a body is skipped") {
    val tmp = Files.createTempDirectory("warczst-w")
    try {
      // bodies share structure (dict-compressible) and one carries the
      // zstd magic bytes mid-payload
      def rec(i: Int): Array[Byte] = {
        val marker: Array[Byte] =
          if (i == 13) Array(0x28.toByte, 0xb5.toByte, 0x2f.toByte, 0xfd.toByte, 0x00, 0x00)
          else Array.emptyByteArray
        val body = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html><p>body " + i + "</p></html>").getBytes(Utf8) ++ marker
        Warc.writeRecord("response", s"https://w.invalid/$i", "2024-01-01T00:00:00Z",
          s"urn:uuid:w$i", "application/http;msgtype=response", body)
      }
      val dict = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html><p>body" * 4).getBytes(Utf8)
      val groups = (0 until 30).grouped(3).map(g => g.toArray.flatMap(rec)).toSeq
      val container = WarcZst.write(groups, dict)
      val p = tmp.resolve("own.warc.zst")
      Files.write(p, container)
      for (split <- Seq(container.length.toLong + 1, 1024L, 128L)) {
        val rows = WarcZst.records(spark, p.toString, splitSize = split).collect()
        assert(rows.length == 30, s"split $split: ${rows.length} records (planted magic adopted?)")
      }
    } finally {
      tmp.toFile.listFiles().foreach(_.delete()); Files.deleteIfExists(tmp)
    }
  }

  test("framesInRange: crafted skippable-frame sizes raise ZstdError, never hang or escape raw") {
    // one real frame, then a skippable frame whose UNSIGNED size field
    // is hostile: 0xFFFFFFF8 once read signed gave pos += 0 (infinite
    // loop); smaller negatives walked pos backwards (raw AIOOBE)
    val payload = Zstd.encode("WARC/1.0\r\n\r\n".getBytes(Utf8))
    for (size <- Seq(0xfffffff8, 0x80000000, -16)) {
      val bad = new java.io.ByteArrayOutputStream()
      bad.write(payload)
      def w32(v: Int): Unit = { bad.write(v & 0xff); bad.write((v >>> 8) & 0xff); bad.write((v >>> 16) & 0xff); bad.write((v >>> 24) & 0xff) }
      w32(0x184d2a50); w32(size)
      bad.write(new Array[Byte](16)) // some trailing bytes the walk would skip into
      val b = bad.toByteArray
      val ex = intercept[Zstd.ZstdError](WarcZst.framesInRange(b, 0, b.length.toLong, null))
      assert(ex.getMessage.contains("skippable"), ex.getMessage)
    }
  }
}
