package graft

import graft.sources.Snappy

/** Snappy conformance — LIVE against the reference implementation:
  * snappy-java ships on the Spark classpath (parquet uses it), so
  * every run cross-checks all three formats in BOTH directions (our
  * decode of its output, its decode of ours) instead of trusting
  * pinned fixtures. Payloads cover compressible text, long
  * overlapping matches, incompressible bytes, tiny and empty. */
class SnappySpec extends SparkSuite {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def payloads: Seq[(String, Array[Byte])] = Seq(
    "jsonl" -> (0 until 6000).map(i => s"""{"id":$i,"w":"w${i % 83}"}""").mkString("\n").getBytes(Utf8),
    "rep" -> ("abcabcabc" * 20000).getBytes(Utf8), // overlapping copies
    "runs" -> Array.fill(100000)('x'.toByte), // max-overlap RLE shape
    "rnd" -> Array.tabulate(80000)(i => (scala.util.hashing.MurmurHash3.stringHash("s" + i) & 0xff).toByte),
    "tiny" -> "x".getBytes(Utf8),
    "empty" -> Array.emptyByteArray
  )

  test("raw block: both directions agree with snappy-java") {
    payloads.foreach { case (name, data) =>
      val ref = org.xerial.snappy.Snappy.compress(data)
      val gotTheirs = Snappy.rawDecode(ref, 0, ref.length)
      assert(java.util.Arrays.equals(gotTheirs, data), s"$name: our decode of snappy-java output drifted")
      val ours = Snappy.rawEncode(data)
      val back = org.xerial.snappy.Snappy.uncompress(ours)
      assert(java.util.Arrays.equals(back, data), s"$name: snappy-java rejects our encoding")
      assert(java.util.Arrays.equals(Snappy.rawDecode(ours, 0, ours.length), data), s"$name: own round-trip drift")
    }
  }

  test("framing format (.sz): both directions agree with snappy-java's framed streams") {
    payloads.foreach { case (name, data) =>
      // reference writer -> our reader
      val bos = new java.io.ByteArrayOutputStream()
      val fo = new org.xerial.snappy.SnappyFramedOutputStream(bos)
      fo.write(data); fo.close()
      val framed = bos.toByteArray
      assert(Snappy.isFramed(framed), s"$name: reference framed stream not recognized")
      assert(java.util.Arrays.equals(Snappy.framedDecode(framed), data), s"$name: our framed decode drifted")
      assert(java.util.Arrays.equals(Snappy.decode(framed), data), s"$name: shape dispatch drifted")
      // our writer -> reference reader
      val ours = Snappy.framedEncode(data)
      val fi = new org.xerial.snappy.SnappyFramedInputStream(new java.io.ByteArrayInputStream(ours))
      val back = fi.readAllBytes(); fi.close()
      assert(java.util.Arrays.equals(back, data), s"$name: snappy-java rejects our framed stream")
    }
  }

  test("hadoop framing (.snappy): reference writer decodes; our chunks verify through snappy-java") {
    payloads.foreach { case (name, data) =>
      val bos = new java.io.ByteArrayOutputStream()
      val ho = new org.xerial.snappy.SnappyHadoopCompatibleOutputStream(bos, 32 << 10)
      ho.write(data); ho.close()
      val framed = bos.toByteArray
      assert(java.util.Arrays.equals(Snappy.hadoopDecode(framed), data), s"$name: our hadoop decode drifted")
      assert(java.util.Arrays.equals(Snappy.decode(framed), data), s"$name: shape dispatch drifted")
      // our writer: each chunk must be valid raw snappy to the reference
      val ours = Snappy.hadoopEncode(data, blockSize = 8192)
      assert(java.util.Arrays.equals(Snappy.hadoopDecode(ours), data), s"$name: own hadoop round-trip drift")
      var p = 0
      val out = new java.io.ByteArrayOutputStream()
      while (p < ours.length) {
        val orig = java.nio.ByteBuffer.wrap(ours, p, 4).getInt; p += 4
        var got = 0
        while (got < orig) {
          val clen = java.nio.ByteBuffer.wrap(ours, p, 4).getInt; p += 4
          val chunk = org.xerial.snappy.Snappy.uncompress(java.util.Arrays.copyOfRange(ours, p, p + clen))
          p += clen; got += chunk.length; out.write(chunk)
        }
      }
      assert(java.util.Arrays.equals(out.toByteArray, data), s"$name: snappy-java rejects our hadoop chunks")
    }
  }

  test("malformed input raises SnappyError, never raw index errors") {
    val good = Snappy.framedEncode(payloads.head._2)
    for (cut <- Seq(3, 9, 12, 20, good.length - 2))
      intercept[Snappy.SnappyError](Snappy.decode(java.util.Arrays.copyOf(good, cut)))
    for (pos <- Seq(11, 14, 18, 40)) {
      val bad = good.clone()
      bad(pos) = (bad(pos) ^ 0x5a).toByte
      try { Snappy.decode(bad); () }
      catch { case _: Snappy.SnappyError => () }
    }
    val hadoopGood = Snappy.hadoopEncode(payloads.head._2)
    for (cut <- Seq(2, 6, 10, hadoopGood.length - 1))
      intercept[Snappy.SnappyError](Snappy.hadoopDecode(java.util.Arrays.copyOf(hadoopGood, cut)))
    // raw: offset-before-window and length overrun
    intercept[Snappy.SnappyError](Snappy.rawDecode(Array[Byte](4, 0x02, 1, 1), 0, 4)) // copy at pos 0
    intercept[Snappy.SnappyError](Snappy.rawDecode(Array[Byte](10, 0x00, 'a'), 0, 3)) // declares 10, has 1
  }

  test("allocation bombs rejected before allocating (declared-length bounds)") {
    // a 5-byte varint declaring ~2 GiB from 6 input bytes: the
    // format-implied 64/3 expansion bound fires before any allocation
    val bomb = Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x07, 0x00)
    val e1 = intercept[Snappy.SnappyError](Snappy.rawDecode(bomb, 0, bomb.length))
    assert(e1.getMessage.contains("impossible"))
    // caller-supplied cap fires first when tighter
    val small = Snappy.rawEncode(Array.fill[Byte](70000)('a'))
    intercept[Snappy.SnappyError](Snappy.rawDecode(small, 0, small.length, 65536))
    // framing format: a compressed chunk may not DECLARE >65536 output
    val inner = Snappy.rawEncode(Array.fill[Byte](70000)('b'))
    val chunk = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(Array[Byte](0xff.toByte, 0x06, 0x00, 0x00, 's', 'N', 'a', 'P', 'p', 'Y'))
      val len = 4 + inner.length
      o.write(0x00); o.write(len & 0xff); o.write((len >>> 8) & 0xff); o.write((len >>> 16) & 0xff)
      o.write(Array[Byte](0, 0, 0, 0)) // CRC never reached
      o.write(inner)
      o.toByteArray
    }
    intercept[Snappy.SnappyError](Snappy.framedDecode(chunk))
    // framing format: an uncompressed chunk past the 65536 cap
    val big = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(Array[Byte](0xff.toByte, 0x06, 0x00, 0x00, 's', 'N', 'a', 'P', 'p', 'Y'))
      val len = 4 + 70000
      o.write(0x01); o.write(len & 0xff); o.write((len >>> 8) & 0xff); o.write((len >>> 16) & 0xff)
      o.write(Array[Byte](0, 0, 0, 0))
      o.write(new Array[Byte](70000))
      o.toByteArray
    }
    intercept[Snappy.SnappyError](Snappy.framedDecode(big))
  }
}
