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
}
