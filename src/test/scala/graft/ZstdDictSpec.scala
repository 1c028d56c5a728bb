package graft

import graft.sources.{Zstd, ZstdDict}
import org.scalatest.funsuite.AnyFunSuite

/** Dictionary-training conformance, LIVE against zstd-jni: frames our
  * encoder writes with our trained raw-content dict must decompress
  * through zstd-jni with the same dict; frames zstd-jni compresses
  * with our dict must decode through our codec; and zstd-jni's OWN
  * ZstdDictTrainer output (trained magic + entropy tables) must work
  * through our trained-dict decode path. */
class ZstdDictSpec extends AnyFunSuite {

  /** templated corpus: small JSON docs sharing structure — the shape
    * dictionary compression exists for */
  private def corpus(n: Int): Seq[Array[Byte]] =
    (0 until n).map { i =>
      s"""{"user":"u${i % 23}","path":"/api/v2/items/${i * 37 % 1000}","verb":"GET","status":${200 + i % 3},"agent":"curl/8.${i % 9}.0","region":"eu-west-${i % 3}"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }

  test("determinism: identical samples train identical dictionaries") {
    val c = corpus(200)
    val d1 = ZstdDict.train(c, 4096, k = 64)
    val d2 = ZstdDict.train(c, 4096, k = 64)
    assert(d1.nonEmpty && java.util.Arrays.equals(d1, d2))
    assert(d1.length <= 4096)
  }

  test("edges: empty corpus, too-small budget, short samples") {
    assert(ZstdDict.train(Nil, 4096).isEmpty)
    assert(ZstdDict.train(corpus(10), 16, k = 64).isEmpty)
    assert(ZstdDict.train(Seq(Array[Byte](1, 2, 3)), 4096, k = 64).isEmpty) // shorter than d-mer
  }

  test("the dictionary helps: dict-compressed corpus beats dict-less, both our encoder and zstd-jni") {
    val c = corpus(300)
    val dict = ZstdDict.train(c, 4096, k = 64)
    assert(dict.nonEmpty)
    var oursPlain = 0L; var oursDict = 0L
    c.foreach { doc =>
      oursPlain += Zstd.encode(doc).length
      oursDict += Zstd.encode(doc, dict = dict).length
    }
    assert(oursDict < oursPlain, s"our encoder: $oursDict !< $oursPlain")
    val cctx = new com.github.luben.zstd.ZstdCompressCtx()
    try {
      cctx.loadDict(dict)
      var jniDict = 0L
      c.foreach(doc => jniDict += cctx.compress(doc).length)
      var jniPlain = 0L
      c.foreach(doc => jniPlain += com.github.luben.zstd.Zstd.compress(doc).length)
      assert(jniDict < jniPlain, s"zstd-jni with our dict: $jniDict !< $jniPlain")
    } finally cctx.close()
  }

  test("LIVE: our encoder + our dict -> zstd-jni decompresses byte-exactly") {
    val c = corpus(150)
    val dict = ZstdDict.train(c, 4096, k = 64)
    val dctx = new com.github.luben.zstd.ZstdDecompressCtx()
    try {
      dctx.loadDict(dict)
      c.foreach { doc =>
        val frame = Zstd.encode(doc, dict = dict)
        val back = dctx.decompress(frame, doc.length)
        assert(java.util.Arrays.equals(back, doc))
      }
    } finally dctx.close()
  }

  test("LIVE: zstd-jni compresses with our dict -> our decoder reads with the same dict") {
    val c = corpus(150)
    val dict = ZstdDict.train(c, 4096, k = 64)
    val cctx = new com.github.luben.zstd.ZstdCompressCtx()
    try {
      cctx.loadDict(dict)
      c.foreach { doc =>
        val frame = cctx.compress(doc)
        val back = Zstd.decode(frame, dict)
        assert(java.util.Arrays.equals(back, doc))
      }
    } finally cctx.close()
  }

  test("LIVE: zstd-jni's ZstdDictTrainer (trained magic) through our trained-dict decode path") {
    val c = corpus(400)
    val trainer = new com.github.luben.zstd.ZstdDictTrainer(1 << 20, 16 << 10)
    c.foreach(s => trainer.addSample(s))
    val trained = trainer.trainSamples()
    // trained-dict magic, not raw content
    assert((trained(0) & 0xff) == 0x37 && (trained(1) & 0xff) == 0xa4)
    val cctx = new com.github.luben.zstd.ZstdCompressCtx()
    try {
      cctx.loadDict(trained)
      c.foreach { doc =>
        val frame = cctx.compress(doc)
        val back = Zstd.decode(frame, trained)
        assert(java.util.Arrays.equals(back, doc))
      }
    } finally cctx.close()
  }

  test("q lane shape: bucket cycle over a sample of ids") {
    val ids = (0L until 200L).map(_ * 977L)
    val docs = ids.map(id => ZstdDict.docOf(id).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val dict = ZstdDict.train(docs, 4096, k = 64)
    assert(dict.nonEmpty)
    var withDict = 0L; var without = 0L
    val dctx = new com.github.luben.zstd.ZstdDecompressCtx()
    try {
      dctx.loadDict(dict)
      docs.foreach { doc =>
        val comp = Zstd.encode(doc, dict = dict)
        withDict += comp.length
        without += Zstd.encode(doc).length
        assert(java.util.Arrays.equals(dctx.decompress(comp, doc.length), doc))
      }
    } finally dctx.close()
    assert(withDict < without)
  }
}
