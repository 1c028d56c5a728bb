package graft

import graft.multimodal.Ogg

/** Ogg probe: page CRCs (the published unreflected 0x04C11DB7),
  * Vorbis/Opus identification headers, granule-position duration,
  * corruption stops the walk at the bad page.
  */
class OggSpec extends SparkSuite {

  private def vorbisId(rate: Int, channels: Int): Array[Byte] = {
    val out = collection.mutable.ArrayBuffer.empty[Byte]
    out += 1; out ++= "vorbis".getBytes
    (0 until 4).foreach(_ => out += 0) // version
    out += channels.toByte
    (0 until 4).foreach(k => out += (rate >> (8 * k)).toByte)
    (0 until 12).foreach(_ => out += 0) // bitrates
    out += 0xB8.toByte; out += 1 // blocksizes + framing
    out.toArray
  }

  test("Vorbis stream: codec, rate, channels, pages, duration from the last granule") {
    val serial = 0x1234
    val pagesBytes =
      Ogg.writePage(serial, 0, 0, 2, vorbisId(44100, 2)) ++
        Ogg.writePage(serial, 1, 0, 0, Array[Byte](3) ++ "vorbis".getBytes ++ new Array[Byte](20)) ++
        Ogg.writePage(serial, 2, 22050, 0, new Array[Byte](100)) ++
        Ogg.writePage(serial, 3, 44100, 4, new Array[Byte](80)) // EOS: 1 second total
    val m = Ogg.sniff(pagesBytes).getOrElse(fail("probe refused valid stream"))
    assert(m.codec == "vorbis" && m.sampleRate == 44100 && m.channels == 2)
    assert(m.pages == 4 && m.durationMs == 1000L)
  }

  test("Opus stream: 48 kHz granules with pre-skip subtracted") {
    val head = "OpusHead".getBytes ++ Array[Byte](1, 2) ++
      Array[Byte]((312 & 0xff).toByte, (312 >> 8).toByte) ++ new Array[Byte](7)
    val s = Ogg.writePage(7, 0, 0, 2, head) ++
      Ogg.writePage(7, 1, 48000 + 312, 4, new Array[Byte](60))
    val m = Ogg.sniff(s).get
    assert(m.codec == "opus" && m.sampleRate == 48000 && m.channels == 2)
    assert(m.durationMs == 1000L, s"duration ${m.durationMs}")
  }

  test("corruption: a bad page CRC ends the walk; garbage refuses; multi-segment packets page correctly") {
    val ok = Ogg.writePage(1, 0, 0, 2, vorbisId(8000, 1)) ++ Ogg.writePage(1, 1, 8000, 4, new Array[Byte](10))
    val bad = ok.clone()
    bad(ok.length - 5) = (bad(ok.length - 5) ^ 0x7f).toByte // corrupt last page body
    val m = Ogg.sniff(bad).get
    assert(m.pages == 1 && m.durationMs == 0, "walk should stop at the corrupt page")
    assert(Ogg.sniff("OggSnope".getBytes ++ new Array[Byte](40)).isEmpty)
    assert(Ogg.sniff(new Array[Byte](64)).isEmpty)
    // 600-byte packet spans 3 segments in one page
    val big = Ogg.writePage(2, 0, 0, 2, vorbisId(8000, 1)) ++ Ogg.writePage(2, 1, 16000, 4, new Array[Byte](600))
    assert(Ogg.sniff(big).get.durationMs == 2000L)
  }
}
