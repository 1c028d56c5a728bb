package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.raster.{Png, Webp}
import graft.raster.Webp.EncOpts

/** WebP (VP8L) codec: lossless round-trips across every decoder
  * surface the encoder can drive — plain literals, subtract-green,
  * predictor (all 14 modes via a cycling mode image), cross-color,
  * palette with pixel bundling (2/4/16/256 colors), color cache,
  * LZ77 runs, meta prefix codes, and their combinations — plus
  * container probe/sniff behavior and corrupt-input rejection. */
class WebpSpec extends AnyFunSuite {

  /** Deterministic RGB(A) noise that defeats accidental symmetry. */
  private def mkImage(w: Int, h: Int, channels: Int, seed: Int): Png.Image = {
    val px = new Array[Byte](w * h * channels)
    var i = 0
    while (i < px.length) {
      px(i) = (((i * 2654435761L) >>> 13) + seed * 977 + i * 31).toByte
      i += 1
    }
    Png.Image(w, h, channels, px)
  }

  private def assertCycle(img: Png.Image, opts: EncOpts, label: String): Unit = {
    val webp = Webp.encode(img, opts)
    val dec = Webp.decode(webp).getOrElse(fail(s"$label: decode returned None"))
    assert(dec.width == img.width && dec.height == img.height, s"$label: dims")
    // decoder emits 3 channels when alpha is uniformly 255, 4 otherwise;
    // compare pixel-for-pixel in the decoded channel layout
    val (w, h) = (img.width, img.height)
    var i = 0
    while (i < w * h) {
      val (r, g, b, a) = img.channels match {
        case 1 => val v = img.pixels(i) & 0xff; (v, v, v, 255)
        case 3 => (img.pixels(3 * i) & 0xff, img.pixels(3 * i + 1) & 0xff, img.pixels(3 * i + 2) & 0xff, 255)
        case _ => (img.pixels(4 * i) & 0xff, img.pixels(4 * i + 1) & 0xff, img.pixels(4 * i + 2) & 0xff, img.pixels(4 * i + 3) & 0xff)
      }
      val (dr, dg, db, da) =
        if (dec.channels == 3) (dec.pixels(3 * i) & 0xff, dec.pixels(3 * i + 1) & 0xff, dec.pixels(3 * i + 2) & 0xff, 255)
        else (dec.pixels(4 * i) & 0xff, dec.pixels(4 * i + 1) & 0xff, dec.pixels(4 * i + 2) & 0xff, dec.pixels(4 * i + 3) & 0xff)
      assert((dr, dg, db, da) == (r, g, b, a), s"$label: pixel $i drifted")
      i += 1
    }
  }

  test("plain literal stream round-trips (gray, rgb, rgba; odd dims)") {
    assertCycle(mkImage(17, 11, 1, 1), EncOpts(), "gray")
    assertCycle(mkImage(32, 9, 3, 2), EncOpts(), "rgb")
    assertCycle(mkImage(13, 21, 4, 3), EncOpts(), "rgba")
    assertCycle(mkImage(1, 1, 3, 4), EncOpts(), "1x1")
  }

  test("subtract-green transform round-trips") {
    assertCycle(mkImage(25, 14, 3, 5), EncOpts(subtractGreen = true), "sg")
    assertCycle(mkImage(8, 8, 4, 6), EncOpts(subtractGreen = true), "sg-rgba")
  }

  test("predictor transform: all 14 modes exercised by a cycling mode image") {
    // 2^2=4-px blocks on a 40x24 image → 10x6=60 blocks → modes 0..13
    // each hit several times, including edge rows/cols
    assertCycle(mkImage(40, 24, 3, 7), EncOpts(predictorBits = 2), "pred2")
    assertCycle(mkImage(33, 17, 4, 8), EncOpts(predictorBits = 3), "pred3")
  }

  test("cross-color transform round-trips (signed 3.5 multipliers)") {
    assertCycle(mkImage(37, 22, 3, 9), EncOpts(crossColor = true), "cc")
  }

  test("stacked transforms: subtract-green + predictor + cross-color") {
    assertCycle(mkImage(48, 31, 3, 10),
      EncOpts(subtractGreen = true, predictorBits = 2, crossColor = true), "stack")
  }

  test("palette with pixel bundling at every width: 2, 4, 16, 256 colors") {
    def palImage(w: Int, h: Int, colors: Int, seed: Int): Png.Image = {
      val px = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val c = ((i * 7 + seed) % colors + colors) % colors
        px(3 * i) = (c * 37).toByte; px(3 * i + 1) = (c * 59 + 1).toByte; px(3 * i + 2) = (c * 83 + 2).toByte
        i += 1
      }
      Png.Image(w, h, 3, px)
    }
    assertCycle(palImage(19, 7, 2, 1), EncOpts(palette = true), "pal2") // 8 px/byte
    assertCycle(palImage(21, 9, 4, 2), EncOpts(palette = true), "pal4") // 4 px/byte
    assertCycle(palImage(23, 11, 16, 3), EncOpts(palette = true), "pal16") // 2 px/byte
    assertCycle(palImage(30, 13, 250, 4), EncOpts(palette = true), "pal250") // no bundling
  }

  test("color cache round-trips (repeated colors hit the cache path)") {
    // few distinct colors → many cache hits at 4 and 8 bits
    val img = {
      val px = new Array[Byte](40 * 20 * 3)
      var i = 0
      while (i < 40 * 20) {
        val c = i % 7
        px(3 * i) = (c * 31).toByte; px(3 * i + 1) = (c * 47).toByte; px(3 * i + 2) = (c * 73).toByte
        i += 1
      }
      Png.Image(40, 20, 3, px)
    }
    assertCycle(img, EncOpts(cacheBits = 4), "cache4")
    assertCycle(img, EncOpts(cacheBits = 8), "cache8")
  }

  test("LZ77 runs round-trip (dist-1 backward references, overlapping copy)") {
    val img = {
      val px = new Array[Byte](64 * 16 * 3)
      var i = 0
      while (i < 64 * 16) {
        val c = if ((i / 100) % 2 == 0) 5 else (i % 3) // long runs + noise stretches
        px(3 * i) = (c * 50).toByte; px(3 * i + 1) = (c * 60).toByte; px(3 * i + 2) = (c * 70).toByte
        i += 1
      }
      Png.Image(64, 16, 3, px)
    }
    assertCycle(img, EncOpts(lz77 = true), "lz")
    assertCycle(img, EncOpts(lz77 = true, cacheBits = 5), "lz+cache")
    assertCycle(img, EncOpts(lz77 = true, subtractGreen = true), "lz+sg")
  }

  test("meta prefix-code path round-trips") {
    assertCycle(mkImage(44, 27, 3, 11), EncOpts(metaGroup = true), "meta")
    assertCycle(mkImage(20, 20, 3, 12), EncOpts(metaGroup = true, cacheBits = 3), "meta+cache")
  }

  test("two meta groups: per-block group lookup selects the right code set") {
    // checkerboard of 16px blocks: group-1 blocks carry (7, g, 11) pixels
    // coded with zero-bit R/B/A codes — a wrong group index either
    // desyncs the stream or mis-colors, both caught by the exact cycle
    val w = 47; val h = 35
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      val group1 = ((x >> 4) + (y >> 4)) % 2 == 1
      if (group1) { px(3 * i) = 7; px(3 * i + 1) = ((x * 31 + y * 7) & 0xff).toByte; px(3 * i + 2) = 11 }
      else { px(3 * i) = (x * 5).toByte; px(3 * i + 1) = (y * 9).toByte; px(3 * i + 2) = (x ^ y).toByte }
      i += 1
    }
    assertCycle(Png.Image(w, h, 3, px), EncOpts(metaTwoGroups = true), "meta2")
  }

  test("probe: VP8L dims from bit-fields; lossy VP8 probed and decoded (r15)") {
    val webp = Webp.encode(mkImage(129, 67, 3, 13))
    assert(Webp.probe(webp).contains(("vp8l", 129, 67)))
    // minimal lossy VP8 container: frame tag + start code + dims
    val vp8 = {
      val payload = Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a, 80, 0, 60, 0, 0, 0)
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes); out.write(Array[Byte]((4 + 8 + payload.length).toByte, 0, 0, 0))
      out.write("WEBP".getBytes); out.write("VP8 ".getBytes)
      out.write(Array[Byte](payload.length.toByte, 0, 0, 0)); out.write(payload)
      out.toByteArray
    }
    assert(Webp.probe(vp8).contains(("vp8", 80, 60)))
    // lossy VP8 decodes since r15 (Vp8Spec holds the conformance gate);
    // this minimal zero-fill payload is a legal all-default keyframe
    val lossyImg = Webp.decode(vp8)
    assert(lossyImg.exists(i => i.width == 80 && i.height == 60))
    // sniffImage dispatch
    assert(graft.sources.Extractors.sniffImage(webp).contains(
      graft.sources.Extractors.ImageMeta("webp", 129, 67)))
  }

  test("decodeImage routes RIFF/WEBP payloads") {
    val img = mkImage(31, 19, 3, 14)
    val dec = graft.multimodal.Multimodal.decodeImage(Webp.encode(img))
    assert(dec.exists(d => d.width == 31 && d.height == 19))
  }

  test("corrupt input is a named rejection, never junk pixels") {
    val good = Webp.encode(mkImage(24, 18, 3, 15))
    assert(Webp.decode(good.take(30)).isEmpty) // truncated
    val flipped = good.clone()
    flipped(25) = (flipped(25) ^ 0x5a).toByte // corrupt the entropy stream
    // either detected (None) or decodes to SOME image — must not throw
    Webp.decode(flipped)
    assert(Webp.decode("RIFFxxxxWAVEfmt ".getBytes ++ new Array[Byte](32)).isEmpty)
    assert(Webp.decode(null).isEmpty)
  }
}
