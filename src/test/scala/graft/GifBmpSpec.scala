package graft

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import graft.raster.GifBmp

/** GIF/BMP decoder conformance against the JDK's own ImageIO writers
  * (the JpegSpec/WavSpec triangle), plus hand-built streams for the
  * paths ImageIO never writes (interlaced GIF, top-down BMP,
  * palette BMP) using an in-spec clear-per-code LZW encoder.
  */
class GifBmpSpec extends SparkSuite {

  private def rgb(i: Int): Int = ((i * 31) % 256 << 16) | ((i * 57) % 256 << 8) | ((i * 91) % 256)

  test("GIF: ImageIO-written palette images decode pixel-exact") {
    val (w, h) = (37, 23)
    // indexed image: 64 distinct colors → ImageIO's GIF writer keeps them
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, img.getColorModel.getRGB((x + y) % 64))))
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "gif", bos), "ImageIO refused gif write")
    val dec = GifBmp.decodeGif(bos.toByteArray).getOrElse(fail("gif decode failed"))
    assert(dec.width == w && dec.height == h && dec.channels == 3)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val exp = img.getRGB(x, y)
        val o = 3 * (y * w + x)
        val got = ((dec.pixels(o) & 0xff) << 16) | ((dec.pixels(o + 1) & 0xff) << 8) | (dec.pixels(o + 2) & 0xff)
        assert(got == (exp & 0xffffff), s"($x,$y): $got vs ${exp & 0xffffff}")
      }
    }
  }

  /** Minimal valid GIF with a clear-per-code LZW stream. */
  private def handGif(w: Int, h: Int, idx: Array[Byte], interlaced: Boolean): Array[Byte] = {
    val out = collection.mutable.ArrayBuffer.empty[Byte]
    def u16(v: Int): Unit = { out += v.toByte; out += (v >> 8).toByte }
    out ++= "GIF89a".getBytes
    u16(w); u16(h); out += 0xF7.toByte; out += 0; out += 0 // global palette 256
    (0 until 256).foreach { i => out += ((i * 31) % 256).toByte; out += ((i * 57) % 256).toByte; out += ((i * 91) % 256).toByte }
    out += 0x2C; u16(0); u16(0); u16(w); u16(h); out += (if (interlaced) 0x40 else 0).toByte
    out += 8 // LZW min code size
    // bit stream, little-endian packing, 9-bit codes, CLEAR before every pixel code
    var acc = 0L; var n = 0
    val body = collection.mutable.ArrayBuffer.empty[Byte]
    def put(code: Int): Unit = {
      acc |= (code.toLong & 0x1ff) << n; n += 9
      while (n >= 8) { body += (acc & 0xff).toByte; acc >>>= 8; n -= 8 }
    }
    idx.foreach { i => put(256); put(i & 0xff) }
    put(257) // EOI
    if (n > 0) body += (acc & 0xff).toByte
    var at = 0
    while (at < body.length) {
      val len = math.min(255, body.length - at)
      out += len.toByte
      out ++= body.slice(at, at + len)
      at += len
    }
    out += 0; out += 0x3B
    out.toArray
  }

  test("GIF: hand-built streams — sequential and interlaced rows land correctly") {
    val (w, h) = (10, 9)
    val idx = Array.tabulate(w * h)(i => (i % 200).toByte)
    val dec = GifBmp.decodeGif(handGif(w, h, idx, interlaced = false)).getOrElse(fail("plain decode"))
    (0 until w * h).foreach { i =>
      assert((dec.pixels(3 * i) & 0xff) == ((idx(i) & 0xff) * 31) % 256, s"px $i")
    }
    val di = GifBmp.decodeGif(handGif(w, h, idx, interlaced = true)).getOrElse(fail("interlaced decode"))
    // interlace order for h=9: passes rows 0,8 | 4 | 2,6 | 1,3,5,7
    val order = Seq(0, 8, 4, 2, 6, 1, 3, 5, 7)
    order.zipWithIndex.foreach { case (destRow, srcRow) =>
      (0 until w).foreach { x =>
        val exp = ((idx(srcRow * w + x) & 0xff) * 31) % 256
        assert((di.pixels(3 * (destRow * w + x)) & 0xff) == exp, s"row $destRow x $x")
      }
    }
  }

  test("BMP: ImageIO-written 24-bit files decode pixel-exact; top-down and palette hand-builds too") {
    val (w, h) = (21, 13)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb(y * w + x))))
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "bmp", bos))
    val dec = GifBmp.decodeBmp(bos.toByteArray).getOrElse(fail("bmp decode failed"))
    assert(dec.width == w && dec.height == h)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val o = 3 * (y * w + x)
        val got = ((dec.pixels(o) & 0xff) << 16) | ((dec.pixels(o + 1) & 0xff) << 8) | (dec.pixels(o + 2) & 0xff)
        assert(got == rgb(y * w + x), s"($x,$y)")
      }
    }

    // hand-built 8-bit palette, top-down (negative height)
    def handBmp(topDown: Boolean): Array[Byte] = {
      val w2 = 5; val h2 = 4
      val row = (w2 + 3) & ~3
      val out = collection.mutable.ArrayBuffer.empty[Byte]
      def u16(v: Int): Unit = { out += v.toByte; out += (v >> 8).toByte }
      def u32(v: Int): Unit = (0 until 4).foreach(k => out += (v >> (8 * k)).toByte)
      out += 'B'; out += 'M'; u32(14 + 40 + 1024 + row * h2); u32(0); u32(14 + 40 + 1024)
      u32(40); u32(w2); u32(if (topDown) -h2 else h2); u16(1); u16(8); u32(0); u32(row * h2)
      u32(2835); u32(2835); u32(256); u32(0)
      (0 until 256).foreach { i => out += ((i * 91) % 256).toByte; out += ((i * 57) % 256).toByte; out += ((i * 31) % 256).toByte; out += 0 }
      val rows = (0 until h2).map(y => Array.tabulate(row)(x => if (x < w2) (y * w2 + x).toByte else 0.toByte))
      (if (topDown) rows else rows.reverse).foreach(out ++= _)
      out.toArray
    }
    Seq(true, false).foreach { td =>
      val d = GifBmp.decodeBmp(handBmp(td)).getOrElse(fail(s"palette bmp topDown=$td"))
      (0 until 4).foreach(y => (0 until 5).foreach { x =>
        val i = y * 5 + x
        assert((d.pixels(3 * (y * 5 + x)) & 0xff) == (i * 31) % 256, s"td=$td ($x,$y)")
      })
    }
  }

  test("animated GIF: frames composite onto the canvas; disposal 2 restores the background") {
    // 8×4 screen, bg index 0; frame 1 full-screen; frame 2 a 2×2 patch at (3,1) with disposal-2 set on frame 1...
    // build: header + GCE(disposal 2) + frame1 + GCE + frame2
    val out = collection.mutable.ArrayBuffer.empty[Byte]
    def u16v(v: Int): Unit = { out += v.toByte; out += (v >> 8).toByte }
    out ++= "GIF89a".getBytes
    u16v(8); u16v(4); out += 0xF7.toByte; out += 0; out += 0
    (0 until 256).foreach { i => out += ((i * 31) % 256).toByte; out += ((i * 57) % 256).toByte; out += ((i * 91) % 256).toByte }
    def gce(disposal: Int): Unit = {
      out += 0x21; out += 0xF9.toByte; out += 4; out += (disposal << 2).toByte
      u16v(10); out += 0; out += 0
    }
    def img(ix: Int, iy: Int, iw: Int, ih: Int, idx: Array[Byte]): Unit = {
      out += 0x2C; u16v(ix); u16v(iy); u16v(iw); u16v(ih); out += 0
      out += 8
      var acc = 0L; var n = 0
      val body = collection.mutable.ArrayBuffer.empty[Byte]
      def put(code: Int): Unit = {
        acc |= (code.toLong & 0x1ff) << n; n += 9
        while (n >= 8) { body += (acc & 0xff).toByte; acc >>>= 8; n -= 8 }
      }
      idx.foreach { i => put(256); put(i & 0xff) }
      put(257)
      if (n > 0) body += (acc & 0xff).toByte
      var at = 0
      while (at < body.length) {
        val len = math.min(255, body.length - at)
        out += len.toByte; out ++= body.slice(at, at + len); at += len
      }
      out += 0
    }
    gce(2) // frame 1 disposes to background before frame 2 draws
    img(0, 0, 8, 4, Array.fill[Byte](32)(5))
    gce(0)
    img(3, 1, 2, 2, Array[Byte](9, 9, 9, 9))
    out += 0x3B
    val frames = GifBmp.gifFrames(out.toArray)
    assert(frames.length == 2, s"frames ${frames.length}")
    assert(frames.head.width == 8 && frames.head.height == 4)
    def red(f: graft.raster.Png.Image, x: Int, y: Int): Int = f.pixels(3 * (y * 8 + x)) & 0xff
    assert(red(frames(0), 0, 0) == (5 * 31) % 256)
    // frame 2: canvas restored to bg color (index 0 → red 0) outside the patch, patch is color 9
    assert(red(frames(1), 0, 0) == 0, "disposal 2 should restore background")
    assert(red(frames(1), 3, 1) == (9 * 31) % 256 && red(frames(1), 4, 2) == (9 * 31) % 256)
  }

  test("GIF encoder: real-dictionary LZW round-trips through our decoder AND ImageIO") {
    val (w, h) = (83, 47) // awkward size, > one sub-block of LZW data
    val px = Array.tabulate(w * h)(i => ((i * 7 + i / w * 13) % 256).toByte)
    val gif = GifBmp.encodeGifGray(w, h, px)
    // our decoder round-trips exactly (gray palette: r==g==b==index)
    val dec = GifBmp.decodeGif(gif).getOrElse(fail("own decode failed"))
    assert(dec.width == w && dec.height == h)
    (0 until w * h).foreach(i => assert((dec.pixels(3 * i) & 0xff) == (px(i) & 0xff), s"px $i"))
    // ImageIO (independent implementation) reads our file identically
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert(img != null, "ImageIO rejected our GIF")
    assert(img.getWidth == w && img.getHeight == h)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val v = px(y * w + x) & 0xff
        assert((img.getRGB(x, y) & 0xff) == v, s"ImageIO ($x,$y)")
      }
    }
    // small palette (2 colors → 2-bit table, min code size clamp)
    val bw = Array.tabulate(64)(i => (i % 2).toByte)
    val tiny = GifBmp.encodeGif(8, 8, Array(0x000000, 0xFFFFFF), bw)
    val tdec = GifBmp.decodeGif(tiny).get
    (0 until 64).foreach(i => assert((tdec.pixels(3 * i) & 0xff) == (if (bw(i) == 1) 255 else 0)))
    val timg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(tiny))
    (0 until 8).foreach(y => (0 until 8).foreach(x =>
      assert((timg.getRGB(x, y) & 0xff) == (if (bw(y * 8 + x) == 1) 255 else 0))))
    // dictionary-reset path: enough distinct phrases to fill 4096 codes
    var s = 1L
    val big = Array.fill(120000) { s = s * 1103515245 + 12345; ((s >> 16) & 0xff).toByte }
    val bigGif = GifBmp.encodeGifGray(400, 300, big)
    assert(GifBmp.decodeGif(bigGif).get.pixels.grouped(3).map(_.head).toSeq == big.toSeq)
  }

  test("decodeImage routes GIF and BMP; refusals on garbage") {
    val gif = handGif(6, 6, Array.tabulate(36)(_.toByte), interlaced = false)
    assert(graft.multimodal.Multimodal.decodeImage(gif).exists(_.width == 6))
    assert(GifBmp.decodeGif("GIF89a".getBytes ++ Array.fill[Byte](50)(0x7f)).isEmpty)
    assert(GifBmp.decodeBmp("BMgarbagegarbagegarbage".getBytes).isEmpty)
    assert(GifBmp.decodeGif(Array[Byte](1, 2, 3)).isEmpty && GifBmp.decodeBmp(Array[Byte](1)).isEmpty)
  }
}
