package graft

import java.awt.image.BufferedImage

import graft.raster.Jpeg

/** JPEG codec conformance. Unlike the LAZ entropy codecs, REAL
  * independent fixtures exist here: the JDK's ImageIO JPEG plugin.
  * The triangle proven:
  *
  *  1. encode∘decode (ours) ≈ source (PSNR bound — lossy codec);
  *  2. ImageIO decodes OUR files to the same pixels our decoder
  *     produces (± small IDCT/rounding differences) — our bitstream
  *     is valid JPEG and our IDCT agrees with an independent one;
  *  3. our decoder reads ImageIO-WRITTEN files: gray exactly
  *     (±rounding), default-subsampled color within the resampling
  *     tolerance (T.81 leaves the chroma upsampling filter
  *     implementation-defined).
  *
  * Restart markers are validated both ways: our DRI/RSTn stream
  * decodes identically through ImageIO and through our own reader.
  */
class JpegSpec extends SparkSuite {

  private def gradient(w: Int, h: Int, channels: Int, seed: Int = 3): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val px = new Array[Byte](w * h * channels)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until channels) {
      val base = c match {
        case 0 => (x * 255) / math.max(1, w - 1)
        case 1 => (y * 255) / math.max(1, h - 1)
        case _ => ((x + y) * 255) / math.max(1, w + h - 2)
      }
      // smooth ramp + mild texture: realistic compressibility
      val v = math.max(0, math.min(255, base + rnd.nextInt(9) - 4))
      px((y * w + x) * channels + c) = v.toByte
    }
    px
  }

  private def imageIoDecode(bytes: Array[Byte]): BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  private def imageIoEncode(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    bos.toByteArray
  }

  private def psnr(a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length)
    val mse = a.zip(b).map { case (x, y) => val d = (x - y).toDouble; d * d }.sum / a.length
    if (mse == 0) 99.0 else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  test("encode then decode is near-identity (PSNR): gray and color, non-multiple-of-8 sizes") {
    for ((w, h, ch) <- Seq((64, 64, 1), (100, 70, 1), (64, 64, 3), (130, 50, 3))) {
      val src = gradient(w, h, ch, seed = w + ch)
      val jpg = Jpeg.encode(w, h, ch, src, quality = 92)
      val dec = Jpeg.decode(jpg).getOrElse(fail(s"decode failed $w x $h ch=$ch"))
      assert(dec.width == w && dec.height == h && dec.channels == ch)
      val p = psnr(src.map(_ & 0xFF), dec.pixels.map(_ & 0xFF))
      assert(p > 35.0, s"psnr $p for $w x $h ch=$ch")
    }
  }

  test("ImageIO decodes our bitstream to our own decoder's pixels (independent IDCT agreement)") {
    for (ch <- Seq(1, 3)) {
      val (w, h) = (96, 80)
      val src = gradient(w, h, ch, seed = 11 + ch)
      val jpg = Jpeg.encode(w, h, ch, src, quality = 85)
      val ours = Jpeg.decode(jpg).get
      val theirs = imageIoDecode(jpg)
      assert(theirs.getWidth == w && theirs.getHeight == h)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        // raw raster samples — getRGB would run gray through an sRGB
        // gamma conversion and compare the wrong thing
        val t =
          if (ch == 1) Seq(theirs.getRaster.getSample(x, y, 0))
          else { val rgb = theirs.getRGB(x, y); Seq((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF) }
        val o = (0 until ch).map(c => ours.pixels((y * w + x) * ch + c) & 0xFF)
        t.zip(o).foreach { case (a, b) => maxDiff = math.max(maxDiff, math.abs(a - b)) }
      }
      assert(maxDiff <= 3, s"ch=$ch max per-sample diff $maxDiff vs ImageIO")
    }
  }

  test("our decoder reads ImageIO-written JPEGs: gray within rounding, default color within resampling tolerance") {
    val (w, h) = (120, 90)
    // gray: no chroma path, strict agreement
    val gSrc = gradient(w, h, 1, seed = 5)
    val gImg = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) gImg.getRaster.setSample(x, y, 0, gSrc(y * w + x) & 0xFF)
    val gJpg = imageIoEncode(gImg)
    val gOurs = Jpeg.decode(gJpg).getOrElse(fail("gray decode failed"))
    assert(gOurs.channels == 1 && gOurs.width == w)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val a = gOurs.pixels(y * w + x) & 0xFF
      val b = imageIoDecode(gJpg).getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(a - b))
    }
    assert(maxDiff <= 2, s"gray max diff $maxDiff")

    // color: ImageIO's default writer subsamples chroma; upsampling
    // filters differ, so the bound is PSNR + mean, not per-sample
    val cSrc = gradient(w, h, 3, seed = 7)
    val cImg = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      cImg.setRGB(x, y, ((cSrc(o) & 0xFF) << 16) | ((cSrc(o + 1) & 0xFF) << 8) | (cSrc(o + 2) & 0xFF))
    }
    val cJpg = imageIoEncode(cImg)
    val cOurs = Jpeg.decode(cJpg).getOrElse(fail("color decode failed"))
    val cTheirs = imageIoDecode(cJpg)
    val a = new Array[Int](w * h * 3)
    val b = new Array[Int](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = cTheirs.getRGB(x, y)
      val o = (y * w + x) * 3
      a(o) = (rgb >> 16) & 0xFF; a(o + 1) = (rgb >> 8) & 0xFF; a(o + 2) = rgb & 0xFF
      b(o) = cOurs.pixels(o) & 0xFF; b(o + 1) = cOurs.pixels(o + 1) & 0xFF; b(o + 2) = cOurs.pixels(o + 2) & 0xFF
    }
    val p = psnr(a, b)
    assert(p > 30.0, s"color psnr vs ImageIO $p")
  }

  test("restart markers: our DRI/RSTn stream decodes identically through ImageIO and our reader") {
    val (w, h) = (128, 64) // 16x8 = 128 MCUs at 4:4:4
    val src = gradient(w, h, 3, seed = 13)
    val jpg = Jpeg.encode(w, h, 3, src, quality = 88, restartInterval = 5)
    // DRI segment present
    assert(jpg.sliding(2).exists(s => (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == 0xDD))
    val ours = Jpeg.decode(jpg).getOrElse(fail("restart decode failed"))
    val plain = Jpeg.decode(Jpeg.encode(w, h, 3, src, quality = 88)).get
    assert(ours.pixels.toSeq == plain.pixels.toSeq, "restarts must not change decoded pixels")
    val theirs = imageIoDecode(jpg)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = theirs.getRGB(x, y)
      val o = (y * w + x) * 3
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xFF) - (ours.pixels(o) & 0xFF)))
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xFF) - (ours.pixels(o + 1) & 0xFF)))
      maxDiff = math.max(maxDiff, math.abs((rgb & 0xFF) - (ours.pixels(o + 2) & 0xFF)))
    }
    assert(maxDiff <= 3, s"restart stream max diff vs ImageIO $maxDiff")
  }

  test("DRI segments decode independently: segmentwise == serial, and corrupting one segment disturbs only its MCUs") {
    val (w, h) = (160, 48) // 20x6 = 120 MCUs at 4:4:4
    val src = gradient(w, h, 1, seed = 29)
    val dri = 10
    val jpg = Jpeg.encode(w, h, 1, src, quality = 90, restartInterval = dri)
    val segs = Jpeg.segmentTable(jpg)
    assert(segs.size == 12 && segs.map(_._2) == (0 until 12).map(_ * dri))
    val serial = Jpeg.decode(jpg).get
    val segwise = Jpeg.decodeSegmentwise(jpg).get
    assert(segwise.pixels.toSeq == serial.pixels.toSeq, "segmentwise decode must equal the serial decode")
    // corrupt the bytes of segment 5 only: every MCU outside segment 5
    // must still decode byte-identically — the independence a
    // partition-parallel decoder relies on
    val bad = jpg.clone()
    val (s5, _) = segs(5)
    val (s6, _) = segs(6)
    var i = s5
    while (i < s6 - 2) { bad(i) = (bad(i) ^ 0x2A).toByte; if ((bad(i) & 0xFF) == 0xFF) bad(i) = 0x55.toByte; i += 1 }
    val corrupted = Jpeg.decodeSegmentwise(bad).get
    // segment k covers MCU columns [k*dri % 20 ...]; at 20 MCUs per row,
    // segment 5 is MCUs 50..59 → row 2 (y 16..23), columns 80..159
    for (y <- 0 until h; x <- 0 until w) {
      val inSeg5 = y >= 16 && y < 24 && x >= 80
      if (!inSeg5)
        assert(corrupted.pixels(y * w + x) == serial.pixels(y * w + x), s"pixel ($x,$y) outside segment 5 changed")
    }
    // and the corruption did land somewhere inside segment 5
    assert((0 until h).exists(y => (0 until w).exists(x =>
      y >= 16 && y < 24 && x >= 80 && corrupted.pixels(y * w + x) != serial.pixels(y * w + x)
    )))
  }

  test("Spark pixelsTable: segment-parallel decode equals the serial decode (color DRI, gray DRI, no-DRI)") {
    val dir = java.nio.file.Files.createTempDirectory("jpegpt").toFile
    try {
      for ((name, ch, dri) <- Seq(("c.jpg", 3, 7), ("g.jpg", 1, 5), ("p.jpg", 3, 0))) {
        val (w, h) = (112, 80)
        val src = gradient(w, h, ch, seed = ch * 10 + dri)
        val jpg = Jpeg.encode(w, h, ch, src, quality = 88, restartInterval = dri)
        val f = new java.io.File(dir, name)
        java.nio.file.Files.write(f.toPath, jpg)
        val serial = Jpeg.decode(jpg).get
        val rows = Jpeg.pixelsTable(spark, f.getPath).collect()
        assert(rows.length == w * h, s"$name row count")
        rows.foreach { r =>
          val (x, y) = (r.getInt(0), r.getInt(1))
          val o = (y * w + x) * ch
          if (ch == 1) assert(r.getInt(2) == (serial.pixels(o) & 0xFF), s"$name ($x,$y)")
          else
            assert(
              r.getInt(2) == (serial.pixels(o) & 0xFF) && r.getInt(3) == (serial.pixels(o + 1) & 0xFF) &&
                r.getInt(4) == (serial.pixels(o + 2) & 0xFF),
              s"$name ($x,$y)"
            )
        }
      }
    } finally {
      Option(dir.listFiles()).foreach(_.foreach(_.delete())); dir.delete()
    }
  }

  test("MJPEG: concatenated frames split and decode; sampling picks the slice-math frame set") {
    val (w, h) = (48, 32)
    val frames = (0 until 7).map { i =>
      val px = Array.tabulate(w * h)(p => ((p + i * 40) % 256).toByte)
      Jpeg.encode(w, h, 1, px, quality = 90)
    }
    val stream = frames.reduce(_ ++ _)
    val decoded = graft.multimodal.Multimodal.mjpegFrames(stream)
    assert(decoded.size == 7)
    decoded.zipWithIndex.foreach { case (f, i) =>
      assert(f.width == w && f.height == h && f.channels == 1)
      // brightness tracks the frame index (mean of (p + 40i) mod 256 drifts)
      val direct = Jpeg.decode(frames(i)).get
      assert(f.pixels.toSeq == direct.pixels.toSeq, s"frame $i differs from standalone decode")
    }
    val sampled = graft.multimodal.Multimodal.sampleMjpegFrames(stream, 3)
    assert(sampled.map(_._1) == Seq(0, 1, 2))
    assert(sampled.map(t => (t._2, t._3)).forall(_ == ((w, h))))
    // slice math: frames 7*0/3=0, 7*1/3=2, 7*2/3=4
    val means = Seq(0, 2, 4).map { i =>
      val d = Jpeg.decode(frames(i)).get
      d.pixels.map(_ & 0xff).sum.toDouble / d.pixels.length
    }
    sampled.map(_._4).zip(means).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("non-JPEG and progressive payloads are refused with None, not an exception") {
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.decode("not a jpeg".getBytes).isEmpty)
    // a PNG payload is refused
    val png = graft.raster.Png.encodeGray(4, 4, new Array[Byte](16))
    assert(Jpeg.decode(png).isEmpty)
  }
}
