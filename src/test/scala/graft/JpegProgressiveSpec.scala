package graft

import java.awt.image.BufferedImage
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import graft.raster.Jpeg

/** Progressive (SOF2) JPEG conformance: the JDK's own writer emits
  * real multi-scan progressive streams (successive approximation +
  * spectral selection scan scripts), so our decoder is checked
  * against an independent encoder AND against ImageIO's own decode of
  * the same bytes (IDCT rounding tolerance only).
  */
class JpegProgressiveSpec extends SparkSuite {

  private def writeProgressive(img: BufferedImage, quality: Float): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  private def grayImage(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val v = (128 + 90 * math.sin(x * 0.2) * math.cos(y * 0.15)).toInt
        img.getRaster.setSample(x, y, 0, math.max(0, math.min(255, v)))
      }
    }
    img
  }

  private def colorImage(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val r = (128 + 100 * math.sin(x * 0.11)).toInt
        val g = (128 + 100 * math.cos(y * 0.13)).toInt
        val b = (x * 3 + y * 2) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
    }
    img
  }

  test("JDK progressive streams carry SOF2 and decode through OUR progressive path, gray and color") {
    for ((mk, w, h) <- Seq(
        (() => grayImage(120, 80), 120, 80),
        (() => colorImage(96, 64), 96, 64),
        (() => colorImage(67, 45), 67, 45))) { // non-multiple-of-8/16
      val srcImg = mk()
      val bytes = writeProgressive(srcImg, 0.85f)
      // really progressive: SOF2 marker present, SOF0/1 absent (walk
      // the header markers directly — entropy data starts at first SOS)
      val markers = {
        val out = collection.mutable.ArrayBuffer.empty[Int]
        var i = 2
        var stop = false
        while (!stop && i + 4 <= bytes.length) {
          val m = bytes(i + 1) & 0xFF
          out += m
          if (m == 0xDA) stop = true
          else i += 2 + (((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF))
        }
        out.toSeq
      }
      assert(markers.contains(0xC2), s"JDK did not write SOF2: $markers")
      assert(!markers.contains(0xC0) && !markers.contains(0xC1))
      val ours = Jpeg.decode(bytes).getOrElse(fail(s"progressive decode failed ($w x $h)"))
      assert(ours.width == w && ours.height == h)
      // reference: the JDK's own decode of the same stream
      val jdk = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null && jdk.getWidth == w && jdk.getHeight == h)
      var maxDiff = 0
      var sumSq = 0.0
      var nSamples = 0
      val grayRef = jdk.getRaster.getNumBands == 1
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val o = (y * w + x) * ours.channels
          if (grayRef) {
            // raw code values — getRGB would apply the gray→sRGB gamma
            val d = jdk.getRaster.getSample(x, y, 0) - (ours.pixels(o) & 0xff)
            maxDiff = math.max(maxDiff, math.abs(d))
            sumSq += d.toDouble * d
            nSamples += 1
          } else {
            val ref = jdk.getRGB(x, y)
            val (orr, og, ob) =
              if (ours.channels >= 3) (ours.pixels(o) & 0xff, ours.pixels(o + 1) & 0xff, ours.pixels(o + 2) & 0xff)
              else { val v = ours.pixels(o) & 0xff; (v, v, v) }
            Seq(((ref >> 16) & 0xff) - orr, ((ref >> 8) & 0xff) - og, (ref & 0xff) - ob).foreach { d =>
              maxDiff = math.max(maxDiff, math.abs(d))
              sumSq += d.toDouble * d
              nSamples += 1
            }
          }
        }
      }
      val rmse = math.sqrt(sumSq / nSamples)
      // gray: only IDCT rounding differs → tight bound. color: the
      // chroma upsampling filter is implementation-defined (T.81) —
      // ours replicates, the JDK interpolates — so the bound is wider
      // there and the vs-source PSNR below guards actual decode bugs.
      assert(rmse < (if (grayRef) 4.0 else 10.0), s"($w x $h) rmse $rmse vs JDK decode")
      // max-diff only binds for gray: at sharp chroma edges (the blue
      // sawtooth fixture) replication vs interpolation legitimately
      // diverges by ~100 on isolated pixels
      if (grayRef) assert(maxDiff <= 32, s"($w x $h) max pixel diff $maxDiff vs JDK decode")
      // a coefficient-decode bug would wreck this; the upsampling
      // filter difference cannot (smooth source, 0.85 quality)
      var srcSq = 0.0
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val o = (y * w + x) * ours.channels
          if (grayRef) {
            val d = srcImg.getRaster.getSample(x, y, 0) - (ours.pixels(o) & 0xff)
            srcSq += d.toDouble * d
          } else {
            val s = srcImg.getRGB(x, y)
            Seq(((s >> 16) & 0xff) - (ours.pixels(o) & 0xff),
              ((s >> 8) & 0xff) - (ours.pixels(o + 1) & 0xff),
              (s & 0xff) - (ours.pixels(o + 2) & 0xff)).foreach(d => srcSq += d.toDouble * d)
          }
        }
      }
      val srcPsnr = 10 * math.log10(255.0 * 255.0 / math.max(srcSq / nSamples, 1e-9))
      assert(srcPsnr > 26, s"($w x $h) PSNR vs source $srcPsnr dB")
    }
  }

  test("progressive decode is close to the source image (end-to-end PSNR)") {
    val w = 80; val h = 56
    val img = grayImage(w, h)
    val bytes = writeProgressive(img, 0.9f)
    val ours = Jpeg.decode(bytes).get
    var sumSq = 0.0
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val src = img.getRaster.getSample(x, y, 0)
        val got = ours.pixels((y * w + x) * ours.channels) & 0xff
        val d = (src - got).toDouble
        sumSq += d * d
      }
    }
    val psnr = 10 * math.log10(255.0 * 255.0 / math.max(sumSq / (w * h), 1e-9))
    assert(psnr > 30, s"PSNR $psnr dB vs source")
  }

  test("refusals: truncated progressive streams and garbage return None") {
    val bytes = writeProgressive(grayImage(64, 64), 0.8f)
    assert(Jpeg.decode(bytes.take(bytes.length / 3)).isEmpty)
    assert(Jpeg.decodeProgressive("ÿØgarbage".getBytes("ISO-8859-1")).isEmpty)
    // baseline streams do NOT take the progressive path (None there), but decode fine overall
    val base = Jpeg.encode(32, 32, 1, Array.tabulate(1024)(_.toByte), quality = 85)
    assert(Jpeg.decodeProgressive(base).isEmpty)
    assert(Jpeg.decode(base).isDefined)
  }
}
