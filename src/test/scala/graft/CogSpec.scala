package graft

import graft.raster.Cog

/** COG writer verification: the q_cog oracle pins the tile pixel
  * planes; this spec proves the TIFF/COG envelope — IFD structure,
  * overview chain, head-of-file data layout — and round-trips the
  * bytes through the JDK's own TIFF ImageReader (an independent
  * implementation of the format).
  */
class CogSpec extends SparkSuite {

  private def readTiff(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    val rd = javax.imageio.ImageIO.getImageReadersByFormatName("tiff").next()
    rd.setInput(in)
    val n = rd.getNumImages(true)
    (0 until n).map(rd.read)
  }

  test("encode: IFD chain, tile math, geokeys, and COG head-of-file layout") {
    val w = 400; val h = 300
    val px = Array.tabulate(w * h)(i => ((i * 31) % 256).toByte)
    val bytes = Cog.encode(w, h, px, 256, Some(Cog.GeoRef(-180.0, 90.0, 0.05, 4326)))
    val ifds = Cog.parseIfds(bytes)
    assert(ifds.length === 2, "400x300 at tile 256 → one overview level (200x150)")
    val main = ifds.head
    assert(main(256) === Seq(400L) && main(257) === Seq(300L))
    assert(main(322) === Seq(256L) && main(323) === Seq(256L))
    assert(main(254) === Seq(0L))
    assert(main(324).length === 4 && main(325) === Seq.fill(4)(65536L)) // 2x2 tile grid
    assert(main(259) === Seq(1L) && main(258) === Seq(8L))
    // geokeys: version header + 3 keys, EPSG in the geographic slot
    val keys = main(34735)
    assert(keys.take(4) === Seq(1L, 1L, 0L, 3L))
    assert(keys.containsSlice(Seq(2048L, 0L, 1L, 4326L)))
    val ovr = ifds(1)
    assert(ovr(256) === Seq(200L) && ovr(257) === Seq(150L))
    assert(ovr(254) === Seq(1L), "overview must carry the reduced-resolution flag")
    assert(ovr.get(34735).isEmpty, "geo tags belong to the main IFD only")
    // COG layout: every IFD sits before any tile payload, and the
    // overview's payload comes before the main image's (range readers
    // render low zooms from the file head)
    assert(ovr(324).head < main(324).min, "overview tile data must precede full-res data")
    assert(main(324).min > 8L)
  }

  test("JDK TIFF reader round-trips pixels and the overview chain") {
    val w = 300; val h = 200
    val px = Array.tabulate(w * h)(i => (((i % w) + 2 * (i / w)) % 256).toByte)
    val imgs = readTiff(Cog.encode(w, h, px, 256, None))
    assert(imgs.length === 2)
    assert((imgs.head.getWidth, imgs.head.getHeight) === ((300, 200)))
    assert((imgs(1).getWidth, imgs(1).getHeight) === ((150, 100)))
    // full-res pixels survive exactly
    val raster = imgs.head.getRaster
    for (y <- 0 until h by 17; x <- 0 until w by 13)
      assert(raster.getSample(x, y, 0) === (px(y * w + x) & 0xff), s"pixel ($x,$y)")
    // overview = nearest top-left sample
    val ov = imgs(1).getRaster
    for (y <- 0 until 100 by 11; x <- 0 until 150 by 7)
      assert(ov.getSample(x, y, 0) === (px(2 * y * w + 2 * x) & 0xff), s"overview ($x,$y)")
  }

  test("native read face: decodeLevel + windowed pixelsTable return exactly the source (and the overview)") {
    val w = 300; val h = 180
    val px = Array.tabulate(w * h)(i => ((i * 31 + (i / w) * 7) % 251).toByte)
    val cog = Cog.encode(w, h, px, 256)
    // level 0: identity
    val (w0, h0, l0) = Cog.decodeLevel(cog, 0)
    assert(w0 == w && h0 == h)
    assert(l0.toSeq == px.map(_ & 0xFF).toSeq)
    // level 1: the writer's nearest top-left sample
    val (w1, h1, l1) = Cog.decodeLevel(cog, 1)
    assert(w1 == 150 && h1 == 90)
    for (y <- 0 until h1; x <- 0 until w1)
      assert(l1(y * w1 + x) == (px(math.min(2 * y, h - 1) * w + math.min(2 * x, w - 1)) & 0xFF), s"l1($x,$y)")
    // Spark windowed read: plans from the head, reads only hit tiles
    val dir = java.nio.file.Files.createTempDirectory("cogread").toFile
    val f = new java.io.File(dir, "r.tif")
    java.nio.file.Files.write(f.toPath, cog)
    try {
      val win = (37, 20, 290, 170)
      val rows = Cog.pixelsTable(spark, f.getPath, 0, Some(win)).collect()
      assert(rows.length == (win._3 - win._1) * (win._4 - win._2))
      rows.foreach { r =>
        val (x, y, v) = (r.getInt(0), r.getInt(1), r.getInt(2))
        assert(x >= win._1 && x < win._3 && y >= win._2 && y < win._4)
        assert(v == (px(y * w + x) & 0xFF), s"pixel ($x,$y)")
      }
      // a small window hits ONE tile of the 2x1 grid
      val plan = Cog.tilePlan(cog)
      assert(plan.head.tiles.size == 2, "300x180 @256 is a 2x1 tile grid")
      val one = Cog.pixelsTable(spark, f.getPath, 0, Some((0, 0, 10, 10))).collect()
      assert(one.length == 100 && one.forall(r => r.getInt(2) == (px(r.getInt(1) * w + r.getInt(0)) & 0xFF)))
    } finally { f.delete(); dir.delete() }
  }

  test("DEFLATE tiles (compression 8): smaller artifact, exact decode, and the JDK TIFF reader agrees") {
    val w = 300; val h = 180
    // compressible content: smooth ramp
    val px = Array.tabulate(w * h)(i => (((i % w) / 4 + (i / w) / 4) % 256).toByte)
    val plain = Cog.encode(w, h, px, 256)
    val packed = Cog.encode(w, h, px, 256, compression = 8)
    assert(packed.length * 3 < plain.length, s"deflate ${packed.length} vs plain ${plain.length}")
    assert(Cog.tilePlan(packed).forall(_.compression == 8))
    val (w0, h0, l0) = Cog.decodeLevel(packed, 0)
    assert(w0 == w && h0 == h && l0.toSeq == px.map(_ & 0xFF).toSeq)
    val (w1, h1, l1) = Cog.decodeLevel(packed, 1)
    assert(w1 == 150 && h1 == 90)
    for (y <- 0 until h1; x <- 0 until w1)
      assert(l1(y * w1 + x) == (px(math.min(2 * y, h - 1) * w + math.min(2 * x, w - 1)) & 0xFF))
    // independent implementation: the JDK TIFF reader inflates it too
    val imgs = readTiff(packed)
    assert(imgs.head.getWidth == w && imgs.head.getHeight == h)
    for (y <- 0 until h by 7; x <- 0 until w by 7)
      assert(imgs.head.getRaster.getSample(x, y, 0) == (px(y * w + x) & 0xFF), s"jdk pixel ($x,$y)")
    // windowed Spark read path inflates per hit tile
    val dir = java.nio.file.Files.createTempDirectory("cogdef").toFile
    val f = new java.io.File(dir, "d.tif")
    java.nio.file.Files.write(f.toPath, packed)
    try {
      val rows = Cog.pixelsTable(spark, f.getPath, 0, Some((40, 20, 80, 50))).collect()
      assert(rows.length == 40 * 30)
      rows.foreach(r => assert(r.getInt(2) == (px(r.getInt(1) * w + r.getInt(0)) & 0xFF)))
    } finally { f.delete(); dir.delete() }
  }

  test("EXTERNAL TIFFs read: JDK-written strip layouts, LZW and Deflate, hand-built predictor-2") {
    val (w, h) = (200, 300)
    val px = Array.tabulate(w * h)(i => (((i % w) / 3 + (i / w) / 5) % 251).toByte)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, px(y * w + x) & 0xFF)
    def jdkTiff(compression: Option[String]): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val param = writer.getDefaultWriteParam
      compression.foreach { c =>
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(c)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.flush(); writer.dispose()
      bos.toByteArray
    }
    for (c <- Seq(None, Some("LZW"), Some("Deflate"))) {
      val tiff = jdkTiff(c)
      val plan = Cog.tilePlan(tiff)
      assert(plan.head.tiles.size > 1, s"$c: want a multi-strip fixture (got ${plan.head.tiles.size})")
      assert(plan.head.tileW == w, s"$c: strips are full-width tiles")
      val (w0, h0, l0) = Cog.decodeLevel(tiff, 0)
      assert(w0 == w && h0 == h, s"$c dims")
      assert(l0.toSeq == px.map(_ & 0xFF).toSeq, s"$c: decode differs from source")
    }
    // predictor 2 (horizontal differencing) + deflate, hand-assembled
    // strip TIFF — the combination real GeoTIFF writers emit
    {
      val rps = 64
      val strips = (0 until (h + rps - 1) / rps).map { s =>
        val rows = math.min(rps, h - s * rps)
        val diff = new Array[Byte](rows * w)
        for (r <- 0 until rows; x <- 0 until w) {
          val v = px((s * rps + r) * w + x) & 0xFF
          val left = if (x == 0) 0 else px((s * rps + r) * w + x - 1) & 0xFF
          diff(r * w + x) = (v - left).toByte
        }
        val d = new java.util.zip.Deflater(); d.setInput(diff); d.finish()
        val buf = new Array[Byte](diff.length + 64)
        var n = 0
        while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
        d.end()
        java.util.Arrays.copyOf(buf, n)
      }
      val out = new scala.collection.mutable.ArrayBuffer[Byte]()
      def u16(v: Int): Unit = { out += v.toByte; out += (v >> 8).toByte }
      def u32(v: Long): Unit = (0 until 4).foreach(k => out += (v >> (8 * k)).toByte)
      u16(0x4949); u16(42); u32(8L)
      val nStrips = strips.size
      val entries = 10
      val ifdSize = 2 + entries * 12 + 4
      val extStart = 8 + ifdSize
      val stripOffsetsAt = extStart
      val stripCountsAt = extStart + 4 * nStrips
      val dataStart = stripCountsAt + 4 * nStrips
      u16(entries)
      def entry(tag: Int, typ: Int, count: Int, value: Long): Unit = {
        u16(tag); u16(typ); u32(count.toLong)
        if (typ == 3) { u16(value.toInt); u16(0) } else u32(value)
      }
      entry(256, 4, 1, w.toLong)
      entry(257, 4, 1, h.toLong)
      entry(258, 3, 1, 8L)
      entry(259, 3, 1, 8L) // deflate
      entry(262, 3, 1, 1L)
      entry(273, 4, nStrips, stripOffsetsAt.toLong) // strip offsets (ext)
      entry(277, 3, 1, 1L)
      entry(278, 4, 1, rps.toLong)
      entry(279, 4, nStrips, stripCountsAt.toLong) // strip byte counts (ext)
      entry(317, 3, 1, 2L) // predictor: horizontal differencing
      u32(0L) // next IFD
      val offsets = strips.scanLeft(dataStart.toLong)((p, s) => p + s.length).dropRight(1)
      offsets.foreach(u32)
      strips.foreach(s => u32(s.length.toLong))
      strips.foreach(out ++= _)
      val tiff = out.toArray
      assert(Cog.tilePlan(tiff).head.predictor == 2)
      val (w0, h0, l0) = Cog.decodeLevel(tiff, 0)
      assert(w0 == w && h0 == h && l0.toSeq == px.map(_ & 0xFF).toSeq, "predictor-2 decode differs")
    }
  }

  test("BigTIFF (version 43, 8-byte offsets) strip layout reads sample-exact") {
    val (w, h) = (96, 70)
    val rps = 32
    val px = Array.tabulate(w * h)(i => ((i * 7) % 253).toByte)
    val strips = (0 until (h + rps - 1) / rps).map { s =>
      val rows = math.min(rps, h - s * rps)
      java.util.Arrays.copyOfRange(px, s * rps * w, s * rps * w + rows * w)
    }
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    def u16(v: Int): Unit = { out += v.toByte; out += (v >> 8).toByte }
    def u64(v: Long): Unit = (0 until 8).foreach(k => out += (v >> (8 * k)).toByte)
    u16(0x4949); u16(43); u16(8); u16(0); u64(16L) // BigTIFF header
    val nStrips = strips.size
    val entries = 9
    val ifdSize = 8 + entries * 20 + 8
    val extStart = 16 + ifdSize
    val offsAt = extStart
    val countsAt = extStart + 8 * nStrips
    val dataStart = countsAt + 8 * nStrips
    u64(entries.toLong)
    def entry(tag: Int, typ: Int, count: Long, value: Long): Unit = {
      u16(tag); u16(typ); u64(count)
      if (typ == 3) { u16(value.toInt); u16(0); (0 until 4).foreach(_ => out += 0) } else u64(value)
    }
    entry(256, 16, 1, w.toLong)
    entry(257, 16, 1, h.toLong)
    entry(258, 3, 1, 8L)
    entry(259, 3, 1, 1L)
    entry(262, 3, 1, 1L)
    entry(273, 16, nStrips.toLong, offsAt.toLong)
    entry(277, 3, 1, 1L)
    entry(278, 16, 1, rps.toLong)
    entry(279, 16, nStrips.toLong, countsAt.toLong)
    u64(0L) // next IFD
    val offsets = strips.scanLeft(dataStart.toLong)((p, s) => p + s.length).dropRight(1)
    offsets.foreach(u64)
    strips.foreach(s => u64(s.length.toLong))
    strips.foreach(out ++= _)
    val tiff = out.toArray
    val plan = Cog.tilePlan(tiff)
    assert(plan.head.tiles.size == nStrips && plan.head.tileW == w && plan.head.tileH == rps)
    val (w0, h0, l0) = Cog.decodeLevel(tiff, 0)
    assert(w0 == w && h0 == h && l0.toSeq == px.map(_ & 0xFF).toSeq, "bigtiff decode differs")
  }

  test("buildCog bytes decode to EXACTLY the oracle-verified tile planes") {
    import org.apache.spark.sql.functions._
    val cog = graft.geo.GeoQueries.buildCog(spark, sf0001).select(col("cog")).head().getAs[Array[Byte]](0)
    val img = readTiff(cog).head
    assert((img.getWidth, img.getHeight) === ((400, 400)))
    // re-tile the DECODED pixels on the 512-canvas and hash like q_cog
    val oracle = graft.geo.GeoQueries
      .cogQuery(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(3))
      .toMap
    val raster = img.getRaster
    for (tx <- 0 to 1; ty <- 0 to 1) {
      val vals = for (iy <- 0 until 256; ix <- 0 until 256) yield {
        val gx = tx * 256 + ix; val gy = ty * 256 + iy
        if (gx < 400 && gy < 400) raster.getSample(gx, gy, 0) else 0
      }
      val digest = java.security.MessageDigest
        .getInstance("MD5")
        .digest(vals.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_))
        .mkString
      assert(digest === oracle((tx.toLong, ty.toLong)), s"tile ($tx,$ty) plane diverged from the oracle row")
    }
  }
}
