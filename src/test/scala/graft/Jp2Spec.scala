package graft

import graft.raster.{Jp2, Jp2Codec}

/** JPEG 2000 codec conformance. No external JP2 fixtures exist in
  * this sandbox, so the proof strategy is the LazCodec one: exact
  * round-trips across awkward geometries/depths (the encoder and
  * decoder share only the published tables, and the Tier-1 scan is
  * driven through a direction-agnostic interface), plus independent
  * kernel checks (hand-computed 5/3 lifting values, MQ coder
  * round-trips over adversarial decision streams) and structural
  * assertions on the emitted markers.
  */
class Jp2Spec extends SparkSuite {

  private def gradient(w: Int, h: Int, depth: Int): Array[Int] = {
    val mask = (1 << depth) - 1
    Array.tabulate(w * h)(i => ((i % w) * 3 + (i / w) * 7) & mask)
  }

  private def noise(n: Int, depth: Int, seed: Long): Array[Int] = {
    var s = seed
    Array.fill(n) { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; (s & ((1 << depth) - 1)).toInt }
  }

  test("5/3 lifting: hand-computed 1D values, and 2D forward/inverse identity") {
    // x = [10, 20, 30, 40, 50]: d0 = 20 - (10+30)/2 = 0; d1 = 40 - (30+50)/2 = 0
    // s0 = 10 + (0+0+2)/4 = 10; s1 = 30; s2 = 50 + (0+0+2)/4 = 50
    val a = Array(10, 20, 30, 40, 50, 0, 0, 0, 0, 0)
    // drive through the public 2D face with h=1 (one row)
    val row = Array(10, 20, 30, 40, 50)
    Jp2Codec.fdwt53(row, 5, 1, 1)
    assert(row.toSeq == Seq(10, 30, 50, 0, 0), row.toSeq.toString)
    Jp2Codec.idwt53(row, 5, 1, 1)
    assert(row.toSeq == Seq(10, 20, 30, 40, 50))

    val img = noise(37 * 23, 8, 0xbeefL)
    val c = img.clone()
    Jp2Codec.fdwt53(c, 37, 23, 3)
    assert(c.toSeq != img.toSeq) // actually transformed
    Jp2Codec.idwt53(c, 37, 23, 3)
    assert(c.toSeq == img.toSeq, "5/3 multilevel not reversible")
    assert(a.length == 10) // silence unused warning
  }

  test("MQ coder: decisions round-trip over adversarial streams and many contexts") {
    var s = 0x12345L
    val decisions = Array.fill(20000) { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; (s & 1).toInt }
    val ctxs = decisions.indices.map(i => (i * 7) % Jp2Codec.NumCtx).toArray
    val enc = new Jp2Codec.MqEncoder
    decisions.indices.foreach(i => enc.code(decisions(i), ctxs(i)))
    val bytes = enc.finish()
    val dec = new Jp2Codec.MqDecoder(bytes)
    decisions.indices.foreach { i =>
      assert(dec.code(0, ctxs(i)) == decisions(i), s"decision $i")
    }
    // heavily-skewed stream compresses far below 1 bit/decision
    val enc2 = new Jp2Codec.MqEncoder
    (0 until 20000).foreach(i => enc2.code(if (i % 500 == 0) 1 else 0, 0))
    val skewed = enc2.finish()
    assert(skewed.length < 500, s"skewed stream ${skewed.length} bytes")
    val dec2 = new Jp2Codec.MqDecoder(skewed)
    (0 until 20000).foreach(i => assert(dec2.code(0, 0) == (if (i % 500 == 0) 1 else 0)))
  }

  test("lossless round-trip: gray 8-bit across awkward geometries and level counts") {
    for ((w, h, lv) <- Seq((1, 1, 0), (3, 2, 1), (64, 64, 3), (65, 33, 3), (127, 101, 5), (256, 64, 2))) {
      val px = gradient(w, h, 8)
      val img = Jp2.decodeJ2k(Jp2.encodeJ2k(w, h, 8, Array(px), lv))
      assert(img.width == w && img.height == h && img.depth == 8 && img.channels == 1, s"($w,$h,$lv) meta")
      assert(img.comps(0).toSeq == px.toSeq, s"($w,$h,$lv) pixels")
    }
  }

  test("lossless round-trip: noise (worst-case entropy), 12/16-bit depths, RGB with RCT") {
    val nz = noise(65 * 47, 8, 0x1234L)
    assert(Jp2.decodeJ2k(Jp2.encodeJ2k(65, 47, 8, Array(nz), 3)).comps(0).toSeq == nz.toSeq)

    val px12 = noise(40 * 30, 12, 0x77L)
    val img12 = Jp2.decodeJ2k(Jp2.encodeJ2k(40, 30, 12, Array(px12), 2))
    assert(img12.depth == 12 && img12.comps(0).toSeq == px12.toSeq)

    val px16 = noise(33 * 21, 16, 0x99L)
    assert(Jp2.decodeJ2k(Jp2.encodeJ2k(33, 21, 16, Array(px16), 3)).comps(0).toSeq == px16.toSeq)

    val r = gradient(50, 40, 8); val g = noise(50 * 40, 8, 5L); val b = gradient(50, 40, 8).reverse
    val rgb = Jp2.decodeJ2k(Jp2.encodeJ2k(50, 40, 8, Array(r, g, b), 3))
    assert(rgb.channels == 3)
    assert(rgb.comps(0).toSeq == r.toSeq && rgb.comps(1).toSeq == g.toSeq && rgb.comps(2).toSeq == b.toSeq,
      "RCT cycle not lossless")
  }

  test("multi-code-block path: image wider/taller than 64 exercises tag trees across blocks") {
    val (w, h) = (200, 150) // 4×3 code-blocks at full res
    val px = noise(w * h, 8, 0xabcL)
    val enc = Jp2.encodeJ2k(w, h, 8, Array(px), 2)
    assert(Jp2.decodeJ2k(enc).comps(0).toSeq == px.toSeq)
    // constant image: everything collapses to zero coefficients except LL DC
    val flat = Array.fill(w * h)(200)
    val encFlat = Jp2.encodeJ2k(w, h, 8, Array(flat), 3)
    assert(encFlat.length < 400, s"flat image should be tiny, got ${encFlat.length}")
    assert(Jp2.decodeJ2k(encFlat).comps(0).toSeq == flat.toSeq)
  }

  test("tiled codestreams: independent tiles round-trip, edge tiles crop, and parts compose distributedly") {
    val (w, h) = (150, 90) // 32px tiles → 5×3 grid with 22/26-px edge tiles
    val px = noise(w * h, 8, 0x5150L)
    val tiled = Jp2.encodeJ2k(w, h, 8, Array(px), 2, tileSize = 32)
    assert(Jp2.decodeJ2k(tiled).comps(0).toSeq == px.toSeq, "tiled round-trip")
    // count SOT markers — one per tile
    var sots = 0
    (0 until tiled.length - 1).foreach { i =>
      if ((tiled(i) & 0xff) == 0xFF && (tiled(i + 1) & 0xff) == 0x90) sots += 1
    }
    assert(sots == 15, s"expected 15 tile-parts, found $sots")

    // the distributed composition: per-tile tilePart() on "executors",
    // driver concatenates header ++ parts(in index order) ++ EOC —
    // byte-identical to the single-shot encoder
    val ntx = 5; val nty = 3
    val parts = (0 until ntx * nty).map { t =>
      val tx = t % ntx; val ty = t / ntx
      val x0 = tx * 32; val y0 = ty * 32
      val tw = math.min(32, w - x0); val th = math.min(32, h - y0)
      val tile = new Array[Int](tw * th)
      (0 until th).foreach(y => (0 until tw).foreach(x => tile(y * tw + x) = px((y0 + y) * w + x0 + x)))
      Jp2.tilePart(t, tw, th, 8, Array(tile), 2, mct = false)
    }
    val composed = Jp2.headerBytes(w, h, 8, 1, mct = false, 2, 32, 32) ++
      parts.flatten ++ Array[Byte](0xFF.toByte, 0xD9.toByte)
    assert(composed.toSeq == tiled.toSeq, "distributed composition must be byte-identical")

    // RGB tiled with MCT
    val r = noise(w * h, 8, 1L); val g = noise(w * h, 8, 2L); val b = noise(w * h, 8, 3L)
    val rgbT = Jp2.encodeJ2k(w, h, 8, Array(r, g, b), 3, tileSize = 64)
    val img = Jp2.decodeJ2k(rgbT)
    assert(img.comps(0).toSeq == r.toSeq && img.comps(1).toSeq == g.toSeq && img.comps(2).toSeq == b.toSeq)
  }

  test("encodeTiledDistributed: executors code tiles, driver assembles — byte-identical to single-shot") {
    import spark.implicits._
    val (w, h) = (100, 70)
    val px = noise(w * h, 8, 0xd15cL)
    val ts = 32
    val ntx = (w + ts - 1) / ts; val nty = (h + ts - 1) / ts
    val tiles = (0 until ntx * nty).map { t =>
      val tx = t % ntx; val ty = t / ntx
      val x0 = tx * ts; val y0 = ty * ts
      val tw = math.min(ts, w - x0); val th = math.min(ts, h - y0)
      val a = new Array[Int](tw * th)
      (0 until th).foreach(y => (0 until tw).foreach(x => a(y * tw + x) = px((y0 + y) * w + x0 + x)))
      (t, a)
    }
    val dist = Jp2.encodeTiledDistributed(spark, w, h, 8, 2, ts, tiles.toDS().repartition(4))
    assert(dist.toSeq == Jp2.encodeJ2k(w, h, 8, Array(px), 2, tileSize = ts).toSeq,
      "distributed and single-shot encoders must agree byte-for-byte")
    assert(Jp2.decodeJ2k(dist).comps(0).toSeq == px.toSeq)
  }

  test("JP2 container: boxes parse, probe reads ihdr/SIZ without entropy decode, sniffers discriminate") {
    val px = gradient(48, 32, 8)
    val jp2 = Jp2.encodeJp2(48, 32, 8, Array(px, px, px), 2)
    assert(Jp2.isJp2(jp2) && !Jp2.isJ2k(jp2))
    assert(Jp2.probe(jp2).contains((48, 32, 3, 8)))
    val img = Jp2.decode(jp2)
    assert(img.width == 48 && img.channels == 3 && img.comps(0).toSeq == px.toSeq)

    val j2k = Jp2.encodeJ2k(48, 32, 8, Array(px), 2)
    assert(Jp2.isJ2k(j2k) && !Jp2.isJp2(j2k))
    assert(Jp2.probe(j2k).contains((48, 32, 1, 8)))
    assert(Jp2.decode(j2k).comps(0).toSeq == px.toSeq)
    assert(Jp2.probe("not an image".getBytes).isEmpty)
  }

  test("resolution-progressive decode: reduced reads match the DWT LL band and skip tile bytes via Psot") {
    val (w, h) = (130, 94)
    val px = noise(w * h, 8, 0xfeedL)
    // reference LL: forward-transform the DC-shifted plane, take LL_d, unshift
    def llReference(d: Int): Seq[Int] = {
      val a = px.map(_ - 128)
      Jp2Codec.fdwt53(a, w, h, d)
      val lw = (0 until d).foldLeft(w)((v, _) => (v + 1) / 2)
      val lh = (0 until d).foldLeft(h)((v, _) => (v + 1) / 2)
      (0 until lh).flatMap(y => (0 until lw).map(x => a(y * w + x) + 128))
    }
    val single = Jp2.encodeJ2k(w, h, 8, Array(px), 3)
    for (d <- 1 to 3) {
      val img = Jp2.decodeJ2kReduced(single, d)
      val lw = (0 until d).foldLeft(w)((v, _) => (v + 1) / 2)
      assert(img.width == lw, s"d=$d width")
      assert(img.comps(0).toSeq == llReference(d), s"d=$d LL mismatch")
    }
    // tiled: per-tile LL assembly (tile size divisible by 2^d)
    val tiled = Jp2.encodeJ2k(w, h, 8, Array(px), 2, tileSize = 32)
    val r1 = Jp2.decodeJ2kReduced(tiled, 1)
    assert(r1.width == 65 && r1.height == 47)
    // full decode of the reduced image must equal downsampling each tile's DWT;
    // cross-check: reduced-decode of the SINGLE-tile stream at same d over each tile region
    // (tile-local transforms differ from global ones at tile borders, so compare via the
    // tile-local reference instead)
    // tile-local reference for the first interior tile
    val tw0 = 32; val th0 = 32
    val tile0 = Array.tabulate(tw0 * th0)(i => px((i / tw0) * w + (i % tw0)) - 128)
    Jp2Codec.fdwt53(tile0, tw0, th0, 1)
    val expected0 = (0 until 16).flatMap(y => (0 until 16).map(x => tile0(y * tw0 + x) + 128))
    val got0 = (0 until 16).flatMap(y => (0 until 16).map(x => r1.comps(0)(y * 65 + x)))
    assert(got0 == expected0, "tiled reduced decode: tile-0 LL mismatch")
    // container face
    assert(Jp2.decodeReduced(Jp2.encodeJp2(w, h, 8, Array(px), 3), 2).width == 33)
  }

  test("GeoJP2: UUID box georeferences the raster through the shared GeoTiff machinery") {
    import graft.raster.GeoJp2
    val (w, h) = (60, 40)
    val px = gradient(w, h, 8)
    val gt = Array(500000.0, 2.0, 0.0, 4649776.0, 0.0, -2.0) // UTM-ish, 2 m px
    val geo = GeoJp2.encode(w, h, 8, Array(px), gt, Some(32633), 2)
    // still a plain JP2 to every other face
    assert(Jp2.isJp2(geo) && Jp2.probe(geo).contains((w, h, 1, 8)))
    assert(Jp2.decode(geo).comps(0).toSeq == px.toSeq)
    // the geo payload round-trips through GeoTiff.sniff
    val t = GeoJp2.geoMeta(geo).getOrElse(fail("no GeoJP2 meta"))
    assert(t.georeferenced && t.width == w && t.height == h)
    assert(t.epsg.contains(32633))
    assert(t.geotransform.exists(g => g.toSeq == gt.toSeq), t.geotransform.map(_.toSeq).toString)
    // extractor dispatch: GeoRaster with an unprojected footprint
    val ex = graft.sources.Extractors.extract("ortho.jp2", geo)
    assert(ex.entryType == graft.model.EntryType.GeoRaster)
    assert(ex.footprint.exists(_.nonEmpty), "footprint ring expected")
    assert(ex.lon.exists(l => l > 14 && l < 16), s"UTM 33N center lon ${ex.lon}") // ~15°E
    // a plain (non-geo) jp2 stays an Image
    val plain = Jp2.encodeJp2(w, h, 8, Array(px), 2)
    assert(graft.sources.Extractors.extract("img.jp2", plain).entryType == graft.model.EntryType.Image)
  }

  test("marker structure: SOC/SIZ/COD/QCD/SOT/SOD/EOC in order with spec'd lengths") {
    val enc = Jp2.encodeJ2k(10, 10, 8, Array(gradient(10, 10, 8)), 1)
    def u16(i: Int): Int = ((enc(i) & 0xff) << 8) | (enc(i + 1) & 0xff)
    assert(u16(0) == 0xFF4F, "SOC")
    assert(u16(2) == 0xFF51 && u16(4) == 38 + 3, "SIZ")
    val codAt = 2 + 2 + 38 + 3
    assert(u16(codAt) == 0xFF52 && u16(codAt + 2) == 12, "COD")
    val qcdAt = codAt + 2 + 12
    assert(u16(qcdAt) == 0xFF5C && u16(qcdAt + 2) == 3 + 4, "QCD")
    val sotAt = qcdAt + 2 + 7
    assert(u16(sotAt) == 0xFF90 && u16(sotAt + 2) == 10, "SOT")
    val psot = ((enc(sotAt + 6) & 0xff) << 24) | ((enc(sotAt + 7) & 0xff) << 16) |
      ((enc(sotAt + 8) & 0xff) << 8) | (enc(sotAt + 9) & 0xff)
    assert(sotAt + psot == enc.length - 2, "Psot spans SOT..EOC-start")
    assert(u16(enc.length - 2) == 0xFFD9, "EOC")
  }

  private def psnr(a: Array[Int], b: Array[Int], depth: Int): Double = {
    require(a.length == b.length)
    var se = 0.0
    var i = 0
    while (i < a.length) { val d = (a(i) - b(i)).toDouble; se += d * d; i += 1 }
    val mse = se / a.length
    val peak = ((1 << depth) - 1).toDouble
    if (mse == 0) Double.PositiveInfinity else 10.0 * math.log10(peak * peak / mse)
  }

  test("9/7 lifting: DC gain 1, Nyquist high-pass gain 2, 2D forward/inverse identity") {
    // constant input → low band = the constant, high band ~0 (the shared
    // normalization with 5/3 that makes Rb = depth + gain hold)
    val n = 16
    val const = Array.fill(n)(42.0)
    Jp2Codec.fdwt97(const, n, 1, 1)
    (0 until (n + 1) / 2).foreach(i => assert(math.abs(const(i) - 42.0) < 1e-9, s"low[$i]"))
    ((n + 1) / 2 until n).foreach(i => assert(math.abs(const(i)) < 1e-9, s"high[$i]"))
    val nyq = Array.tabulate(n)(i => if (i % 2 == 0) 10.0 else -10.0)
    Jp2Codec.fdwt97(nyq, n, 1, 1)
    ((n + 1) / 2 until n).foreach(i => assert(math.abs(math.abs(nyq(i)) - 20.0) < 1e-6, s"nyq high[$i]"))
    // 2D identity across awkward geometries
    for ((w, h, lv) <- Seq((17, 13, 2), (64, 64, 3), (1, 9, 2), (33, 1, 3))) {
      val src = Array.tabulate(w * h)(i => math.sin(i * 0.37) * 100 + (i % 7))
      val buf = src.clone()
      Jp2Codec.fdwt97(buf, w, h, lv)
      Jp2Codec.idwt97(buf, w, h, lv)
      var i = 0
      while (i < buf.length) { assert(math.abs(buf(i) - src(i)) < 1e-6, s"($w,$h,$lv)[$i]"); i += 1 }
    }
  }

  test("lossy 9/7: PSNR-bounded round-trips, step monotonicity, size win over lossless") {
    val w = 96; val h = 80
    // smooth gradient + texture — the orthophoto-like case
    val gray = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      math.max(0, math.min(255, (x * 2 + y + 40 * math.sin(x * 0.2) * math.cos(y * 0.15)).toInt))
    }
    val fine = Jp2.encodeJ2k97(w, h, 8, Array(gray), 3, step = 0.5)
    val dFine = Jp2.decodeJ2k(fine)
    assert(dFine.width == w && dFine.height == h && dFine.channels == 1)
    val pFine = psnr(gray, dFine.comps(0), 8)
    assert(pFine > 44.0, s"fine-step PSNR $pFine")
    val coarse = Jp2.encodeJ2k97(w, h, 8, Array(gray), 3, step = 8.0)
    val pCoarse = psnr(gray, Jp2.decodeJ2k(coarse).comps(0), 8)
    assert(pCoarse > 26.0 && pCoarse < pFine, s"coarse-step PSNR $pCoarse vs $pFine")
    assert(coarse.length < fine.length, "coarser step must shrink the stream")
    val lossless = Jp2.encodeJ2k(w, h, 8, Array(gray), 3)
    assert(coarse.length < lossless.length / 2,
      s"lossy(${coarse.length}) should be far under lossless(${lossless.length})")
  }

  test("lossy 9/7: RGB through the ICT, and 16-bit depth") {
    val w = 48; val h = 40
    def plane(seed: Int) = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((x * seed + y * 3 + (x * y) / 7) % 200) + 20
    }
    val comps = Array(plane(5), plane(3), plane(2))
    val enc = Jp2.encodeJ2k97(w, h, 8, comps, 2, step = 1.0)
    val dec = Jp2.decodeJ2k(enc)
    assert(dec.channels == 3)
    (0 until 3).foreach { c =>
      val p = psnr(comps(c), dec.comps(c), 8)
      assert(p > 38.0, s"rgb channel $c PSNR $p")
    }
    // 16-bit: absolute step 4 on a 16-bit range is a tight relative error
    val deep = Array.tabulate(w * h)(i => (i * 37) % 60000)
    val enc16 = Jp2.encodeJ2k97(w, h, 16, Array(deep), 2, step = 4.0)
    val p16 = psnr(deep, Jp2.decodeJ2k(enc16).comps(0), 16)
    assert(p16 > 70.0, s"16-bit PSNR $p16")
  }

  test("lossy 9/7: marker structure (COD transform 0, QCD expounded) and reduced decode") {
    val w = 64; val h = 64
    val gray = Array.tabulate(w * h)(i => (i % w) * 2 + (i / w))
    val enc = Jp2.encodeJ2k97(w, h, 8, Array(gray), 2, step = 1.0)
    // SIZ at 2: skip to COD
    val codAt = 2 + 2 + 38 + 3
    assert(((enc(codAt) & 0xff) << 8 | (enc(codAt + 1) & 0xff)) == 0xFF52)
    assert(enc(codAt + 2 + 12 - 1) == 0, "COD transform byte must be 0 (9/7)")
    val qcdAt = codAt + 2 + 12
    assert(((enc(qcdAt) & 0xff) << 8 | (enc(qcdAt + 1) & 0xff)) == 0xFF5C)
    assert((enc(qcdAt + 4) & 0x1f) == 2, "QCD must be scalar expounded")
    // reduced decode: half-resolution reconstruction stays in pixel scale
    val half = Jp2.decodeJ2kReduced(enc, 1)
    assert(half.width == 32 && half.height == 32)
    val mean = gray.map(_.toLong).sum.toDouble / gray.length
    val meanHalf = half.comps(0).map(_.toLong).sum.toDouble / half.comps(0).length
    assert(math.abs(mean - meanHalf) < 3.0, s"reduced-decode mean drifted: $mean vs $meanHalf")
    // scalar-derived QCD (style 1) is a named refusal
    val derived = enc.clone()
    derived(qcdAt + 4) = ((derived(qcdAt + 4) & 0xe0) | 1).toByte
    val e = intercept[IllegalArgumentException](Jp2.decodeJ2k(derived))
    assert(e.getMessage.contains("derived"))
  }

  test("lossy 9/7 tiled: distributed tile parts compose byte-identically and decode within bounds") {
    val w = 96; val h = 64; val ts = 32
    val gray = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      math.max(0, math.min(255, (x + y * 2 + 30 * math.sin(x * 0.3)).toInt))
    }
    def tileOf(t: Int): Array[Int] = {
      val ntx = (w + ts - 1) / ts
      val tx = t % ntx; val ty = t / ntx
      val tw = math.min(ts, w - tx * ts); val th = math.min(ts, h - ty * ts)
      Array.tabulate(tw * th)(i => gray((ty * ts + i / tw) * w + tx * ts + i % tw))
    }
    val nTiles = ((w + ts - 1) / ts) * ((h + ts - 1) / ts)
    // single-shot tiled: header + serial tileParts
    val serial = Jp2.headerBytes97(w, h, 8, 1, mct = false, 2, ts, ts, 1.0) ++
      (0 until nTiles).flatMap { t =>
        val ntx = (w + ts - 1) / ts
        val tw = math.min(ts, w - (t % ntx) * ts); val th = math.min(ts, h - (t / ntx) * ts)
        Jp2.tilePart97(t, tw, th, 8, Array(tileOf(t)), 2, mct = false, 1.0)
      } ++ Array(0xFF.toByte, 0xD9.toByte)
    import spark.implicits._
    val distributed = Jp2.encodeTiled97Distributed(spark, w, h, 8, 2, ts, 1.0,
      spark.createDataset((0 until nTiles).map(t => (t, tileOf(t)))))
    assert(java.util.Arrays.equals(serial, distributed), "distributed must equal serial bytes")
    val dec = Jp2.decodeJ2k(distributed)
    val p = psnr(gray, dec.comps(0), 8)
    assert(p > 40.0, s"tiled lossy PSNR $p")
    // reduced decode works on tiled lossy streams too
    val half = Jp2.decodeJ2kReduced(distributed, 1)
    assert(half.width == 48 && half.height == 32)
  }

  test("named refusals: truncation, bad magic, unsupported features") {
    val enc = Jp2.encodeJ2k(20, 20, 8, Array(gradient(20, 20, 8)), 2)
    intercept[Exception](Jp2.decodeJ2k(enc.take(enc.length / 2))) // truncated
    intercept[Exception](Jp2.decodeJ2k("garbage".getBytes))
    // flip the transform byte to 9/7 → named error
    val irrev = enc.clone()
    // COD: at 2+2+38+3 → SPcod transform is last byte of COD segment
    val codAt = 2 + 2 + 38 + 3
    irrev(codAt + 2 + 12 - 1) = 0 // 9/7
    val e = intercept[IllegalArgumentException](Jp2.decodeJ2k(irrev))
    assert(e.getMessage.contains("9/7"))
  }

  test("pixel budget: a crafted SIZ header cannot request terabyte allocations") {
    // nc=3 at 32767x32767 passes each individual bound but asks for ~12 GiB
    // of planes; the combined budget must refuse BEFORE any allocation
    val enc = Jp2.encodeJ2k(20, 20, 8, Array(gradient(20, 20, 8)), 2)
    val evil = enc.clone()
    def put32(i: Int, v: Int): Unit = {
      evil(i) = (v >>> 24).toByte; evil(i + 1) = (v >>> 16).toByte
      evil(i + 2) = (v >>> 8).toByte; evil(i + 3) = v.toByte
    }
    def put16(i: Int, v: Int): Unit = { evil(i) = (v >>> 8).toByte; evil(i + 1) = v.toByte }
    put32(8, 32767); put32(12, 32767) // Xsiz, Ysiz (SIZ starts at offset 2)
    put16(40, 3) // Csiz
    val e2 = intercept[IllegalArgumentException](Jp2.decodeJ2k(evil))
    assert(e2.getMessage.contains("budget"))
  }
}
