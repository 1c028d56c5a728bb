package graft

import graft.sources.{Laz, Laz14}
import graft.sources.Laz14.P14

/** LASzip v3 / LAS 1.4 codec (point formats 6-8): bit-exact
  * round-trip across formats, chunk boundaries, scanner-channel
  * context switching, and adversarial streams; layer pruning (a
  * column subset decodes only its layers and matches the full
  * decode); constant fields collapse to zero-byte layers; chunk
  * independence (the parallel-read contract); and the Spark face.
  *
  * Conformance boundary: same as LazSpec — no external laszip binary
  * or LAS 1.4 .laz fixture exists in this sandbox, so the entropy
  * layer is proven round-trip against this library's own decoder;
  * the container level (LAS 1.4 header, laszip VLR compressor 3 + v3
  * item list, chunk table) is proven at the format level.
  */
class Laz14Spec extends SparkSuite {

  private def mk(n: Int, wild: Boolean, channels: Int = 1, seed: Int = 42): Seq[P14] = {
    val rnd = new scala.util.Random(seed)
    var x = 100000; var y = 2000000; var z = 5000
    var t = 300000.0
    (0 until n).map { i =>
      if (wild && rnd.nextInt(50) == 0) { x = rnd.nextInt(); y = rnd.nextInt(); z = rnd.nextInt(1 << 20) }
      else { x += rnd.nextInt(200) - 100; y += rnd.nextInt(200) - 100; z += rnd.nextInt(20) - 10 }
      t += (if (wild && rnd.nextInt(100) == 0) rnd.nextDouble() * 1e9 else rnd.nextDouble() * 1e-3)
      val nr = 1 + rnd.nextInt(if (wild) 15 else 3)
      P14(
        x,
        y,
        z,
        intensity = if (rnd.nextInt(4) == 0) rnd.nextInt(65536) else 0,
        returnNumber = 1 + rnd.nextInt(nr),
        numberOfReturns = nr,
        classificationFlags = if (rnd.nextInt(8) == 0) rnd.nextInt(16) else 0,
        scannerChannel = if (channels <= 1) 0 else (i / 7) % channels,
        scanDirection = rnd.nextInt(2),
        edgeOfFlight = if (rnd.nextInt(20) == 0) 1 else 0,
        classification = rnd.nextInt(3) * 2,
        userData = rnd.nextInt(4),
        scanAngle = rnd.nextInt(30001) - 15000,
        pointSource = 7000 + rnd.nextInt(3),
        gpsTime = t,
        red = rnd.nextInt(65536),
        green = if (rnd.nextInt(3) == 0) 0 else rnd.nextInt(65536),
        blue = rnd.nextInt(65536),
        nir = rnd.nextInt(65536)
      )
    }
  }

  private def strip(p: P14, fmt: Int): P14 =
    if (fmt == 6) p.copy(red = 0, green = 0, blue = 0, nir = 0)
    else if (fmt == 7) p.copy(nir = 0)
    else if (fmt == 9) p.copy(red = 0, green = 0, blue = 0, nir = 0)
    else p

  /** Wave packets for formats 9/10, exercising every offset symbol
    * (repeat / contiguous / i32 delta / raw 64-bit jump). */
  private def addWp(pts: Seq[P14], seed: Int): Seq[P14] = {
    val rnd = new scala.util.Random(seed)
    var off = 6000000000L
    var size = 1500
    pts.map { p =>
      rnd.nextInt(8) match {
        case 0 => ()
        case 1 | 2 | 3 => off += size
        case 4 | 5 => off += rnd.nextInt(1 << 20) - (1 << 19)
        case _ => off += 11000000000L + rnd.nextInt(997)
      }
      if (rnd.nextInt(4) == 0) size = 400 + rnd.nextInt(5000)
      p.copy(
        wpIndex = rnd.nextInt(3),
        wpOffset = off,
        wpSize = size,
        wpReturn = rnd.nextFloat() * 80f,
        wpXt = if (rnd.nextInt(10) == 0) rnd.nextFloat() else 0.2f,
        wpYt = if (rnd.nextInt(10) == 0) rnd.nextFloat() else -0.1f,
        wpZt = if (rnd.nextInt(10) == 0) rnd.nextFloat() else 0.95f
      )
    }
  }

  test("wave-packet formats 9 and 10 round-trip across scanner-channel switches and chunk boundaries") {
    for (fmt <- Seq(9, 10); channels <- Seq(1, 4); n <- Seq(1, 2, 999, 1000, 2500)) {
      val pts = addWp(mk(n, wild = true, channels = channels, seed = fmt * 500 + n + channels), seed = n + fmt)
      val expect = pts.map(strip(_, fmt))
      val laz = Laz14.compress(pts, pointFormat = fmt, chunkSize = 1000)
      assert(Laz14.decompress(laz) == expect, s"fmt=$fmt channels=$channels n=$n")
      val h = Laz14.readHeader(laz)
      assert(h.pointFormat == fmt && h.compressor == 3)
    }
  }

  test("wave-packet layer prunes independently and collapses to zero bytes when constant") {
    val pts = addWp(mk(1500, wild = false, channels = 2, seed = 77), seed = 5)
    val laz = Laz14.compress(pts, pointFormat = 10, chunkSize = 1500)
    val h = Laz14.readHeader(laz)
    val c = Laz14.chunks(laz).head
    val bytes = laz.slice(c.offset.toInt, (c.offset + c.size).toInt)
    val noWp = Laz14.decodeChunk(bytes, 0, bytes.length, c.pointCount, 10,
      cols = Seq("x", "y", "z", "red", "nir"))
    val full = Laz14.decodeChunk(bytes, 0, bytes.length, c.pointCount, 10)
    assert(full.toSeq == pts)
    // pruned decode: projected fields match; packet fields not decoded
    noWp.zip(pts).foreach { case (a, b) =>
      assert(a.x == b.x && a.y == b.y && a.z == b.z && a.red == b.red && a.nir == b.nir)
    }
    // constant wave packet -> zero-byte layer (same size as the
    // packet-free format-8 encoding of the same points, minus nothing)
    val const = pts.map(_.copy(wpIndex = 1, wpOffset = 42L, wpSize = 9, wpReturn = 1f,
      wpXt = 0f, wpYt = 0f, wpZt = 1f))
    val lazConst = Laz14.compress(const, pointFormat = 10, chunkSize = 1500)
    val lazNoWpFmt = Laz14.compress(const.map(_.copy(wpIndex = 0, wpOffset = 0L, wpSize = 0,
      wpReturn = 0f, wpXt = 0f, wpYt = 0f, wpZt = 1f)), pointFormat = 8, chunkSize = 1500)
    // only the 29-byte seed record delta + the empty layer's 4-byte
    // size slot separate the two streams
    assert(lazConst.length - lazNoWpFmt.length <= 29 + 4 + 8,
      s"constant wave packets must cost ~0 bytes: ${lazConst.length} vs ${lazNoWpFmt.length}")
    assert(Laz14.decompress(lazConst) == const)
  }

  test("round-trip is the identity: formats 6/7/8, sizes across chunk boundaries, tame and wild streams") {
    for (fmt <- Seq(6, 7, 8); n <- Seq(1, 2, 999, 1000, 1001, 5000); wild <- Seq(false, true)) {
      val pts = mk(n, wild, seed = fmt * 1000 + n + (if (wild) 1 else 0))
      val laz = Laz14.compress(pts, pointFormat = fmt, chunkSize = 1000)
      assert(Laz14.decompress(laz) == pts.map(strip(_, fmt)), s"fmt=$fmt n=$n wild=$wild")
    }
  }

  test("scanner-channel context switching round-trips: 2 and 4 channels, including re-entry into used channels") {
    for (ch <- Seq(2, 4); wild <- Seq(false, true)) {
      val pts = mk(4000, wild, channels = ch, seed = 77 + ch)
      val laz = Laz14.compress(pts, pointFormat = 8, chunkSize = 1500)
      assert(Laz14.decompress(laz) == pts, s"channels=$ch wild=$wild")
    }
    // adversarial: channel changes on every point
    val rnd = new scala.util.Random(5)
    val flip = mk(1200, wild = true, seed = 9).zipWithIndex.map { case (p, i) =>
      p.copy(scannerChannel = rnd.nextInt(4))
    }
    val laz = Laz14.compress(flip, pointFormat = 8, chunkSize = 500)
    assert(Laz14.decompress(laz) == flip)
  }

  test("layer pruning: every column subset decodes its layers only and matches the full decode projection") {
    val pts = mk(3000, wild = true, channels = 4, seed = 31)
    val laz = Laz14.compress(pts, pointFormat = 8, chunkSize = 1000)
    val full = Laz14.decompress(laz)
    val subsets = Seq(
      Seq("x", "y"),
      Seq("x", "y", "z"),
      Seq("x", "y", "z", "gps_time"),
      Seq("classification", "intensity"),
      Seq("red", "green", "blue", "nir"),
      Seq("scan_angle", "point_source", "user_data", "class_flags", "scan_direction", "edge_of_flight"),
      Seq("return_number", "number_of_returns", "scanner_channel")
    )
    for (cols <- subsets) {
      val pruned = Laz14.decompress(laz, cols)
      val want = cols.toSet
      full.zip(pruned).zipWithIndex.foreach { case ((f, p), i) =>
        if (want("x")) assert(p.x == f.x, s"x at $i for $cols")
        if (want("y")) assert(p.y == f.y, s"y at $i for $cols")
        if (want("z")) assert(p.z == f.z, s"z at $i for $cols")
        if (want("intensity")) assert(p.intensity == f.intensity, s"intensity at $i for $cols")
        if (want("return_number")) assert(p.returnNumber == f.returnNumber, s"ret at $i for $cols")
        if (want("number_of_returns")) assert(p.numberOfReturns == f.numberOfReturns, s"nret at $i for $cols")
        if (want("class_flags")) assert(p.classificationFlags == f.classificationFlags, s"cflags at $i for $cols")
        if (want("scanner_channel")) assert(p.scannerChannel == f.scannerChannel, s"chan at $i for $cols")
        if (want("scan_direction")) assert(p.scanDirection == f.scanDirection, s"sdir at $i for $cols")
        if (want("edge_of_flight")) assert(p.edgeOfFlight == f.edgeOfFlight, s"edge at $i for $cols")
        if (want("classification")) assert(p.classification == f.classification, s"class at $i for $cols")
        if (want("user_data")) assert(p.userData == f.userData, s"ud at $i for $cols")
        if (want("scan_angle")) assert(p.scanAngle == f.scanAngle, s"sa at $i for $cols")
        if (want("point_source")) assert(p.pointSource == f.pointSource, s"ps at $i for $cols")
        if (want("gps_time")) assert(p.gpsTime == f.gpsTime, s"gps at $i for $cols")
        if (want("red")) assert((p.red, p.green, p.blue) == ((f.red, f.green, f.blue)), s"rgb at $i for $cols")
        if (want("nir")) assert(p.nir == f.nir, s"nir at $i for $cols")
      }
    }
  }

  test("constant fields collapse to zero-byte layers") {
    // all fields constant except XYZ → only the XY and Z layers carry bytes
    val base = mk(2000, wild = false, seed = 3)
    val flat = base.map(p =>
      p.copy(
        intensity = 7, returnNumber = 1, numberOfReturns = 1, classificationFlags = 0,
        scannerChannel = 0, scanDirection = 0, edgeOfFlight = 0, classification = 2,
        userData = 9, scanAngle = -100, pointSource = 7000, gpsTime = 12345.0,
        red = 11, green = 22, blue = 33, nir = 44
      )
    )
    val lazFlat = Laz14.compress(flat, pointFormat = 8, chunkSize = 5000)
    val lazFull = Laz14.compress(base, pointFormat = 8, chunkSize = 5000)
    assert(Laz14.decompress(lazFlat) == flat)
    // the flat stream must be much smaller: 9 of 11 layers are empty
    assert(
      lazFlat.length.toLong * 3 < lazFull.length.toLong,
      s"flat=${lazFlat.length} full=${lazFull.length}"
    )
  }

  test("compression beats raw on coherent streams") {
    val pts = mk(20000, wild = false, seed = 13)
    val laz = Laz14.compress(pts, pointFormat = 6, chunkSize = 5000)
    val raw = 30L * pts.length
    assert(laz.length < raw / 2, s"laz=${laz.length} raw=$raw")
  }

  test("chunk independence: a chunk decodes from only its byte slice") {
    val pts = mk(3500, wild = true, channels = 4, seed = 11)
    val laz = Laz14.compress(pts, pointFormat = 7, chunkSize = 1000)
    val h = Laz14.readHeader(laz)
    assert(h.pointFormat == 7 && h.compressor == 3 && h.pointCount == 3500L)
    val refs = Laz14.chunks(laz)
    assert(refs.size == 4 && refs.map(_.pointCount) == Seq(1000, 1000, 1000, 500))
    val serial = Laz14.decompress(laz)
    refs.foreach { c =>
      val slice = java.util.Arrays.copyOfRange(laz, c.offset.toInt, (c.offset + c.size).toInt)
      val dec = Laz14.decodeChunk(slice, 0, slice.length, c.pointCount, 7)
      assert(dec.toSeq == serial.slice(c.index * 1000, c.index * 1000 + c.pointCount), s"chunk ${c.index}")
    }
  }

  test("Spark pointsTable: chunk-parallel decode ≡ serial; XYZ projection skips the other layers") {
    val pts = mk(6000, wild = false, channels = 4, seed = 21)
    val laz = Laz14.compress(pts, pointFormat = 8, chunkSize = 1000, scale = 0.01)
    val dir = java.nio.file.Files.createTempDirectory("laz14").toFile
    val f = new java.io.File(dir, "cloud.laz")
    java.nio.file.Files.write(f.toPath, laz)
    try {
      val df = Laz14.pointsTable(spark, f.getPath).orderBy("chunk_id", "gps_time")
      val rows = df.collect()
      assert(rows.length == 6000)
      val serial = Laz14.decompress(laz)
      assert(rows.map(_.getAs[Int]("classification")).toSeq == serial.map(_.classification))
      assert(rows.map(_.getAs[Int]("nir")).toSeq == serial.map(_.nir))
      assert(rows.map(_.getAs[Int]("scan_angle")).toSeq == serial.map(_.scanAngle))
      val xyz = Laz14.pointsTable(spark, f.getPath, Seq("x", "y", "z")).collect()
      assert(xyz.length == 6000 && xyz.head.schema.fieldNames.toSeq == Seq("chunk_id", "x", "y", "z"))
      val gotX = xyz.map(_.getAs[Double]("x")).sorted
      val wantX = serial.map(_.x * 0.01).sorted.toArray
      assert(gotX.zip(wantX).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    } finally {
      f.delete(); dir.delete()
    }
  }

  test("BYTE14 extra bytes: round-trip, per-byte layers prune, constant bytes cost zero bytes") {
    val rnd = new scala.util.Random(17)
    // byte 0 constant, byte 1 slowly varying, byte 2 random, byte 3 id-derived
    val pts = mk(2500, wild = true, channels = 4, seed = 23).zipWithIndex.map { case (p, i) =>
      p.copy(extra = Seq(42, (i / 100) % 256, rnd.nextInt(256), i % 256))
    }
    val laz = Laz14.compress(pts, pointFormat = 8, chunkSize = 1000, extraBytes = 4)
    val h = Laz14.readHeader(laz)
    assert(h.extraBytes == 4)
    assert(Laz14.decompress(laz) == pts)
    // pruned decode: no "extra" requested → the byte layers are never
    // touched (fields hold chunk-seed values); XYZ still exact
    val noExt = Laz14.decompress(laz, Seq("x", "y", "z"))
    assert(noExt.map(p => (p.x, p.y, p.z)) == pts.map(p => (p.x, p.y, p.z)))
    assert(noExt.forall(_.extra.head == 42)) // byte 0 is constant everywhere
    // a constant extra byte contributes zero layer bytes: the same
    // stream with all four bytes constant is much smaller
    val flat = pts.map(_.copy(extra = Seq(1, 2, 3, 4)))
    val lazFlat = Laz14.compress(flat, pointFormat = 8, chunkSize = 1000, extraBytes = 4)
    assert(Laz14.decompress(lazFlat) == flat)
    assert(lazFlat.length + 1500 < laz.length, s"flat=${lazFlat.length} varying=${laz.length}")
    // Spark face: the extra column is an int array
    val dir = java.nio.file.Files.createTempDirectory("laz14ext").toFile
    val f = new java.io.File(dir, "e.laz")
    java.nio.file.Files.write(f.toPath, laz)
    try {
      val df = Laz14.pointsTable(spark, f.getPath, Seq("x", "extra")).orderBy("chunk_id")
      assert(df.columns.toSeq == Seq("chunk_id", "x", "extra"))
      val got = df.collect().map(r => r.getSeq[Int](r.fieldIndex("extra")))
      assert(got.length == 2500 && got.forall(_.length == 4))
      assert(got.map(_.head).forall(_ == 42))
    } finally { f.delete(); dir.delete() }
  }

  test("estate scan: pointsTableDir unions per-file chunk-parallel decodes with a path column") {
    val dir = java.nio.file.Files.createTempDirectory("laz14dir").toFile
    try {
      val a = mk(1200, wild = false, seed = 1)
      val b = mk(800, wild = false, channels = 4, seed = 2)
      java.nio.file.Files.write(new java.io.File(dir, "a.laz").toPath, Laz14.compress(a, pointFormat = 6, chunkSize = 500))
      java.nio.file.Files.write(new java.io.File(dir, "b.laz").toPath, Laz14.compress(b, pointFormat = 8, chunkSize = 500))
      val df = Laz14.pointsTableDir(spark, dir.getPath, Seq("x", "y", "z", "classification"))
      assert(df.count() == 2000)
      assert(df.select("path").distinct().count() == 2)
      assert(df.columns.toSeq == Seq("chunk_id", "x", "y", "z", "classification", "path"))
    } finally {
      Option(dir.listFiles()).foreach(_.foreach(_.delete())); dir.delete()
    }
  }

  test("mixed estate: Laz.pointsTableDir dispatches LAS 1.2 and LAS 1.4 files per family") {
    val dir = java.nio.file.Files.createTempDirectory("lazmix").toFile
    try {
      val v2 = Seq.tabulate(500)(i => Laz.P(i, 2 * i, 3 * i, i % 100, 0x09, i % 3, 0, 0, 0, i.toDouble))
      java.nio.file.Files.write(new java.io.File(dir, "a.laz").toPath, Laz.compress(v2, pointFormat = 1, chunkSize = 200))
      val v3 = mk(700, wild = false, channels = 2, seed = 3)
      java.nio.file.Files.write(new java.io.File(dir, "b.laz").toPath, Laz14.compress(v3, pointFormat = 6, chunkSize = 300))
      val df = Laz.pointsTableDir(spark, dir.getPath, Seq("x", "y", "z", "classification", "gps_time"))
      assert(df.count() == 1200)
      assert(df.columns.toSeq == Seq("chunk_id", "x", "y", "z", "classification", "gps_time", "path"))
      assert(df.select("path").distinct().count() == 2)
      // the sniff chain reports both truthfully as laz with true counts
      val sniffA = graft.sources.PointCloud.sniff(java.nio.file.Files.readAllBytes(new java.io.File(dir, "a.laz").toPath))
      val sniffB = graft.sources.PointCloud.sniff(java.nio.file.Files.readAllBytes(new java.io.File(dir, "b.laz").toPath))
      assert(sniffA.exists(m => m.format == "laz" && m.pointCount == 500L))
      assert(sniffB.exists(m => m.format == "laz" && m.pointCount == 700L))
    } finally {
      Option(dir.listFiles()).foreach(_.foreach(_.delete())); dir.delete()
    }
  }

  test("v2 and v3 containers coexist: readHeader rejects the other family with a named error") {
    val pts14 = mk(100, wild = false, seed = 1)
    val laz14 = Laz14.compress(pts14, pointFormat = 6)
    val e1 = intercept[IllegalArgumentException](Laz.readHeader(laz14))
    assert(e1.getMessage.contains("unsupported point format"))
    val pts12 = Seq.tabulate(100)(i => Laz.P(i, i, i, 0, 0x09, 0, 0, 0, 0, i.toDouble))
    val laz12 = Laz.compress(pts12, pointFormat = 1)
    val e2 = intercept[IllegalArgumentException](Laz14.readHeader(laz12))
    assert(e2.getMessage.contains("not LAS 1.4"))
  }
}
