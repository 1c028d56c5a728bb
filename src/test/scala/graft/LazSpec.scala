package graft

import java.nio.file.Files

import graft.sources.Laz
import graft.sources.Laz.P

/** LASzip v2 codec: bit-exact round-trip (encode then decode is the
  * identity on point records) across point formats 1 and 3, chunk
  * boundaries, and adversarial streams (wild jumps re-syncing the
  * GPS-time sequences, gray and non-gray RGB, changing return
  * contexts); chunk independence (a chunk decodes from its byte range
  * alone — the parallel-read contract); and the Spark faces
  * (chunkTable plan, pointsTable chunk-parallel decode ≡ serial).
  *
  * Conformance note: encoder and decoder implement the published
  * LASzip v2 algorithm (Isenburg PE&RS 2013); no external laszip
  * binary or .laz fixture exists in this sandbox, so cross-tool
  * conformance is proven only at the format level (header/VLR/chunk
  * table layout) while the entropy layer is proven round-trip.
  */
class LazSpec extends SparkSuite {

  private def mk(n: Int, wild: Boolean, seed: Int = 42): Seq[P] = {
    val rnd = new scala.util.Random(seed)
    var x = 100000; var y = 2000000; var z = 5000
    var t = 300000.0
    (0 until n).map { _ =>
      if (wild && rnd.nextInt(50) == 0) { x = rnd.nextInt(); y = rnd.nextInt(); z = rnd.nextInt(1 << 20) }
      else { x += rnd.nextInt(200) - 100; y += rnd.nextInt(200) - 100; z += rnd.nextInt(20) - 10 }
      t += (if (wild && rnd.nextInt(100) == 0) rnd.nextDouble() * 1e9 else rnd.nextDouble() * 1e-3)
      val nr = 1 + rnd.nextInt(3)
      val r = 1 + rnd.nextInt(nr)
      val rb = (r | (nr << 3) | (rnd.nextInt(2) << 6) | (rnd.nextInt(2) << 7)) & 0xFF
      P(
        x,
        y,
        z,
        intensity = if (rnd.nextInt(4) == 0) rnd.nextInt(65536) else 0,
        returnByte = rb,
        classification = rnd.nextInt(3) * 2,
        scanAngle = rnd.nextInt(90) - 45,
        userData = rnd.nextInt(4),
        pointSource = 7000 + rnd.nextInt(3),
        gpsTime = t,
        red = rnd.nextInt(65536),
        green = if (rnd.nextInt(3) == 0) 0 else rnd.nextInt(65536), // force some gray/non-gray flips
        blue = rnd.nextInt(65536)
      )
    }
  }

  private def gray(p: P): P = p.copy(green = p.red, blue = p.red)

  test("round-trip is the identity: formats 1 and 3, sizes across chunk boundaries, tame and wild streams") {
    for (fmt <- Seq(1, 3); n <- Seq(1, 2, 999, 1000, 1001, 5000); wild <- Seq(false, true)) {
      val pts = mk(n, wild, seed = fmt * 1000 + n + (if (wild) 1 else 0))
      val laz = Laz.compress(pts, pointFormat = fmt, chunkSize = 1000)
      val expect: Seq[P] = if (fmt == 1) pts.map(_.copy(red = 0, green = 0, blue = 0)) else pts
      assert(Laz.decompress(laz) == expect, s"fmt=$fmt n=$n wild=$wild")
    }
  }

  test("GPS-less formats 0 and 2 round-trip (pointwise and layered) with the item list shrunk to match") {
    for (fmt <- Seq(0, 2); layered <- Seq(false, true); n <- Seq(1, 999, 2500)) {
      val pts = mk(n, wild = true, seed = fmt * 100 + n).map(_.copy(gpsTime = 0.0))
      val expect = if (fmt == 0) pts.map(_.copy(red = 0, green = 0, blue = 0)) else pts
      val laz = Laz.compress(pts, pointFormat = fmt, chunkSize = 1000, layered = layered)
      assert(Laz.decompress(laz) == expect, s"fmt=$fmt layered=$layered n=$n")
      val h = Laz.readHeader(laz)
      assert(h.pointFormat == fmt && h.compressor == (if (layered) 3 else 2))
    }
  }

  /** Wave packets exercising all four offset symbols: repeated offset
    * (shared waveform), contiguous offset+size, i32 deltas through the
    * corrector, and >i32 jumps through the raw 64-bit path. */
  private def mkWp(n: Int, seed: Int): Seq[P] = {
    val rnd = new scala.util.Random(seed)
    var off = 5000000000L // beyond u32 from the start
    var size = 2000
    mk(n, wild = true, seed = seed).map { p =>
      rnd.nextInt(8) match {
        case 0 => () // same offset as previous packet
        case 1 | 2 | 3 => off += size // contiguous
        case 4 | 5 => off += rnd.nextInt(1 << 20) - (1 << 19) // small i32 delta
        case _ => off += 10000000000L + rnd.nextInt(1000) // raw 64-bit jump
      }
      if (rnd.nextInt(4) == 0) size = 500 + rnd.nextInt(4000)
      p.copy(
        wpIndex = rnd.nextInt(4),
        wpOffset = off,
        wpSize = size,
        wpReturn = rnd.nextFloat() * 100f,
        wpXt = if (rnd.nextInt(10) == 0) rnd.nextFloat() else 0.1f,
        wpYt = if (rnd.nextInt(10) == 0) rnd.nextFloat() else -0.2f,
        wpZt = if (rnd.nextInt(10) == 0) rnd.nextFloat() else 0.97f
      )
    }
  }

  test("wave-packet formats 4 and 5 round-trip (pointwise and layered), all offset symbols exercised") {
    for (fmt <- Seq(4, 5); layered <- Seq(false, true); n <- Seq(1, 2, 999, 1000, 2500)) {
      val pts = mkWp(n, seed = fmt * 1000 + n + (if (layered) 7 else 0))
      val expect = if (fmt == 4) pts.map(_.copy(red = 0, green = 0, blue = 0)) else pts
      val laz = Laz.compress(pts, pointFormat = fmt, chunkSize = 1000, layered = layered)
      assert(Laz.decompress(laz) == expect, s"fmt=$fmt layered=$layered n=$n")
      val h = Laz.readHeader(laz)
      assert(h.pointFormat == fmt && h.compressor == (if (layered) 3 else 2))
    }
  }

  test("wave-packet layer prunes independently: an XYZ+RGB read skips the packet stream") {
    val pts = mkWp(1200, seed = 31)
    val laz = Laz.compress(pts, pointFormat = 5, chunkSize = 1200, layered = true)
    val h = Laz.readHeader(laz)
    val c = Laz.chunks(laz, h).head
    val noWp = Laz.decodeChunkLayered(
      laz, c.offset.toInt, (c.offset + c.size).toInt, c.pointCount, h.pointFormat, wantWp = false)
    val full = Laz.decodeChunkLayered(
      laz, c.offset.toInt, (c.offset + c.size).toInt, c.pointCount, h.pointFormat)
    assert(full.toSeq == pts)
    assert(noWp.toSeq == pts.map(_.copy(wpIndex = 0, wpOffset = 0L, wpSize = 0,
      wpReturn = 0f, wpXt = 0f, wpYt = 0f, wpZt = 0f)))
  }

  test("gray RGB points exercise the not-gray bit and still round-trip") {
    val pts = mk(800, wild = false, seed = 9).zipWithIndex.map { case (p, i) => if (i % 3 == 0) gray(p) else p }
    val laz = Laz.compress(pts, pointFormat = 3, chunkSize = 300)
    assert(Laz.decompress(laz) == pts)
  }

  test("compression beats raw on coherent streams") {
    val pts = mk(20000, wild = false, seed = 3)
    val laz = Laz.compress(pts, pointFormat = 1, chunkSize = 5000)
    val raw = 28L * pts.length
    assert(laz.length < raw / 2, s"laz=${laz.length} raw=$raw")
  }

  test("chunk table locates chunks; each chunk decodes independently from only its byte range") {
    val pts = mk(3500, wild = true, seed = 11)
    val laz = Laz.compress(pts, pointFormat = 1, chunkSize = 1000)
    val h = Laz.readHeader(laz)
    val refs = Laz.chunks(laz, h)
    assert(refs.map(_.pointCount) == Seq(1000, 1000, 1000, 500))
    assert(refs.map(_.size).map(_.toLong).sum + h.offsetToPoints + 8 == h.chunkTableOffset)
    val serial = Laz.decompress(laz)
    refs.foreach { c =>
      // copy ONLY the chunk's bytes — proves no cross-chunk state leaks
      val slice = java.util.Arrays.copyOfRange(laz, c.offset.toInt, (c.offset + c.size).toInt)
      val got = Laz.decodeChunk(slice, 0, slice.length, c.pointCount, h.pointFormat)
      val want = serial.slice(c.index * h.chunkSize, c.index * h.chunkSize + c.pointCount)
      assert(got.toSeq == want, s"chunk ${c.index}")
    }
  }

  test("header survives the sniff chain: PointCloud dispatches laz with true count and bounds") {
    val pts = mk(500, wild = false, seed = 5)
    val laz = Laz.compress(pts, pointFormat = 1, chunkSize = 200, scale = 0.01)
    val meta = graft.sources.PointCloud.sniff(laz)
    assert(meta.exists(_.format == "laz"))
    assert(meta.get.pointCount == 500L)
    val (minX, maxX) = (pts.map(_.x).min * 0.01, pts.map(_.x).max * 0.01)
    val b = meta.get.bounds.get
    assert(math.abs(b._1 - minX) < 1e-9 && math.abs(b._4 - maxX) < 1e-9)
  }

  test("layered chunks: identical values to pointwise; any layer subset decodes alone") {
    for (fmt <- Seq(1, 3); wild <- Seq(false, true)) {
      val pts = mk(2500, wild, seed = 31 + fmt)
      val expect: Seq[P] = if (fmt == 1) pts.map(_.copy(red = 0, green = 0, blue = 0)) else pts
      val layered = Laz.compress(pts, pointFormat = fmt, chunkSize = 700, layered = true)
      assert(Laz.readHeader(layered).compressor == 3)
      assert(Laz.decompress(layered) == expect, s"layered full decode fmt=$fmt wild=$wild")

      // selective: XYZ+attrs only — GPS and RGB layers never touched
      val h = Laz.readHeader(layered)
      val got = Laz
        .chunks(layered, h)
        .flatMap(c =>
          Laz.decodeChunkLayered(
            layered, c.offset.toInt, (c.offset + c.size).toInt, c.pointCount, fmt,
            wantGps = false, wantRgb = false))
      assert(got.map(p => (p.x, p.y, p.z, p.intensity, p.classification)) ==
        expect.map(p => (p.x, p.y, p.z, p.intensity, p.classification)))
      assert(got.forall(p => p.gpsTime == 0.0 && p.red == 0 && p.green == 0 && p.blue == 0))
    }
  }

  test("projected pointsTable on a layered file prunes layers and matches the full read") {
    import spark.implicits._
    val pts = mk(3000, wild = true, seed = 77)
    val laz = Laz.compress(pts, pointFormat = 3, chunkSize = 500, layered = true)
    val dir = Files.createTempDirectory("lazproj")
    val path = dir.resolve("p.laz").toString
    Files.write(java.nio.file.Paths.get(path), laz)
    val proj = Laz.pointsTable(spark, path, Seq("x", "y", "z"))
    assert(proj.columns.toSeq == Seq("chunk_id", "x", "y", "z"))
    val full = Laz.pointsTable(spark, path)
    assert(
      proj.select($"x", $"y", $"z").collect().map(_.toSeq).sortBy(_.toString).toSeq ==
        full.select($"x", $"y", $"z").collect().map(_.toSeq).sortBy(_.toString).toSeq
    )
  }

  test("estate scan: pointsTableDir unions per-file chunk-parallel decodes with a path column") {
    import spark.implicits._
    val dir = Files.createTempDirectory("lazdir")
    val a = mk(800, wild = false, seed = 1)
    val bpts = mk(600, wild = true, seed = 2)
    Files.write(dir.resolve("a.laz"), Laz.compress(a, pointFormat = 1, chunkSize = 300))
    Files.write(dir.resolve("b.laz"), Laz.compress(bpts, pointFormat = 1, chunkSize = 250, layered = true))
    val df = Laz.pointsTableDir(spark, dir.toString, Seq("x", "y", "z", "gps_time"))
    assert(df.count() == 1400)
    assert(df.groupBy("path").count().count() == 2)
    val gotA = df.filter($"path".contains("a.laz")).select("gps_time").as[Double].collect().sorted.toSeq
    assert(gotA == a.map(_.gpsTime).sorted)
  }

  test("a variable-chunk (COPC) stream is rejected by the fixed chunk-table planner with a pointer to Copc") {
    val pts = mk(60, wild = false, seed = 12).map(p => (p.gpsTime.toLong, p))
    val nodes = Seq(
      graft.sources.Copc.NodeChunk(0, 0, 0, 0, 60, Laz.encodeChunk(pts.map(_._2), 1))
    )
    val copc = graft.sources.Copc.assemble(nodes, 0, 0, 0, 100.0, 1.0, 0.01)
    val e = intercept[IllegalArgumentException](Laz.chunks(copc))
    assert(e.getMessage.contains("variable-chunk"))
  }

  test("corrupt chunk table fails with a named error, not an allocation blow-up") {
    val pts = mk(100, wild = false, seed = 8)
    val laz = Laz.compress(pts, pointFormat = 1, chunkSize = 50)
    val h = Laz.readHeader(laz)
    // stamp garbage over the chunk count
    val broken = laz.clone()
    val t = h.chunkTableOffset.toInt
    broken(t + 4) = 0xFF.toByte; broken(t + 5) = 0xFF.toByte; broken(t + 6) = 0xFF.toByte; broken(t + 7) = 0x7F.toByte
    val e = intercept[IllegalArgumentException](Laz.chunks(broken, h))
    assert(e.getMessage.contains("implausible chunk count"))
  }

  test("Spark faces: chunkTable is the plan, pointsTable chunk-parallel decode equals serial decode") {
    val pts = mk(4321, wild = true, seed = 21)
    val laz = Laz.compress(pts, pointFormat = 3, chunkSize = 500)
    val dir = Files.createTempDirectory("lazspec")
    val path = dir.resolve("t.laz").toString
    Files.write(java.nio.file.Paths.get(path), laz)

    val ct = Laz.chunkTable(spark, path).collect().sortBy(_.getInt(0))
    assert(ct.length == 9 && ct.map(_.getInt(3)).sum == 4321)

    val got = Laz
      .pointsTable(spark, path)
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getInt(4), r.getDouble(6), r.getInt(7)))
      .sortBy(t => (t._1, t._6))
    val h = Laz.readHeader(laz)
    val want = pts.zipWithIndex
      .map { case (p, i) =>
        (i / 500, p.x * h.scaleX, p.y * h.scaleY, p.z * h.scaleZ, p.intensity, p.gpsTime, p.red)
      }
      .sortBy(t => (t._1, t._6))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }
}
