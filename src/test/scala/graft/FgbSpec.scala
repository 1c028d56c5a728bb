package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import graft.sources.Fgb

/** FlatGeobuf reader over hand-assembled FlatBuffers: header schema
  * (name/envelope/columns/count), packed-R-tree skip arithmetic,
  * size-prefixed feature frames, flat xy + nested `parts` geometries,
  * schema-typed property decoding, and the executor-side featureTable.
  *
  * The fixture builder below writes the FlatBuffers wire format
  * directly (payloads first, then vtable+table with resolved
  * offsets) — unaligned but offset-correct, which is exactly what the
  * reader must tolerate since it follows offsets, never padding.
  */
class FgbSpec extends SparkSuite {

  // ---- minimal FlatBuffers assembler --------------------------------
  private sealed trait Field { def id: Int }
  private case class Sc(id: Int, data: Array[Byte]) extends Field // inline scalar
  private case class Of(id: Int, target: Int) extends Field // u32 relative offset
  private def sc8(id: Int, v: Int): Sc = Sc(id, Array(v.toByte))
  private def sc16(id: Int, v: Int): Sc = Sc(id, Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte))
  private def sc64(id: Int, v: Long): Sc = Sc(id, (0 until 8).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray)

  private class Buf {
    val bytes = ArrayBuffer.empty[Byte]
    def pos: Int = bytes.length
    def u8(v: Int): Unit = bytes += v.toByte
    def u16(v: Int): Unit = { u8(v & 0xff); u8((v >> 8) & 0xff) }
    def u32(v: Long): Unit = (0 until 4).foreach(k => u8(((v >> (8 * k)) & 0xff).toInt))
    def u64(v: Long): Unit = (0 until 8).foreach(k => u8(((v >> (8 * k)) & 0xff).toInt))
    def f64(v: Double): Unit = u64(java.lang.Double.doubleToLongBits(v))

    def str(s: String): Int = { val p = pos; val b = s.getBytes("UTF-8"); u32(b.length.toLong); b.foreach(bytes += _); p }
    def vecF64(vs: Seq[Double]): Int = { val p = pos; u32(vs.length.toLong); vs.foreach(f64); p }
    def vecU8(vs: Array[Byte]): Int = { val p = pos; u32(vs.length.toLong); vs.foreach(bytes += _); p }
    def vecOfs(targets: Seq[Int]): Int = {
      val p = pos
      u32(targets.length.toLong)
      targets.zipWithIndex.foreach { case (t, k) => u32((t - (p + 4 + 4 * k)).toLong) }
      p
    }

    /** vtable followed by table; returns the TABLE position. */
    def table(fields: Field*): Int = {
      val maxId = if (fields.isEmpty) -1 else fields.map(_.id).max
      val vtSize = 4 + 2 * (maxId + 1)
      // lay out table data: 4-byte soffset, then fields in given order
      var off = 4
      val slots = Array.fill(maxId + 1)(0)
      val sized = fields.map { f =>
        val sz = f match { case Sc(_, d) => d.length; case _: Of => 4 }
        slots(f.id) = off
        val r = (f, off); off += sz; r
      }
      val vtPos = pos
      u16(vtSize); u16(off)
      slots.foreach(u16)
      val tPos = pos
      u32((tPos - vtPos).toLong) // i32 soffset: vtable_pos = table_pos - soffset
      sized.foreach {
        case (Sc(_, d), _) => d.foreach(bytes += _)
        case (Of(_, target), fo) => u32((target - (tPos + fo)).toLong)
      }
      tPos
    }

    def result: Array[Byte] = bytes.toArray
  }

  /** One size-prefixed flatbuffer frame: [u32 size][u32 root][body]. */
  private def frame(body: Buf => Int): Array[Byte] = {
    val b = new Buf
    b.u32(0L) // root slot placeholder (relative to frame start per reader convention)
    val root = body(b)
    val out = b.result
    // patch root offset (points from position 0 of the frame body)
    out(0) = (root & 0xff).toByte; out(1) = ((root >> 8) & 0xff).toByte
    out(2) = ((root >> 16) & 0xff).toByte; out(3) = ((root >> 24) & 0xff).toByte
    val sized = new Buf
    sized.u32(out.length.toLong)
    out.foreach(sized.bytes += _)
    sized.result
  }

  private val TInt = 5; private val TDouble = 10; private val TString = 11

  private def propsBytes(entries: (Int, Array[Byte])*): Array[Byte] = {
    val b = new Buf
    entries.foreach { case (ci, v) => b.u16(ci); v.foreach(b.bytes += _) }
    b.result
  }
  private def pInt(v: Int): Array[Byte] = { val b = new Buf; b.u32(v.toLong); b.result }
  private def pDouble(v: Double): Array[Byte] = { val b = new Buf; b.f64(v); b.result }
  private def pStr(s: String): Array[Byte] = {
    val b = new Buf; val u = s.getBytes("UTF-8"); b.u32(u.length.toLong); u.foreach(b.bytes += _); b.result
  }

  /** Header frame: name, envelope, geometry_type, columns, count, node size. */
  private def headerFrame(count: Long, nodeSize: Int): Array[Byte] = frame { b =>
    val name = b.str("test_layer")
    val env = b.vecF64(Seq(-10.0, -5.0, 30.0, 45.0))
    val colName = (n: String, t: Int) => { val s = b.str(n); b.table(Of(0, s), sc8(1, t)) }
    val cols = Seq(colName("name", TString), colName("grade", TInt), colName("score", TDouble))
    val colVec = b.vecOfs(cols)
    b.table(Of(0, name), Of(1, env), sc8(2, 0), Of(7, colVec), sc64(8, count), sc16(9, nodeSize))
  }

  /** Point feature with properties. */
  private def pointFrame(x: Double, y: Double): Array[Byte] = frame { b =>
    val xy = b.vecF64(Seq(x, y))
    val geom = b.table(Of(1, xy), sc8(7, 1)) // xy, type Point
    val props = b.vecU8(propsBytes(0 -> pStr("alpha"), 1 -> pInt(7)))
    b.table(Of(0, geom), Of(1, props))
  }

  private def lineFrame(pts: Seq[(Double, Double)]): Array[Byte] = frame { b =>
    val xy = b.vecF64(pts.flatMap(p => Seq(p._1, p._2)))
    val geom = b.table(Of(1, xy), sc8(7, 2))
    val props = b.vecU8(propsBytes(2 -> pDouble(3.25)))
    b.table(Of(0, geom), Of(1, props))
  }

  /** MultiPolygon: coordinates nested under `parts` sub-geometries. */
  private def multiFrame(): Array[Byte] = frame { b =>
    val xy1 = b.vecF64(Seq(0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 0.0))
    val part1 = b.table(Of(1, xy1), sc8(7, 3))
    val xy2 = b.vecF64(Seq(10.0, 10.0, 12.0, 10.0, 12.0, 13.0, 10.0, 10.0))
    val part2 = b.table(Of(1, xy2), sc8(7, 3))
    val parts = b.vecOfs(Seq(part1, part2))
    val geom = b.table(sc8(7, 6), Of(8, parts))
    b.table(Of(0, geom))
  }

  private val magic = Array[Byte]('f', 'g', 'b', 3, 'f', 'g', 'b', 0)

  private def fgbFile(nodeSize: Int = 0, indexFiller: Int = 0): Array[Byte] = {
    val header = headerFrame(3L, nodeSize)
    magic ++ header ++ Array.fill[Byte](indexFiller)(0x7f) ++
      pointFrame(1.5, 2.5) ++ lineFrame(Seq((0.0, 0.0), (10.0, 5.0), (20.0, 15.0))) ++ multiFrame()
  }

  test("header: name, envelope, column schema, feature count") {
    val h = Fgb.header(fgbFile()).get
    assert(h.name === Some("test_layer"))
    assert(h.envelope === Some((-10.0, -5.0, 30.0, 45.0)))
    assert(h.columns.map(c => (c.name, c.colType)) === Seq(("name", 11), ("grade", 5), ("score", 10)))
    assert(h.featuresCount === 3L)
    assert(Fgb.header("not fgb at all".getBytes).isEmpty)
  }

  test("features: flat xy, nested parts, schema-typed property decode") {
    val fs = Fgb.features(fgbFile())
    assert(fs.length === 3)
    val Seq(pt, line, multi) = fs
    assert(pt.geomType === 1 && pt.bbox === Some((1.5, 2.5, 1.5, 2.5)))
    assert(pt.props === Map("name" -> "alpha", "grade" -> "7"))
    assert(line.geomType === 2 && line.nPoints === 3)
    assert(line.bbox === Some((0.0, 0.0, 20.0, 15.0)))
    assert(line.props === Map("score" -> "3.25"))
    assert(multi.geomType === 6 && multi.nPoints === 8)
    assert(multi.bbox === Some((0.0, 0.0, 12.0, 13.0)))
  }

  test("packed R-tree skip: node-size arithmetic matches the spec layout") {
    // 3 items, branching 16: 3 leaves + 1 root = 4 nodes * 40 bytes
    assert(Fgb.indexBytes(3, 16) === 160L)
    assert(Fgb.indexBytes(0, 16) === 0L)
    assert(Fgb.indexBytes(5, 0) === 0L, "node size 0 = no index")
    // 300 items: 300 + 19 + 2 + 1 = 322 nodes
    assert(Fgb.indexBytes(300, 16) === 322L * 40)
    val withIndex = fgbFile(nodeSize = 16, indexFiller = 160)
    val fs = Fgb.features(withIndex)
    assert(fs.length === 3, "features must parse across the skipped index region")
    assert(fs.head.props("name") === "alpha")
  }

  test("meta face + featureTable over a directory") {
    val m = Fgb.meta(fgbFile()).get
    assert(m.driver === "FlatGeobuf" && m.featureCount === 3)
    assert(m.bbox === Some((-10.0, -5.0, 30.0, 45.0)))
    val dir = Files.createTempDirectory("fgbspec")
    try {
      Files.write(dir.resolve("a.fgb"), fgbFile())
      val df = Fgb.featureTable(spark, dir.toString)
      assert(df.count() === 3)
      import org.apache.spark.sql.functions.col
      val hit = df.filter(graft.core.Index.bboxIntersects(15.0, 10.0, 21.0, 16.0)).collect()
      assert(hit.length === 1 && hit.head.getAs[String]("geom_type") === "LineString")
      assert(df.filter(col("geom_type") === "MultiPolygon").count() === 1)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }
}
