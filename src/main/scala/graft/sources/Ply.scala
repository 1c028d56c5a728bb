package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.model.EntryType

/** PLY reader + the mesh / point-cloud / Gaussian-splat dispatch —
  * reference `ply.cpp:19-180` (`getPlyInfo` header walk with its
  * 512-line bound and digit-validated vertex count; splat detection
  * via the f_dc_0 primary signature or the scale/rot/opacity
  * fallback; SH degree folded from the f_rest_* count; `identifyPly`:
  * textured mesh → Generic, mesh → Model, splat → GaussianSplat,
  * else PointCloud) and `entry.cpp:1018-1022` (the .ply content
  * dispatch this feeds).
  *
  * Beyond the reference's header-only parse, the data section reads
  * too (ascii, binary_little_endian and binary_big_endian, typed
  * scalar properties, list properties for faces), so a PLY becomes a
  * vertex DataFrame — the splat/point-cloud ingestion face.
  *
  * Scale shape: one .ply is one artifact (binaryFile split → one
  * parse task), like every other codec here.
  */
object Ply {

  final case class Info(
      isMesh: Boolean,
      hasTextures: Boolean,
      isSplat: Boolean,
      shDegree: Int,
      dimensions: Seq[String],
      vertexCount: Long
  )

  final case class Property(name: String, typ: String, isList: Boolean, listCountType: String)
  final case class Element(name: String, count: Long, props: Seq[Property])
  final case class Header(format: String, elements: Seq[Element], dataOffset: Int, headerLines: Int)

  private def typeSize(t: String): Int = t match {
    case "char" | "uchar" | "int8" | "uint8" => 1
    case "short" | "ushort" | "int16" | "uint16" => 2
    case "int" | "uint" | "int32" | "uint32" | "float" | "float32" => 4
    case "double" | "float64" => 8
    case other => throw new IllegalArgumentException(s"ply: unknown property type $other")
  }

  /** Parse the header. Returns None when the payload is not a PLY. */
  def header(bytes: Array[Byte]): Option[Header] = {
    if (bytes.length < 4 || new String(bytes, 0, 3, "US-ASCII") != "ply") return None
    // find end_header line by line (header is ASCII)
    var at = 0
    val lines = new ArrayBuffer[String]()
    var dataOffset = -1
    var guard = 0
    while (dataOffset < 0 && at < bytes.length && guard < 2048) {
      var e = at
      while (e < bytes.length && bytes(e) != '\n') e += 1
      val line = new String(bytes, at, e - at, "US-ASCII").stripSuffix("\r")
      lines += line
      if (line == "end_header") dataOffset = e + 1
      at = e + 1
      guard += 1
    }
    if (dataOffset < 0) return None
    if (lines.headOption.map(_.trim) != Some("ply")) return None
    var format = "ascii"
    val elements = new ArrayBuffer[Element]()
    var cur: Element = null
    def closeCur(): Unit = if (cur != null) { elements += cur; cur = null }
    lines.drop(1).foreach { line =>
      val t = line.trim.split("\\s+").toSeq
      t match {
        case Seq("format", f, _) => format = f
        case Seq("element", name, n) =>
          closeCur()
          cur = Element(name, n.toLong, Seq.empty)
        case Seq("property", "list", cntType, itemType, name) if cur != null =>
          cur = cur.copy(props = cur.props :+ Property(name, itemType, isList = true, cntType))
        case Seq("property", typ, name) if cur != null =>
          cur = cur.copy(props = cur.props :+ Property(name, typ, isList = false, ""))
        case _ => ()
      }
    }
    closeCur()
    Some(Header(format, elements.toSeq, dataOffset, lines.length))
  }

  /** Mirror of `getPlyInfo` + `computePlySplatInfo`. */
  def info(bytes: Array[Byte]): Option[Info] = {
    val h = header(bytes).getOrElse(return None)
    if (h.headerLines > 514) return None // ply.cpp:147 parser bound (512 body lines)
    val vertexEl = h.elements.find(_.name == "vertex")
    val dims = vertexEl.map(_.props.map(_.name)).getOrElse(Seq.empty)
    val isMesh = h.elements.exists(_.name == "face")
    val headText = new String(bytes, 0, h.dataOffset, "US-ASCII")
    val hasTextures = headText.contains("comment TextureFile ")
    val has = dims.toSet
    val primary = has("f_dc_0")
    val fallback = has("scale_0") && has("scale_1") && has("scale_2") &&
      has("rot_0") && has("rot_1") && has("rot_2") && has("rot_3") && has("opacity")
    val isSplat = !isMesh && (primary || fallback)
    val shDegree =
      if (!isSplat) -1
      else {
        val fRest = dims.count(_.startsWith("f_rest_"))
        fRest match {
          case 0 => 0
          case 9 => 1
          case 24 => 2
          case 45 => 3
          case n if n >= 45 => 3
          case n if n >= 24 => 2
          case n if n >= 9 => 1
          case _ => 0
        }
      }
    Some(Info(isMesh, hasTextures, isSplat, shDegree, dims, vertexEl.map(_.count).getOrElse(0L)))
  }

  /** `identifyPly` — the EntryType the fingerprint chain assigns. */
  def identify(bytes: Array[Byte]): Int = info(bytes) match {
    case Some(i) if i.isMesh => if (i.hasTextures) EntryType.Generic else EntryType.Model
    case Some(i) if i.isSplat => EntryType.GaussianSplat
    case Some(_) => EntryType.PointCloud
    case None => EntryType.Generic
  }

  /** Properties JSON the meta face records (splat count / SH degree —
    * the tileset-era fields SURVEY §2 lists for splats). */
  def meta(bytes: Array[Byte]): Option[String] = info(bytes).map { i =>
    val kind =
      if (i.isMesh) "mesh" else if (i.isSplat) "splat" else "pointcloud"
    val sh = if (i.isSplat) s""","shDegree":${i.shDegree}""" else ""
    s"""{"kind":"$kind","vertexCount":${i.vertexCount},"dimensions":${i.dimensions.length}$sh}"""
  }

  // ---- data section ---------------------------------------------------

  private def readScalar(bb: java.nio.ByteBuffer, t: String): Double = t match {
    case "char" | "int8" => bb.get().toDouble
    case "uchar" | "uint8" => (bb.get() & 0xff).toDouble
    case "short" | "int16" => bb.getShort().toDouble
    case "ushort" | "uint16" => (bb.getShort() & 0xffff).toDouble
    case "int" | "int32" => bb.getInt().toDouble
    case "uint" | "uint32" => (bb.getInt() & 0xffffffffL).toDouble
    case "float" | "float32" => bb.getFloat().toDouble
    case "double" | "float64" => bb.getDouble()
  }

  /** Vertex rows (property order), plus face index lists for meshes.
    * Elements decode in declaration order, so interleaved layouts and
    * elements before `vertex` consume correctly. */
  def read(bytes: Array[Byte]): (Header, Seq[Array[Double]], Seq[Seq[Long]]) = {
    val h = header(bytes).getOrElse(throw new IllegalArgumentException("not a PLY payload"))
    val verts = new ArrayBuffer[Array[Double]]()
    val faces = new ArrayBuffer[Seq[Long]]()
    if (h.format == "ascii") {
      val text = new String(bytes, h.dataOffset, bytes.length - h.dataOffset, "US-ASCII")
      val tokens = text.split("\\s+").iterator.filter(_.nonEmpty)
      h.elements.foreach { el =>
        var i = 0L
        while (i < el.count) {
          val row = new ArrayBuffer[Double](el.props.length)
          el.props.foreach { p =>
            if (p.isList) {
              val n = tokens.next().toLong.toInt
              val items = (0 until n).map(_ => tokens.next().toDouble)
              if (el.name == "face") faces += items.map(_.toLong)
            } else row += tokens.next().toDouble
          }
          if (el.name == "vertex") verts += row.toArray
          i += 1
        }
      }
    } else {
      val order =
        if (h.format == "binary_little_endian") java.nio.ByteOrder.LITTLE_ENDIAN
        else if (h.format == "binary_big_endian") java.nio.ByteOrder.BIG_ENDIAN
        else throw new IllegalArgumentException(s"ply: unknown format ${h.format}")
      val bb = java.nio.ByteBuffer.wrap(bytes, h.dataOffset, bytes.length - h.dataOffset).order(order)
      h.elements.foreach { el =>
        var i = 0L
        while (i < el.count) {
          val row = new ArrayBuffer[Double](el.props.length)
          el.props.foreach { p =>
            if (p.isList) {
              val n = readScalar(bb, p.listCountType).toInt
              val items = (0 until n).map(_ => readScalar(bb, p.typ))
              if (el.name == "face") faces += items.map(_.toLong)
            } else row += readScalar(bb, p.typ)
          }
          if (el.name == "vertex") verts += row.toArray
          i += 1
        }
      }
    }
    (h, verts.toSeq, faces.toSeq)
  }

  // ---- write (fixture/export face) ------------------------------------

  /** Binary little-endian PLY with float32 vertex properties — the
    * 3DGS interchange layout (and the fixture generator for specs). */
  def write(propNames: Seq[String], rows: Seq[Array[Float]], comments: Seq[String] = Seq.empty): Array[Byte] = {
    val head = new StringBuilder
    head ++= "ply\nformat binary_little_endian 1.0\n"
    comments.foreach(c => head ++= s"comment $c\n")
    head ++= s"element vertex ${rows.length}\n"
    propNames.foreach(p => head ++= s"property float $p\n")
    head ++= "end_header\n"
    val hb = head.toString.getBytes("US-ASCII")
    val bb = java.nio.ByteBuffer
      .allocate(hb.length + rows.length * propNames.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(hb)
    rows.foreach { r =>
      require(r.length == propNames.length, "ply row arity mismatch")
      r.foreach(bb.putFloat)
    }
    bb.array()
  }

  // ---- Spark faces ----------------------------------------------------

  /** Every .ply under `pathGlob` as one vertex DataFrame (file column +
    * typed vertex properties as doubles). Schema is sniffed from the
    * first matching file. */
  def vertexTable(s: SparkSession, pathGlob: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val sniff = {
      val hPath = new org.apache.hadoop.fs.Path(pathGlob)
      val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      val st = Option(fs.globStatus(hPath)).filter(_.nonEmpty).map(_.head.getPath).getOrElse(hPath)
      val in = fs.open(st)
      try {
        val buf = new Array[Byte](math.min(fs.getFileStatus(st).getLen, 65536L).toInt)
        in.readFully(0, buf)
        buf
      } finally in.close()
    }
    val props = header(sniff)
      .flatMap(_.elements.find(_.name == "vertex"))
      .map(_.props.filterNot(_.isList).map(_.name))
      .getOrElse(throw new IllegalArgumentException("ply: no vertex element"))
    val schema = StructType(
      StructField("file", StringType) +: props.map(p => StructField(p, DoubleType))
    )
    val rows = s.read
      .format("binaryFile")
      .load(pathGlob)
      .select(col("path"), col("content"))
      .rdd
      .flatMap { r =>
        val name = r.getAs[String]("path").split('/').last
        val (h, verts, _) = read(r.getAs[Array[Byte]]("content"))
        val order = h.elements.find(_.name == "vertex").get.props.filterNot(_.isList).map(_.name)
        val idx = props.map(order.indexOf)
        verts.map { v => Row.fromSeq(name +: idx.map(i => if (i >= 0 && i < v.length) v(i) else null)) }
      }
    s.createDataFrame(rows, schema)
  }

  /** q_ply: per event_type, a binary 3DGS splat PLY is BUILT from the
    * group's own events (deterministic integer-valued float32 fields,
    * degree-1 SH layout), parsed back through the full header+data
    * reader, and the dispatch + aggregates of the decoded vertices are
    * emitted. The oracle computes the same aggregates straight from
    * `events`; green iff the PLY cycle is lossless and the splat
    * dispatch (type 15, SH degree from f_rest_* count) is right. */
  def plyQuery(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val cycle = udf { rows: Seq[Row] =>
      val names = Seq("x", "y", "z", "f_dc_0", "f_dc_1", "f_dc_2", "opacity",
        "scale_0", "scale_1", "scale_2", "rot_0", "rot_1", "rot_2", "rot_3") ++
        (0 until 9).map(i => s"f_rest_$i")
      val data = rows.sortBy(_.getLong(0)).map { r =>
        val id = r.getLong(0)
        val uid = r.getLong(1)
        Array.tabulate[Float](names.length) {
          case 0 => (id % 1000).toFloat
          case 1 => ((uid * 3) % 1000).toFloat
          case 2 => ((id * 7) % 500).toFloat
          case 3 => (id % 17).toFloat
          case 6 => (id % 11).toFloat
          case k => ((id + k) % 13).toFloat
        }
      }
      val ply = write(names, data)
      val inf = info(ply).getOrElse(throw new IllegalStateException("written PLY failed to parse"))
      require(inf.isSplat && !inf.isMesh, "3DGS layout must dispatch as a splat")
      val typ = identify(ply)
      val (_, verts, _) = read(ply)
      require(verts.length == data.length, "ply round-trip lost vertices")
      Seq(
        typ.toLong,
        inf.shDegree.toLong,
        verts.length.toLong,
        verts.map(_(0).toLong).sum,
        verts.map(_(1).toLong).sum,
        verts.map(_(2).toLong).sum,
        verts.map(_(3).toLong).sum,
        verts.map(_(6).toLong).sum
      )
    }
    graft.Tables
      .eventsRaw(s, dir)
      .groupBy($"event_type")
      .agg(collect_list(struct($"event_id", $"user_id")).as("rows"))
      .select($"event_type", cycle($"rows").as("a"))
      .select(
        $"event_type",
        $"a".getItem(0).as("entry_type"),
        $"a".getItem(1).as("sh_degree"),
        $"a".getItem(2).as("n_vertices"),
        $"a".getItem(3).as("x_sum"),
        $"a".getItem(4).as("y_sum"),
        $"a".getItem(5).as("z_sum"),
        $"a".getItem(6).as("dc_sum"),
        $"a".getItem(7).as("opacity_sum")
      )
      .orderBy($"event_type")
  }
}
