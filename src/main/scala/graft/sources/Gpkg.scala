package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoPackage (SQLite) vector reads — pure JVM, no GDAL/OGR and no
  * SQLite library: a read-only walk of the SQLite file format itself
  * (B-tree pages, varint record headers, serial types, overflow
  * chains) plus the GeoPackage geometry-blob header. Closes the GPKG
  * half of the OGR driver boundary (`vector_query.cpp:121-292` reaches
  * it through OGR); GeoJSON and Shapefile reads live in
  * [[VectorFile]].
  *
  * Scope: read-only, table b-trees (no indices needed for a scan),
  * UTF-8 databases, the journal is ignored — the subset a query
  * engine's SCAN actually touches. Scale shape: one GPKG file is one
  * split (`binaryFile` source), so an estate of .gpkg assets parses in
  * parallel, one file per task — the same per-artifact kernel as the
  * other codecs.
  */
object Gpkg {

  final case class Column(name: String, declared: String, isIpk: Boolean)
  final case class Table(name: String, rootPage: Int, columns: Seq[Column])

  // ---- SQLite primitives ----------------------------------------------

  private def u16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** SQLite varint: 1–9 bytes big-endian 7-bit groups, 9th byte carries
    * a full 8 bits. Returns (value, bytesConsumed). */
  private def varint(b: Array[Byte], i: Int): (Long, Int) = {
    var v = 0L
    var k = 0
    while (k < 8) {
      val x = b(i + k) & 0xff
      if ((x & 0x80) == 0) return ((v << 7) | x, k + 1)
      v = (v << 7) | (x & 0x7f)
      k += 1
    }
    (((v << 8) | (b(i + 8) & 0xffL)), 9)
  }

  private final class Db(val bytes: Array[Byte]) {
    require(bytes.length > 100 && new String(bytes, 0, 15, "US-ASCII") == "SQLite format 3", "not a SQLite db")
    val pageSize: Int = { val p = u16(bytes, 16); if (p == 1) 65536 else p }
    val reserved: Int = bytes(20) & 0xff
    val usable: Int = pageSize - reserved
    def pageStart(p: Int): Int = (p - 1) * pageSize

    /** Full cell payload, following the overflow chain if spilled. */
    def payload(at: Int, total: Long): (Array[Byte], Int) = {
      val maxLeaf = usable - 35
      if (total <= maxLeaf) return (java.util.Arrays.copyOfRange(bytes, at, at + total.toInt), total.toInt)
      val minLeaf = (usable - 12) * 32 / 255 - 23
      val k = minLeaf + ((total - minLeaf) % (usable - 4)).toInt
      val local = if (k <= maxLeaf) k else minLeaf
      val out = new ArrayBuffer[Byte](total.toInt)
      out ++= java.util.Arrays.copyOfRange(bytes, at, at + local)
      var page = u32(bytes, at + local)
      while (page != 0 && out.length < total) {
        val ps = pageStart(page.toInt)
        val take = math.min(usable - 4, total.toInt - out.length)
        out ++= java.util.Arrays.copyOfRange(bytes, ps + 4, ps + 4 + take)
        page = u32(bytes, ps)
      }
      (out.toArray, local + 4)
    }

    /** Walk a table b-tree rooted at `page`, invoking f(rowid, record). */
    def scan(page: Int)(f: (Long, Array[Byte]) => Unit): Unit = {
      val ps = pageStart(page)
      val hdr = if (page == 1) ps + 100 else ps
      val ptype = bytes(hdr) & 0xff
      val nCells = u16(bytes, hdr + 3)
      ptype match {
        case 0x0d => // leaf table
          var c = 0
          while (c < nCells) {
            var at = ps + u16(bytes, hdr + 8 + 2 * c)
            val (plen, n1) = varint(bytes, at); at += n1
            val (rowid, n2) = varint(bytes, at); at += n2
            val (rec, _) = payload(at, plen)
            f(rowid, rec)
            c += 1
          }
        case 0x05 => // interior table
          var c = 0
          while (c < nCells) {
            val at = ps + u16(bytes, hdr + 12 + 2 * c)
            scan(u32(bytes, at).toInt)(f)
            c += 1
          }
          scan(u32(bytes, hdr + 8).toInt)(f)
        case t => throw new IllegalArgumentException(s"unexpected b-tree page type 0x${t.toHexString}")
      }
    }
  }

  /** Decode one record (header varints → serial types → values).
    * Values: null / Long / Double / String / Array[Byte]. */
  private def record(rec: Array[Byte]): Seq[Any] = {
    val (hlen, n0) = varint(rec, 0)
    val types = new ArrayBuffer[Long]()
    var i = n0
    while (i < hlen) { val (t, n) = varint(rec, i); types += t; i += n }
    var at = hlen.toInt
    types.toSeq.map { t =>
      def intN(n: Int): Long = {
        var v = if ((rec(at) & 0x80) != 0) -1L else 0L
        var k = 0
        while (k < n) { v = (v << 8) | (rec(at + k) & 0xffL); k += 1 }
        at += n
        v
      }
      t match {
        case 0 => null
        case 1 => intN(1)
        case 2 => intN(2)
        case 3 => intN(3)
        case 4 => intN(4)
        case 5 => intN(6)
        case 6 => intN(8)
        case 7 =>
          val v = java.lang.Double.longBitsToDouble(intN(8)); v
        case 8 => 0L
        case 9 => 1L
        case n if n >= 13 && n % 2 == 1 =>
          val len = ((n - 13) / 2).toInt; val s = new String(rec, at, len, "UTF-8"); at += len; s
        case n if n >= 12 =>
          val len = ((n - 12) / 2).toInt; val b = java.util.Arrays.copyOfRange(rec, at, at + len); at += len; b
      }
    }
  }

  /** Crude-but-sufficient DDL column extraction: top-level
    * comma-separated items inside the outer parens; items starting with
    * a constraint keyword are dropped. */
  private def ddlColumns(sql: String): Seq[Column] = {
    val inner = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    val items = new ArrayBuffer[String]()
    var depth = 0; var start = 0
    inner.zipWithIndex.foreach {
      case ('(', _) => depth += 1
      case (')', _) => depth -= 1
      case (',', i) if depth == 0 => items += inner.substring(start, i); start = i + 1
      case _ => ()
    }
    items += inner.substring(start)
    val constraintKw = Set("PRIMARY", "UNIQUE", "FOREIGN", "CHECK", "CONSTRAINT")
    items.toSeq
      .map(_.trim)
      .filter(it => it.nonEmpty && !constraintKw.contains(it.split("\\s+").head.toUpperCase))
      .map { it =>
        val parts = it.split("\\s+")
        val name = parts.head.stripPrefix("\"").stripSuffix("\"")
        val declared = if (parts.length > 1) parts(1).toUpperCase else ""
        val isIpk = it.toUpperCase.contains("INTEGER PRIMARY KEY")
        Column(name, declared, isIpk)
      }
  }

  /** Parse sqlite_master for table name → (rootpage, columns). */
  def tables(bytes: Array[Byte]): Map[String, Table] = {
    val db = new Db(bytes)
    val out = Map.newBuilder[String, Table]
    db.scan(1) { (_, rec) =>
      record(rec) match {
        case Seq("table", name: String, _, root: Long, sql: String) =>
          out += name -> Table(name, root.toInt, ddlColumns(sql))
        case _ => ()
      }
    }
    out.result()
  }

  /** Scan one table into raw rows (IPK columns materialize the rowid —
    * SQLite stores them as NULL in the record). */
  def readTable(bytes: Array[Byte], table: String): (Table, Seq[Seq[Any]]) = {
    val t = tables(bytes).getOrElse(table, throw new NoSuchElementException(s"table $table"))
    val db = new Db(bytes)
    val rows = new ArrayBuffer[Seq[Any]]()
    db.scan(t.rootPage) { (rowid, rec) =>
      val vals = record(rec)
      rows += t.columns.zipWithIndex.map { case (c, i) =>
        val v = if (i < vals.length) vals(i) else null
        if (c.isIpk && v == null) rowid else v
      }
    }
    (t, rows.toSeq)
  }

  /** GeoPackage geometry blob → (x, y) for POINT geometries
    * (gpkg spec §2.1.3: "GP" magic, flags byte with envelope size +
    * header byte order, srs, envelope, then standard WKB). */
  def parsePoint(blob: Array[Byte]): Option[(Double, Double)] = {
    if (blob == null || blob.length < 21 || blob(0) != 'G' || blob(1) != 'P') return None
    val flags = blob(3) & 0xff
    val envSize = ((flags >> 1) & 0x7) match {
      case 0 => 0; case 1 => 32; case 2 => 48; case 3 => 48; case 4 => 64; case _ => return None
    }
    val wkbAt = 8 + envSize
    if (blob.length < wkbAt + 21) return None
    val le = blob(wkbAt) == 1
    val bb = java.nio.ByteBuffer
      .wrap(blob, wkbAt + 1, blob.length - wkbAt - 1)
      .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
    val wkbType = bb.getInt() & 0xff
    if (wkbType != 1) return None // POINT (2D) only here
    Some((bb.getDouble(), bb.getDouble()))
  }

  // ---- Spark face -------------------------------------------------------

  private def sparkType(c: Column): DataType =
    if (c.declared.contains("INT")) LongType
    else if (c.declared.startsWith("REAL") || c.declared.startsWith("DOUB") || c.declared.startsWith("FLOA")) DoubleType
    else if (c.declared.startsWith("BLOB") || c.declared.isEmpty) BinaryType
    else StringType

  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (x: Long, LongType) => x
    case (x: Long, DoubleType) => x.toDouble
    case (x: Double, DoubleType) => x
    case (x: Double, LongType) => x.toLong
    case (x: String, StringType) => x
    case (x, StringType) => x.toString
    case (x: Array[Byte], BinaryType) => x
    case _ => null
  }

  /** Read a GPKG feature table as a DataFrame: attribute columns typed
    * from the DDL plus `lon`/`lat` decoded from the geometry blob. One
    * file = one `binaryFile` split = one parse task. The schema is
    * sniffed driver-side from the (tiny) sqlite_master page; row
    * decode runs executor-side. */
  def featureTable(s: SparkSession, path: String, table: String): DataFrame = {
    // Sniff through the Hadoop FileSystem API so the driver-side schema
    // read accepts the same path semantics (file:/hdfs:/s3a: URIs,
    // globs) as the executor-side binaryFile scan below.
    val sniff = {
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      val st = Option(fs.globStatus(hPath)).filter(_.nonEmpty).map(_.head.getPath).getOrElse(hPath)
      val len = fs.getFileStatus(st).getLen
      require(len <= Int.MaxValue, s"gpkg too large for driver-side schema sniff: $len bytes")
      val buf = new Array[Byte](len.toInt)
      val in = fs.open(st)
      try in.readFully(0, buf)
      finally in.close()
      buf
    }
    val t = tables(sniff)(table)
    val attrCols = t.columns.filterNot(c => sparkType(c) == BinaryType && c.declared.startsWith("BLOB"))
    val schema = StructType(
      attrCols.map(c => StructField(c.name, sparkType(c), nullable = true)) ++
        Seq(StructField("lon", DoubleType), StructField("lat", DoubleType))
    )
    val geomIdx = t.columns.indexWhere(c => c.declared.startsWith("BLOB"))
    val attrIdx = attrCols.map(c => t.columns.indexWhere(_.name == c.name))
    val types = attrCols.map(sparkType)
    val rows = s.read
      .format("binaryFile")
      .load(path)
      .select(col("content"))
      .rdd
      .flatMap { fileRow =>
        val bytes = fileRow.getAs[Array[Byte]](0)
        val (_, raw) = readTable(bytes, table)
        raw.map { vals =>
          val attrs = attrIdx.zip(types).map { case (i, dt) => coerce(vals(i), dt) }
          val pt = if (geomIdx >= 0) parsePoint(vals(geomIdx).asInstanceOf[Array[Byte]]) else None
          org.apache.spark.sql.Row.fromSeq(attrs ++ Seq(pt.map(_._1).orNull, pt.map(_._2).orNull))
        }
      }
    s.createDataFrame(rows, schema)
  }
}
