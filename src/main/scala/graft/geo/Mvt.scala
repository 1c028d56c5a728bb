package graft.geo

import scala.collection.mutable.ArrayBuffer

/** Mapbox Vector Tile (MVT 2.1) encoder — pure JVM, no GDAL.
  *
  * Closes the vector-tile half of the codec boundary the same way
  * `raster/Png` closed the raster half: the reference delegates the
  * byte encode to GDAL's MVT writer (`mvt.cpp` keeps only the zoom
  * budget, built as q_tile_math / `GeoQueries`); here the wire format
  * itself is implemented — protobuf varints, zigzag deltas, the
  * MoveTo/LineTo command stream — so a tile server can read this
  * engine's output directly.
  *
  * Split of responsibilities (the PNG pattern):
  *  - the RELATIONAL face — per-tile point gathering, 4096-extent
  *    quantization, sorted delta/zigzag COMMAND INTEGERS — is pure
  *    column math, oracled end-to-end (q_mvt: DuckDB recomputes every
  *    command integer);
  *  - the protobuf envelope around those integers is this encoder,
  *    spec-verified by round-trip decode (`MvtSpec`).
  */
object Mvt {

  /** Protobuf zigzag: maps signed to unsigned so small magnitudes stay
    * small on the wire. */
  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** MVT geometry command integer: id (1=MoveTo, 2=LineTo, 7=ClosePath)
    * packed with its repeat count. */
  def command(id: Int, count: Int): Long = (id & 0x7) | (count.toLong << 3)

  def varint(v: Long, out: ArrayBuffer[Byte]): Unit = {
    var x = v
    while ((x & ~0x7fL) != 0) {
      out += ((x & 0x7f) | 0x80).toByte
      x >>>= 7
    }
    out += (x & 0x7f).toByte
  }

  private def key(field: Int, wireType: Int, out: ArrayBuffer[Byte]): Unit =
    varint((field.toLong << 3) | wireType, out)

  private def bytesField(field: Int, payload: Array[Byte], out: ArrayBuffer[Byte]): Unit = {
    key(field, 2, out)
    varint(payload.length.toLong, out)
    out ++= payload
  }

  private def packedVarints(field: Int, vs: Seq[Long], out: ArrayBuffer[Byte]): Unit = {
    val body = new ArrayBuffer[Byte](vs.length * 2)
    vs.foreach(varint(_, body))
    bytesField(field, body.toArray, out)
  }

  /** Multipoint command stream over SORTED tile-local integer coords:
    * one MoveTo carrying every point as zigzag deltas from its
    * predecessor (first point deltas from (0,0)). This is EXACTLY the
    * integer sequence the q_mvt oracle recomputes in SQL. */
  def pointCommands(sorted: Seq[(Long, Long)]): Seq[Long] = {
    var px = 0L
    var py = 0L
    val out = new ArrayBuffer[Long](1 + sorted.length * 2)
    out += command(1, sorted.length) // MoveTo × n
    sorted.foreach { case (x, y) =>
      out += zigzag(x - px)
      out += zigzag(y - py)
      px = x; py = y
    }
    out.toSeq
  }

  /** One feature: id, MVT geometry type (1=POINT, 2=LINESTRING,
    * 3=POLYGON), command integers, tag index pairs. */
  final case class Feature(id: Long, geomType: Int, commands: Seq[Long], tags: Seq[Long] = Nil)

  private def encodeFeature(f: Feature): Array[Byte] = {
    val out = new ArrayBuffer[Byte](16 + f.commands.length * 2)
    key(1, 0, out); varint(f.id, out)
    if (f.tags.nonEmpty) packedVarints(2, f.tags, out)
    key(3, 0, out); varint(f.geomType.toLong, out)
    packedVarints(4, f.commands, out)
    out.toArray
  }

  /** MVT Value message restricted to the int64 variant (field 4) —
    * all this engine's tile attributes are counts. */
  private def encodeIntValue(v: Long): Array[Byte] = {
    val out = new ArrayBuffer[Byte](10)
    key(4, 0, out); varint(v, out)
    out.toArray
  }

  /** Encode one layer into a complete Tile message (layer = field 3 of
    * Tile; layer fields: 15=version, 1=name, 2=features, 3=keys,
    * 4=values, 5=extent). */
  def encodeTile(
      name: String,
      features: Seq[Feature],
      keys: Seq[String] = Nil,
      intValues: Seq[Long] = Nil,
      extent: Int = 4096
  ): Array[Byte] = {
    val layer = new ArrayBuffer[Byte](64)
    key(15, 0, layer); varint(2L, layer) // version 2
    bytesField(1, name.getBytes("UTF-8"), layer)
    features.foreach(f => bytesField(2, encodeFeature(f), layer))
    keys.foreach(k => bytesField(3, k.getBytes("UTF-8"), layer))
    intValues.foreach(v => bytesField(4, encodeIntValue(v), layer))
    key(5, 0, layer); varint(extent.toLong, layer)
    val tile = new ArrayBuffer[Byte](layer.length + 4)
    bytesField(3, layer.toArray, tile)
    tile.toArray
  }

  // ---- minimal decoder (spec round-trip; not a general protobuf lib) ----

  final case class DecodedLayer(
      version: Long,
      name: String,
      extent: Long,
      features: Seq[Feature],
      keys: Seq[String]
  )

  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def readBytes(): (Int, Int) = { // (start, end) of a length-delimited field
      val len = readVarint().toInt
      val s = pos; pos += len; (s, pos)
    }
  }

  /** Decode the first layer of a Tile message. */
  def decodeTile(bytes: Array[Byte]): DecodedLayer = {
    val tr = new Reader(bytes, 0, bytes.length)
    var layer: (Int, Int) = null
    while (tr.hasNext && layer == null) {
      val k = tr.readVarint()
      if ((k >> 3) == 3 && (k & 7) == 2) layer = tr.readBytes() else skip(tr, k)
    }
    require(layer != null, "no layer in tile")
    val lr = new Reader(bytes, layer._1, layer._2)
    var version = 0L; var name = ""; var extent = 4096L
    val features = new ArrayBuffer[Feature](); val keys = new ArrayBuffer[String]()
    while (lr.hasNext) {
      val k = lr.readVarint()
      (k >> 3, k & 7) match {
        case (15, 0) => version = lr.readVarint()
        case (1, 2)  => val (s, e) = lr.readBytes(); name = new String(bytes, s, e - s, "UTF-8")
        case (3, 2)  => val (s, e) = lr.readBytes(); keys += new String(bytes, s, e - s, "UTF-8")
        case (2, 2)  => val (s, e) = lr.readBytes(); features += decodeFeature(bytes, s, e)
        case (5, 0)  => extent = lr.readVarint()
        case _       => skip(lr, k)
      }
    }
    DecodedLayer(version, name, extent, features.toSeq, keys.toSeq)
  }

  private def decodeFeature(bytes: Array[Byte], s: Int, e: Int): Feature = {
    val r = new Reader(bytes, s, e)
    var id = 0L; var tpe = 0; val cmds = new ArrayBuffer[Long](); val tags = new ArrayBuffer[Long]()
    while (r.hasNext) {
      val k = r.readVarint()
      (k >> 3, k & 7) match {
        case (1, 0) => id = r.readVarint()
        case (3, 0) => tpe = r.readVarint().toInt
        case (4, 2) => val (cs, ce) = r.readBytes(); val cr = new Reader(bytes, cs, ce); while (cr.hasNext) cmds += cr.readVarint()
        case (2, 2) => val (ts, te) = r.readBytes(); val trd = new Reader(bytes, ts, te); while (trd.hasNext) tags += trd.readVarint()
        case _      => skip(r, k)
      }
    }
    Feature(id, tpe, cmds.toSeq, tags.toSeq)
  }

  private def skip(r: Reader, k: Long): Unit = (k & 7) match {
    case 0 => r.readVarint(); ()
    case 2 => r.readBytes(); ()
    case w => throw new IllegalArgumentException(s"unsupported wire type $w")
  }
}
