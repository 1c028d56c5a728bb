package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Pure-JVM COPC (Cloud-Optimized Point Cloud 1.0) STRUCTURE reader —
  * the metadata/octree half of the reference's point-cloud tiler
  * (`src/library/pctiler.cpp` serves EPT-style octree nodes;
  * `entry.cpp` recognizes .copc.laz). A COPC file is LAS 1.4 whose
  * point data is laszip-compressed, but everything the TILER's query
  * planning needs is stored UNCOMPRESSED: the LAS public header, the
  * `copc` info VLR (record 1, first VLR at offset 375: octree center/
  * halfsize, point spacing, root hierarchy page location), and the
  * hierarchy pages — arrays of 32-byte entries (VoxelKey level/x/y/z,
  * chunk offset, byte size, point count; count −1 marks a child
  * page). This reader walks that structure; the laszip arithmetic
  * decoder itself stays out of scope with the other codecs
  * (COVERAGE boundary).
  *
  * [[hierarchyTable]] exposes the octree as a DataFrame with per-node
  * cube bounds derived from the root cube (node cube = root/2^level
  * at voxel (x,y,z)) — the relational face a distributed tiler
  * selects nodes from by bbox + resolution before ever touching point
  * bytes, exactly the reference's per-tile node walk re-expressed as
  * a filter.
  */
object Copc {

  final case class Info(
      centerX: Double,
      centerY: Double,
      centerZ: Double,
      halfSize: Double,
      spacing: Double,
      rootHierOffset: Long,
      rootHierSize: Long,
      pointCount: Long
  )

  final case class Node(
      level: Int,
      x: Int,
      y: Int,
      z: Int,
      offset: Long,
      byteSize: Int,
      pointCount: Int // -1 in the raw stream marks a child page; resolved pages never surface here
  )

  private def leU16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def leI32(b: Array[Byte], i: Int): Int = leU32(b, i).toInt
  private def leU64(b: Array[Byte], i: Int): Long = (0 until 8).map(k => (b(i + k) & 0xffL) << (8 * k)).sum
  private def leF64(b: Array[Byte], i: Int): Double = java.lang.Double.longBitsToDouble(leU64(b, i))

  /** The copc info VLR (user_id "copc", record_id 1) — REQUIRED to be
    * the first VLR, at offset 375 (COPC 1.0 §"copc info VLR"). Returns
    * None for anything that is not a COPC file. */
  def info(b: Array[Byte]): Option[Info] = {
    if (b == null || b.length < 375 + 54 + 160) return None
    if (!(b(0) == 'L' && b(1) == 'A' && b(2) == 'S' && b(3) == 'F')) return None
    if ((b(24) & 0xff) != 1 || (b(25) & 0xff) != 4) return None // COPC requires LAS 1.4
    val vlrUser = new String(b, 375 + 2, 16, "US-ASCII").takeWhile(c => c != 0.toChar && c != ' ')
    val recordId = leU16(b, 375 + 18)
    if (vlrUser != "copc" || recordId != 1) return None
    val p = 375 + 54
    val count = leU64(b, 247)
    Some(
      Info(
        centerX = leF64(b, p),
        centerY = leF64(b, p + 8),
        centerZ = leF64(b, p + 16),
        halfSize = leF64(b, p + 24),
        spacing = leF64(b, p + 32),
        rootHierOffset = leU64(b, p + 40),
        rootHierSize = leU64(b, p + 48),
        pointCount = count
      )
    )
  }

  /** Walk the hierarchy from the root page, resolving child pages
    * (pointCount = −1 entries) recursively; returns only point-chunk
    * nodes. Cycles/out-of-range offsets terminate the walk rather
    * than throw (flag, don't abort the scan). */
  def hierarchy(b: Array[Byte]): Seq[Node] = {
    val inf = info(b).getOrElse(return Seq.empty)
    val out = ArrayBuffer.empty[Node]
    val seen = scala.collection.mutable.Set.empty[Long]
    def page(offset: Long, size: Long): Unit = {
      if (offset < 0 || size <= 0 || offset + size > b.length || !seen.add(offset)) return
      val n = (size / 32).toInt
      (0 until n).foreach { i =>
        val p = offset.toInt + i * 32
        val node = Node(leI32(b, p), leI32(b, p + 4), leI32(b, p + 8), leI32(b, p + 12),
          leU64(b, p + 16), leI32(b, p + 24), leI32(b, p + 28))
        if (node.pointCount == -1) page(node.offset, node.byteSize.toLong)
        else if (node.pointCount >= 0) out += node
      }
    }
    page(inf.rootHierOffset, inf.rootHierSize)
    out.toSeq
  }

  /** Metadata face for the extraction scan: the same numbers the LAS
    * sniffer reports, plus the octree shape. */
  def meta(b: Array[Byte]): Option[PointCloud.CloudMeta] =
    info(b).map { inf =>
      PointCloud.CloudMeta(
        "copc",
        inf.pointCount,
        Seq("X", "Y", "Z", "Intensity", "Classification", "GpsTime"),
        Some(
          (inf.centerX - inf.halfSize, inf.centerY - inf.halfSize, inf.centerZ - inf.halfSize,
            inf.centerX + inf.halfSize, inf.centerY + inf.halfSize, inf.centerZ + inf.halfSize)
        )
      )
    }

  private val tableSchema = StructType(
    Seq(
      StructField("path", StringType),
      StructField("level", IntegerType),
      StructField("vx", IntegerType),
      StructField("vy", IntegerType),
      StructField("vz", IntegerType),
      StructField("chunk_offset", LongType),
      StructField("chunk_bytes", IntegerType),
      StructField("n_points", IntegerType),
      StructField("minx", DoubleType),
      StructField("miny", DoubleType),
      StructField("minz", DoubleType),
      StructField("maxx", DoubleType),
      StructField("maxy", DoubleType),
      StructField("maxz", DoubleType),
      StructField("resolution", DoubleType) // point spacing at this level
    )
  )

  /** ◆ Octree node table over an estate of .copc.laz assets: one file
    * = one `binaryFile` row = one parse task; node cube bounds are
    * top-level doubles, so a tiler's bbox+resolution node selection is
    * a plain filter that min/max-prunes under parquet like every
    * other layer — no point bytes are ever read to plan a tile. */
  def hierarchyTable(s: SparkSession, path: String): DataFrame = {
    val rows = s.read
      .format("binaryFile")
      .load(path)
      .select(col("path"), col("content"))
      .rdd
      .flatMap { r =>
        val p = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        info(bytes).toSeq.flatMap { inf =>
          hierarchy(bytes).map { n =>
            val cube = (2 * inf.halfSize) / (1L << n.level)
            Row(
              p, n.level, n.x, n.y, n.z, n.offset, n.byteSize, n.pointCount,
              inf.centerX - inf.halfSize + n.x * cube,
              inf.centerY - inf.halfSize + n.y * cube,
              inf.centerZ - inf.halfSize + n.z * cube,
              inf.centerX - inf.halfSize + (n.x + 1) * cube,
              inf.centerY - inf.halfSize + (n.y + 1) * cube,
              inf.centerZ - inf.halfSize + (n.z + 1) * cube,
              inf.spacing / (1L << n.level)
            )
          }
        }
      }
    s.createDataFrame(rows, tableSchema)
  }
}
