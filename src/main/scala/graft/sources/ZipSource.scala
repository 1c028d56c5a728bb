package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 face for ZIP archives (the WebDataset shard shape):
  * `spark.read.format("zipentries").load(path...)` with schema
  * `(path, name, method, size, content)`.
  *
  * Spark-first shape: the DRIVER reads only each archive's EOCD tail
  * (entry COUNT, central-directory extent — never the directory
  * itself, never payloads); entry-index ranges fan out as
  * InputPartitions, each task parses the central directory once
  * (metadata-scale) and takes its slice. Two pushdowns reach the
  * ranged fetch:
  *  - entry-NAME predicates (=, IN, startsWith/endsWith/contains)
  *    filter ON THE CATALOG before any payload byte moves — only
  *    matching entries are ranged-read and decompressed
  *  - pruning the `content` column skips payload fetch AND decode
  *    entirely (catalog-only scans never touch entry bytes)
  * ZipSourceSpec proves both by poisoning one entry's compressed
  * payload: the full read fails, while a name-filtered read and a
  * catalog-only read succeed around it. */
final class ZipSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zipentries"

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw =
      if (options.containsKey("paths")) graft.core.MiniJson
        .arr(graft.core.MiniJson.parse(options.get("paths")))
        .map(graft.core.MiniJson.str)
      else Option(options.get("path")).toSeq
    val expanded = raw.flatMap { p =>
      val f = new java.io.File(p)
      if (f.isDirectory)
        f.listFiles().toSeq
          .filter(c => c.isFile && c.getName.toLowerCase.endsWith(".zip"))
          .map(_.getPath)
          .sorted
      else Seq(p)
    }
    require(expanded.nonEmpty, "zipentries: no input paths")
    expanded
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ZipSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ZipTable(paths(new CaseInsensitiveStringMap(properties)))

  override def supportsExternalMetadata(): Boolean = true
}

private[sources] object ZipSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("method", IntegerType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  /** Compile the pushed name predicates to one test. */
  def namePredicate(filters: Seq[Filter]): String => Boolean = {
    val tests = filters.map {
      case EqualTo("name", v: String) => (n: String) => n == v
      case In("name", vs) => { val set = vs.collect { case s: String => s }.toSet; (n: String) => set(n) }
      case StringStartsWith("name", v) => (n: String) => n.startsWith(v)
      case StringEndsWith("name", v) => (n: String) => n.endsWith(v)
      case StringContains("name", v) => (n: String) => n.contains(v)
      case f => throw new IllegalArgumentException(s"zipentries: unexpected pushed filter $f")
    }
    n => tests.forall(_(n))
  }

  def isPushable(f: Filter): Boolean = f match {
    case EqualTo("name", _: String) => true
    case In("name", vs) => vs.forall(_.isInstanceOf[String])
    case StringStartsWith("name", _) => true
    case StringEndsWith("name", _) => true
    case StringContains("name", _) => true
    case _ => false
  }
}

private final class ZipTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String =
    s"zipentries(${paths.head}${if (paths.length > 1) s" +${paths.length - 1}" else ""})"
  override def schema(): StructType = ZipSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZipScanBuilder(paths)
}

private final class ZipScanBuilder(paths: Seq[String])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = ZipSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accept, remain) = filters.partition(ZipSource.isPushable)
    pushed = accept
    remain // Spark re-evaluates the rest above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new ZipScan(paths, required, pushed)
}

/** Entry-index slice [from, until) of one archive's catalog. */
private final case class ZipEntryRangePartition(path: String, from: Long, until: Long)
    extends InputPartition

private final class ZipScan(paths: Seq[String], required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"zipentries ${paths.length} archive(s), columns [${required.fieldNames.mkString(",")}]" +
      (if (pushed.nonEmpty) s", pushed name filters: ${pushed.mkString(", ")}" else "")

  override def planInputPartitions(): Array[InputPartition] =
    paths.flatMap { p =>
      // driver cost: the EOCD tail only — the directory parses in tasks
      val raf = new java.io.RandomAccessFile(p, "r")
      val count =
        try {
          val len = raf.length()
          val ranged: (Long, Int) => Array[Byte] = (off, n) => {
            val a = new Array[Byte](n); raf.seek(off); raf.readFully(a); a
          }
          Zip.centralDirectoryExtent(ranged, len)._3
        } finally raf.close()
      val slices = math.max(1, math.min(count, 32L))
      val per = (count + slices - 1) / slices
      (0L until count by per).map(i => ZipEntryRangePartition(p, i, math.min(i + per, count)))
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ZipReaderFactory(required, pushed)
}

private final class ZipReaderFactory(required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ZipEntryRangePartition]
    new ZipPartitionReader(p, required, pushed)
  }
}

private final class ZipPartitionReader(
    part: ZipEntryRangePartition,
    required: StructType,
    pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val pred = ZipSource.namePredicate(pushed.toSeq)
  private val toCatalyst = org.apache.spark.sql.catalyst.CatalystTypeConverters
    .createToCatalystConverter(required)

  private val raf = new java.io.RandomAccessFile(part.path, "r")
  private val fileLen = raf.length()
  private def ranged(off: Long, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); raf.seek(off); raf.readFully(a); a
  }

  /** This slice's catalog rows, name-filtered BEFORE any payload I/O. */
  private val entryIt: Iterator[Zip.Entry] = {
    val (cdOff, cdSize, count) = Zip.centralDirectoryExtent(ranged, fileLen)
    require(cdSize <= Int.MaxValue - 8, "zipentries: central directory exceeds one buffer")
    val all = Zip.parseCentralDirectory(ranged(cdOff, cdSize.toInt), count)
    all.slice(part.from.toInt, part.until.toInt).iterator.filter(e => pred(e.name))
  }

  private def rowOf(e: Zip.Entry): InternalRow = {
    val vals = required.fields.map { f =>
      f.name match {
        case "path" => part.path
        case "name" => e.name
        case "method" => e.method
        case "size" => e.uncompressedSize
        case "content" =>
          // only reached for surviving entries with content required —
          // the ranged fetch + inflate happens exactly here
          Zip.decodeEntry(ranged(e.localHeaderOffset, Zip.fetchLen(e, fileLen)), e)
        case other => throw new IllegalArgumentException(s"zipentries: unknown column $other")
      }
    }
    toCatalyst(Row.fromSeq(vals.toSeq)).asInstanceOf[InternalRow]
  }

  private var current: InternalRow = _
  override def next(): Boolean = {
    if (!entryIt.hasNext) false
    else { current = rowOf(entryIt.next()); true }
  }
  override def get(): InternalRow = current
  override def close(): Unit = raf.close()
}
