package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 face for Arrow IPC files:
  * `spark.read.format("arrowipc").load(path...)`.
  *
  * Spark-first shape: schema comes from the file FOOTER (tail-only
  * driver reads), one InputPartition per record-batch block (the
  * format's own parallelism unit — a 10k-batch shard fans out to 10k
  * independently fetchable tasks), and COLUMN PRUNING is pushed into
  * the decoder ([[ArrowIpc.decodeBatchMessage]]'s `wanted` overload):
  * a pruned column's buffers are never materialized — on compressed
  * files its LZ4/ZSTD work is skipped entirely, which
  * ArrowSourceSpec proves by poisoning a pruned column's compressed
  * buffer and reading successfully around it.
  *
  * Scope: the FILE format (`.arrow`, Feather v2). Streams
  * (`.arrows`) have no index and stay on [[ArrowIpc.readStreamBytes]].
  */
final class ArrowSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "arrowipc"

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
          .filter(c => c.isFile && c.getName.endsWith(".arrow"))
          .map(_.getPath)
          .sorted
      else Seq(p)
    }
    require(expanded.nonEmpty, "arrowipc: no input paths")
    expanded
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val ps = paths(options)
    val f = ArrowSource.footerOf(ps.head)
    ArrowIpc.sparkSchema(f.schema)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ArrowTable(paths(new CaseInsensitiveStringMap(properties)), schema)

  override def supportsExternalMetadata(): Boolean = false
}

private[sources] object ArrowSource {
  def footerOf(path: String): ArrowIpc.Footer = {
    val raf = new java.io.RandomAccessFile(path, "r")
    try ArrowIpc.footer((off, n) => {
      val out = new Array[Byte](n)
      raf.seek(off)
      raf.readFully(out)
      out
    }, raf.length())
    finally raf.close()
  }
}

private final class ArrowTable(paths: Seq[String], tableSchema: StructType)
    extends Table
    with SupportsRead {
  override def name(): String = s"arrowipc(${paths.head}${if (paths.length > 1) s" +${paths.length - 1}" else ""})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowScanBuilder(paths, tableSchema)
}

private final class ArrowScanBuilder(paths: Seq[String], full: StructType)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new ArrowScan(paths, required)
}

private final case class ArrowBatchPartition(path: String, batchIdx: Int) extends InputPartition

private final class ArrowScan(paths: Seq[String], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"arrowipc ${paths.length} file(s), columns [${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    paths.flatMap { p =>
      // driver cost: one footer (tail) read per file — never batch data
      ArrowSource.footerOf(p).batches.indices.map(i => ArrowBatchPartition(p, i))
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowReaderFactory(required)
}

private final class ArrowReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ArrowBatchPartition]
    new ArrowPartitionReader(p.path, p.batchIdx, required)
  }
}

private final class ArrowPartitionReader(path: String, batchIdx: Int, required: StructType)
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      val ranged: (Long, Int) => Array[Byte] = (off, n) => {
        val out = new Array[Byte](n)
        raf.seek(off)
        raf.readFully(out)
        out
      }
      val f = ArrowIpc.footer(ranged, raf.length())
      val wantedNames = required.fieldNames.toSet
      val fieldIdx = f.schema.fields.zipWithIndex.filter { case (fld, _) => wantedNames.contains(fld.name) }
      require(fieldIdx.length == required.length, s"arrowipc: schema drift in $path")
      val wanted = fieldIdx.map(_._2).toSet
      // dictionaries referenced by a WANTED field must decode; others
      // are skipped like any pruned data
      val neededDictIds = fieldIdx.map(_._1).filter(_.dictId >= 0).map(_.dictId).toSet
      val dicts = f.dictionaries.flatMap { blk =>
        val msg = ranged(blk.offset, (blk.metaLen.toLong + blk.bodyLen).toInt)
        // a dictionary batch names its id in the metadata; decode all
        // (metadata-scale) but keep only the needed ones resident
        val (id, col) = ArrowIpc.decodeDictionaryMessage(msg, 0, f.schema)
        if (neededDictIds.contains(id)) Some(id -> col) else None
      }.toMap
      val blk = f.batches(batchIdx)
      val msg = ranged(blk.offset, (blk.metaLen.toLong + blk.bodyLen).toInt)
      val batch = ArrowIpc.decodeBatchMessage(msg, 0, f.schema, dicts, wanted.contains)
      // required-order column views
      val byName = f.schema.fields.map(_.name).zipWithIndex.toMap
      val cols = required.fieldNames.map(n => byName(n))
      val aFields = cols.map(c => f.schema.fields(c))
      val toCatalyst = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(required)
      (0 until batch.rows).iterator.map { r =>
        val vals = cols.indices.map { k =>
          ArrowIpc.toRowValue(aFields(k), batch.columns(cols(k))(r))
        }
        toCatalyst(Row.fromSeq(vals)).asInstanceOf[InternalRow]
      }.toVector.iterator
    } finally raf.close()
  }

  private var current: InternalRow = _
  override def next(): Boolean = { if (rows.hasNext) { current = rows.next(); true } else false }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
