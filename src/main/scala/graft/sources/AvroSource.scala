package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.AvroOcf._

/** DataSource V2 face for Avro object container files:
  * `spark.read.format("avroocf").load(path...)`.
  *
  * Spark-first shape: schema comes from the file header (the format's
  * own index — top-level record required, fields -> columns); one
  * InputPartition per BYTE RANGE (`splitBytes` option, default 32 MiB
  * — the OCF sync-marker design makes any range a valid task, blocks
  * owned by the DataFileReader.pastSync rule); and COLUMN PRUNING is
  * pushed to the Avro WIRE level: a pruned field's bytes are skipped
  * honoring lengths but never decoded or validated (no UTF-8, no
  * bool/enum range checks, sized array/map blocks skipped wholesale).
  * AvroSourceSpec proves it by poisoning a pruned field's value —
  * the full read fails, the pruned read succeeds.
  *
  * Read-only: the write side stays [[AvroOcf.encodeFile]]. */
final class AvroSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "avroocf"

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
          .filter(c => c.isFile && c.getName.endsWith(".avro"))
          .map(_.getPath)
          .sorted
      else Seq(p)
    }
    require(expanded.nonEmpty, "avroocf: no input paths")
    expanded
  }

  private def splitBytes(options: CaseInsensitiveStringMap): Long =
    Option(options.get("splitBytes")).map(_.toLong).getOrElse(32L << 20)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroSource.headerOf(paths(options).head)._2

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new AvroTable(paths(opts), splitBytes(opts), schema)
  }

  override def supportsExternalMetadata(): Boolean = true
}

private[sources] object AvroSource {
  def headerOf(path: String): (Header, StructType) = {
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      val h = AvroOcf.readHeader(
        n => { raf.seek(0); val b = new Array[Byte](n); raf.readFully(b); b }, raf.length())
      val st = AvroOcf.sparkType(h.schema) match {
        case s: StructType => s
        case t => throw new AvroError(s"avroocf: top-level record required, got $t")
      }
      (h, st)
    } finally raf.close()
  }
}

private final class AvroTable(paths: Seq[String], splitBytes: Long, tableSchema: StructType)
    extends Table
    with SupportsRead {
  override def name(): String =
    s"avroocf(${paths.head}${if (paths.length > 1) s" +${paths.length - 1}" else ""})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(paths, splitBytes, tableSchema)
}

private final class AvroScanBuilder(paths: Seq[String], splitBytes: Long, full: StructType)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new AvroScan(paths, splitBytes, required)
}

private final case class AvroRangePartition(path: String, start: Long, end: Long)
  extends InputPartition

private final class AvroScan(paths: Seq[String], splitBytes: Long, required: StructType)
    extends Scan
    with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"avroocf ${paths.length} file(s), fields [${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    paths.flatMap { p =>
      val len = new java.io.File(p).length()
      val n = math.max(1L, (len + splitBytes - 1) / splitBytes)
      (0L until n).map(i => AvroRangePartition(p, i * splitBytes, math.min(len, (i + 1) * splitBytes)))
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required)
}

private final class AvroReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AvroRangePartition]
    new AvroPartitionReader(p, required)
  }
}

private final class AvroPartitionReader(p: AvroRangePartition, required: StructType)
    extends PartitionReader[InternalRow] {

  private val toCatalyst = org.apache.spark.sql.catalyst.CatalystTypeConverters
    .createToCatalystConverter(required)
  private val wanted = required.fieldNames.toSet
  private val raf = new java.io.RandomAccessFile(p.path, "r")
  private val header = AvroOcf.readHeader(
    n => { raf.seek(0); val b = new Array[Byte](n); raf.readFully(b); b }, raf.length())
  private val fieldTypes: Map[String, AvType] = header.schema match {
    case r: VRecord => r.fields.map(f => f.name -> f.tpe).toMap
    case t => throw new AvroError(s"avroocf: top-level record required, got $t")
  }
  private val rowIt: Iterator[InternalRow] =
    AvroOcf.blocksInRange(raf, header, p.start, p.end).flatMap { case (count, data) =>
      AvroOcf.decodeBlockPruned(header.schema, data, count, wanted.contains).map { m =>
        val vals = required.fields.map { f =>
          AvroOcf.toRowValue(fieldTypes(f.name), m(f.name))
        }
        toCatalyst(Row.fromSeq(vals.toSeq)).asInstanceOf[InternalRow]
      }
    }

  private var current: InternalRow = _
  override def next(): Boolean = {
    if (!rowIt.hasNext) false
    else { current = rowIt.next(); true }
  }
  override def get(): InternalRow = current
  override def close(): Unit = raf.close()
}
