package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 face for TFRecord shards:
  * `spark.read.format("tfrecord").load(path...)`.
  *
  * Spark-first shape: schema is inferred from a SAMPLE of the first
  * shard's records (feature name -> array column: Int64List ->
  * array<long>, FloatList -> array<float>, BytesList ->
  * array<binary>; a record missing a feature reads null), one
  * InputPartition per shard file (the format's split unit — records
  * are length-framed with no index, so the file is the natural task),
  * and COLUMN PRUNING is pushed to the protobuf WIRE level
  * ([[TfRecord.parseExample]]'s `wanted` overload): a pruned
  * feature's value bytes are length-skipped, never decoded or
  * validated — TfRecordSourceSpec proves it by poisoning a pruned
  * feature's packed payload. `.gz` shards inflate per task.
  *
  * Read-only: the write side stays [[TfRecord.frame]] /
  * [[TfRecord.encodeExample]] (shard writers own their sharding). */
final class TfRecordSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tfrecord"

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
          .filter(c => c.isFile && TfRecordSource.isShard(c.getName))
          .map(_.getPath)
          .sorted
      else Seq(p)
    }
    require(expanded.nonEmpty, "tfrecord: no input paths")
    expanded
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TfRecordSource.inferFrom(paths(options).head)

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new TfRecordTable(paths(new CaseInsensitiveStringMap(properties)), schema)

  override def supportsExternalMetadata(): Boolean = true
}

private[sources] object TfRecordSource {
  def isShard(name: String): Boolean =
    name.endsWith(".tfrecord") || name.endsWith(".tfrecords") ||
      name.endsWith(".tfrecord.gz") || name.endsWith(".tfrecords.gz")

  def shardBytes(path: String): Array[Byte] = {
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    if (path.endsWith(".gz")) TfRecord.gunzip(raw) else raw
  }

  /** Feature catalog from the first up-to-32 records: name -> element
    * type. Kind drift across the sample refuses loudly. */
  def inferFrom(path: String): StructType = {
    val bytes = shardBytes(path)
    val kinds = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    TfRecord.records(bytes).take(32).foreach { rec =>
      TfRecord.parseExample(rec).foreach { case (name, feat) =>
        val dt = feat match {
          case TfRecord.Int64List(_) => LongType
          case TfRecord.FloatList(_) => FloatType
          case TfRecord.BytesList(_) => BinaryType
        }
        kinds.get(name) match {
          case Some(prev) if prev != dt =>
            throw new TfRecord.TfRecordError(s"tfrecord: feature '$name' kind drift ($prev vs $dt)")
          case _ => kinds(name) = dt
        }
      }
    }
    require(kinds.nonEmpty, s"tfrecord: no features in the first records of $path")
    StructType(kinds.toSeq.map { case (n, dt) =>
      StructField(n, ArrayType(dt, containsNull = false), nullable = true)
    })
  }
}

private final class TfRecordTable(paths: Seq[String], tableSchema: StructType)
    extends Table
    with SupportsRead {
  override def name(): String =
    s"tfrecord(${paths.head}${if (paths.length > 1) s" +${paths.length - 1}" else ""})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TfRecordScanBuilder(paths, tableSchema)
}

private final class TfRecordScanBuilder(paths: Seq[String], full: StructType)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new TfRecordScan(paths, required)
}

private final case class TfRecordShardPartition(path: String) extends InputPartition

private final class TfRecordScan(paths: Seq[String], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"tfrecord ${paths.length} shard(s), features [${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(TfRecordShardPartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new TfRecordReaderFactory(required)
}

private final class TfRecordReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TfRecordShardPartition]
    new TfRecordPartitionReader(p.path, required)
  }
}

private final class TfRecordPartitionReader(path: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val toCatalyst = org.apache.spark.sql.catalyst.CatalystTypeConverters
    .createToCatalystConverter(required)
  private val wantedNames = required.fieldNames.toSet
  private val recIt = TfRecord.records(TfRecordSource.shardBytes(path))

  private def rowOf(rec: Array[Byte]): InternalRow = {
    // wire-level pruning: unwanted features' value bytes are skipped
    val feats = TfRecord.parseExample(rec, wantedNames.contains)
    val vals = required.fields.map { f =>
      feats.get(f.name) match {
        case None => null
        case Some(feat) =>
          val elem = f.dataType.asInstanceOf[ArrayType].elementType
          (feat, elem) match {
            case (TfRecord.BytesList(Nil), _) => Nil // kind-unset Feature: empty of any kind
            case (TfRecord.Int64List(vs), LongType) => vs
            case (TfRecord.FloatList(vs), FloatType) => vs
            case (TfRecord.BytesList(vs), BinaryType) => vs
            case (other, want) =>
              throw new TfRecord.TfRecordError(
                s"tfrecord: feature '${f.name}' is ${other.getClass.getSimpleName}, schema wants array<$want>")
          }
      }
    }
    toCatalyst(Row.fromSeq(vals.toSeq)).asInstanceOf[InternalRow]
  }

  private var current: InternalRow = _
  override def next(): Boolean = {
    if (!recIt.hasNext) false
    else { current = rowOf(recIt.next()); true }
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
