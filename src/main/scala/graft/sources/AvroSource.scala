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
  * Write side: `df.write.format("avroocf").option("codec", ...)`
  * writes one shard per partition (`part-NNNNN.avro`) through
  * [[AvroOcf.encodeFile]], task-committed via tmp-rename (the tmp
  * name carries the task id, so a zombie attempt never clobbers the
  * committed file). Nullable Spark fields become `[null, T]` unions;
  * nested structs become named records. AvroSourceSpec reads every
  * written shard back through avro-java. */
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
    val rawPath = Option(opts.get("path"))
    val expanded =
      try paths(opts)
      catch { case _: IllegalArgumentException if rawPath.isDefined => Seq.empty }
    new AvroTable(expanded, rawPath, splitBytes(opts), schema)
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

private final class AvroTable(paths: Seq[String], rawPath: Option[String],
    splitBytes: Long, tableSchema: StructType)
    extends Table
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = {
    val p = paths.headOption.orElse(rawPath).getOrElse("?")
    s"avroocf($p${if (paths.length > 1) s" +${paths.length - 1}" else ""})"
  }
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(paths.nonEmpty, "avroocf: no input files to read")
    new AvroScanBuilder(paths, splitBytes, tableSchema)
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo): org.apache.spark.sql.connector.write.WriteBuilder = {
    val dir = rawPath.getOrElse(
      throw new IllegalArgumentException("avroocf: write needs a single directory path"))
    val codec = Option(info.options.get("codec")).getOrElse("deflate")
    new AvroWriteBuilder(dir, info.schema(), codec)
  }
}

// ---------------------------------------------------------------- write

private[sources] object AvroWriteSupport {
  /** Spark type -> Avro schema; nullable positions become [null, T]
    * unions, nested structs become named records (deterministic
    * path-derived names). */
  def toAvro(dt: DataType, nullable: Boolean, path: String): AvType = {
    val base = dt match {
      case BooleanType => VBool
      case IntegerType => VInt
      case ShortType | ByteType => VInt
      case LongType => VLong
      case FloatType => VFloat
      case DoubleType => VDouble
      case StringType => VString
      case BinaryType => VBytes
      case ArrayType(et, cn) => VArray(toAvro(et, cn, s"${path}_item"))
      case MapType(StringType, vt, vcn) => VMap(toAvro(vt, vcn, s"${path}_value"))
      case st: StructType =>
        val r = new VRecord(s"r_$path")
        r.fields = st.fields.toVector.map(f => AvField(f.name, toAvro(f.dataType, f.nullable, s"${path}_${f.name}")))
        r
      case t => throw new AvroError(s"avroocf writer: unsupported Spark type $t at $path")
    }
    if (nullable) VUnion(Vector(VNull, base)) else base
  }

  /** Spark external value -> the raw shape [[AvroOcf.encodeFile]]
    * expects. */
  def toRaw(dt: DataType, v: Any): Any = (dt, v) match {
    case (_, null) => null
    case (st: StructType, r: org.apache.spark.sql.Row) =>
      st.fields.toVector.zipWithIndex.map { case (f, i) => toRaw(f.dataType, r.get(i)) }
    case (ArrayType(et, _), s: scala.collection.Seq[_]) => s.toVector.map(x => toRaw(et, x))
    case (MapType(StringType, vt, _), m: scala.collection.Map[_, _]) =>
      m.map { case (k, x) => k.asInstanceOf[String] -> toRaw(vt, x) }.toMap
    case (_, x) => x
  }
}

private final class AvroWriteBuilder(dir: String, schema: StructType, codec: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = { doTruncate = true; this }
  override def build(): org.apache.spark.sql.connector.write.Write = {
    val t = doTruncate
    new org.apache.spark.sql.connector.write.Write {
      // validate schema + codec at plan time
      schema.fields.foreach(f => AvroWriteSupport.toAvro(f.dataType, f.nullable, f.name))
      require(Seq("null", "deflate", "snappy", "bzip2", "xz", "zstandard").contains(codec),
        s"avroocf: unsupported codec '$codec'")
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new AvroBatchWrite(dir, schema, codec, t)
    }
  }
}

private final case class AvroCommitMessage(tmp: String, dst: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private final class AvroBatchWrite(dir: String, schema: StructType, codec: String, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo): org.apache.spark.sql.connector.write.DataWriterFactory = {
    val d = new java.io.File(dir)
    if (!d.exists()) require(d.mkdirs(), s"avroocf: cannot create $dir")
    if (truncate)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".avro") || f.getName.endsWith(".tmp"))
        .foreach(_.delete())
    new AvroWriterFactory(dir, schema, codec)
  }
  override def commit(messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    messages.foreach { m =>
      val c = m.asInstanceOf[AvroCommitMessage]
      val ok = new java.io.File(c.tmp).renameTo(new java.io.File(c.dst))
      require(ok, s"avroocf: commit rename ${c.tmp} -> ${c.dst} failed")
    }
  override def abort(messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    messages.foreach {
      case AvroCommitMessage(tmp, _) => new java.io.File(tmp).delete()
      case _ => ()
    }
}

private final class AvroWriterFactory(dir: String, schema: StructType, codec: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new AvroDataWriter(dir, schema, codec, partitionId, taskId)
}

private final class AvroDataWriter(dir: String, schema: StructType, codec: String,
    partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val toScala = org.apache.spark.sql.catalyst.CatalystTypeConverters
    .createToScalaConverter(schema)
  private val record: VRecord = {
    val r = new VRecord("R")
    r.fields = schema.fields.toVector.map(f =>
      AvField(f.name, AvroWriteSupport.toAvro(f.dataType, f.nullable, f.name)))
    r
  }
  private val rows = scala.collection.mutable.ArrayBuffer.empty[Any]

  override def write(rec: InternalRow): Unit = {
    val row = toScala(rec).asInstanceOf[Row]
    rows += schema.fields.toVector.zipWithIndex.map { case (f, i) =>
      AvroWriteSupport.toRaw(f.dataType, row.get(i))
    }
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    val bytes = AvroOcf.encodeFile(record, rows.toSeq, codec, blockRows = 4096)
    val dst = f"$dir/part-$partitionId%05d.avro"
    val tmp = s"$dst.$taskId.tmp"
    java.nio.file.Files.write(java.nio.file.Paths.get(tmp), bytes)
    AvroCommitMessage(tmp, dst)
  }

  override def abort(): Unit = ()
  override def close(): Unit = ()
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
