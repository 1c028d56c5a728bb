package graft

import java.sql.{Date, Timestamp}
import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.sources.{ParquetData, ParquetMeta, ParquetWrite}

/** Parquet writer conformance: every file OUR writer emits must be
  * read back row-for-row by Spark's own reader (parquet-mr) — the
  * LIVE reference — across codecs, nesting, both value encodings and
  * row-group splits; [[ParquetData.read]] round-trips the same files
  * so reader and writer cannot drift apart. */
class ParquetWriteSpec extends SparkSuite {

  private def norm(v: Any): Any = v match {
    case a: Array[Byte] => a.toList
    case m: scala.collection.Map[_, _] => m.toSeq.map { case (k, x) => (norm(k), norm(x)) }.sortBy(_.toString)
    case s: scala.collection.Seq[_] => s.map(norm)
    case r: Row => r.toSeq.map(norm)
    case d: java.math.BigDecimal => d.stripTrailingZeros()
    case x => x
  }

  private def assertSameRows(ours: DataFrame, ref: DataFrame, label: String): Unit = {
    val a = ours.collect().map(r => r.toSeq.map(norm)).sortBy(_.toString)
    val b = ref.collect().map(r => r.toSeq.map(norm)).sortBy(_.toString)
    assert(a.length == b.length, s"$label: ${a.length} vs ${b.length} rows")
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"$label row $i:\n got:  $x\n want: $y")
    }
  }

  private def writeRead(df: DataFrame, codec: String, label: String,
      rowGroupRows: Int = 100000): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"pqw_$label").toFile.getPath
    val paths = ParquetWrite.writeShards(df, dir, codec, rowGroupRows)
    assert(paths.nonEmpty, s"$label: no shards")
    assertSameRows(spark.read.parquet(dir), df, s"$label/$codec/spark-reads-ours")
    assertSameRows(ParquetData.read(spark, paths), df, s"$label/$codec/our-read")
    dir
  }

  private def allTypesDf(n: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("i32", IntegerType),
      StructField("i16", ShortType),
      StructField("i8", ByteType),
      StructField("flag", BooleanType),
      StructField("f32", FloatType),
      StructField("f64", DoubleType),
      StructField("tag", StringType),
      StructField("txt", StringType),
      StructField("bin", BinaryType),
      StructField("day", DateType),
      StructField("ts_ltz", TimestampType),
      StructField("ts_ntz", TimestampNTZType),
      StructField("dec9", DecimalType(9, 2)),
      StructField("dec18", DecimalType(18, 3)),
      StructField("dec28", DecimalType(28, 4)),
      StructField("nums", ArrayType(IntegerType)),
      StructField("kv", MapType(StringType, LongType)),
      StructField("pt", StructType(Seq(
        StructField("x", DoubleType), StructField("y", LongType))))))
    val rows = (0 until n).map { i =>
      def nv[T](v: T): Any = if (i % 13 == 7) null else v
      Row(
        i.toLong,
        nv(i * 37 - 1000),
        nv((i % 3000 - 1500).toShort),
        nv((i % 256 - 128).toByte),
        nv(i % 3 == 0),
        nv(i / 7.0f),
        nv(i * math.Pi),
        nv(s"t${i % 17}"),
        nv(s"txt-$i-${"x" * (i % 29)}-é中"),
        nv(Array.tabulate(i % 11)(j => (i + j).toByte)),
        nv(Date.valueOf(java.time.LocalDate.ofEpochDay(i * 13 % 40000 - 3000))),
        nv(Timestamp.from(java.time.Instant.ofEpochSecond(i * 997L - 100000, (i % 1000) * 1000000L + i % 1000))),
        nv(LocalDateTime.ofEpochSecond(1400000000L + i * 7919L, (i % 997) * 1000, java.time.ZoneOffset.UTC)),
        nv(java.math.BigDecimal.valueOf(i * 211L - 400000L, 2)),
        nv(java.math.BigDecimal.valueOf(i * 1007L - 2000000L, 3)),
        nv(new java.math.BigDecimal(new java.math.BigInteger(s"${i * 7907L - 1}000000001"), 4)),
        nv((0 until i % 5).map(j => i * 10 + j)),
        nv(Map(s"k${i % 3}" -> i.toLong, "c" -> i * 2L)),
        nv(Row(i * 0.5, i * 11L)))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  test("parquet-mr reads our files: all types, every codec") {
    val df = allTypesDf(3000)
    for (codec <- Seq("none", "snappy", "gzip", "zstd"))
      writeRead(df, codec, "alltypes")
  }

  test("deep nesting through the writer") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("pts", ArrayType(StructType(Seq(
        StructField("x", IntegerType), StructField("tags", ArrayType(StringType)))))),
      StructField("m", MapType(StringType, ArrayType(LongType)))))
    val rows = (0 until 3000).map { i =>
      Row(
        i.toLong,
        if (i % 7 == 0) null
        else (0 until i % 4).map(j =>
          Row(if (j == 2) null else i + j,
            if (j == 1) null else (0 until j).map(k => s"t$k-$i"))),
        if (i % 11 == 3) null
        else Map(s"a$i" -> (0 until i % 3).map(_.toLong), "b" -> Seq.empty[Long]))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    for (codec <- Seq("none", "zstd")) writeRead(df, codec, "nesting")
  }

  test("dictionary pages are emitted for low-cardinality strings and read back") {
    import spark.implicits._
    val df = (0 until 30000).map(i => (i.toLong, s"t${i % 7}", s"u-$i-unique")).toDF("id", "lo", "hi")
    val dir = writeRead(df, "zstd", "dict")
    val p = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).map(_.getPath).min
    val f = ParquetMeta.readFooter(p)
    val encByCol = f.rowGroups.head.columns.map(c => c.pathInSchema -> c).toMap
    assert(encByCol(Seq("lo")).encodings.contains(8), "lo should be RLE_DICTIONARY")
    assert(encByCol(Seq("lo")).dictionaryPageOffset.isDefined, "lo should have a dictionary page")
    assert(!encByCol(Seq("hi")).encodings.contains(8), "hi should stay PLAIN")
  }

  test("multi row group files from our writer") {
    import spark.implicits._
    val df = (0 until 90000).map(i => (i.toLong, i * 31L, s"s${i % 100}")).toDF("a", "b", "c").coalesce(1)
    val dir = writeRead(df, "gzip", "rowgroups", rowGroupRows = 20000)
    val p = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).map(_.getPath).min
    assert(ParquetMeta.readFooter(p).rowGroups.length == 5, "expected 5 row groups")
  }

  test("real tables through the writer: events, documents, embeddings") {
    val ev = graft.Tables.events(spark, sf001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    writeRead(ev, "zstd", "events")
    writeRead(spark.read.parquet(s"$sf001/documents.parquet").limit(1500), "snappy", "documents")
    writeRead(spark.read.parquet(s"$sf001/embeddings.parquet").limit(1500), "gzip", "embeddings")
  }

  test("empty partitions write no shard") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "s").repartition(8)
    val dir = java.nio.file.Files.createTempDirectory("pqw_empty").toFile.getPath
    val paths = ParquetWrite.writeShards(df, dir, "zstd")
    assert(paths.length == 1)
    assert(spark.read.parquet(dir).count() == 1)
  }
}
