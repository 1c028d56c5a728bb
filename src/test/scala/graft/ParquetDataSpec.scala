package graft

import java.sql.{Date, Timestamp}
import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.sources.{ParquetData, ParquetMeta}

/** Parquet data-page decoder conformance, LIVE against Spark's own
  * reader (parquet-mr): row-for-row equality on Spark-written files
  * across codecs AND on the pyarrow-written driver testdata (two
  * independent reference producers), dictionary + plain-fallback
  * coverage proven from the footer, multi row group, Dremel nesting,
  * chunk-level pruning poison proof, hostile refusals. */
class ParquetDataSpec extends SparkSuite {

  private def pqFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isFile) Seq(f.getPath)
    else f.listFiles().filter(c => c.isFile && c.getName.endsWith(".parquet")).map(_.getPath).sorted.toSeq
  }

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
      assert(x == y, s"$label row $i:\n ours: $x\n ref:  $y")
    }
  }

  private def roundTrip(df: DataFrame, codec: String, label: String,
      extra: Map[String, String] = Map.empty): String = {
    val out = java.nio.file.Files.createTempDirectory(s"pqd_$label").toFile.getPath
    val w = df.write.mode("overwrite").option("compression", codec)
    extra.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }.parquet(out)
    assertSameRows(ParquetData.read(spark, pqFiles(out)), spark.read.parquet(out), s"$label/$codec")
    out
  }

  test("all-types frame round-trips across every writable codec") {
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
      StructField("dec", DecimalType(12, 2)),
      StructField("bigdec", DecimalType(28, 4)),
      StructField("nums", ArrayType(IntegerType)),
      StructField("kv", MapType(StringType, LongType)),
      StructField("pt", StructType(Seq(
        StructField("x", DoubleType), StructField("y", LongType))))))
    val rows = (0 until 4000).map { i =>
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
        nv(java.math.BigDecimal.valueOf(i * 1007L - 2000000L, 2)),
        nv(new java.math.BigDecimal(new java.math.BigInteger(s"${i * 7907L}000000001"), 4)),
        nv((0 until i % 5).map(j => i * 10 + j)),
        nv(Map(s"k${i % 3}" -> i.toLong, "c" -> i * 2L)),
        nv(Row(i * 0.5, i * 11L)))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    for (codec <- Seq("none", "snappy", "gzip", "zstd"))
      roundTrip(df, codec, "alltypes")
  }

  test("the pyarrow-written driver testdata reads back exactly (second producer)") {
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")) {
      val p = s"$sf0001/$t.parquet"
      assertSameRows(ParquetData.read(spark, Seq(p)), spark.read.parquet(p), s"testdata/$t")
    }
    // and the bigger events/embeddings at sf0.01
    for (t <- Seq("events", "embeddings")) {
      val p = s"$sf001/$t.parquet"
      assertSameRows(ParquetData.read(spark, Seq(p)), spark.read.parquet(p), s"testdata001/$t")
    }
  }

  test("dictionary AND plain-fallback pages both occur and decode") {
    import spark.implicits._
    // low-cardinality -> dictionary; unique long strings overflow the
    // dictionary threshold -> writer falls back to PLAIN mid-chunk
    val df = (0 until 60000).map(i => (i.toLong, s"t${i % 5}", s"u-$i-${"q" * 60}")).toDF("id", "lo", "hi")
    val out = roundTrip(df, "zstd", "fallback", Map("parquet.dictionary.page.size" -> "4096"))
    val f = ParquetMeta.readFooter(pqFiles(out).head)
    val encByCol = f.rowGroups.head.columns.map(c => c.pathInSchema -> c.encodings.toSet).toMap
    val lo = encByCol(Seq("lo")); val hi = encByCol(Seq("hi"))
    assert(lo.contains(8) || lo.contains(2), s"lo should be dictionary-encoded: $lo")
    assert(hi.contains(0), s"hi should contain a PLAIN fallback: $hi")
  }

  test("multi row group: one task per group, rows survive") {
    import spark.implicits._
    val df = (0 until 150000).map(i => (i.toLong, s"pad-${"y" * 30}-$i")).toDF("id", "pad").coalesce(1)
    val out = roundTrip(df, "snappy", "rowgroups", Map("parquet.block.size" -> (256 * 1024).toString))
    val f = ParquetMeta.readFooter(pqFiles(out).head)
    assert(f.rowGroups.length > 1, s"expected several row groups, got ${f.rowGroups.length}")
  }

  test("deep nesting: list of structs, struct of lists, nullable layers") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("pts", ArrayType(StructType(Seq(
        StructField("x", IntegerType), StructField("tags", ArrayType(StringType)))))),
      StructField("box", StructType(Seq(
        StructField("ids", ArrayType(LongType)),
        StructField("deep", StructType(Seq(StructField("s", StringType)))))))))
    val rows = (0 until 3000).map { i =>
      Row(
        i.toLong,
        if (i % 7 == 0) null
        else (0 until i % 4).map(j =>
          Row(if (j == 2) null else i + j,
            if (j == 1) null else (0 until j).map(k => s"t$k-$i"))),
        if (i % 11 == 3) null
        else Row(
          if (i % 5 == 0) Seq.empty[Long] else (0 until i % 3).map(_.toLong * i),
          if (i % 9 == 2) null else Row(s"s$i")))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    for (codec <- Seq("none", "zstd")) roundTrip(df, codec, "nesting")
  }

  test("pruning is chunk-level: a poisoned pruned column never fails the read") {
    import spark.implicits._
    val df = (0 until 20000).map(i => (i.toLong, s"keep-$i", s"boom-$i-${"z" * 50}")).toDF("id", "keep", "boom")
    val out = java.nio.file.Files.createTempDirectory("pqd_poison").toFile.getPath
    df.coalesce(1).write.mode("overwrite").option("compression", "zstd").parquet(out)
    val p = pqFiles(out).head
    val f = ParquetMeta.readFooter(p)
    val chunk = f.rowGroups.head.columns.find(_.pathInSchema == Seq("boom")).get
    val start = chunk.dictionaryPageOffset.filter(_ < chunk.dataPageOffset).getOrElse(chunk.dataPageOffset)
    val raf = new java.io.RandomAccessFile(p, "rw")
    try { raf.seek(start + 40); raf.write(Array.fill[Byte](16)(0x5a)) } finally raf.close()
    intercept[Exception] { ParquetData.read(spark, Seq(p)).collect() }
    val kept = ParquetData.read(spark, Seq(p), columns = Seq("id", "keep")).collect()
    assert(kept.length == 20000)
    assert(kept.head.schema.fieldNames.toSeq == Seq("id", "keep"))
  }

  test("hostile bytes refuse by name") {
    val p = s"$sf0001/region.parquet"
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val cut = java.io.File.createTempFile("pqd_cut", ".parquet")
    java.nio.file.Files.write(cut.toPath, bytes.take(bytes.length / 2) ++ bytes.takeRight(8))
    val e = intercept[Exception] { ParquetData.read(spark, Seq(cut.getPath)).collect() }
    assert(e.getMessage != null && e.getMessage.toLowerCase.contains("parquet"))
  }

  test("stats-based row-group pruning: excluded groups are never planned, results exact") {
    import spark.implicits._
    import graft.sources.ParquetData.ColRange
    val df = (0 until 200000).map(i => (i.toLong, s"pad-${"w" * 30}-$i")).toDF("id", "pad").coalesce(1)
    val out = java.nio.file.Files.createTempDirectory("pqd_prune").toFile.getPath
    df.write.mode("overwrite").option("compression", "snappy")
      .option("parquet.block.size", (256 * 1024).toString).parquet(out)
    val paths = pqFiles(out)
    val footers = paths.map(p => p -> ParquetMeta.readFooter(p))
    val total = footers.map(_._2.rowGroups.length).sum
    assert(total > 3, s"need several row groups, got $total")
    val filt = Some(ColRange("id", 10000L, 20000L))
    val (kept, planned) = graft.sources.ParquetData.planGroups(footers, filt)
    assert(planned == total)
    assert(kept.length < total, s"pruning kept ${kept.length} of $total")
    val ours = ParquetData.read(spark, paths, filter = filt).filter("id between 10000 and 20000")
    val ref = spark.read.parquet(out).filter("id between 10000 and 20000")
    assertSameRows(ours, ref, "prune")
  }
}
