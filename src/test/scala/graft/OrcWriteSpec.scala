package graft

import java.sql.{Date, Timestamp}
import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.sources.{OrcData, OrcMeta, OrcWrite}

/** ORC writer conformance: every file OUR writer emits must be read
  * back row-for-row by Spark's own ORC reader (orc-core 2.2.2) — the
  * LIVE reference — across codecs, both string encodings, RLEv2
  * shapes, nulls, nesting, decimals and timestamps; [[OrcData.read]]
  * round-trips the same files so reader and writer cannot drift. */
class OrcWriteSpec extends SparkSuite {

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
      stripeRows: Int = 100000): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"orcw_$label").toFile.getPath
    val paths = OrcWrite.writeShards(df, dir, codec, stripeRows)
    assert(paths.nonEmpty, s"$label: no shards written")
    // LIVE: Spark's own reader (orc-core) on OUR bytes
    assertSameRows(spark.read.orc(dir), df, s"$label/$codec/spark-reads-ours")
    // and our own reader round-trips
    assertSameRows(OrcData.read(spark, paths), df, s"$label/$codec/our-read")
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
      StructField("dec", DecimalType(12, 2)),
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
        nv(java.math.BigDecimal.valueOf(i * 1007L - 2000000L, 2)),
        nv((0 until i % 5).map(j => i * 10 + j)),
        nv(Map(s"k${i % 3}" -> i.toLong, "c" -> i * 2L)),
        nv(Row(i * 0.5, i * 11L)))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  test("orc-core reads our files: all types, every codec") {
    val df = allTypesDf(3000)
    for (codec <- Seq("none", "zlib", "snappy", "lz4", "zstd"))
      writeRead(df, codec, "alltypes")
  }

  test("our dictionary encoding is emitted and read back") {
    import spark.implicits._
    val df = (0 until 20000).map(i => (i.toLong, s"t${i % 7}", s"u-$i")).toDF("id", "lo", "hi")
    val dir = writeRead(df, "zstd", "dict")
    val p = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".orc")).map(_.getPath).min
    val sf = OrcData.stripeFooter(p, OrcMeta.readTail(p), 0)
    assert(sf.encodings(2).kind == 3, s"lo should be DICTIONARY_V2: ${sf.encodings.map(_.kind)}")
    assert(sf.encodings(3).kind == 2, s"hi should be DIRECT_V2: ${sf.encodings.map(_.kind)}")
  }

  test("multi-stripe files from our writer") {
    import spark.implicits._
    val df = (0 until 90000).map(i => (i.toLong, i * 31L, s"s${i % 100}")).toDF("a", "b", "c").coalesce(1)
    val dir = writeRead(df, "zlib", "stripes", stripeRows = 20000)
    val p = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".orc")).map(_.getPath).min
    assert(OrcMeta.readTail(p).footer.stripes.length == 5, "expected 5 stripes")
  }

  test("rlev2 encoder shapes: constants, arithmetic runs, wide randoms, negatives") {
    import spark.implicits._
    val df = (0 until 50000).map { i =>
      (i.toLong, 42L, -i * 7L,
        scala.util.hashing.MurmurHash3.stringHash(i.toString).toLong * 977L,
        if (i % 2 == 0) i.toLong else -i.toLong)
    }.toDF("mono", "const", "negmono", "wide", "zigzag")
    for (codec <- Seq("none", "zstd")) writeRead(df, codec, "rlev2")
  }

  test("real tables through the writer: events, documents, embeddings") {
    val ev = graft.Tables.events(spark, sf001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    writeRead(ev, "zstd", "events")
    writeRead(spark.read.parquet(s"$sf001/documents.parquet").limit(1500), "snappy", "documents")
    writeRead(spark.read.parquet(s"$sf001/embeddings.parquet").limit(1500), "lz4", "embeddings")
  }

  test("timestamp corner grid: sub-second fractions around the bases") {
    val schema = StructType(Seq(StructField("id", IntegerType), StructField("ts", TimestampType)))
    // instants straddling 1970 and the 2015 ORC base, with millisecond
    // and SUB-millisecond nano parts — the negative-boundary cells
    // expose the reference's borrow rule (probed live: borrow iff
    // stored seconds < 0 AND nanos >= 1 ms). The format itself ALIASES
    // instants in (-1s, 0) with >= 1 ms nanos across zero (orc-core's
    // own write+read returns +0.001 for -0.999), so the gate here is
    // reference-EQUIVALENCE: our bytes and Spark's bytes must read
    // back identically, cell for cell, through BOTH readers.
    val secs = Seq(-100000L, -3L, -2L, -1L, 0L, 1L, 3L, 1420070399L, 1420070400L, 1420070401L)
    val nanos = Seq(0L, 1000000L, 999000000L, 123456000L, 500000L, 999L)
    val rows = for {
      (s, i) <- secs.zipWithIndex
      (n, j) <- nanos.zipWithIndex
    } yield Row(i * 100 + j, Timestamp.from(java.time.Instant.ofEpochSecond(s, n)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)

    val ourDir = java.nio.file.Files.createTempDirectory("orcw_tsc_ours").toFile.getPath
    val ourPaths = OrcWrite.writeShards(df, ourDir, "none")
    val refDir = java.nio.file.Files.createTempDirectory("orcw_tsc_ref").toFile.getPath
    df.write.mode("overwrite").option("compression", "none").orc(refDir)

    val refRead = spark.read.orc(refDir)
    assertSameRows(spark.read.orc(ourDir), refRead, "tscorner/spark-reads-both")
    assertSameRows(OrcData.read(spark, ourPaths), refRead, "tscorner/our-read-ours")

    // outside the aliasing window the round-trip IS lossless
    val wellDefined = df.filter("ts < timestamp'1969-12-31 23:59:59' or ts >= timestamp'1970-01-01'")
    assertSameRows(spark.read.orc(ourDir).join(wellDefined.select("id"), "id"),
      wellDefined, "tscorner/lossless-outside-window")
  }

  test("empty partitions write no shard; empty frames still read") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "s").repartition(8)
    val dir = java.nio.file.Files.createTempDirectory("orcw_empty").toFile.getPath
    val paths = OrcWrite.writeShards(df, dir, "zstd")
    assert(paths.length == 1, s"expected one shard, got ${paths.length}")
    assert(spark.read.orc(dir).count() == 1)
  }
}
