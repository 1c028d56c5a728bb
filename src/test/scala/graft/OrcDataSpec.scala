package graft

import java.sql.{Date, Timestamp}
import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.sources.{OrcData, OrcMeta}

/** ORC stripe-data decoder conformance, LIVE against Spark's own ORC
  * reader (orc-core 2.2.2): row-for-row equality across codecs, both
  * string encodings, all four RLEv2 sub-encodings, nulls, nesting,
  * decimals, dates and timestamps (incl. pre-base and pre-1970), plus
  * the stream-level pruning poison proof and hostile-bytes refusals. */
class OrcDataSpec extends SparkSuite {

  private def orcFiles(path: String): Seq[String] =
    new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".orc")).map(_.getPath).sorted.toSeq

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
    assert(ours.schema == ref.schema, s"$label schema:\n ours: ${ours.schema}\n ref:  ${ref.schema}")
  }

  private def roundTrip(df: DataFrame, codec: String, label: String,
      extra: Map[String, String] = Map.empty): String = {
    val out = java.nio.file.Files.createTempDirectory(s"orcdata_$label").toFile.getPath
    val w = df.write.mode("overwrite").option("compression", codec)
    extra.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }.orc(out)
    assertSameRows(OrcData.read(spark, orcFiles(out)), spark.read.orc(out), s"$label/$codec")
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
      StructField("tag", StringType), // low-cardinality -> dictionary
      StructField("txt", StringType), // high-cardinality -> direct
      StructField("bin", BinaryType),
      StructField("day", DateType),
      StructField("ts_ltz", TimestampType),
      StructField("ts_ntz", TimestampNTZType),
      StructField("dec", DecimalType(12, 2)),
      StructField("nums", ArrayType(IntegerType)),
      StructField("kv", MapType(StringType, LongType)),
      StructField("pt", StructType(Seq(
        StructField("x", DoubleType), StructField("y", LongType))))))
    val rows = (0 until 4000).map { i =>
      def n[T](v: T): Any = if (i % 13 == 7) null else v
      Row(
        i.toLong,
        n(i * 37 - 1000),
        n((i % 3000 - 1500).toShort),
        n((i % 256 - 128).toByte),
        n(i % 3 == 0),
        n(i / 7.0f),
        n(i * math.Pi),
        n(s"t${i % 17}"),
        n(s"txt-$i-${"x" * (i % 29)}-é中"),
        n(Array.tabulate((i % 11))(j => (i + j).toByte)),
        n(Date.valueOf(java.time.LocalDate.ofEpochDay(i * 13 % 40000 - 3000))),
        n(Timestamp.from(java.time.Instant.ofEpochSecond(i * 997L - 100000, (i % 1000) * 1000000L + i % 1000))),
        n(LocalDateTime.ofEpochSecond(1400000000L + i * 7919L, (i % 997) * 1000, java.time.ZoneOffset.UTC)),
        n(java.math.BigDecimal.valueOf((i * 1007L - 2000000L), 2)),
        n((0 until i % 5).map(j => i * 10 + j)),
        n(Map(s"k${i % 3}" -> i.toLong, "c" -> (i * 2L))),
        n(Row(i * 0.5, i * 11L)))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    for (codec <- Seq("none", "zlib", "snappy", "lz4", "zstd"))
      roundTrip(df, codec, "alltypes")
  }

  test("both string encodings actually occur (dictionary and direct)") {
    import spark.implicits._
    val df = (0 until 30000).map(i => (i.toLong, s"t${i % 7}", s"u-$i-unique")).toDF("id", "lo", "hi")
    val out = roundTrip(df, "zstd", "encodings")
    // read the first stripe footer with OUR parser and check encodings
    val p = orcFiles(out).head
    val sf = OrcData.stripeFooter(p, OrcMeta.readTail(p), 0)
    val encs = sf.encodings.map(_.kind)
    assert(encs(2) == 3, s"lo column should be DICTIONARY_V2, got ${encs(2)}") // col ids: 0 root, 1 id, 2 lo, 3 hi
    assert(encs(3) == 2, s"hi column should be DIRECT_V2, got ${encs(3)}")
  }

  test("rlev2 corner shapes: monotonic, constant, outlier-patched, random wide") {
    import spark.implicits._
    val df = (0 until 60000).map { i =>
      (i.toLong, // delta
        42L, // short-repeat
        (i % 100).toLong + (if (i % 5000 == 777) 1L << 44 else 0L), // patched base
        scala.util.hashing.MurmurHash3.stringHash(i.toString).toLong * 977L) // direct wide
    }.toDF("mono", "const", "outlier", "wide")
    for (codec <- Seq("none", "zstd")) roundTrip(df, codec, "rlev2")
  }

  test("multi-stripe file: every stripe is its own task and rows survive") {
    import spark.implicits._
    val df = (0 until 200000).map(i => (i.toLong, s"pad-${"y" * 40}-$i", i * 31L)).toDF("id", "pad", "v")
    val out = roundTrip(df, "zlib", "multistripe", Map("orc.stripe.size" -> (256 * 1024).toString))
    val stripes = orcFiles(out).map(p => OrcMeta.readTail(p).footer.stripes.length).sum
    assert(stripes > orcFiles(out).length, s"expected multiple stripes, got $stripes")
  }

  test("real tables: events, documents, embeddings (list<float>) round-trip") {
    val ev = graft.Tables.events(spark, sf001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    roundTrip(ev, "zstd", "events")
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(2000)
    roundTrip(docs, "snappy", "documents")
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet").limit(2000)
    roundTrip(emb, "lz4", "embeddings")
  }

  test("pruning is stream-level: a poisoned pruned column never fails the read") {
    import spark.implicits._
    val df = (0 until 20000).map(i => (i.toLong, s"keep-$i", s"poison-$i-${"z" * 50}")).toDF("id", "keep", "boom")
    val out = java.nio.file.Files.createTempDirectory("orcdata_poison").toFile.getPath
    df.coalesce(1).write.mode("overwrite").option("compression", "zstd").orc(out)
    val p = orcFiles(out).head
    // locate the boom column's DATA stream inside the first stripe
    val f = OrcMeta.readTail(p)
    val s0 = f.footer.stripes.head
    val sf = OrcData.stripeFooter(p, f, 0)
    var off = s0.offset
    var target = -1L
    sf.streams.foreach { st =>
      if (st.column == 3 && st.kind == 1) target = off // boom is col 3, DATA stream
      off += st.length
    }
    assert(target > 0, "no boom DATA stream found")
    val raf = new java.io.RandomAccessFile(p, "rw")
    try {
      raf.seek(target + 20)
      raf.write(Array.fill[Byte](16)(0x5a))
    } finally raf.close()
    // full read must fail loudly...
    intercept[Exception] { OrcData.read(spark, Seq(p)).collect() }
    // ...but the pruned read never touches the poisoned bytes
    val kept = OrcData.read(spark, Seq(p), columns = Seq("id", "keep")).collect()
    assert(kept.length == 20000)
    assert(kept.map(_.getString(1)).toSet.contains("keep-7"))
    assert(kept.head.schema.fieldNames.toSeq == Seq("id", "keep"))
  }

  test("hostile bytes refuse by name") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("orcdata_hostile").toFile.getPath
    (0 until 1000).map(i => (i, s"v$i")).toDF("a", "b")
      .coalesce(1).write.mode("overwrite").option("compression", "none").orc(out)
    val p = orcFiles(out).head
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    // truncate mid-stripe
    val cut = java.io.File.createTempFile("orcdata_cut", ".orc")
    java.nio.file.Files.write(cut.toPath, bytes.take(64))
    val e = intercept[Exception] { OrcData.read(spark, Seq(cut.getPath)).collect() }
    assert(e.getMessage != null && e.getMessage.toLowerCase.contains("orc"))
  }

  test("stats-based stripe pruning: excluded stripes are never planned, results exact") {
    import spark.implicits._
    import graft.sources.OrcData.ColRange
    // sorted ids -> disjoint per-stripe [min,max] ranges
    val df = (0 until 200000).map(i => (i.toLong, s"pad-${"w" * 30}-$i")).toDF("id", "pad")
      .sortWithinPartitions("id").coalesce(1).sortWithinPartitions("id")
    val out = java.nio.file.Files.createTempDirectory("orcdata_prune").toFile.getPath
    df.write.mode("overwrite").option("compression", "zlib")
      .option("orc.stripe.size", (256 * 1024).toString).orc(out)
    val paths = orcFiles(out)
    val tails = paths.map(p => p -> OrcMeta.readTail(p))
    val total = tails.map(_._2.footer.stripes.length).sum
    assert(total > 3, s"need several stripes, got $total")
    val filt = Some(ColRange("id", 10000L, 20000L))
    val types0 = tails.head._2.footer.types.toIndexedSeq
    val (kept, planned) = graft.sources.OrcData.planStripes(tails, types0, filt)
    assert(planned == total)
    assert(kept.length < total, s"pruning kept ${kept.length} of $total")
    // pruned read + residual predicate == spark's filtered read
    val ours = OrcData.read(spark, paths, filter = filt).filter("id between 10000 and 20000")
    val ref = spark.read.orc(out).filter("id between 10000 and 20000")
    assertSameRows(ours, ref, "prune")
  }
}
