package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Ingest
import graft.streaming.EventsStream

/** Structured-Streaming surface + ingest pipeline + multimodal
  * plumbing — driven end-to-end on local fixtures.
  */
class StreamIngestSpec extends SparkSuite {
  import spark.implicits._

  test("streaming hourly counts over events parquet match the batch rollup") {
    val stream = EventsStream.readEvents(spark, sf0001)
    val agg = EventsStream.hourlyCounts(stream)
    val q = EventsStream.runToMemory(spark, agg, "hourly_test")
    try {
      val streamed = spark.sql("select sum(n) from hourly_test").head().getLong(0)
      // batch equivalent over the same files (watermark drops nothing in
      // a replay of historical data with AvailableNow + final flush)
      val batch = Tables.events(spark, sf0001).count()
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming window boundaries align with date_trunc") {
    val stream = EventsStream.readEvents(spark, sf0001)
    val q = EventsStream.runToMemory(spark, EventsStream.hourlyCounts(stream), "hourly_b")
    try {
      val hours = spark.sql("select distinct hour from hourly_b").collect().map(_.getTimestamp(0))
      assert(hours.forall(t => t.getTime % 3600000L === 0L))
    } finally q.stop()
  }

  test("glob to regex semantics: * vs ** vs ?") {
    val rx = Ingest.globToRegex("photos/*.jpg")
    assert("photos/a.jpg".matches(rx))
    assert(!"photos/sub/a.jpg".matches(rx))
    val rx2 = Ingest.globToRegex("photos/**.jpg")
    assert("photos/sub/a.jpg".matches(rx2))
    assert("x1.bin".matches(Ingest.globToRegex("x?.bin")))
    assert(!"x12.bin".matches(Ingest.globToRegex("x?.bin")))
  }

  test("ingest end-to-end: list -> entries -> upsert -> incremental no-op") {
    val dir = Files.createTempDirectory("graft_ingest").toFile
    try {
      Files.writeString(Paths.get(dir.getPath, "a.jpg"), "fake jpeg bytes")
      Files.writeString(Paths.get(dir.getPath, "b.md"), "# doc")
      Files.createDirectories(Paths.get(dir.getPath, ".ddb"))
      Files.writeString(Paths.get(dir.getPath, ".ddb", "skip.me"), "internal")

      val files = Ingest.listFiles(spark, dir.getPath)
      assert(files.count() === 2) // .ddb skipped

      val entries = Ingest.toEntries(files, dir.getPath)
      val rows = entries.collect()
      assert(rows.length === 2)
      val a = rows.find(_.getAs[String]("path") == "a.jpg").get
      assert(a.getAs[Int]("entryType") === graft.model.EntryType.Image)
      assert(a.getAs[String]("hash").length === 64) // sha256 hex
      assert(a.getAs[Long]("size") === 15L)
      assert(a.getAs[Int]("depth") === 0)

      // upsert same entries again: still 2, no dupes
      val idx2 = Ingest.upsert(entries, entries)
      assert(idx2.count() === 2)

      // modify one file: upsert keeps newest mtime row
      val newer = entries.withColumn("mtime", col("mtime") + 100)
        .withColumn("hash", lit("0" * 64))
      val idx3 = Ingest.upsert(entries, newer)
      assert(idx3.count() === 2)
      assert(idx3.filter(col("hash") === "0" * 64).count() === 2)
    } finally {
      dir.listFiles().foreach { f => if (f.isDirectory) f.listFiles().foreach(_.delete()); f.delete() }
      dir.delete()
    }
  }

  test("rescan re-parses indexed entries from current bytes") {
    implicit val s = spark
    val dir = Files.createTempDirectory("graft_rescan").toFile
    try {
      Files.writeString(Paths.get(dir.getPath, "a.md"), "# v1")
      // materialize through parquet (like a real index): a persisted
      // in-memory copy of the SAME plan would get cache-substituted
      // into the fresh scan and hide the rewrite
      val idxPath = Files.createTempDirectory("graft_idx").toFile.getPath
      Ingest.toEntries(Ingest.listFiles(spark, dir.getPath), dir.getPath)
        .write.mode("overwrite").parquet(idxPath)
      val index = spark.read.parquet(idxPath)
      val hash1 = index.select("hash").head().getString(0)
      Files.writeString(Paths.get(dir.getPath, "a.md"), "# version two")
      val rescanned = Ingest.rescan(index, dir.getPath)
      assert(rescanned.count() === 1)
      assert(rescanned.select("hash").head().getString(0) !== hash1)
      // type filter excluding markdown -> nothing re-parsed, hash unchanged
      val untouched = Ingest.rescan(index, dir.getPath, Some(Seq(graft.model.EntryType.Image)))
      assert(untouched.select("hash").head().getString(0) === hash1)
    } finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  test("multimodal: feature extraction, resize, frame sampling shapes") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() === 500)
    val r = feats.head()
    assert(r.getAs[Double]("pixel_mean") > 0)
    assert(r.getAs[Int]("payload_bytes") > 0)

    val resized = Multimodal.resizeAll(media.limit(5), 32)
    assert(resized.select(length(col("payload"))).collect().forall(_.getInt(0) === 32))

    val frames = Multimodal.sampleFrames(media.limit(3), nFrames = 4, frameLen = 8)
    assert(frames.count() === 12)
    assert(frames.select(max(col("frame_idx"))).head().getInt(0) === 3)
    assert(frames.select(max(col("frame_bytes"))).head().getInt(0) <= 8)
  }

  test("sessionize groups events within gap") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), "b"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), "c"), // new session
      (2L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), "a")
    ).toDF("user_id", "ts", "event_type")
    val sessions = EventsStream.sessionize(spark, ev, gapMs = 30 * 60 * 1000)
    // batch flatMapGroupsWithState emits completed sessions only (the
    // trailing open session stays in state); user 1 closed one session of 2
    val closed = sessions.collect()
    assert(closed.exists(r => r.getAs[Long]("user_id") == 1L && r.getAs[Long]("events") == 2L))
  }

  test("streaming dedup drops duplicate ids within the watermark") {
    val stream = EventsStream.readEvents(spark, sf0001)
    val deduped = EventsStream.dedupedStream(stream.unionByName(stream)) // inject exact duplicates
    val q = EventsStream.runToMemory(
      spark, deduped, "dedup_test", org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      val n = spark.sql("SELECT count(DISTINCT event_id) AS d, count(*) AS n FROM dedup_test").collect().head
      assert(n.getLong(0) === n.getLong(1), "every surviving row is a distinct id")
      assert(n.getLong(1) === Tables.eventsRaw(spark, sf0001).count())
    } finally q.stop()
  }

  test("streaming decontamination flags docs sharing an 8-gram with the static eval set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val run8 = "q w e r t y u i"
    val evalDocs = Seq((100L, s"$run8 held out eval material")).toDF("doc_id", "text")
    val evalTable = graft.streaming.CurationStream.evalShingleTable(evalDocs)
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    ms.addData(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), s"$run8 leaked into this train doc"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), "completely clean training words here today")
    )
    val docs = ms.toDF().toDF("doc_id", "ts", "text")
    val q = EventsStream.runToMemory(
      spark,
      graft.streaming.CurationStream.contaminatedIds(docs, evalTable),
      "contam_test",
      org.apache.spark.sql.streaming.OutputMode.Append()
    )
    try {
      val flagged = spark.sql("SELECT doc_id FROM contam_test").collect().map(_.getLong(0)).toSet
      assert(flagged === Set(1L))
    } finally q.stop()
  }

  test("streaming near-dup detection: cross-micro-batch candidates via bucket state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val ms = MemoryStream[(Long, String)]
    val docs = ms.toDF().toDF("doc_id", "text")
    // a LONG-RUNNING micro-batch trigger (runToMemory's AvailableNow
    // trigger stops after the first batch — state must survive into
    // later batches here)
    val q = graft.streaming.CurationStream
      .nearDupCandidates(docs)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("neardup_test")
      .start()
    try {
      // batch 1: the original + an unrelated doc → no pairs yet
      ms.addData((1L, s"$shared tail one"), (9L, "totally different content with other words entirely now"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM neardup_test").count() === 0)
      // batch 2: a near-identical arrival pairs with the batch-1 original
      ms.addData((2L, s"$shared tail two"))
      q.processAllAvailable()
      val pairs = spark
        .sql("SELECT DISTINCT id_a, id_b FROM neardup_test")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      assert(pairs.contains((1L, 2L)), s"cross-batch near-dup must surface: $pairs")
      assert(!pairs.exists(p => p._1 == 9L || p._2 == 9L), s"unrelated doc must not pair: $pairs")
      // batch 3: an exact re-send of doc 2 adds no new self-pair
      ms.addData((2L, s"$shared tail two"))
      q.processAllAvailable()
      val again = spark
        .sql("SELECT DISTINCT id_a, id_b FROM neardup_test")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      assert(!again.contains((2L, 2L)))
    } finally q.stop()
  }

  test("streaming quality gate + PII scrub: batch-identical columns, re-sent docs append once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val good =
      "the quick brown fox jumps over the lazy dog and it is a fine day in the park, " +
        "reach me at alice@mail.example.com or 555-123-4567 from 10.0.0.1 thanks"
    val lowQuality = "@@@@ #### !!!! ????" // short, punct-heavy, no stopwords
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = graft.streaming.CurationStream.curateAtIngest(
      ms.toDF().toDF("doc_id", "ts", "text")
    )
    val q = out.writeStream.outputMode("append").format("memory").queryName("ingest_curate").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      ms.addData((1L, t0, good), (2L, t0, lowQuality))
      q.processAllAvailable()
      ms.addData((1L, t0, good)) // re-send within the watermark
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, n_email, n_phone, n_ip, clean FROM ingest_curate").collect()
      assert(rows.map(_.getLong(0)).toSeq === Seq(1L), s"only the quality survivor, exactly once: ${rows.toSeq}")
      val r = rows.head
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) === ((1, 1, 1)))
      assert(r.getString(4).contains("<EMAIL>") && r.getString(4).contains("<PHONE>") && r.getString(4).contains("<IP>"))
      assert(!r.getString(4).contains("alice@"), "raw PII must not survive")
      // stream output == the batch column ops on the same row
      val batch = graft.text.TextOps
        .piiRedact(Seq((1L, good)).toDF("doc_id", "text"), "text")
        .select($"clean")
        .head()
        .getString(0)
      assert(r.getString(4) === batch, "same plan fragment, same result, batch or stream")
    } finally q.stop()
  }

  test("event-time sessionization: multi-batch stream emits the batch session table, same sids") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: String) = java.sql.Timestamp.valueOf(m)
    // two users, three sessions each under the 2h gap rule, events
    // spread over THREE micro-batches with a cross-batch session (user
    // 1's session 2 spans batches 1→2) — the case AvailableNow's
    // single batch can't exercise
    val b1 = Seq(
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-01 08:30:00")), // u1 s1
      (2L, ts("2024-01-01 09:00:00")), // u2 s1
      (1L, ts("2024-01-01 12:00:00")) // u1 s2 opens
    )
    val b2 = Seq(
      (1L, ts("2024-01-01 13:30:00")), // u1 s2 continues across the batch boundary
      (2L, ts("2024-01-01 13:00:00")), // u2 s2
      (2L, ts("2024-01-01 13:10:00"))
    )
    val b3 = Seq(
      (1L, ts("2024-01-01 17:00:00")), // u1 s3
      (2L, ts("2024-01-01 18:00:00")) // u2 s3
    )
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val out = EventsStream.sessionizeEventTime(
      spark,
      ms.toDF().toDF("user_id", "ts"),
      gapUs = 2L * 3600 * 1000000L,
      delay = "1 minute"
    )
    // plain start(), NOT AvailableNow: state must live across batches
    val q = out.writeStream.outputMode("append").format("memory").queryName("sess_test").start()
    try {
      Seq(b1, b2, b3).foreach { b => ms.addData(b); q.processAllAvailable() }
      // two sentinel batches: the first advances the watermark past
      // every real session's end+gap, the second triggers the
      // event-time timeouts that flush the tail sessions
      ms.addData(Seq((99L, ts("2024-01-03 00:00:00")))); q.processAllAvailable()
      ms.addData(Seq((99L, ts("2024-01-03 00:01:00")))); q.processAllAvailable()
      val got = spark
        .sql("SELECT user_id, sid, n_events, start_us, end_us FROM sess_test WHERE user_id < 99")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val batch = graft.operators.Windows
        .sessionTable(
          (b1 ++ b2 ++ b3).map { case (u, t) => (u, t.getTime * 1000L) }.toDF("user_id", "ts"),
          gapUs = 2L * 3600 * 1000000L
        )
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got === batch, s"streaming sessions must equal the batch table\n got=$got\n exp=$batch")
      assert(got.map(x => (x._1, x._2)).toSeq.sorted === Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L)))
    } finally q.stop()
  }

  test("salted two-phase aggregation equals the direct groupBy") {
    val ev = Tables.eventsRaw(spark, sf0001)
    val salted = graft.operators.Skew
      .saltedCountSum(ev, "event_type", "event_id", "value", nSalts = 8)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toMap
    val direct = ev
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toMap
    assert(salted === direct)
  }
}
