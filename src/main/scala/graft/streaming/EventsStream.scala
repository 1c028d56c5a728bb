package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured-Streaming surface (SURVEY §2.9): the reference is batch
  * with incremental ops; this is the beyond-reference streaming ingest
  * over the `events` table shape — file-source stream → watermark →
  * tumbling-window aggregation, plus a stateful sessionization example
  * with `flatMapGroupsWithState`.
  */
object EventsStream {

  val eventSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, value DOUBLE, props STRING"
  )

  /** File-source stream of events (ts stored as TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) → TIMESTAMP_NTZ; the UTC session makes the
    * cast to an event-time TIMESTAMP an exact identity, matching the
    * batch loader `Tables.events`). */
  def readEvents(s: SparkSession, dir: String): DataFrame =
    s.readStream
      .schema(eventSchema)
      .option("pathGlobFilter", "events*.parquet") // dir holds other tables too
      .parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))

  /** Watermarked tumbling-window counts per event type — late data
    * beyond 10 minutes dropped; state bounded by the watermark. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Drive a stream from existing parquet through a memory sink
    * synchronously — the local test harness shape. */
  def runToMemory(
      s: SparkSession,
      df: DataFrame,
      name: String,
      mode: OutputMode = OutputMode.Complete // append-mode windows don't flush in a single AvailableNow batch
  ): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming exact-dedup — the training-pipeline dedup stage on the
    * ingest path: duplicates by id dropped while their event time is
    * within the watermark, so state stays bounded (the batch analogue
    * is the hash-groupBy in `Dedup.exactDupGroups`). */
  def dedupedStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  final case class SessState(pending: List[Long], sid: Long)
  final case class ClosedSession(user_id: Long, sid: Long, n_events: Long, start_us: Long, end_us: Long)

  private def tsMicros(t: java.sql.Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L

  /** ◆ Event-time sessionization — the streaming twin of the batch
    * q_sessionize (`operators/Windows.sessionTable`), same gap rule,
    * same 1-based per-user session ids. Events buffer in per-user state
    * until the WATERMARK proves a session closed: a session whose last
    * event is `end` can only be extended by an event with ts ≤ end+gap,
    * and once the watermark passes end+gap any such arrival would be
    * dropped as late — so the closed-session emission is final and
    * byte-identical to the batch table on the same data. An event-time
    * timeout (set to last-pending + gap) flushes the tail session
    * without needing another arrival for that user; state per user is
    * bounded by the watermark horizon (pending events newer than
    * wm − gap), never the corpus.
    */
  def sessionizeEventTime(
      s: SparkSession,
      events: DataFrame, // streaming, (user_id, ts: timestamp)
      gapUs: Long = 2L * 3600 * 1000000L,
      delay: String = "10 minutes"
  ): DataFrame = {
    import s.implicits._
    events
      .withWatermark("ts", delay)
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp)], state: GroupState[SessState]) => {
          val st = state.getOption.getOrElse(SessState(Nil, 0L))
          val pending = (st.pending ++ it.map(e => tsMicros(e._2))).sorted
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // walk pending into gap-sessions (the batch rule verbatim)
          val sessions = pending.foldLeft(List.empty[List[Long]]) {
            case (acc, t) if acc.nonEmpty && t - acc.head.head <= gapUs => (t :: acc.head) :: acc.tail
            case (acc, t)                                               => List(t) :: acc
          }.reverse.map(_.reverse) // chronological sessions of chronological events
          // closed = watermark strictly past end+gap; sessions are
          // ordered, so the closed ones form a prefix
          val (closed, open) = sessions.span(sess => sess.last + gapUs < wmUs)
          val out = closed.zipWithIndex.map { case (sess, i) =>
            ClosedSession(uid, st.sid + i + 1, sess.length.toLong, sess.head, sess.last)
          }
          val remaining = open.flatten
          // the sid counter must outlive the flush — batch-identical
          // session numbering is per-user-forever (a production
          // deployment would TTL this counter and accept re-based ids)
          state.update(SessState(remaining, st.sid + closed.length))
          if (remaining.nonEmpty)
            // wake this user once the watermark can close the tail
            // session (guaranteed > current watermark: the tail is open)
            state.setTimeoutTimestamp((remaining.last + gapUs) / 1000L + 1L)
          out.iterator
        }
      )
      .toDF()
  }

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class SessionSummary(user_id: Long, events: Long, firstTs: Long, lastTs: Long)

  /** Stateful sessionization: per-user session summaries with a
    * processing-time gap timeout — `flatMapGroupsWithState` custom
    * state (SURVEY steering: KeyValueGroupedDataset for custom state).
    */
  def sessionize(s: SparkSession, events: DataFrame, gapMs: Long = 30 * 60 * 1000): DataFrame = {
    import s.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[SessionSummary]) => {
          var cur = state.getOption
          val out = scala.collection.mutable.ListBuffer.empty[SessionSummary]
          it.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(ss) if t - ss.lastTs <= gapMs =>
                cur = Some(ss.copy(events = ss.events + 1, lastTs = t))
              case Some(ss) =>
                out += ss
                cur = Some(SessionSummary(uid, 1, t, t))
              case None =>
                cur = Some(SessionSummary(uid, 1, t, t))
            }
          }
          cur.foreach(state.update)
          out.iterator
        }
      )
      .toDF()
  }
}
