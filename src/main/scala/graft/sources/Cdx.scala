package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.MiniJson

/** CDX(J) capture index — the random-access companion of WARC and the
  * way real crawl corpora are actually consumed at the 100-TB scale:
  * nobody full-scans a crawl to read 0.1% of its pages; they query the
  * index for `(filename, offset, length)` triples and fetch exactly
  * those gzip members. (Common Crawl publishes both the CDXJ text
  * shards and a columnar "cc-index" table with the same fields; this
  * module speaks the CDXJ line format and exposes the columnar names.)
  *
  * Three faces:
  *
  *  - **Build**: [[index]] scans WARC containers through the
  *    [[Warc.records]] split machinery (whose `(offset, record_bytes)`
  *    pair IS the CDX extent) and emits one index row per record;
  *    [[toCdxjLines]] serializes rows to CDXJ text.
  *  - **Read**: [[readCdxj]] parses CDXJ shards (plain or `.gz` — the
  *    text source decompresses per file, so shard-level parallelism is
  *    the scale unit, matching how the shards are published).
  *  - **Fetch**: [[fetch]] takes any frame with `(warc_filename,
  *    warc_record_offset, warc_record_length)` and returns the full
  *    record rows by RANDOM ACCESS — rows repartition by file, sort by
  *    offset within the partition, and each task walks one open stream
  *    forward (seek + exact-length read per member, adjacent members
  *    degenerating to sequential reads). No scan, no shuffle beyond
  *    the one keyed repartition, bytes read = bytes selected.
  *
  * Line format (pywb/Common Crawl CDXJ): `<SURT key> <14-digit
  * timestamp> <JSON>`, JSON values all strings, with the keys url /
  * mime / status / digest / length / offset / filename. The SURT key
  * ([[surtKey]]) is the published Sort-friendly URI Reordering
  * Transform with the common canonicalizations: lowercase, scheme
  * dropped, one leading `www.` stripped, host reversed on commas,
  * default ports dropped, query parameters sorted. The digest is the
  * CDX convention's SHA-1 of the payload in RFC 4648 base32.
  *
  * CdxSpec proves: surt canonicalization cases, line round-trip, a
  * written index read back through the real text face, and
  * [[fetch]]-vs-[[Warc.records]] agreement on multi-file containers.
  * q_cdx oracles the build→select→fetch cycle end-to-end in-task.
  */
object Cdx {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  // ------------------------------------------------------------------
  // SURT + digest + timestamp kernels (pure, per-row)
  // ------------------------------------------------------------------

  /** Sort-friendly URI Reordering Transform key of a URL, canonical
    * form: `com,example)/path?a=1&b=2`. Unparseable/hostless URLs
    * yield "". */
  def surtKey(url: String): String =
    try {
      val u = new java.net.URI(url.trim)
      val host0 = Option(u.getHost).getOrElse(return "").toLowerCase(java.util.Locale.ROOT)
      if (host0.isEmpty) return ""
      val host = if (host0.startsWith("www.")) host0.substring(4) else host0
      val rev = host.split('.').reverse.mkString(",")
      val scheme = Option(u.getScheme).map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("")
      val port = u.getPort match {
        case -1 => ""
        case 80 if scheme == "http" => ""
        case 443 if scheme == "https" => ""
        case p => ":" + p
      }
      val path = Option(u.getRawPath).filter(_.nonEmpty).getOrElse("/").toLowerCase(java.util.Locale.ROOT)
      val query = Option(u.getRawQuery)
        .filter(_.nonEmpty)
        .map(q => "?" + q.toLowerCase(java.util.Locale.ROOT).split('&').sorted.mkString("&"))
        .getOrElse("")
      rev + port + ")" + path + query
    } catch { case _: Exception => "" }

  /** SHA-1 of `bytes` in RFC 4648 base32 (uppercase, 20 bytes → 32
    * chars, no padding) — the CDX digest convention. */
  def sha1Base32(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new StringBuilder(32)
    var acc = 0L
    var nbits = 0
    d.foreach { b =>
      acc = (acc << 8) | (b & 0xffL); nbits += 8
      while (nbits >= 5) { nbits -= 5; sb += alpha(((acc >>> nbits) & 31).toInt) }
    }
    sb.result()
  }

  /** WARC-Date (`2024-01-01T00:00:00Z`) → CDX 14-digit timestamp
    * (`20240101000000`); non-conforming dates keep their digits,
    * padded/truncated to 14. */
  def ts14(warcDate: String): String = {
    val digits = warcDate.filter(_.isDigit)
    (digits + "0" * 14).substring(0, 14)
  }

  // ------------------------------------------------------------------
  // CDXJ line codec
  // ------------------------------------------------------------------

  /** One index row (columnar-table field names). */
  final case class Entry(
      urlSurtkey: String,
      fetchTime: String, // 14-digit
      url: String,
      mime: String,
      status: Int,
      digest: String,
      offset: Long,
      length: Long,
      filename: String)

  /** CDXJ line of an entry (all JSON values strings — the published
    * convention). */
  def formatLine(e: Entry): String = {
    val q = MiniJson.quote _
    s"""${e.urlSurtkey} ${e.fetchTime} {"url":${q(e.url)},"mime":${q(e.mime)},"status":${q(e.status.toString)},""" +
      s""""digest":${q(e.digest)},"length":${q(e.length.toString)},"offset":${q(e.offset.toString)},""" +
      s""""filename":${q(e.filename)}}"""
  }

  /** Parse one CDXJ line; None for malformed (never a task failure).
    * The JSON part is located at the first `{` so SURT keys containing
    * spaces (query payloads) cannot shift the split. */
  def parseLine(line: String): Option[Entry] =
    try {
      val js = line.indexOf('{')
      if (js < 0) return None
      val head = line.substring(0, js).trim.split("\\s+")
      if (head.length < 2) return None
      val o = MiniJson.obj(MiniJson.parse(line.substring(js)))
      def s(k: String): String = o.get(k).map(MiniJson.str).getOrElse("")
      val off = s("offset").toLongOption.getOrElse(return None)
      val len = s("length").toLongOption.getOrElse(return None)
      Some(Entry(
        urlSurtkey = head.dropRight(1).mkString(" "),
        fetchTime = head.last,
        url = s("url"),
        mime = s("mime"),
        status = s("status").toIntOption.getOrElse(0),
        digest = s("digest"),
        offset = off,
        length = len,
        filename = s("filename")))
    } catch { case _: IllegalArgumentException | _: MatchError => None }

  // ------------------------------------------------------------------
  // Spark faces
  // ------------------------------------------------------------------

  /** Build the capture index of WARC containers under `pattern`: one
    * row per record with the columnar-table schema (url_surtkey,
    * fetch_time, url, content_mime_type, fetch_status, content_digest,
    * warc_record_offset, warc_record_length, warc_filename). Runs on
    * the split scan — index construction is the one full pass a corpus
    * ever needs; everything after goes through [[fetch]]. */
  def index(spark: SparkSession, pattern: String, splitSize: Long = 32L << 20): DataFrame = {
    val surtUdf = udf((u: String) => surtKey(u))
    val digestUdf = udf((b: Array[Byte]) => sha1Base32(b))
    val tsUdf = udf((d: String) => ts14(d))
    Warc
      .records(spark, pattern, splitSize)
      .select(
        surtUdf(col("target_uri")).as("url_surtkey"),
        tsUdf(col("warc_date")).as("fetch_time"),
        col("target_uri").as("url"),
        coalesce(col("http_content_type"), col("content_type")).as("content_mime_type"),
        coalesce(col("http_status"), lit(0)).as("fetch_status"),
        digestUdf(col("body")).as("content_digest"),
        col("offset").as("warc_record_offset"),
        col("record_bytes").as("warc_record_length"),
        col("path").as("warc_filename"))
  }

  /** Index rows → one CDXJ text line per row (write with
    * `.write.text`; sort by url_surtkey first for the published
    * sorted-shard convention). */
  def toCdxjLines(index: DataFrame): DataFrame = {
    val lineUdf = udf {
      (surt: String, ts: String, url: String, mime: String, status: Int,
       digest: String, off: Long, len: Long, file: String) =>
        formatLine(Entry(surt, ts, url, mime, status, digest, off, len, file))
    }
    index.select(lineUdf(
      col("url_surtkey"), col("fetch_time"), col("url"), col("content_mime_type"),
      col("fetch_status").cast("int"), col("content_digest"),
      col("warc_record_offset"), col("warc_record_length"), col("warc_filename")).as("value"))
  }

  /** Read CDXJ shards (text, `.gz` fine) into the columnar schema.
    * Malformed lines drop silently (count them upstream if needed). */
  def readCdxj(spark: SparkSession, pattern: String): DataFrame = {
    import spark.implicits._
    spark.read
      .textFile(pattern)
      .flatMap(l => parseLine(l))
      .toDF()
      .select(
        col("urlSurtkey").as("url_surtkey"),
        col("fetchTime").as("fetch_time"),
        col("url"),
        col("mime").as("content_mime_type"),
        col("status").as("fetch_status"),
        col("digest").as("content_digest"),
        col("offset").as("warc_record_offset"),
        col("length").as("warc_record_length"),
        col("filename").as("warc_filename"))
  }

  /** Random-access fetch: any frame carrying (warc_filename,
    * warc_record_offset, warc_record_length) → the full record rows,
    * [[Warc.records]]-shaped (minus path-planning: bytes read = bytes
    * selected). Rows group by file and walk one open stream forward in
    * offset order; a gz extent inflates as a member (multi-record
    * members emit every record), a plain extent parses directly. */
  def fetch(spark: SparkSession, index: DataFrame): DataFrame = {
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(spark.sparkContext.hadoopConfiguration))
    val triples = index
      .select(
        col("warc_filename").cast("string"),
        col("warc_record_offset").cast("long"),
        col("warc_record_length").cast("long"))
      .as[(String, Long, Long)]
    triples
      .repartition(col("warc_filename"))
      .sortWithinPartitions(col("warc_filename"), col("warc_record_offset"))
      .mapPartitions { it =>
        var curPath: String = null
        var curIn: org.apache.hadoop.fs.FSDataInputStream = null
        def closeCur(): Unit = if (curIn != null) { curIn.close(); curIn = null; curPath = null }
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeCur())
        it.flatMap { case (path, off, len) =>
          if (path != curPath) {
            closeCur()
            val hp = new org.apache.hadoop.fs.Path(path)
            curIn = hp.getFileSystem(confBc.value.value).open(hp)
            curPath = path
          }
          // index rows are untrusted: a corrupt/hostile length would
          // OOM the task (or silently truncate via toInt past 2 GiB) —
          // bound it and name the bad row. 1 GiB is far above any sane
          // single WARC member.
          if (len <= 0 || len > (1L << 30))
            throw new IllegalArgumentException(
              s"cdx index row has unreasonable warc_record_length=$len for $path@$off")
          val buf = new Array[Byte](len.toInt)
          curIn.seek(off)
          curIn.readFully(buf)
          val recs: Seq[Warc.Record] =
            if (path.endsWith(".gz"))
              Warc.membersInRange(buf, 0, 1).flatMap { case (_, payload) => Warc.parseAll(payload) }
            else Warc.parseAll(buf)
          recs.map { r =>
            val http = if (r.contentType.startsWith("application/http")) Warc.parseHttp(r.block) else None
            (
              path, off, len, r.warcType, r.targetUri, r.date, r.recordId, r.contentType,
              r.contentLength, http.map(_.status),
              http.flatMap(h => h.headers.collectFirst { case (k, v) if k.equalsIgnoreCase("content-type") => v }),
              http.map(_.body).getOrElse(r.block))
          }
        }
      }
      .toDF(
        "path", "offset", "record_bytes", "warc_type", "target_uri", "warc_date", "record_id",
        "content_type", "content_length", "http_status", "http_content_type", "body")
  }

  // ------------------------------------------------------------------
  // q_cdx — oracle-checked in-task cycle (the q_warc pattern)
  // ------------------------------------------------------------------

  /** Per (event_type, id%16 shard): a gz crawl container (one resource
    * record per event, text deterministic from the id) is indexed
    * through the split member scan, every index line cycles through
    * the REAL CDXJ codec, then the ids divisible by 3 are fetched back
    * by their (offset, length) extents ONLY — each fetched record must
    * be byte-exact and its digest must match the index (requires), so
    * counts and kept chars have closed forms. Shard sums re-aggregate
    * per group (additive), parallelizing the CPU-heavy cycles. */
  def cdxQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cycle = udf { ids: Seq[Long] =>
      val sorted = ids.sorted
      val texts = sorted.map(id => id -> (("c" + (id % 83) + " ") * 25).trim).toMap
      val image = {
        val bos = new java.io.ByteArrayOutputStream(sorted.length * 224)
        sorted.foreach { id =>
          bos.write(Warc.gzipMember(Warc.writeRecord(
            "resource", s"https://www.Crawl.invalid/Doc/$id", "2024-01-01T00:00:00Z",
            s"urn:uuid:cdx-$id", "text/plain", texts(id).getBytes(Utf8))))
        }
        bos.toByteArray
      }
      // index: member starts from the real split scan; extents from
      // consecutive starts (members are back-to-back in a container)
      val starts = Warc.membersInRange(image, 0, image.length)
      require(starts.length == sorted.length, s"cdx index scan lost members: ${starts.length}/${sorted.length}")
      val entries = starts.zipWithIndex.map { case ((off, payload), i) =>
        val end = if (i + 1 < starts.length) starts(i + 1)._1 else image.length
        val r = Warc.parseAll(payload).head
        Entry(
          surtKey(r.targetUri), ts14(r.date), r.targetUri, r.contentType, 0,
          sha1Base32(r.block), off.toLong, (end - off).toLong, "mem.warc.gz")
      }
      // every line through the real codec; surt canonicalization pinned
      val parsed = entries.map { e =>
        val back = parseLine(formatLine(e)).getOrElse(sys.error("cdx line round-trip failed"))
        require(back == e, "cdx line codec drifted")
        val id = e.url.substring(e.url.lastIndexOf('/') + 1).toLong
        require(back.urlSurtkey == s"invalid,crawl)/doc/$id", s"surt drifted: ${back.urlSurtkey}")
        back
      }
      // fetch the id%3==0 subset by extent only
      var fetched = 0L
      var kept = 0L
      parsed.foreach { e =>
        val id = e.url.substring(e.url.lastIndexOf('/') + 1).toLong
        if (id % 3 == 0) {
          val slice = java.util.Arrays.copyOfRange(image, e.offset.toInt, (e.offset + e.length).toInt)
          val r = Warc.membersInRange(slice, 0, 1)
            .flatMap { case (_, p) => Warc.parseAll(p) }
            .headOption.getOrElse(sys.error(s"cdx fetch failed for id $id"))
          require(new String(r.block, Utf8) == texts(id), s"cdx fetched text drifted for id $id")
          require(sha1Base32(r.block) == e.digest, s"cdx digest drifted for id $id")
          fetched += 1
          kept += r.block.length
        }
      }
      Seq(sorted.length.toLong, fetched, kept)
    }
    graft.Tables
      .eventsRaw(s, dir)
      // SF-INVARIANT bucket (the q_ddb r15 lesson, re-learned here by
      // the r16 sf10 probe): id DIV 4096 keeps each task's in-memory
      // container ~constant (≈0.2 MB) at ANY scale, where the old
      // 16-way pmod grew per-task work linearly with the data —
      // superlinear wall time once group images outgrew cache. The
      // oracle is per-id closed forms grouped by type only, so the
      // grouping is free to change; sums re-aggregate additively.
      .groupBy($"event_type", expr("event_id DIV 4096").as("shard"))
      .agg(collect_list($"event_id").as("ids"))
      .transform(d => graft.operators.Spread.wide(d)) // conf-width, not a local-core literal
      .select($"event_type", cycle($"ids").as("a"))
      .groupBy($"event_type")
      .agg(
        sum($"a".getItem(0)).as("n_indexed"),
        sum($"a".getItem(1)).as("n_fetched"),
        sum($"a".getItem(2)).as("fetched_chars"))
      .orderBy($"event_type")
  }
}
