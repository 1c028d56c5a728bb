package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.MiniJson

/** WET / WAT sidecar support — the extracted-text and link-metadata
  * companions real crawls (Common Crawl et al.) publish next to each
  * `.warc.gz`. Both are plain WARC containers (one gzip member per
  * record), so the split-scan machinery in [[Warc]] reads them
  * unchanged; this module adds the record conventions on top:
  *
  *  - **WET** (`*.warc.wet.gz`): `WARC-Type: conversion` records with
  *    `Content-Type: text/plain` whose block IS the page's extracted
  *    text. For text-only training pipelines this is the entry point —
  *    no HTML parse needed, an order of magnitude less data to move
  *    than the full crawl.
  *  - **WAT** (`*.warc.wat.gz`): `WARC-Type: metadata` records with an
  *    `application/json` envelope (`Envelope.Payload-Metadata.
  *    HTTP-Response-Metadata.HTML-Metadata`) carrying the page title
  *    and outgoing links — the input to web-graph construction
  *    (host-level PageRank via `operators/Graph` composes directly on
  *    [[watLinkGraph]]'s edge frame).
  *
  * Scale shape: identical to [[Warc.records]] — member boundaries are
  * the split points, tasks own the members starting in their byte
  * range, JSON envelopes parse per-row inside the task (never on the
  * driver). WetWatSpec proves split-size sweeps through the real
  * Spark face equal the whole-file parse for both sidecar kinds.
  */
object Wet {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  // ------------------------------------------------------------------
  // writers (fixtures, round-trip cycles)
  // ------------------------------------------------------------------

  /** One WET conversion record (uncompressed bytes). */
  def writeConversion(uri: String, date: String, recordId: String, text: String): Array[Byte] =
    Warc.writeRecord("conversion", uri, date, recordId, "text/plain", text.getBytes(Utf8))

  /** One WAT metadata record: the Common Crawl envelope shape with the
    * title under `HTML-Metadata.Head.Title` and each outgoing link as
    * `{"path":"A@/href","url":...}` under `HTML-Metadata.Links`. */
  def writeWatRecord(
      uri: String,
      date: String,
      recordId: String,
      title: String,
      links: Seq[String]): Array[Byte] = {
    val q = MiniJson.quote _
    val linksJson = links.map(h => s"""{"path":"A@/href","url":${q(h)}}""").mkString("[", ",", "]")
    val env =
      s"""{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":${q(uri)},"WARC-Type":"response","WARC-Date":${q(date)}},""" +
        s""""Payload-Metadata":{"HTTP-Response-Metadata":{"HTML-Metadata":{"Head":{"Title":${q(title)}},"Links":$linksJson}}}}}"""
    Warc.writeRecord("metadata", uri, date, recordId, "application/json", env.getBytes(Utf8))
  }

  // ------------------------------------------------------------------
  // WAT envelope parse (pure, per-row)
  // ------------------------------------------------------------------

  /** Parsed WAT page metadata. `links` holds raw href values exactly as
    * the envelope states them (possibly relative). */
  final case class WatPage(url: String, title: String, links: Vector[String])

  /** Walk a WAT JSON envelope. Tolerant: absent branches yield empty
    * title/links; a block that is not JSON (or whose envelope has the
    * wrong shape anywhere) yields None, never a task failure. */
  def parseWat(block: Array[Byte]): Option[WatPage] =
    try {
      val root = MiniJson.obj(MiniJson.parse(new String(block, Utf8)))
      val env = MiniJson.obj(root.getOrElse("Envelope", Map.empty[String, Any]))
      val hdr = MiniJson.obj(env.getOrElse("WARC-Header-Metadata", Map.empty[String, Any]))
      val url = hdr.get("WARC-Target-URI").map(MiniJson.str).getOrElse("")
      val html = MiniJson.obj(
        MiniJson
          .obj(
            MiniJson
              .obj(env.getOrElse("Payload-Metadata", Map.empty[String, Any]))
              .getOrElse("HTTP-Response-Metadata", Map.empty[String, Any]))
          .getOrElse("HTML-Metadata", Map.empty[String, Any]))
      val title = MiniJson
        .obj(html.getOrElse("Head", Map.empty[String, Any]))
        .get("Title")
        .map(MiniJson.str)
        .getOrElse("")
      val links = MiniJson
        .arr(html.getOrElse("Links", Vector.empty[Any]))
        .flatMap(l => MiniJson.obj(l).get("url").map(MiniJson.str))
        .toVector
      Some(WatPage(url, title, links))
    } catch { case _: IllegalArgumentException | _: MatchError => None }

  /** Resolve a possibly-relative href against its page URL; None for
    * unresolvable or non-http(s) results (mailto:, javascript:, …). */
  def resolveLink(pageUrl: String, href: String): Option[String] =
    try {
      val r = new java.net.URI(pageUrl).resolve(href.trim)
      val scheme = Option(r.getScheme).map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("")
      if ((scheme == "http" || scheme == "https") && r.getHost != null) Some(r.toString) else None
    } catch { case _: Exception => None }

  /** Registrable host of a URL (lowercased, one leading `www.`
    * stripped — the [[graft.text.UrlCanon]] convention), or "". */
  def hostOf(url: String): String =
    try {
      val h = Option(new java.net.URI(url).getHost).getOrElse("").toLowerCase(java.util.Locale.ROOT)
      if (h.startsWith("www.")) h.substring(4) else h
    } catch { case _: Exception => "" }

  // ------------------------------------------------------------------
  // Spark faces
  // ------------------------------------------------------------------

  /** Extracted-text documents of a WET sidecar: one row per conversion
    * record — (url, canonical_url, warc_date, text). The text-only
    * head of the curation chain (lang-id / Gopher / dedup compose on
    * the `text` column directly). */
  def wetDocs(spark: SparkSession, pattern: String, splitSize: Long = 32L << 20): DataFrame = {
    val canonUdf = udf((u: String) => graft.text.UrlCanon.canonical(u))
    Warc
      .records(spark, pattern, splitSize)
      .where(col("warc_type") === "conversion" && col("content_type").startsWith("text/plain"))
      .select(
        col("target_uri").as("url"),
        canonUdf(col("target_uri")).as("canonical_url"),
        col("warc_date"),
        decode(col("body"), "UTF-8").as("text"))
  }

  /** Page metadata of a WAT sidecar: one row per metadata record —
    * (url, title, n_links, links raw as stated). */
  def watPages(spark: SparkSession, pattern: String, splitSize: Long = 32L << 20): DataFrame = {
    import spark.implicits._
    Warc
      .records(spark, pattern, splitSize)
      .where(col("warc_type") === "metadata" && col("content_type").startsWith("application/json"))
      .select(col("target_uri"), col("body"))
      .as[(String, Array[Byte])]
      .flatMap { case (uri, block) =>
        parseWat(block).map(p => (if (p.url.nonEmpty) p.url else uri, p.title, p.links.length, p.links))
      }
      .toDF("url", "title", "n_links", "links")
  }

  /** Host-level link graph of a WAT sidecar: distinct (src_host,
    * dst_host) edges with self-loops dropped — the PageRank input
    * frame. Resolution + host extraction run per-row in the task; the
    * only shuffle is the final distinct on the (small) host-pair
    * projection. */
  def watLinkGraph(spark: SparkSession, pattern: String, splitSize: Long = 32L << 20): DataFrame = {
    import spark.implicits._
    watPages(spark, pattern, splitSize)
      .select(col("url"), explode(col("links")).as("href"))
      .as[(String, String)]
      .flatMap { case (pageUrl, href) =>
        val src = hostOf(pageUrl)
        resolveLink(pageUrl, href).map(hostOf).filter(d => d.nonEmpty && src.nonEmpty && d != src).map(src -> _)
      }
      .toDF("src_host", "dst_host")
      .distinct()
  }

  // ------------------------------------------------------------------
  // q_wet / q_wat — oracle-checked in-task cycles (the q_warc pattern)
  // ------------------------------------------------------------------

  /** Per (event_type, id%16 shard): a WET container (one conversion
    * record per event, text deterministic from the id) cycles through
    * the range-split member scan at three arbitrary cuts; each text
    * must survive byte-exactly (a require), so kept chars have the
    * closed form the oracle states. Shard sums re-aggregate per group
    * (additive), parallelizing the CPU-heavy cycles. */
  def wetQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cycle = udf { ids: Seq[Long] =>
      val sorted = ids.sorted
      val image = {
        val bos = new java.io.ByteArrayOutputStream(sorted.length * 192)
        sorted.foreach { id =>
          val text = (("w" + (id % 89) + " ") * 20).trim
          bos.write(Warc.gzipMember(writeConversion(
            s"https://crawl.invalid/doc/$id", "2024-01-01T00:00:00Z", s"urn:uuid:wet-$id", text)))
        }
        bos.toByteArray
      }
      val c1 = image.length / 3
      val c2 = 2 * image.length / 3
      val recs =
        (Warc.membersInRange(image, 0, c1) ++ Warc.membersInRange(image, c1, c2) ++
          Warc.membersInRange(image, c2, image.length))
          .flatMap { case (_, payload) => Warc.parseAll(payload) }
      require(recs.length == sorted.length, s"wet split-read lost records: ${recs.length}/${sorted.length}")
      var kept = 0L
      recs.foreach { r =>
        require(r.warcType == "conversion" && r.contentType == "text/plain", "wet record shape drifted")
        val id = r.targetUri.substring(r.targetUri.lastIndexOf('/') + 1).toLong
        val text = new String(r.block, Utf8)
        require(text == (("w" + (id % 89) + " ") * 20).trim, s"wet text drifted for id $id")
        kept += text.length
      }
      Seq(recs.length.toLong, kept)
    }
    graft.Tables
      .eventsRaw(s, dir)
      .groupBy($"event_type", pmod($"event_id", lit(16L)).as("shard"))
      .agg(collect_list($"event_id").as("ids"))
      .transform(d => graft.operators.Spread.wide(d)) // conf-width, not a local-core literal
      .select($"event_type", cycle($"ids").as("a"))
      .groupBy($"event_type")
      .agg(sum($"a".getItem(0)).as("n_records"), sum($"a".getItem(1)).as("text_chars"))
      .orderBy($"event_type")
  }

  /** Per (event_type, id%16 shard): a WAT container (one metadata
    * record per event; title and link fan-out deterministic from the
    * id — id%5+1 links, one per j to host h((id*j)%13)) cycles through
    * the split scan and the REAL envelope parser; every field must
    * round-trip (requires), so link and title counts have closed
    * forms. Shard sums re-aggregate per group (additive). */
  def watQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cycle = udf { ids: Seq[Long] =>
      val sorted = ids.sorted
      val image = {
        val bos = new java.io.ByteArrayOutputStream(sorted.length * 256)
        sorted.foreach { id =>
          val links = (1 to (id % 5 + 1).toInt).map(j => s"https://h${(id * j) % 13}.invalid/p$j")
          bos.write(Warc.gzipMember(writeWatRecord(
            s"https://crawl.invalid/doc/$id", "2024-01-01T00:00:00Z", s"urn:uuid:wat-$id", "T" + id, links)))
        }
        bos.toByteArray
      }
      val c1 = image.length / 3
      val c2 = 2 * image.length / 3
      val recs =
        (Warc.membersInRange(image, 0, c1) ++ Warc.membersInRange(image, c1, c2) ++
          Warc.membersInRange(image, c2, image.length))
          .flatMap { case (_, payload) => Warc.parseAll(payload) }
      require(recs.length == sorted.length, s"wat split-read lost records: ${recs.length}/${sorted.length}")
      var nLinks = 0L
      var titleChars = 0L
      recs.foreach { r =>
        require(r.warcType == "metadata" && r.contentType == "application/json", "wat record shape drifted")
        val page = parseWat(r.block).getOrElse(sys.error("wat envelope parse failed"))
        val id = page.url.substring(page.url.lastIndexOf('/') + 1).toLong
        require(page.title == "T" + id, s"wat title drifted for id $id")
        val expect = (1 to (id % 5 + 1).toInt).map(j => s"https://h${(id * j) % 13}.invalid/p$j")
        require(page.links == expect, s"wat links drifted for id $id")
        nLinks += page.links.length
        titleChars += page.title.length
      }
      Seq(recs.length.toLong, nLinks, titleChars)
    }
    graft.Tables
      .eventsRaw(s, dir)
      .groupBy($"event_type", pmod($"event_id", lit(16L)).as("shard"))
      .agg(collect_list($"event_id").as("ids"))
      .transform(d => graft.operators.Spread.wide(d)) // conf-width, not a local-core literal
      .select($"event_type", cycle($"ids").as("a"))
      .groupBy($"event_type")
      .agg(
        sum($"a".getItem(0)).as("n_pages"),
        sum($"a".getItem(1)).as("n_links"),
        sum($"a".getItem(2)).as("title_chars"))
      .orderBy($"event_type")
  }
}
