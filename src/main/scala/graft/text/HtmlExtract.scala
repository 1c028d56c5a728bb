package graft.text

import scala.collection.mutable.ArrayBuffer

/** HTML → text extraction for the curation tier — the step between a
  * crawl and every text operator in this library (lang-id, quality,
  * dedup all assume prose, not markup). Two faces:
  *
  *  - [[stripTags]]: tag-aware text extraction — script/style/
  *    noscript/template contents dropped, common entities decoded
  *    (named + decimal + hex), block-level tags become newlines so
  *    downstream line/paragraph operators see real boundaries.
  *  - [[mainText]]: jusText/readability-style boilerplate removal —
  *    blocks scored by text length and LINK DENSITY (chars inside
  *    <a> over total chars); navigation/footer chrome is short and
  *    link-dense, article prose is long and link-sparse. Heuristic
  *    by nature (documented); thresholds follow the published
  *    jusText defaults (density 0.33, short-block 80 chars).
  *
  * Pure string kernels, usable as codegen-friendly UDF columns.
  */
object HtmlExtract {

  private val BlockTags = Set(
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "tr", "td", "th", "table", "section", "article", "header", "footer",
    "nav", "aside", "main", "blockquote", "pre", "hr", "form", "figure")

  private val DropTags = Set("script", "style", "noscript", "template", "svg", "iframe")

  private val Entities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”")

  /** Decode named/decimal/hex entities; unknown ones pass through. */
  def decodeEntities(s: String): String = {
    if (!s.contains('&')) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X"))
              try Some(Character.toChars(Integer.parseInt(body.drop(2), 16)).mkString)
              catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try Some(Character.toChars(body.drop(1).toInt).mkString)
              catch { case _: Exception => None }
            else Entities.get(body.toLowerCase(java.util.Locale.ROOT))
          decoded match {
            case Some(d) => out ++= d; i = semi + 1
            case None => out += c; i += 1
          }
        } else { out += c; i += 1 }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  private final case class Block(text: String, linkChars: Int)

  /** Walk the markup once: emit (blocks with link-char counts). */
  private def blocks(html: String): Seq[Block] = {
    val out = ArrayBuffer.empty[Block]
    val cur = new StringBuilder
    var curLink = 0
    var linkDepth = 0
    var i = 0
    val n = html.length
    // allocation-free case-insensitive scan: a whole-document toLowerCase per
    // script/style tag is quadratic, and lowercasing can change string length
    // (U+0130), which would desync indices with the original
    def indexOfIgnoreCase(needle: String, from: Int): Int = {
      val m = needle.length
      var p = math.max(0, from)
      while (p <= n - m) {
        if (html.regionMatches(true, p, needle, 0, m)) return p
        p += 1
      }
      -1
    }

    def flush(): Unit = {
      val t = decodeEntities(cur.toString).replaceAll("[ \\t\\u00a0]+", " ").trim
      if (t.nonEmpty) out += Block(t, curLink)
      cur.clear()
      curLink = 0
    }

    while (i < n) {
      val c = html(i)
      if (c == '<') {
        val close = html.indexOf('>', i + 1)
        if (close < 0) { i = n } // truncated tag: drop the tail
        else {
          val inner = html.substring(i + 1, close).trim
          if (inner.startsWith("!--")) {
            val end = html.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else {
            val isEnd = inner.startsWith("/")
            val name = inner.dropWhile(_ == '/').takeWhile(ch => ch.isLetterOrDigit).toLowerCase(java.util.Locale.ROOT)
            if (!isEnd && DropTags.contains(name) && !inner.endsWith("/")) {
              // skip to the matching close tag (no nesting of like tags in practice)
              val endTag = "</" + name
              val at = indexOfIgnoreCase(endTag, close + 1)
              i = if (at < 0) n else html.indexOf('>', at) match { case -1 => n; case e => e + 1 }
            } else {
              if (name == "a") { if (isEnd) linkDepth = math.max(0, linkDepth - 1) else if (!inner.endsWith("/")) linkDepth += 1 }
              if (BlockTags.contains(name)) flush()
              i = close + 1
            }
          }
        }
      } else {
        cur += (if (c == '\n' || c == '\r') ' ' else c)
        if (linkDepth > 0 && !c.isWhitespace) curLink += 1
        i += 1
      }
    }
    flush()
    out.toSeq
  }

  /** All text, markup stripped, one line per block. */
  def stripTags(html: String): String =
    if (html == null) null else blocks(html).map(_.text).mkString("\n")

  /** Main-content text: link-dense and very short blocks dropped
    * (jusText-style: density > 0.33 or fewer than `minChars` chars,
    * unless a short block sits between two kept blocks — headings). */
  def mainText(html: String, minChars: Int = 80, maxLinkDensity: Double = 0.33): String = {
    if (html == null) return null
    val bs = blocks(html)
    val good = bs.map { b =>
      val nonWs = b.text.count(!_.isWhitespace)
      val density = if (nonWs == 0) 1.0 else b.linkChars.toDouble / nonWs
      density <= maxLinkDensity && b.text.length >= minChars
    }
    // rescue short low-density blocks sandwiched between good ones (headings)
    val kept = bs.indices.map { i =>
      good(i) || {
        val b = bs(i)
        val nonWs = b.text.count(!_.isWhitespace)
        val density = if (nonWs == 0) 1.0 else b.linkChars.toDouble / nonWs
        density <= maxLinkDensity &&
          ((i > 0 && good(i - 1)) || (i + 1 < bs.length && good(i + 1))) &&
          b.text.length >= 15
      }
    }
    bs.indices.filter(kept).map(bs(_).text).mkString("\n")
  }

  /** q_html: per event, a synthetic page (nav + article paragraph +
    * footer, the paragraph deterministic from the id) runs through
    * the REAL boilerplate removal in-task; the chrome must vanish and
    * the paragraph survive byte-exactly (a require), so the oracle
    * can aggregate the kept text length in plain SQL. */
  def htmlQuery(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val extractLen = udf { id: Long =>
      val para = (("w" + (id % 97) + " ") * 30).trim
      val html =
        s"""<html><head><title>T</title><style>.x{}</style></head><body>
           |<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
           |<p>$para</p>
           |<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>
           |</body></html>""".stripMargin
      val main = mainText(html)
      require(main == para, s"boilerplate removal drifted: got ${main.take(60)}")
      main.length
    }
    graft.Tables
      .eventsRaw(s, dir)
      .select($"event_type", extractLen($"event_id").as("len"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_docs"), sum($"len").cast("long").as("kept_chars"))
      .orderBy($"event_type")
  }

  /** <title> contents, entity-decoded. */
  def title(html: String): Option[String] = {
    if (html == null) return None
    val lower = html.toLowerCase(java.util.Locale.ROOT)
    val at = lower.indexOf("<title")
    if (at < 0) return None
    val open = html.indexOf('>', at)
    val close = lower.indexOf("</title", at)
    if (open < 0 || close < 0 || close <= open) return None
    Some(decodeEntities(html.substring(open + 1, close)).trim).filter(_.nonEmpty)
  }
}
