package graft.text

/** URL canonicalization — the dedup key a web-scale curation pipeline
  * groups on before content dedup (two crawls of one page differ only
  * in tracking params, fragment, host case, default port). The rules
  * are the common-crawl-style conservative set:
  *
  *  - scheme and host lowercased; a single leading `www.` stripped
  *  - default ports dropped (http:80, https:443)
  *  - fragment dropped
  *  - percent-encodings of UNRESERVED characters decoded (A-Za-z0-9
  *    -._~), all others left intact, hex digits uppercased
  *  - tracking query parameters removed (utm_*, fbclid, gclid,
  *    msclkid, mc_eid, igshid, ref_src); remaining params kept in
  *    ORIGINAL order (sorting changes semantics on some sites —
  *    conservative choice, documented)
  *  - empty query/path normalized ("" path → "/", trailing "?" gone)
  *
  * Pure string function — usable as a codegen-friendly column via
  * `udf`, grouped on before MinHash/SimHash in the dedup tier.
  */
object UrlCanon {

  private val TrackingExact = Set("fbclid", "gclid", "msclkid", "mc_eid", "igshid", "ref_src", "yclid")

  private def isTracking(key: String): Boolean = {
    val k = key.toLowerCase(java.util.Locale.ROOT)
    k.startsWith("utm_") || TrackingExact.contains(k)
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == '_' || c == '~'

  /** Decode %XX of unreserved chars, uppercase the rest's hex. */
  private def normalizePercent(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '%' && i + 2 < s.length &&
        Character.digit(s(i + 1), 16) >= 0 && Character.digit(s(i + 2), 16) >= 0) {
        val v = (Character.digit(s(i + 1), 16) << 4) | Character.digit(s(i + 2), 16)
        if (isUnreserved(v.toChar)) out += v.toChar
        else { out += '%'; out += Character.toUpperCase(s(i + 1)); out += Character.toUpperCase(s(i + 2)) }
        i += 3
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** Canonical form, or the input unchanged when it isn't an
    * absolute http(s) URL (other schemes pass through untouched —
    * flag, don't mangle). */
  def canonical(url: String): String = {
    if (url == null) return null
    val t = url.trim
    val schemeEnd = t.indexOf("://")
    if (schemeEnd <= 0) return t
    val scheme = t.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    if (scheme != "http" && scheme != "https") return t
    val rest = t.substring(schemeEnd + 3)
    // split authority / path / query / fragment
    val fragAt = rest.indexOf('#')
    val noFrag = if (fragAt >= 0) rest.substring(0, fragAt) else rest
    val qAt = noFrag.indexOf('?')
    val (authPath, query) = if (qAt >= 0) (noFrag.substring(0, qAt), noFrag.substring(qAt + 1)) else (noFrag, "")
    val pathAt = authPath.indexOf('/')
    val auth = if (pathAt >= 0) authPath.substring(0, pathAt) else authPath
    val path = if (pathAt >= 0) authPath.substring(pathAt) else "/"
    // authority: split userinfo off FIRST (case-sensitive per RFC 3986 —
    // lowercasing it would over-merge distinct users), then lowercase only
    // host[:port] and strip one leading www. / the default port
    val (userinfo, hostPort) = {
      val at = auth.lastIndexOf('@')
      if (at >= 0) (auth.substring(0, at + 1), auth.substring(at + 1).toLowerCase(java.util.Locale.ROOT))
      else ("", auth.toLowerCase(java.util.Locale.ROOT))
    }
    var (host, port) = {
      val colon = hostPort.lastIndexOf(':')
      if (colon >= 0 && hostPort.drop(colon + 1).forall(_.isDigit))
        (hostPort.substring(0, colon), hostPort.substring(colon + 1))
      else (hostPort, "")
    }
    if (host.startsWith("www.") && host.length > 4) host = host.substring(4)
    val defaultPort = (scheme == "http" && port == "80") || (scheme == "https" && port == "443")
    val portPart = if (port.isEmpty || defaultPort) "" else ":" + port
    // query: drop tracking params, keep original order
    val keptQuery =
      if (query.isEmpty) ""
      else query.split("&", -1).filter { kv =>
        val key = kv.indexOf('=') match { case -1 => kv; case e => kv.substring(0, e) }
        kv.nonEmpty && !isTracking(key)
      }.mkString("&")
    val qPart = if (keptQuery.isEmpty) "" else "?" + keptQuery
    scheme + "://" + userinfo + host + portPart + normalizePercent(path) + normalizePercent(qPart)
  }

  /** q_url_canon: per event_type, crawl-variant URLs built from the
    * group's own ids (three variants per id — www+utm, uppercase
    * scheme+default port, fragment — that all canonicalize to one
    * form) collapse through the REAL kernel; the oracle counts the
    * distinct (site, page) pairs directly. */
  def urlCanonQuery(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val mkUrl = udf { id: Long =>
      val site = id % 50
      val page = id % 100
      (id % 3) match {
        case 0 => s"https://www.site$site.com/p?id=$page&utm_source=feed"
        case 1 => s"HTTPS://site$site.com:443/p?id=$page"
        case _ => s"https://site$site.com/p?id=$page#frag"
      }
    }
    val canonUdf = udf(canonical _)
    graft.Tables
      .eventsRaw(s, dir)
      .select($"event_type", canonUdf(mkUrl($"event_id")).as("canon"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_urls"),
        countDistinct($"canon").as("n_canon")
      )
      .orderBy($"event_type")
  }
}
