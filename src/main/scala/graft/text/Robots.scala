package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt exclusion protocol (RFC 9309) — the gate every polite
  * crawl pipeline applies before a page enters a corpus. Semantics
  * per the RFC:
  *
  *  - groups: consecutive `User-agent:` lines share the rule block
  *    that follows; the group whose product token is the LONGEST
  *    case-insensitive match for the crawler's UA applies, `*` as the
  *    fallback; several groups naming the same agent merge.
  *  - rules: `Allow:` / `Disallow:` path patterns match from the path
  *    start, `*` matching any octet sequence and a trailing `$`
  *    anchoring the end. The MOST SPECIFIC match wins — longest
  *    pattern in octets — with Allow winning exact ties. An empty
  *    `Disallow:` is "allow everything"; no matching rule is allow.
  *  - extras every real file carries: `Crawl-delay` (per group) and
  *    `Sitemap` (file-global) are surfaced, unknown directives skip.
  *
  * Scale shape: robots files are a per-HOST dimension (kB each, one
  * per registrable host — 10⁷–10⁸ rows at web scale), while pages are
  * the 100-TB fact side. [[gate]] parses each host's file ONCE,
  * executor-side, into the UA's compiled rule list, then EQUI-JOINS
  * pages against the compiled dimension on host — Spark broadcasts
  * when the dimension is small and sort-merges when it isn't; nothing
  * is ever collected to the driver, so host count is unbounded.
  * RobotsSpec pins the RFC cases; q_robots oracles the gate
  * end-to-end.
  */
object Robots {

  /** One path rule. `allow=false` is Disallow. */
  final case class Rule(allow: Boolean, pattern: String)

  /** Parsed file: groups keyed by lowercased product token, each with
    * its rules and optional crawl-delay; sitemaps are file-global. */
  final case class RobotsFile(
      groups: Map[String, (Vector[Rule], Option[Double])],
      sitemaps: Vector[String])

  /** Parse robots.txt content. Tolerant per the RFC: unknown
    * directives and malformed lines skip; `#` comments strip;
    * directive names are case-insensitive. */
  def parse(content: String): RobotsFile = {
    val groups = scala.collection.mutable.Map.empty[String, (Vector[Rule], Option[Double])]
    val sitemaps = Vector.newBuilder[String]
    var currentAgents: List[String] = Nil
    var lastWasAgent = false
    def addRule(r: Rule): Unit = currentAgents.foreach { a =>
      val (rules, cd) = groups.getOrElse(a, (Vector.empty, None))
      groups(a) = (rules :+ r, cd)
    }
    Option(content).getOrElse("").linesIterator.foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            val tok = value.toLowerCase(java.util.Locale.ROOT)
            // consecutive UA lines accumulate into one group start;
            // a UA line after rules starts a fresh group
            currentAgents = if (lastWasAgent) tok :: currentAgents else List(tok)
            currentAgents.foreach(a => if (!groups.contains(a)) groups(a) = (Vector.empty, None))
            lastWasAgent = true
          case "allow" => addRule(Rule(allow = true, value)); lastWasAgent = false
          case "disallow" => addRule(Rule(allow = false, value)); lastWasAgent = false
          case "crawl-delay" =>
            value.toDoubleOption.foreach { d =>
              currentAgents.foreach { a =>
                val (rules, _) = groups.getOrElse(a, (Vector.empty, None))
                groups(a) = (rules, Some(d))
              }
            }
            lastWasAgent = false
          case "sitemap" => if (value.nonEmpty) sitemaps += value; lastWasAgent = false
          case _ => lastWasAgent = false
        }
      }
    }
    RobotsFile(groups.toMap, sitemaps.result())
  }

  /** RFC 9309 path-pattern match: from the path start, `*` matches any
    * sequence, trailing `$` anchors the end. Iterative last-star
    * backtracking — O(|pattern|·|path|) worst case, so an adversarial
    * robots.txt full of `*`s cannot blow up a task (the naive
    * recursive matcher is exponential in the star count). */
  def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    var p = 0
    var s = 0
    var starP = -1 // position after the last '*' tried
    var starS = -1 // path position that star currently consumes up to
    while (true) {
      if (p == pat.length) {
        // pattern exhausted: a prefix match is a match unless anchored
        if (!anchored || s == path.length) return true
        if (starP < 0) return false
        starS += 1
        if (starS > path.length) return false
        p = starP; s = starS
      } else if (pat(p) == '*') { starP = p + 1; starS = s; p += 1 }
      else if (s < path.length && pat(p) == path(s)) { p += 1; s += 1 }
      else {
        if (starP < 0) return false
        starS += 1
        if (starS > path.length) return false
        p = starP; s = starS
      }
    }
    false // unreachable
  }

  /** Group selection: the longest product token that is a substring of
    * the UA (both lowercased), else `*`, else None (no groups → allow
    * all). */
  def groupFor(f: RobotsFile, userAgent: String): Option[(Vector[Rule], Option[Double])] = {
    val ua = Option(userAgent).getOrElse("").toLowerCase(java.util.Locale.ROOT)
    val named = f.groups.keys
      .filter(tok => tok != "*" && tok.nonEmpty && ua.contains(tok))
      .toSeq.sortBy(t => (-t.length, t))
      .headOption
    named.orElse(if (f.groups.contains("*")) Some("*") else None).map(f.groups)
  }

  /** The RFC verdict for (UA, path): most specific matching rule wins
    * (longest pattern), Allow on ties; no match → allowed. */
  def isAllowed(f: RobotsFile, userAgent: String, path: String): Boolean =
    groupFor(f, userAgent) match {
      case None => true
      case Some((rules, _)) =>
        val hits = rules.filter(r => r.pattern.nonEmpty && patternMatches(r.pattern, path))
        if (hits.isEmpty) true
        else {
          val best = hits.maxBy(r => (r.pattern.length, r.allow)) // allow wins length ties
          best.allow
        }
    }

  /** Crawl-delay for the UA's group, if stated. */
  def crawlDelay(f: RobotsFile, userAgent: String): Option[Double] =
    groupFor(f, userAgent).flatMap(_._2)

  /** Path+query of a URL as robots matching sees it ("/" when empty —
    * matching runs on the path-begins form). */
  def pathOf(url: String): String =
    try {
      val u = new java.net.URI(url)
      val p = Option(u.getRawPath).filter(_.nonEmpty).getOrElse("/")
      Option(u.getRawQuery).filter(_.nonEmpty).map(p + "?" + _).getOrElse(p)
    } catch { case _: Exception => "/" }

  // ------------------------------------------------------------------
  // Spark face
  // ------------------------------------------------------------------

  /** Gate a page frame by per-host robots files. `pages` carries
    * `urlCol`; `robotsByHost` is the (host, robots_txt) dimension.
    * JOIN-shaped for crawl scale: each host's file is parsed ONCE,
    * executor-side, into the compiled rule list the crawler's UA
    * selects (group resolution per RFC 9309 happens here, so the
    * fact side carries only pattern matching); pages then equi-join
    * the compiled dimension on host and Spark picks the physical
    * join — broadcast when the dimension is small, sort-merge when a
    * real crawl's 10⁷–10⁸ hosts make it a table in its own right.
    * Nothing is collected to the driver. Pages of hosts with no
    * robots file pass (the crawl convention); so do pages of hosts
    * whose selected group has no rules — both encode as an absent /
    * empty rule list, which is exactly the RFC's "no matching rule →
    * allow". Adds `robots_allowed`; filter on it or keep it for
    * audit. */
  def gate(
      spark: SparkSession,
      pages: DataFrame,
      robotsByHost: DataFrame,
      userAgent: String,
      urlCol: String = "url"): DataFrame = {
    val ua = userAgent
    // dim side: robots_txt → the UA's compiled rules ("A"/"D" + pattern,
    // most-specific-wins resolved at match time). Runs once per host, on
    // executors, keyed output — never on the driver.
    val compileRules = udf { txt: String =>
      groupFor(parse(Option(txt).getOrElse("")), ua) match {
        case None => Seq.empty[String]
        case Some((rules, _)) =>
          rules.collect { case Rule(allow, pat) if pat.nonEmpty => (if (allow) "A" else "D") + pat }
      }
    }
    // One row per host BEFORE compiling: duplicate snapshots of a host
    // (re-crawls) would otherwise fan out every page row of that host
    // through the equi-join. max() picks a single snapshot
    // deterministically; callers with versioned snapshots should
    // pre-select the one they want (e.g. latest by fetch ts).
    val compiledDim = robotsByHost
      .groupBy(lower(col("host").cast("string")).as("__robots_host"))
      .agg(max(col("robots_txt").cast("string")).as("__robots_txt"))
      .select(
        col("__robots_host"),
        compileRules(col("__robots_txt")).as("__robots_rules"))
    // fact side: host extraction is a map-side column; the join key.
    val hostOf = udf { url: String => graft.sources.Wet.hostOf(url) }
    val verdict = udf { (url: String, rules: Seq[String]) =>
      if (rules == null || rules.isEmpty) true
      else {
        val path = pathOf(url)
        val hits = rules.filter(r => patternMatches(r.substring(1), path))
        if (hits.isEmpty) true
        else hits.maxBy(r => (r.length - 1, r.charAt(0) == 'A')).charAt(0) == 'A'
      }
    }
    pages
      .withColumn("__robots_host", hostOf(col(urlCol)))
      .join(compiledDim, Seq("__robots_host"), "left")
      .withColumn("robots_allowed", verdict(col(urlCol), col("__robots_rules")))
      .drop("__robots_host", "__robots_rules")
  }

  // ------------------------------------------------------------------
  // q_robots — oracle-checked cycle
  // ------------------------------------------------------------------

  private val QueryRobots =
    """# graft crawl policy
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/open/
      |Disallow: /*.html$
      |Disallow: /search?
      |Crawl-delay: 2
      |
      |User-agent: otherbot
      |Disallow: /
      |
      |Sitemap: https://site.invalid/sitemap.xml
      |""".stripMargin

  /** Per event_type: each event becomes a URL whose path shape (id%7)
    * exercises a distinct RFC rule — prefix disallow, longer-allow
    * override, wildcard+anchor, anchor miss, query prefix, and the
    * longest-match tie between an Allow prefix and a wildcard — gated
    * through the REAL parse→group→match chain (the in-task require
    * pins each verdict to the closed form the oracle states). */
  def robotsQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val f = parse(QueryRobots)
    val bc = s.sparkContext.broadcast(f)
    val verdict = udf { id: Long =>
      val path = (id % 7) match {
        case 0 => s"/public/p$id"            // no rule → allow
        case 1 => s"/private/p$id"           // Disallow /private/ → deny
        case 2 => s"/private/open/p$id"      // longer Allow overrides → allow
        case 3 => s"/tmp$id.html"            // /*.html$ wildcard+anchor → deny
        case 4 => s"/a/p$id.htm"             // anchor miss (.htm) → allow
        case 5 => s"/search?q=$id"           // query prefix → deny
        case _ => s"/private/open/x$id.html" // Allow(14) beats /*.html$(8) → allow
      }
      val allowed = isAllowed(bc.value, "GraftBot/1.0", path)
      val expect = (id % 7) match {
        case 0 | 2 | 4 | 6 => true
        case _ => false
      }
      require(allowed == expect, s"robots verdict drifted for id $id path $path")
      // the named group must also behave: otherbot is denied everywhere
      require(!isAllowed(bc.value, "OtherBot/2.0", path) || path == "/",
        s"otherbot group leak for $path")
      allowed
    }
    graft.Tables
      .eventsRaw(s, dir)
      .select($"event_type", verdict($"event_id").as("allowed"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_pages"),
        sum(when($"allowed", 1L).otherwise(0L)).as("n_allowed"))
      .orderBy($"event_type")
  }
}
