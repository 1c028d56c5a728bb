package graft

import graft.text.UrlCanon.canonical

/** URL canonicalization — the pre-dedup grouping key. */
class UrlCanonSpec extends SparkSuite {

  test("host/scheme case, www, default ports, fragments") {
    assert(canonical("HTTP://WWW.Example.COM/Path") == "http://example.com/Path")
    assert(canonical("https://example.com:443/a") == "https://example.com/a")
    assert(canonical("http://example.com:80/a") == "http://example.com/a")
    assert(canonical("http://example.com:8080/a") == "http://example.com:8080/a")
    assert(canonical("https://example.com/a#section-2") == "https://example.com/a")
    assert(canonical("https://example.com") == "https://example.com/")
    assert(canonical("https://www.example.com?x=1") == "https://example.com/?x=1")
  }

  test("tracking parameters drop; surviving params keep order") {
    assert(canonical("https://example.com/p?utm_source=tw&id=9&utm_medium=social&fbclid=abc") ==
      "https://example.com/p?id=9")
    assert(canonical("https://example.com/p?b=2&a=1") == "https://example.com/p?b=2&a=1")
    assert(canonical("https://example.com/p?gclid=x") == "https://example.com/p")
    assert(canonical("https://example.com/p?utm_campaign=") == "https://example.com/p")
    // a key named utmost is NOT tracking
    assert(canonical("https://example.com/p?utmost=1") == "https://example.com/p?utmost=1")
  }

  test("percent-encoding: unreserved decode, other escapes uppercase, malformed pass through") {
    assert(canonical("https://example.com/%7Euser/%41%42c") == "https://example.com/~user/ABc")
    assert(canonical("https://example.com/a%2fb") == "https://example.com/a%2Fb") // encoded slash stays encoded
    assert(canonical("https://example.com/a%2") == "https://example.com/a%2") // malformed untouched
    assert(canonical("https://example.com/p?q=%e2%82%ac") == "https://example.com/p?q=%E2%82%AC")
  }

  test("userinfo, non-http schemes and relative strings pass through safely") {
    assert(canonical("https://user:pw@www.example.com/x") == "https://user:pw@example.com/x")
    // userinfo is case-sensitive (RFC 3986 §3.2.1): only host lowercases,
    // so distinct users never over-merge into one dedup key
    assert(canonical("http://User@Example.COM/x") == "http://User@example.com/x")
    assert(canonical("http://User@host/x") != canonical("http://user@host/x"))
    assert(canonical("ftp://Example.com/a") == "ftp://Example.com/a")
    assert(canonical("not a url") == "not a url")
    assert(canonical("s3://bucket/key") == "s3://bucket/key")
    assert(canonical(null) == null)
  }

  test("as a dedup key over a DataFrame: crawl variants of one page collapse") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val canonicalUdf = udf(canonical _)
    val urls = Seq(
      "https://www.example.com/article?id=7&utm_source=feed",
      "HTTPS://example.com:443/article?id=7#top",
      "https://example.com/article?id=7",
      "https://example.com/other?id=8"
    ).toDF("url")
    val groups = urls.groupBy(canonicalUdf($"url").as("canon")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(groups("https://example.com/article?id=7") == 3)
    assert(groups("https://example.com/other?id=8") == 1)
  }
}
