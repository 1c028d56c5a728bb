package graft

import org.apache.spark.sql.functions._

import graft.core.Tags

/** Tag parsing against the reference's own test expectations
  * (`tests/registry_test.cpp:15-90`) — a relational engine flags
  * invalid tags instead of throwing.
  */
class TagsSpec extends SparkSuite {
  import spark.implicits._

  private def parse(tags: Seq[String], insecure: Boolean = false) =
    tags.toDF("tag")
      .select(col("tag"), Tags.parseTag(col("tag"), insecure).as("p"))
      .select(col("tag"), col("p.registry_url"), col("p.organization"), col("p.dataset"), col("p.valid"))
      .collect()
      .map(r => r.getString(0) -> ((Option(r.getString(1)), Option(r.getString(2)), Option(r.getString(3)), r.getBoolean(4))))
      .toMap

  test("reference Normal cases: host:port, insecure default scheme, default registry, missing dataset") {
    val m = parse(Seq("test:3000/myorg/myds", "myorg/myds", "myorg"))
    assert(m("test:3000/myorg/myds") === ((Some("https://test:3000"), Some("myorg"), Some("myds"), true)))
    assert(m("myorg/myds") === ((Some("https://" + Tags.DefaultRegistry), Some("myorg"), Some("myds"), true)))
    assert(m("myorg")._4 === false) // the CLI throws; the engine flags
    val ins = parse(Seq("test/myorg/myds"), insecure = true)
    assert(ins("test/myorg/myds")._1 === Some("http://test"))
  }

  test("reference ValidNames / invalid component cases") {
    val maxOrg = "a" * 129; val maxDs = "b" * 129
    val m = parse(Seq(
      "abc/def", "0rg/9dataset", "my_org/my_dataset", "my-org/my-dataset",
      "org_123-test/ds_456-data", "ab/cd", s"$maxOrg/$maxDs",
      "_org/dataset", "org/_dataset", "a/b", (("a" * 130) + "/ds")
    ))
    assert(m("abc/def")._2 === Some("abc") && m("abc/def")._3 === Some("def"))
    assert(m("0rg/9dataset")._4 && m("my_org/my_dataset")._4 && m("my-org/my-dataset")._4)
    assert(m("org_123-test/ds_456-data")._4 && m("ab/cd")._4)
    assert(m(s"$maxOrg/$maxDs")._4, "129-char components are the documented maximum")
    assert(!m("_org/dataset")._4 && !m("org/_dataset")._4, "leading underscore invalid")
    assert(!m("a/b")._4, "1-char components below the 2-char minimum")
    assert(!m(("a" * 130) + "/ds")._4, "130 chars exceeds the maximum")
  }

  test("verifyPasswords: candidates survive an empty password table; empty candidate accepted iff no passwords stored") {
    val cand = Seq((1L, "secret"), (2L, "")).toDF("cid", "pw")
    val noPw = Seq.empty[(String, String)].toDF("salt", "hash")
    val empty = Tags.verifyPasswords(cand, "pw", noPw)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(empty === Map(1L -> 0L, 2L -> 1L),
      "reference verify(): empty candidate accepted when zero passwords stored; others rejected, not dropped")

    val pw = Seq(("ab", "x")).toDF("salt", "raw")
      .select(col("salt"), Tags.saltedHash(col("salt"), col("raw")).as("hash"))
    val some = Tags.verifyPasswords(Seq((1L, "x"), (2L, "y"), (3L, "")).toDF("cid", "pw"), "pw", pw)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(some === Map(1L -> 1L, 2L -> 0L, 3L -> 0L),
      "with passwords stored: only the salted-hash match accepted; empty candidate no longer special")
  }

  test("normalization: case folding, trailing slashes, path drop, default-port strip") {
    val m = parse(Seq(
      "HTTPS://Reg.Example.com:443/Org1/DS1///",
      "http://h.example.com:80/path/org2/ds2"
    ))
    assert(m("HTTPS://Reg.Example.com:443/Org1/DS1///") ===
      ((Some("https://reg.example.com"), Some("org1"), Some("ds1"), true)))
    // the reference drops URL paths via homer6::Url; rightmost-split
    // parsing makes 'path' part of the registry remainder, dropped here
    assert(m("http://h.example.com:80/path/org2/ds2") ===
      ((Some("http://h.example.com"), Some("org2"), Some("ds2"), true)))
  }
}
