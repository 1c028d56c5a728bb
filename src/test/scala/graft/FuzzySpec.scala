package graft

import org.apache.spark.sql.functions._

import graft.text.Fuzzy

/** SymSpell blocked fuzzy join: the deletion-key blocking must find
  * EXACTLY the pairs a brute-force N² distance scan finds (no recall
  * loss from blocking), while generating only a linear number of keys.
  */
class FuzzySpec extends SparkSuite {
  import spark.implicits._

  private val dict = ((0 until 300).map(i => s"word${i % 97}x${i % 13}") ++
    Seq("cat", "bat", "cats", "at", "a", "b", "", "spark", "spork", "sparks", "park"))
    .distinct.filter(_.nonEmpty)

  test("blocked pairs == brute-force distance-1 pairs (blocking loses nothing, adds nothing)") {
    val df = dict.toDF("w")
    val blocked = Fuzzy
      .fuzzyPairs(df)
      .select($"wa", $"wb")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    val brute = (for {
      a <- dict; b <- dict if a < b
      if org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance.apply(a, b) <= 1
    } yield (a, b)).toSet
    assert(blocked === brute)
  }

  test("key generation is linear: <= len+1 keys per word, never pairwise") {
    val df = dict.toDF("w")
    val nKeys = df.select(explode(Fuzzy.deletionKeys($"w"))).count()
    assert(nKeys <= dict.map(_.length + 1).sum)
  }

  test("deletionKeysSerial equals the relational HOF spelling, row for row (incl. astral codepoints)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val words = Seq("spark", "a", "", "naïve", "x😀y", "doppelgänger").toDF("w")
    val hof = words.select(
      col("w"),
      array_union(
        array(col("w")),
        transform(
          sequence(lit(0), length(col("w")) - 1),
          i => concat(col("w").substr(lit(1), i), col("w").substr(i + lit(2), length(col("w"))))
        )
      ).as("ks")
    ).as[(String, Seq[String])].collect().sortBy(_._1).toSeq
    val serial = words.select(col("w"), graft.text.Fuzzy.deletionKeys(col("w")).as("ks"))
      .as[(String, Seq[String])].collect().sortBy(_._1).toSeq
    assert(serial === hof)
  }

  test("single-char words link through the empty-string deletion key") {
    val pairs = Fuzzy
      .fuzzyPairs(Seq("a", "b", "xy").toDF("w"))
      .select($"wa", $"wb", $"dist")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(pairs.contains(("a", "b", 1L)))
    assert(!pairs.exists(p => p._1 == "xy" || p._2 == "xy"))
  }

  test("entity resolution: distance-2 variants cluster through a distance-1 chain") {
    import org.apache.spark.sql.functions._
    // spark ~ spbrk (sub at 2... dist 1 via deletion keys? spark/spbrk:
    // substitution) ~ spbk: spark-spbrk dist 1, spbrk-spbk dist 1,
    // spark-spbk dist 2 -> one cluster of 3 via transitivity
    val dict = Seq("spark", "spbrk", "spbk", "zzzz").toDF("w")
    val pairs = graft.operators.Staged.persist(Fuzzy.fuzzyPairs(dict).select($"wa", $"wb"))
    def h(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val members = pairs.select($"wa".as("w")).union(pairs.select($"wb".as("w"))).distinct()
    val labels = graft.operators.Graph
      .components(members.select(h($"w").as("id")), pairs.select(h($"wa").as("src"), h($"wb").as("dst")))
    val clustered = members
      .select($"w", h($"w").as("id"))
      .join(labels, Seq("id"))
      .collect()
      .map(r => r.getString(1) -> r.getLong(2))
      .toMap
    assert(clustered.keySet === Set("spark", "spbrk", "spbk"), "zzzz stays out")
    assert(clustered.values.toSet.size === 1, "one entity cluster via the distance-1 chain")
  }
}
