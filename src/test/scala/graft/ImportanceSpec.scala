package graft

import graft.text.Importance

/** Kneser-Ney bigram training + DSIR importance weights: structural
  * invariants on real (sf0.001) data; exact values are gated by the
  * q_kn_lm / q_dsir DuckDB oracles. */
class ImportanceSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("bigramsSerial equals the relational transform-over-sequence spelling, row for row") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a c"),
      (2L, "one"),
      (3L, ""),
      (4L, "Case FOLDS and punct, splits; tokens 1 2 3"),
      (5L, "Üñïçôdé wörter bleiben gleich")
    ).toDF("doc_id", "text")
    val hof = docs
      .withColumn("t", regexp_extract_all(lower($"text"), lit("\\w+"), lit(0)))
      .filter(size($"t") >= 2)
      .select(explode(expr("transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i + 1] AS w2))")).as("b"))
      .select($"b.w1", $"b.w2")
      .as[(String, String)].collect().sorted.toSeq
    val serial = Importance.bigrams(docs).as[(String, String)].collect().sorted.toSeq
    assert(serial === hof)
  }

  test("dsirFeatCountsSerial equals the per-occurrence md5-bucket counting, per doc") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a c"),
      (2L, "one"),
      (3L, ""),
      (4L, "Case FOLDS and punct, splits; tokens 1 2 3 tokens tokens"),
      (5L, "Üñïçôdé wörter bleiben gleich wörter")
    ).toDF("doc_id", "text")
    val occ = docs
      .select(
        $"doc_id",
        explode(regexp_extract_all(lower($"text"), lit("\\w+"), lit(0))).as("w")
      )
      .select(
        $"doc_id",
        (conv(substring(md5(concat(lit("ds:"), $"w")), 1, 15), 16, 10).cast("long") % 1024).as("f")
      )
      .groupBy($"doc_id", $"f")
      .agg(count(lit(1)).as("cf"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val serial = docs
      .select($"doc_id", explode(Importance.dsirFeatCountsSerial($"text")).as("x"))
      .select($"doc_id", $"x.f", $"x.cf")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(serial === occ)
  }

  test("Kneser-Ney components: valid probability rationals, consistent counts, ordered emission") {
    val rows = Importance.knLmQuery(spark, dir).collect()
    assert(rows.length == 15)
    var prevC12 = Long.MaxValue
    rows.foreach { r =>
      val c12 = r.getAs[Long]("c12")
      val c1 = r.getAs[Long]("c1")
      val contRight = r.getAs[Long]("cont_right")
      val contLeft = r.getAs[Long]("cont_left")
      val types = r.getAs[Long]("types_total")
      val num = r.getAs[Long]("pkn_num")
      val den = r.getAs[Long]("pkn_den")
      assert(c12 >= 1 && c12 <= c1, "a bigram count is bounded by its left-context count")
      assert(contRight >= 1 && contRight <= c1)
      assert(contLeft >= 1 && contLeft <= types)
      // the emitted rational IS the interpolated-KN formula
      assert(num == (4 * c12 - 3) * types + 3 * contRight * contLeft)
      assert(den == 4 * c1 * types)
      // Pkn is a probability: 0 < num < den (c12 >= 1, D = 3/4 < 1)
      assert(num > 0 && num < den, s"Pkn out of (0,1): $num/$den")
      assert(c12 <= prevC12, "emission must be count-descending")
      prevC12 = c12
    }
  }

  test("per-context KN mass sums to exactly 1 on a toy corpus") {
    // corpus: "a b a b a c" → bigrams ab, ba, ab, ba, ac
    // contexts: a→{b:2, c:1}, b→{a:2}
    // P(·|a) must sum to 1 exactly in the rational domain for the seen
    // continuations plus the discount mass routed through Pcont —
    // verify Σ_seen Pkn(w2|a) = [Σ (4c−3)·T + 3·cont_right(a)·Σ cont_left] / (4·c1·T)
    val T = 3L // types: ab, ba, ac
    val c1a = 3L // bigrams with left context a
    val contRightA = 2L
    val contLeft = Map("b" -> 1L, "a" -> 1L, "c" -> 1L) // distinct left contexts per w2
    val pAB = ((4 * 2 - 3) * T + 3 * contRightA * contLeft("b"), 4 * c1a * T)
    val pAC = ((4 * 1 - 3) * T + 3 * contRightA * contLeft("c"), 4 * c1a * T)
    // unseen continuation a→a gets only the continuation term:
    // D·cont_right/c1 · cont_left/T = 3·2·1 / (4·3·3)
    val pAA = (3 * contRightA * contLeft("a"), 4 * c1a * T)
    val total = pAB._1 + pAC._1 + pAA._1
    assert(total == pAB._2, s"KN mass over the full vocab must be exactly 1, got $total/${pAB._2}")
  }

  test("DSIR: exact integer scores, target slice present, per-source rollup complete") {
    val rows = Importance.dsirQuery(spark, dir).collect()
    assert(rows.nonEmpty)
    val docTotal = graft.Tables.documents(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docTotal, "every document must be scored")
    rows.foreach { r =>
      assert(r.getAs[Long]("score_max") >= 0)
      assert(r.getAs[Long]("score_sum") >= r.getAs[Long]("score_max"))
      assert(r.getAs[Long]("top_doc") >= 0)
    }
    assert(rows.exists(_.getAs[String]("source") == "src0"), "the target slice itself is scored")
  }
}
