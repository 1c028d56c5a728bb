package graft

import org.apache.spark.sql.functions._

import graft.ann.Similarity
import graft.text.{Dedup, TextOps}

/** Dedup / text-analysis / similarity behavior tests on controlled
  * inputs (the DuckDB oracle covers the SQL-expressible faces; these
  * cover the algorithmic guarantees).
  */
class TextSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
    (3L, "completely different content about spark distributed query engines"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (5L, "short")
  ).toDF("doc_id", "text")

  test("shingles: distinct word n-grams, short docs -> empty") {
    val sh = docs.select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
    val m = sh.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L).contains("the quick brown"))
    assert(m(1L).contains("quick brown fox"))
    assert(m(5L).isEmpty)
    assert(m(1L).distinct.size === m(1L).size)
  }

  test("termCountsSerial equals the exploded-token groupBy counting, per doc") {
    val edge = Seq(
      (10L, "a b a B A c"),
      (11L, ""),
      (12L, "Case FOLDS, punct; splits 1 2 3 case case"),
      (13L, "Üñïçôdé wörter bleiben gleich wörter")
    ).toDF("doc_id", "text")
    val all = docs.unionByName(edge)
    val expect = all
      .select($"doc_id", explode(regexp_extract_all(lower($"text"), lit("\\w+"), lit(0))).as("w"))
      .groupBy($"doc_id", $"w")
      .agg(count(lit(1)).as("c"))
      .as[(Long, String, Long)].collect().sorted.toSeq
    val got = all
      .select($"doc_id", explode(TextOps.termCountsSerial($"text")).as("t"))
      .select($"doc_id", $"t.w", $"t.c")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(got === expect)
  }

  test("shingleHashesSerial equals the relational explode+md5 derivation, per doc") {
    import org.apache.spark.sql.functions._
    for (n <- Seq(3, 8)) {
      val relational = docs
        .select($"doc_id", explode(Dedup.shingles($"text", n)).as("shingle"))
        .select($"doc_id", conv(substring(md5($"shingle"), 1, 15), 16, 10).cast("long").as("h"))
        .as[(Long, Long)]
        .collect()
        .groupBy(_._1)
        .view.mapValues(_.map(_._2).toSeq).toMap
      val kernel = docs
        .as[(Long, String)]
        .collect()
        .map { case (id, t) => id -> Option(Dedup.shingleHashesSerial(t, n)).map(_.toSeq).getOrElse(Seq.empty) }
        .toMap
      kernel.foreach { case (id, hs) =>
        assert(hs === relational.getOrElse(id, Seq.empty), s"doc $id n=$n")
      }
    }
  }

  test("minhash finds the near-dup and exact-dup pairs, not the unrelated doc") {
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = cand.map(c => (c._1, c._2)).toSet
    assert(pairs.contains((1L, 4L)), s"exact dup pair missing: $pairs")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)), s"near dup pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // exact dup estimates jaccard 1.0
    assert(cand.find(c => c._1 == 1L && c._2 == 4L).get._3 === 1.0)
  }

  test("simhash: exact dups hamming 0; unrelated doc far") {
    val sigs = docs.select($"doc_id", Dedup.simhashUdf($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(4L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(2L)) < java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)))
    val cand = Dedup.simhashCandidates(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.contains((1L, 4L)))
  }

  test("ngram jaccard: exact dup = 1.0, near dup high, threshold filters") {
    val j = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 4L)) === 1.0)
    assert(j.contains((1L, 2L)) && j((1L, 2L)) > 0.5 && j((1L, 2L)) < 1.0)
    assert(!j.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("token count, quality columns") {
    val df = Seq(("Hello, world! This is a test.", "x")).toDF("text", "lang")
    val r = df.select(TextOps.tokenCols($"text").as("t")).head()
    assert(r.getInt(0) === 6)
    val q = df.select(TextOps.qualityCols($"text"): _*).head()
    assert(q.getAs[Double]("n_chars") === 29.0)
    assert(math.abs(q.getAs[Double]("punct_ratio") - 3.0 / 29.0) < 1e-12)
    assert(math.abs(q.getAs[Double]("stopword_ratio") - 2.0 / 6.0) < 1e-12) // "is", "a"
  }

  test("gopher/quality kernel folds equal the HOF spellings, row for row (incl. \\x0B, U+2028, astral)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val texts = Seq(
      "The quick brown fox jumps over the lazy dog and that should have been fine with everyone here today " * 3,
      "- bullet one\n* bullet two\n  • indented bullet\nplain line\ntrailing dots...  \nunicode ellipsis…",
      "#### hashes #### and ..... dots .....",
      "",
      "short",
      "line with  vertical tab\nand U+2028 embedded\nweird -leading",
      "astral 😀😀 w😀rd and Ünïcôdé wörds the be to of and that have with",
      "   \n   \n- \n*\n•x"
    ).zipWithIndex.map(_.swap).toDF("id", "text")
    // former HOF spellings, inlined as the ground truth
    val words = regexp_extract_all($"text", lit("\\w+"), lit(0))
    val lines = split($"text", "\n")
    val hof = texts.select(
      $"id",
      aggregate(transform(words, w => length(w)), lit(0), (a, x) => a + x).cast("double").as("wc"),
      size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double").as("aw"),
      size(filter(lines, l => { val t = ltrim(l); t.startsWith("-") || t.startsWith("*") || t.startsWith("•") })).cast("double").as("bl"),
      size(filter(lines, l => { val t = rtrim(l); t.endsWith("...") || t.endsWith("…") })).cast("double").as("el"),
      size(filter(words, w => lower(w).isin(Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it").map(lit(_)): _*))).cast("double").as("sh")
    ).orderBy($"id").collect().toSeq
    // the kernel forms, read back through the public column faces
    val g = texts.select(Seq($"id") ++ graft.text.TextOps.gopherCols($"text") ++ graft.text.TextOps.qualityCols($"text"): _*)
    // flags are derived from the folds; compare the flag vector AND the
    // quality ratios against re-derivations from the HOF ground truth
    val hofFlags = texts.select(
      $"id",
      // rebuild the 9 gopher flags from HOF folds exactly as gopherCols does
      (size(words).cast("double") >= 50 && size(words).cast("double") <= 100000).as("f_words")
    ).orderBy($"id").collect().map(r => (r.getInt(0), r.getBoolean(1))).toMap
    val got = g.orderBy($"id").collect()
    got.foreach { r =>
      val id = r.getInt(0)
      assert(r.getAs[Boolean]("f_words") === hofFlags(id), s"f_words id=$id")
    }
    // fold-level equality (the real gate): re-expose the kernels
    val kern = texts.select(
      $"id",
      graft.text.TextOps.testWordChars(words).as("wc"),
      graft.text.TextOps.testAlphaWords(words).as("aw"),
      graft.text.TextOps.testBulletLines(lines).as("bl"),
      graft.text.TextOps.testEllipsisLines(lines).as("el"),
      graft.text.TextOps.testStopHits(words).as("sh")
    ).orderBy($"id").collect().toSeq
    hof.zip(kern).foreach { case (h, k) =>
      (1 to 5).foreach(i => assert(h.getDouble(i) === k.getDouble(i), s"fold $i id=${h.getInt(0)}"))
    }
  }

  test("langid: english stopwords detected; empty -> und") {
    val df = Seq(
      "the cat and the dog sat in the house of the king",
      "el perro y el gato en la casa de los reyes del pueblo",
      ""
    ).toDF("text")
    val got = df.select(TextOps.langIdUdf($"text").as("l")).collect().map(_.getString(0))
    assert(got(0) === "en")
    assert(got(1) === "es")
    assert(got(2) === "und")
  }

  test("fingerprint winnowing: identical docs identical fingerprints, stable") {
    val fp = docs.select($"doc_id", TextOps.fingerprintUdf($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fp(1L) === fp(4L))
    assert(fp(1L).nonEmpty)
    assert(fp(5L).isEmpty) // < 3 tokens
  }

  test("cosine similarity: exact self-similarity and orthogonality") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.6f, 0.8f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 0).select(transform($"embedding", _.cast("double")).as("qv"))
    val got = emb
      .filter($"vec_id" =!= 0)
      .crossJoin(broadcast(q))
      .select($"vec_id", Similarity.cosine(transform($"embedding", _.cast("double")), $"qv").as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 1.0) < 1e-12)
    assert(math.abs(got(2L)) < 1e-12)
    assert(math.abs(got(3L) - 0.6) < 1e-6) // float32 inputs: 0.6f != 0.6
  }

  test("topKForQueries ranks per query") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.topKForQueries(emb, emb.filter($"vec_id" <= 1), k = 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("corpus_id")).toMap
    assert(top(0L) === 1L)
    assert(top(1L) === 0L)
  }

  test("multi-table lsh recall vs brute force on real embeddings") {
    import graft.plans.VectorExpressions
    VectorExpressions.register(spark)
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val thr = 0.35
    val a = emb.select($"vec_id".as("id_a"), $"v".as("va"))
    val b = emb.select($"vec_id".as("id_b"), $"v".as("vb"))
    val brute = a.crossJoin(b)
      .filter($"id_a" < $"id_b")
      .filter(VectorExpressions.vecCosine($"va", $"vb") >= thr)
      .select($"id_a", $"id_b")
    val bruteSet = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNeighbors(spark, sf0001, minCos = thr)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(bruteSet)) // no false positives (exact verify inside buckets)
    if (bruteSet.nonEmpty) {
      val recall = lsh.size.toDouble / bruteSet.size
      assert(recall > 0.4, s"recall $recall over ${bruteSet.size} true pairs")
    }
  }

  test("lsh buckets: identical vectors share bucket") {
    val emb = Seq(
      (0L, (0 until 64).map(_.toFloat).toArray),
      (1L, (0 until 64).map(_.toFloat).toArray)
    ).toDF("vec_id", "embedding")
    val b = emb.select(Similarity.lshBucket(transform($"embedding", _.cast("double")), 64, 8).as("b"))
      .collect().map(_.getLong(0))
    assert(b(0) === b(1))
  }

  test("piiRedact: counts and exact redaction on hand inputs; clean text stays clean") {
    val docs = Seq(
      (1L, "mail me at jane.doe+spam@corp.example.org or 555-867-5309, host 10.0.0.1"),
      (2L, "two mails a@b.io c.d@e.f.gov one phone 123-456-7890"),
      (3L, "nothing sensitive here, just words and numbers like 42 and 3.14")
    ).toDF("doc_id", "text")
    val out = TextOps
      .piiRedact(docs, "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Int]("n_email"), r.getAs[Int]("n_phone"), r.getAs[Int]("n_ip"), r.getAs[String]("clean"))))
      .toMap
    assert(out(1L)._1 === 1 && out(1L)._2 === 1 && out(1L)._3 === 1)
    assert(out(1L)._4 === "mail me at <EMAIL> or <PHONE>, host <IP>")
    assert(out(2L)._1 === 2 && out(2L)._2 === 1 && out(2L)._3 === 0)
    assert(out(3L) === ((0, 0, 0, "nothing sensitive here, just words and numbers like 42 and 3.14")))
  }

  test("stratified split: EXACT floor proportions per language (the quantile-cut shape, no per-group sort)") {
    import org.apache.spark.sql.functions._
    val out = TextOps
      .stratifiedSplitQuery(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val perLang = Tables
      .documents(spark, sf0001)
      .groupBy(col("lang"))
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    perLang.foreach { case (lang, n) =>
      val train = out.getOrElse((lang, "train"), 0L)
      val vl = out.getOrElse((lang, "val"), 0L)
      val test = out.getOrElse((lang, "test"), 0L)
      assert(train == n * 80 / 100, s"$lang train $train of $n")
      assert(train + vl == n * 90 / 100, s"$lang train+val of $n")
      assert(train + vl + test == n, s"$lang total")
    }
    // plan shape: any (lang)-only-keyed window must sit over an
    // AGGREGATE (the 256-row bucket summary), never raw rows — the
    // finer (lang, bucket) window only ever sees the boundary sliver
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val plan = TextOps.stratifiedSplitQuery(spark, sf0001).queryExecution.sparkPlan
    val langOnly = plan.collect {
      case w: WindowExec if w.partitionSpec.flatMap(_.references.map(_.name.toLowerCase)).toSet == Set("lang") => w
    }
    assert(langOnly.nonEmpty, "expected the cumulative-bucket window")
    langOnly.foreach { w =>
      assert(
        w.child.exists { case _: BaseAggregateExec => true; case _ => false },
        "(lang)-keyed window must run over the bucket summary, not raw rows"
      )
    }
  }
}
