package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Blocked fuzzy join (record linkage by edit distance) — the SymSpell
  * deletion-neighborhood trick: a pair within Levenshtein distance 1
  * MUST share a key in {word} ∪ {single-char deletions}, so candidate
  * generation is an equi-join on deletion keys (≤ len+1 keys per word,
  * linear in corpus) instead of an N² distance matrix; the exact
  * `levenshtein` (codegen'd built-in) verifies once per DISTINCT
  * candidate pair. This is the string twin of the MinHash/LSH shape:
  * block → equi-join → verify — nothing all-pairs, every shuffle keyed.
  * At 100 TB dictionary scale the key explosion stays linear and the
  * join shuffles on short string keys, not documents.
  */
object Fuzzy {

  /** The word plus all single-deletion variants — the SymSpell key set
    * for max edit distance 1 (deletion keys of BOTH sides cover
    * substitution, insertion and deletion; FuzzySpec proves no distance-1
    * pair is missed). */
  def deletionKeys(w: Column): Column = deletionKeysSerial(w)

  /** One-call kernel form — value-identical to
    * `array_union(array(w), transform(sequence(…), deletions))`
    * (FuzzySpec proves equality): distinct-preserving first-occurrence
    * order, the word itself first. The HOF spelling ran interpreted
    * per dictionary row. */
  private[graft] val deletionKeysSerial = udf { w: String =>
    if (w == null) Seq.empty[String]
    else {
      // delete per CODEPOINT, matching Spark substr semantics (Java
      // String.substring counts UTF-16 units and would diverge on
      // astral-plane letters)
      val cps = w.codePoints().toArray
      val out = scala.collection.mutable.LinkedHashSet(w)
      var i = 0
      while (i < cps.length) {
        val sb = new java.lang.StringBuilder(w.length)
        var j = 0
        while (j < cps.length) { if (j != i) sb.appendCodePoint(cps(j)); j += 1 }
        out += sb.toString
        i += 1
      }
      out.toSeq
    }
  }

  /** All pairs of `dict("w")` within Levenshtein distance 1:
    * key-explode → equi-join → distinct pair → one exact verify.
    * Returns (wa, wb, dist) with wa < wb.
    *
    * PRECONDITION: `dict` must be DISTINCT on `w`. The deletion-key
    * kernel dedups its keys per word and the pair-level distinct below
    * keeps the RESULT correct for a non-distinct input, but duplicate
    * dictionary rows inflate the candidate equi-join quadratically in
    * the duplicate count (r18 removed the key-level distinct that
    * masked this — both in-repo callers pass distinct vocabularies). */
  def fuzzyPairs(dict: DataFrame): DataFrame = {
    // deletionKeysSerial dedups keys within a word (LinkedHashSet), so
    // with the distinct dict both callers pass, (w, k) rows are unique
    // by construction — the former .distinct() here was a full extra
    // shuffle that removed nothing. Pair-level dedup below still
    // guarantees the output either way.
    val keyed = dict
      .select(col("w"), explode(deletionKeys(col("w"))).as("k"))
    keyed
      .as("a")
      .join(keyed.as("b"), col("a.k") === col("b.k") && col("a.w") < col("b.w"))
      .select(col("a.w").as("wa"), col("b.w").as("wb"))
      .distinct() // a pair may share several deletion keys — verify once
      .withColumn("dist", levenshtein(col("wa"), col("wb")).cast("long"))
      .filter(col("dist") <= 1)
  }

  /** ◆ Fuzzy join under the oracle: the document vocabulary plus a
    * deterministic planted corruption of every ≥4-char word (2nd char
    * dropped — both engines derive the identical typo set), linked back
    * by the deletion-key join. DuckDB rebuilds the same key sets and
    * verifies with its own `levenshtein`. */
  def fuzzyJoinQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NOT staged: caching the vocabulary was A/B-measured at +0.5 s on
    // this lane (cache build + columnar encode cost more than the
    // second explode+distinct it saves — the distinct output is small)
    val words = Tables
      .documents(s, dir)
      .select(explode(split(lower($"text"), "\\W+")).as("w"))
      .filter($"w" =!= "")
      .distinct()
    val typos = words
      .filter(length($"w") >= 4)
      .select(concat($"w".substr(1, 1), $"w".substr(lit(3), length($"w"))).as("w"))
      .distinct()
    fuzzyPairs(words.union(typos).distinct())
  }

  /** ◆ q_entity_resolution — the full record-linkage composition:
    * blocked fuzzy match ([[fuzzyPairs]]) → connected components over
    * the match graph ([[graft.operators.Graph.components]], union-find
    * + contraction) → one canonical record per entity cluster. Words
    * ride as their md5-60 ids through the LONG-keyed CC machinery and
    * join back for the canonical spelling (the variant carrying the
    * min id — deterministic in both engines). Only linked clusters
    * surface (singletons are their own entity; emitting the whole
    * dictionary would drown the linkage signal). */
  def entityResolutionQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def h(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val pairs = graft.operators.Staged.persist(fuzzyJoinQuery(s, dir).select($"wa", $"wb"))
    val members = pairs.select($"wa".as("w")).union(pairs.select($"wb".as("w"))).distinct()
    val nodes = members.select(h($"w").as("id"))
    val edges = pairs.select(h($"wa").as("src"), h($"wb").as("dst"))
    val labels = graft.operators.Graph.components(nodes, edges) // (id, lab)
    val withWords = members
      .select($"w", h($"w").as("id"))
      .join(labels, Seq("id"))
    val canon = withWords.filter($"id" === $"lab").select($"lab", $"w".as("canonical"))
    withWords
      .groupBy($"lab")
      .agg(count(lit(1)).as("n_variants"), min($"w").as("first_variant"), max($"w").as("last_variant"))
      .join(canon, Seq("lab"))
      .select($"canonical", $"n_variants", $"first_variant", $"last_variant")
  }
}
