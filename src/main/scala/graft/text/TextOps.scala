package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language ID, document
  * fingerprinting. All per-row column math / codegen'd built-ins — no
  * shuffle except the final rollups, so these scale linearly with input
  * splits at 100 TB.
  */
object TextOps {

  /** Whitespace + BPE-ish token counts as pure column expressions. */
  def tokenCols(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+"), lit(0)))

  /** ◆ Token counting per document, rolled up by language. */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, dir)
      .select($"lang", tokenCols($"text").as("tokens"), length($"text").as("chars"))
      .groupBy($"lang")
      .agg(
        sum($"tokens").as("total_tokens"),
        round(avg($"tokens"), 4).as("avg_tokens"),
        round(avg($"chars"), 4).as("avg_chars"),
        count(lit(1)).as("docs")
      )
  }

  /** Quality-score components (length, punctuation ratio, stopword
    * ratio, mean word length) as pure column math. */
  def qualityCols(text: Column): Seq[Column] = {
    val nChars = length(text).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val words = regexp_extract_all(text, lit("\\w+"), lit(0))
    val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    val stopHits = size(filter(words, w => lower(w).isin(stopwords.map(lit(_)): _*))).cast("double")
    val nWords = size(words).cast("double")
    Seq(
      nChars.as("n_chars"),
      when(nChars > 0, punct / nChars).otherwise(lit(0.0)).as("punct_ratio"),
      when(nWords > 0, stopHits / nWords).otherwise(lit(0.0)).as("stopword_ratio"),
      when(nWords > 0, nChars / nWords).otherwise(lit(0.0)).as("mean_word_len")
    )
  }

  /** ◆ Quality scoring rolled up by source. */
  def qualityStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, dir)
      .select(Seq($"source") ++ qualityCols($"text"): _*)
      .groupBy($"source")
      .agg(
        round(avg($"punct_ratio"), 6).as("avg_punct_ratio"),
        round(avg($"stopword_ratio"), 6).as("avg_stopword_ratio"),
        round(avg($"mean_word_len"), 6).as("avg_word_len"),
        count(lit(1)).as("docs")
      )
  }

  /** Language-ID heuristic: score character-class + stopword evidence
    * per language family. Deterministic, pure-JVM — in a real pipeline
    * the profiles would come from training data; here a tiny built-in
    * profile set demonstrates the distributed shape (per-row map, no
    * shuffle). */
  private val langProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "los", "se", "del"),
    "fr" -> Set("le", "la", "de", "et", "les", "des", "est", "un", "une", "du"),
    "de" -> Set("der", "die", "und", "das", "ist", "von", "den", "mit", "ein", "zu")
  )

  val langIdUdf = udf { text: String =>
    if (text == null || text.isEmpty) "und"
    else {
      val toks = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
      if (toks.isEmpty) "und"
      else {
        val scores = langProfiles.map { case (lang, stops) =>
          lang -> toks.count(stops.contains).toDouble / toks.length
        }
        val (best, score) = scores.maxBy { case (l, v) => (v, l) }
        if (score <= 0.0) "und" else best
      }
    }
  }

  /** Language ID over the corpus (rows-only check: heuristic output has
    * no SQL oracle). */
  def langIdQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, dir)
      .withColumn("lang_pred", langIdUdf($"text"))
      .groupBy($"lang_pred")
      .agg(count(lit(1)).as("n"))
  }

  /** Rolling-hash document fingerprinting (winnowing, window w=4 over
    * word 3-gram hashes): per-document set of selected hashes. Used by
    * near-dup candidate generation. Deterministic. */
  val fingerprintUdf = udf { text: String =>
    if (text == null) Array.empty[Long]
    else {
      val toks = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
      if (toks.length < 3) Array.empty[Long]
      else {
        val grams = toks.sliding(3).map(_.mkString(" ")).toArray
        val hashes = grams.map(g => scala.util.hashing.MurmurHash3.stringHash(g).toLong & 0xffffffffL)
        val w = 4
        if (hashes.length <= w) Array(hashes.min)
        else hashes.sliding(w).map(_.min).toArray.distinct.sorted
      }
    }
  }

  /** Document fingerprints (rows-only check). */
  def fingerprintQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, dir)
      .select($"doc_id", fingerprintUdf($"text").as("fingerprint"))
      .select($"doc_id", size($"fingerprint").as("n_fingerprints"))
  }
}
