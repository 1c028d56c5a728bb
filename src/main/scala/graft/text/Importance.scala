package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-level language-model training and data-selection weighting —
  * two published building blocks of large-scale training-data
  * pipelines, relationally expressed:
  *
  *  - **Kneser-Ney bigram training** (interpolated, absolute discount
  *    D = 0.75): the smoothing family every count-based n-gram LM
  *    pipeline trains. The distinctive machinery vs the add-one model
  *    q_lm_score already has: CONTINUATION counts — N1+(w1·) distinct
  *    right continuations, N1+(·w2) distinct left contexts — and the
  *    discount redistribution. With D = 3/4 the probability is the
  *    exact rational  [(4·c12−3)·T + 3·N1+(w1·)·N1+(·w2)] / (4·c1·T),
  *    so q_kn_lm emits integer numerator/denominator — no float ever
  *    reaches the output and the DuckDB oracle reproduces it exactly.
  *
  *  - **DSIR-style hashed n-gram importance weights** (data selection
  *    via importance resampling): score each document by how much its
  *    hashed unigram features look like a TARGET corpus slice vs the
  *    whole corpus. Feature = md5-derived bucket (engine-neutral, the
  *    repo-wide hash convention); the per-feature ratio is quantized
  *    to the integer floor((ct+1)·10⁶ / (cs+1)) (Laplace-smoothed),
  *    so per-doc scores are exact integer sums in both engines.
  *
  * Scale shapes: everything is partial-agg groupBys on token/bigram/
  * feature keys plus joins on those same keys — no all-pairs, no
  * driver loops; the top-k emission is a TakeOrdered over the (much
  * smaller) type table. At 100 TB the count tables are the classic
  * map-side-combine aggregations; the feature-ratio table is tiny
  * (1024 rows) and broadcasts.
  */
object Importance {

  private def tokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, dir)
      .select($"doc_id", $"source", posexplode(regexp_extract_all(lower($"text"), lit("\\w+"), lit(0))).as(Seq("pos", "w")))
  }

  /** Per-document bigram expansion with NO window: adjacent token
    * pairs come straight out of the token array (each document row is
    * self-contained), so the extraction is a stateless per-row map —
    * shuffle-free before the count aggregations AND streamable (the
    * StreamImportance twin runs the identical frame under Structured
    * Streaming). */
  def bigrams(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // one-call serial kernel, value-identical to the former
    // transform-over-sequence HOF spelling (ImportanceSpec proves
    // row-for-row equality): tokenize once, emit adjacent pairs —
    // HOF lambdas are CodegenFallback and this runs per corpus row
    docs
      .select(explode(bigramsSerial($"text")).as("b"))
      .select($"b.w1", $"b.w2")
  }

  final case class Bigram(w1: String, w2: String)

  private[graft] val bigramsSerial = udf { text: String =>
    if (text == null) Seq.empty[Bigram]
    else {
      val m = java.util.regex.Pattern.compile("\\w+").matcher(text.toLowerCase)
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) toks += m.group()
      if (toks.length < 2) Seq.empty[Bigram]
      else (0 until toks.length - 1).map(i => Bigram(toks(i), toks(i + 1)))
    }
  }

  /** Per-document feature-count row (public: Catalyst's generated
    * deserializer must be able to instantiate it). */
  final case class FeatCount(f: Long, cf: Long)

  /** One-pass per-document DSIR feature-count kernel: tokens → md5
    * bucket `md5₆₀("ds:" ∥ w) mod 1024` → (feature, count) pairs in
    * first-occurrence order. Value-identical, after explode, to the
    * (doc, feature) count over the exploded token stream
    * (ImportanceSpec proves the per-doc identity), but one md5 per
    * DISTINCT token per document instead of per occurrence, no
    * per-occurrence rows, and no (doc, f) aggregation exchange. */
  private[graft] val dsirFeatCountsSerial = udf { text: String =>
    if (text == null) Seq.empty[FeatCount]
    else {
      val m = java.util.regex.Pattern.compile("\\w+").matcher(text.toLowerCase(java.util.Locale.ROOT))
      val toks = new java.util.LinkedHashMap[String, Long]()
      while (m.find()) {
        val w = m.group()
        toks.put(w, toks.getOrDefault(w, 0L) + 1L)
      }
      val feats = new java.util.LinkedHashMap[Long, Long]()
      val it = toks.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val f = TextOps.md5Hash60("ds:" + e.getKey) % 1024L
        feats.put(f, feats.getOrDefault(f, 0L) + e.getValue)
      }
      val out = new scala.collection.mutable.ArrayBuffer[FeatCount](feats.size())
      val it2 = feats.entrySet().iterator()
      while (it2.hasNext) { val e = it2.next(); out += FeatCount(e.getKey, e.getValue) }
      out.toSeq
    }
  }


  /** q_kn_lm: interpolated Kneser-Ney bigram statistics, top 15 bigram
    * types by count (deterministic tiebreak), emitted as exact integer
    * components + the exact rational probability. */
  def knLmQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Every statistic below is a function of the bigram TYPE table
    // (guide §2.3 — aggregate before you shuffle): c1 = Σ_w2 c12 (the
    // count of w1-as-first-word occurrences), N1+(w1·) = the number of
    // (w1, ·) types, N1+(·w2) = the number of (·, w2) types, T = the
    // type count. The former shape staged the bigram OCCURRENCE stream
    // and ran four separate passes over it (two of them countDistinct,
    // i.e. two-phase distinct aggs); deriving everything from c12
    // shuffles one partially-aggregated type table instead, and the
    // identical c12 subtrees share one exchange (AQE exchange reuse).
    // Counts are integer-exact and bit-identical by construction.
    val c12 = this
      .bigrams(Tables.documents(s, dir))
      .groupBy($"w1", $"w2")
      .agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
    val contRight = c12.groupBy($"w1").agg(count(lit(1)).as("cont_right"))
    val contLeft = c12.groupBy($"w2").agg(count(lit(1)).as("cont_left"))
    val types = c12.agg(count(lit(1)).as("types_total"))
    c12
      .join(c1, Seq("w1"))
      .join(contRight, Seq("w1"))
      .join(contLeft, Seq("w2"))
      .crossJoin(broadcast(types))
      .select(
        $"w1", $"w2",
        $"c12".cast("long").as("c12"),
        $"c1".cast("long").as("c1"),
        $"cont_right".cast("long").as("cont_right"),
        $"cont_left".cast("long").as("cont_left"),
        $"types_total".cast("long").as("types_total"),
        // Pkn = (c12 - 3/4)/c1 + (3/4)·cont_right/c1 · cont_left/T
        ((lit(4) * $"c12" - 3) * $"types_total" + lit(3) * $"cont_right" * $"cont_left")
          .cast("long").as("pkn_num"),
        (lit(4) * $"c1" * $"types_total").cast("long").as("pkn_den")
      )
      .orderBy($"c12".desc, $"w1", $"w2")
      .limit(15)
  }

  val KnLmOracle: String =
    """WITH bg0 AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t FROM documents),
      |bgl AS (
      |  SELECT doc_id, unnest([{'w1': t[i], 'w2': t[i+1]} for i in range(1, len(t))]) AS b
      |  FROM bg0 WHERE len(t) >= 2),
      |bigrams AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM bgl),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bigrams GROUP BY 1),
      |cr AS (SELECT w1, count(DISTINCT w2) AS cont_right FROM bigrams GROUP BY 1),
      |cl AS (SELECT w2, count(DISTINCT w1) AS cont_left FROM bigrams GROUP BY 1),
      |t AS (SELECT count(*) AS types_total FROM c12)
      |SELECT c12.w1, c12.w2,
      |  CAST(c12.c12 AS BIGINT) AS c12,
      |  CAST(c1.c1 AS BIGINT) AS c1,
      |  CAST(cr.cont_right AS BIGINT) AS cont_right,
      |  CAST(cl.cont_left AS BIGINT) AS cont_left,
      |  CAST(t.types_total AS BIGINT) AS types_total,
      |  CAST((4 * c12.c12 - 3) * t.types_total + 3 * cr.cont_right * cl.cont_left AS BIGINT) AS pkn_num,
      |  CAST(4 * c1.c1 * t.types_total AS BIGINT) AS pkn_den
      |FROM c12
      |JOIN c1 ON c1.w1 = c12.w1
      |JOIN cr ON cr.w1 = c12.w1
      |JOIN cl ON cl.w2 = c12.w2
      |CROSS JOIN t
      |ORDER BY c12.c12 DESC, c12.w1, c12.w2 LIMIT 15""".stripMargin

  /** q_dsir: hashed-unigram importance weights against the `src0`
    * target slice, Laplace-smoothed, integer-quantized per-feature
    * ratio, per-source roll-up of exact integer document scores. */
  def dsirQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // ONE corpus tokenize+md5 pass (guide §2.3 — aggregate before you
    // shuffle): the serial kernel emits per-doc (feature, count) pairs
    // (one md5 per DISTINCT token), so the staged frame is DOC-sized
    // instead of an occurrence-level cache. Every consumer reads it:
    // target/corpus feature totals are Σ cf, and the doc-score pass
    // starts from the same (doc, feature) rows.
    val per = Tables
      .documents(s, dir)
      .select($"doc_id", $"source", dsirFeatCountsSerial($"text").as("fc"))
      .transform(graft.operators.Staged.persist(_)) // staged: released by Staged.releaseAll
    val docf = per
      .select($"doc_id", $"source", explode($"fc").as("x"))
      .select($"doc_id", $"source", $"x.f".as("f"), $"x.cf".as("cf"))
    val target = docf.filter($"source" === "src0").groupBy($"f").agg(sum($"cf").as("ct"))
    val all = docf.groupBy($"f").agg(sum($"cf").as("cs"))
    val ratio = all
      .join(target, Seq("f"), "left_outer")
      // floor integer division (`div`), exact in both engines
      .select($"f", expr("(coalesce(ct, 0) + 1) * 1000000 div (cs + 1)").cast("long").as("a"))
    val docScores = docf
      .join(broadcast(ratio), Seq("f"))
      .groupBy($"doc_id", $"source")
      .agg(sum($"cf" * $"a").cast("long").as("score"))
    docScores
      .withColumn("mx", max($"score").over(Window.partitionBy($"source")))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"score").cast("long").as("score_sum"),
        max($"score").cast("long").as("score_max"),
        min(when($"score" === $"mx", $"doc_id")).as("top_doc")
      )
      .orderBy($"source")
  }

  val DsirOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source, unnest(regexp_extract_all(lower(text), '\w+')) AS w FROM documents),
      |feats AS (
      |  SELECT doc_id, source,
      |    ('0x' || substr(md5('ds:' || w), 1, 15))::BIGINT % 1024 AS f
      |  FROM toks),
      |target AS (SELECT f, count(*) AS ct FROM feats WHERE source = 'src0' GROUP BY 1),
      |alls AS (SELECT f, count(*) AS cs FROM feats GROUP BY 1),
      |ratio AS (
      |  SELECT alls.f, (coalesce(target.ct, 0) + 1) * 1000000 // (alls.cs + 1) AS a
      |  FROM alls LEFT JOIN target ON target.f = alls.f),
      |docf AS (SELECT doc_id, source, f, count(*) AS cf FROM feats GROUP BY 1, 2, 3),
      |scores AS (
      |  SELECT d.doc_id, d.source, CAST(sum(d.cf * r.a) AS BIGINT) AS score
      |  FROM docf d JOIN ratio r ON r.f = d.f GROUP BY 1, 2)
      |SELECT source,
      |  count(*) AS n_docs,
      |  CAST(sum(score) AS BIGINT) AS score_sum,
      |  CAST(max(score) AS BIGINT) AS score_max,
      |  CAST(min(CASE WHEN score = mx THEN doc_id END) AS BIGINT) AS top_doc
      |FROM (SELECT *, max(score) OVER (PARTITION BY source) AS mx FROM scores)
      |GROUP BY source ORDER BY source""".stripMargin
}
