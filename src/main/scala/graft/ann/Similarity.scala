package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a single scan + TakeOrdered
  * (per-partition heap), the right plan when the query set is small and
  * broadcastable. Scale path: LSH (random hyperplane sign buckets) and
  * IVF (k-means-lite coarse quantizer) restrict the scan to a bucket /
  * cell subset; both are expressed as join-on-key, never a cross join
  * over the full corpus.
  *
  * All vector math is `transform`/`zip_with`/`aggregate` column
  * expressions over `array<double>` — codegen'd, no UDF.
  */
object Similarity {

  /** Elementwise dot product of two array columns (double math). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** ◆ Brute-force cosine top-k against one query vector (vec_id = 0):
    * one scan, no shuffle beyond TakeOrdered's driver merge. */
  def bruteForceTopK(s: SparkSession, dir: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir).select($"vec_id", asDouble($"embedding").as("v"))
    val q = broadcast(emb.filter($"vec_id" === queryId).select($"v".as("qv")))
    emb
      .filter($"vec_id" =!= queryId)
      .crossJoin(q) // 1-row broadcast: a literal-vector comparison, not a real cross join
      .select($"vec_id", round(cosine($"v", $"qv"), 6).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id".asc)
      .limit(k)
  }

  /** Top-k neighbours for EVERY query row in `queries` against `corpus`
    * — broadcast the (small) query set, window-rank per query. This is
    * the batch-retrieval shape: corpus-side scan stays partition-local
    * until the final per-query heap. */
  def topKForQueries(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("corpus_id"), asDouble(col("embedding")).as("cv"))
    val q = broadcast(queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("corpus_id").asc)
    c.crossJoin(q)
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), round(cosine(col("cv"), col("qv")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH bucket id: sign bits of dot products with
    * `nBits` deterministic pseudo-random hyperplanes. Vectors in the
    * same bucket are near-duplicate candidates; probing neighbouring
    * buckets trades recall for scan cost. */
  def lshBucket(v: Column, dim: Int, nBits: Int = 16): Column = {
    // deterministic "random" hyperplanes from a hash of (bit, dim index)
    def plane(bit: Int): Seq[Double] =
      (0 until dim).map { j =>
        val h = scala.util.hashing.MurmurHash3.productHash((bit, j))
        (h.toDouble / Int.MaxValue) // in [-1, 1]
      }
    (0 until nBits)
      .map { b =>
        val p = plane(b)
        val d = aggregate(
          zip_with(v, lit(p.toArray), (x, w) => x * w),
          lit(0.0),
          (acc, x) => acc + x
        )
        when(d >= 0, lit(1L << b)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** ◆ LSH-bucketed near-neighbour candidates: join-on-bucket instead
    * of N² compare; exact cosine verifies inside the bucket. */
  def lshNeighbors(s: SparkSession, dir: String, nBits: Int = 12, minCos: Double = 0.9): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir).select($"vec_id", asDouble($"embedding").as("v"))
    val dim = 64
    val bucketed = emb.withColumn("bucket", lshBucket($"v", dim, nBits))
    val l = bucketed.select($"bucket", $"vec_id".as("id_a"), $"v".as("va"))
    val r = bucketed.select($"bucket", $"vec_id".as("id_b"), $"v".as("vb"))
    l.join(r, Seq("bucket"))
      .filter($"id_a" < $"id_b")
      .withColumn("cos_sim", cosine($"va", $"vb"))
      .filter($"cos_sim" >= minCos)
      .select($"id_a", $"id_b", round($"cos_sim", 6).as("cos_sim"))
  }

  /** IVF-style coarse quantization: assign each vector to the nearest
    * of `nCells` deterministic seed centroids (sampled by id hash),
    * then search only the query's cell (+1 probe cell). The centroid
    * table is broadcast; assignment is one scan. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val c = broadcast(centroids.select(col("cell_id"), col("centroid")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist").asc, col("cell_id").asc)
    corpus
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .crossJoin(c)
      .withColumn(
        "dist",
        aggregate(zip_with(col("v"), col("centroid"), (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x)
      )
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("cell_id"))
  }

  /** Deterministic centroid seed set: the first `nCells` vectors by id. */
  def seedCentroids(s: SparkSession, dir: String, nCells: Int): DataFrame = {
    import s.implicits._
    Tables
      .embeddings(s, dir)
      .orderBy($"vec_id")
      .limit(nCells)
      .select(monotonically_increasing_id().as("cell_id"), asDouble($"embedding").as("centroid"))
  }

  /** ◆ Vector-norm rollup by label — array math through the agg path. */
  def normByLabel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .embeddings(s, dir)
      .select($"label", norm(asDouble($"embedding")).as("nrm"))
      .groupBy($"label")
      .agg(round(avg($"nrm"), 6).as("avg_norm"), count(lit(1)).as("n"))
  }
}
