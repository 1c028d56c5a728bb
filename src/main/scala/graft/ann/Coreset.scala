package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Staged

/** Greedy k-center coreset selection (Gonzalez 1985, the 2-approximate
  * farthest-point heuristic) — the diversity half of data curation:
  * pick k items so every vector is close to some pick (SemDeDup prunes
  * redundancy; k-center picks COVERAGE — facility-location style
  * subset selection over embeddings).
  *
  * Round t: the point MAXIMIZING its min distance to the selected
  * centers joins the set. Each round is one distributed pass (a
  * codegen'd zip_with/aggregate distance against the newest center, a
  * `least` fold into the running min-distance column, and a top-1
  * TakeOrdered) plus a ONE-ROW collect — k rows total reach the
  * driver, the k-bounded collect pattern the centroid trainers use.
  * The min-distance state is checkpointed per round so lineage stays
  * flat and each pass reads the previous state, not the whole chain.
  *
  * DETERMINISM: distances round to 4dp BEFORE the least-fold and the
  * argmax (both engines then chain bit-identical values — a raw
  * two-engine d² can differ in the last ulp); argmax ties break on
  * vec_id. Selection is then a pure function of the vector set.
  */
object Coreset {

  // native codegen'd Σ(a−b)² — bit-identical to the aggregate(zip_with)
  // spelling (same left-to-right accumulation); the per-round max-min
  // column stays inside whole-stage codegen
  private def d2To(center: Seq[Double]): Column =
    round(graft.plans.VectorExpressions.vecD2(col("e"), typedLit(center)), 4)

  /** vecs(vec_id, e: array<double>) → (rank, vec_id, dist): the k
    * selected centers with their max-min distance at selection. */
  def kCenters(vecs: DataFrame, k: Int): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    graft.plans.VectorExpressions.register(s)
    val first = vecs.orderBy(col("vec_id").asc).limit(1).collect()(0)
    var picks = Vector((1L, first.getLong(0), 0.0))
    var center = first.getSeq[Double](1)
    var (cur, curBlocks) = Staged.checkpointOwned(vecs.withColumn("md", d2To(center)))
    var t = 2
    while (t <= k) {
      val top = cur.orderBy(col("md").desc, col("vec_id").asc).limit(1).collect()(0)
      picks :+= ((t.toLong, top.getLong(0), top.getDouble(2)))
      center = top.getSeq[Double](1)
      if (t < k) {
        val (next, nextBlocks) =
          Staged.checkpointOwned(cur.withColumn("md", least(col("md"), d2To(center))))
        Staged.release(curBlocks)
        cur = next
        curBlocks = nextBlocks
      }
      t += 1
    }
    Staged.release(curBlocks)
    picks.toDF("rank", "vec_id", "dist")
  }

  /** ◆ q_kcenter — 8 diversity centers over the embeddings table. */
  def kCenterQuery(s: SparkSession, dir: String): DataFrame =
    kCenters(
      Tables
        .embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e")),
      k = 8
    )
}
