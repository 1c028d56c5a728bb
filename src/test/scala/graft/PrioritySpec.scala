package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Priority

/** Priority sampling: the sketch must be a pure function of the input
  * set (merge == re-sketch, partitioning-invariant), the exhaustive
  * branch must be exact (τ = 0, ŵ = w), and Σ max(w, τ) over the
  * sample — the Duffield–Lund–Thorup estimator — must track the true
  * total weight.
  */
class PrioritySpec extends SparkSuite {
  import spark.implicits._

  private def withP(rows: Seq[(String, Long, Long)]): DataFrame =
    rows.toDF("g", "id", "w").withColumn("p", Priority.priority("t", col("id"), col("w")))

  private def mkRows(n: Int, g: String = "a"): Seq[(String, Long, Long)] =
    (0 until n).map(i => (g, i.toLong, (i % 50 + 1).toLong))

  private def key(df: DataFrame): Seq[(String, Double, Long, Long)] =
    df.select("g", "p", "id", "w").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSeq.sorted

  test("merge of per-shard sketches == re-sketch of the union; partitioning-invariant") {
    val rows = mkRows(800)
    val (a, b) = rows.splitAt(500)
    val merged = key(Priority.merge(withP(a).transform(d => Priority.sketch(d, Seq("g"), col("p"), col("id"), col("w")))
      .unionByName(Priority.sketch(withP(b), Seq("g"), col("p"), col("id"), col("w"))), Seq("g")))
    val direct = key(Priority.sketch(withP(rows), Seq("g"), col("p"), col("id"), col("w")))
    assert(merged === direct && merged.length === Priority.K + 1)
    for (p <- Seq(1, 7, 32)) {
      val shuffled = withP(rows).orderBy(rand(seed = p)).repartition(p)
      assert(key(Priority.sketch(shuffled, Seq("g"), col("p"), col("id"), col("w"))) === direct, s"parts=$p")
    }
  }

  test("exhaustive branch: group smaller than k samples everything exactly (tau = 0)") {
    val rows = mkRows(20, "s")
    val sm = Priority
      .sample(Priority.sketch(withP(rows), Seq("g"), col("p"), col("id"), col("w")), Seq("g"))
      .collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(sm.length === 20)
    sm.foreach { case (id, w, est) => assert(est === w.toDouble, s"id $id: tau=0 must give est_w == w") }
    assert(sm.map(_._2).sum === rows.map(_._3).sum, "exhaustive sample carries the exact total weight")
  }

  test("DLT estimator: sum of max(w, tau) over the sample tracks the true total weight") {
    val rows = mkRows(1000)
    val trueTotal = rows.map(_._3).sum.toDouble
    val est = Priority
      .sample(Priority.sketch(withP(rows), Seq("g"), col("p"), col("id"), col("w")), Seq("g"))
      .agg(sum(col("est_w")))
      .head()
      .getDouble(0)
    // k=32: relative standard error ~ 1/sqrt(k-1) ≈ 18%; allow ~3σ
    assert(math.abs(est - trueTotal) / trueTotal < 0.55, s"estimator $est vs true $trueTotal")
  }
}
