package graft

import org.apache.spark.sql.functions._

import graft.operators.Theta

/** Theta/KMV sketch: union-merge must equal re-sketching the combined
  * stream exactly, the sub-k branch must be exact, the estimation
  * branch must land within the KMV error envelope, and intersection
  * estimates must behave like set intersection (A∩A == A, disjoint ≈
  * 0, containment recovers the subset).
  */
class ThetaSpec extends SparkSuite {
  import spark.implicits._

  private def sketchOf(vals: Seq[Long], grp: String = "a") =
    Theta.sketch(
      vals.map(v => (grp, v)).toDF("g", "v").select($"g", Theta.valueHash("t", $"v").as("h")),
      Seq("g"),
      col("h")
    )

  private def hashes(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("h").collect().map(_.getLong(0)).toSet

  test("union-merge of per-shard sketches == re-sketch of the union, exactly") {
    val a = (0L until 500L).toSeq
    val b = (300L until 900L).toSeq
    val merged = hashes(Theta.merge(sketchOf(a).unionByName(sketchOf(b)), Seq("g")))
    val direct = hashes(sketchOf(a ++ b))
    assert(merged === direct && merged.size === Theta.K)
  }

  test("sub-k branch is exact; estimation branch lands within the KMV error envelope") {
    val exact = Theta
      .estimate(sketchOf((0L until 40L).toSeq), Seq("g"))
      .head()
    assert(exact.getLong(1) === 40L && exact.getDouble(2) === 40.0)
    // 5000 distinct values, k=64: RSE = 1/sqrt(k-2) ≈ 12.7%; allow 4σ
    val est = Theta.estimate(sketchOf((0L until 5000L).toSeq), Seq("g")).head().getDouble(2)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.51, s"estimate $est too far from 5000")
  }

  test("intersection: A∩A == A's estimate; disjoint ≈ 0; subset is recovered") {
    val a = (0L until 3000L).toSeq
    val sameSk = sketchOf(a, "x").unionByName(sketchOf(a, "y"))
    val same = Theta.intersect(sameSk, "g", "x", "y").head()
    val aEst = Theta.estimate(sketchOf(a, "x"), Seq("g")).head().getDouble(2)
    assert(same.getLong(2) === Theta.K - 1, "identical sketches share all hashes below theta")
    assert(math.abs(same.getDouble(3) - aEst) / aEst < 0.02, "A∩A must estimate A")
    val disjointSk = sketchOf((0L until 3000L).toSeq, "x").unionByName(sketchOf((10000L until 13000L).toSeq, "y"))
    val disjoint = Theta.intersect(disjointSk, "g", "x", "y").collect()
    assert(disjoint.isEmpty || disjoint.head.getLong(2) === 0L, "disjoint sets share no hashes")
    // y ⊂ x at 1/3 the size: intersection estimate ≈ |y|
    val subSk = sketchOf((0L until 3000L).toSeq, "x").unionByName(sketchOf((0L until 1000L).toSeq, "y"))
    val sub = Theta.intersect(subSk, "g", "x", "y").head().getDouble(3)
    assert(math.abs(sub - 1000.0) / 1000.0 < 0.6, s"subset estimate $sub too far from 1000")
  }

  test("sketch is partitioning-insensitive and duplicate-tolerant") {
    val vals = (0L until 2000L) ++ (0L until 2000L) // every value twice
    val base = hashes(sketchOf(vals.toSeq))
    val df = vals.map(v => ("a", v)).toDF("g", "v").select($"g", Theta.valueHash("t", $"v").as("h"))
    for (p <- Seq(1, 7, 32)) {
      val sk = Theta.sketch(df.orderBy(rand(seed = p)).repartition(p), Seq("g"), col("h"))
      assert(hashes(sk) === base, s"parts=$p")
    }
    assert(hashes(sketchOf((0L until 2000L).toSeq)) === base, "duplicates must not change the sketch")
  }
}
