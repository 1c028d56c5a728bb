package graft

import org.apache.spark.sql.functions._

import graft.ann.Kmeans

class KmeansSpec extends SparkSuite {

  test("two planted blobs separate exactly; inertia is tiny") {
    import spark.implicits._
    // blob A near the origin (ids 0..9), blob B near (10,10,10,10) (ids 10..19)
    val vecs = ((0 until 10).map(i => (i.toLong, Seq.fill(4)(0.01 * i))) ++
      (10 until 20).map(i => (i.toLong, Seq.fill(4)(10.0 + 0.01 * (i - 10)))))
      .toDF("vec_id", "e")
    val out = Kmeans.lloyd(vecs, k = 2, iters = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(out.map(_._2).toSeq === Seq(10L, 10L), s"blob sizes: ${out.toSeq}")
    assert(out.forall(_._3 < 1.0), s"inertia collapsed within blobs: ${out.toSeq}")
  }

  test("Lloyd inertia is non-increasing with more rounds (real embeddings)") {
    val vecs = Tables
      .embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    def total(iters: Int): Double =
      Kmeans.lloyd(vecs, k = 4, iters = iters).agg(sum(col("inertia"))).head().getDouble(0)
    val (i1, i3, i5) = (total(1), total(3), total(5))
    assert(i3 <= i1 + 1e-6, s"round 3 ($i3) vs round 1 ($i1)")
    assert(i5 <= i3 + 1e-6, s"round 5 ($i5) vs round 3 ($i3)")
  }

  test("a duplicate seed empties its cluster without crashing; ids stay in range") {
    import spark.implicits._
    // ids 0 and 1 are identical points: cluster 1 loses the tie for both
    // (argmin ties to the smaller cluster) and goes empty on round 1
    val vecs = (Seq((0L, Seq(5.0, 5.0)), (1L, Seq(5.0, 5.0)), (2L, Seq(9.0, 9.0))) ++
      (3 until 8).map(i => (i.toLong, Seq(0.1 * i, 0.1 * i))))
      .toDF("vec_id", "e")
    val out = Kmeans.lloyd(vecs, k = 3, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out.map(_._1).forall(c => c >= 0 && c < 3))
    assert(out.map(_._2).sum === 8L, "every point assigned exactly once")
  }

  test("deterministic under repartitioning") {
    val vecs = Tables
      .embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val a = Kmeans.lloyd(vecs, k = 8, iters = 3).collect().map(_.toSeq).toSet
    val b = Kmeans.lloyd(vecs.repartition(7), k = 8, iters = 3).collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
