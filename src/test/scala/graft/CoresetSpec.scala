package graft

import org.apache.spark.sql.functions._

import graft.ann.Coreset

class CoresetSpec extends SparkSuite {

  test("k-center picks are distinct, dists monotone non-increasing, planted far point wins round 2") {
    import spark.implicits._
    // planted geometry: a tight cluster at the origin + one far point
    val vecs = ((0 until 20).map(i => (i.toLong, Seq.fill(4)(0.001 * i))) :+
      (99L, Seq(100.0, 100.0, 100.0, 100.0)))
      .toDF("vec_id", "e")
    val picks = Coreset.kCenters(vecs, 4).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(picks.map(_._2).distinct.length === 4, "centers distinct")
    assert(picks.head === ((1L, 0L, 0.0)), "round 1 is the min vec_id")
    assert(picks(1)._2 === 99L, "round 2 must take the planted far point")
    val dists = picks.drop(1).map(_._3)
    assert(dists.zip(dists.tail).forall { case (a, b) => a >= b }, s"monotone: ${dists.toSeq}")
  }

  test("k-center on the real embeddings: monotone and spread across the set") {
    val vecs = Tables
      .embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val picks = Coreset.kCenters(vecs, 6).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val dists = picks.drop(1).map(_._3)
    assert(dists.zip(dists.tail).forall { case (a, b) => a >= b })
    assert(picks.map(_._2).distinct.length === 6)
  }
}
