package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounded-domain twins must replay the EXACT synchronous trajectory
  * of the distributed operators: row-for-row equality on the same
  * derivations the q lanes use (sf0.001 events), plus the loud
  * domain-overflow refusal. This is the gate that lets q_kcore /
  * q_pagerank / q_label_prop ride the single-task plan without any
  * oracle drift. */
class GraphBoundedSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private def spark = TestSpark.spark

  private def kcoreEdges = {
    val ev = graft.Tables.eventsRaw(spark, dir)
    def h60(prefix: String) =
      conv(substring(md5(concat(lit(prefix), col("event_id").cast("string"))), 1, 15), 16, 10)
        .cast("long")
    ev.select((h60("ks:") % 500).as("src"), col("event_id"))
      .select(col("src"), (h60("kd:") % (col("src") + 1)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  private def linkEdges = {
    val ev = graft.Tables.eventsRaw(spark, dir)
    ev.select((col("event_id") % 500).as("src"), (col("event_id") * 7919 % 500).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  test("kCoreBounded == kCore, row for row (k where the core is non-empty, and the q lane's k)") {
    for (k <- Seq(2, 20)) {
      val a = Graph.kCore(kcoreEdges, k = k, rounds = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toVector
      val b = Graph.kCoreBounded(kcoreEdges, k = k, rounds = 8, maxNodes = 512)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toVector
      if (k == 2) assert(a.nonEmpty, "empty 2-core — derivation drifted")
      assert(a == b, s"k=$k")
    }
    graft.operators.Staged.releaseAll()
  }

  test("pageRankBounded == pageRank, every scaled rank to the unit") {
    val nodes = spark.range(500).select(col("id"))
    val a = Graph.pageRank(nodes, linkEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toVector
    val b = Graph.pageRankBounded(500, linkEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toVector
    assert(a.length == 500 && a == b)
    graft.operators.Staged.releaseAll()
  }

  test("labelPropagationBounded == labelPropagation, identical labels") {
    val nodes = spark.range(500).select(col("id"))
    val a = Graph.labelPropagation(nodes, linkEdges, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toVector
    val b = Graph.labelPropagationBounded(500, linkEdges, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toVector
    assert(a.length == 500 && a == b)
    graft.operators.Staged.releaseAll()
  }

  test("domain overflow fails loudly") {
    val wide = spark.range(2000).select(col("id").as("src"), ((col("id") + 1) % 2000).as("dst"))
    val e = intercept[org.apache.spark.SparkException] {
      Graph.kCoreBounded(wide, k = 1, rounds = 1, maxNodes = 512).collect()
    }
    assert(e.getMessage.contains("domain overflow") ||
      Option(e.getCause).exists(_.getMessage.contains("domain overflow")))
    intercept[IllegalArgumentException] { Graph.pageRankBounded(1 << 21, wide) }
  }
}
