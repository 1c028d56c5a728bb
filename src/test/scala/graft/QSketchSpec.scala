package graft

import org.apache.spark.sql.functions._
import graft.operators.QSketch

class QSketchSpec extends SparkSuite {
  import spark.implicits._

  private def ints(vs: Seq[Long]) = vs.toDF("v").withColumn("g", lit("a"))

  test("merge of two shard sketches equals the re-sketch of the union, bit for bit") {
    val a = Seq.tabulate(500)(i => (i * 37L) % 10000)
    val b = Seq.tabulate(400)(i => (i * 91L) % 20000 + 3)
    val merged = QSketch
      .merge(
        QSketch.sketch(ints(a), Seq("g"), "v").unionByName(QSketch.sketch(ints(b), Seq("g"), "v")),
        Seq("g")
      )
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val direct = QSketch
      .sketch(ints(a ++ b), Seq("g"), "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(merged === direct)
  }

  test("reported quantile is a bucket lower bound within the gamma relative-error bound") {
    // gamma = 1 + 2^-4: a value v lands in a bucket whose low satisfies
    // low <= v < low * (1 + 2^-4) for v >= 32 (above 32 buckets are
    // exact singletons), so the discrete pick is within ~6.25% below
    // the true quantile element and never above it
    val vs = Seq.tabulate(2000)(i => ((i * 7919L) % 65536) + 1)
    val out = QSketch
      .quantiles(QSketch.sketch(ints(vs), Seq("g"), "v"), Seq("g"), Seq(0.5, 0.9))
      .collect()
      .head
    val sorted = vs.sorted
    def exact(q: Double) = sorted((math.ceil(q * vs.size).toLong - 1).toInt)
    Seq(0.5 -> out.getLong(2), 0.9 -> out.getLong(3)).foreach { case (q, got) =>
      val ex = exact(q)
      assert(got <= ex, s"p$q bucket low $got must not exceed the true element $ex")
      assert(got >= ex / (1.0 + math.pow(2, -4)) - 1, s"p$q $got outside gamma bound of $ex")
    }
    assert(out.getLong(1) === vs.size.toLong)
  }

  test("values below 32 occupy exact singleton buckets (small-domain quantiles exact)") {
    val vs = Seq[Long](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    val out = QSketch
      .quantiles(QSketch.sketch(ints(vs), Seq("g"), "v"), Seq("g"), Seq(0.5, 0.9, 0.99))
      .collect()
      .head
    assert(out.getLong(2) === 5L) // ceil(0.5*10)=5 -> element 5
    assert(out.getLong(3) === 9L)
    assert(out.getLong(4) === 10L)
  }

  test("zero values land in the reserved bucket and report 0") {
    val out = QSketch
      .quantiles(QSketch.sketch(ints(Seq(0L, 0L, 0L, 7L)), Seq("g"), "v"), Seq("g"), Seq(0.5))
      .collect()
      .head
    assert(out.getLong(2) === 0L)
  }

  test("q_qsketch query runs and the __all__ row merges every type") {
    val rows = QSketch.qsketchQuery(spark, sf0001).collect()
    val byType = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.contains("__all__"))
    assert(byType("__all__") === byType.filterNot(_._1 == "__all__").values.sum)
  }
}
