package graft

import graft.ann.Logistic

class LogisticSpec extends SparkSuite {
  import spark.implicits._

  test("separable planted data: learns the boundary, ignores the nuisance feature") {
    // y = (x1 > 0.5); x2 pure noise pattern uncorrelated with y
    val data = (0 until 400).map { i =>
      val x1 = (i % 100) / 100.0
      (if (x1 > 0.5) 1.0 else 0.0, x1, (i % 7) / 7.0)
    }.toDF("y", "x1", "x2")
    val r = Logistic.train(data, lr = 10.0, iters = 12).head()
    val (w1, w2, acc) = (r.getDouble(1), r.getDouble(2), r.getDouble(4))
    assert(w1 > 1.0, s"informative weight grows: $w1")
    assert(math.abs(w2) < w1 / 3, s"nuisance stays small: $w2 vs $w1")
    assert(acc >= 0.9, s"accuracy: $acc")
  }

  test("q_logreg on events learns value>50 with high accuracy") {
    val r = Logistic.logregQuery(spark, sf001).head()
    assert(r.getDouble(1) > 0, "w1 positive (value drives the label up)")
    assert(r.getDouble(4) >= 0.85, s"accuracy ${r.getDouble(4)}")
    assert(r.getLong(3) <= Tables.eventsRaw(spark, sf001).count())
  }

  test("deterministic under repartitioning") {
    val data = (0 until 300).map { i =>
      ((i % 3) match { case 0 => 0.0; case _ => 1.0 }, (i % 50) / 50.0, (i % 11) / 11.0)
    }.toDF("y", "x1", "x2")
    val a = Logistic.train(data, 5.0, 6).head().toSeq
    val b = Logistic.train(data.repartition(13), 5.0, 6).head().toSeq
    assert(a === b)
  }
}
