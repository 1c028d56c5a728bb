package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Logistic regression by full-batch gradient descent — the simplest
  * distributed trainer (the shape MLlib's LBFGS/GD optimizers share):
  * per round ONE map-only pass computes per-row σ(w·x) against the
  * current weights riding the plan as literals, and a partial-agg sum
  * reduces the gradient to d+1 numbers; only those reach the driver
  * (the k-means/centroid bounded-collect pattern). Nothing else
  * shuffles; at 10⁹ rows each round is a single scan.
  *
  * ENGINE LOCKSTEP: the ONLY rounding is the gradient sums (6dp) —
  * they absorb summation-order and exp-last-ulp noise. Everything
  * else (weight update w −= lr·g/n, the per-row linear term, the
  * final prediction) is the same IEEE double arithmetic on both
  * engines, so the weights stay bit-identical with no further
  * rounding; predictions compare the raw linear term against zero
  * (z > 0 ⟺ p > ½) so no transcendental ever gates a boolean.
  */
object Logistic {

  /** data(y, x1, x2) with y ∈ {0.0, 1.0} → one row
    * (w0, w1, w2, n_correct, accuracy) after `iters` GD rounds. */
  def train(data: DataFrame, lr: Double, iters: Int): DataFrame = {
    val n = data.count()
    var (wa, wb, wc) = (0.0, 0.0, 0.0)
    for (_ <- 1 to iters) {
      val p = lit(1.0) / (lit(1.0) +
        exp(-(lit(wa) + lit(wb) * col("x1") + lit(wc) * col("x2"))))
      val g = data
        .agg(
          round(sum(p - col("y")), 6).as("ga"),
          round(sum((p - col("y")) * col("x1")), 6).as("gb"),
          round(sum((p - col("y")) * col("x2")), 6).as("gc")
        )
        .head()
      wa = wa - lr * g.getDouble(0) / n
      wb = wb - lr * g.getDouble(1) / n
      wc = wc - lr * g.getDouble(2) / n
    }
    val z = lit(wa) + lit(wb) * col("x1") + lit(wc) * col("x2")
    data
      .agg(sum(when((z > 0.0) === (col("y") === 1.0), 1L).otherwise(0L)).as("n_correct"))
      .select(
        // 10dp emit-lock: the weights are bit-identical across engines,
        // but a driver-side ulp in the 6dp gradient rounding would show
        // at full precision; 10dp keeps every meaningful digit while
        // absorbing last-ulp repr noise
        round(lit(wa), 10).as("w0"),
        round(lit(wb), 10).as("w1"),
        round(lit(wc), 10).as("w2"),
        col("n_correct"),
        (col("n_correct") / lit(n)).as("accuracy")
      )
  }

  /** ◆ q_logreg — learn the value>50 decision from events: x1 is the
    * informative feature (value/100), x2 a deterministic nuisance
    * feature the fit should ignore. 8 rounds, lr 10. */
  def logregQuery(s: SparkSession, dir: String): DataFrame =
    train(
      Tables
        .eventsRaw(s, dir)
        .select(
          when(col("value") > 50.0, 1.0).otherwise(0.0).as("y"),
          (col("value") / 100.0).as("x1"),
          ((col("event_id") % 1000L) / 1000.0).as("x2")
        ),
      lr = 10.0,
      iters = 8
    )
}
