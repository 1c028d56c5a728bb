package graft.geo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raster co-registration estimator — the Spark re-expression of
  * `src/library/align.cpp:415-499` (`umeyama`, `ransac`) /
  * `align.h:48-61` (`AlignResult`). The reference extracts tie points
  * by NCC patch matching (GDAL/FFT territory, out of scope with the
  * other signal codecs — COVERAGE.md); the ESTIMATOR — least-squares
  * 2D similarity + RANSAC consensus — is pure math over a tie-point
  * table and runs fully distributed here:
  *
  *  - `umeyama`: the direct 2D Procrustes closed form
  *    (`align.cpp:425-460`) from ONE partial-agg pass of raw sums.
  *    Deliberately no atan2/cos/sin: the reference solves
  *    θ = atan2(b, a) then takes cos/sin; algebraically
  *    cosθ = a/√(a²+b²), sinθ = b/√(a²+b²), and sqrt is
  *    correctly-rounded IEEE — so the whole estimate is bit-for-bit
  *    reproducible across engines where libm trig is not. Raw
  *    (uncentered) sums instead of the reference's two-pass centered
  *    sums for the same reason: sums of exact inputs are
  *    order-independent, sums of centered (already-rounded) terms are
  *    not.
  *  - `ransacAlign`: the reference seeds mt19937(42) and draws random
  *    pairs (`align.cpp:472-487`); a PRNG stream is not reproducible
  *    relationally, so candidates are the `nCand` tie points with the
  *    smallest md5(id) — a deterministic pseudo-random subset — and
  *    ALL pairs of them become models (nCand=12 → 66 models ≈ the
  *    same consensus coverage as 1000 random 2-draws over the
  *    inlier-rich regime). Inlier counting is one broadcast
  *    nested-loop pass over the tie table (models are tiny, the table
  *    is the big side) + a partial-agg count — O(models·N) with no
  *    shuffle of the tie table itself, the shape that holds at any N.
  *  - best model by (inlier count desc, pair id asc) — deterministic
  *    tie-break — then one refit pass over its inliers
  *    (`align.cpp:489-498`).
  */
object Align {

  /** Closed-form similarity from raw sums — returns
    * (scale, cosT, sinT, tx, ty) column expressions. Guards mirror
    * the reference: σ²_P ≤ 1e-20 → scale 1 (`align.cpp:451`);
    * degenerate (a=b=0) → identity rotation. */
  def simCols(
      n: Column,
      spx: Column,
      spy: Column,
      sqx: Column,
      sqy: Column,
      spp: Column,
      sqxpx: Column,
      sqxpy: Column,
      sqypx: Column,
      sqypy: Column
  ): (Column, Column, Column, Column, Column) = {
    val sigma2p = spp - (spx * spx + spy * spy) / n
    val a = sqxpx + sqypy - (sqx * spx + sqy * spy) / n
    val b = sqypx - sqxpy - (sqy * spx - sqx * spy) / n
    val den = sqrt(a * a + b * b)
    val scale = when(sigma2p > 1e-20, den / sigma2p).otherwise(lit(1.0))
    val cost = when(den > 0, a / den).otherwise(lit(1.0))
    val sint = when(den > 0, b / den).otherwise(lit(0.0))
    val tx = sqx / n - scale * (cost * (spx / n) - sint * (spy / n))
    val ty = sqy / n - scale * (sint * (spx / n) + cost * (spy / n))
    (scale, cost, sint, tx, ty)
  }

  /** Squared residual of tie point (px,py)→(qx,qy) under a model —
    * ref `align.cpp:41-45` (compared against threshold² so no sqrt
    * enters the inlier decision). */
  private def r2(
      px: Column, py: Column, qx: Column, qy: Column,
      scale: Column, cost: Column, sint: Column, tx: Column, ty: Column
  ): Column = {
    val dx = scale * (cost * px - sint * py) + tx - qx
    val dy = scale * (sint * px + cost * py) + ty - qy
    dx * dx + dy * dy
  }

  /** Plain least-squares similarity over ALL tie points (no
    * consensus) — one agg pass. Input: (px, py, qx, qy). */
  def umeyama(tiePoints: DataFrame): DataFrame = {
    val s = tiePoints.agg(
      count(lit(1)).cast("double").as("n"),
      sum("px").as("spx"),
      sum("py").as("spy"),
      sum("qx").as("sqx"),
      sum("qy").as("sqy"),
      sum(col("px") * col("px") + col("py") * col("py")).as("spp"),
      sum(col("qx") * col("px")).as("sqxpx"),
      sum(col("qx") * col("py")).as("sqxpy"),
      sum(col("qy") * col("px")).as("sqypx"),
      sum(col("qy") * col("py")).as("sqypy")
    )
    val (scale, cost, sint, tx, ty) = simCols(
      col("n"), col("spx"), col("spy"), col("sqx"), col("sqy"),
      col("spp"), col("sqxpx"), col("sqxpy"), col("sqypx"), col("sqypy")
    )
    s.select(
      scale.as("scale"),
      cost.as("cos_theta"),
      sint.as("sin_theta"),
      tx.as("tx"),
      ty.as("ty"),
      col("n").cast("long").as("n_points")
    )
  }

  /** Deterministic RANSAC + refit — ref `align.cpp:464-499`.
    * Input: (tp_id, px, py, qx, qy). Output: one row
    * (inlier_count, n_points, inlier_ratio, scale, cos_theta,
    * sin_theta, tx, ty), params rounded to 6 decimals. */
  def ransacAlign(tiePoints: DataFrame, threshold: Double = 2.0, nCand: Int = 12): DataFrame = {
    val pts = tiePoints.select("tp_id", "px", "py", "qx", "qy")
    val thr2 = lit(threshold * threshold)

    // deterministic pseudo-random candidate subset
    val cand = pts.orderBy(md5(col("tp_id").cast("string"))).limit(nCand)
    val a = cand.select(
      col("tp_id").as("ida"), col("px").as("pxa"), col("py").as("pya"),
      col("qx").as("qxa"), col("qy").as("qya")
    )
    val b = cand.select(
      col("tp_id").as("idb"), col("px").as("pxb"), col("py").as("pyb"),
      col("qx").as("qxb"), col("qy").as("qyb")
    )
    val (mScale, mCost, mSint, mTx, mTy) = simCols(
      lit(2.0),
      col("pxa") + col("pxb"),
      col("pya") + col("pyb"),
      col("qxa") + col("qxb"),
      col("qya") + col("qyb"),
      (col("pxa") * col("pxa") + col("pya") * col("pya")) +
        (col("pxb") * col("pxb") + col("pyb") * col("pyb")),
      col("qxa") * col("pxa") + col("qxb") * col("pxb"),
      col("qxa") * col("pya") + col("qxb") * col("pyb"),
      col("qya") * col("pxa") + col("qyb") * col("pxb"),
      col("qya") * col("pya") + col("qyb") * col("pyb")
    )
    // The model table is BOUNDED (nCand·(nCand−1)/2 = 66 rows), so the
    // trainIvf tiny-collect/rebroadcast pattern applies: materialize the
    // models on the driver and evaluate ALL of them as conditional
    // aggregates in ONE scan of the tie table — no 66× crossJoin row
    // blowup, no wide-key hash agg, and the collected doubles re-enter
    // the plan as exact literals so results are bit-identical to the
    // joined form. O(models·N) arithmetic still, but inside whole-stage
    // codegen over N rows instead of over models·N materialized rows.
    val models = a
      .join(broadcast(b), col("ida") < col("idb"))
      .select(
        col("ida"), col("idb"),
        mScale.as("scale"), mCost.as("cost"), mSint.as("sint"), mTx.as("tx"), mTy.as("ty")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    // degenerate input (empty tie table, or <2 candidates → no pair
    // model): nothing to fit — empty frame, same schema, instead of
    // head()/getLong blowing up downstream
    if (models.isEmpty)
      return tiePoints.sparkSession
        .range(0)
        .select(
          lit(0L).as("inlier_count"),
          lit(0L).as("n_points"),
          lit(0.0).as("inlier_ratio"),
          lit(0.0).as("scale"),
          lit(0.0).as("cos_theta"),
          lit(0.0).as("sin_theta"),
          lit(0.0).as("tx"),
          lit(0.0).as("ty")
        )

    // consensus: one partial-agg pass, one inlier-count column per model
    val countCols = models.zipWithIndex.map { case ((_, _, sc, ct, st, tx, ty), i) =>
      sum(
        when(r2(col("px"), col("py"), col("qx"), col("qy"), lit(sc), lit(ct), lit(st), lit(tx), lit(ty)) < thr2, 1L)
          .otherwise(0L)
      ).as(s"c_$i")
    }
    val countRow = pts.agg(countCols.head, (countCols.tail :+ count(lit(1)).as("n_total")): _*).head()
    val nTotal = countRow.getLong(models.length)
    // best model by (inlier count desc, pair id asc) — same tie-break
    val bestIdx = models.indices.minBy { i =>
      val (ida, idb, _, _, _, _, _) = models(i)
      (-countRow.getLong(i), ida, idb)
    }
    val (_, _, bSc, bCt, bSt, bTx, bTy) = models(bestIdx)

    // refit on the best model's inliers (align.cpp:489-498)
    val inl = pts.filter(
      r2(col("px"), col("py"), col("qx"), col("qy"), lit(bSc), lit(bCt), lit(bSt), lit(bTx), lit(bTy)) < thr2
    )
    val sums = inl.agg(
      count(lit(1)).cast("double").as("n"),
      sum("px").as("spx"),
      sum("py").as("spy"),
      sum("qx").as("sqx"),
      sum("qy").as("sqy"),
      sum(col("px") * col("px") + col("py") * col("py")).as("spp"),
      sum(col("qx") * col("px")).as("sqxpx"),
      sum(col("qx") * col("py")).as("sqxpy"),
      sum(col("qy") * col("px")).as("sqypx"),
      sum(col("qy") * col("py")).as("sqypy")
    )
    val (fScale, fCost, fSint, fTx, fTy) = simCols(
      col("n"), col("spx"), col("spy"), col("sqx"), col("sqy"),
      col("spp"), col("sqxpx"), col("sqxpy"), col("sqypx"), col("sqypy")
    )
    sums.select(
      col("n").cast("long").as("inlier_count"),
      lit(nTotal).as("n_points"),
      round(col("n") / lit(nTotal.toDouble), 6).as("inlier_ratio"),
      round(fScale, 6).as("scale"),
      round(fCost, 6).as("cos_theta"),
      round(fSint, 6).as("sin_theta"),
      round(fTx, 6).as("tx"),
      round(fTy, 6).as("ty")
    )
  }

  /** ◆ Align under the oracle: tie points synthesized from the events
    * table — source grid (id%100, id/100%100), reference = exact
    * 3-4-5 similarity (scale 1.25, cosθ=0.6, sinθ=0.8, t=(10,−5);
    * every constant dyadic so all aggregation sums are EXACT in both
    * engines) + deterministic dyadic jitter (±6/64) + a 10% outlier
    * cohort displaced by ~40 units. RANSAC must reject the outliers
    * and the refit must recover the 3-4-5 rotation. */
  def alignQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = graft.Tables
      .eventsRaw(s, dir)
      .select(
        $"event_id".as("tp_id"),
        ($"event_id" % 100).cast("double").as("px"),
        (expr("event_id div 100") % 100).cast("double").as("py")
      )
      .select(
        $"tp_id",
        $"px",
        $"py",
        (lit(1.25) * (lit(0.6) * $"px" - lit(0.8) * $"py") + lit(10.0)
          + (($"tp_id" * 7919) % 13 - 6).cast("double") / 64
          + when($"tp_id" % 10 === 3, lit(40.0) + ($"tp_id" % 5).cast("double")).otherwise(lit(0.0))).as("qx"),
        (lit(1.25) * (lit(0.8) * $"px" + lit(0.6) * $"py") - lit(5.0)
          + (($"tp_id" * 104729) % 13 - 6).cast("double") / 64
          + when($"tp_id" % 10 === 3, lit(-25.0)).otherwise(lit(0.0))).as("qy")
      )
    ransacAlign(pts, threshold = 2.0, nCand = 12)
  }
}
