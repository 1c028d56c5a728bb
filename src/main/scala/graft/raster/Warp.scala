package graft.raster

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The GCP warp — the reference's `geoproject` operation
  * (`geoproject.cpp:144-200`): an image footprint's four corners
  * become GCPs at pixel (0,0), (0,H), (W,H), (W,0); GDAL fits a
  * first-order (affine) polynomial to them by least squares (4 GCPs
  * admit order 1), inverse-maps every output pixel, samples the
  * source (nearest), and writes alpha=0 outside the footprint. This
  * module is that semantic without GDAL: closed-form LSQ affine fit
  * over GCPs, analytic inverse, nearest sampling with an inside mask.
  *
  * Determinism: with integer GCPs every normal-equation sum and
  * 3×3 determinant is integer-exact in doubles; the only roundings
  * are the final Cramer divisions and the per-pixel products, which
  * the DuckDB oracle replays with the identical operation order —
  * q_geoproject is a bit-exact cross-engine check of the whole warp.
  *
  * Scale shape: one image = one task-local kernel (fit is O(GCPs),
  * sampling O(out pixels)); an estate of captures warps one image per
  * task, the same per-artifact fan-out as the tiler and codecs.
  */
object Warp {

  /** X = a + b·px + c·py ; Y = d + e·px + f·py */
  final case class Affine(a: Double, b: Double, c: Double, d: Double, e: Double, f: Double) {
    def apply(px: Double, py: Double): (Double, Double) = (a + b * px + c * py, d + e * px + f * py)
    def det: Double = b * f - c * e
  }

  /** Least-squares first-order fit over GCPs (px, py, X, Y), the
    * polynomial GDAL picks for 4 GCPs. Accumulation runs in input
    * order; Cramer determinants expand along the first row — the
    * oracle mirrors both. */
  def fitGcps(gcps: Seq[(Double, Double, Double, Double)]): Affine = {
    require(gcps.length >= 3, s"affine fit needs >= 3 GCPs, got ${gcps.length}")
    var n = 0.0; var sx = 0.0; var sy = 0.0; var sxx = 0.0; var syy = 0.0; var sxy = 0.0
    var sX = 0.0; var sXx = 0.0; var sXy = 0.0
    var sY = 0.0; var sYx = 0.0; var sYy = 0.0
    gcps.foreach { case (px, py, gx, gy) =>
      n += 1.0; sx += px; sy += py
      sxx += px * px; syy += py * py; sxy += px * py
      sX += gx; sXx += gx * px; sXy += gx * py
      sY += gy; sYx += gy * px; sYy += gy * py
    }
    val det3 = n * (sxx * syy - sxy * sxy) - sx * (sx * syy - sxy * sy) + sy * (sx * sxy - sxx * sy)
    require(math.abs(det3) > 1e-9, "degenerate GCP configuration")
    def solve(r0: Double, r1: Double, r2: Double): (Double, Double, Double) = {
      val d0 = r0 * (sxx * syy - sxy * sxy) - sx * (r1 * syy - sxy * r2) + sy * (r1 * sxy - sxx * r2)
      val d1 = n * (r1 * syy - sxy * r2) - r0 * (sx * syy - sxy * sy) + sy * (sx * r2 - r1 * sy)
      val d2 = n * (sxx * r2 - r1 * sxy) - sx * (sx * r2 - r1 * sy) + r0 * (sx * sxy - sxx * sy)
      (d0 / det3, d1 / det3, d2 / det3)
    }
    val (a, b, c) = solve(sX, sXx, sXy)
    val (d, e, f) = solve(sY, sYx, sYy)
    Affine(a, b, c, d, e, f)
  }

  /** One warped output sample: source indices from the analytic
    * inverse of the fitted affine, nearest sampling, inside mask. */
  final case class Sample(row: Int, col: Int, srcRow: Int, srcCol: Int, inside: Boolean)

  /** Inverse-map the `outW`×`outH` north-up grid spanning
    * [minx,maxx]×[miny,maxy] through `aff` (which maps source PIXEL →
    * geo). Identical operation order to the oracle SQL. */
  def geoprojectSamples(
      aff: Affine,
      srcW: Int,
      srcH: Int,
      outW: Int,
      outH: Int,
      minx: Double,
      miny: Double,
      maxx: Double,
      maxy: Double
  ): IndexedSeq[Sample] = {
    val stepX = (maxx - minx) / outW
    val stepY = (maxy - miny) / outH
    val det = aff.b * aff.f - aff.c * aff.e
    require(math.abs(det) > 1e-12, "non-invertible affine")
    for {
      r <- 0 until outH
      c <- 0 until outW
    } yield {
      val gx = minx + (c + 0.5) * stepX
      val gy = maxy - (r + 0.5) * stepY
      val ipx = (aff.f * (gx - aff.a) - aff.c * (gy - aff.d)) / det
      val ipy = (aff.b * (gy - aff.d) - aff.e * (gx - aff.a)) / det
      val fx = math.floor(ipx).toInt
      val fy = math.floor(ipy).toInt
      val inside = fx >= 0 && fx < srcW && fy >= 0 && fy < srcH
      Sample(r, c, fy, fx, inside)
    }
  }

  /** q_geoproject: per event_type, a 32×32 integer source grid built
    * from the group's OWN events (the q_tiepoints density raster with
    * an integer texture floor), a footprint whose four geo corners are
    * an md5-derived affine-plus-perturbation of the image rectangle
    * (so the 4-GCP least-squares fit has real residuals), and the full
    * warp: fit → bbox grid 40×40 → inverse map → nearest sample →
    * alpha mask. Emits integer aggregates of the warped raster; the
    * oracle replays the identical arithmetic relationally. */
  def geoprojectQuery(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val W = 32
    val OW = 40
    val cycle = udf { (eventType: String, ids: Seq[Long]) =>
      val grid = new Array[Long](W * W)
      ids.foreach { id =>
        val cell = math.abs(((id * 2654435761L) % (W * W)).toInt)
        grid(cell) += (id % 97) + 1L
      }
      var i = 0
      while (i < W * W) { grid(i) += (i * 1103515245L + 12345L) % 251L; i += 1 }
      val h = java.security.MessageDigest.getInstance("MD5").digest(s"gp:$eventType".getBytes("UTF-8"))
      def hb(k: Int): Int = h(k) & 0xff
      val x0 = (hb(0) % 200 - 100).toDouble
      val y0 = (hb(1) % 200 - 100).toDouble
      val e1 = (hb(2) % 5 - 2).toDouble
      val e2 = (hb(3) % 5 - 2).toDouble
      val dpx = (hb(4) % 5 - 2).toDouble
      val dpy = (hb(5) % 5 - 2).toDouble
      // geo corners of the footprint: ul, ll, lr (perturbed), ur —
      // X(px,py) = x0 + 2·px + e1·py ; Y(px,py) = y0 + e2·px + 3·py
      val gcps = Seq(
        (0.0, 0.0, x0, y0),
        (0.0, W.toDouble, x0 + e1 * W, y0 + 3.0 * W),
        (W.toDouble, W.toDouble, x0 + 2.0 * W + e1 * W + dpx, y0 + e2 * W + 3.0 * W + dpy),
        (W.toDouble, 0.0, x0 + 2.0 * W, y0 + e2 * W)
      )
      val aff = fitGcps(gcps)
      val xs = gcps.map(_._3); val ys = gcps.map(_._4)
      val samples = geoprojectSamples(aff, W, W, OW, OW, xs.min, ys.min, xs.max, ys.max)
      var nInside = 0L; var valSum = 0L; var posSum = 0L
      samples.foreach { sm =>
        if (sm.inside) {
          nInside += 1
          valSum += grid(sm.srcRow * W + sm.srcCol)
          posSum += (sm.srcRow * W + sm.srcCol).toLong
        }
      }
      Seq(nInside, valSum, posSum, samples.length - nInside)
    }
    graft.Tables
      .eventsRaw(s, dir)
      .groupBy($"event_type")
      .agg(collect_list($"event_id").as("ids"))
      .select($"event_type", cycle($"event_type", $"ids").as("a"))
      .select(
        $"event_type",
        $"a".getItem(0).as("n_inside"),
        $"a".getItem(1).as("val_sum"),
        $"a".getItem(2).as("pos_sum"),
        $"a".getItem(3).as("n_outside")
      )
      .orderBy($"event_type")
  }
}
