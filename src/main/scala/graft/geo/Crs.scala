package graft.geo

/** Parameterized map projections beyond UTM — the public USGS/EPSG
  * closed forms (Snyder 1987; EPSG Guidance Note 7-2 methods 9807
  * Transverse Mercator and 9802 Lambert Conformal Conic 2SP). The
  * reference reprojects raster footprints from arbitrary projected CRSs
  * through PROJ (`entry.cpp:368-389`); fixture scope here is the CRS
  * set its tests pin (`tests/entry_test.cpp:41-391`): UTM zones,
  * EPSG:2193 (NZTM2000) and EPSG:31370 (Belgian Lambert 72).
  *
  * Scalar kernels run driver/executor-side during metadata extraction
  * (one call per FILE, not per row); dataset-scale reprojection uses
  * the column form in `GeoQueries.crsTransformQuery`.
  */
object Crs {

  final case class Ellipsoid(a: Double, f: Double) {
    val e2: Double = f * (2 - f)
    val e: Double = math.sqrt(e2)
    val ep2: Double = e2 / (1 - e2)
  }

  val WGS84: Ellipsoid = Ellipsoid(6378137.0, 1 / 298.257223563)
  val GRS80: Ellipsoid = Ellipsoid(6378137.0, 1 / 298.257222101)
  val International1924: Ellipsoid = Ellipsoid(6378388.0, 1 / 297.0)

  sealed trait Projection {
    /** (lat°, lon°) → (easting m, northing m) */
    def forward(lat: Double, lon: Double): (Double, Double)
    /** (easting m, northing m) → (lat°, lon°) */
    def inverse(easting: Double, northing: Double): (Double, Double)
  }

  /** EPSG method 9807 — the UTM series generalized to arbitrary
    * (lat0, lon0, k0, FE, FN) and ellipsoid. Same 6th-order series as
    * `Geo.toUTM`/`fromUTM` (which remain the WGS84/zone specialization;
    * CrsSpec pins their agreement). */
  final case class TransverseMercator(
      ell: Ellipsoid,
      lat0: Double,
      lon0: Double,
      k0: Double,
      fe: Double,
      fn: Double
  ) extends Projection {
    import ell.{a, e2, ep2}

    /** Meridian arc length from equator to latitude (radians). */
    private def arc(latR: Double): Double = a * (
      (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * latR
        - (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * latR)
        + (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * latR)
        - (35 * e2 * e2 * e2 / 3072) * math.sin(6 * latR)
    )

    private val m0 = arc(math.toRadians(lat0))

    def forward(lat: Double, lon: Double): (Double, Double) = {
      val latR = math.toRadians(lat)
      val dLon = math.toRadians(lon - lon0)
      val n = a / math.sqrt(1 - e2 * math.sin(latR) * math.sin(latR))
      val t = math.tan(latR) * math.tan(latR)
      val c = ep2 * math.cos(latR) * math.cos(latR)
      val aa = math.cos(latR) * dLon
      val easting = fe + k0 * n * (aa + (1 - t + c) * aa * aa * aa / 6
        + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(aa, 5) / 120)
      val northing = fn + k0 * (arc(latR) - m0 + n * math.tan(latR) * (aa * aa / 2
        + (5 - t + 9 * c + 4 * c * c) * math.pow(aa, 4) / 24
        + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(aa, 6) / 720))
      (easting, northing)
    }

    def inverse(easting: Double, northing: Double): (Double, Double) = {
      val x = easting - fe
      val m = m0 + (northing - fn) / k0
      val mu = m / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
      val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
      val phi1 = mu + (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
      val n1 = a / math.sqrt(1 - e2 * math.sin(phi1) * math.sin(phi1))
      val t1 = math.tan(phi1) * math.tan(phi1)
      val c1 = ep2 * math.cos(phi1) * math.cos(phi1)
      val r1 = a * (1 - e2) / math.pow(1 - e2 * math.sin(phi1) * math.sin(phi1), 1.5)
      val d = x / (n1 * k0)
      val lat = phi1 - (n1 * math.tan(phi1) / r1) * (d * d / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(d, 4) / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) * math.pow(d, 6) / 720)
      val lon = math.toRadians(lon0) + (d - (1 + 2 * t1 + c1) * d * d * d / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) * math.pow(d, 5) / 120) / math.cos(phi1)
      (math.toDegrees(lat), math.toDegrees(lon))
    }
  }

  /** EPSG method 9802 — Lambert Conformal Conic with two standard
    * parallels (Snyder eqs. 15-1..15-11, 14-15). */
  final case class LambertConformalConic2SP(
      ell: Ellipsoid,
      lat0: Double,
      lon0: Double,
      sp1: Double,
      sp2: Double,
      fe: Double,
      fn: Double
  ) extends Projection {
    import ell.{a, e}

    private def mAt(latR: Double): Double =
      math.cos(latR) / math.sqrt(1 - e * e * math.sin(latR) * math.sin(latR))
    private def tAt(latR: Double): Double =
      math.tan(math.Pi / 4 - latR / 2) /
        math.pow((1 - e * math.sin(latR)) / (1 + e * math.sin(latR)), e / 2)

    private val sp1R = math.toRadians(sp1)
    private val sp2R = math.toRadians(sp2)
    private val lat0R = math.toRadians(lat0)
    // exposed: the column-math reprojection (GeoQueries.crsTransformQuery)
    // injects these as shared literals on both engines
    val n: Double = (math.log(mAt(sp1R)) - math.log(mAt(sp2R))) / (math.log(tAt(sp1R)) - math.log(tAt(sp2R)))
    val bigF: Double = mAt(sp1R) / (n * math.pow(tAt(sp1R), n))
    // r0 = 0 when lat0 is the pole (t → 0), as in Belgian Lambert 72
    val r0: Double = if (lat0 >= 90.0) 0.0 else a * bigF * math.pow(tAt(lat0R), n)

    def forward(lat: Double, lon: Double): (Double, Double) = {
      val r = a * bigF * math.pow(tAt(math.toRadians(lat)), n)
      val theta = n * math.toRadians(lon - lon0)
      (fe + r * math.sin(theta), fn + r0 - r * math.cos(theta))
    }

    def inverse(easting: Double, northing: Double): (Double, Double) = {
      val dx = easting - fe
      val dy = r0 - (northing - fn)
      val sign = if (n >= 0) 1.0 else -1.0
      val rP = sign * math.sqrt(dx * dx + dy * dy)
      val tP = math.pow(rP / (a * bigF), 1 / n)
      val theta = math.atan2(sign * dx, sign * dy)
      val lon = math.toDegrees(theta / n) + lon0
      var phi = math.Pi / 2 - 2 * math.atan(tP)
      var i = 0
      while (i < 8) { // converges at rate e²; 8 is far past double precision
        phi = math.Pi / 2 - 2 * math.atan(
          tP * math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2)
        )
        i += 1
      }
      (math.toDegrees(phi), lon)
    }
  }

  /** EPSG code → projection, for the codes the reference's tests pin
    * plus the full UTM grid. Geographic CRSs (4326/4979/4269…) return
    * None — footprints pass through untransformed. */
  def forEpsg(code: Int): Option[Projection] = code match {
    case 2193 => // NZGD2000 / New Zealand Transverse Mercator 2000
      Some(TransverseMercator(GRS80, lat0 = 0.0, lon0 = 173.0, k0 = 0.9996, fe = 1600000.0, fn = 10000000.0))
    case 31370 => // BD72 / Belgian Lambert 72
      Some(LambertConformalConic2SP(
        International1924,
        lat0 = 90.0,
        lon0 = 4.367486666666666, // 4°22'02.952"E
        sp1 = 51.16666723333333, //  51°10'00.00204"N
        sp2 = 49.8333339, //          49°50'00.00204"N
        fe = 150000.013,
        fn = 5400088.438
      ))
    case c if c >= 32601 && c <= 32660 => // WGS84 / UTM north
      Some(TransverseMercator(WGS84, 0.0, (c - 32601) * 6 - 177.0, 0.9996, 500000.0, 0.0))
    case c if c >= 32701 && c <= 32760 => // WGS84 / UTM south
      Some(TransverseMercator(WGS84, 0.0, (c - 32701) * 6 - 177.0, 0.9996, 500000.0, 10000000.0))
    case _ => None
  }
}
