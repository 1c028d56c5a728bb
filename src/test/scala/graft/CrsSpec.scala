package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.{Crs, Geo}

/** CRS transforms validated against the reference's golden footprints
  * (`tests/entry_test.cpp:41-391`). The reference pins WGS84 corner
  * coordinates of projected GeoTIFFs; the tif assets themselves are
  * remote, but the goldens still pin the math two ways:
  *
  *  1. A GeoTIFF footprint is an axis-aligned RECTANGLE in its own
  *     projected CRS. Forward-projecting the golden WGS84 corners must
  *     therefore reproduce pairwise-equal eastings/northings (within
  *     datum-rotation noise, a few mm) — any error in the projection
  *     constants or series breaks the alignment by metres.
  *  2. The golden center point is the projected rectangle's center, so
  *     inverse-projecting the mean of the projected corners must give
  *     it back (reference tolerance 1e-5°).
  */
class CrsSpec extends AnyFunSuite {

  // wro.tif corners — entry_test.cpp:41-73 (EPSG:2193, order UL,UR,LR,LL)
  private val nz = Seq(
    (175.4029416126, -41.06584339802),
    (175.4040791346, -41.06581965903),
    (175.4041099344, -41.06666483358),
    (175.4029723979, -41.06668857327)
  )

  // vo.tif corners — entry_test.cpp:329-355 (EPSG:31370, order UL,UR,LR,LL)
  private val be = Seq(
    (4.342762755994, 50.69212694232),
    (4.345168867205, 50.69212743836),
    (4.345169386691, 50.69105730148),
    (4.342763330072, 50.69105680545)
  )

  private def assertRectangle(proj: Crs.Projection, corners: Seq[(Double, Double)], tolM: Double): Seq[(Double, Double)] = {
    val Seq(ul, ur, lr, ll) = corners.map { case (lon, lat) => proj.forward(lat, lon) }
    assert(math.abs(ul._1 - ll._1) < tolM, s"west edge eastings differ: ${ul._1} vs ${ll._1}")
    assert(math.abs(ur._1 - lr._1) < tolM, s"east edge eastings differ: ${ur._1} vs ${lr._1}")
    assert(math.abs(ul._2 - ur._2) < tolM, s"north edge northings differ: ${ul._2} vs ${ur._2}")
    assert(math.abs(ll._2 - lr._2) < tolM, s"south edge northings differ: ${ll._2} vs ${lr._2}")
    Seq(ul, ur, lr, ll)
  }

  test("EPSG:2193 NZTM2000: golden wro.tif corners form a projected rectangle") {
    val proj = Crs.forEpsg(2193).get
    val p = assertRectangle(proj, nz, tolM = 0.01)
    // sanity: inside NZTM's legal range
    p.foreach { case (e, n) => assert(e > 1000000 && e < 2100000 && n > 4700000 && n < 10000000) }
  }

  test("EPSG:2193: rectangle center inverse-projects to the golden point_geom") {
    val proj = Crs.forEpsg(2193).get
    val p = nz.map { case (lon, lat) => proj.forward(lat, lon) }
    val (ce, cn) = (p.map(_._1).sum / 4, p.map(_._2).sum / 4)
    val (lat, lon) = proj.inverse(ce, cn)
    assert(math.abs(lon - 175.403526) < 1e-5, s"center lon $lon") // entry_test.cpp:60
    assert(math.abs(lat - -41.066254) < 1e-5, s"center lat $lat") // entry_test.cpp:61
  }

  test("EPSG:31370 Belgian Lambert 72: golden vo.tif corners form a projected rectangle") {
    val proj = Crs.forEpsg(31370).get
    val p = assertRectangle(proj, be, tolM = 0.01)
    p.foreach { case (e, n) => assert(e > 140000 && e < 260000 && n > 20000 && n < 250000) }
  }

  test("EPSG:31370: rectangle center inverse-projects to the golden point_geom") {
    val proj = Crs.forEpsg(31370).get
    val p = be.map { case (lon, lat) => proj.forward(lat, lon) }
    val (ce, cn) = (p.map(_._1).sum / 4, p.map(_._2).sum / 4)
    val (lat, lon) = proj.inverse(ce, cn)
    assert(math.abs(lon - 4.343966) < 1e-5, s"center lon $lon") // entry_test.cpp:339
    assert(math.abs(lat - 50.691592) < 1e-5, s"center lat $lat") // entry_test.cpp:340
  }

  test("general TM with UTM params reproduces Geo.toUTM/fromUTM exactly") {
    val pts = Seq((47.3769, 8.5417), (-33.8688, 151.2093), (40.7128, -74.0060), (64.1466, -21.9426))
    pts.foreach { case (lat, lon) =>
      val zone = Geo.utmZone(lat, lon)
      val epsg = (if (lat >= 0) 32600 else 32700) + zone
      val proj = Crs.forEpsg(epsg).get
      val (e1, n1) = Geo.toUTM(lat, lon, zone)
      val (e2, n2) = proj.forward(lat, lon)
      assert(math.abs(e1 - e2) < 1e-6 && math.abs(n1 - n2) < 1e-6, s"($lat,$lon) UTM vs TM: ($e1,$n1) vs ($e2,$n2)")
      val (latB, lonB) = proj.inverse(e2, n2)
      assert(math.abs(latB - lat) < 1e-8 && math.abs(lonB - lon) < 1e-8, "roundtrip")
    }
  }

  test("roundtrip property: forward∘inverse is identity across each projection's domain") {
    // The 6th-order Krüger series is designed for UTM's ±3° zones;
    // NZTM spans ±7° of its central meridian, where truncation reaches
    // a few cm (2e-6° ≈ 15 cm bound at the extreme corner). Within
    // ±3° the usual 1e-8° (~1 mm) holds.
    val nzProj = Crs.forEpsg(2193).get
    for (lat <- Seq(-46.0, -41.0, -35.5); lon <- Seq(167.0, 173.0, 178.4)) {
      val (e, n) = nzProj.forward(lat, lon)
      val (lat2, lon2) = nzProj.inverse(e, n)
      val tol = if (math.abs(lon - 173.0) <= 3.0) 1e-8 else 2e-6
      assert(math.abs(lat2 - lat) < tol && math.abs(lon2 - lon) < tol, s"NZTM roundtrip ($lat,$lon)")
    }
    val beProj = Crs.forEpsg(31370).get
    for (lat <- Seq(49.6, 50.5, 51.4); lon <- Seq(2.6, 4.4, 6.3)) {
      val (e, n) = beProj.forward(lat, lon)
      val (lat2, lon2) = beProj.inverse(e, n)
      assert(math.abs(lat2 - lat) < 1e-8 && math.abs(lon2 - lon) < 1e-8, s"LCC roundtrip ($lat,$lon)")
    }
  }
}
