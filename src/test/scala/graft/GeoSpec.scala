package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.{Geo, Mercator}

/** Pure-kernel tests mirroring the reference's golden-value style
  * (`tests/entry_test.cpp:18-29` footprint, EPSG goldens) plus
  * property-style roundtrip sweeps the reference lacks.
  */
class GeoSpec extends AnyFunSuite {
  /** deterministic pseudo-random sweep stand-in for forAll */
  private def sweep(n: Int)(f: (Int, Int) => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (0 until n).foreach(_ => f(rnd.nextInt(), rnd.nextInt()))
  }
  private def forAll(f: (Int, Int) => Unit): Unit = sweep(200)(f)

  test("utm zone selection incl. Norway/Svalbard exceptions") {
    assert(Geo.utmZone(45.0, -122.0) === 10)
    assert(Geo.utmZone(46.2, 6.1) === 32 || Geo.utmZone(46.2, 6.1) === 31) // Geneva edge
    assert(Geo.utmZone(60.0, 5.0) === 32) // Norway exception
    assert(Geo.utmZone(78.0, 15.0) === 33) // Svalbard
    assert(Geo.utmZone(0.0, 0.0) === 31)
  }

  test("utm roundtrip within 1cm for mid-latitudes") {
    forAll { (latRaw: Int, lonRaw: Int) =>
      val lat = (latRaw % 60).toDouble + 0.123
      val lon = (lonRaw % 179).toDouble + 0.456
      val zone = Geo.utmZone(lat, lon)
      val (e, n) = Geo.toUTM(lat, lon, zone)
      val (lat2, lon2) = Geo.fromUTM(e, n, zone, lat >= 0)
      assert(math.abs(lat2 - lat) < 1e-6, s"lat $lat -> $lat2")
      assert(math.abs(lon2 - lon) < 1e-6, s"lon $lon -> $lon2")
    }
  }

  test("utm known value: Seattle 47.6062N 122.3321W zone 10") {
    val (e, n) = Geo.toUTM(47.6062, -122.3321, 10)
    // golden from the canonical Snyder transverse-Mercator series
    // (cross-checked against an independent Python implementation)
    assert(math.abs(e - 550200.21) < 1.0, s"easting $e")
    assert(math.abs(n - 5272748.59) < 1.0, s"northing $n")
  }

  test("haversine: 1 degree longitude at equator ~111.19 km") {
    val d = Geo.haversine(0, 0, 1, 0)
    assert(math.abs(d - 111195) < 200, s"got $d")
  }

  test("envelope algebra") {
    import Geo.Env
    val a = Env(0, 0, 10, 10)
    assert(a.intersects(Env(5, 5, 15, 15)))
    assert(!a.intersects(Env(11, 0, 12, 10)))
    assert(a.intersects(Env(10, 10, 20, 20))) // touching counts, like MbrIntersects
    assert(a.union(Env(-5, 5, 5, 20)) === Env(-5, 0, 10, 20))
  }

  test("equirectangular ring pole guard") {
    val ring = Geo.equirectangularRing(10, 89.9, 100)
    assert(ring.size === 5)
    assert(ring.head === ring.last || ring.head._1 < ring(1)._1)
    // near pole, lon spread is wide but finite (cos clamped at 0.01)
    val lonSpread = ring.map(_._1).max - ring.map(_._1).min
    assert(lonSpread > 0 && lonSpread < 1.0)
  }

  test("camera footprint: nadir square centered on origin, closed ring") {
    val ring = Geo.cameraFootprint(lon = -122.0, lat = 45.0, relAltitude = 100,
      focalLength = 8.0, sensorWidth = 6.0, sensorHeight = 4.5, yawDeg = 0, pitchDeg = -90)
    assert(ring.size === 5)
    assert(ring.head === ring.last)
    val lons = ring.map(_._1); val lats = ring.map(_._2)
    assert(lons.min < -122.0 && lons.max > -122.0)
    assert(lats.min < 45.0 && lats.max > 45.0)
    // fov half-width = alt*tan(atan2(3, 8)) = 100*0.375 = 37.5m -> ~0.00047 deg lon
    assert(math.abs((lons.max - lons.min) - 2 * 0.000478) < 2e-4)
  }

  test("camera footprint: pitch below -30 treated as nadir") {
    val nadir = Geo.cameraFootprint(-122, 45, 100, 8, 6, 4.5, 0, -90)
    val steep = Geo.cameraFootprint(-122, 45, 100, 8, 6, 4.5, 0, -60)
    assert(nadir === steep)
  }

  test("mercator: meters<->latlon roundtrip") {
    forAll { (latRaw: Int, lonRaw: Int) =>
      val lat = (latRaw % 85).toDouble * 0.9
      val lon = (lonRaw % 180).toDouble * 0.9
      val (mx, my) = Mercator.latLonToMeters(lat, lon)
      val (lat2, lon2) = Mercator.metersToLatLon(mx, my)
      assert(math.abs(lat2 - lat) < 1e-9)
      assert(math.abs(lon2 - lon) < 1e-9)
    }
  }

  test("mercator: resolution halves per zoom; tile flip") {
    assert(math.abs(Mercator.resolution(0) - 156543.033928041) < 1e-6)
    assert(math.abs(Mercator.resolution(5) - Mercator.resolution(4) / 2) < 1e-9)
    assert(Mercator.tmsToXYZ(0, 3) === 7)
    assert(Mercator.tmsToXYZ(7, 3) === 0)
  }

  test("mvt zoom heuristic: monotone in area, clamped, world->min") {
    // mirrors tests/mvt_density_test.cpp:20-107 monotonicity
    val zSmall = Mercator.mvtMaxZoom(0.0001)
    val zMed = Mercator.mvtMaxZoom(1.0)
    val zBig = Mercator.mvtMaxZoom(10000.0)
    assert(zSmall >= zMed && zMed >= zBig)
    assert(Mercator.mvtMaxZoom(64800.0) === 0)
    assert(Mercator.mvtMaxZoom(0.0000001) === 14) // clamped to max cap
  }

  test("pixel<->geo affine") {
    val gt = Array(100.0, 0.5, 0.0, 50.0, 0.0, -0.5)
    assert(Geo.pixelToGeo(gt, 0, 0) === ((100.0, 50.0)))
    assert(Geo.pixelToGeo(gt, 10, 4) === ((105.0, 48.0)))
    assert(Geo.geoToPixel(gt, 105.0, 48.0) === ((10.0, 4.0)))
  }
}
