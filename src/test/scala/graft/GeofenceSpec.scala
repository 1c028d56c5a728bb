package graft

import java.awt.geom.Path2D

import graft.geo.Geofence

class GeofenceSpec extends SparkSuite {
  import spark.implicits._

  private def awtPath(ring: Seq[(Long, Long)]): Path2D.Double = {
    val p = new Path2D.Double(Path2D.WIND_EVEN_ODD)
    p.moveTo(ring.head._1.toDouble, ring.head._2.toDouble)
    ring.tail.foreach { case (x, y) => p.lineTo(x.toDouble, y.toDouble) }
    p.closePath()
    p
  }

  test("even-odd ray casting agrees with the JDK's Path2D on a dense grid") {
    val ring = Geofence.TestRing
    val path = awtPath(ring)
    // off-lattice grid so no probe sits exactly on an edge (where the
    // strict-ray and AWT conventions may legitimately differ)
    val probes = for {
      x <- -17500L to 17500L by 1001L
      y <- -8500L to 8500L by 499L
    } yield (x * 2 + 1, y * 2 + 1)
    val out = Geofence
      .pointInPolygon(probes.toDF("px", "py"), ring.map { case (x, y) => (x * 2, y * 2) })
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2))
      .toMap
    val scaled = awtPath(ring.map { case (x, y) => (x * 2, y * 2) })
    probes.foreach { case (x, y) =>
      assert(
        out((x, y)) === scaled.contains(x.toDouble, y.toDouble),
        s"disagree at ($x,$y)"
      )
    }
  }

  test("concave notch points classify correctly") {
    val pts = Seq(
      (0L, 0L, true),       // center
      (0L, -3500L, false),  // inside the bottom notch (outside the ring)
      (0L, -1000L, true),   // just above the notch apex
      (-11000L, 3500L, false), // left notch
      (11000L, 3500L, false),  // right notch
      (13500L, 5900L, true),   // wing tip interior
      (-18000L, 0L, false)     // far outside
    )
    val out = Geofence
      .pointInPolygon(pts.map(p => (p._1, p._2)).toDF("px", "py"), Geofence.TestRing)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2))
      .toMap
    pts.foreach { case (x, y, want) => assert(out((x, y)) === want, s"($x,$y)") }
  }
}
