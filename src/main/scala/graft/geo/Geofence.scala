package graft.geo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Point-in-polygon geofencing — the membership half of the spatial
  * story ([[SpatialJoin]] does cell-blocked containment against MANY
  * rectangles; this tests arbitrary polygons): even-odd ray casting
  * (Franklin's crossing rule) with the division cleared by
  * cross-multiplication, so with integer coordinates the test is EXACT
  * integer arithmetic — no epsilon, no engine divergence, ever.
  *
  * Scale shape: the fence ring is bounded (a geofence has tens of
  * vertices), so the per-edge crossing terms unroll into ONE codegen'd
  * map-only expression per row — no join, no shuffle; the single
  * aggregation at the end is the only exchange. A fence TABLE would
  * broadcast instead (the q_dim_rollup shape); the per-edge math is
  * identical either way.
  */
object Geofence {

  /** Crossing count term for one directed edge (x1,y1)→(x2,y2) against
    * the +x ray from (px,py): the edge straddles the scan line and the
    * intersection lies strictly right of the point. c is the cross
    * product that clears the x-intersect division; c = 0 (point on the
    * edge line) never counts, matching the strict `<` of the float
    * rule. */
  private def crossing(px: Column, py: Column, x1: Long, y1: Long, x2: Long, y2: Long): Column = {
    val straddles = (lit(y1) > py) =!= (lit(y2) > py)
    val c = (px - lit(x1)) * lit(y2 - y1) - (py - lit(y1)) * lit(x2 - x1)
    val rightOf = when(lit(y2 > y1), c < 0).otherwise(c > 0)
    when(straddles && rightOf, 1L).otherwise(0L)
  }

  /** pts(px, py: long …) → same rows plus `inside` (even-odd rule
    * against the closed ring). */
  def pointInPolygon(pts: DataFrame, ring: Seq[(Long, Long)]): DataFrame = {
    val terms = ring.indices.map { i =>
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % ring.size)
      crossing(col("px"), col("py"), x1, y1, x2, y2)
    }
    pts.withColumn("inside", terms.reduce(_ + _) % 2 === 1)
  }

  /** The q_geofence test ring (centi-degrees): a non-convex 8-vertex
    * "bat" — two concave notches exercise the even-odd parity. */
  val TestRing: Seq[(Long, Long)] = Seq(
    (-12000L, -6000L),
    (0L, -2000L),
    (12000L, -6000L),
    (8000L, 2000L),
    (14000L, 6000L),
    (0L, 8000L),
    (-14000L, 6000L),
    (-8000L, 2000L)
  )

  /** ◆ q_geofence — events mapped to deterministic integer
    * centi-degree points, classified against [[TestRing]], rolled up
    * per event type. */
  def geofenceQuery(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables
      .eventsRaw(s, dir)
      .select(
        col("event_type"),
        (col("event_id") * 7919L % 36000L - 18000L).as("px"),
        (col("event_id") * 104729L % 18000L - 9000L).as("py")
      )
    pointInPolygon(pts, TestRing)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("inside"), 1L).otherwise(0L)).as("n_inside")
      )
      .select(
        col("event_type"),
        col("n_total"),
        col("n_inside"),
        // unrounded: the quotient of identical integers is bit-identical
        // in both engines, while round()'s half-boundary behavior is a
        // libm coin-flip the compare must not depend on
        (col("n_inside") / col("n_total")).as("share_inside")
      )
  }
}
