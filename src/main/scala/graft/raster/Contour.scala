package graft.raster

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Contour extraction — ref `contour.cpp:95-270` (interval resolve +
  * GDALContourGenerateEx) and behavior spec `tests/contour_test.cpp:
  * 65-212`. The reference hands tracing to GDAL; here marching squares
  * runs distributed over 2×2 pixel cells:
  *
  *  - `cells`: every pixel contributes to at most 4 cells via a 4-way
  *    explode, then ONE groupBy assembles each cell's corners — one
  *    shuffle total, against 3 shuffle-joins for the naive x±1/y±1
  *    self-join assembly. Interior cells only (all 4 corners present).
  *  - `segments`: the 16-case marching-squares kernel per (cell,
  *    level) with linear edge interpolation; saddles disambiguated by
  *    the cell-center mean (GDAL's convention). A per-cell JVM kernel
  *    is the justified-UDF shape — the case table doesn't decompose
  *    into column algebra.
  *  - `crossings`: the pure-column relational core (edge-crossing
  *    points) the DuckDB oracle can recompute exactly — every segment
  *    endpoint is one of these crossings.
  */
object Contour {

  /** Assemble 2×2 cells from (x, y, value) pixels in one shuffle.
    * Corner layout: v00 = (cx, cy), v10 = (cx+1, cy), v01 = (cx, cy+1),
    * v11 = (cx+1, cy+1). Duplicate pixels at one (x, y) reduce by MAX
    * (deterministic, mirrored in the oracle SQL). */
  def cells(pixels: DataFrame): DataFrame =
    pixels
      .select(
        explode(
          array(
            struct(col("x").as("cx"), col("y").as("cy"), lit(0).as("corner")),
            struct((col("x") - 1).as("cx"), col("y").as("cy"), lit(1).as("corner")),
            struct(col("x").as("cx"), (col("y") - 1).as("cy"), lit(2).as("corner")),
            struct((col("x") - 1).as("cx"), (col("y") - 1).as("cy"), lit(3).as("corner"))
          )
        ).as("c"),
        col("value")
      )
      .select(col("c.cx").as("cx"), col("c.cy").as("cy"), col("c.corner").as("corner"), col("value"))
      .filter(col("cx") >= 0 && col("cy") >= 0)
      .groupBy("cx", "cy")
      .agg(
        max(when(col("corner") === 0, col("value"))).as("v00"),
        max(when(col("corner") === 1, col("value"))).as("v10"),
        max(when(col("corner") === 2, col("value"))).as("v01"),
        max(when(col("corner") === 3, col("value"))).as("v11"),
        countDistinct(col("corner")).as("nc")
      )
      .filter(col("nc") === 4)
      .drop("nc")

  /** One marching-squares cell at one level → 0, 1 or 2 segments in
    * pixel coordinates. Inside = value >= level; saddle cases (5, 10)
    * resolve by the center mean. */
  private[graft] def marchCell(
      cx: Int,
      cy: Int,
      v00: Double,
      v10: Double,
      v01: Double,
      v11: Double,
      level: Double
  ): Seq[(Double, Double, Double, Double)] = {
    // clockwise corners: c0 = v00 (cx,cy), c1 = v10, c2 = v11, c3 = v01
    val (c0, c1, c2, c3) = (v00, v10, v11, v01)
    val idx = (if (c0 >= level) 1 else 0) | (if (c1 >= level) 2 else 0) |
      (if (c2 >= level) 4 else 0) | (if (c3 >= level) 8 else 0)
    if (idx == 0 || idx == 15) return Seq.empty
    // edge interpolation points: e0 top (c0→c1), e1 right (c1→c2),
    // e2 bottom (c2→c3), e3 left (c3→c0)
    def e0 = { val t = (level - c0) / (c1 - c0); (cx + t, cy.toDouble) }
    def e1 = { val t = (level - c1) / (c2 - c1); (cx + 1.0, cy + t) }
    def e2 = { val t = (level - c2) / (c3 - c2); (cx + 1 - t, cy + 1.0) }
    def e3 = { val t = (level - c3) / (c0 - c3); (cx.toDouble, cy + 1 - t) }
    def seg(a: (Double, Double), b: (Double, Double)) = (a._1, a._2, b._1, b._2)
    idx match {
      case 1 | 14 => Seq(seg(e3, e0))
      case 2 | 13 => Seq(seg(e0, e1))
      case 3 | 12 => Seq(seg(e3, e1))
      case 4 | 11 => Seq(seg(e1, e2))
      case 6 | 9 => Seq(seg(e0, e2))
      case 7 | 8 => Seq(seg(e2, e3))
      case 5 => // c0, c2 inside
        if ((c0 + c1 + c2 + c3) / 4 >= level) Seq(seg(e0, e1), seg(e2, e3))
        else Seq(seg(e3, e0), seg(e1, e2))
      case 10 => // c1, c3 inside
        if ((c0 + c1 + c2 + c3) / 4 >= level) Seq(seg(e3, e0), seg(e1, e2))
        else Seq(seg(e0, e1), seg(e2, e3))
      case _ => Seq.empty
    }
  }

  /** Distributed tracing: (cell × level) → line segments, one row per
    * segment, pixel coords (apply the geotransform downstream for geo
    * coords). `levels` ships in the closure — contour level sets are
    * tiny (≤ MAX_LEVELS in the reference). */
  def segments(cellsDf: DataFrame, levels: Seq[Double]): DataFrame = {
    val lv = levels.toArray
    val kernel = udf { (cx: Int, cy: Int, v00: Double, v10: Double, v01: Double, v11: Double) =>
      val lo = math.min(math.min(v00, v10), math.min(v01, v11))
      val hi = math.max(math.max(v00, v10), math.max(v01, v11))
      lv.toSeq
        .filter(l => l >= lo && l <= hi)
        .flatMap(l => marchCell(cx, cy, v00, v10, v01, v11, l).map { case (x1, y1, x2, y2) => (l, x1, y1, x2, y2) })
    }
    cellsDf
      .select(
        explode(
          kernel(
            col("cx").cast("int"),
            col("cy").cast("int"),
            col("v00"),
            col("v10"),
            col("v01"),
            col("v11")
          )
        ).as("s")
      )
      .select(
        col("s._1").as("level"),
        col("s._2").as("x1"),
        col("s._3").as("y1"),
        col("s._4").as("x2"),
        col("s._5").as("y2")
      )
  }

  /** Relational edge-crossing core: for each (cell, level, edge) where
    * the level crosses the edge, the interpolated crossing point —
    * pure column math (codegen'd), exactly mirrorable in SQL. Every
    * marching-squares segment endpoint is one of these points. */
  def crossings(cellsDf: DataFrame, levelsDf: DataFrame): DataFrame = {
    // unified edge form: point = (px + t·dx, py + t·dy), t = (L−va)/(vb−va)
    def edge(id: Int, va: Column, vb: Column, px: Column, py: Column, dx: Double, dy: Double) =
      struct(
        lit(id).as("edge"),
        va.as("va"),
        vb.as("vb"),
        px.cast("double").as("px"),
        py.cast("double").as("py"),
        lit(dx).as("dx"),
        lit(dy).as("dy")
      )
    cellsDf
      .crossJoin(broadcast(levelsDf)) // levels: tiny generated set
      .withColumn(
        "e",
        explode(
          array(
            edge(0, col("v00"), col("v10"), col("cx"), col("cy"), 1.0, 0.0),
            edge(1, col("v10"), col("v11"), col("cx") + 1, col("cy"), 0.0, 1.0),
            edge(2, col("v11"), col("v01"), col("cx") + 1, col("cy") + 1, -1.0, 0.0),
            edge(3, col("v01"), col("v00"), col("cx"), col("cy") + 1, 0.0, -1.0)
          )
        )
      )
      .filter((col("e.va") >= col("level")) =!= (col("e.vb") >= col("level")))
      .withColumn("t", (col("level") - col("e.va")) / (col("e.vb") - col("e.va")))
      .select(
        col("level"),
        (col("e.px") + col("t") * col("e.dx")).as("x"),
        (col("e.py") + col("t") * col("e.dy")).as("y")
      )
  }

  // ------------------------------------------------------- assembly

  /** Perpendicular distance from p to segment ab — ref
    * `stockpile.cpp:170-183` (shared DP helper shape). */
  private def perpDist(px: Double, py: Double, ax: Double, ay: Double, bx: Double, by: Double): Double = {
    val vx = bx - ax; val vy = by - ay
    val len2 = vx * vx + vy * vy
    if (len2 < 1e-18) math.hypot(px - ax, py - ay)
    else {
      val t = ((px - ax) * vx + (py - ay) * vy) / len2
      math.hypot(px - (ax + t * vx), py - (ay + t * vy))
    }
  }

  /** Douglas-Peucker polyline simplification (iterative stack form) —
    * the simplify step the reference delegates to
    * `SimplifyPreserveTopology` (`contour.cpp:268-270`); DP is the
    * standard polyline variant and keeps endpoints fixed. */
  private[graft] def douglasPeucker(
      pts: IndexedSeq[(Double, Double)],
      eps: Double
  ): IndexedSeq[(Double, Double)] = {
    val n = pts.length
    if (n < 3 || eps <= 0) return pts
    val keep = Array.fill(n)(false)
    keep(0) = true; keep(n - 1) = true
    var stack = List((0, n - 1))
    while (stack.nonEmpty) {
      val (i, j) = stack.head
      stack = stack.tail
      if (j > i + 1) {
        var maxD = -1.0; var maxK = i
        var k = i + 1
        while (k < j) {
          val d = perpDist(pts(k)._1, pts(k)._2, pts(i)._1, pts(i)._2, pts(j)._1, pts(j)._2)
          if (d > maxD) { maxD = d; maxK = k }
          k += 1
        }
        if (maxD > eps) {
          keep(maxK) = true
          stack = (i, maxK) :: (maxK, j) :: stack
        }
      }
    }
    (0 until n).collect { case i if keep(i) => pts(i) }.toIndexedSeq
  }

  /** Stitch one level's segments into ordered polylines. Endpoints
    * quantized to 1e-9 for adjacency; chains start at degree-1
    * endpoints (open lines) then the smallest remaining endpoint
    * (closed rings), walking to the smallest-keyed unvisited
    * neighbour — fully deterministic. */
  private[graft] def stitchLevel(
      segs: Seq[(Double, Double, Double, Double)],
      eps: Double
  ): Seq[IndexedSeq[(Double, Double)]] = {
    def key(x: Double, y: Double): (Long, Long) = (math.rint(x * 1e9).toLong, math.rint(y * 1e9).toLong)
    case class End(k: (Long, Long), pt: (Double, Double))
    // degenerate-crossing cleanup: a level passing exactly through a
    // grid corner makes adjacent cells emit zero-length and coincident
    // segments (GDAL collapses these inside its tracer) — drop
    // zero-length, dedupe by unordered endpoint-key pair
    val cleaned = segs
      .filter { case (x1, y1, x2, y2) => key(x1, y1) != key(x2, y2) }
      .groupBy { case (x1, y1, x2, y2) =>
        val (a, b) = (key(x1, y1), key(x2, y2))
        if (Ordering[(Long, Long)].lteq(a, b)) (a, b) else (b, a)
      }
      .toSeq
      .sortBy(_._1)
      .map(_._2.head)
    val ends = cleaned.zipWithIndex.map { case ((x1, y1, x2, y2), i) =>
      i -> (End(key(x1, y1), (x1, y1)), End(key(x2, y2), (x2, y2)))
    }.toMap
    val adj = scala.collection.mutable.Map.empty[(Long, Long), List[Int]]
    ends.foreach { case (i, (a, b)) =>
      adj(a.k) = i :: adj.getOrElse(a.k, Nil)
      adj(b.k) = i :: adj.getOrElse(b.k, Nil)
    }
    val visited = Array.fill(cleaned.length)(false)
    val chains = scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[(Double, Double)]]

    def walk(startKey: (Long, Long)): Unit = {
      val first = adj(startKey).filter(!visited(_)).minOption.getOrElse(return)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      var curKey = startKey
      val (a0, b0) = ends(first)
      buf += (if (a0.k == curKey) a0.pt else b0.pt)
      var cur = first
      var continue = true
      while (continue) {
        visited(cur) = true
        val (a, b) = ends(cur)
        val nextEnd = if (a.k == curKey) b else a
        buf += nextEnd.pt
        curKey = nextEnd.k
        adj(curKey).filter(!visited(_)).minOption match {
          case Some(nxt) => cur = nxt
          case None => continue = false
        }
      }
      chains += douglasPeucker(buf.toIndexedSeq, eps)
    }

    // open polylines first: endpoints with odd degree, smallest first
    adj.toSeq
      .filter { case (_, is) => is.length % 2 == 1 }
      .map(_._1)
      .sorted
      .foreach(k => if (adj(k).exists(!visited(_))) walk(k))
    // then closed rings from the smallest remaining endpoint
    var remaining = true
    while (remaining) {
      val unvisitedKeys = ends.collect { case (i, (a, _)) if !visited(i) => a.k }
      if (unvisitedKeys.isEmpty) remaining = false
      else walk(unvisitedKeys.min)
    }
    chains.toSeq
  }

  /** Assemble marching-squares segments into per-level line features —
    * the reference's contour feature output (`contour.cpp:240-290`:
    * one LineString feature per traced line, elev property, optional
    * simplify). groupBy(level) + a per-group kernel: a level's segment
    * set is bounded by the raster's cross-section at that elevation —
    * the justified-UDF shape (the chain walk doesn't decompose into
    * column algebra). Output: one row per polyline with point count,
    * closed flag, and euclidean length. */
  def polylines(segmentsDf: DataFrame, simplifyEps: Double = 0.0): DataFrame = {
    val assemble = udf { (segs: Seq[Row]) =>
      val chains = stitchLevel(
        segs.map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))),
        simplifyEps
      )
      chains.zipWithIndex.map { case (pts, i) =>
        val closed = pts.length > 2 && pts.head == pts.last
        val len = pts.sliding(2).map { case Seq((ax, ay), (bx, by)) => math.hypot(bx - ax, by - ay) }.sum
        (i, pts.length, closed, len, pts.head._1, pts.head._2)
      }
    }
    segmentsDf
      .groupBy(col("level"))
      .agg(assemble(collect_list(struct(col("x1"), col("y1"), col("x2"), col("y2")))).as("lines"))
      .select(col("level"), explode(col("lines")).as("l"))
      .select(
        col("level"),
        col("l._1").as("line_id"),
        col("l._2").as("n_points"),
        col("l._3").as("closed"),
        round(col("l._4"), 6).as("length"),
        col("l._5").as("start_x"),
        col("l._6").as("start_y")
      )
  }

  /** ◆ Contour crossings under the oracle (`contour.cpp:95-270`,
    * `tests/contour_test.cpp:88-102` count→interval): pixel plane from
    * the events table, interval = (max−min)/8 (count-derived), levels
    * aligned to the interval grid, per-level crossing count + centroid.
    * Exercises the one-shuffle `cells` assembly + the relational
    * crossing core end-to-end. */
  def contourQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val px = graft.Tables
      .eventsRaw(s, dir)
      .select(
        expr("event_id % 200").cast("int").as("x"),
        expr("(event_id div 200) % 200").cast("int").as("y"),
        $"value"
      )
    val mm = px.agg(min($"value").as("mn"), max($"value").as("mxv"))
    val levels = mm
      .crossJoin(s.range(9).toDF("k"))
      .withColumn("iv", ($"mxv" - $"mn") / 8.0)
      .withColumn("level", ceil($"mn" / $"iv") * $"iv" + $"k" * $"iv")
      .filter($"level" <= $"mxv")
      .select($"level")
    crossings(cells(px), levels)
      .groupBy($"level")
      .agg(
        count(lit(1)).as("n_crossings"),
        round(avg($"x"), 4).as("avg_x"),
        round(avg($"y"), 4).as("avg_y")
      )
      .select(round($"level", 6).as("level"), $"n_crossings", $"avg_x", $"avg_y")
  }
}
