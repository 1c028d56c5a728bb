package graft.raster

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Horn slope / aspect over a pixel plane (Horn 1981, the GDAL
  * `gdaldem slope`/`aspect` kernel; reference terrain products come
  * out of its dsm/dtm pipeline) — the 3×3 neighborhood stencil as ONE
  * relational pass: every pixel scatters to its nine (target, position)
  * slots, a single groupBy reassembles each target's stencil via
  * conditional sums, and the Horn gradients are plain column math.
  * One shuffle for any kernel size; no per-pixel window, no driver
  * raster.
  *
  * Aspect is classified into the eight compass octants with SIGN AND
  * MAGNITUDE COMPARISONS ONLY — no atan2. Spark and DuckDB libm
  * arctangents can disagree in the last ulp, but comparisons of
  * identically-computed doubles cannot; the octant is what terrain
  * rollups bin by anyway. Slope stays as rise/run (sqrt is
  * IEEE-correctly-rounded, so it IS engine-stable), rounded on output.
  */
object Slope {

  /** px(x, y, value) → interior-pixel gradients (x, y, dzx, dzy). */
  def gradients(px: DataFrame): DataFrame = {
    val offsets = Seq(-1, 0, 1)
    val nb = px
      .withColumn("dx", explode(array(offsets.map(lit): _*)))
      .withColumn("dy", explode(array(offsets.map(lit): _*)))
      .select(
        (col("x") + col("dx")).as("tx"),
        (col("y") + col("dy")).as("ty"),
        // a source scattering to target (x+dx, y+dy) sits at offset
        // (−dx, −dy) FROM that target, so the stencil slot is mirrored
        ((lit(1) - col("dx")) * 3 + (lit(1) - col("dy"))).as("pos"),
        col("value")
      )
    def at(p: Int): Column = sum(when(col("pos") === p, col("value")))
    nb.groupBy(col("tx").as("x"), col("ty").as("y"))
      .agg(
        count(lit(1)).as("n"),
        at(0).as("a"), at(3).as("b"), at(6).as("c"),
        at(1).as("d"), at(7).as("f"),
        at(2).as("g"), at(5).as("h"), at(8).as("i")
      )
      .filter(col("n") === 9)
      .select(
        col("x"),
        col("y"),
        (((col("c") + lit(2) * col("f") + col("i")) - (col("a") + lit(2) * col("d") + col("g"))) / 8.0).as("dzx"),
        (((col("g") + lit(2) * col("h") + col("i")) - (col("a") + lit(2) * col("b") + col("c"))) / 8.0).as("dzy")
      )
  }

  /** Comparison-only octant of the aspect vector; −1 = flat. */
  def octant(dzx: Column, dzy: Column): Column = {
    val ax = abs(dzx); val ay = abs(dzy)
    when(dzx === 0 && dzy === 0, lit(-1))
      .when(ax >= ay && dzx > 0 && dzy >= 0, lit(0))
      .when(ax < ay && dzy > 0 && dzx >= 0, lit(1))
      .when(ax < ay && dzy > 0 && dzx < 0, lit(2))
      .when(ax >= ay && dzx < 0 && dzy > 0, lit(3))
      .when(ax >= ay && dzx < 0 && dzy <= 0, lit(4))
      .when(ax < ay && dzy < 0 && dzx <= 0, lit(5))
      .when(ax < ay && dzy < 0 && dzx > 0, lit(6))
      .otherwise(lit(7))
  }

  /** Events → dense pixel plane (same derivation as q_contour), ONE
    * value per pixel: ids wrap past one grid cover at larger scale
    * factors, so the plane takes the per-pixel MAX (deterministic; a
    * single partial agg; identity at sf0.01 where the mapping is
    * 1:1) — duplicate (x, y) rows would corrupt the stencil's
    * interior test and conditional sums. */
  def eventsPlane(s: SparkSession, dir: String): DataFrame =
    graft.Tables
      .eventsRaw(s, dir)
      .select(
        expr("event_id % 200").cast("int").as("x"),
        expr("(event_id div 200) % 200").cast("int").as("y"),
        col("value")
      )
      .groupBy(col("x"), col("y"))
      .agg(max(col("value")).as("value"))

  /** ◆ q_hillshade — Lambertian hillshade from the Horn gradients:
    * shade = max(0, N·L)·255 with the standard NW light (azimuth 315°,
    * altitude 45°). The light vector enters as LITERAL doubles (√2/2
    * written out), so the whole expression is +,·,/,sqrt,greatest,
    * trunc — every one engine-stable; trunc, not round, because
    * half-up vs half-even rounding of a *.5 byte value would diverge.
    * Output: 16-wide byte-histogram of the shade raster. */
  def hillshadeQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val r22 = 0.7071067811865476 // √2/2: cos(45°) = sin(45°)
    gradients(eventsPlane(s, dir))
      .select(
        floor(
          lit(255.0) * greatest(
            lit(0.0),
            (lit(r22) - lit(r22) * ($"dzx" * lit(r22) + $"dzy" * lit(-r22))) /
              sqrt(lit(1.0) + $"dzx" * $"dzx" + $"dzy" * $"dzy")
          )
        ).cast("long").as("shade")
      )
      .groupBy(expr("shade div 16").as("bucket")) // integer div — Column `/` on longs is double division
      .agg(count(lit(1)).as("n_pixels"), min($"shade").as("min_shade"), max($"shade").as("max_shade"))
  }

  /** ◆ q_slope — the shared events pixel plane (same derivation as
    * q_contour), rolled up per aspect octant. */
  def slopeQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    gradients(eventsPlane(s, dir))
      .select(
        octant($"dzx", $"dzy").as("octant"),
        sqrt($"dzx" * $"dzx" + $"dzy" * $"dzy").as("slope")
      )
      .groupBy($"octant")
      .agg(
        count(lit(1)).as("n_pixels"),
        round(avg($"slope"), 4).as("avg_slope"),
        round(max($"slope"), 4).as("max_slope")
      )
  }
}
