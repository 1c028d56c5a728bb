package graft.raster

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.geo.Geo

/** Raster kernels under the oracle: volume cut/fill and the elevation
  * profile, driven by deterministic synthetic grids so DuckDB can
  * recompute them exactly (the golden-value RasterSpec tests cover the
  * kernels against reference semantics; these queries prove the
  * distributed shapes hash-match an independent engine).
  */
object RasterQueries {

  /** ◆ Volume cut/fill (`volume.cpp:380-457`) over a pixel plane built
    * from the events table (value column = elevation, flat base plane
    * z=50). One partial-agg pass; conditional sums split by sign. */
  def volumeQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pixels = Tables
      .eventsRaw(s, dir)
      .select(
        ($"event_id" % 200).cast("int").as("x"),
        (($"event_id" / 200) % 200).cast("int").as("y"),
        $"value"
      )
    Raster
      .volume(pixels, pixels, Raster.FlatPlane(50.0), pixelArea = 0.25)
      .select(
        round($"cut", 2).as("cut"),
        round($"fill", 2).as("fill"),
        round($"volume", 2).as("volume"),
        $"areaPixels".cast("long").as("area_pixels")
      )
  }

  /** ◆ Byte rescale (`tiler.cpp:106-131`): two-pass min/max then
    * (v−min)/(max−min)·255 clamped — the tiler's normalization pass,
    * rolled up to a byte histogram. The min/max scalars come from a
    * first agg (exact doubles, so the oracle's own min/max matches). */
  def rescaleQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select($"l_extendedprice".as("value"))
    val r = Raster.minMax(li).head()
    val (mn, mx) = (r.getDouble(0), r.getDouble(1))
    li.select(Raster.rescaleByte($"value", mn, mx).as("byte"))
      .groupBy($"byte")
      .agg(count(lit(1)).as("n"))
  }

  /** ◆ Least-squares plane fit under the oracle (`volume.cpp:95-126`,
    * solve at :340-365): normal-equation sums as ONE partial-agg pass,
    * then the 3×3 solve as branch-free Cramer's-rule column math over
    * the single sums row — no driver round-trip at all (the scalar
    * `Raster.fitPlane` keeps the reference's pivoted elimination for
    * the volume path; this is the fully-distributed form). */
  def planeFitQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val px = Tables
      .eventsRaw(s, dir)
      .select(
        ($"event_id" % 200).cast("double").as("x"),
        (expr("event_id div 200") % 200).cast("double").as("y"),
        $"value"
      )
    val sums = px.agg(
      sum($"x" * $"x").as("sxx"),
      sum($"x" * $"y").as("sxy"),
      sum($"x").as("sx"),
      sum($"y" * $"y").as("syy"),
      sum($"y").as("sy"),
      count(lit(1)).cast("double").as("n"),
      sum($"x" * $"value").as("sxz"),
      sum($"y" * $"value").as("syz"),
      sum($"value").as("sz")
    )
    def det3(
        m11: Column, m12: Column, m13: Column,
        m21: Column, m22: Column, m23: Column,
        m31: Column, m32: Column, m33: Column
    ): Column =
      m11 * (m22 * m33 - m23 * m32) - m12 * (m21 * m33 - m23 * m31) + m13 * (m21 * m32 - m22 * m31)
    sums.select(
      round(
        det3($"sxz", $"sxy", $"sx", $"syz", $"syy", $"sy", $"sz", $"sy", $"n") /
          det3($"sxx", $"sxy", $"sx", $"sxy", $"syy", $"sy", $"sx", $"sy", $"n"),
        6
      ).as("a"),
      round(
        det3($"sxx", $"sxz", $"sx", $"sxy", $"syz", $"sy", $"sx", $"sz", $"n") /
          det3($"sxx", $"sxy", $"sx", $"sxy", $"syy", $"sy", $"sx", $"sy", $"n"),
        6
      ).as("b"),
      round(
        det3($"sxx", $"sxy", $"sxz", $"sxy", $"syy", $"syz", $"sx", $"sy", $"sz") /
          det3($"sxx", $"sxy", $"sx", $"sxy", $"syy", $"sy", $"sx", $"sy", $"n"),
        6
      ).as("c"),
      $"n".cast("long").as("n_points")
    )
  }

  /** ◆ Colormap lookup under the oracle (the reference's byte LUTs,
    * `gdaltiler.cpp` colormap path + `Vegetation.colormaps`):
    * normalized band value → nearest-stop (r,g,b), rolled up to
    * per-colour pixel counts. The stop arrays are embedded identically
    * in the SQL oracle. */
  def colormapQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = (($"event_id" % 101L) / 100.0).as("v")
    Tables
      .eventsRaw(s, dir)
      .select(v)
      .withColumn("c", graft.raster.Vegetation.applyColormap("rdylgn", $"v"))
      .groupBy($"c.r".as("r"), $"c.g".as("g"), $"c.b".as("b"))
      .agg(count(lit(1)).as("n"))
  }

  /** ◆ Elevation profile (`raster_profile.cpp:219-266`): 64 equispaced
    * samples along a line, pixel lookup by inverse geotransform,
    * distance by haversine accumulation. The grid value is a pure
    * integer function of (x, y) so the pixel join is exactly
    * reproducible; sample generation is `spark.range`, never a driver
    * loop. */
  def profileQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = 64
    val gt = Array(0.0, 0.01, 0.0, 0.0, 0.0, -0.01)
    val pixels = Raster.grid(s, 100, 100)((x, y) => ((x * 7 + y * 13) % 101).cast("double"))
    Raster
      .profile(s, pixels, gt, lon1 = 0.0, lat1 = 0.0, lon2 = 0.5, lat2 = -0.5, samples = n)
      .select(
        $"i",
        round($"lon", 6).as("lon"),
        round($"lat", 6).as("lat"),
        round($"distance", 4).as("distance"),
        $"value"
      )
  }
}
