package graft.raster

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vegetation-index formula registry — ref
  * `src/library/vegetation.cpp:87-112` (formulas) + `157-230`
  * (band-requirement filtering). Each index is a pure `Column`
  * transformer over named band columns (codegen'd, no UDF).
  */
object Vegetation {

  /** Band requirements — ref `vegetation.cpp:26`, `157-207`. */
  val requiredBands: Map[String, Set[String]] = Map(
    "VARI" -> Set("R", "G", "B"),
    "EXG" -> Set("R", "G", "B"),
    "GLI" -> Set("R", "G", "B"),
    "VNDVI" -> Set("R", "G", "B"),
    "MPRI" -> Set("R", "G"),
    "GRVI" -> Set("R", "G"),
    "NDYI" -> Set("G", "B"),
    "NDVI" -> Set("N", "R"),
    "NDWI" -> Set("N", "G"),
    "GNDVI" -> Set("N", "G"),
    "SAVI" -> Set("N", "R"),
    "OSAVI" -> Set("N", "R"),
    "EVI" -> Set("N", "R", "B"),
    "NDRE" -> Set("N", "Re"),
    "ENDVI" -> Set("N", "G", "B"),
    "ARVI" -> Set("N", "R", "B"),
    "CELSIUS" -> Set("L"),
    "KELVIN" -> Set("L")
  )

  /** Formula registry — ref `vegetation.cpp:87-112`. Band args:
    * R, G, B, N (NIR), Re (red edge), L (thermal raw °C). */
  def formula(name: String)(b: Map[String, Column]): Column = {
    def R = b("R"); def G = b("G"); def B = b("B"); def N = b("N")
    def Re = b("Re"); def L = b("L")
    name.toUpperCase match {
      case "VARI" => (G - R) / (G + R - B)
      case "EXG" => lit(2.0) * G - (R + B)
      case "GLI" => (lit(2.0) * G - R - B) / (lit(2.0) * G + R + B)
      case "VNDVI" => lit(0.5268) * pow(R, -0.1294) * pow(G, 0.3389) * pow(B, -0.3118)
      case "MPRI" => (G - R) / (G + R)
      case "GRVI" => (G - R) / (G + R)
      case "NDYI" => (G - B) / (G + B)
      case "NDVI" => (N - R) / (N + R)
      case "NDWI" => (G - N) / (G + N)
      case "GNDVI" => (N - G) / (N + G)
      case "SAVI" => lit(1.5) * (N - R) / (N + R + lit(0.5))
      case "OSAVI" => (N - R) / (N + R + lit(0.16))
      case "EVI" => lit(2.5) * (N - R) / (N + lit(6.0) * R - lit(7.5) * B + lit(1.0))
      case "NDRE" => (N - Re) / (N + Re)
      case "ENDVI" => (N + G - lit(2.0) * B) / (N + G + lit(2.0) * B)
      case "ARVI" => (N - (lit(2.0) * R - B)) / (N + (lit(2.0) * R - B))
      case "CELSIUS" => L
      case "KELVIN" => L + lit(273.15)
      case other => throw new IllegalArgumentException(s"unknown vegetation index: $other")
    }
  }

  def applicable(availableBands: Set[String]): Seq[String] =
    requiredBands.collect { case (k, req) if req.subsetOf(availableBands) => k }.toSeq.sorted

  /** Colormap registry (subset of the 17 maps, ref
    * `vegetation.cpp:435-670`): value in [0,1] → RGB via array literal
    * + element_at. */
  val colormaps: Map[String, Seq[(Int, Int, Int)]] = Map(
    "rdylgn" -> Seq((165, 0, 38), (215, 48, 39), (244, 109, 67), (253, 174, 97), (254, 224, 139),
      (255, 255, 191), (217, 239, 139), (166, 217, 106), (102, 189, 99), (26, 152, 80), (0, 104, 55)),
    "viridis" -> Seq((68, 1, 84), (71, 44, 122), (59, 81, 139), (44, 113, 142), (33, 144, 141),
      (39, 173, 129), (92, 200, 99), (170, 220, 50), (253, 231, 37)),
    "spectral" -> Seq((158, 1, 66), (213, 62, 79), (244, 109, 67), (253, 174, 97), (254, 224, 139),
      (255, 255, 191), (230, 245, 152), (171, 221, 164), (102, 194, 165), (50, 136, 189), (94, 79, 162)),
    "ironbow" -> Seq((0, 0, 0), (32, 0, 66), (96, 0, 130), (160, 16, 128), (220, 80, 60),
      (252, 150, 8), (252, 210, 80), (255, 255, 220))
  )

  /** Map a normalized value column to an (r,g,b) struct via the named
    * colormap — nearest-stop lookup, like the byte LUT the reference
    * builds. */
  def applyColormap(name: String, v: Column): Column = {
    val stops = colormaps(name)
    val n = stops.size
    val idx = least(lit(n - 1), greatest(lit(0), round(v * (n - 1)).cast("int")))
    val rs = array(stops.map(s => lit(s._1)): _*)
    val gs = array(stops.map(s => lit(s._2)): _*)
    val bs = array(stops.map(s => lit(s._3)): _*)
    struct(
      element_at(rs, idx + 1).as("r"),
      element_at(gs, idx + 1).as("g"),
      element_at(bs, idx + 1).as("b")
    )
  }
}

/** Thermal raw→temperature conversion — ref `src/include/thermal.h:16-27`,
  * `src/library/thermal.cpp` (`rawToTemperature`): Planck-curve
  * radiometry with emissivity/distance/ambient corrections.
  */
object Thermal {
  final case class Calibration(
      r1: Double = 21106.77,
      b: Double = 1501.0,
      f: Double = 1.0,
      o: Double = -7340.0,
      r2: Double = 0.012545258,
      emissivity: Double = 0.95,
      reflectedTempC: Double = 20.0
  )

  /** raw sensor value → °C as pure column math. */
  def rawToCelsius(raw: Column, c: Calibration): Column = {
    // radiance of reflected ambient
    val rawRefl = lit(c.r1) / (lit(c.r2) * (exp(lit(c.b) / lit(c.reflectedTempC + 273.15)) - lit(c.f))) - lit(c.o)
    val rawObj = (raw - (lit(1.0) - lit(c.emissivity)) * rawRefl) / lit(c.emissivity)
    lit(c.b) / log(lit(c.r1) / (lit(c.r2) * (rawObj + lit(c.o))) + lit(c.f)) - lit(273.15)
  }
}
