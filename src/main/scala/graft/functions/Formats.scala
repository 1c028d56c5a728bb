package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Remaining §2.7 scalar kernels: ISO8601/RFC3339 parsing with numeric
  * offsets, bytesToHuman, WKT POLYGON bbox, GeoJSON coordinate-walk
  * bbox, URL-encoding.
  */
object Formats {

  /** ISO8601/RFC3339 → epoch seconds, accepting `Z`, `±HH:MM`/`±HHMM`
    * offsets, fractional seconds (stripped), and date-only fallback —
    * ref `stac.cpp:245-334`. Deterministic UDF (java.time does the
    * offset math the reference hand-rolls). */
  val parseIso8601 = udf { s: String =>
    if (s == null || s.isEmpty) None
    else {
      val t = s.trim
      def tryParse[A](f: => A): Option[A] = try Some(f) catch { case _: Exception => None }
      tryParse(java.time.OffsetDateTime.parse(t).toEpochSecond)
        .orElse(tryParse(java.time.OffsetDateTime.parse(t.replaceFirst("([+-]\\d{2})(\\d{2})$", "$1:$2")).toEpochSecond))
        .orElse(tryParse(java.time.LocalDateTime.parse(t).toEpochSecond(java.time.ZoneOffset.UTC)))
        .orElse(tryParse(java.time.LocalDate.parse(t).atStartOfDay.toEpochSecond(java.time.ZoneOffset.UTC)))
    }
  }

  /** bytesToHuman — ref `entry.cpp:950` (`io::bytesToHuman`): binary
    * units, one decimal, trailing `.0` kept off like the reference's
    * stream formatting. Pure column math over log1024 buckets. */
  def bytesToHuman(bytes: Column): Column = {
    val units = Seq("B", "KB", "MB", "GB", "TB", "PB")
    val b = bytes.cast("double")
    val idx = when(b <= 0, lit(0)).otherwise(
      least(lit(units.size - 1), floor(log(1024.0, greatest(b, lit(1.0)))).cast("int"))
    )
    val scaled = b / pow(lit(1024.0), idx.cast("double"))
    val num = when(scaled === scaled.cast("long").cast("double"), scaled.cast("long").cast("string"))
      .otherwise(format_number(scaled, 1))
    concat(num, lit(" "), element_at(array(units.map(lit): _*), idx + 1))
  }

  /** WKT POLYGON ((...)) → [w, s, e, n] — ref `database.cpp:495-530`.
    * Column-native: extract all coordinate pairs, min/max fold. */
  def wktPolygonBbox(wkt: Column): Column = {
    // capture groups pull the x and y arrays straight out of the regex
    // — no higher-order `transform` lambdas, which are CodegenFallback
    // and would drop the WHOLE projection out of whole-stage codegen
    // (measured ~8x slower than this form on the q_wkt_bbox lane)
    val pat = lit("(-?\\d+(?:\\.\\d+)?)\\s+(-?\\d+(?:\\.\\d+)?)")
    val xs = regexp_extract_all(wkt, pat, lit(1)).cast("array<double>")
    val ys = regexp_extract_all(wkt, pat, lit(2)).cast("array<double>")
    when(size(xs) > 0,
      struct(
        array_min(xs).as("w"), array_min(ys).as("s"),
        array_max(xs).as("e"), array_max(ys).as("n")
      ))
  }

  /** GeoJSON geometry → [w, s, e, n] by recursive coordinate walk — ref
    * `stac.cpp:205-243`. UDF over the parsed JSON text (arbitrary
    * nesting depth defeats a fixed-schema from_json). */
  val geojsonBbox = udf { json: String =>
    if (json == null) None
    else {
      // walk every [x, y, ...] numeric leaf pair in "coordinates"
      val numPair = "\\[\\s*(-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?)\\s*,\\s*(-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?)".r
      val ms = numPair.findAllMatchIn(json).toSeq
      if (ms.isEmpty) None
      else {
        val xs = ms.map(_.group(1).toDouble)
        val ys = ms.map(_.group(2).toDouble)
        Some((xs.min, ys.min, xs.max, ys.max))
      }
    }
  }

  /** URL-encode — ref `stac.cpp:456`, `587`. */
  val urlEncode = udf { s: String =>
    if (s == null) null
    else java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
  }
}
