package graft.sources

import java.time.{LocalDateTime, ZoneId, ZoneOffset}

/** Geo-timezone lookup — ref `timezone.cpp` (ZoneDetect polygon db +
  * cctz). Fixture scope replaces the ZoneDetect polygon database with a
  * small embedded bbox table mapping lat/lon to IANA zone ids; the TIME
  * math itself (DST-aware local→UTC) is exact via the JVM's bundled
  * IANA tzdb (`java.time`), matching cctz semantics. Outside every
  * bbox the lookup falls back to UTC, exactly like the reference when
  * ZoneDetect returns no zone.
  */
object Timezone {

  /** (west, south, east, north, zone) — coarse boxes for the zones the
    * fixtures fly in. First match wins; order most-specific first. */
  private val zones: Seq[(Double, Double, Double, Double, String)] = Seq(
    (-10.0, 49.8, 2.0, 59.5, "Europe/London"),
    (2.0, 49.4, 7.0, 51.6, "Europe/Brussels"),
    (5.5, 47.2, 15.1, 55.1, "Europe/Berlin"),
    (-5.5, 42.0, 8.5, 49.4, "Europe/Paris"),
    (6.6, 36.5, 18.6, 47.2, "Europe/Rome"),
    (165.0, -47.5, 179.9, -34.0, "Pacific/Auckland"),
    (112.0, -44.0, 154.0, -10.0, "Australia/Sydney"),
    (129.0, 31.0, 146.0, 45.6, "Asia/Tokyo"),
    (-125.0, 32.0, -114.0, 49.0, "America/Los_Angeles"),
    (-106.0, 25.0, -87.0, 49.0, "America/Chicago"),
    (-87.0, 24.0, -66.9, 47.5, "America/New_York")
  )

  /** lat/lon → IANA zone. Primary path is the REAL shipped ZoneDetect
    * polygon database (`timezone.cpp:55-100`: first polygon hit whose
    * zone id loads); the bbox table is the fallback when the asset is
    * not deployed or the polygon id is unknown to the JVM tzdb. UTC
    * when nothing matches, exactly like the reference when ZoneDetect
    * returns no zone. */
  def lookupZone(lat: Double, lon: Double): ZoneId = {
    val polygonHit = ZoneDetect.default.flatMap { db =>
      try db.zoneId(lat, lon).flatMap { id =>
        try Some(ZoneId.of(id))
        catch { case _: Exception => None } // unloadable id → cascade on
      } catch { case _: Exception => None }
    }
    polygonHit.getOrElse(
      zones
        .collectFirst { case (w, s, e, n, z) if lon >= w && lon <= e && lat >= s && lat <= n => ZoneId.of(z) }
        .getOrElse(ZoneOffset.UTC)
    )
  }

  /** Local wall-clock datetime in the zone at (lat, lon) → UTC epoch
    * millis — `Timezone::getUTCEpoch` with the looked-up zone. */
  def toUtcEpochMs(local: LocalDateTime, lat: Double, lon: Double): Long =
    local.atZone(lookupZone(lat, lon)).toInstant.toEpochMilli

  /** Conformance city battery: (slug, lat, lon, zone) where zone is
    * the polygon-db answer, verified against the shipped
    * timezone21 asset. The q_timezone oracle inlines these zones;
    * ZoneDetectSpec asserts the db still returns them. */
  val conformanceCities: Seq[(String, Double, Double, String)] = Seq(
    ("chicago", 41.88, -87.63, "America/Chicago"),
    ("london", 51.5, -0.12, "Europe/London"),
    ("tokyo", 35.68, 139.77, "Asia/Tokyo"),
    ("sydney", -33.87, 151.21, "Australia/Sydney"),
    ("kathmandu", 27.7, 85.3, "Asia/Kathmandu"),
    ("rome", 41.9, 12.5, "Europe/Rome"),
    ("auckland", -36.85, 174.76, "Pacific/Auckland"),
    ("phoenix", 33.45, -112.07, "America/Phoenix"),
    ("kolkata", 22.57, 88.36, "Asia/Kolkata"),
    ("shanghai", 31.2, 121.5, "Asia/Shanghai"),
    ("berlin", 52.52, 13.4, "Europe/Berlin"),
    ("moscow", 55.75, 37.62, "Europe/Moscow"),
    ("losangeles", 34.05, -118.24, "America/Los_Angeles"),
    ("denver", 39.74, -104.98, "America/Denver"),
    ("saopaulo", -23.55, -46.63, "America/Sao_Paulo"),
    ("cairo", 30.04, 31.24, "Africa/Cairo"),
    ("johannesburg", -26.2, 28.04, "Africa/Johannesburg"),
    ("perth", -31.95, 115.86, "Australia/Perth"),
    ("honolulu", 21.31, -157.86, "Pacific/Honolulu"),
    ("reykjavik", 64.15, -21.94, "Atlantic/Reykjavik"),
    ("anchorage", 61.22, -149.9, "America/Anchorage"),
    ("adelaide", -34.93, 138.6, "Australia/Adelaide"),
    ("tehran", 35.69, 51.39, "Asia/Tehran"),
    ("stjohns", 47.56, -52.71, "America/St_Johns")
  )

  /** ◆ q_timezone — geo-timezone classification as a broadcast dim:
    * a 24-city fix list resolves zone ids through the REAL shipped
    * ZoneDetect polygon database (driver-side — 24 lookups — then a
    * literal array in the plan, so the per-row path is pure
    * Catalyst), events dispatch onto the fixes and aggregate per
    * zone. If the Scala polygon reader diverges from the verified
    * geometry, the emitted zone strings change and the oracle hash
    * fails. Falls back to the verified literals when the asset is
    * not deployed. */
  def timezoneQuery(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val zoneLits = conformanceCities.map { case (city, lat, lon, expected) =>
      ZoneDetect.default match {
        case Some(db) =>
          // a no-hit is a reader failure and must hash-fail the oracle,
          // not silently substitute the expected literal
          db.zoneId(lat, lon).getOrElse(s"MISS:$city")
        case None => expected // asset not deployed: oracle-literal fallback
      }
    }
    graft.Tables.events(s, dir)
      .select($"event_id", ($"event_id" % 24).cast("int").as("city_idx"))
      .withColumn("zone", element_at(array(zoneLits.map(lit): _*), $"city_idx" + 1))
      .groupBy($"zone")
      .agg(
        count(lit(1)).as("n"),
        min($"event_id").as("min_event"),
        max($"event_id").as("max_event")
      )
  }
}
