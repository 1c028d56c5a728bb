package graft

import graft.sources.{Timezone, ZoneDetect}

/** ZoneDetect polygon-database reader against the REAL shipped asset
  * (`data/timezone21-old.bin`, the db `timezone.cpp:29-34` opens) —
  * header/fields/notice, the shared-border reference decoding, and a
  * 24+ city battery with known IANA answers. */
class ZoneDetectSpec extends SparkSuite {

  private def db = ZoneDetect.default

  test("header: PLBT v1, precision 21, the four timezone fields") {
    db match {
      case None => cancel("timezone21 asset not deployed")
      case Some(d) =>
        assert(d.tableType === 'T')
        assert(d.version === 1)
        assert(d.precision === 21)
        assert(d.fieldNames === Seq("TimezoneIdPrefix", "TimezoneId", "CountryAlpha2", "CountryName"))
        assert(d.notice.startsWith("Contains data from Natural Earth"))
        // section sizes chain exactly to EOF (checked in parse) and in order
        assert(d.bboxOffset < d.metadataOffset && d.metadataOffset < d.dataOffset)
    }
  }

  test("city battery: every conformance city resolves to its known zone, uniquely") {
    db match {
      case None => cancel("timezone21 asset not deployed")
      case Some(d) =>
        Timezone.conformanceCities.foreach { case (slug, lat, lon, want) =>
          val hits = d.lookup(lat, lon)
          assert(hits.size === 1, s"$slug: expected one zone, got ${hits.map(f => f(0) + f(1))}")
          assert(hits.head(0) + hits.head(1) === want, s"$slug")
        }
    }
  }

  test("metadata fields: country decodes through the remote-string dedup") {
    db match {
      case None => cancel("timezone21 asset not deployed")
      case Some(d) =>
        val ny = d.lookup(40.71, -74.01).head
        assert(ny(0) + ny(1) === "America/New_York")
        assert(ny(2) === "US")
        assert(ny(3) === "United States")
        val lon = d.lookup(51.5, -0.12).head
        assert(lon(2) === "GB" && lon(3) === "United Kingdom")
    }
  }

  test("open ocean and poles: no polygon hit") {
    db match {
      case None => cancel("timezone21 asset not deployed")
      case Some(d) =>
        assert(d.lookup(0.0, -30.0).isEmpty) // mid-Atlantic
        assert(d.lookup(-75.25, -0.07).isEmpty === d.lookup(-75.25, -0.07).isEmpty) // antarctica may or may not map; just must not throw
        assert(d.zoneId(0.0, -30.0).isEmpty)
    }
  }

  test("lookupZone cascade: polygon db wins, bbox fallback, UTC last") {
    // polygon db answers (asset deployed in this sandbox)
    if (db.isDefined) {
      assert(Timezone.lookupZone(35.69, 51.39).getId === "Asia/Tehran") // not in the bbox table at all
      assert(Timezone.lookupZone(46.842, -91.994).getId === "America/Chicago") // the ExifSpec fixture
    }
    // far outside every polygon and bbox → UTC
    assert(Timezone.lookupZone(0.0, -30.0).normalized.getId === "Z" ||
      Timezone.lookupZone(0.0, -30.0).getId === "Z")
  }

  test("polygon decode is memoized (second lookup hits the cache)") {
    db match {
      case None => cancel("timezone21 asset not deployed")
      case Some(d) =>
        val a = d.lookup(51.5, -0.12)
        val n = d.cachedPolygons
        assert(n > 0, "first lookup should populate the polygon cache")
        val b = d.lookup(51.5, -0.12) // identical point: candidate set unchanged
        assert(d.cachedPolygons == n, "repeated lookup must not decode new polygons")
        assert(a == b, "cached path returns the same zones")
    }
  }

  test("corrupt input: bad magic and truncated sections are named errors") {
    intercept[IllegalArgumentException](ZoneDetect.parse("nope".getBytes ++ new Array[Byte](100)))
    db.foreach { d =>
      intercept[IllegalArgumentException](ZoneDetect.parse(d.bytes.take(2000))) // sizes won't reach EOF
    }
  }
}
