package graft

import graft.sources.{Exif, SensorData}

/** Sensor-width database + extractSensorSize cascade against the
  * reference's REAL shipped asset (`data/sensor_data.sqlite`, built
  * from the public OpenSfM/AliceVision sensor tables) — a real-world
  * conformance fixture for the pure-JVM SQLite reader and the
  * `sensor_data.cpp` / `exif.cpp:142-258` semantics. */
class SensorDataSpec extends SparkSuite {

  private def realDb: Option[Map[String, Double]] =
    SensorData.resolved.map { case (_, bytes) => SensorData.load(bytes) }

  test("shipped sensor_data.sqlite parses and matches the embedded subset") {
    realDb match {
      case None => cancel("sensor_data.sqlite asset not deployed")
      case Some(db) =>
        // create_sensor_data.py merges OpenSfM + AliceVision + ddb JSON
        assert(db.size > 7000, s"expected the full merged table, got ${db.size}")
        // every fallback literal must match the file bit-for-bit —
        // the q_sensor_focal oracle inlines these same values
        SensorData.fallback.foreach { case (id, w) =>
          assert(db.get(id) === Some(w), s"sensor $id")
        }
        // spot checks across the alphabet (first/last-ish rows)
        assert(db("acer ce-5330") === 5.75)
        // the ddb_sensor_data.json entries override/extend
        assert(db.contains("dji fc6310"))
    }
  }

  test("extractSensor: lowercase, make deduped from model, trimmed (exif.cpp:142-165)") {
    assert(SensorData.extractSensor(Some("DJI"), Some("FC6310")) === "dji fc6310")
    // duplicate make inside model is removed, however often it occurs
    assert(SensorData.extractSensor(Some("DJI"), Some("DJI FC6310")) === "dji fc6310")
    assert(SensorData.extractSensor(Some("Hasselblad"), Some("L1D-20c")) === "hasselblad l1d-20c")
    assert(SensorData.extractSensor(None, Some("FC300S")) === "unknown fc300s")
    assert(SensorData.extractSensor(Some("Canon"), None) === "canon unknown")
    // whitespace left by the removal trims away
    assert(SensorData.extractSensor(Some("GoPro"), Some("  GoPro HERO4 Silver ")) === "gopro hero4 silver")
  }

  test("mmPerUnit matches getMmPerUnit (exif.cpp:236-258)") {
    assert(SensorData.mmPerUnit(2) === 25.4)
    assert(SensorData.mmPerUnit(3) === 10.0)
    assert(SensorData.mmPerUnit(4) === 1.0)
    assert(SensorData.mmPerUnit(5) === 0.001)
    assert(SensorData.mmPerUnit(1) === 0.0)
    assert(SensorData.mmPerUnit(99) === 0.0)
  }

  test("sensorSizeMm cascade: focal-plane tags win, db second, None last") {
    // focal-plane path: 4000 px at 4000 px/inch = 1 inch = 25.4 mm
    val withPlane = Exif.empty.copy(
      make = Some("DJI"), model = Some("FC6310"),
      focalPlaneResolutionUnit = Some(2),
      focalPlaneXResolution = Some(4000.0),
      focalPlaneYResolution = Some(3000.0)
    )
    val (w, h) = SensorData.sensorSizeMm(withPlane, 4000, 3000).get
    assert(math.abs(w - 25.4) < 1e-9)
    assert(math.abs(h - 25.4) < 1e-9)
    // db path: known sensor, height scaled by aspect (exif.cpp:225-229)
    val dbOnly = Exif.empty.copy(make = Some("DJI"), model = Some("FC6310"))
    val (w2, h2) = SensorData.sensorSizeMm(dbOnly, 4000, 3000).get
    assert(w2 === 13.2)
    assert(math.abs(h2 - 13.2 / 4000 * 3000) < 1e-12)
    // unknown unit falls through to the db, not to garbage
    val badUnit = withPlane.copy(focalPlaneResolutionUnit = Some(7))
    assert(SensorData.sensorSizeMm(badUnit, 4000, 3000).get._1 === 13.2)
    // nothing known → None
    assert(SensorData.sensorSizeMm(Exif.empty, 4000, 3000).isEmpty)
  }

  test("q_sensor_focal: fleet join over sf0.001 resolves widths and focal math") {
    val df = SensorData.sensorFocalQuery(spark, "/root/testdata/sf0.001")
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.nonEmpty)
    // every emitted width must be the database value
    rows.foreach { case (id, r) =>
      assert(r.getDouble(r.fieldIndex("width_mm")) === SensorData.getFocal(id).get)
    }
    // plan shape: the dim side must broadcast (no shuffle for a 12-row dim)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
