package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Ddb, Sqlite}

/** The .ddb index-database face: reference schema fidelity
  * (`database.cpp:36-91`), spatialite geometry blobs, and the
  * user_version migration ladder (`database.cpp:109-204`). */
class DdbSpec extends AnyFunSuite {

  private def sampleEntries = Seq(
    Ddb.Entry("a.jpg", "h1", 3L, """{"width":640}""", 1700000000L, 1234L, 1L,
      pointGeom = Some((-91.99, 46.84, 198.5))),
    Ddb.Entry("sub/b.tif", "h2", 5L, """{"bands":4}""", 1700000100L, 99999L, 2L,
      polygonGeom = Some(Seq((-92.0, 46.8, 0.0), (-91.9, 46.8, 0.0), (-91.9, 46.9, 0.0), (-92.0, 46.8, 0.0)))),
    Ddb.Entry("sub", null, 1L, null, 1700000200L, 0L, 1L)
  )

  test("writes and reads the reference schema round-trip, geometry included") {
    val meta = Seq(Ddb.Meta(Ddb.deterministicUuid("m1"), "a.jpg", "annotations", """[{"x":1}]""", 1700000300L))
    val db = Ddb.write(sampleEntries, meta, passwords = Seq(("s1", "ph1")))
    assert(Sqlite.userVersion(db) == Ddb.SchemaVersion)
    val got = Ddb.readEntries(db)
    assert(got.map(_.path) == sampleEntries.map(_.path).sorted)
    val a = got.find(_.path == "a.jpg").get
    assert(a.hash == "h1" && a.typ == 3L && a.properties == """{"width":640}""")
    assert(a.pointGeom.contains((-91.99, 46.84, 198.5)))
    val b = got.find(_.path == "sub/b.tif").get
    assert(b.polygonGeom.get.length == 4 && b.polygonGeom.get.head == ((-92.0, 46.8, 0.0)))
    val sub = got.find(_.path == "sub").get
    assert(sub.hash == null && sub.pointGeom.isEmpty && sub.polygonGeom.isEmpty)
    assert(Ddb.readMeta(db) == meta)
    assert(Ddb.readPasswords(db) == Seq(("s1", "ph1")))
  }

  test("catalog carries the reference's indexes and the autouuid trigger") {
    val db = Ddb.write(sampleEntries)
    val m = Sqlite.master(db)
    assert(m.collect { case Sqlite.Master("table", n, _, _, _) => n }.toSet ==
      Set("entries", "passwords", "entries_meta"))
    assert(m.collect { case Sqlite.Master("index", n, _, _, _) => n }.toSet ==
      Set("sqlite_autoindex_entries_1", "sqlite_autoindex_entries_meta_1",
        "ix_entries_type", "ix_entries_hash", "ix_entries_meta_path_key", "ix_entries_meta_key"))
    val trg = m.find(_.typ == "trigger").get
    assert(trg.name == "tg_entries_meta_autouuid" && trg.sql.contains("randomblob(4)"))
    // index walks agree with the table
    val byHash = Sqlite.readIndex(db, "ix_entries_hash")
    assert(byHash.length == sampleEntries.length)
    assert(byHash.flatMap(e => Option(e.head)).map(_.asInstanceOf[String]).toSet == Set("h1", "h2"))
  }

  test("ensureSchemaConsistency: current version is a no-op, newer version is a named error") {
    val db = Ddb.write(sampleEntries)
    assert(Ddb.ensureSchemaConsistency(db) eq db)
    // stamp a future version
    val future = db.clone()
    future(60) = 0; future(61) = 0; future(62) = 0; future(63) = 9
    val err = intercept[IllegalStateException](Ddb.ensureSchemaConsistency(future))
    assert(err.getMessage.contains("schema version 9") && err.getMessage.contains("supported version 1"))
  }

  test("legacy v0 migration: meta->properties rename, attributes.public -> visibility meta") {
    val legacy = Ddb.writeLegacyV0(sampleEntries, attributes = Seq(("public", 1L), ("other", 5L)))
    assert(Sqlite.userVersion(legacy) == 0)
    assert(Sqlite.tables(legacy).contains("attributes"))
    assert(Sqlite.tables(legacy)("entries").columns.exists(_.name == "meta"))

    // the legacy DB carries the redundant single-column path index the
    // migration must drop (schema_migration_test.cpp semantics)
    assert(Sqlite.master(legacy).exists(m => m.typ == "index" && m.name == "ix_entries_meta_path"))

    val migrated = Ddb.ensureSchemaConsistency(legacy, nowMtime = 1700009999L)
    assert(Sqlite.userVersion(migrated) == Ddb.SchemaVersion)
    assert(!Sqlite.tables(migrated).contains("attributes"))
    val idxNames = Sqlite.master(migrated).collect { case Sqlite.Master("index", n, _, _, _) => n }.toSet
    assert(!idxNames.contains("ix_entries_meta_path"), "redundant path index must be dropped")
    assert(idxNames.contains("ix_entries_meta_path_key") && idxNames.contains("ix_entries_meta_key"))
    val cols = Sqlite.tables(migrated)("entries").columns.map(_.name)
    assert(cols.contains("properties") && !cols.contains("meta"))
    // entries preserved, properties carried over from the old meta column
    val got = Ddb.readEntries(migrated)
    assert(got.map(_.path) == sampleEntries.map(_.path).sorted)
    assert(got.find(_.path == "a.jpg").get.properties == """{"width":640}""")
    assert(got.find(_.path == "a.jpg").get.pointGeom.contains((-91.99, 46.84, 198.5)))
    // visibility ported
    val vis = Ddb.readMeta(migrated).filter(m => m.path == "" && m.key == "visibility")
    assert(vis.length == 1 && vis.head.data == "1" && vis.head.mtime == 1700009999L)
  }

  test("legacy v0 with public=0 or no attributes table ports no visibility") {
    val noPub = Ddb.ensureSchemaConsistency(Ddb.writeLegacyV0(sampleEntries, attributes = Seq(("public", 0L))))
    assert(!Ddb.readMeta(noPub).exists(_.key == "visibility"))
    assert(Sqlite.userVersion(noPub) == Ddb.SchemaVersion)
    // already-visible meta is not duplicated
    val withVis = Ddb.writeLegacyV0(
      sampleEntries, attributes = Seq(("public", 1L)),
      meta = Seq(Ddb.Meta("fixed-id", "", "visibility", "2", 5L)))
    val kept = Ddb.readMeta(Ddb.ensureSchemaConsistency(withVis)).filter(_.key == "visibility")
    assert(kept == Seq(Ddb.Meta("fixed-id", "", "visibility", "2", 5L)))
  }

  test("deterministicUuid has the trigger's uuid4 shape and is stable") {
    val u = Ddb.deterministicUuid("visibility")
    assert(u.matches("[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-a[0-9a-f]{3}-[0-9a-f]{12}"))
    assert(u == Ddb.deterministicUuid("visibility"))
    assert(u != Ddb.deterministicUuid("other"))
  }
}
