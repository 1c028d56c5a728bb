package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sqlite

/** SQLite file-format writer/reader conformance.
  *
  * Two directions: (1) files written by [[Sqlite.build]] round-trip
  * through this library's reader (b-trees, overflow, indexes,
  * user_version); (2) a REAL sqlite3-generated database (test
  * resource `conformance.sqlite`, written by a stock SQLite 3.40 —
  * multi-level table + index trees, an overflow row, NULLs in every
  * type position, negative ints, explicit rowids with gaps, a
  * trigger) reads back row-identical to the values recorded at
  * generation time. */
class SqliteSpec extends AnyFunSuite {

  private def bytesOf(a: Any): Array[Byte] = a.asInstanceOf[Array[Byte]]

  test("round-trips a mixed-type table with nulls, negatives, doubles, blobs") {
    val ddl = "CREATE TABLE t (a TEXT, b INTEGER, c REAL, d BLOB, e TEXT)"
    val rows = Seq(
      Seq[Any]("alpha", 0L, 1.5, Array[Byte](1, 2, 3), null),
      Seq[Any]("beta", 1L, -2.25, null, "x"),
      Seq[Any](null, -129L, 0.0, Array.emptyByteArray, "y"),
      Seq[Any]("delta", 3000000000L, -1.0e-300, Array[Byte](-1, 0, 127), ""),
      Seq[Any]("eps", Long.MinValue + 1, Double.MaxValue, null, "z")
    )
    val db = Sqlite.build(Seq(Sqlite.TableSpec("t", ddl, rows)), userVersion = 42, applicationId = 0x47464c54)
    assert(Sqlite.userVersion(db) == 42)
    assert(new Sqlite.Db(db).applicationId == 0x47464c54)
    val (_, got) = Sqlite.readTable(db, "t")
    assert(got.length == rows.length)
    rows.zip(got).foreach { case (exp, act) =>
      exp.zip(act).foreach {
        case (e: Array[Byte], a) => assert(java.util.Arrays.equals(e, bytesOf(a)))
        case (e, a) => assert(a == e)
      }
    }
  }

  test("spills large payloads to overflow chains and reads them back") {
    val big = "payload-" * 1200 // 9600 chars, > one page
    val blob = Array.tabulate[Byte](5000)(i => (i * 31).toByte)
    val db = Sqlite.build(Seq(Sqlite.TableSpec("o", "CREATE TABLE o (s TEXT, b BLOB)", Seq(Seq[Any](big, blob)))))
    val (_, got) = Sqlite.readTable(db, "o")
    assert(got.head(0) == big)
    assert(java.util.Arrays.equals(bytesOf(got.head(1)), blob))
  }

  test("builds and reads multi-level table b-trees in rowid order") {
    val rows = (0 until 20000).map(i => Seq[Any](s"row-$i-${"pad" * (i % 7)}", i.toLong * 13))
    val db = Sqlite.build(Seq(Sqlite.TableSpec("big", "CREATE TABLE big (s TEXT, v INTEGER)", rows)))
    val root = Sqlite.tables(db)("big").rootPage
    assert((db((root - 1) * 4096) & 0xff) == 0x05, "expected an interior root for 20k rows")
    val (_, got) = Sqlite.readTable(db, "big")
    assert(got.length == rows.length)
    assert(got.map(_(1).asInstanceOf[Long]) == rows.map(_(1)))
  }

  test("INTEGER PRIMARY KEY column materializes the rowid (gaps, large ids)") {
    val rows = Seq(Seq[Any](5L, "a"), Seq[Any](1000L, "b"), Seq[Any](999999999999L, "c"))
    val db = Sqlite.build(Seq(Sqlite.TableSpec("k", "CREATE TABLE k (id INTEGER PRIMARY KEY, s TEXT)", rows)))
    val (_, got) = Sqlite.readTable(db, "k")
    assert(got.map(r => (r(0), r(1))) == Seq((5L, "a"), (1000L, "b"), (999999999999L, "c")))
    assert(Sqlite.readTableWithRowids(db, "k").map(_._1) == Seq(5L, 1000L, 999999999999L))
  }

  test("auto-index and named index b-trees hold every (key, rowid) pair in key order") {
    val rows = (0 until 300).map(i => Seq[Any](f"p-${(i * 7919) % 1000}%04d-$i", (i % 5).toLong))
    val db = Sqlite.build(
      Seq(Sqlite.TableSpec("t", "CREATE TABLE t (path TEXT PRIMARY KEY, typ INTEGER)", rows,
        withAutoIndex = Some(Seq(0)))),
      indexSpecs = Seq(Sqlite.IndexSpec("ix_typ", "t", "CREATE INDEX ix_typ ON t (typ)", Seq(1)))
    )
    val auto = Sqlite.readIndex(db, "sqlite_autoindex_t_1")
    assert(auto.length == rows.length)
    assert(auto.map(_.head.asInstanceOf[String]) == rows.map(_.head.asInstanceOf[String]).sorted)
    val byTyp = Sqlite.readIndex(db, "ix_typ")
    assert(byTyp.length == rows.length)
    assert(byTyp.sliding(2).forall {
      case Seq(a, b) => Sqlite.compareKeys(a, b) < 0
      case _ => true
    })
    // every (key, rowid) pair corresponds to a table row
    val table = Sqlite.readTableWithRowids(db, "t").map { case (rid, vals) => (vals(1), rid) }.toSet
    assert(byTyp.map(e => (e(0), e(1))).toSet == table)
  }

  test("multi-level index b-tree walks sorted and complete") {
    val rows = (0 until 20000).map(i => Seq[Any](f"key-${(i * 104729) % 100000}%06d", i.toLong))
    val db = Sqlite.build(
      Seq(Sqlite.TableSpec("t", "CREATE TABLE t (k TEXT, v INTEGER)", rows)),
      indexSpecs = Seq(Sqlite.IndexSpec("ix_k", "t", "CREATE INDEX ix_k ON t (k)", Seq(0)))
    )
    val rootPage = Sqlite.master(db).find(_.name == "ix_k").get.rootPage
    assert((db((rootPage - 1) * 4096) & 0xff) == 0x02, "expected an interior index root for 20k entries")
    val got = Sqlite.readIndex(db, "ix_k")
    assert(got.length == rows.length)
    assert(got.map(_.head.asInstanceOf[String]) == rows.map(_.head.asInstanceOf[String]).sorted)
    assert(got.map(e => (e(0), e(1))).toSet == rows.zipWithIndex.map { case (r, i) => (r(0), (i + 1).toLong) }.toSet)
  }

  test("empty tables and databases with several objects are well-formed") {
    val db = Sqlite.build(
      Seq(
        Sqlite.TableSpec("a", "CREATE TABLE a (x TEXT)", Seq.empty),
        Sqlite.TableSpec("b", "CREATE TABLE b (y INTEGER)", Seq(Seq[Any](7L)))
      ),
      triggerSpecs = Seq(Sqlite.TriggerSpec("tr", "b", "CREATE TRIGGER tr AFTER INSERT ON b BEGIN SELECT 1; END"))
    )
    assert(Sqlite.readTable(db, "a")._2.isEmpty)
    assert(Sqlite.readTable(db, "b")._2 == Seq(Seq(7L)))
    val m = Sqlite.master(db)
    assert(m.map(_.typ).count(_ == "trigger") == 1)
    assert(m.find(_.typ == "trigger").get.rootPage == 0)
  }

  // ---- conformance against a REAL sqlite3-written database -----------

  private lazy val real: Array[Byte] = {
    val in = getClass.getResourceAsStream("/conformance.sqlite")
    try in.readAllBytes()
    finally in.close()
  }

  test("reads a stock-sqlite3 database: catalog, user_version, typed rows") {
    assert(Sqlite.userVersion(real) == 7)
    val names = Sqlite.master(real).map(m => (m.typ, m.name)).toSet
    assert(names == Set(
      ("table", "kinds"), ("table", "seq"),
      ("index", "sqlite_autoindex_kinds_1"), ("index", "ix_kinds_type"), ("index", "ix_kinds_hash_type"),
      ("trigger", "tg_demo")
    ))
    val (_, kinds) = Sqlite.readTable(real, "kinds")
    assert(kinds.length == 500)
    // per-column non-null counts recorded at generation time
    assert(kinds.count(_(1) != null) == 494)
    assert(kinds.count(_(3) != null) == 483)
    assert(kinds.count(_(4) != null) == 400)
    assert(kinds.count(_(5) != null) == 334)
    assert(kinds.map(r => r(2).asInstanceOf[Long]).sum == -6L)
    assert(math.abs(kinds.flatMap(r => Option(r(3)).map(_.asInstanceOf[Double])).sum - -3272469.542) < 0.01)
    assert(kinds.flatMap(r => Option(r(4)).map(bytesOf(_).length.toLong)).sum == 7840L)
    val overflowRow = kinds.find(_(0) == "data/d2/f0123.bin").get
    assert(overflowRow(5).asInstanceOf[String] == "x" * 9000)
  }

  test("reads stock-sqlite3 multi-level trees with explicit rowids") {
    val seq = Sqlite.readTableWithRowids(real, "seq")
    assert(seq.length == 6000)
    assert(seq.head._1 == 5L && seq.last._1 == 5861028L)
    assert(seq.map(_._2(1).asInstanceOf[Long]).sum == -7699000L)
    assert(seq.map(_._1) == seq.map(_._1).sorted)
  }

  test("walks stock-sqlite3 index b-trees in key order") {
    val byType = Sqlite.readIndex(real, "ix_kinds_type")
    assert(byType.length == 500)
    assert(byType.sliding(2).forall {
      case Seq(a, b) => Sqlite.compareKeys(a, b) <= 0
      case _ => true
    })
    val auto = Sqlite.readIndex(real, "sqlite_autoindex_kinds_1")
    assert(auto.length == 500)
    assert(auto.map(_.head.asInstanceOf[String]) ==
      Sqlite.readTable(real, "kinds")._2.map(_(0).asInstanceOf[String]).sorted)
    val composite = Sqlite.readIndex(real, "ix_kinds_hash_type")
    assert(composite.length == 500)
  }
}
