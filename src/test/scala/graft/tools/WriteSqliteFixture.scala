package graft.tools

import graft.sources.Sqlite

/** Dev tool (test scope): write SQLite databases that stress the
  * index-tree divider-spill path — index keys over ~1 KB force
  * multi-level index b-trees whose promoted dividers carry overflow
  * chains. Run, then `PRAGMA integrity_check` in stock sqlite3:
  *
  *   sbt "Test/runMain graft.tools.WriteSqliteFixture /tmp/big_index.db"
  *   python3 -c "import sqlite3; print(sqlite3.connect('/tmp/big_index.db').execute('PRAGMA integrity_check').fetchall())"
  *
  * Before the r12 lazy-spill fix this produced 'page never used'
  * orphans; after it the check must return [('ok',)].
  */
object WriteSqliteFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/big_index.db")
    // 400 rows with ~1.6 KB text keys: leaves spill, dividers promote
    // through at least one interior level, re-spilling each divider
    val rows = (0 until 400).map { i =>
      val key = f"k$i%05d-" + ("x" * (1200 + (i % 7) * 173))
      Seq[Any](i.toLong, key, (i * 31 % 997).toLong)
    }
    val bytes = Sqlite.build(
      tableSpecs = Seq(Sqlite.TableSpec(
        "docs",
        "CREATE TABLE docs (id INTEGER PRIMARY KEY, body TEXT, score INTEGER)",
        rows
      )),
      indexSpecs = Seq(Sqlite.IndexSpec(
        "idx_docs_body", "docs",
        "CREATE INDEX idx_docs_body ON docs (body)", Seq(1)
      ))
    )
    java.nio.file.Files.write(java.nio.file.Paths.get(out), bytes)
    println(s"wrote $out (${bytes.length} bytes)")
  }
}
