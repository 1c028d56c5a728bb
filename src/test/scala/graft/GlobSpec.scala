package graft

import graft.sources.Ingest

/** expandGlobPatterns against the `tests/glob_test.cpp:78-186`
  * matrix: literals, star patterns, `**` recursion incl. top level,
  * bare-directory walks, .ddb skipping, error and dedup rules. */
class GlobSpec extends SparkSuite {

  private def sandbox(files: String*): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("globsb")
    files.foreach { f =>
      val p = dir.resolve(f)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, "x")
    }
    dir
  }

  private def names(out: Seq[String]): Set[String] =
    out.map(p => java.nio.file.Paths.get(p).getFileName.toString).toSet

  test("literal file passes through absolute; missing literal throws") {
    val sb = sandbox("a.JPG")
    val out = Ingest.expandGlobPatterns(sb.toString, Seq("a.JPG"))
    assert(out.size === 1)
    assert(java.nio.file.Paths.get(out.head).isAbsolute)
    assert(names(out) === Set("a.JPG"))
    intercept[java.io.FileNotFoundException](Ingest.expandGlobPatterns(sb.toString, Seq("nope.txt")))
  }

  test("simple star pattern matches only the extension") {
    val sb = sandbox("a.JPG", "b.JPG", "readme.txt")
    val out = Ingest.expandGlobPatterns(sb.toString, Seq("*.JPG"))
    assert(names(out) === Set("a.JPG", "b.JPG"))
  }

  test("recursive double star includes the TOP level (glob_test RecursiveDoubleStar)") {
    val sb = sandbox("a.JPG", "nested/b.JPG", "nested/deep/c.JPG", "nested/skip.txt")
    val out = Ingest.expandGlobPatterns(sb.toString, Seq("**/*.JPG"))
    assert(names(out) === Set("a.JPG", "b.JPG", "c.JPG"))
  }

  test("bare directory walks recursively") {
    val sb = sandbox("images/a.JPG", "images/sub/b.JPG")
    val out = Ingest.expandGlobPatterns(sb.toString, Seq("images"))
    assert(names(out) === Set("a.JPG", "b.JPG"))
  }

  test(".ddb entries never surface, in directory walks or glob matches") {
    val sb = sandbox("images/a.JPG", "images/sub/b.JPG", ".ddb/index.db", ".ddb/build/something.json")
    val outDir = Ingest.expandGlobPatterns(sb.toString, Seq("."))
    assert(outDir.nonEmpty && outDir.forall(!_.contains(".ddb")))
    val outGlob = Ingest.expandGlobPatterns(sb.toString, Seq("**/*"))
    assert(outGlob.nonEmpty && outGlob.forall(!_.contains(".ddb")))
    // literal paths under .ddb are skipped too (the contract covers
    // every branch); skipping them all means "no files matched"
    intercept[java.io.FileNotFoundException](
      Ingest.expandGlobPatterns(sb.toString, Seq(".ddb/index.db")))
  }

  test("no match throws; empty pattern throws; dedup across patterns") {
    val sb = sandbox("a.JPG")
    intercept[java.io.FileNotFoundException](Ingest.expandGlobPatterns(sb.toString, Seq("*.NOPE")))
    intercept[IllegalArgumentException](Ingest.expandGlobPatterns(sb.toString, Seq("")))
    assert(Ingest.expandGlobPatterns(sb.toString, Seq("*.JPG", "a.JPG")).size === 1)
  }
}
