package graft.core

/** Path algebra — the reference's `io::Path` semantics family
  * (`fs.cpp`; behavior matrix in `tests/fs_test.cpp` +
  * `utils_test.cpp` hasDotNotation): lexical normalization of `.` /
  * `..` segments, containment with the "a path equal to the parent is
  * contained" rule (issue #453 — `ddb add .` from the project root),
  * segment-boundary prefix checks (no /foo ⊃ /foobar false match),
  * relative paths, root stripping and the common directory prefix.
  * These guard every index mutation's path arguments. */
object Paths {

  /** Lexical `.`/`..` resolution; keeps leading `..` on relative
    * paths, preserves absoluteness, drops trailing slashes. */
  def normalize(path: String): String = {
    val p = path.replace('\\', '/')
    val abs = p.startsWith("/")
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    p.split("/").filter(s => s.nonEmpty && s != ".").foreach {
      case ".." if out.nonEmpty && out.last != ".." => out.remove(out.length - 1)
      case ".." if abs => () // /.. stays at the root
      case seg => out += seg
    }
    (if (abs) "/" else "") + out.mkString("/")
  }

  /** utils::hasDotNotation: any RAW `.` or `..` segment (dot-prefixed
    * names like `.a` do not count). */
  def hasDotNotation(path: String): Boolean =
    path.replace('\\', '/').split("/", -1).exists(s => s == "." || s == "..")

  private def segments(path: String): Seq[String] = {
    val n = normalize(path)
    if (n == "/" || n.isEmpty) Seq.empty
    else n.stripPrefix("/").split("/").toSeq
  }

  /** STRICT containment: child normalizes to a proper descendant. */
  def isParentOf(parent: String, child: String): Boolean = {
    val p = normalize(parent)
    val c = normalize(child)
    if (p.startsWith("/") != c.startsWith("/")) return false
    val ps = segments(p)
    val cs = segments(c)
    cs.length > ps.length && cs.take(ps.length) == ps
  }

  /** hasChildren: every path is the parent itself or a descendant
    * (equality counts — issue #453), on segment boundaries. */
  def hasChildren(parent: String, paths: Seq[String]): Boolean =
    paths.forall(p => normalize(p) == normalize(parent) || isParentOf(parent, p))

  /** relativeTo: normalized `path` with the normalized `base` prefix
    * removed (fs_test pathRelativeTo). */
  def relativeTo(path: String, base: String): String = {
    val ps = segments(path)
    val bs = segments(base)
    require(ps.take(bs.length) == bs, s"'$path' is not under '$base'")
    ps.drop(bs.length).mkString("/")
  }

  /** withoutRoot: strip the leading root of an absolute path; relative
    * paths (incl. leading ..) pass through. */
  def withoutRoot(path: String): String = {
    val p = path.replace('\\', '/')
    if (p.startsWith("/")) p.stripPrefix("/") else p
  }

  /** io::commonDirPath: one path → itself; several → the common
    * segment prefix of their PARENT directories ("/" for absolute
    * paths with nothing else in common, "" for relative ones). */
  def commonDirPath(paths: Seq[String]): String = {
    if (paths.isEmpty) return ""
    if (paths.length == 1) return normalize(paths.head)
    val abs = paths.head.replace('\\', '/').startsWith("/")
    if (paths.exists(p => p.replace('\\', '/').startsWith("/") != abs)) return ""
    val dirs = paths.map(p => segments(p).dropRight(1))
    val common = dirs.reduce { (a, b) =>
      a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1)
    }
    if (common.isEmpty) { if (abs) "/" else "" }
    else (if (abs) "/" else "") + common.mkString("/")
  }
}
