package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Paths

/** io::Path algebra — the fs_test + utils_test behavior matrices. */
class PathsSpec extends AnyFunSuite {

  test("hasDotNotation: . and .. SEGMENTS only (utils_test)") {
    assert(!Paths.hasDotNotation("ciao/ciao"))
    assert(!Paths.hasDotNotation("/ciao/"))
    assert(!Paths.hasDotNotation("ciao/.a/a/tutti"))
    assert(Paths.hasDotNotation("ciao/./ciao"))
    assert(Paths.hasDotNotation("./ciao/./ciao"))
    assert(Paths.hasDotNotation("ciao/../ciao"))
    assert(Paths.hasDotNotation("../ciao/.a./ciao"))
  }

  test("pathHasChildren: descent with dot-resolution, equality counts, no false prefix match") {
    assert(Paths.hasChildren("/my/path", Seq("/my/path/1", "/my/path/a/b/..")))
    assert(Paths.hasChildren("path", Seq("path/1/2", "path/3", "path/././6")))
    assert(Paths.hasChildren("path/./", Seq("path/1/2", "path/3/", "path/./6/7/../")))
    assert(Paths.hasChildren("path/./", Seq("path/./../path/a/")))
    assert(Paths.hasChildren("path/./.", Seq("path/./../path/b")))
    // equality (issue #453)
    assert(Paths.hasChildren("path", Seq("path/3", "path/a/..")))
    assert(Paths.hasChildren("path", Seq("path")))
    assert(Paths.hasChildren("path", Seq("path/.")))
    assert(Paths.hasChildren(".", Seq(".")))
    // rejections
    assert(!Paths.hasChildren("/my/path", Seq("/my/pat", "/my/path/1")))
    assert(!Paths.hasChildren("/foo", Seq("/foobar")))
    assert(!Paths.hasChildren("/foo", Seq("/foo/ok", "/foobar/bad")))
  }

  test("pathIsParentOf: strict descent after normalization") {
    assert(Paths.isParentOf("/data/drone", "/data/drone/a"))
    assert(!Paths.isParentOf("/data/drone", "/data/drone/"))
    assert(!Paths.isParentOf("/data/drone", "/data/drone"))
    assert(!Paths.isParentOf("/data/drone/", "/data/drone"))
    assert(Paths.isParentOf("data/drone", "data/drone/123"))
    assert(!Paths.isParentOf("data/drone", "data/drone/123/.."))
    assert(!Paths.isParentOf("data/drone", "data/drone/123/./../"))
    assert(!Paths.isParentOf("data/drone", "data/drone/123/./../.."))
    assert(Paths.isParentOf("data/drone/a/..", "data/drone/123"))
  }

  test("relativeTo and withoutRoot") {
    assert(Paths.relativeTo("/home/test/aaa", "/home/test") == "aaa")
    assert(Paths.relativeTo("/home/test/aaa", "/") == "home/test/aaa")
    assert(Paths.relativeTo("/home/test/aaa/bbb/ccc/../..", "/home") == "test/aaa")
    assert(Paths.relativeTo("/home/test/aaa/", "/home") == "test/aaa")
    assert(intercept[IllegalArgumentException](Paths.relativeTo("/a/b", "/c")).getMessage.contains("not under"))
    assert(Paths.withoutRoot("/test/abc") == "test/abc")
    assert(Paths.withoutRoot("../abc") == "../abc")
  }

  test("commonDirPath (fs_test matrix)") {
    assert(Paths.commonDirPath(Seq("/test/123", "/test/abc")) == "/test")
    assert(Paths.commonDirPath(Seq("/test/123", "/test2/abc")) == "/")
    assert(Paths.commonDirPath(Seq("test/123", "test2/abc")) == "")
    assert(Paths.commonDirPath(Seq("test/123", "test/abc")) == "test")
    assert(Paths.commonDirPath(Seq("test/123")) == "test/123")
    assert(Paths.commonDirPath(Seq.empty) == "")
    assert(Paths.commonDirPath(Seq("abc/abc/test.txt", "abc", "def")) == "")
    assert(Paths.commonDirPath(Seq("abc/abc/test.txt", "abc/abc/test2.txt")) == "abc/abc")
    assert(Paths.commonDirPath(Seq("/abc")) == "/abc")
  }

  test("normalize keeps leading .. on relative paths and clamps /.. at the root") {
    assert(Paths.normalize("../abc") == "../abc")
    assert(Paths.normalize("a/../../b") == "../b")
    assert(Paths.normalize("/a/../../b") == "/b")
    assert(Paths.normalize("a/b/./c/..") == "a/b")
    assert(Paths.normalize("/") == "/")
  }
}
