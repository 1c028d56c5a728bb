package graft

import graft.sources.Npy
import org.scalatest.funsuite.AnyFunSuite

/** NumPy format conformance against committed REAL numpy 1.26
  * fixtures (tools/gen_npy_fixtures.py — dtype × byte-order ×
  * memory-order × header-version matrix; values recomputed from the
  * generator's formulas), plus byte-exact writer pins: our .npy
  * writer must produce numpy's exact bytes for the same content. */
class NpySpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/npy/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes()
    finally in.close()
  }

  private def load(name: String): Npy.NpyArray = Npy.decode(fixture(name + ".npy"))

  test("integer/bool/unsigned dtypes decode to the generator formulas") {
    val n = 17
    val b1 = load("b1"); val i1 = load("i1"); val i2 = load("i2")
    val i4 = load("i4"); val i8 = load("i8")
    val u1 = load("u1"); val u2 = load("u2"); val u4 = load("u4")
    assert(b1.header.descr == "|b1" && i8.header.descr == "<i8")
    for (i <- 0 until n) {
      assert(b1.boolAt(i) == (i % 3 == 0))
      assert(i1.longAt(i) == Math.floorMod(i * 7 - 20, 256) - 128)
      assert(i2.longAt(i) == i * 1001 - 4000)
      assert(i4.longAt(i) == i * 100000 - 350000)
      assert(i8.longAt(i) == i.toLong * 123456789L - 400000000L)
      assert(u1.longAt(i) == (i * 29) % 256)
      assert(u2.longAt(i) == (i * 7001) % 65536)
      assert(u4.longAt(i) == (i.toLong * 900000007L) % 4294967296L)
    }
  }

  test("float dtypes (f2/f4/f8) and big-endian variants decode exactly") {
    val n = 17
    val f2 = load("f2"); val f4 = load("f4"); val f8 = load("f8")
    val bi = load("be_i4"); val bf = load("be_f8")
    assert(bi.header.descr == ">i4" && bf.header.descr == ">f8")
    for (i <- 0 until n) {
      assert(f2.doubleAt(i) == i * 0.25 - 2.0) // exact at half precision in this range
      assert(f4.doubleAt(i) == (i * 1.5f - 3.0f).toDouble)
      assert(f8.doubleAt(i) == i * 2.25 - 9.0)
      assert(bi.longAt(i) == i * 100000 - 350000)
      assert(bf.doubleAt(i) == i * 2.25 - 9.0)
    }
  }

  test("fixed-width strings: |S6 bytes and <U5 UCS-4") {
    val s6 = load("s6"); val u5 = load("u5")
    for (i <- 0 until 17) {
      assert(s6.stringAt(i) == s"s${i}x")
      assert(u5.stringAt(i) == s"ü$i")
    }
  }

  test("Fortran order reads equal C order through the stride transpose (2-D and 3-D)") {
    val c2 = load("c2d"); val f2 = load("f2d")
    assert(!c2.header.fortran && f2.header.fortran)
    assert(c2.header.shape == Seq(4, 5) && f2.header.shape == Seq(4, 5))
    for (k <- 0 until 20) {
      assert(c2.doubleAt(k) == k * 3.0 - 7.0)
      assert(f2.doubleAt(k) == k * 3.0 - 7.0, s"fortran 2d drift at $k")
    }
    val c3 = load("c3d"); val f3 = load("f3d")
    assert(f3.header.fortran && f3.header.shape == Seq(2, 3, 4))
    for (k <- 0 until 24) {
      assert(c3.longAt(k) == k * 11 - 50)
      assert(f3.longAt(k) == k * 11 - 50, s"fortran 3d drift at $k")
    }
  }

  test("header versions 2 and 3 (u32 length) parse; 0-length and 0-d arrays work") {
    for (v <- Seq("v2", "v3")) {
      val a = load(v)
      for (i <- 0 until 17) assert(a.longAt(i) == i * 5 - 8)
    }
    assert(load("len0").n == 0)
    val sc = load("scalar")
    assert(sc.header.shape.isEmpty && sc.n == 1 && sc.doubleAt(0) == 42.5)
  }

  test("npz: numpy savez (stored) and savez_compressed (deflate) through the ZIP walk") {
    for (name <- Seq("arch_stored.npz", "arch_deflate.npz")) {
      val arrays = Npy.npzEntries(fixture(name))
      assert(arrays.keySet == Set("ids", "emb"), s"$name members: ${arrays.keySet}")
      val ids = arrays("ids"); val emb = arrays("emb")
      assert(ids.header.shape == Seq(30) && emb.header.shape == Seq(30, 8))
      for (i <- 0 until 30) assert(ids.longAt(i) == i * 13L + 5)
      for (k <- 0 until 240) assert(emb.doubleAt(k) == (k * 0.5f - 10f).toDouble, s"$name emb[$k]")
    }
  }

  test("writer pins: our .npy bytes are byte-identical to numpy's for the same content") {
    val n = 17
    val i8 = Npy.fromLongs(Array.tabulate(n)(i => i.toLong * 123456789L - 400000000L), Seq(n))
    assert(java.util.Arrays.equals(i8, fixture("i8.npy")), "int64 writer drift vs numpy")
    val f4 = Npy.fromFloats(Array.tabulate(n)(i => i * 1.5f - 3.0f), Seq(n))
    assert(java.util.Arrays.equals(f4, fixture("f4.npy")), "float32 writer drift vs numpy")
    val f8 = Npy.fromDoubles(Array.tabulate(n)(i => i * 2.25 - 9.0), Seq(n))
    assert(java.util.Arrays.equals(f8, fixture("f8.npy")), "float64 writer drift vs numpy")
    // 2-D: same layout rule (no trailing comma in the shape tuple)
    val c2d = Npy.fromDoubles(Array.tabulate(20)(k => k * 3.0 - 7.0), Seq(4, 5))
    assert(java.util.Arrays.equals(c2d, fixture("c2d.npy")), "2-D writer drift vs numpy")
  }

  test("hostility: malformed input raises NpyError, never raw errors") {
    def mustFail(b: Array[Byte], what: String): Unit =
      try { Npy.decode(b); fail(s"$what: decoded silently") }
      catch {
        case _: Npy.NpyError => ()
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case e: Throwable => fail(s"$what: escaped as ${e.getClass.getName}: ${e.getMessage}")
      }
    mustFail(Array.emptyByteArray, "empty")
    mustFail("not numpy at all....".getBytes, "bad magic")
    mustFail(fixture("i8.npy").take(40), "truncated data")
    val objHeader = {
      val dict = "{'descr': '|O', 'fortran_order': False, 'shape': (2,), }"
      val pad = (64 - (10 + dict.length + 1) % 64) % 64
      val h = dict + (" " * pad) + "\n"
      Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0, (h.length & 0xff).toByte, (h.length >> 8).toByte) ++
        h.getBytes ++ Array[Byte](1, 2)
    }
    mustFail(objHeader, "object (pickle) array")
    val rnd = new scala.util.Random(42)
    val base = fixture("arch_deflate.npz")
    for (_ <- 0 until 300) {
      val b = base.clone()
      b(rnd.nextInt(b.length)) = (rnd.nextInt(256)).toByte
      // contract: container-layer failures surface as NpyError too
      try { Npy.npzEntries(b); () }
      catch {
        case _: Npy.NpyError => ()
        case e: Throwable => fail(s"npz mutation escaped as ${e.getClass.getName}: ${e.getMessage}")
      }
      val t = java.util.Arrays.copyOfRange(base, 0, rnd.nextInt(base.length))
      try { Npy.npzEntries(t); () }
      catch {
        case _: Npy.NpyError => ()
        case e: Throwable => fail(s"npz truncation escaped as ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }
}
