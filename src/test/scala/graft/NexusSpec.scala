package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Nexus
import graft.sources.Nexus.Level

/** Nexus `.nxs` multiresolution container: byte-level layout
  * (little-endian header, 256-byte node alignment, sink node closing
  * the patch ranges), exact geometry round-trips, the u16 node split,
  * and named refusals for the out-of-subset faces. */
class NexusSpec extends AnyFunSuite {

  private def lattice(n: Int): (Array[Float], Array[Int]) = {
    val pos = new Array[Float](n * 3)
    var i = 0
    while (i < n) {
      pos(3 * i) = (i % 17).toFloat
      pos(3 * i + 1) = (i * 3 % 23).toFloat
      pos(3 * i + 2) = (i * 7 % 11).toFloat
      i += 1
    }
    val nt = n / 3
    val idx = Array.tabulate(nt * 3)(identity)
    (pos, idx)
  }

  test("two-level pyramid round-trips exactly; header and layout invariants hold") {
    val (finePos, fineIdx) = lattice(300)
    val (coarsePos, coarseIdx) = lattice(60)
    val levels = Seq(Level(4.0f, coarsePos, coarseIdx), Level(0f, finePos, fineIdx))
    val bytes = Nexus.write(levels)
    assert(Nexus.isNxs(bytes))
    val m = Nexus.read(bytes)
    assert(m.nvert == 360 && m.nface == 120)
    assert(m.nodes.length == 3) // coarse + fine + sink
    assert(m.patches.length == 2)
    // coarse node patches to the fine node; fine node patches to the sink
    assert(m.patches(m.nodes(0).firstPatch).node == 1)
    assert(m.patches(m.nodes(1).firstPatch).node == 2)
    assert(m.nodes(2).nvert == 0 && m.nodes(2).nface == 0 && m.nodes(2).error == 0f)
    // sink's first_patch closes the last range
    assert(m.nodes(2).firstPatch == 2)
    // geometry byte-exact
    assert(m.geometry(0)._1.sameElements(coarsePos) && m.geometry(0)._2.sameElements(coarseIdx))
    assert(m.geometry(1)._1.sameElements(finePos) && m.geometry(1)._2.sameElements(fineIdx))
    // node data offsets are 256-byte aligned (stored in 256-byte units)
    m.nodes.foreach(n => assert(n.offsetUnits * 256 % 256 == 0))
    assert(m.nodes(0).offsetUnits * 256 >= 88L + 3 * 44 + 2 * 12)
    // errors carried per level, coarse first
    assert(m.nodes(0).error == 4.0f && m.nodes(1).error == 0f)
    // bounding spheres contain their node's vertices
    m.geometry.zip(m.nodes).foreach { case ((pos, _), n) =>
      var i = 0
      while (i < pos.length) {
        val dx = pos(i) - n.sphere._1; val dy = pos(i + 1) - n.sphere._2; val dz = pos(i + 2) - n.sphere._3
        assert(math.sqrt(dx * dx + dy * dy + dz * dz) <= n.sphere._4 + 1e-3)
        i += 3
      }
    }
  }

  test("a level wider than 65535 vertices splits into multiple u16-indexed nodes") {
    val n = 70000
    val pos = new Array[Float](n * 3)
    var i = 0
    while (i < n) { pos(3 * i) = i.toFloat; pos(3 * i + 1) = (i % 97).toFloat; i += 1 }
    val idx = Array.tabulate((n / 3) * 3)(identity)
    val m = Nexus.read(Nexus.write(Seq(Level(1f, pos, idx))))
    assert(m.nodes.length >= 3) // ≥2 split nodes + sink
    // every node's indices stay inside its own vertex range (checked by
    // read), and the split preserves the triangle multiset by position
    val got = m.geometry.flatMap { case (p, ix) =>
      ix.grouped(3).map(t => t.map(c => (p(3 * c), p(3 * c + 1), p(3 * c + 2))).toSeq)
    }.toSet
    val want = idx.grouped(3).map(t => t.map(c => (pos(3 * c), pos(3 * c + 1), pos(3 * c + 2))).toSeq).toSet
    assert(got == want)
    assert(m.geometry.map(_._2.length / 3).sum == n / 3)
  }

  test("named refusals: bad magic, compressed flag, foreign signatures") {
    assert(!Nexus.isNxs("not a nexus file".getBytes))
    intercept[IllegalArgumentException](Nexus.read("garbage!".getBytes))
    val (p, ix) = lattice(30)
    val good = Nexus.write(Seq(Level(0f, p, ix)))
    val compressed = good.clone()
    compressed(56) = 1 // flags (MECO/corto) — header offset 4+4+8+8+32
    val e = intercept[IllegalArgumentException](Nexus.read(compressed))
    assert(e.getMessage.contains("corto") || e.getMessage.contains("compressed"))
    val badSig = good.clone()
    badSig(24) = 9 // vertex attribute type
    intercept[IllegalArgumentException](Nexus.read(badSig))
  }
}
