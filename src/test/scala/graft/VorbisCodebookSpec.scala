package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Vorbis codebook header parse paths the subset encoder never emits —
  * ordered length lists, sparse length lists, lookup type 2 and
  * sequence_p — driven by hand-built setup bitstreams and checked
  * against the spec's value-vector formulas computed by hand. */
class VorbisCodebookSpec extends AnyFunSuite {

  private def ilog(x0: Int): Int = { var x = x0; var n = 0; while (x > 0) { n += 1; x >>= 1 }; n }

  private def mkBook(f: Vorbis.BW => Unit): Vorbis.Codebook = {
    val bw = new Vorbis.BW
    bw.bits(0x564342, 24)
    f(bw)
    Vorbis.readCodebook(new Vorbis.BR(bw.result()))
  }

  test("ordered length list: over-subscribed codes are a named refusal at build") {
    // 8 entries: lengths 2,2,2,3,3,4,4,4 — Kraft 3/4+1/4+3/16 > 1, so
    // the tree assignment must run out of leaves and refuse
    val e = intercept[IllegalArgumentException](mkBook { bw =>
      bw.bits(1, 16) // dims
      bw.bits(8, 24) // entries
      bw.bits(1, 1) // ordered
      bw.bits(2 - 1, 5) // initial length 2
      bw.bits(3, ilog(8)) // three entries at len 2
      bw.bits(2, ilog(5)) // two at len 3
      bw.bits(3, ilog(3)) // three at len 4
      bw.bits(0, 4) // lookup 0
    })
    assert(e.getMessage.contains("overspecified"))
  }

  test("ordered length list: a complete ascending code decodes round-trip") {
    // complete: lengths 1,2,3,3 (Kraft = 1/2+1/4+1/8+1/8 = 1)
    val cb = mkBook { bw =>
      bw.bits(1, 16)
      bw.bits(4, 24)
      bw.bits(1, 1)
      bw.bits(1 - 1, 5) // start at length 1
      bw.bits(1, ilog(4)) // one at len 1
      bw.bits(1, ilog(3)) // one at len 2
      bw.bits(2, ilog(2)) // two at len 3
      bw.bits(0, 4)
    }
    assert(cb.lengths.toList == List(1, 2, 3, 3))
    // canonical-by-entry assignment: 0, 10, 110, 111
    assert(cb.codeword(0) == (0, 1) && cb.codeword(1) == (2, 2))
    assert(cb.codeword(2) == (6, 3) && cb.codeword(3) == (7, 3))
    for (e <- 0 until 4) {
      val bw = new Vorbis.BW
      val (c, l) = cb.codeword(e)
      bw.code(c, l)
      bw.bits(0, 8) // slack so BR never hits EOF mid-walk
      assert(cb.decode(new Vorbis.BR(bw.result())) == e)
    }
  }

  test("sparse length list: flagged entries only; unused entries take no codeword") {
    val cb = mkBook { bw =>
      bw.bits(1, 16)
      bw.bits(6, 24)
      bw.bits(0, 1) // unordered
      bw.bits(1, 1) // sparse
      // entries 0,2,5 used at lengths 1,2,2; 1,3,4 unused
      Seq(Some(1), None, Some(2), None, None, Some(2)).foreach {
        case Some(l) => bw.bits(1, 1); bw.bits(l - 1, 5)
        case None => bw.bits(0, 1)
      }
      bw.bits(0, 4)
    }
    assert(cb.lengths.toList == List(1, 0, 2, 0, 0, 2))
    assert(cb.codeword(0) == (0, 1) && cb.codeword(2) == (2, 2) && cb.codeword(5) == (3, 2))
    val bw = new Vorbis.BW
    bw.code(3, 2); bw.code(0, 1); bw.code(2, 2); bw.bits(0, 8)
    val br = new Vorbis.BR(bw.result())
    assert(cb.decode(br) == 5 && cb.decode(br) == 0 && cb.decode(br) == 2)
  }

  test("lookup type 2: per-entry multiplicand rows, hand-computed values") {
    // dims 2, entries 2, lookup2: multiplicands laid out entry-major —
    // entry e, dim d uses mult[e*dims+d]; value = mult·delta + min
    val cb = mkBook { bw =>
      bw.bits(2, 16)
      bw.bits(2, 24)
      bw.bits(0, 1); bw.bits(0, 1) // unordered, dense
      bw.bits(0, 5); bw.bits(0, 5) // both entries length 1
      bw.bits(2, 4) // lookup type 2
      bw.bits(Vorbis.float32Pack(-4.0), 32) // min
      bw.bits(Vorbis.float32Pack(2.0), 32) // delta
      bw.bits(3 - 1, 4) // value_bits 3
      bw.bits(0, 1) // no sequence
      Seq(0, 1, 2, 3).foreach(m => bw.bits(m, 3)) // entry0: (0,1) entry1: (2,3)
    }
    assert(cb.vq(0).toList == List(-4.0, -2.0)) // 0·2−4, 1·2−4
    assert(cb.vq(1).toList == List(0.0, 2.0)) // 2·2−4, 3·2−4
  }

  test("sequence_p: each dimension accumulates onto the previous value") {
    val cb = mkBook { bw =>
      bw.bits(3, 16) // dims 3
      bw.bits(1, 24) // one entry (zero-bit codeword)
      bw.bits(0, 1); bw.bits(0, 1)
      bw.bits(0, 5) // length 1
      bw.bits(2, 4) // lookup 2
      bw.bits(Vorbis.float32Pack(1.0), 32) // min
      bw.bits(Vorbis.float32Pack(1.0), 32) // delta
      bw.bits(2 - 1, 4) // value_bits 2
      bw.bits(1, 1) // sequence_p SET
      Seq(1, 2, 3).foreach(m => bw.bits(m, 2))
    }
    // v0 = 1·1+1 = 2; v1 = 2+1 + v0 = 5; v2 = 3+1 + v1 = 9
    assert(cb.vq(0).toList == List(2.0, 5.0, 9.0))
  }

  test("lookup type 1: component indices are radix digits of the entry number") {
    val cb = mkBook { bw =>
      bw.bits(2, 16) // dims 2
      bw.bits(9, 24) // 3^2 entries
      bw.bits(0, 1); bw.bits(0, 1)
      (0 until 9).foreach(_ => bw.bits(4 - 1, 5)) // flat 4-bit (9/16 — incomplete but parsed)
      bw.bits(1, 4)
      bw.bits(Vorbis.float32Pack(0.0), 32)
      bw.bits(Vorbis.float32Pack(1.0), 32)
      bw.bits(2 - 1, 4) // value_bits 2
      bw.bits(0, 1)
      Seq(0, 1, 2).foreach(m => bw.bits(m, 2)) // lookup1_values(9,2)=3
    }
    // entry e: d0 = e%3, d1 = (e/3)%3
    assert(cb.vq(5).toList == List(2.0, 1.0)) // 5%3=2, 5/3=1
    assert(cb.vq(7).toList == List(1.0, 2.0))
  }

  test("codebook sync loss is a named refusal") {
    val bw = new Vorbis.BW
    bw.bits(0x123456, 24)
    val e = intercept[IllegalArgumentException](Vorbis.readCodebook(new Vorbis.BR(bw.result())))
    assert(e.getMessage.contains("sync"))
  }
}
