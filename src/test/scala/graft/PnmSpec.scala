package graft

import graft.raster.Pnm

/** Netpbm codec: binary round-trips, ASCII variants with comments,
  * maxval rescale, refusals, media-pipeline routing. */
class PnmSpec extends SparkSuite {

  test("binary PGM/PPM round-trip; ASCII P2/P3 with comments decode; maxval rescales") {
    val gray = Array.tabulate(20 * 10)(i => (i * 7 % 256).toByte)
    val g = Pnm.decode(Pnm.encode(20, 10, 1, gray)).getOrElse(fail("pgm"))
    assert(g.width == 20 && g.height == 10 && g.channels == 1 && g.pixels.toSeq == gray.toSeq)

    val rgb = Array.tabulate(7 * 5 * 3)(i => (i * 11 % 256).toByte)
    val c = Pnm.decode(Pnm.encode(7, 5, 3, rgb)).getOrElse(fail("ppm"))
    assert(c.channels == 3 && c.pixels.toSeq == rgb.toSeq)

    val ascii = "P2\n# a comment\n3 2\n255\n0 128 255\n1 2 3\n".getBytes("US-ASCII")
    val a = Pnm.decode(ascii).getOrElse(fail("p2"))
    assert(a.width == 3 && a.height == 2)
    assert(a.pixels.map(_ & 0xff).toSeq == Seq(0, 128, 255, 1, 2, 3))

    val scaled = "P2\n2 1\n15\n0 15\n".getBytes // maxval 15 → 0 and 255
    assert(Pnm.decode(scaled).get.pixels.map(_ & 0xff).toSeq == Seq(0, 255))
  }

  test("refusals and routing") {
    assert(Pnm.decode("P7\nnope".getBytes).isEmpty) // PAM out of scope
    assert(Pnm.decode("P5\n4 4\n65535\n".getBytes).isEmpty) // 16-bit out of scope
    assert(Pnm.decode("P5\n4 4\n255\nxy".getBytes).isEmpty) // truncated
    assert(Pnm.decode(Array[Byte](1, 2, 3)).isEmpty)
    val gray = Array.tabulate(16)(_.toByte)
    assert(graft.multimodal.Multimodal.decodeImage(Pnm.encode(4, 4, 1, gray)).exists(_.width == 4))
  }
}
