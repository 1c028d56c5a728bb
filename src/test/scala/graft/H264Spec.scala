package graft

import graft.multimodal.{H264, Mp4Mux}

/** H.264 I_PCM-subset + MP4 mux/demux conformance: Annex-B
  * round-trips, emulation-prevention edge cases, SPS geometry with
  * cropping, container sample-table walks, and the interop triangle
  * with the existing header-only Mp4.sniff (our muxed file must look
  * like a video to it). Named refusals document the boundary:
  * predictively-coded macroblocks are out of the subset.
  */
class H264Spec extends SparkSuite {

  private def frame(w: Int, h: Int, seed: Int): H264.Frame = {
    val y = Array.tabulate(w * h)(i => ((i * 31 + seed) % 256).toByte)
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val cb = Array.tabulate(cw * ch)(i => ((i * 7 + seed) % 256).toByte)
    val cr = Array.tabulate(cw * ch)(i => ((i * 13 + seed * 3) % 256).toByte)
    H264.Frame(w, h, y, cb, cr)
  }

  test("emulation prevention: escape/unescape is the identity, and 0x000001 never appears in a NAL") {
    val adversarial = Array[Byte](0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 3, 0, 0, 0, 1, 2, 3) ++
      Array.tabulate(200)(i => (i % 5 - 2).toByte)
    val esc = H264.escapeRbsp(adversarial)
    assert(H264.unescapeRbsp(esc, 0, esc.length).toSeq == adversarial.toSeq)
    // no start-code emulation inside the escaped payload
    (0 until esc.length - 2).foreach { i =>
      assert(!(esc(i) == 0 && esc(i + 1) == 0 && (esc(i + 2) & 0xff) <= 1),
        s"start-code emulation at $i")
    }
  }

  test("Annex-B round-trip: frames survive encode→decode exactly, multiple of 16 and cropped sizes") {
    for ((w, h) <- Seq((16, 16), (64, 48), (34, 18), (50, 38))) {
      val fs = Seq(frame(w, h, 1), frame(w, h, 2), frame(w, h, 3))
      val dec = H264.decodeAnnexB(H264.encodeAnnexB(fs))
      assert(dec.length == 3, s"($w,$h): frame count")
      fs.zip(dec).foreach { case (a, b) =>
        assert(b.width == w && b.height == h, s"($w,$h) dims")
        assert(b.y.toSeq == a.y.toSeq, s"($w,$h) luma")
        assert(b.cb.toSeq == a.cb.toSeq && b.cr.toSeq == a.cr.toSeq, s"($w,$h) chroma")
      }
    }
  }

  test("SPS: parse recovers geometry incl. crop; our SPS is baseline with POC type 2") {
    val sps = H264.parseSps(H264.spsRbsp(34, 18))
    assert(sps.width == 34 && sps.height == 18)
    assert(sps.mbW == 3 && sps.mbH == 2)
    assert(sps.pocType == 2)
    val full = H264.parseSps(H264.spsRbsp(64, 32))
    assert(full.width == 64 && full.height == 32 && full.cropR == 0 && full.cropB == 0)
  }

  test("MP4 mux → demux → decode: sample tables walk back to the same frames; Mp4.sniff sees the video") {
    val w = 48; val h = 32
    val fs = Seq(frame(w, h, 9), frame(w, h, 10))
    val spsNal = Array(0x67.toByte) ++ H264.escapeRbsp(H264.spsRbsp(w, h))
    val ppsNal = Array(0x68.toByte) ++ H264.escapeRbsp(H264.ppsRbsp())
    val sliceNals = fs.zipWithIndex.map { case (f, i) =>
      Array(0x65.toByte) ++ H264.escapeRbsp(H264.idrSliceRbsp(w, h, f, i % 2))
    }
    val mp4 = Mp4Mux.mux(w, h, spsNal, ppsNal, sliceNals, timescale = 30, sampleDelta = 3)
    // the demux→decode loop reproduces the frames
    val dec = Mp4Mux.decodeFrames(mp4)
    assert(dec.length == 2)
    fs.zip(dec).foreach { case (a, b) =>
      assert(b.y.toSeq == a.y.toSeq && b.cb.toSeq == a.cb.toSeq && b.cr.toSeq == a.cr.toSeq)
    }
    // the header-only sniffer agrees on dimensions and duration (2 samples × 3/30 s = 200 ms)
    val meta = graft.sources.Mp4.sniff(mp4).getOrElse(fail("Mp4.sniff rejected our mux"))
    assert(meta.width == w && meta.height == h)
    assert(meta.durationMs == 200, s"duration ${meta.durationMs}")
    // demuxed track carries the parameter sets verbatim
    val t = Mp4Mux.demux(mp4).get
    assert(t.sps.toSeq == spsNal.toSeq && t.pps.toSeq == ppsNal.toSeq)
  }

  test("named refusals: coded macroblocks, CABAC, P-slices, truncation") {
    val fs = Seq(frame(32, 32, 5))
    val ok = H264.encodeAnnexB(fs)
    // truncated stream
    intercept[Exception](H264.decodeAnnexB(ok.take(ok.length / 2)))
    // odd dimensions refused at encode (4:2:0 crop units)
    intercept[IllegalArgumentException](H264.encodeAnnexB(Seq(frame(33, 32, 1))))
    // a CABAC PPS is refused by name
    val cabacPps = {
      val spsNal = Array(0x67.toByte) ++ H264.escapeRbsp(H264.spsRbsp(32, 32))
      val pps = H264.ppsRbsp().clone()
      // entropy_coding_mode is the bit right after two ue(0)s = bits 0..1; flip bit 2
      pps(0) = (pps(0) | 0x20).toByte
      Array[Byte](0, 0, 0, 1) ++ spsNal ++ Array[Byte](0, 0, 0, 1, 0x68) ++ H264.escapeRbsp(pps) ++
        ok.dropWhile(_ != 0x65.toByte)
    }
    val e = intercept[Exception](H264.decodeAnnexB(cabacPps))
    assert(e.getMessage.contains("CABAC"), e.getMessage)
  }
}
