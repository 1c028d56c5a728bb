package graft

import graft.multimodal.Mp3

/** MP3 metadata probe: frame-header walk over structurally valid
  * synthetic streams (the layout real encoders emit), ID3v2 skip,
  * Xing/VBR frame-count override, false-sync guard, refusals.
  */
class Mp3Spec extends SparkSuite {

  test("CBR stream: frame count, duration, rate, channels from the header walk") {
    // MPEG-1 Layer III, 128 kbps, 44100 Hz, stereo: 1152 samples/frame
    val mp3 = Mp3.syntheticCbr(50, mpeg1 = true, brIdx = 9, srIdx = 0)
    val m = Mp3.sniff(mp3).getOrElse(fail("probe refused a valid stream"))
    assert(m.frames == 50 && m.sampleRate == 44100 && m.channels == 2)
    assert(m.avgBitrateKbps == 128 && !m.vbr)
    assert(m.durationMs == 50L * 1152 * 1000 / 44100, s"duration ${m.durationMs}")

    // MPEG-2: 576 samples per frame, the low-rate table
    val m2 = Mp3.sniff(Mp3.syntheticCbr(40, mpeg1 = false, brIdx = 9, srIdx = 1, stereo = false)).get
    assert(m2.sampleRate == 24000 && m2.channels == 1 && m2.frames == 40)
  }

  test("ID3v2 tags are skipped (syncsafe size), including appended junk tolerance") {
    val mp3 = Mp3.syntheticCbr(20)
    val tagBody = new Array[Byte](300)
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0) ++
      Array[Byte](0, 0, (300 >> 7).toByte, (300 & 0x7f).toByte) ++ tagBody
    val m = Mp3.sniff(id3 ++ mp3).getOrElse(fail("ID3v2 skip failed"))
    assert(m.frames == 20 && m.id3v2Bytes == 310)
    // trailing ID3v1 tag (128 bytes of 'TAG...') ends the walk cleanly
    val withV1 = mp3 ++ ("TAG" + "x" * 125).getBytes("US-ASCII")
    assert(Mp3.sniff(withV1).get.frames == 20)
  }

  test("Xing/Info at the canonical side-info offset: Xing=VBR override, Info=LAME CBR, spoof ignored") {
    val mp3 = Mp3.syntheticCbr(30)
    def splice(tag: String, at: Int): Array[Byte] = {
      val x = mp3.clone()
      tag.getBytes.copyToArray(x, at)
      x(at + 4) = 0; x(at + 5) = 0; x(at + 6) = 0; x(at + 7) = 1
      x(at + 8) = 0; x(at + 9) = 0; x(at + 10) = 0; x(at + 11) = 120
      x
    }
    val canonical = 4 + 32 // MPEG-1 stereo side-info
    val m = Mp3.sniff(splice("Xing", canonical)).get
    assert(m.frames == 120 && m.vbr)
    assert(m.durationMs == 120L * 1152 * 1000 / 44100)
    // LAME's Info tag carries the frame count but marks CBR
    val info = Mp3.sniff(splice("Info", canonical)).get
    assert(info.frames == 120 && !info.vbr, "Info is a CBR stamp")
    // a 'Xing' string in ordinary payload bytes (wrong offset) must not override
    val spoofed = Mp3.sniff(splice("Xing", canonical + 8)).get
    assert(spoofed.frames == 30 && !spoofed.vbr, "payload spoof must be ignored")
  }

  test("refusals and false-sync guard") {
    assert(Mp3.sniff(null).isEmpty)
    assert(Mp3.sniff(new Array[Byte](64)).isEmpty)
    assert(Mp3.sniff(Array.fill[Byte](4096)(0x55)).isEmpty)
    // a lone 0xFFFB sync with garbage after it (next header invalid) is not accepted
    val fake = new Array[Byte](4096)
    fake(100) = 0xFF.toByte; fake(101) = 0xFB.toByte; fake(102) = 0x90.toByte
    assert(Mp3.sniff(fake).isEmpty, "false sync must be rejected")
  }
}
