package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Ogg container probe (Vorbis + Opus) — page walk with the Ogg
  * CRC-32 (poly 0x04C11DB7, unreflected, init/xor 0), codec
  * identification headers, and duration from the stream's final
  * granule position. Metadata only, like [[Mp3]] — codec synthesis
  * is out of scope and documented. `writePage` emits valid pages so
  * the spec's fixtures carry real checksums.
  */
object Ogg {

  final case class Meta(
      codec: String, // "vorbis" | "opus"
      durationMs: Long,
      sampleRate: Int,
      channels: Int,
      pages: Int
  )

  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) { r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1; k += 1 }
      t(i) = r
      i += 1
    }
    t
  }

  def crc(b: Array[Byte], from: Int, until: Int): Int = {
    var r = 0
    var i = from
    while (i < until) { r = (r << 8) ^ crcTable(((r >>> 24) ^ (b(i) & 0xff)) & 0xff); i += 1 }
    r
  }

  /** One Ogg page: header + segment table + payload. `granule` is the
    * absolute granule position, `htype` bit0=continued, 1=BOS, 2=EOS. */
  def writePage(serial: Int, seq: Int, granule: Long, htype: Int, packet: Array[Byte]): Array[Byte] = {
    require(packet.length < 255 * 255, "ogg: packet too large for one page")
    val nseg = packet.length / 255 + 1
    val out = new ArrayBuffer[Byte](27 + nseg + packet.length)
    out ++= "OggS".getBytes("US-ASCII")
    out += 0 // version
    out += htype.toByte
    (0 until 8).foreach(k => out += (granule >> (8 * k)).toByte)
    (0 until 4).foreach(k => out += (serial >> (8 * k)).toByte)
    (0 until 4).foreach(k => out += (seq >> (8 * k)).toByte)
    (0 until 4).foreach(_ => out += 0) // crc placeholder
    out += nseg.toByte
    var rem = packet.length
    (0 until nseg).foreach { _ => out += math.min(rem, 255).toByte; rem -= math.min(rem, 255) }
    out ++= packet
    val arr = out.toArray
    val c = crc(arr, 0, arr.length)
    (0 until 4).foreach(k => arr(22 + k) = (c >> (8 * k)).toByte)
    arr
  }

  /** Probe: walk pages, identify the codec from the BOS packet,
    * verify each page's CRC, and derive duration from the largest
    * granule position. None for non-Ogg payloads. */
  def sniff(b: Array[Byte]): Option[Meta] =
    try sniff0(b)
    catch { case _: Exception => None }

  private def sniff0(b: Array[Byte]): Option[Meta] = {
    if (b == null || b.length < 27 || !(b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S')) return None
    var pos = 0
    var codec: String = null
    var rate = 0
    var channels = 0
    var preSkip = 0
    var pages = 0
    var lastGranule = 0L
    def finish(): Option[Meta] = {
      if (codec == null || rate <= 0 || pages == 0) None
      else {
        val samples = math.max(lastGranule - preSkip, 0L)
        Some(Meta(codec, samples * 1000 / rate, rate, channels, pages))
      }
    }
    while (pos + 27 <= b.length) {
      if (!(b(pos) == 'O' && b(pos + 1) == 'g' && b(pos + 2) == 'g' && b(pos + 3) == 'S')) return finish()
      var granule = 0L
      (0 until 8).foreach(k => granule |= (b(pos + 6 + k) & 0xffL) << (8 * k))
      var stored = 0
      (0 until 4).foreach(k => stored |= (b(pos + 22 + k) & 0xff) << (8 * k))
      val nseg = b(pos + 26) & 0xff
      if (pos + 27 + nseg > b.length) return finish()
      var bodyLen = 0
      (0 until nseg).foreach(k => bodyLen += b(pos + 27 + k) & 0xff)
      val pageEnd = pos + 27 + nseg + bodyLen
      if (pageEnd > b.length) return finish()
      // CRC check with the checksum field zeroed
      val copy = java.util.Arrays.copyOfRange(b, pos, pageEnd)
      copy(22) = 0; copy(23) = 0; copy(24) = 0; copy(25) = 0
      if (crc(copy, 0, copy.length) != stored) return finish()
      pages += 1
      if (granule >= 0) lastGranule = math.max(lastGranule, granule)
      if (codec == null) {
        val body = pos + 27 + nseg
        if (bodyLen >= 30 && b(body) == 1 && new String(b, body + 1, 6, "US-ASCII") == "vorbis") {
          codec = "vorbis"
          channels = b(body + 11) & 0xff
          (0 until 4).foreach(k => rate |= (b(body + 12 + k) & 0xff) << (8 * k))
        } else if (bodyLen >= 19 && new String(b, body, 8, "US-ASCII") == "OpusHead") {
          codec = "opus"
          channels = b(body + 9) & 0xff
          preSkip = (b(body + 10) & 0xff) | ((b(body + 11) & 0xff) << 8)
          rate = 48000 // Opus granules are always at 48 kHz
        }
      }
      pos = pageEnd
    }
    finish()
  }
}
