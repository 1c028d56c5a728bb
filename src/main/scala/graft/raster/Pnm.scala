package graft.raster

/** Netpbm stills (PGM P2/P5 gray, PPM P3/P6 color, 8-bit) — the
  * interchange format vision tooling dumps; trivial but real, both
  * directions, routed through the same byte-plane Image as every
  * other still codec. ASCII (P2/P3) and binary (P5/P6) variants,
  * comment lines, maxval ≤ 255.
  */
object Pnm {

  def decode(b: Array[Byte]): Option[Png.Image] =
    try decode0(b)
    catch { case _: Exception => None }

  private def decode0(b: Array[Byte]): Option[Png.Image] = {
    if (b == null || b.length < 7 || b(0) != 'P') return None
    val kind = b(1) - '0'
    if (kind != 2 && kind != 3 && kind != 5 && kind != 6) return None
    var pos = 2
    def isWs(c: Byte): Boolean = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    def token(): Int = {
      // skip whitespace and # comments
      var go = true
      while (go) {
        while (pos < b.length && isWs(b(pos))) pos += 1
        if (pos < b.length && b(pos) == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else go = false
      }
      var v = 0
      val start = pos
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') { v = v * 10 + (b(pos) - '0'); pos += 1 }
      require(pos > start, "pnm: missing numeric token")
      v
    }
    val w = token(); val h = token(); val maxval = token()
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 26), "pnm: bad dimensions")
    require(maxval >= 1 && maxval <= 255, "pnm: only 8-bit maxval supported")
    val ch = if (kind == 2 || kind == 5) 1 else 3
    val n = w * h * ch
    val px = new Array[Byte](n)
    if (kind == 5 || kind == 6) {
      pos += 1 // exactly one whitespace after maxval
      require(pos + n <= b.length, "pnm: truncated raster")
      System.arraycopy(b, pos, px, 0, n)
    } else {
      var i = 0
      while (i < n) { px(i) = token().toByte; i += 1 }
    }
    // scale up if maxval < 255 (rare; nearest scaling)
    if (maxval != 255) {
      var i = 0
      while (i < n) { px(i) = ((px(i) & 0xff) * 255 / maxval).toByte; i += 1 }
    }
    Some(Png.Image(w, h, ch, px))
  }

  /** Binary PGM (1 channel) or PPM (3 channels). */
  def encode(w: Int, h: Int, channels: Int, px: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3, "pnm: 1 or 3 channels")
    require(px.length == w * h * channels, "pnm: pixel buffer size")
    val head = (if (channels == 1) "P5" else "P6") + s"\n$w $h\n255\n"
    head.getBytes("US-ASCII") ++ px
  }
}
