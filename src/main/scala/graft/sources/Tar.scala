package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tar (POSIX ustar + pax long names) split-scan — the WebDataset
  * access path. Multimodal LLM training data overwhelmingly ships as
  * tar "shards" of grouped sample files (`000123.jpg` + `000123.txt`
  * + `000123.json` — the WebDataset convention: a sample is the run
  * of entries sharing the basename up to the first dot), consumed
  * sequentially. This gives those shards the WARC treatment: tar
  * entry headers are 512-aligned with a checksummed magic, so a task
  * can locate entry boundaries from ANY byte offset — the driver
  * plans plain byte ranges from metadata only, each task owns the
  * entries whose header starts in its range, and samples regroup by
  * key afterwards (samples that straddle a split boundary meet again
  * in the shuffle). No central index, no coordination: the shape that
  * scans a 100-TB shard set.
  *
  * Format per the POSIX ustar spec (+ the pax `x` extended header for
  * long paths, which Python's tarfile — the writer behind most
  * WebDataset shards — emits): 512-byte header blocks with octal
  * fields, checksum over the header with the checksum field blanked,
  * `ustar` magic at +257, data padded to 512. GNU base-256 size
  * encoding is accepted; GNU `L` longname entries are handled like
  * pax path overrides. A candidate header found mid-payload (planted
  * magic + valid checksum) is rejected by chain validation: the
  * implied next-header positions must themselves parse (TarSpec
  * plants one).
  */
object Tar {

  final class TarError(msg: String) extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw new TarError(msg)

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** One archive entry. `offset` = header position in the container. */
  final case class Entry(offset: Long, name: String, size: Long, typeflag: Char, data: Array[Byte])

  // ------------------------------------------------------------------
  // header parse
  // ------------------------------------------------------------------

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && b(end) != 0) end += 1
    new String(b, off, end - off, Utf8)
  }

  /** Octal number field; GNU base-256 when the top bit of byte 0 is set. */
  private def num(b: Array[Byte], off: Int, len: Int): Long = {
    if ((b(off) & 0x80) != 0) {
      var v = (b(off) & 0x7f).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
      v
    } else {
      var v = 0L
      var i = off
      val max = off + len
      while (i < max && (b(i) == ' ' || b(i) == 0)) i += 1
      while (i < max && b(i) >= '0' && b(i) <= '7') { v = (v << 3) + (b(i) - '0'); i += 1 }
      v
    }
  }

  /** Validate a 512-byte header at `off`: magic + stored checksum. */
  def isHeader(b: Array[Byte], off: Int): Boolean = {
    if (off + 512 > b.length) return false
    // magic: "ustar\0" (POSIX) or "ustar " (old GNU)
    if (!(b(off + 257) == 'u' && b(off + 258) == 's' && b(off + 259) == 't' &&
        b(off + 260) == 'a' && b(off + 261) == 'r')) return false
    val stored = num(b, off + 148, 8)
    var sum = 0L
    var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) ' '.toInt else b(off + i) & 0xff)
      i += 1
    }
    sum == stored
  }

  private def isZeroBlock(b: Array[Byte], off: Int): Boolean = {
    if (off + 512 > b.length) return false
    var i = 0
    while (i < 512) { if (b(off + i) != 0) return false; i += 1 }
    true
  }

  /** Parse pax `x` extended-header records ("<len> key=value\n"). */
  private def paxRecords(data: Array[Byte]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var p = 0
    while (p < data.length) {
      var q = p
      while (q < data.length && data(q) != ' ') q += 1
      val len = new String(data, p, q - p, Ascii).trim.toIntOption.getOrElse(return out.result())
      if (len <= 0 || p + len > data.length) return out.result()
      val rec = new String(data, q + 1, p + len - q - 2, Utf8) // strip trailing \n
      val eq = rec.indexOf('=')
      if (eq > 0) out += rec.substring(0, eq) -> rec.substring(eq + 1)
      p += len
    }
    out.result()
  }

  /** pax/`L` records precede their data entry by at most this many
    * bytes in any realistic shard (they carry a path, not content);
    * the scan backs up this far so a name record in the PREVIOUS
    * split still applies to a data entry owned by this one. */
  val PaxBackWindow: Long = 16384L

  /** Entries whose data HEADER starts in [start, end) — the
    * split-ownership rule (every entry belongs to exactly one split).
    * The scan begins at the first 512-aligned chain-validated header
    * at/after `start - PaxBackWindow` and walks forward, so pax `x` /
    * GNU `L` name overrides straddling the boundary still resolve;
    * entries whose header lies before `start` are walked but not
    * emitted. A planted candidate whose implied chain breaks — or
    * whose "terminator" is not the spec's TWO zero blocks — is
    * skipped.
    *
    * Known limitation — NESTED archives: a STORED `.tar` payload inside
    * an entry is itself chain-valid (it IS a tar stream), so a split
    * landing inside the outer entry's data can anchor on the inner
    * archive and emit its entries as top-level, while the split owning
    * the outer header also emits the outer entry — duplicate/ghost rows
    * for tar-in-tar shards. Chain validation cannot distinguish this
    * case by construction; callers with tar-in-tar corpora should read
    * each file as one range (no split) or unpack one level first.
    * WebDataset shards never nest, so the production path is safe. */
  def entriesInRange(b: Array[Byte], start: Long, end: Long): Seq[Entry] = {
    val out = Seq.newBuilder[Entry]
    var pos = math.max(0L, ((start - PaxBackWindow) / 512) * 512)
    if (pos < 0) pos = 0
    // find the first chain-valid header
    while (pos < end && pos + 512 <= b.length && !chainValid(b, pos.toInt)) pos += 512
    var nameOverride: String = null
    while (pos < end && pos + 512 <= b.length && !isZeroBlock(b, pos.toInt)) {
      val off = pos.toInt
      if (!isHeader(b, off)) fail(s"tar chain broken at offset $pos")
      val size = num(b, off + 124, 12)
      if (size < 0 || off + 512 + size > b.length) fail(s"tar entry size out of range at $pos")
      val typeflag = (b(off + 156) & 0xff).toChar
      val data = java.util.Arrays.copyOfRange(b, off + 512, off + 512 + size.toInt)
      typeflag match {
        case 'x' | 'X' =>
          paxRecords(data).get("path").foreach(p => nameOverride = p)
        case 'L' =>
          nameOverride = { var e = data.length; while (e > 0 && data(e - 1) == 0) e -= 1; new String(data, 0, e, Utf8) }
        case 'g' => () // global pax: no per-entry effect we track
        case _ =>
          val prefix = str(b, off + 345, 155)
          val base = str(b, off, 100)
          val name =
            if (nameOverride != null) nameOverride
            else if (prefix.nonEmpty) prefix + "/" + base
            else base
          nameOverride = null
          if (pos >= start) // ownership: backscanned entries are not re-emitted
            out += Entry(pos, name, size, if (typeflag == 0) '0' else typeflag, data)
      }
      pos += 512 + ((size + 511) / 512) * 512
    }
    out.result()
  }

  /** A candidate header is accepted only if the chain it implies also
    * parses: walk up to `depth` successors; each must be a valid
    * header, a zero block (end of archive), or past EOF (truncated
    * tail — tolerated like tarfile does). */
  private def chainValid(b: Array[Byte], off: Int, depth: Int = 4): Boolean = {
    var pos = off.toLong
    var i = 0
    while (i < depth) {
      if (pos + 512 > b.length) return i > 0
      if (isZeroBlock(b, pos.toInt))
        // end-of-archive is TWO zero blocks (or EOF inside the
        // padding) — a single zero block mid-file is payload bytes
        // after a planted header, not a terminator
        return i > 0 && (pos + 1024 > b.length || isZeroBlock(b, (pos + 512).toInt))
      if (!isHeader(b, pos.toInt)) return false
      val size = num(b, pos.toInt + 124, 12)
      if (size < 0) return false
      pos += 512 + ((size + 511) / 512) * 512
      i += 1
    }
    true
  }

  /** Whole-archive parse (= entriesInRange over everything). */
  def parseAll(b: Array[Byte]): Seq[Entry] = entriesInRange(b, 0, b.length)

  // ------------------------------------------------------------------
  // writer (cycles, specs, fixtures)
  // ------------------------------------------------------------------

  /** ustar writer; names longer than 100 bytes emit a pax `x` record
    * (the Python-tarfile behavior WebDataset shards exhibit). */
  def writeTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def oct(v: Long, len: Int): Array[Byte] = {
      val s = java.lang.Long.toOctalString(v)
      val pad = "0" * (len - 1 - s.length) + s
      (pad + "\u0000").getBytes(Ascii) // NUL-terminated octal field
    }
    def header(name: String, size: Long, typeflag: Char): Array[Byte] = {
      val h = new Array[Byte](512)
      val nb = name.getBytes(Utf8)
      require(nb.length <= 100, "writer: name must fit (long names go through pax)")
      System.arraycopy(nb, 0, h, 0, nb.length)
      System.arraycopy(oct(420, 8), 0, h, 100, 8) // 0644
      System.arraycopy(oct(0, 8), 0, h, 108, 8)
      System.arraycopy(oct(0, 8), 0, h, 116, 8)
      System.arraycopy(oct(size, 12), 0, h, 124, 12)
      System.arraycopy(oct(0, 12), 0, h, 136, 12)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      h(156) = typeflag.toByte
      System.arraycopy("ustar\u000000".getBytes(Ascii), 0, h, 257, 8)
      var sum = 0L
      var i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      val csPad = "0" * (6 - cs.length) + cs
      System.arraycopy((csPad + "\u0000 ").getBytes(Ascii), 0, h, 148, 8)
      h
    }
    def put(name: String, data: Array[Byte], typeflag: Char): Unit = {
      out.write(header(name, data.length.toLong, typeflag))
      out.write(data)
      val rem = data.length % 512
      if (rem != 0) out.write(new Array[Byte](512 - rem))
    }
    entries.foreach { case (name, data) =>
      if (name.getBytes(Utf8).length > 100) {
        val rec = {
          val body = s"path=$name\n"
          // record length includes its own decimal length field + space
          var len = body.getBytes(Utf8).length + 2
          while (s"$len $body".getBytes(Utf8).length != len) len += 1
          s"$len $body"
        }
        put("./paxheader", rec.getBytes(Utf8), 'x')
        put(name.take(100), data, '0')
      } else put(name, data, '0')
    }
    out.write(new Array[Byte](1024)) // end-of-archive
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Spark faces
  // ------------------------------------------------------------------

  /** Entry-level split scan of a tar shard on any Hadoop filesystem:
    * driver plans byte ranges from the file LENGTH only; each task
    * reads its range (+ a bounded tail overhang so the last owned
    * entry's data is complete) and emits the entries whose header
    * starts in-range. Output: (offset, name, ext, size, data). */
  def entries(spark: SparkSession, path: String, splitSize: Long = 64L << 20): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(conf.value)
    val len = fs.getFileStatus(hp).getLen
    val ranges = (0L until len by splitSize).map(s => (s, math.min(s + splitSize, len)))
    spark.sparkContext
      .parallelize(ranges, math.max(1, ranges.size))
      .flatMap { case (s, e) =>
        val fs1 = new org.apache.hadoop.fs.Path(path).getFileSystem(conf.value)
        val in = fs1.open(new org.apache.hadoop.fs.Path(path))
        try {
          // head backscan: a pax/L name record for this split's first
          // entry may sit in the previous split. tail overhang: an
          // entry owned near the range end may extend past it; grow
          // until the walk completes (entries << split size in
          // WebDataset shards)
          val bufStart = math.max(0L, ((s - PaxBackWindow) / 512) * 512)
          var tail = math.min(len, e + (8L << 20))
          var buf: Array[Byte] = null
          var parsed: Seq[Entry] = null
          while (parsed == null) {
            buf = new Array[Byte]((tail - bufStart).toInt)
            in.readFully(bufStart, buf)
            try parsed = entriesInRange(buf, s - bufStart, e - bufStart)
              .map(en => en.copy(offset = en.offset + bufStart))
            catch {
              case _: TarError if tail < len => tail = math.min(len, tail * 2)
            }
          }
          parsed.iterator.map { en =>
            val dot = en.name.lastIndexOf('.')
            val ext = if (dot >= 0) en.name.substring(dot + 1) else ""
            (en.offset, en.name, ext, en.size, en.data)
          }
        } finally in.close()
      }
      .toDF("offset", "name", "ext", "size", "data")
  }

  /** WebDataset sample view: entries regroup by sample key (path up
    * to the FIRST dot of the basename — the WebDataset convention),
    * one row per sample with an ext->bytes map. Samples that straddle
    * a split boundary reunite in this shuffle. */
  def samples(spark: SparkSession, path: String, splitSize: Long = 64L << 20): DataFrame = {
    import org.apache.spark.sql.functions._
    val df = entries(spark, path, splitSize)
    val keyOf = udf { name: String =>
      val slash = name.lastIndexOf('/')
      val base = name.substring(slash + 1)
      val dot = base.indexOf('.')
      val stem = if (dot >= 0) base.substring(0, dot) else base
      if (slash >= 0) name.substring(0, slash + 1) + stem else stem
    }
    val extOf = udf { name: String =>
      val slash = name.lastIndexOf('/')
      val base = name.substring(slash + 1)
      val dot = base.indexOf('.')
      if (dot >= 0) base.substring(dot + 1) else ""
    }
    df.withColumn("sample_key", keyOf(col("name")))
      .withColumn("sample_ext", extOf(col("name")))
      .groupBy(col("sample_key"))
      .agg(
        map_from_entries(collect_list(struct(col("sample_ext"), col("data")))).as("files"),
        count(lit(1)).as("n_files"),
        sum(col("size")).as("bytes"))
  }

  /** WebDataset samples with their media DECODED: images (`jpg`,
    * `png`, `webp` incl. lossy VP8, `gif`, `bmp`) go through the real
    * codec stack to (width, height, channels); text-ish extensions
    * surface as strings; everything else stays opaque binary with its
    * size. The multimodal training-data read path end to end: tar
    * split scan -> sample regroup -> codec decode, all executor-side. */
  def decodedSamples(spark: SparkSession, path: String, splitSize: Long = 64L << 20): DataFrame = {
    import org.apache.spark.sql.functions._
    val imgMeta = udf { (files: Map[String, Array[Byte]]) =>
      files.collectFirst {
        case (ext, bytes) if Set("jpg", "jpeg", "png", "webp", "gif", "bmp").contains(ext.toLowerCase(java.util.Locale.ROOT)) =>
          graft.multimodal.Multimodal.decodeImage(bytes) match {
            case Some(img) => Seq(img.width, img.height, img.channels)
            case None => Seq(-1, -1, -1)
          }
      }.getOrElse(Seq.empty[Int])
    }
    val textOf = udf { (files: Map[String, Array[Byte]]) =>
      files.collectFirst {
        case (ext, bytes) if Set("txt", "cls", "json", "caption").contains(ext.toLowerCase(java.util.Locale.ROOT)) =>
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      }.orNull
    }
    samples(spark, path, splitSize)
      .withColumn("image_meta", imgMeta(col("files")))
      .withColumn("text", textOf(col("files")))
  }

  // ------------------------------------------------------------------
  // q_wds — oracle-checked cycle (the q_zst pattern)
  // ------------------------------------------------------------------

  /** Per (event_type, id%16 shard): events become WebDataset samples
    * (three files each: `.txt` payload, `.cls` label, `.json` meta —
    * one long pax name per shard so the override path runs), the
    * shard's tar cycles through write → whole parse → split-ownership
    * sweep at three split sizes (each must reproduce the whole entry
    * set exactly) → sample regrouping (every sample must come back
    * with exactly its three extensions). Counts and char sums have
    * closed forms over the ids, which the oracle states directly. */
  def wdsQuery(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val cycle = udf { ids: Seq[Long] =>
      val sorted = ids.sorted
      val files = sorted.iterator.flatMap { id =>
        val key = f"sample$id%012d"
        val txt = s"text for $id ${"x" * (id % 23).toInt}".getBytes(Utf8)
        val cls = s"${id % 10}".getBytes(Utf8)
        val json = s"""{"id":$id}""".getBytes(Utf8)
        // one sample per shard gets a >100-byte name: the pax path
        val stem = if (id == sorted.head) ("deep/" * 22) + key else key
        Seq((s"$stem.txt", txt), (s"$stem.cls", cls), (s"$stem.json", json))
      }.toSeq
      val tar = writeTar(files)
      val whole = parseAll(tar)
      require(whole.length == files.length, "wds: entry count drift")
      require(whole.map(_.name) == files.map(_._1), "wds: name/pax drift")
      // split-ownership sweep
      for (split <- Seq(tar.length.toLong + 13, math.max(512L, tar.length.toLong / 3), 1536L)) {
        val got = (0L until tar.length.toLong by split).flatMap { st =>
          entriesInRange(tar, st, math.min(st + split, tar.length.toLong))
        }
        require(got.map(_.offset).sorted == whole.map(_.offset), s"wds: split $split not exactly-once")
      }
      // sample regroup: every key has exactly txt/cls/json
      val byKey = whole.groupBy { e =>
        val base = e.name.substring(e.name.lastIndexOf('/') + 1)
        base.substring(0, base.indexOf('.'))
      }
      require(byKey.size == sorted.length, "wds: sample count drift")
      byKey.values.foreach { es =>
        val exts = es.map(e => e.name.substring(e.name.lastIndexOf('.') + 1)).toSet
        require(exts == Set("txt", "cls", "json"), s"wds: sample exts drift: $exts")
      }
      val txtChars = whole.filter(_.name.endsWith(".txt")).map(_.size).sum
      Seq(sorted.length.toLong, txtChars, tar.length.toLong)
    }
    graft.Tables
      .eventsRaw(s, dir)
      .groupBy($"event_type", pmod($"event_id", lit(16L)).as("shard"))
      .agg(collect_list($"event_id").as("ids"))
      .transform(d => graft.operators.Spread.wide(d)) // conf-width, not a local-core literal
      .select($"event_type", cycle($"ids").as("a"))
      .groupBy($"event_type")
      .agg(sum($"a".getItem(0)).as("n_samples"), sum($"a".getItem(1)).as("txt_chars"))
      .orderBy($"event_type")
  }
}
