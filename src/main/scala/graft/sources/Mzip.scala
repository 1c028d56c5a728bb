package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Dataset zip packaging — the reference's `mzip.cpp` (libzip shell):
  * `zipFolder` with its exclude patterns (a trailing-`/` pattern
  * excludes the subtree, otherwise the exact relative path or
  * basename) and `extractAll` with the `ensureSafeZipEntry` archive
  * guard (`mzip.cpp:21-63` — backslashes normalized, absolute paths,
  * drive paths and any `..` segment rejected as named errors; the 3D
  * Tiles archive security considerations).
  *
  * Built on `java.util.zip`; output is DETERMINISTIC (fixed entry
  * timestamps, path-sorted entries), so packing the same dataset
  * twice is byte-identical — which makes archive hashes stable, the
  * property every content-addressed store here leans on.
  *
  * Scale shape: one archive per task (pack and unpack are
  * per-artifact kernels like the other containers); KMZ reading
  * ([[Kml]]) already consumes the same zip machinery.
  */
object Mzip {

  final case class Entry(name: String, size: Long, compressedSize: Long, crc: Long)

  /** `ensureSafeZipEntry`: returns the normalized name or throws. */
  def safeEntryName(raw: String): String = {
    val name = Option(raw).getOrElse("").replace('\\', '/')
    if (name.startsWith("/"))
      throw new IllegalArgumentException(s"Unsafe absolute path in archive entry: $name")
    if (name.length >= 2 && name(1) == ':')
      throw new IllegalArgumentException(s"Unsafe drive path in archive entry: $name")
    if (name.split("/", -1).contains(".."))
      throw new IllegalArgumentException(s"Unsafe path traversal in archive entry: $name")
    name
  }

  private def excluded(relPath: String, excludes: Seq[String]): Boolean =
    excludes.exists { excl =>
      if (excl.endsWith("/")) relPath.startsWith(excl.dropRight(1))
      else relPath == excl || relPath.split('/').last == excl
    }

  /** Pack (relativePath, bytes) pairs; `excludes` follow zipFolder's
    * pattern rules. Deterministic: sorted entries, fixed timestamps. */
  def pack(files: Seq[(String, Array[Byte])], excludes: Seq[String] = Nil): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    files
      .filterNot { case (p, _) => excluded(p, excludes) }
      .sortBy(_._1)
      .foreach { case (path, bytes) =>
        val e = new java.util.zip.ZipEntry(safeEntryName(path))
        e.setTime(0L) // fixed timestamp → byte-stable archives
        zos.putNextEntry(e)
        zos.write(bytes)
        zos.closeEntry()
      }
    zos.close()
    bos.toByteArray
  }

  /** Central-directory listing (metadata face — no payload decode). */
  def entries(bytes: Array[Byte]): Seq[Entry] = {
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new ArrayBuffer[Entry]()
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val data = zin.readAllBytes()
        out += Entry(e.getName, data.length.toLong, math.max(0L, e.getCompressedSize), {
          val crc = new java.util.zip.CRC32(); crc.update(data); crc.getValue
        })
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toSeq
  }

  /** `extractAll` into memory: every entry guarded by
    * [[safeEntryName]] BEFORE any byte is surfaced. Directory entries
    * are dropped (they carry no payload). */
  def unpack(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new ArrayBuffer[(String, Array[Byte])]()
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = safeEntryName(e.getName)
        if (!e.isDirectory) out += ((name, zin.readAllBytes()))
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toSeq
  }
}
