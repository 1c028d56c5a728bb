package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Mzip

/** Dataset zip packaging (mzip.cpp): deterministic pack, exclude
  * rules, and the ensureSafeZipEntry archive guard. */
class MzipSpec extends AnyFunSuite {

  private val files = Seq(
    "a.txt" -> "alpha".getBytes,
    "sub/b.bin" -> Array.tabulate[Byte](5000)(i => (i * 7).toByte),
    "sub/deep/c.json" -> """{"k":1}""".getBytes,
    ".ddb/build/cache.tmp" -> "x".getBytes,
    "notes.md" -> "hello".getBytes
  )

  test("pack → unpack round-trips content; output is byte-deterministic") {
    val z1 = Mzip.pack(files)
    val z2 = Mzip.pack(files)
    assert(java.util.Arrays.equals(z1, z2), "same input must produce byte-identical archives")
    val back = Mzip.unpack(z1).toMap
    assert(back.keySet == files.map(_._1).toSet)
    files.foreach { case (p, b) => assert(java.util.Arrays.equals(back(p), b), p) }
    // entries metadata face
    val meta = Mzip.entries(z1).map(e => e.name -> e.size).toMap
    assert(meta("sub/b.bin") == 5000L && meta("a.txt") == 5L)
  }

  test("excludes: trailing-slash patterns drop the subtree, plain patterns match path or basename") {
    val z = Mzip.pack(files, excludes = Seq(".ddb/", "notes.md"))
    val names = Mzip.unpack(z).map(_._1).toSet
    assert(names == Set("a.txt", "sub/b.bin", "sub/deep/c.json"))
    val z2 = Mzip.pack(files, excludes = Seq("b.bin")) // basename match
    assert(!Mzip.unpack(z2).exists(_._1.endsWith("b.bin")))
  }

  test("ensureSafeZipEntry: traversal, absolute and drive paths are named errors; backslashes normalize") {
    assert(Mzip.safeEntryName("ok/path\\win.txt") == "ok/path/win.txt")
    assert(intercept[IllegalArgumentException](Mzip.safeEntryName("../evil")).getMessage.contains("traversal"))
    assert(intercept[IllegalArgumentException](Mzip.safeEntryName("a/../../b")).getMessage.contains("traversal"))
    assert(intercept[IllegalArgumentException](Mzip.safeEntryName("/etc/passwd")).getMessage.contains("absolute"))
    assert(intercept[IllegalArgumentException](Mzip.safeEntryName("C:evil")).getMessage.contains("drive"))
    assert(intercept[IllegalArgumentException](Mzip.safeEntryName("..\\win")).getMessage.contains("traversal"))
    // a MALICIOUS archive (crafted entry name) is rejected at unpack
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("../../escape.sh"))
    zos.write("#!/bin/sh".getBytes)
    zos.closeEntry(); zos.close()
    assert(intercept[IllegalArgumentException](Mzip.unpack(bos.toByteArray)).getMessage.contains("traversal"))
  }

  test("interops with the JDK zip ecosystem (KMZ reading shares this machinery)") {
    val z = Mzip.pack(files)
    val zf = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(z))
    var names = List.empty[String]
    var e = zf.getNextEntry
    while (e != null) { names ::= e.getName; e = zf.getNextEntry }
    zf.close()
    assert(names.toSet == files.map(_._1).toSet)
  }
}
