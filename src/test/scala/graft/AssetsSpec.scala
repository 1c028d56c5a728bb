package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Assets

/** The runtime-asset deployment contract: env override → bundled
  * classpath resource → in-sandbox reference path, in that order
  * (ASSETS-NOTICE.md). Bundling means an off-sandbox deployment never
  * silently degrades to the built-in fallback tables. */
class AssetsSpec extends AnyFunSuite {

  test("bundled resources win over the sandbox path when no env var is set") {
    // none of the GRAFT_* env vars are set in the test JVM, so every
    // asset must come from the jar, not from /root/reference
    for (
      (env, res) <- Seq(
        ("GRAFT_SENSOR_DB", "sensor_data.sqlite"),
        ("GRAFT_TZDB", "timezone21.bin"),
        ("GRAFT_SENSOR_PROFILES", "sensor-profiles.json")
      )
    ) {
      assume(sys.env.get(env).isEmpty, s"$env set in test environment")
      val got = Assets.resolve(env, res, "/root/reference/data/" + res)
      assert(got.isDefined, res)
      assert(got.get._1 === "resource:" + res)
      assert(got.get._2.length > 1000)
    }
  }

  test("env var wins over the bundled resource; sandbox path is last") {
    // env: point GRAFT-style override at a temp file with sentinel bytes
    val tmp = java.nio.file.Files.createTempFile("asset", ".bin")
    java.nio.file.Files.write(tmp, Array[Byte](1, 2, 3))
    try {
      // sys.env can't be mutated in-JVM; prove precedence through the
      // resolver's branches instead: a resource that exists beats the
      // sandbox path, a missing resource falls through to the path
      val viaPath = Assets.resolve("GRAFT_NO_SUCH_VAR", "no-such-resource.bin", tmp.toString)
      assert(viaPath.map(_._1) === Some("path:" + tmp.toString))
      assert(viaPath.map(_._2.toSeq) === Some(Seq[Byte](1, 2, 3)))
      val viaResource = Assets.resolve("GRAFT_NO_SUCH_VAR", "sensor-profiles.json", tmp.toString)
      assert(viaResource.map(_._1) === Some("resource:sensor-profiles.json"))
      // and a dead path resolves to None, never an exception
      assert(Assets.resolve("GRAFT_NO_SUCH_VAR", "no-such-resource.bin", "/no/such/file") === None)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("bundled copies are byte-identical to the reference assets they mirror") {
    for (
      (res, refPath) <- Seq(
        ("sensor_data.sqlite", "/root/reference/data/sensor_data.sqlite"),
        ("timezone21.bin", "/root/reference/data/timezone21-old.bin"),
        ("sensor-profiles.json", "/root/reference/data/sensor-profiles.json")
      )
    ) {
      val p = java.nio.file.Paths.get(refPath)
      if (java.nio.file.Files.isReadable(p)) {
        val ref = java.nio.file.Files.readAllBytes(p)
        val bundled = Assets.resolve("GRAFT_NO_SUCH_VAR", res, "/no/such/file").get._2
        assert(java.util.Arrays.equals(ref, bundled), res)
      }
    }
  }
}
