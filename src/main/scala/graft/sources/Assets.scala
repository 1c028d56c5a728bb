package graft.sources

/** Runtime data-asset resolution — the deployment contract for the three
  * bundled databases (camera sensor widths, timezone polygons, sensor
  * profiles; see `src/main/resources/graft/ASSETS-NOTICE.md`).
  *
  * Order: **env var → bundled classpath resource → in-sandbox reference
  * path**. An explicit env override always wins (standard config
  * precedence: the operator pointing at a newer build must not be shadowed
  * by the jar's bundled copy); the bundled resource makes an off-sandbox
  * deployment self-contained (no silent degradation to fallback tables);
  * the reference-checkout path keeps dev trees working without a packaged
  * jar. AssetsSpec pins the order.
  */
object Assets {

  /** Resolve to (provenance, bytes): provenance is "env:<path>",
    * "resource:<name>" or "path:<path>" — surfaced so specs (and
    * operators debugging a deployment) can see which copy won. */
  def resolve(envVar: String, resource: String, sandboxPath: String): Option[(String, Array[Byte])] = {
    def file(p: String): Option[Array[Byte]] = {
      val path = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.isReadable(path))
        try Some(java.nio.file.Files.readAllBytes(path))
        catch { case _: Exception => None }
      else None
    }
    sys.env.get(envVar).flatMap(p => file(p).map(("env:" + p) -> _))
      .orElse {
        val in = getClass.getResourceAsStream("/graft/" + resource)
        if (in == null) None
        else {
          try Some(("resource:" + resource) -> in.readAllBytes())
          catch { case _: Exception => None }
          finally in.close()
        }
      }
      .orElse(file(sandboxPath).map(("path:" + sandboxPath) -> _))
  }

  def bytes(envVar: String, resource: String, sandboxPath: String): Option[Array[Byte]] =
    resolve(envVar, resource, sandboxPath).map(_._2)
}
