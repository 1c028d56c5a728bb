package graft.sources

import scala.collection.mutable.ArrayBuffer

import graft.core.MiniJson

/** 3D-model dependency extraction — reference `3d.cpp:93-598`: the
  * OBJ/MTL texture-dependency walk (`getObjDependencies`: every
  * `mtllib` line — leading whitespace tolerated, quoted names
  * unwrapped — then each MTL's texture map keys) and the glTF/GLB
  * buffer+image URI walk (`getGltfDependencies` / `readGlbJson` with
  * the reference's named container errors; data:/absolute/unsafe URIs
  * skipped). These dependency lists feed the build scheduler
  * ([[graft.core]] Builds / Cleanup) — the reference validates them
  * before every nexus/3d-tiles build (`validateDependencies`).
  *
  * Pure text/bytes in, names out — one model file is one task-local
  * parse in an estate scan, like every other extractor here.
  */
object Mesh3d {

  /** MTL texture/map statement keys (`3d.cpp:542-555`). */
  val MtlKeys: Seq[String] = Seq(
    "map_Ka", "map_Kd", "map_Ks", "map_Ns", "map_d", "disp", "decal",
    "bump", "map_bump", "refl", "map_Pr", "map_Pm", "map_Ps", "map_Ke"
  )

  private val FileNamePattern =
    java.util.regex.Pattern.compile("\"([^\"]+\\.[^\\s\"]+)\"|\\b([^\" \\t]+\\.[^\\s\"]+)\\b")

  /** First filename-looking token, quoted or bare (`3d.cpp:515-531`). */
  def extractFileName(input: String): Option[String] = {
    val m = FileNamePattern.matcher(input)
    if (!m.find()) None
    else if (m.group(1) != null) Some(m.group(1))
    else Option(m.group(2))
  }

  /** OBJ → dependency names: each mtllib (in order, quoted names
    * unwrapped, leading spaces fine), followed by the MTL's texture
    * files. `mtlOf` resolves an MTL name to its text (None = missing
    * MTL: the name is still a dependency, its textures are unknown —
    * exactly the reference's skip). */
  def objDependencies(objText: String, mtlOf: String => Option[String]): Seq[String] = {
    val deps = new ArrayBuffer[String]()
    objText.linesIterator.foreach { line =>
      val pos = line.indexOf("mtllib")
      if (pos >= 0) {
        var mtl = line.substring(pos + 6).trim
        if (mtl.length >= 2 && mtl.head == '"' && mtl.last == '"') mtl = mtl.substring(1, mtl.length - 1)
        deps += mtl
        mtlOf(mtl).foreach { mtlText =>
          mtlText.linesIterator.foreach { mtlLine =>
            MtlKeys.foreach { key =>
              val kp = mtlLine.indexOf(key)
              if (kp >= 0) extractFileName(mtlLine.substring(kp + key.length)).foreach(deps += _)
            }
          }
        }
      }
    }
    deps.toSeq
  }

  private def isDataUri(uri: String): Boolean = uri.startsWith("data:")
  private def isAbsoluteUri(uri: String): Boolean =
    uri.contains("://") || uri.startsWith("/") || (uri.length >= 2 && uri(1) == ':')
  private def isSafePath(uri: String): Boolean =
    !uri.replace('\\', '/').split("/", -1).contains("..")

  /** glTF JSON → buffer + image URIs (relative, safe; data:/absolute/
    * traversal URIs skipped — `3d.cpp:93-143`). */
  def gltfDependencies(jsonText: String): Seq[String] = {
    val root =
      try MiniJson.obj(MiniJson.parse(jsonText))
      catch {
        case e: IllegalArgumentException =>
          throw new IllegalArgumentException(s"Invalid GLTF file: JSON parse error: ${e.getMessage}")
      }
    if (!root.contains("asset"))
      throw new IllegalArgumentException("Invalid GLTF file: missing 'asset' property")
    def uris(section: String): Seq[String] =
      root.get(section).toSeq.flatMap(v => MiniJson.arr(v)).flatMap { item =>
        MiniJson.obj(item).get("uri").collect { case s: String => s }
      }
    (uris("buffers") ++ uris("images"))
      .filterNot(isDataUri)
      .filterNot(isAbsoluteUri)
      .filter(isSafePath)
  }

  /** GLB container → the JSON chunk text (`3d.cpp:146-196` errors). */
  def glbJson(bytes: Array[Byte]): String = {
    def u32(i: Int): Long =
      (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) | ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    if (bytes == null || bytes.length < 12)
      throw new IllegalArgumentException("Invalid GLB file: cannot read header")
    if (u32(0) != 0x46546c67L)
      throw new IllegalArgumentException("Invalid GLB file: incorrect magic number")
    if (u32(4) != 2L)
      throw new IllegalArgumentException(s"Unsupported GLB version: ${u32(4)}")
    if (bytes.length < 20)
      throw new IllegalArgumentException("Invalid GLB file: cannot read chunk header")
    val chunkLen = u32(12).toInt
    if (u32(16) != 0x4e4f534aL)
      throw new IllegalArgumentException("Invalid GLB file: first chunk is not JSON")
    if (bytes.length < 20 + chunkLen)
      throw new IllegalArgumentException("Invalid GLB file: cannot read JSON chunk")
    new String(bytes, 20, chunkLen, "UTF-8")
  }

  /** Dispatch on extension like `getGltfDependencies` (.gltf = text
    * JSON, .glb = binary container; GLB buffers are embedded so only
    * its image/buffer URIs — usually none — surface). */
  def dependencies(name: String, bytes: Array[Byte]): Seq[String] = {
    val lower = name.toLowerCase(java.util.Locale.ROOT)
    if (lower.endsWith(".glb")) gltfDependencies(glbJson(bytes))
    else if (lower.endsWith(".gltf")) gltfDependencies(new String(bytes, "UTF-8"))
    else throw new IllegalArgumentException(s"File is not a GLTF or GLB: $name")
  }
}
