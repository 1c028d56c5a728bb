package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Mesh3d

/** OBJ/MTL + glTF/GLB dependency extraction (3d.cpp), behavior from
  * 3d_test.cpp (odm / leading-spaces / multiple-mtllib / metashape). */
class Mesh3dSpec extends AnyFunSuite {

  private val odmMtl =
    """newmtl material0000
      |map_Kd odm_textured_model_geo_material0000_map_Kd.jpg
      |newmtl material0001
      |map_Kd odm_textured_model_geo_material0001_map_Kd.jpg
      |""".stripMargin

  test("odmGetDependencies: mtllib then its textures, in order") {
    val obj = "mtllib odm_textured_model_geo.mtl\nv 0 0 0\nf 1 1 1\n"
    val deps = Mesh3d.objDependencies(obj, m => if (m == "odm_textured_model_geo.mtl") Some(odmMtl) else None)
    assert(deps == Seq(
      "odm_textured_model_geo.mtl",
      "odm_textured_model_geo_material0000_map_Kd.jpg",
      "odm_textured_model_geo_material0001_map_Kd.jpg"
    ))
  }

  test("leading spaces before mtllib and quoted names with spaces parse (metashape)") {
    val obj = "   mtllib \"my model.mtl\"\n"
    val mtl = "map_Kd \"texture with space.png\"\nbump bumpy.jpg\n"
    val deps = Mesh3d.objDependencies(obj, _ => Some(mtl))
    assert(deps == Seq("my model.mtl", "texture with space.png", "bumpy.jpg"))
  }

  test("multiple mtllib lines accumulate; a missing MTL still lists its name") {
    val obj = "mtllib a.mtl\nmtllib b.mtl\n"
    val deps = Mesh3d.objDependencies(obj, m => if (m == "a.mtl") Some("map_Kd t1.jpg\n") else None)
    assert(deps == Seq("a.mtl", "t1.jpg", "b.mtl"))
  }

  test("every MTL map key is recognized; lines without filenames are skipped") {
    val mtl = Mesh3d.MtlKeys.zipWithIndex.map { case (k, i) => s"$k tex$i.png" }.mkString("\n") +
      "\nmap_Kd\nKa 0.2 0.2 0.2\n"
    val deps = Mesh3d.objDependencies("mtllib m.mtl\n", _ => Some(mtl))
    // reference fidelity: substring key matching means a "map_bump"
    // line ALSO matches the "bump" key (3d.cpp's find loop), so that
    // texture is listed twice — build validation dedups by existence
    assert(deps.head == "m.mtl")
    assert(deps.tail.distinct == Mesh3d.MtlKeys.indices.map(i => s"tex$i.png"))
    val bumpTex = s"tex${Mesh3d.MtlKeys.indexOf("map_bump")}.png"
    assert(deps.tail.count(_ == bumpTex) == 2)
  }

  test("glTF dependencies: buffer + image URIs; data/absolute/traversal URIs skipped") {
    val gltf =
      """{"asset":{"version":"2.0"},
        |"buffers":[{"uri":"model.bin"},{"uri":"data:application/octet-stream;base64,AAA="},
        |           {"uri":"https://cdn.example.com/x.bin"},{"uri":"../../etc/evil.bin"}],
        |"images":[{"uri":"tex.png"},{"uri":"/abs/path.png"},{"bufferView":0}]}""".stripMargin
    assert(Mesh3d.gltfDependencies(gltf) == Seq("model.bin", "tex.png"))
    assert(intercept[IllegalArgumentException](Mesh3d.gltfDependencies("""{"buffers":[]}"""))
      .getMessage.contains("asset"))
    assert(intercept[IllegalArgumentException](Mesh3d.gltfDependencies("not json"))
      .getMessage.contains("JSON parse error"))
  }

  test("GLB container: JSON chunk extraction with the reference's named errors") {
    val json = """{"asset":{"version":"2.0"},"images":[{"uri":"skin.png"}]}"""
    val jb = json.getBytes("UTF-8")
    val bb = java.nio.ByteBuffer.allocate(20 + jb.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46546c67).putInt(2).putInt(20 + jb.length)
    bb.putInt(jb.length).putInt(0x4e4f534a).put(jb)
    val glb = bb.array()
    assert(Mesh3d.glbJson(glb) == json)
    assert(Mesh3d.dependencies("model.glb", glb) == Seq("skin.png"))
    assert(intercept[IllegalArgumentException](Mesh3d.glbJson("nope".getBytes)).getMessage.contains("header"))
    val badMagic = glb.clone(); badMagic(0) = 'X'
    assert(intercept[IllegalArgumentException](Mesh3d.glbJson(badMagic)).getMessage.contains("magic"))
    val badVer = glb.clone(); badVer(4) = 3
    assert(intercept[IllegalArgumentException](Mesh3d.glbJson(badVer)).getMessage.contains("version"))
    val badChunk = glb.clone(); badChunk(16) = 0
    assert(intercept[IllegalArgumentException](Mesh3d.glbJson(badChunk)).getMessage.contains("JSON"))
    assert(intercept[IllegalArgumentException](Mesh3d.dependencies("m.stl", glb)).getMessage.contains("not a GLTF"))
  }
}
