package graft

import graft.model.EntryType
import graft.sources.{Extractors, PointCloud}

/** LAS/PLY header extraction — mirrors the reference's point-cloud
  * metadata shape (`pointcloud.cpp:371-434`) and the PLY content
  * dispatch (`entry.cpp:1018-1022`).
  */
class PointCloudSpec extends SparkSuite {

  private def lasBytes(count: Long, bounds: (Double, Double, Double, Double, Double, Double)): Array[Byte] = {
    val b = new Array[Byte](260)
    b(0) = 'L'; b(1) = 'A'; b(2) = 'S'; b(3) = 'F'
    b(24) = 1; b(25) = 2 // version 1.2
    def leU32(i: Int, v: Long): Unit = (0 until 4).foreach(k => b(i + k) = ((v >> (8 * k)) & 0xff).toByte)
    def leF64(i: Int, v: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach(k => b(i + k) = ((bits >> (8 * k)) & 0xff).toByte)
    }
    leU32(107, count)
    val (minx, miny, minz, maxx, maxy, maxz) = bounds
    leF64(179, maxx); leF64(187, minx); leF64(195, maxy); leF64(203, miny); leF64(211, maxz); leF64(219, minz)
    b
  }

  test("las header: count + bounds") {
    val m = PointCloud.sniffLas(lasBytes(123456L, (-91.9, 46.8, 180.0, -91.8, 46.9, 220.0))).get
    assert(m.pointCount === 123456L)
    val (minx, miny, minz, maxx, maxy, maxz) = m.bounds.get
    assert(minx === -91.9 && miny === 46.8 && minz === 180.0)
    assert(maxx === -91.8 && maxy === 46.9 && maxz === 220.0)
  }

  private val plyCloud =
    """ply
      |format binary_little_endian 1.0
      |element vertex 5000
      |property float x
      |property float y
      |property float z
      |property uchar red
      |end_header
      |""".stripMargin.getBytes("US-ASCII")

  private val plyMesh =
    """ply
      |format ascii 1.0
      |element vertex 8
      |property float x
      |property float y
      |property float z
      |element face 12
      |property list uchar int vertex_indices
      |end_header
      |""".stripMargin.getBytes("US-ASCII")

  private val plySplat =
    """ply
      |format binary_little_endian 1.0
      |element vertex 100000
      |property float x
      |property float y
      |property float z
      |property float f_dc_0
      |property float f_dc_1
      |property float opacity
      |end_header
      |""".stripMargin.getBytes("US-ASCII")

  test("ply dispatch: cloud vs mesh vs splat") {
    val cloud = PointCloud.sniffPly(plyCloud).get
    assert(cloud.pointCount === 5000L && !cloud.isMesh && !cloud.isSplat)
    assert(cloud.dimensions === Seq("x", "y", "z", "red"))
    val mesh = PointCloud.sniffPly(plyMesh).get
    assert(mesh.isMesh && !mesh.isSplat)
    val splat = PointCloud.sniffPly(plySplat).get
    assert(splat.isSplat && !splat.isMesh)
    assert(PointCloud.sniffPly("not a ply".getBytes) === None)
  }

  test("extraction dispatch routes to the right entry types") {
    assert(Extractors.extract("scan.las", lasBytes(10, (0, 0, 0, 1, 1, 1))).entryType === EntryType.PointCloud)
    assert(Extractors.extract("cloud.ply", plyCloud).entryType === EntryType.PointCloud)
    assert(Extractors.extract("mesh.ply", plyMesh).entryType === EntryType.Model)
    assert(Extractors.extract("scene.ply", plySplat).entryType === EntryType.GaussianSplat)
    val props = Extractors.extract("scan.las", lasBytes(42, (0, 0, 0, 1, 1, 1))).properties
    assert(props.contains("\"pointCount\":42"))
    assert(props.contains("\"bounds\":[0"))
  }
}
