package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods

/** 3D Tiles (.3tz / tileset.json) info extraction — the READ face of
  * the reference's Tiles3D support (`tiles3d.cpp:143-283`): pull
  * `tileset.json` out of the .3tz zip (java.util.zip, no codec),
  * parse the root tile's geometricError and boundingVolume, and derive
  * the WGS84 footprint for all three volume kinds:
  *
  *  - `region`: [west, south, east, north(, minH, maxH)] radians → deg;
  *  - `box`: transformed ECEF center + half-axis-derived bounding
  *    radius (max over corner sign combinations — the reference's
  *    exact rule, `tiles3d.cpp:206-242`) → equirect footprint;
  *  - `sphere`: transformed ECEF center + radius.
  *
  * ECEF→WGS84 here is the closed-form Bowring conversion (the
  * reference shells out to PROJ for EPSG 4978→4326); centers within
  * 1e6 m of the origin are local/engineering frames and yield
  * `georeferenced = false`, as in the reference. Tileset WRITING
  * (b3dm/glb payloads) stays adjudicated out with the 3D codecs.
  */
object Tiles3d {

  private val Rad2Deg = 57.29577951308232
  private val MetersPerDegLat = 111320.0

  final case class Info(
      assetVersion: Option[String],
      geometricError: Option[Double],
      georeferenced: Boolean,
      hasBounds: Boolean,
      centerLon: Double,
      centerLat: Double,
      centerAlt: Double,
      west: Double,
      south: Double,
      east: Double,
      north: Double
  )

  private val noBounds = (false, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)

  /** WRITE face (r11): a minimal OGC 3D Tiles archive — tileset.json
    * at the root (region boundingVolume in WGS84 radians, root
    * geometricError, child content URIs) + the tile payloads, packed
    * with the deterministic [[Mzip]] zip (so identical tilesets hash
    * identically). Round-trips through [[from3tz]] / the extractor's
    * Tiles3D dispatch. */
  def tilesetJson(
      west: Double, south: Double, east: Double, north: Double,
      minHeight: Double, maxHeight: Double,
      geometricError: Double,
      contents: Seq[String]
  ): String = {
    def rad(d: Double): Double = d * math.Pi / 180.0
    val region = s"[${rad(west)},${rad(south)},${rad(east)},${rad(north)},$minHeight,$maxHeight]"
    val children = contents.map { uri =>
      s"""{"boundingVolume":{"region":$region},"geometricError":0,"content":{"uri":"$uri"}}"""
    }.mkString(",")
    s"""{"asset":{"version":"1.0"},"geometricError":$geometricError,""" +
      s""""root":{"boundingVolume":{"region":$region},"geometricError":$geometricError,""" +
      s""""refine":"ADD","children":[$children]}}"""
  }

  /** Assemble a .3tz: tileset.json at the archive root + payloads. */
  def write3tz(tileset: String, tiles: Seq[(String, Array[Byte])]): Array[Byte] =
    Mzip.pack(("tileset.json" -> tileset.getBytes("UTF-8")) +: tiles)

  /** Wrap a binary glTF in a Batched 3D Model tile: 28-byte header
    * (magic/version/byteLength + the four table lengths), feature
    * table JSON padded with 0x20 so the GLB starts 8-byte aligned,
    * GLB padded with 0x00 to keep byteLength 8-aligned (the 3D Tiles
    * 1.0 b3dm layout — the payload `buildlod`/`obj2tiles` runners
    * hand to tileset writers). */
  def writeB3dm(glb: Array[Byte], batchLength: Int = 0): Array[Byte] = {
    val ft0 = s"""{"BATCH_LENGTH":$batchLength}""".getBytes("UTF-8")
    val ftPad = (8 - (28 + ft0.length) % 8) % 8
    val ft = ft0 ++ Array.fill(ftPad)(' '.toByte)
    val glbPad = (8 - glb.length % 8) % 8
    val body = glb ++ new Array[Byte](glbPad)
    val total = 28 + ft.length + body.length
    val out = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("b3dm".getBytes("US-ASCII"))
    out.putInt(1) // version
    out.putInt(total)
    out.putInt(ft.length) // featureTableJSONByteLength
    out.putInt(0) // featureTableBinaryByteLength
    out.putInt(0) // batchTableJSONByteLength
    out.putInt(0) // batchTableBinaryByteLength
    out.put(ft)
    out.put(body)
    out.array()
  }

  /** b3dm → (feature table JSON, embedded GLB). The GLB slice is
    * trimmed to its own declared length (b3dm pads to 8). */
  def readB3dm(bytes: Array[Byte]): (String, Array[Byte]) = {
    require(bytes.length >= 28 && new String(bytes, 0, 4, "US-ASCII") == "b3dm", "not a b3dm tile")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(4)
    val version = bb.getInt
    require(version == 1, s"unsupported b3dm version $version")
    val byteLength = bb.getInt
    val ftJsonLen = bb.getInt
    val ftBinLen = bb.getInt
    val btJsonLen = bb.getInt
    val btBinLen = bb.getInt
    require(byteLength <= bytes.length, "b3dm byteLength overruns buffer")
    require(ftJsonLen >= 0 && ftBinLen >= 0 && btJsonLen >= 0 && btBinLen >= 0,
      "b3dm: negative table length")
    require(28L + ftJsonLen + ftBinLen + btJsonLen + btBinLen <= byteLength,
      "b3dm: table lengths overrun the tile")
    val ftJson = new String(bytes, 28, ftJsonLen, "UTF-8").trim
    val glbStart = 28 + ftJsonLen + ftBinLen + btJsonLen + btBinLen
    require(glbStart + 12 <= byteLength, "b3dm has no GLB payload")
    val declared = ((bytes(glbStart + 8) & 0xff) | ((bytes(glbStart + 9) & 0xff) << 8) |
      ((bytes(glbStart + 10) & 0xff) << 16) | ((bytes(glbStart + 11) & 0xff) << 24))
    val glbLen = math.min(declared, byteLength - glbStart)
    (ftJson, java.util.Arrays.copyOfRange(bytes, glbStart, glbStart + glbLen))
  }

  /** ◆ q_tiles3d — the q_e57 pattern for the 3D-tiles payload chain:
    * per event_type, deterministic integer-lattice vertices (x=id%1000,
    * y=id*3%1000, z=id*7%500 — exact in float32) and a consecutive
    * triangle fan write a REAL GLB, wrap in a REAL b3dm, then decode
    * back through readB3dm/readMeshGlb inside the task; integer
    * aggregates of the decoded mesh must match the oracle aggregating
    * the raw rows. Green iff the GLB+b3dm cycle is bit-lossless. */
  def tiles3dQuery(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val cycle = udf { ids: Seq[Long] =>
      val sorted = ids.sorted
      val pos = new Array[Float](sorted.length * 3)
      sorted.zipWithIndex.foreach { case (id, k) =>
        pos(3 * k) = (id % 1000).toFloat
        pos(3 * k + 1) = ((id * 3) % 1000).toFloat
        pos(3 * k + 2) = ((id * 7) % 500).toFloat
      }
      val nTri = sorted.length / 3
      val idx = Array.tabulate(nTri * 3)(identity)
      val b3dm = writeB3dm(Mesh3d.writeMeshGlb(pos, idx))
      val (ftJson, glb) = readB3dm(b3dm)
      require(ftJson.contains("\"BATCH_LENGTH\":0"), "b3dm feature table lost")
      val (pos2, idx2) = Mesh3d.readMeshGlb(glb)
      require(java.util.Arrays.equals(pos, pos2), "b3dm/GLB cycle changed positions")
      require(java.util.Arrays.equals(idx, idx2), "b3dm/GLB cycle changed indices")
      Seq(
        pos2.length.toLong / 3,
        idx2.length.toLong / 3,
        (0 until pos2.length / 3).map(k => math.round(pos2(3 * k).toDouble)).sum,
        (0 until pos2.length / 3).map(k => math.round(pos2(3 * k + 1).toDouble)).sum,
        (0 until pos2.length / 3).map(k => math.round(pos2(3 * k + 2).toDouble)).sum,
        idx2.map(_.toLong).sum
      )
    }
    graft.Tables
      .eventsRaw(s, dir)
      .groupBy($"event_type")
      .agg(collect_list($"event_id").as("ids"))
      .select($"event_type", cycle($"ids").as("a"))
      .select(
        $"event_type",
        $"a".getItem(0).as("n_vertices"),
        $"a".getItem(1).as("n_triangles"),
        $"a".getItem(2).as("x_sum"),
        $"a".getItem(3).as("y_sum"),
        $"a".getItem(4).as("z_sum"),
        $"a".getItem(5).as("idx_sum")
      )
      .orderBy($"event_type")
  }

  /** First matching entry from a zip archive held in memory. */
  def readZipEntry(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == name) {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = zin.read(buf) }
          return Some(out.toByteArray)
        }
        e = zin.getNextEntry
      }
      None
    } catch { case _: Throwable => None } finally zin.close()
  }

  def from3tz(bytes: Array[Byte]): Option[Info] =
    readZipEntry(bytes, "tileset.json").flatMap(b => fromTilesetJson(new String(b, "UTF-8")))

  /** WGS84 geodetic from ECEF via Bowring's closed form. */
  def ecefToWgs84(x: Double, y: Double, z: Double): (Double, Double, Double) = {
    val a = 6378137.0
    val f = 1.0 / 298.257223563
    val b = a * (1 - f)
    val e2 = f * (2 - f)
    val ep2 = e2 / (1 - e2)
    val p = math.sqrt(x * x + y * y)
    val theta = math.atan2(z * a, p * b)
    val lat = math.atan2(z + ep2 * b * math.pow(math.sin(theta), 3), p - e2 * a * math.pow(math.cos(theta), 3))
    val lon = math.atan2(y, x)
    val n = a / math.sqrt(1 - e2 * math.sin(lat) * math.sin(lat))
    val alt = p / math.cos(lat) - n
    (lon * Rad2Deg, lat * Rad2Deg, alt)
  }

  private def footprintFromRadius(lon: Double, lat: Double, alt: Double, radius: Double) = {
    val cosLat = math.cos(lat / Rad2Deg)
    val mPerDegLon = MetersPerDegLat * math.max(0.01, math.abs(cosLat))
    val dLon = radius / mPerDegLon
    val dLat = radius / MetersPerDegLat
    (true, lon, lat, alt, lon - dLon, lat - dLat, lon + dLon, lat + dLat)
  }

  private def linear(m: Option[Seq[Double]], x: Double, y: Double, z: Double): (Double, Double, Double) =
    m match {
      // column-major 4×4: columns 0..2 are the linear part
      case Some(t) =>
        (
          t(0) * x + t(4) * y + t(8) * z,
          t(1) * x + t(5) * y + t(9) * z,
          t(2) * x + t(6) * y + t(10) * z
        )
      case None => (x, y, z)
    }

  private def affine(m: Option[Seq[Double]], x: Double, y: Double, z: Double): (Double, Double, Double) = {
    val (lx, ly, lz) = linear(m, x, y, z)
    m match {
      case Some(t) => (lx + t(12), ly + t(13), lz + t(14))
      case None    => (lx, ly, lz)
    }
  }

  def fromTilesetJson(jsonStr: String): Option[Info] = {
    val j =
      try JsonMethods.parse(jsonStr)
      catch { case _: Throwable => return None }
    def num(v: JValue): Option[Double] = v match {
      case JDouble(d)  => Some(d)
      case JInt(i)     => Some(i.toDouble)
      case JLong(l)    => Some(l.toDouble)
      case JDecimal(d) => Some(d.toDouble)
      case _           => None
    }
    def arr(v: JValue): Option[Seq[Double]] = v match {
      case JArray(xs) => val ds = xs.flatMap(num); if (ds.length == xs.length) Some(ds) else None
      case _          => None
    }
    val assetVersion = j \ "asset" \ "version" match { case JString(s) => Some(s); case _ => None }
    val root = j \ "root"
    if (root == JNothing) return None
    val geometricError = num(root \ "geometricError")
    val transform = arr(root \ "transform").filter(_.length == 16)
    val bv = root \ "boundingVolume"
    if (bv == JNothing) return None

    val parsed: Option[(Boolean, Double, Double, Double, Double, Double, Double, Double)] =
      arr(bv \ "region").filter(_.length >= 4).map { r =>
        val (w, s, e, n) = (r(0) * Rad2Deg, r(1) * Rad2Deg, r(2) * Rad2Deg, r(3) * Rad2Deg)
        val alt = if (r.length >= 6) (r(4) + r(5)) / 2.0 else 0.0
        (true, (w + e) / 2.0, (s + n) / 2.0, alt, w, s, e, n)
      } orElse {
        arr(bv \ "box").filter(_.length >= 12).map { b =>
          val c = affine(transform, b(0), b(1), b(2))
          val hx = linear(transform, b(3), b(4), b(5))
          val hy = linear(transform, b(6), b(7), b(8))
          val hz = linear(transform, b(9), b(10), b(11))
          // farthest corner over sign combinations (first sign fixed)
          var radius = 0.0
          for (sy <- Seq(1.0, -1.0); sz <- Seq(1.0, -1.0)) {
            val vx = hx._1 + sy * hy._1 + sz * hz._1
            val vy = hx._2 + sy * hy._2 + sz * hz._2
            val vz = hx._3 + sy * hy._3 + sz * hz._3
            radius = math.max(radius, math.sqrt(vx * vx + vy * vy + vz * vz))
          }
          val dist = math.sqrt(c._1 * c._1 + c._2 * c._2 + c._3 * c._3)
          if (dist > 1.0e6) {
            val (lon, lat, alt) = ecefToWgs84(c._1, c._2, c._3)
            footprintFromRadius(lon, lat, alt, radius)
          } else noBounds
        }
      } orElse {
        arr(bv \ "sphere").filter(_.length >= 4).map { s =>
          val c = affine(transform, s(0), s(1), s(2))
          val dist = math.sqrt(c._1 * c._1 + c._2 * c._2 + c._3 * c._3)
          if (dist > 1.0e6) {
            val (lon, lat, alt) = ecefToWgs84(c._1, c._2, c._3)
            footprintFromRadius(lon, lat, alt, s(3))
          } else noBounds
        }
      }

    parsed.map { case (geo, clon, clat, calt, w, s, e, n) =>
      Info(assetVersion, geometricError, geo, geo, clon, clat, calt, w, s, e, n)
    }
  }
}
