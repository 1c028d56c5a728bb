package graft

import org.apache.spark.sql.functions._

import graft.geo.ZOrder

/** Z-order layout: interleave correctness against a reference
  * implementation, and the property the layout exists for — a bbox
  * query over the z-ordered table touches a small fraction of the
  * files a hash layout spreads it across.
  */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("zValue matches a reference Morton interleave on a coordinate grid") {
    def ref(ix: Long, iy: Long): Long = {
      var z = 0L
      (0 until 16).foreach(b => z |= (((ix >> b) & 1L) << (2 * b)) | (((iy >> b) & 1L) << (2 * b + 1)))
      z
    }
    val pts = for (i <- 0 until 50) yield (i.toLong, -180.0 + i * 7.13, -90.0 + i * 3.57)
    val got = pts
      .toDF("id", "x", "y")
      .select($"id", ZOrder.zValue($"x", $"y", -180, -90, 180, 90).as("z"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    pts.foreach { case (id, x, y) =>
      val ix = math.min(math.floor(math.rint((x + 180.0) / 360.0 * 65536 * 1e9) / 1e9).toLong, 65535L)
      val iy = math.min(math.floor(math.rint((y + 90.0) / 180.0 * 65536 * 1e9) / 1e9).toLong, 65535L)
      assert(got(id) === ref(ix, iy), s"point $id ($x, $y)")
    }
    // corners: origin is z=0, the opposite corner saturates every bit
    val corners = Seq((0L, -180.0, -90.0), (1L, 179.9999, 89.9999))
      .toDF("id", "x", "y")
      .select($"id", ZOrder.zValue($"x", $"y", -180, -90, 180, 90).as("z"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(corners(0L) === 0L)
    assert(corners(1L) === (1L << 32) - 1)
  }

  test("z-ordered files have tight envelopes: a bbox query touches few files; hash layout touches all") {
    val ev = graft.geo.GeoQueries
      .withLonLat(Tables.eventsRaw(spark, sf0001))
      .select($"event_id", $"lon", $"lat")
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val hDir = java.nio.file.Files.createTempDirectory("graft_hash").toString
    try {
      ZOrder.zorderWrite(ev, "lon", "lat", -180, -90, 180, 90, nFiles = 16, path = zDir)
      ev.repartition(16).write.mode("overwrite").parquet(hDir)

      // per-file spatial envelope, measured from the data itself
      def fileEnvelopes(dir: String) = spark.read
        .parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min($"lon").as("minx"), max($"lon").as("maxx"), min($"lat").as("miny"), max($"lat").as("maxy"))
        .collect()
      val (w, s, e, n) = (10.0, 10.0, 30.0, 30.0) // ~0.3% of the world
      def touched(dir: String): (Int, Int) = {
        val envs = fileEnvelopes(dir)
        (envs.count(r => !(r.getDouble(2) < w || r.getDouble(1) > e || r.getDouble(4) < s || r.getDouble(3) > n)), envs.length)
      }
      val (zTouched, zTotal) = touched(zDir)
      val (hTouched, hTotal) = touched(hDir)
      assert(zTotal === 16 && hTotal === 16)
      assert(hTouched === 16, s"hash layout spreads every region across all files (got $hTouched)")
      assert(zTouched <= 4, s"z-order must confine a small bbox to few files, touched $zTouched/16")

      // correctness unchanged: same rows selected from either layout
      def rows(dir: String) = spark.read
        .parquet(dir)
        .filter($"lon" >= w && $"lon" <= e && $"lat" >= s && $"lat" <= n)
        .select($"event_id").collect().map(_.getLong(0)).toSet
      assert(rows(zDir) === rows(hDir))
    } finally {
      Seq(zDir, hDir).foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }
}
