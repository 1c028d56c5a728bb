package graft

import graft.geo.Mvt

/** MVT wire-format round-trip: the protobuf envelope around the
  * oracle-verified command integers (q_mvt hash-checks the integers;
  * this spec proves the bytes carry exactly those integers).
  */
class MvtSpec extends SparkSuite {

  test("zigzag/varint primitives round-trip across the full range") {
    val vals = Seq(0L, 1L, -1L, 63L, -64L, 64L, 300L, -4096L, 123456789L, Long.MaxValue / 2, Long.MinValue / 2)
    vals.foreach(v => assert(Mvt.unzigzag(Mvt.zigzag(v)) === v))
    // varint round-trip via a tiny packed feature
    val cmds = Seq(9L, 0L, 0L, 127L, 128L, 300L, 16383L, 16384L)
    val bytes = Mvt.encodeTile("t", Seq(Mvt.Feature(7L, 1, cmds)))
    val dec = Mvt.decodeTile(bytes)
    assert(dec.features.head.commands === cmds)
  }

  test("encodeTile → decodeTile preserves layer header, feature, tags, keys") {
    val pts = Seq((5L, 10L), (5L, 12L), (100L, 3L))
    val cmds = Mvt.pointCommands(pts)
    assert(cmds.head === Mvt.command(1, 3)) // MoveTo ×3
    assert(cmds.length === 1 + 2 * pts.length)
    val bytes = Mvt.encodeTile(
      "events",
      Seq(Mvt.Feature(42L, 1, cmds, tags = Seq(0L, 0L))),
      keys = Seq("n_points"),
      intValues = Seq(3L)
    )
    val dec = Mvt.decodeTile(bytes)
    assert(dec.version === 2L)
    assert(dec.name === "events")
    assert(dec.extent === 4096L)
    assert(dec.keys === Seq("n_points"))
    val f = dec.features.head
    assert(f.id === 42L)
    assert(f.geomType === 1)
    assert(f.tags === Seq(0L, 0L))
    // unzigzag the deltas back to the original absolute points
    val deltas = f.commands.drop(1).map(Mvt.unzigzag)
    val rebuilt = deltas
      .grouped(2)
      .scanLeft((0L, 0L)) { case ((x, y), Seq(dx, dy)) => (x + dx, y + dy) }
      .drop(1)
      .toSeq
    assert(rebuilt === pts)
  }

  test("mvtTiles bytes decode to EXACTLY the oracle-verified command stream per tile") {
    import org.apache.spark.sql.functions._
    val tiles = graft.geo.GeoQueries
      .mvtTiles(spark, sf0001, z = 5)
      .select(col("tx"), col("ty"), col("mvt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Array[Byte]](2))
      .toMap
    val oracle = graft.geo.GeoQueries
      .mvtQuery(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(4))))
      .toMap
    assert(tiles.keySet === oracle.keySet)
    assert(tiles.nonEmpty)
    tiles.foreach { case (k, bytes) =>
      val dec = Mvt.decodeTile(bytes)
      val f = dec.features.head
      val (nPoints, cmdMd5) = oracle(k)
      assert((f.commands.head >> 3) === nPoints, s"tile $k MoveTo count")
      // the decoded packed varints hash to the same digest DuckDB verified
      val digest = java.security.MessageDigest
        .getInstance("MD5")
        .digest(f.commands.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_))
        .mkString
      assert(digest === cmdMd5, s"tile $k command stream diverged from the oracle row")
    }
  }
}
