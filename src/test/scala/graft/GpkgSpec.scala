package graft

import graft.sources.{Gpkg, Sqlite}

/** GPKG reader over a self-built fixture (src/test/resources/sites.gpkg:
  * 30 point features + the GeoPackage metadata tables, written by
  * stock sqlite3). Verifies the SQLite b-tree/record walk, IPK rowid
  * substitution, DDL-derived typing, geometry-blob decode, and the
  * Spark attribute/spatial-filter face.
  */
class GpkgSpec extends SparkSuite {

  private lazy val fixturePath: String =
    new java.io.File(getClass.getResource("/sites.gpkg").toURI).getAbsolutePath

  private lazy val bytes: Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fixturePath))

  test("sqlite_master walk finds the GeoPackage skeleton + feature table") {
    val ts = Gpkg.tables(bytes)
    assert(
      Set("gpkg_contents", "gpkg_spatial_ref_sys", "gpkg_geometry_columns", "sites").subsetOf(ts.keySet)
    )
    val sites = ts("sites")
    assert(sites.columns.map(_.name) === Seq("fid", "name", "kind", "value", "flag", "geom"))
    assert(sites.columns.head.isIpk)
  }

  test("record decode: 30 rows, typed values, rowid materialized into the IPK column") {
    val (_, rows) = Gpkg.readTable(bytes, "sites")
    assert(rows.length === 30)
    val r0 = rows.find(_.head == 1L).get
    assert(r0(1) === "site_00" && r0(2) === "well" && r0(3) === 0.0 && r0(4) === 0L)
    val r7 = rows.find(_.head == 8L).get // fid 8 = i 7
    assert(r7(1) === "site_07" && r7(2) === "tower" && r7(3) === 17.5 && r7(4) === 1L)
    // the metadata tables decode too (srs row carries the EPSG id)
    val (_, srs) = Gpkg.readTable(bytes, "gpkg_spatial_ref_sys")
    assert(srs.exists(r => r(1) == 4326L && r(2) == "EPSG"))
  }

  test("geometry blobs decode: envelope flag honored, WKB point coordinates exact") {
    val (_, rows) = Gpkg.readTable(bytes, "sites")
    rows.foreach { r =>
      val i = r.head.asInstanceOf[Long] - 1
      val (x, y) = Gpkg.parsePoint(r(5).asInstanceOf[Array[Byte]]).get
      assert(x === -10.0 + i * 1.0)
      assert(y === -5.0 + (i * 7 % 20))
    }
    assert(Gpkg.parsePoint("not a geometry".getBytes) === None)
  }

  test("multi-page b-tree + overflow chains: 5000 rows across interior pages decode completely") {
    val big = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.io.File(getClass.getResource("/big.gpkg").toURI).getAbsolutePath)
    )
    val (_, rows) = Gpkg.readTable(big, "readings")
    assert(rows.length === 5000) // 47 pages → interior-page recursion exercised
    // all rowids present exactly once (IPK substitution across every leaf)
    assert(rows.map(_.head.asInstanceOf[Long]).sorted.toSeq === (1L to 5000L))
    // spot values: typed decode across pages
    val r1234 = rows.find(_.head == 1234L).get
    assert(r1234(1) === "st033" && r1234(2) === 1233 * 0.25)
    // the long-note rows spill to overflow pages; the chain must
    // reassemble the full payload (note ~10 KB, several overflow pages)
    val spilled = rows.find(_.head == 998L).get // i=997 → rid 998
    assert(spilled(3).asInstanceOf[String].length === "n997_".length * 2000, "overflow chain truncated")
    assert(spilled(3).asInstanceOf[String].startsWith("n997_n997_"))
  }

  test("Spark face: typed attribute columns + lon/lat, attribute and bbox filters work") {
    import org.apache.spark.sql.functions._
    val df = Gpkg.featureTable(spark, fixturePath, "sites")
    assert(df.count() === 30)
    assert(df.schema("fid").dataType.typeName === "long")
    assert(df.schema("value").dataType.typeName === "double")
    // attribute filter (the vector_query.cpp attribute-filter face)
    assert(df.filter(col("kind") === "well").count() === 10)
    // spatial bbox filter over the decoded coordinates
    val inBox = df.filter(col("lon").between(-5.0, 5.0) && col("lat").between(-5.0, 15.0))
    assert(inBox.count() > 0)
    inBox.collect().foreach { r =>
      val lon = r.getAs[Double]("lon")
      assert(lon >= -5.0 && lon <= 5.0)
    }
    // kind rollup matches the fixture construction (i % 3)
    val byKind = df.groupBy("kind").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind === Map("well" -> 10L, "tower" -> 10L, "pad" -> 10L))
  }

  test("write face: a written GeoPackage round-trips through the reader, metadata intact") {
    val rows = (0 until 200).map { i =>
      (Seq[Any](s"f$i", (i % 4).toLong, i * 0.5), Some((-120.0 + i * 0.1, 30.0 + (i % 50) * 0.2)))
    } :+ ((Seq[Any]("nogeom", 9L, -1.0), Option.empty[(Double, Double)]))
    val bytes = Gpkg.write("obs", Seq("name" -> "TEXT", "kind" -> "INTEGER", "score" -> "REAL"), rows)

    // container metadata (application id "GPKG", required tables)
    assert(new Sqlite.Db(bytes).applicationId == 0x47504b47)
    assert(Sqlite.userVersion(bytes) == 10300)
    val ts = Gpkg.tables(bytes)
    assert(Set("gpkg_contents", "gpkg_spatial_ref_sys", "gpkg_geometry_columns", "obs").subsetOf(ts.keySet))
    val (_, contents) = Gpkg.readTable(bytes, "gpkg_contents")
    assert(contents.head(0) == "obs" && contents.head(1) == "features")
    val (_, srs) = Gpkg.readTable(bytes, "gpkg_spatial_ref_sys")
    assert(srs.exists(r => r(1) == 4326L && r(2) == "EPSG"))
    assert(srs.exists(_(1) == -1L) && srs.exists(_(1) == 0L))

    // feature round-trip through the Spark face (geometry declared
    // POINT per spec, not BLOB — the reader recognizes both)
    val tmp = java.nio.file.Files.createTempFile("graft-gpkg", ".gpkg")
    java.nio.file.Files.write(tmp, bytes)
    try {
      val df = Gpkg.featureTable(spark, tmp.toString, "obs")
      assert(df.count() === 201)
      val r42 = df.filter(org.apache.spark.sql.functions.col("name") === "f42").collect().head
      assert(r42.getAs[Long]("kind") == 2L && r42.getAs[Double]("score") == 21.0)
      assert(math.abs(r42.getAs[Double]("lon") - (-120.0 + 4.2)) < 1e-9)
      assert(math.abs(r42.getAs[Double]("lat") - (30.0 + 42 % 50 * 0.2)) < 1e-9)
      val ng = df.filter(org.apache.spark.sql.functions.col("name") === "nogeom").collect().head
      assert(ng.isNullAt(ng.fieldIndex("lon")))
    } finally java.nio.file.Files.delete(tmp)
  }
}
