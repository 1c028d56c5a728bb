package graft

import org.apache.spark.sql.functions._

import graft.ann.Similarity
import graft.core.{Mutations, Passwords}
import graft.model.{Entry, EntryType, MetaRow}

/** Move/delete cascade matrix (`tests/ddb_test.cpp:84-448`, `847-983`)
  * + IVF search + extensions injection + password rows.
  */
class MutationsIvfSpec extends SparkSuite {
  import spark.implicits._
  implicit private def s = spark

  private def e(path: String, tpe: Int = EntryType.Generic): Entry =
    Entry(path, if (tpe == EntryType.Directory) "" else "h", tpe, "{}", 100L, 10L,
      path.count(_ == '/'), None, None)

  private lazy val entries = Seq(
    e("photos", EntryType.Directory),
    e("photos/a.jpg", EntryType.Image),
    e("photos/b.jpg", EntryType.Image),
    e("other.bin")
  ).toDF()

  private lazy val meta = Seq(
    MetaRow("m1", "photos/a.jpg", "annotations", "\"x\"", 100),
    MetaRow("m2", "other.bin", "visibility", "1", 100)
  ).toDF()

  test("delete folder cascades to children and their meta") {
    val (e2, m2, removed) = Mutations.removeEntries(entries, meta, "photos")
    assert(removed.count() === 3)
    assert(e2.select("path").collect().map(_.getString(0)).toSet === Set("other.bin"))
    assert(m2.select("id").collect().map(_.getString(0)).toSet === Set("m2")) // m1 cascaded
  }

  test("delete by wildcard") {
    val (e2, _, removed) = Mutations.removeEntries(entries, meta, "*.jpg")
    assert(removed.count() === 2)
    assert(e2.count() === 2)
  }

  test("move file: path, depth, meta follow; type re-dispatch on ext change") {
    val (e2, m2) = Mutations.moveEntry(entries, meta, "photos/a.jpg", "renamed.md")
    val moved = e2.filter($"path" === "renamed.md").head()
    assert(moved.getAs[Int]("depth") === 0)
    assert(moved.getAs[Int]("entryType") === EntryType.Markdown) // .jpg -> .md re-fingerprint
    assert(m2.filter($"id" === "m1").select("path").head().getString(0) === "renamed.md")
  }

  test("move folder carries children; dirs keep type") {
    val (e2, m2) = Mutations.moveEntry(entries, meta, "photos", "imgs")
    val paths = e2.select("path").collect().map(_.getString(0)).toSet
    assert(paths === Set("imgs", "imgs/a.jpg", "imgs/b.jpg", "other.bin"))
    assert(e2.filter($"path" === "imgs").head().getAs[Int]("entryType") === EntryType.Directory)
    assert(m2.filter($"id" === "m1").select("path").head().getString(0) === "imgs/a.jpg")
  }

  test("move errors: missing source, existing dest, move into own subtree") {
    intercept[IllegalArgumentException](Mutations.moveEntry(entries, meta, "nope", "x"))
    intercept[IllegalArgumentException](Mutations.moveEntry(entries, meta, "photos/a.jpg", "other.bin"))
    intercept[IllegalArgumentException](Mutations.moveEntry(entries, meta, "photos", "photos/sub"))
  }

  test("ivf assign + search prunes to probed cells but finds true neighbors") {
    val emb = Tables.embeddings(spark, sf0001)
    val centroids = Similarity.seedCentroids(spark, sf0001, nCells = 8)
      .persist()
    val assigned = Similarity.ivfAssign(emb, centroids).persist()
    assert(assigned.count() === emb.count()) // every vector lands in exactly one cell
    assert(assigned.select("cell_id").distinct().count() <= 8)

    // query = vector 0; brute-force truth over all cells
    val qv = emb.filter($"vec_id" === 0)
      .select(transform($"embedding", _.cast("double"))).head().getSeq[Double](0)
    val ivf = Similarity.ivfSearch(spark, assigned, centroids, qv, k = 5, nProbe = 8)
      .collect().map(_.getLong(0))
    val brute = Similarity.bruteForceTopK(spark, sf0001, queryId = 0, k = 5)
      .collect().map(_.getLong(0))
    // with nProbe = all cells, IVF must agree with brute force (minus self)
    assert(ivf.filter(_ != 0L).take(4).toSeq === brute.take(4).toSeq)

    // refine step keeps shapes
    val refined = Similarity.refineCentroids(assigned)
    assert(refined.count() <= 8)
    assert(refined.select(size($"centroid")).head().getInt(0) === 64)
  }

  test("extensions class wires both vec functions without error") {
    // getOrCreate would return the already-active shared session, so
    // apply the extension object directly; expression correctness is
    // covered by VectorExprSpec through the registry path.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
  }

  test("build-dependency join: pending vs built by content hash") {
    import graft.core.Builds
    val idx = Seq(
      ("cloud.las", "h1", EntryType.PointCloud),
      ("ortho.tif", "h2", EntryType.GeoRaster),
      ("photo.jpg", "h3", EntryType.Image), // not buildable
      ("mesh.obj", "h4", EntryType.Model)
    ).toDF("path", "hash", "entryType")
    val artifacts = Seq(Tuple1("h2")).toDF("hash")
    val pending = Builds.pendingBuilds(idx, artifacts).select("path").collect().map(_.getString(0)).toSet
    assert(pending === Set("cloud.las", "mesh.obj"))
    val built = Builds.builtEntries(idx, artifacts).select("path").collect().map(_.getString(0)).toSet
    assert(built === Set("ortho.tif"))
  }

  test("thermal sensor heuristic tags properties") {
    import graft.sources.Extractors
    val jpeg = ExifFixtures.buildJpegWithExif(ExifFixtures.buildTiff(make = "FLIR", model = "Vue Pro R"))
    assert(Extractors.extract("t.jpg", jpeg).properties.contains("\"sensorCategory\":\"thermal\""))
    val normal = ExifFixtures.buildJpegWithExif(ExifFixtures.buildTiff())
    assert(!Extractors.extract("n.jpg", normal).properties.contains("sensorCategory"))
  }

  test("password salt+hash roundtrip") {
    val row = Passwords.mkRow("hunter2", "somesalt")
    assert(Passwords.verify(row, "hunter2"))
    assert(!Passwords.verify(row, "hunter3"))
    assert(row.hash != Passwords.hashPassword("hunter2", "othersalt"))
  }
}
