package graft

import org.apache.spark.sql.functions._

import graft.geo.GeoQueries

/** Tile-pyramid materialization — behavior mirrored from the
  * reference tiler (`gdaltiler.cpp:158-380`, `tests/tiler_test.cpp:
  * 18-230`): per-tile stats over rescaled bytes, pyramid nesting
  * across zooms, and partition-pruned level reads.
  */
class TilePyramidSpec extends SparkSuite {

  private lazy val tiles =
    GeoQueries.tilePyramidQuery(spark, sf0001).cache()

  test("pyramid covers every requested zoom and bytes stay in [0, 255]") {
    val zs = tiles.select("z").distinct().collect().map(_.getInt(0)).sorted
    assert(zs.toSeq == Seq(12, 13, 14))
    val bad = tiles
      .filter(col("byte_min") < 0 || col("byte_max") > 255 || col("byte_min") > col("byte_max"))
      .count()
    assert(bad == 0)
  }

  test("tile ids stay inside the zoom's valid range") {
    val bad = tiles
      .filter(
        col("tx") < 0 || col("ty") < 0 ||
          col("tx") >= pow(lit(2.0), col("z")).cast("long") ||
          col("ty") >= pow(lit(2.0), col("z")).cast("long")
      )
      .count()
    assert(bad == 0)
  }

  test("levels nest: every z tile's parent tile exists at z-1 (tiler_test.cpp pyramid walk)") {
    val children = tiles.filter(col("z") === 14).select((col("tx") / 2).cast("long").as("ptx"), (col("ty") / 2).cast("long").as("pty")).distinct()
    val parents = tiles.filter(col("z") === 13).select(col("tx").as("ptx"), col("ty").as("pty"))
    assert(children.join(parents, Seq("ptx", "pty"), "left_anti").count() == 0)
  }

  test("pixel totals are conserved per level (each pixel lands in exactly one tile)") {
    val totals = tiles.groupBy("z").agg(sum("n_px").as("t")).select("t").distinct().collect()
    assert(totals.length == 1, "every zoom level must see the same pixel count")
  }

  test("materialized pyramid prunes on z: a level-14 read scans only that partition") {
    val dir = java.nio.file.Files.createTempDirectory("tilepyr").toString
    GeoQueries.writeTilePyramid(tiles, dir)
    val level = spark.read.parquet(dir).filter(col("z") === 14)
    val plan = level.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters"), "z must be a partition column")
    assert(raw"PartitionFilters: \[[^\]]".r.findFirstIn(plan).isDefined, s"z=14 filter must prune partitions:\n$plan")
    assert(level.count() == tiles.filter(col("z") === 14).count())
  }
}
