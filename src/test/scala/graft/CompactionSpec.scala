package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Compaction

class CompactionSpec extends SparkSuite {

  private def files = Tables
    .documents(spark, sf0001)
    .select(
      concat(col("source"), lit("/"), lpad(col("doc_id").cast("string"), 6, "0")).as("path"),
      col("source").as("dir"),
      col("n_chars").as("bytes")
    )

  test("two-phase prefix sum equals the single global cumsum rule") {
    val target = 4096L
    val global = files
      .withColumn("cum", sum(col("bytes")).over(Window.orderBy(col("path"))))
      .withColumn("bin", floor((col("cum") - col("bytes")) / target))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val twoPhase = Compaction
      .plan(files, target)
      .select(col("bin"), col("n_files"), col("bytes"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(twoPhase === global)
  }

  test("bins are path-contiguous and within one file of the target") {
    val target = 4096L
    val rows = Compaction.plan(files, target).orderBy(col("bin")).collect()
    val maxFile = files.agg(max(col("bytes"))).head().getLong(0)
    rows.foreach { r =>
      assert(r.getAs[Long]("bytes") <= target + maxFile, s"bin ${r.getLong(0)} overshoots")
    }
    // contiguity: each bin's path range ends before the next begins
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[String]("last_path") < b.getAs[String]("first_path"))
      case _ =>
    }
    // every bin except possibly the last reaches the target
    rows.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("bytes") >= target - maxFile, s"bin ${r.getLong(0)} undershoots")
    }
  }
}
