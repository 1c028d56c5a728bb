package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.stac.Stac

/** Scalar-function surface (SURVEY §2.7) exposed as oracle-checkable
  * queries over the test tables: slugify, base64 href encoding, path
  * derivation (depth / parent / extension). All codegen'd column
  * expressions — per-row map work that scales with input splits.
  */
object Scalars {

  /** ◆ slugify over part names — ref `stac.cpp:53-84`. */
  def slugifyQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .part(s, dir)
      .select(Stac.slugify($"p_name").as("slug"))
      .distinct()
  }

  /** ◆ base64 href tokens — ref `stac.cpp:447`, `569`. */
  def base64Query(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .customer(s, dir)
      .select($"c_custkey", base64($"c_name".cast("binary")).as("href_token"))
  }

  /** ◆ path derivation — depth / parent / extension / LIKE scoping
    * (ref `dbops.cpp:1296`, `mio.cpp` path helpers) over synthetic
    * paths built from the documents table. */
  def pathOpsQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .documents(s, dir)
      .withColumn("path", concat($"source", lit("/"), $"lang", lit("/doc_"), $"doc_id", lit(".txt")))
      .select(
        $"doc_id",
        $"path",
        (size(split($"path", "/")) - 1).as("depth"),
        regexp_replace($"path", "/[^/]*$", "").as("parent"),
        element_at(split($"path", "\\."), -1).as("ext")
      )
      .filter($"path".like("src1%"))
  }
}
