package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Scale notes: each accessor is a plain parquet scan — Catalyst pushes
  * filters/projections into the scan (check `PushedFilters`/`ReadSchema`
  * in `.explain("formatted")`). At cluster scale the same code reads a
  * partitioned table; nothing here assumes local mode.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader refuses. Read nanos as long (legacy conf) and convert to a
    * microsecond timestamp with integer division — a plain projection,
    * no precision-losing double math on ~1e18 nanos.
    */
  def events(s: SparkSession, d: String): DataFrame =
    eventsRaw(s, d)
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))

  /** Events with `ts` left as the raw epoch-nanos long. Range filters
    * belong HERE (compare against nano literals) so they push into the
    * parquet scan as plain long predicates — a filter on the derived
    * timestamp column cannot push down. */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** Shared local SparkSession factory used by tests and mains. */
object Sessions {
  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
