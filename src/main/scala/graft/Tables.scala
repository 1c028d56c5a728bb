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

  /** Documents rebalanced across the session's shuffle parallelism.
    * The test files are single-row-group parquet, so the scan is ONE
    * task — any per-row-heavy pipeline (md5 sketches, regex token
    * work) would run serially without this. At cluster scale the scan
    * has many splits and this round-robin exchange is ~free relative
    * to the downstream hash work; it is the same safeguard you'd keep
    * against pathologically skewed split sizes. */
  def documentsWide(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
}

/** Shared local SparkSession factory used by tests and mains. */
object Sessions {
  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
