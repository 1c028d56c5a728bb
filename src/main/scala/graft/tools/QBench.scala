package graft.tools
import org.apache.spark.sql.SparkSession
object QBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    graft.SparkEntry.queries("q1_agg")(spark, sf).count()
    for (q <- args) {
      val fn = graft.SparkEntry.queries(q)
      fn(spark, sf).count()
      val t0 = System.nanoTime(); fn(spark, sf).count()
      println(f"$q%-16s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
