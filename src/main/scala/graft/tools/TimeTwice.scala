package graft.tools
import graft.{Sessions, SparkEntry}
object TimeTwice {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    val fn = SparkEntry.queries(args(0))
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      // Bench action: full no-op-sink evaluation, cold per pass
      fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      graft.operators.Staged.releaseAll()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      println(f"[warm] run $i: $secs%6.2f s")
    }
    spark.stop()
  }
}
