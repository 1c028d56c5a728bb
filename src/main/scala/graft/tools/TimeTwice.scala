package graft.tools
import graft.{Sessions, SparkEntry}
object TimeTwice {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    val fn = SparkEntry.queries(args(0))
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, "/root/testdata/sf0.1").count()
      println(f"[warm] run $i: ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
    }
    spark.stop()
  }
}
