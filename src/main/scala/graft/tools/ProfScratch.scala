package graft.tools

import org.apache.spark.sql.DataFrame

import graft.Sessions

/** Scratch stage profiler for the optimization round — times named
  * sub-stages of a lane in one JVM (noop sink), several passes. */
object ProfScratch {
  def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    // env-parameterized like the bench (r18-advice: this main hardcoded
    // the machine-specific path and core count)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stageTimes = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stageTimes.add((si.stageId, si.name.takeWhile(_ != '\n').take(60), ms, si.numTasks,
          si.taskMetrics.executorRunTime, si.taskMetrics.jvmGCTime))
      }
    })
    val stages: Seq[(String, () => Unit)] =
      args.toSeq.map(q => q -> (() => noop(graft.SparkEntry.queries(q)(spark, sf))))
    (1 to 3).foreach { pass =>
      stages.foreach { case (name, fn) =>
        stageTimes.clear()
        val t0 = System.nanoTime()
        fn()
        val secs = (System.nanoTime() - t0) / 1e9
        graft.operators.Staged.releaseAll()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        println(f"[prof] pass $pass $name%-14s $secs%6.2f s")
        if (pass == 3) {
          import scala.jdk.CollectionConverters._
          val all = stageTimes.asScala.toSeq
          println(f"[prof]   stages=${all.size} sum=${all.map(_._3).sum / 1e3}%.2f s exec=${all.map(_._5).sum / 1e3}%.2f s gc=${all.map(_._6).sum / 1e3}%.2f s")
          all.sortBy(-_._3).take(12).foreach { case (id, n, ms, nt, exec, gc) =>
            println(f"[prof]   stage $id%4d $ms%6d ms exec=$exec%6d gc=$gc%5d tasks=$nt%3d  $n")
          }
        }
      }
    }
    spark.stop()
  }
}
