package graft.tools

import graft.{Sessions, SparkEntry}

/** Scaling probe (dev tool): time named lanes at a given SF dir and
  * core count, several cold passes each (staged caches released
  * between passes — the Bench discipline), appending one line per
  * pass to /tmp/graft_scale.txt. Pairs of runs (same SF, 8 vs 32
  * cores) give the core-scaling ratio the r18 verdict asked for: at
  * sf0.1 every lane is overhead-bound (8-core total within 5% of
  * 32-core), so parallelism claims need an SF where compute dominates.
  *
  * Usage: runMain graft.tools.ScaleProbe <sfDir> <cpus> <q1,q2,...> [passes]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1).toInt
    val names = args(2).split(",").toSeq
    val passes = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val out = new java.io.PrintWriter(new java.io.FileWriter("/tmp/graft_scale.txt", true), true)
    out.println(s"[scale] session sfDir=$sfDir cpus=$cpus passes=$passes")
    (1 to passes).foreach { p =>
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val res =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            f"${(System.nanoTime() - t0) / 1e9}%8.2f s"
          } catch {
            case e: Throwable => s"FAILED ${String.valueOf(e.getMessage).take(100)}"
          } finally {
            graft.operators.Staged.releaseAll()
            spark.catalog.clearCache()
            spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
          }
        out.println(f"[scale] sf=$sfDir cpus=$cpus pass=$p $name%-22s $res")
      }
    }
    out.close()
    spark.stop()
  }
}
