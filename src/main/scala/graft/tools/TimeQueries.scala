package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev utility: per-query wall-clock at a given SF dir, printed live. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val spark = Sessions.local(32)
    val out = new java.io.PrintWriter(new java.io.FileWriter("/tmp/graft_times.txt", true), true)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        val t0 = System.nanoTime()
        try {
          // full no-op-sink evaluation — the Bench action (count() would
          // prune heavy final-projection UDFs out of the measurement)
          val df = fn(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          val secs = (System.nanoTime() - t0) / 1e9
          val n = df.count() // untimed sanity count
          out.println(f"[time] $name%-20s $secs%8.2f s  ($n rows)")
        } catch {
          case e: Throwable =>
            out.println(f"[time] $name%-20s FAILED ${String.valueOf(e.getMessage).take(120)}")
        }
      }
    }
    out.close()
    spark.stop()
  }
}
