package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev utility: dump formatted plans for selected queries to a file so
  * pushdown/codegen can be audited (PushedFilters, ReadSchema,
  * WholeStageCodegen spans).
  */
object ExplainQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_like_scan", "q_temporal_filter", "q_q3_revenue", "q1_agg", "q_dim_rollup", "q_ann_topk")
    val spark = Sessions.local(8)
    val out = new java.io.PrintWriter("/tmp/graft_plans.txt")
    names.foreach { n =>
      out.println(s"===================== $n =====================")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        out.println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => out.println(s"FAILED: ${e.getMessage}") }
      out.flush()
    }
    out.close()
    spark.stop()
  }
}
