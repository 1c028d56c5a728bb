package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Keyed repartition at the session shuffle width for kernel-heavy
  * bucket tables.
  *
  * The codec-cycle lanes group rows into buckets (`collect_list` per
  * key) and run a CPU-heavy per-bucket kernel UDF. The bucket table is
  * a few MB however much data feeds it, so AQE's byte-based partition
  * coalescing folds the post-agg exchange into one or two tasks and
  * the kernel column runs serially (measured: a 13 s one-task stage on
  * q_pctiler, 2.4 s on q_seqfile at sf0.1). An explicit keyed
  * repartition is user-specified partitioning, which AQE does not
  * coalesce, so buckets spread across the session shuffle width —
  * scale-adaptive via conf (the bench's driver contract sets it to the
  * core count locally), never a hard-coded constant. At 100 TB the
  * extra exchange moves bucket rows once more, which is exactly the
  * byte volume the kernel itself reads — noise next to the kernel
  * cost it parallelizes.
  */
object Spread {
  /** Round-robin repartition at the session shuffle width. NOT keyed —
    * deliberately: a keyed repartition on the grouping keys is
    * satisfied by the aggregation's own hash partitioning, so the
    * planner removes it and the coalescible agg exchange is all that
    * remains (observed on q_seqfile — the plan lost the node). The
    * older codec lanes' former literal repartition-by-32 kept a
    * deterministic kernel above it too (q_wet's plan shows the UDF
    * project above the RoundRobinPartitioning exchange); callers here
    * additionally mark their kernels `.asNondeterministic()` so the
    * placement is pinned by contract, not by the current optimizer's
    * rule inventory. Callers must NOT rely on any key co-location of
    * the output (r18-advice rename: the former `byKeys(df, keys*)`
    * signature read like a keyed repartition). */
  def wide(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
}
