package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic distributed graph primitives shared by the raster analytics
  * (stockpile / mask component labeling, ref `stockpile.cpp:498-552`)
  * and the text-curation pipeline (near-dup cluster canonicalization).
  *
  * The one primitive here is min-label connected components as a
  * relational fixpoint: every node ends with the MIN node id of its
  * component. That label rule is deterministic, so a SQL engine can
  * recompute identical labels as a recursive reachability closure —
  * which is what makes CC-derived results oracle-checkable at all.
  */
object Graph {

  /** Min-label propagation to fixpoint over `nodes(id)` with
    * `edges(src,dst)` (directed rows; pass both directions for an
    * undirected graph). Each round takes min over {own label,
    * neighbours' labels, label-of-label} — the pointer-jumping step
    * that makes convergence O(log diameter) rounds rather than
    * O(diameter); convergence is detected by the monotonically
    * decreasing Σ label. Lineage is kept flat with `localCheckpoint`
    * per round (the MLlib iterative pattern). At estate scale the same
    * edge relation feeds alternating large-star/small-star (Kiveris et
    * al., "Connected Components in MapReduce"); this min-propagation
    * is its bounded-diameter special case.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 64): DataFrame = {
    // Size the per-round shuffle to the GRAPH size, not the session
    // default: the fixpoint runs O(log diameter) rounds and a
    // 32-partition shuffle per round over a small frame is pure
    // scheduler overhead. ~2M label rows per partition keeps tasks
    // executor-memory-safe at estate scale while a small graph runs
    // single-task rounds.
    val n = nodes.count()
    val parts = math
      .max(1L, math.min(nodes.sparkSession.conf.get("spark.sql.shuffle.partitions").toLong, n / 2000000L + 1L))
      .toInt
    val e = edges.select(col("src"), col("dst")).repartition(parts, col("src")).localCheckpoint()
    // no edges → every node is its own component; skip the fixpoint
    if (e.isEmpty) return nodes.select(col("id"), col("id").as("lab"))
    var labels = nodes.select(col("id"), col("id").as("lab")).repartition(parts, col("id")).localCheckpoint()
    var prev = Long.MinValue
    var cur = labels.agg(sum("lab")).head().getLong(0)
    var iter = 0
    while (cur != prev && iter < maxIter) {
      prev = cur
      val viaEdge = e
        .join(labels.select(col("id").as("src"), col("lab")), Seq("src"))
        .select(col("dst").as("id"), col("lab"))
      val viaJump = labels
        .select(col("id"), col("lab").as("mid"))
        .join(labels.select(col("id").as("mid"), col("lab").as("jlab")), Seq("mid"))
        .select(col("id"), col("jlab").as("lab"))
      labels = labels
        .union(viaEdge)
        .union(viaJump)
        .repartition(parts, col("id"))
        .groupBy("id")
        .agg(min("lab").as("lab"))
        .localCheckpoint()
      cur = labels.agg(sum("lab")).head().getLong(0)
      iter += 1
    }
    labels
  }
}
