package graft.geo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graph

/** Grid-blocked DBSCAN (Ester et al., KDD 1996) — density clustering
  * as a COMPOSITION of the engine's scale primitives: the eps-grid
  * neighbor join (the [[SpatialJoin]] shape with cell = eps, so a 3×3
  * cell probe provably covers every eps-ball), a partial-agg neighbor
  * count, and min-label connected components over the core-core graph
  * ([[Graph.components]], the union-find + contraction path). Nothing
  * here is new machinery — that is the point: DBSCAN at 100 TB is a
  * blocked self-join plus CC, both already bounded (pair volume by
  * cell density, CC memory by the per-partition edge budget).
  *
  * Semantics: a point is CORE when ≥ minPts OTHER points lie within
  * eps (euclidean, in coordinate space); clusters are connected
  * components of core points under eps-reachability, labeled by min
  * core id; a BORDER point is a non-core point within eps of ≥ 1 core
  * and joins the min-labeled such cluster; everything else is noise.
  * Every rule is deterministic, so a SQL engine replays the exact
  * clustering — including the fp distance compares, which both sides
  * evaluate with the same IEEE expression tree.
  */
object Dbscan {

  /** (id, lon, lat) → per-cluster rollup (cluster_id = min core id,
    * n_core, n_border, id_sum). */
  def cluster(pts: DataFrame, eps: Double, minPts: Int): DataFrame = {
    val cell = (c: Column) => SpatialJoin.cellOf(c, eps)
    val cells = graft.operators.Staged.persist(
      pts.select(
        col("id"),
        col("lon"),
        col("lat"),
        cell(col("lon")).as("cx"),
        cell(col("lat")).as("cy")
      )
    )
    val offsets = Seq(-1L, 0L, 1L)
    val nine = cells
      .withColumn("dx", explode(array(offsets.map(lit): _*)))
      .withColumn("dy", explode(array(offsets.map(lit): _*)))
      .select(col("id"), col("lon"), col("lat"), (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    val right = cells.select(
      col("id").as("ib"),
      col("lon").as("blon"),
      col("lat").as("blat"),
      col("cx"),
      col("cy")
    )
    val pairs = graft.operators.Staged.persist(
      nine
        .join(right, Seq("cx", "cy"))
        .filter(
          col("id") =!= col("ib") &&
            (col("lon") - col("blon")) * (col("lon") - col("blon")) +
            (col("lat") - col("blat")) * (col("lat") - col("blat")) <= lit(eps * eps)
        )
        .select(col("id").as("ia"), col("ib"))
    )
    // core feeds three consumers (both coreEdges sides + the border
    // anti-join) and each un-staged read re-ran the neighbor-count agg
    // over the pair cache — persist the small id set instead
    val core = graft.operators.Staged.persist(
      pairs
        .groupBy(col("ia"))
        .agg(count(lit(1)).as("nn"))
        .filter(col("nn") >= minPts)
        .select(col("ia").as("id"))
    )
    val coreEdges = pairs
      .join(core.select(col("id").as("ia")), Seq("ia"))
      .join(core.select(col("id").as("ib")), Seq("ib"))
      .select(col("ia").as("src"), col("ib").as("dst"))
    // components() sizes its union-find from edges.count(), which would
    // execute the whole coreEdges plan once for the count and again for
    // the build. The cached pair count is a free upper bound on the
    // core-core edge count (coreEdges ⊆ pairs), so pass the partition
    // width explicitly — same ~2M-edges-per-task bound, one execution.
    val ufParts = Graph.ufParts(pts.sparkSession, pairs.count())
    val labels = Graph.components(core, coreEdges, Some(ufParts)) // (id, lab); isolated cores self-label
    val borders = pairs
      .join(core.select(col("id").as("ia"), lit(true).as("__ac")), Seq("ia"), "left")
      .filter(col("__ac").isNull)
      .join(labels.select(col("id").as("ib"), col("lab")), Seq("ib"))
      .groupBy(col("ia"))
      .agg(min(col("lab")).as("lab"))
      .select(col("ia").as("id"), col("lab"))
    labels
      .select(col("id"), col("lab"), lit(1L).as("is_core"))
      .union(borders.select(col("id"), col("lab"), lit(0L).as("is_core")))
      .groupBy(col("lab"))
      .agg(
        sum(col("is_core")).as("n_core"),
        sum(lit(1L) - col("is_core")).as("n_border"),
        sum(col("id")).as("id_sum")
      )
      .select(col("lab").as("cluster_id"), col("n_core"), col("n_border"), col("id_sum"))
  }

  /** md5-uniform point cloud over the event ids — engine-neutral
    * pseudo-random positions (the deterministic lon/lat lattice has a
    * 1.6° minimum pair distance: no density structure to cluster). */
  def hashedPoints(s: SparkSession, dir: String): DataFrame =
    Tables
      .eventsRaw(s, dir)
      .select(
        col("event_id").as("id"),
        (conv(substring(md5(concat(lit("dx:"), col("event_id").cast("string"))), 1, 15), 16, 10)
          .cast("long") % 36000L / 100.0 - 180.0).as("lon"),
        (conv(substring(md5(concat(lit("dy:"), col("event_id").cast("string"))), 1, 15), 16, 10)
          .cast("long") % 18000L / 100.0 - 90.0).as("lat")
      )

  /** ◆ q_dbscan — minPts = 4 over the hashed event points with eps
    * scaled to constant EXPECTED DEGREE: eps = 2°·√(10⁴/n). A fixed
    * eps percolates as density grows (at 10× the points the whole
    * plane is one giant cluster — degenerate output AND a giant-
    * component CC); holding mean degree constant keeps the cluster
    * structure, and the cost, scale-invariant (~260 clusters at
    * sf0.01, where the formula gives exactly 2.0). Both engines
    * compute eps with the same IEEE sqrt, so discretization ties
    * agree. */
  def dbscanQuery(s: SparkSession, dir: String): DataFrame = {
    val pts = hashedPoints(s, dir)
    val eps = 2.0 * math.sqrt(10000.0 / pts.count())
    cluster(pts, eps, minPts = 4)
  }
}
