package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Edge row for the phase-1 union-find (public: Catalyst's generated
    * deserializer must be able to instantiate it). */
  case class E(src: Long, dst: Long)

  /** Union-find / fixpoint partition width for a row count: ~2M rows
    * per task bounds phase-1 memory, capped at the session shuffle
    * width. The ONE place this sizing lives (r18-advice: Dbscan carried
    * a duplicated copy that could silently drift). */
  def ufParts(s: SparkSession, rows: Long): Int =
    math
      .max(1L, math.min(s.conf.get("spark.sql.shuffle.partitions").toLong, rows / 2000000L + 1L))
      .toInt

  /** Min-label connected components via local-CC + contraction
    * (Kiveris et al., "Connected Components in MapReduce") — the
    * preferred entry point: phase 1 runs a union-find over each EDGE
    * partition in one `mapPartitions` pass (memory bounded by the
    * per-partition edge budget), phase 2 runs the
    * [[connectedComponents]] min-label fixpoint only on the CONTRACTED
    * graph — nodes = phase-1 roots, edges = roots sharing a node — so
    * the O(log diameter) rounds iterate over boundary-sized data, and
    * a graph that fits one partition (or whose components never span
    * two) skips the fixpoint entirely: the whole labeling is one pass
    * plus one small join. Same deterministic label rule as the
    * fixpoint (every node ends with the MIN node id of its component),
    * so oracle closures recompute identical labels.
    *
    * `edges` may be directed pair rows; direction is irrelevant to a
    * union-find and the contraction handles symmetry internally.
    * `nodes(id)` supplies isolated nodes (labeled with themselves).
    */
  def components(nodes: DataFrame, edges: DataFrame, partitions: Option[Int] = None): DataFrame = {
    val s = nodes.sparkSession
    import s.implicits._
    // size the edge partitioning to the graph (~2M edges per union-find
    // task bounds phase-1 memory); callers can pin it (tests exercise
    // the contraction path that way)
    val parts = partitions.getOrElse(ufParts(s, edges.count()))
    // phase 1: per-partition union-find over the edges that land there;
    // emits (node, local root) for every node the partition saw.
    // checkpointOwned: the blocks are released below, as soon as the
    // labeling that consumes them has materialized.
    val (local, localBlocks) = Staged.checkpointOwned(
      edges
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .repartition(parts, col("src"))
        .as[E]
        .mapPartitions { it =>
          val parent = new java.util.HashMap[Long, Long]()
          val seen = new java.util.HashSet[Long]()
          def find(a: Long): Long = {
            var r = a
            while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
            var c = a
            while (parent.getOrDefault(c, c) != c) { val nx = parent.getOrDefault(c, c); parent.put(c, r); c = nx }
            r
          }
          it.foreach { e =>
            seen.add(e.src); seen.add(e.dst)
            val ra = find(e.src); val rb = find(e.dst)
            if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
          }
          val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](seen.size())
          val i2 = seen.iterator()
          while (i2.hasNext) { val id = i2.next(); out += ((id, find(id))) }
          out.iterator
        }
        .toDF("id", "root")
    )
    try {
      val isolated = nodes
        .select(col("id"))
        .join(local.select(col("id")).distinct(), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("lab"))
      if (parts == 1)
        return Staged.checkpoint(local.select(col("id"), col("root").as("lab")).union(isolated))
      // phase 2: a node seen by several partitions links its roots;
      // fixpoint over the contracted root graph only
      val minRoot = local.groupBy("id").agg(min("root").as("mroot"))
      val cross = local
        .join(minRoot, Seq("id"))
        .filter(col("root") =!= col("mroot"))
        .select(col("mroot").as("src"), col("root").as("dst"))
        .distinct()
      if (cross.isEmpty)
        return Staged.checkpoint(local.select(col("id"), col("root").as("lab")).distinct().union(isolated))
      val rootNodes = local.select(col("root").as("id")).distinct()
      val (fixedRaw, fixedBlocks) =
        connectedComponentsOwned(rootNodes, cross.union(cross.select(col("dst").as("src"), col("src").as("dst"))), 64)
      val fixed = fixedRaw.select(col("id").as("root"), col("lab"))
      try
        Staged.checkpoint(
          local
            .join(fixed, Seq("root"))
            .groupBy("id")
            .agg(min("lab").as("lab"))
            .union(isolated)
        )
      finally Staged.release(fixedBlocks)
    } finally Staged.release(localBlocks)
    // every branch returns an EAGER Staged.checkpoint of the final
    // labeling, so releasing the phase-1/phase-2 blocks here is safe:
    // the result no longer has lineage into them. The result's own
    // blocks are registered with Staged for the caller's releaseAll.
  }

  /** Min-label propagation to fixpoint over `nodes(id)` with
    * `edges(src,dst)` (directed rows; pass both directions for an
    * undirected graph). Each round takes min over {own label,
    * neighbours' labels, label-of-label} — the pointer-jumping step
    * that makes convergence O(log diameter) rounds rather than
    * O(diameter); convergence is detected by the (Σ label, XOR label)
    * pair going stationary. Lineage is kept flat with `localCheckpoint`
    * per round (the MLlib iterative pattern). At estate scale the same
    * edge relation feeds alternating large-star/small-star (Kiveris et
    * al., "Connected Components in MapReduce"); this min-propagation
    * is its bounded-diameter special case.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 64): DataFrame = {
    val (labels, blocks) = connectedComponentsOwned(nodes, edges, maxIter)
    // the result frame IS its checkpoint blocks — register them for the
    // caller's Staged.releaseAll rather than leaking until GC
    Staged.register(blocks)
    labels
  }

  /** [[connectedComponents]] with the result's checkpoint blocks handed
    * to the caller (internal: [[components]] releases them as soon as
    * its contraction join has materialized). */
  private[graft] def connectedComponentsOwned(
      nodes: DataFrame,
      edges: DataFrame,
      maxIter: Int
  ): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    // Size the per-round shuffle to the GRAPH size, not the session
    // default: the fixpoint runs O(log diameter) rounds and a
    // 32-partition shuffle per round over a small frame is pure
    // scheduler overhead. ~2M label rows per partition keeps tasks
    // executor-memory-safe at estate scale while a small graph runs
    // single-task rounds.
    val parts = ufParts(nodes.sparkSession, nodes.count())
    val (e, eBlocks) = Staged.checkpointOwned(edges.select(col("src"), col("dst")).repartition(parts, col("src")))
    // no edges → every node is its own component; skip the fixpoint
    if (e.isEmpty) {
      Staged.release(eBlocks)
      return (nodes.select(col("id"), col("id").as("lab")), Nil)
    }
    var (labels, labelBlocks) =
      Staged.checkpointOwned(nodes.select(col("id"), col("id").as("lab")).repartition(parts, col("id")))
    // Convergence probe: (Σ lab, XOR lab) over all nodes. The sum alone
    // is monotonically non-increasing but lives in a wrapped Long — with
    // 60-bit ids a per-round decrease can exceed 2^64 and alias the
    // previous total. A spurious exit then needs the XOR (an independent
    // 64-bit digest of the exact label multiset restricted to odd
    // multiplicities) to collide in the same round; labels only change
    // by whole-component relabelings, so the pair colliding while any
    // label actually moved has no structural cause — it requires two
    // simultaneous 64-bit accidents.
    def probe(df: DataFrame): (Long, Long) = {
      val r = df.agg(sum("lab"), bit_xor(col("lab"))).head()
      (r.getLong(0), r.getLong(1))
    }
    var prev = (Long.MinValue, Long.MinValue)
    var cur = probe(labels)
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
      val (next, nextBlocks) = Staged.checkpointOwned(
        labels
          .union(viaEdge)
          .union(viaJump)
          .repartition(parts, col("id"))
          .groupBy("id")
          .agg(min("lab").as("lab"))
      )
      // round n is materialized (checkpointOwned is eager) — round n−1's
      // blocks are dead; dropping them caps fixpoint storage at two
      // rounds instead of O(rounds) blocks leaking until GC
      Staged.release(labelBlocks)
      labels = next
      labelBlocks = nextBlocks
      cur = probe(labels)
      iter += 1
    }
    Staged.release(eBlocks)
    (labels, labelBlocks)
  }

  /** PageRank (power iteration, damping 0.85) — the classic page-level
    * quality signal of a web-scale pretraining corpus (CommonCrawl
    * ranking). Ranks ride as SCALED INTEGERS (units of 10^-12): every
    * per-edge contribution is floored in integer math, so the
    * per-node sums are order-independent BIGINT additions — no float
    * accumulation order to diverge across engines, partitionings or
    * runs, which is what makes a 10-round iterative result
    * hash-oracle-able at all. Truncation only ever LOSES mass (≤ 1
    * unit per edge per round — GraphSpec bounds the total), it
    * never reorders ranks materially.
    *
    * Per round: one join edges⋈ranks + one partial-agg sum keyed by
    * dst (shuffle is edge-sized), a left-anti dangling-mass aggregate
    * that stays IN the plan (a broadcast 1-row crossJoin — no driver
    * action; the only action per round is the flat-lineage
    * materialization itself), and a node-sized left join; lineage kept
    * flat with [[Staged.checkpointOwned]] per round, round n−1 blocks
    * released as round n materializes — the CC fixpoint pattern.
    * Dangling mass is redistributed uniformly (standard treatment).
    */
  def pageRank(
      nodes: DataFrame, // (id)
      edges: DataFrame, // (src, dst) — simple directed edges
      iters: Int = 10,
      scale: Long = 1000000000000L
  ): DataFrame = {
    val n = nodes.count()
    require(n > 0, "pageRank needs at least one node")
    val basePart = 15L * scale / (100L * n)
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val (e, eBlocks) = Staged.checkpointOwned(
      edges.join(outdeg, Seq("src")).select(col("src"), col("dst"), col("deg"))
    )
    val (nd, ndBlocks) = Staged.checkpointOwned(nodes.select(col("id")))
    var (r, rBlocks) = Staged.checkpointOwned(nd.select(col("id"), lit(scale / n).as("r")))
    // out-edge endpoints are static across rounds — compute the probe
    // side of the dangling anti-join once
    val (srcs, srcBlocks) = Staged.checkpointOwned(e.select(col("src").as("id")).distinct())
    var i = 0
    while (i < iters) {
      // dangling mass: ranks of nodes with no out-edges — a 1-row
      // aggregate kept IN the plan and broadcast under the per-node add
      // (node-bounded anti-join, never row data, no driver round-trip)
      val dang = r
        .join(srcs, Seq("id"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
      val contrib = e
        .join(r, e("src") === r("id"))
        .select(col("dst").as("id"), expr("(85 * r) div (100 * deg)").as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).as("c"))
      val (next, nextBlocks) = Staged.checkpointOwned(
        nd.join(contrib, Seq("id"), "left")
          .crossJoin(broadcast(dang))
          // `div`, not `/`: Column `/` on longs is DOUBLE division
          .select(
            col("id"),
            expr(s"coalesce(c, ${0L}L) + ${basePart}L + (85L * dang) div ${100L * n}L").as("r")
          )
      )
      Staged.release(rBlocks)
      r = next
      rBlocks = nextBlocks
      i += 1
    }
    Staged.release(srcBlocks)
    Staged.release(eBlocks)
    Staged.release(ndBlocks)
    Staged.register(rBlocks)
    r
  }

  /** Triangle counting via degree-ordered orientation (Cohen 2009
    * "Graph twiddling in a MapReduce world"; the Schank–Wagner
    * forward algorithm relationally): each undirected edge is oriented
    * toward the higher (degree, id) rank, which caps every node's
    * out-degree at O(√m), so the wedge self-join — the only quadratic
    * risk — generates at most m^1.5 candidate wedges instead of
    * Σ deg². A triangle has exactly ONE vertex whose two edges both
    * point away (its lowest-rank corner), so closing wedges against
    * the canonical a<b edge set counts each triangle exactly once —
    * no distinct over triangles. Returns one row per triangle
    * (u, w1, w2 with w1 < w2).
    */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und
      .select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v")
      .agg(count(lit(1)).as("deg"))
    val ranked = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(
          col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w"))
        ).otherwise(struct(col("b").as("u"), col("a").as("w"))).as("e")
      )
      .select(col("e.u").as("u"), col("e.w").as("w"))
    val wedges = ranked
      .select(col("u"), col("w").as("w1"))
      .join(ranked.select(col("u"), col("w").as("w2")), Seq("u"))
      .filter(col("w1") < col("w2"))
    wedges.join(und.select(col("a").as("w1"), col("b").as("w2")), Seq("w1", "w2"))
  }

  /** ◆ Triangle counts under the oracle: the deterministic 500-node
    * event graph (undirected form of the pageRank edges), per-node
    * triangle participation for every node (0 included) — DuckDB
    * replays the identical orientation and joins. */
  def trianglesQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.eventsRaw(s, dir)
    val edges = ev
      .select((col("event_id") % 500).as("src"), (col("event_id") * 7919 % 500).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val tri = triangles(edges)
    val perNode = tri
      .select(explode(array(col("u"), col("w1"), col("w2"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_tri"))
    s.range(500)
      .select(col("id").as("node"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** ◆ PageRank under the oracle: a deterministic 500-node link graph
    * from events (src = id mod 500, dst = id·7919 mod 500, self-loops
    * dropped, distinct), 10 integer-arithmetic rounds — DuckDB replays
    * the identical rounds as a generated CTE chain and every scaled
    * rank must match to the unit. */
  def pageRankQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.eventsRaw(s, dir)
    val edges = ev
      .select((col("event_id") % 500).as("src"), (col("event_id") * 7919 % 500).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    pageRankBounded(500, edges).select(col("id").as("node"), col("r").as("rank_e12"))
  }

  /** Deterministic random walks — the graph-sampling primitive under
    * DeepWalk/node2vec-style representation learning (Perozzi et al.,
    * KDD 2014): one fixed-length walk per start node, where step t
    * from node v picks the neighbor ranked `md5₆₀("rw:start:t:v") mod
    * deg(v)` in dst order. The hash seeds the walk per (start, step,
    * node), so walks are decorrelated yet a pure function of the edge
    * set — any engine replays them bit-for-bit (the property that
    * makes a walk corpus reproducible across reruns at 100 TB).
    * Dangling nodes hold position (left join + coalesce).
    *
    * Shape: the ranked adjacency (src, dst, deg, rank) is built once —
    * a partial-agg degree count and a per-src window (bounded by
    * degree, keyed by a column whose domain grows with the graph) —
    * and each step is one equi-join on v = src with the rank-match as
    * the join residual. steps × one shuffle; no driver loop over rows.
    */
  def randomWalks(nodes: DataFrame, edges: DataFrame, steps: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ranked = Staged.persist(
      edges
        .join(deg, "src")
        .withColumn("rk", row_number().over(Window.partitionBy(col("src")).orderBy(col("dst"))) - 1)
    )
    var walks = nodes.select(col("id").as("start"), col("id").as("v"))
    for (t <- 0 until steps) {
      val r = ranked.select(
        col("src").as(s"__src$t"),
        col("dst").as(s"__dst$t"),
        col("deg").as(s"__deg$t"),
        col("rk").as(s"__rk$t")
      )
      val u = conv(
        substring(
          md5(concat(lit("rw:"), col("start").cast("string"), lit(s":$t:"), col("v").cast("string"))),
          1,
          15
        ),
        16,
        10
      ).cast("long")
      val kept = col("start") +: (1 to t).map(i => col(s"s$i"))
      walks = walks
        .join(r, col("v") === col(s"__src$t") && col(s"__rk$t") === pmod(u, col(s"__deg$t")), "left")
        .select(kept :+ coalesce(col(s"__dst$t"), col("v")).as(s"s${t + 1}"): _*)
        .withColumn("v", col(s"s${t + 1}"))
    }
    walks.drop("v")
  }

  /** Synchronous label propagation (Raghavan et al. 2007, the LPA
    * community-detection baseline) with DETERMINISTIC tie-breaking:
    * every node starts as its own label; each round it adopts the most
    * frequent label among its neighbors, ties to the SMALLEST label,
    * isolated nodes keep their own. Fixed round count + total tie
    * order make the result a pure function of the edge set (async LPA
    * is run-order dependent — useless under an oracle).
    *
    * Per round: one keyed count agg over (node, neighbor-label) and a
    * per-node top-1 window (bounded by a node's distinct neighbor
    * labels), then a left join back to all nodes — edge-partitioned
    * shuffles only, labels checkpointed per round so lineage stays
    * flat (the pageRank discipline). */
  def labelPropagation(nodes: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (sym, symBlocks) = Staged.checkpointOwned(
      edges
        .select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
    )
    val (nd, ndBlocks) = Staged.checkpointOwned(nodes.select(col("id")))
    var (labels, labBlocks) = Staged.checkpointOwned(nd.select(col("id"), col("id").as("lab")))
    var t = 0
    while (t < rounds) {
      val top = sym
        .join(labels.select(col("id").as("dst"), col("lab")), Seq("dst"))
        .groupBy(col("src"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn(
          "rk",
          row_number().over(Window.partitionBy(col("src")).orderBy(col("cnt").desc, col("lab").asc))
        )
        .filter(col("rk") === 1)
        .select(col("src").as("id"), col("lab").as("newlab"))
      val (next, nextBlocks) = Staged.checkpointOwned(
        labels
          .join(top, Seq("id"), "left")
          .select(col("id"), coalesce(col("newlab"), col("lab")).as("lab"))
      )
      Staged.release(labBlocks)
      labels = next
      labBlocks = nextBlocks
      t += 1
    }
    Staged.release(symBlocks)
    Staged.release(ndBlocks)
    Staged.register(labBlocks)
    labels
  }

  /** ◆ q_label_prop — 5 synchronous LPA rounds on the events graph,
    * rolled up per community. */
  def labelPropQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.eventsRaw(s, dir)
    val edges = ev
      .select((col("event_id") % 500).as("src"), (col("event_id") * 7919 % 500).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    labelPropagationBounded(500, edges, rounds = 5)
      .groupBy(col("lab"))
      .agg(count(lit(1)).as("n_members"), sum(col("id")).as("member_id_sum"))
      .select(col("lab").as("community"), col("n_members"), col("member_id_sum"))
  }

  /** ◆ q_random_walk — 4-step walks from every node of the events
    * graph (same derivation as q_pagerank). */
  def randomWalkQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.eventsRaw(s, dir)
    val edges = ev
      .select((col("event_id") % 500).as("src"), (col("event_id") * 7919 % 500).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    randomWalks(s.range(500).select(col("id")), edges, steps = 4)
  }

  /** k-core decomposition for a fixed k (Seidman 1983; the Batagelj–
    * Zaveršnik peeling run SYNCHRONOUSLY): each round drops every node
    * whose degree within the surviving subgraph is < k; after enough
    * rounds the survivors are exactly the k-core. Synchronous rounds
    * make the trajectory a pure function of the edge set (sequential
    * peeling is order-dependent mid-stream even though its fixpoint is
    * unique), so a fixed round count is oracle-replayable and the
    * fixpoint, once reached, is stable under further rounds.
    *
    * Per round: two semi-join filters of the symmetric edge list
    * against the survivor set + one keyed count — all shuffles keyed
    * on node id, survivor frames checkpointed per round (the LPA/
    * pageRank lineage discipline). At 100 TB the edge list is the big
    * table and every pass is one edge-partitioned join; nothing
    * collects.
    *
    * Returns the surviving nodes with their within-core degree.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val (sym, symBlocks) = Staged.checkpointOwned(
      edges
        .select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
    )
    def coreDeg(surv: DataFrame): DataFrame = sym
      .join(surv.select(col("id").as("src")), Seq("src"))
      .join(surv.select(col("id").as("dst")), Seq("dst"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("d"))
    var (surv, survBlocks) = Staged.checkpointOwned(sym.select(col("src").as("id")).distinct())
    for (_ <- 1 to rounds) {
      val (next, nextBlocks) = Staged.checkpointOwned(
        coreDeg(surv).filter(col("d") >= k).select(col("src").as("id"))
      )
      Staged.release(survBlocks)
      surv = next
      survBlocks = nextBlocks
    }
    val out = coreDeg(surv).select(col("src").as("node"), col("d").as("core_deg"))
    Staged.register(symBlocks)
    Staged.register(survBlocks)
    out
  }

  /** ◆ q_kcore — the 20-core of a deterministic md5-skewed attachment
    * graph over the events (low ids accumulate degree, so peeling
    * strips the high-id fringe over several rounds: 8 synchronous
    * rounds reach the fixpoint at sf0.01). Domain is 500 nodes by
    * construction → the bounded single-task replay. */
  def kCoreQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.eventsRaw(s, dir)
    def h60(prefix: String): org.apache.spark.sql.Column =
      conv(substring(md5(concat(lit(prefix), col("event_id").cast("string"))), 1, 15), 16, 10)
        .cast("long")
    val edges = ev
      .select((h60("ks:") % 500).as("src"), col("event_id"))
      .select(col("src"), (h60("kd:") % (col("src") + 1)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    kCoreBounded(edges, k = 20, rounds = 8, maxNodes = 512)
  }

  // ------------------------------------------- bounded-domain twins

  /** Single-task synchronous replays for DOMAIN-BOUNDED graphs.
    *
    * When the node domain is capped by construction (the q lanes
    * derive ≤500-node graphs via mod), the 100 TB-correct plan keeps
    * the BIG stage distributed — the events-scale edge dedup feeding
    * these calls, which scales with the data — but runs the rounds in
    * ONE bounded task instead of rounds × shuffles over an
    * SF-invariant frame: the iteration cost is a property of the
    * domain, not the data. The trajectory is the same synchronous,
    * deterministic one, so rows are IDENTICAL to the distributed
    * twins (GraphBoundedSpec gates row-for-row equality on the same
    * derivations). A graph that overflows `maxNodes` fails loudly —
    * use the distributed operator for unbounded graphs.
    *
    * The `repartition(1)` sits AFTER the parallel dedup, so the one
    * task receives only the bounded distinct edge set. */
  def kCoreBounded(edges: DataFrame, k: Int, rounds: Int, maxNodes: Int): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val sym = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .union(edges.select(col("dst").cast("long").as("src"), col("src").cast("long").as("dst")))
      .distinct()
    sym
      .repartition(1)
      .as[E]
      .mapPartitions { it =>
        val adj = new java.util.HashMap[Long, java.util.ArrayList[Long]]()
        it.foreach { e =>
          adj.computeIfAbsent(e.src, _ => new java.util.ArrayList[Long]()).add(e.dst)
          require(adj.size <= maxNodes, s"kCoreBounded: domain overflow (> $maxNodes nodes) — use kCore")
        }
        val surv = new java.util.HashSet[Long](adj.keySet())
        var t = 0
        while (t < rounds) {
          val next = new java.util.HashSet[Long]()
          val sIt = surv.iterator()
          while (sIt.hasNext) {
            val v = sIt.next()
            val nbrs = adj.get(v)
            var d = 0
            var i = 0
            while (i < nbrs.size()) { if (surv.contains(nbrs.get(i))) d += 1; i += 1 }
            if (d >= k) next.add(v)
          }
          surv.clear()
          surv.addAll(next)
          t += 1
        }
        // within-core degree of the survivors; like the distributed
        // twin's final keyed count, zero-degree survivors emit no row
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        val sIt = surv.iterator()
        while (sIt.hasNext) {
          val v = sIt.next()
          val nbrs = adj.get(v)
          var d = 0L
          var i = 0
          while (i < nbrs.size()) { if (surv.contains(nbrs.get(i))) d += 1; i += 1 }
          if (d > 0) out += ((v, d))
        }
        out.iterator
      }
      .toDF("node", "core_deg")
  }

  /** Bounded twin of [[pageRank]] over the dense node domain
    * 0..numNodes-1: identical integer arithmetic (scaled longs,
    * truncating division — order-independent, so serial replay is
    * bit-identical to the distributed rounds). */
  def pageRankBounded(
      numNodes: Int,
      edges: DataFrame,
      iters: Int = 10,
      scale: Long = 1000000000000L): DataFrame = {
    require(numNodes > 0 && numNodes <= (1 << 20), s"pageRankBounded: $numNodes nodes")
    val s = edges.sparkSession
    import s.implicits._
    val n = numNodes.toLong
    val basePart = 15L * scale / (100L * n)
    edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .repartition(1)
      .as[E]
      .mapPartitions { it =>
        val deg = new Array[Long](numNodes)
        val es = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        it.foreach { e =>
          require(e.src >= 0 && e.src < n && e.dst >= 0 && e.dst < n,
            s"pageRankBounded: edge (${e.src},${e.dst}) outside domain [0,$n)")
          deg(e.src.toInt) += 1
          es += ((e.src.toInt, e.dst.toInt))
        }
        var r = Array.fill(numNodes)(scale / n)
        var t = 0
        while (t < iters) {
          var dang = 0L
          var v = 0
          while (v < numNodes) { if (deg(v) == 0) dang += r(v); v += 1 }
          val next = new Array[Long](numNodes)
          es.foreach { case (src, dst) => next(dst) += (85L * r(src)) / (100L * deg(src)) }
          val add = basePart + (85L * dang) / (100L * n)
          v = 0
          while (v < numNodes) { next(v) += add; v += 1 }
          r = next
          t += 1
        }
        (0 until numNodes).iterator.map(v => (v.toLong, r(v)))
      }
      .toDF("id", "r")
  }

  /** Bounded twin of [[labelPropagation]] over the dense node domain
    * 0..numNodes-1: same synchronous rounds, same (count desc, label
    * asc) tie order, isolated nodes keep their own label. */
  def labelPropagationBounded(numNodes: Int, edges: DataFrame, rounds: Int): DataFrame = {
    require(numNodes > 0 && numNodes <= (1 << 20), s"labelPropagationBounded: $numNodes nodes")
    val s = edges.sparkSession
    import s.implicits._
    val n = numNodes.toLong
    val sym = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .union(edges.select(col("dst").cast("long").as("src"), col("src").cast("long").as("dst")))
      .distinct()
    sym
      .repartition(1)
      .as[E]
      .mapPartitions { it =>
        val adj = Array.fill(numNodes)(new java.util.ArrayList[Int]())
        it.foreach { e =>
          require(e.src >= 0 && e.src < n && e.dst >= 0 && e.dst < n,
            s"labelPropagationBounded: edge (${e.src},${e.dst}) outside domain [0,$n)")
          adj(e.src.toInt).add(e.dst.toInt)
        }
        var labels = Array.tabulate(numNodes)(_.toLong)
        var t = 0
        while (t < rounds) {
          val next = new Array[Long](numNodes)
          var v = 0
          while (v < numNodes) {
            val nbrs = adj(v)
            if (nbrs.isEmpty) next(v) = labels(v)
            else {
              val cnt = new java.util.HashMap[Long, Long]()
              var i = 0
              while (i < nbrs.size()) { cnt.merge(labels(nbrs.get(i)), 1L, _ + _); i += 1 }
              var bestLab = Long.MaxValue
              var bestCnt = -1L
              val cIt = cnt.entrySet().iterator()
              while (cIt.hasNext) {
                val e2 = cIt.next()
                if (e2.getValue > bestCnt || (e2.getValue == bestCnt && e2.getKey < bestLab)) {
                  bestCnt = e2.getValue
                  bestLab = e2.getKey
                }
              }
              next(v) = bestLab
            }
            v += 1
          }
          labels = next
          t += 1
        }
        (0 until numNodes).iterator.map(v => (v.toLong, labels(v)))
      }
      .toDF("id", "lab")
  }
}
