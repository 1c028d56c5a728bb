package graft.raster

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stockpile detection — the Spark re-expression of
  * `src/library/stockpile.cpp:91-482` / `stockpile.h:41-78`
  * (`detectStockpileJson`, `detectAllStockpilesJson`): threshold a
  * DSM-minus-base difference surface, label 4-connected components,
  * report per-component volume/centroid/area/confidence sorted by
  * volume.
  *
  * Reference pipeline → distributed shape:
  *  - gaussian smoothing (`stockpile.cpp:50-87`) → `convolveSeparable`,
  *    a relational separable convolution (gather-join per axis). The
  *    oracle fixture uses the 5-tap binomial kernel (1,4,6,4,1)/16 —
  *    exact dyadic weights, so both engines' sums are EXACT and the
  *    adaptive threshold compare is engine-neutral (a float gaussian
  *    kernel would differ in the last ulp between libms).
  *  - border-ring base elevation (`stockpile.cpp:332-353`): mean for
  *    sensitivity ≥ 0.3, sorted-middle element below.
  *  - adaptive threshold = mean(positive diff)·(1.5 − sensitivity)
  *    (`stockpile.cpp:696-711`).
  *  - flood fill / two-pass union-find labeling
  *    (`stockpile.cpp:91-121`, `:498-552`) → iterative min-label
  *    propagation with pointer jumping (label ← label(label)), the
  *    relational fixpoint whose deterministic label rule — component
  *    label = MIN pixel id in the component — a SQL engine can
  *    recompute as a reachability closure. O(log diameter) rounds;
  *    lineage kept flat with `localCheckpoint` per round (the MLlib
  *    iterative pattern). At full estate scale the same edge relation
  *    feeds the alternating large-star/small-star algorithm
  *    (Kiveris et al., "Connected Components in MapReduce"); the
  *    min-propagation here is its bounded-diameter special case.
  *  - per-component stats + confidence (`stockpile.cpp:732-864`):
  *    one groupBy(label) partial agg. Compactness uses the relational
  *    boundary-pixel count (pixels with < 4 foreground neighbours)
  *    instead of the traced Moore chain length — deterministic and
  *    engine-recomputable where the chain walk is not.
  */
object Stockpile {

  /** 5-tap binomial approximation of a σ≈1 gaussian — exact dyadic
    * weights (sums of products stay exactly representable). */
  val Binomial5: Seq[Double] = Seq(1.0 / 16, 4.0 / 16, 6.0 / 16, 4.0 / 16, 1.0 / 16)

  /** One separable-convolution axis pass with clamp-at-edge semantics
    * (ref `stockpile.cpp:65-86`): out(x) = Σ_k w_k · in(clamp(x+k)).
    * Window formulation: along the pass axis each tap is a lag/lead
    * over rows sorted by that axis, partitioned by the other axis — ONE
    * shuffle per pass (vs explode+join+groupBy's two plus a join).
    * Clamping falls out of `coalesce`: `lag(v,k)` is null for x<k, and
    * the first non-null of lag(k), lag(k−1), …, v is exactly
    * in(max(0, x−k)) = in(clamp(x−k)); symmetrically for lead. Each
    * partition holds one raster row/column — bounded by raster width,
    * the same bound the per-tile render kernels rely on. */
  private def pass(
      df: DataFrame,
      weights: Seq[Double],
      limit: Int,
      horizontal: Boolean
  ): DataFrame = {
    val _ = limit // clamping is positional via coalesce; no index bound needed
    val half = weights.size / 2
    val w =
      if (horizontal) Window.partitionBy(col("y")).orderBy(col("x"))
      else Window.partitionBy(col("x")).orderBy(col("y"))
    val v = col("value")
    def tap(k: Int): Column =
      if (k == 0) v
      else if (k < 0) coalesce((-k to 1 by -1).map(j => lag(v, j).over(w)) :+ v: _*)
      else coalesce((k to 1 by -1).map(j => lead(v, j).over(w)) :+ v: _*)
    val out = weights.zipWithIndex.map { case (wt, i) => lit(wt) * tap(i - half) }.reduce(_ + _)
    df.select(col("x"), col("y"), out.as("value"))
  }

  /** Separable 2-D convolution over a (x, y, value) pixel grid,
    * clamped edges — the reference's `gaussianFilter` shape
    * (`stockpile.cpp:50-87`) as two relational axis passes. */
  def convolveSeparable(pixels: DataFrame, weights: Seq[Double], width: Int, height: Int): DataFrame =
    pass(pass(pixels, weights, width, horizontal = true), weights, height, horizontal = false)

  /** 4-adjacency edges between foreground pixels, both directions —
    * two equi-joins on shifted coordinates (Catalyst extracts
    * (x+1, y) = (nx, ny) as hash-join keys; no theta join). */
  def adjacencyEdges(fg: DataFrame): DataFrame = {
    val a = fg.select(col("id"), col("x"), col("y"))
    val b = fg.select(col("id").as("nid"), col("x").as("nx"), col("y").as("ny"))
    val right = a.join(b, col("nx") === col("x") + 1 && col("ny") === col("y"))
    val down = a.join(b, col("nx") === col("x") && col("ny") === col("y") + 1)
    val pairs = right
      .select(col("id").as("src"), col("nid").as("dst"))
      .union(down.select(col("id").as("src"), col("nid").as("dst")))
    pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Min-label propagation to fixpoint over (id, x, y) foreground
    * pixels: every pixel ends with the MIN pixel id of its 4-connected
    * component — the deterministic label rule shared with the oracle.
    * The fixpoint itself is the generic graph primitive (shared with
    * the text-curation cluster canonicalizer): see
    * [[graft.operators.Graph.connectedComponents]]. */
  def connectedComponents(fg: DataFrame, edges: DataFrame, maxIter: Int = 64): DataFrame =
    graft.operators.Graph.connectedComponents(fg, edges, maxIter)

  /** Pixel row for the phase-1 union-find (public: Catalyst's
    * generated deserializer must be able to instantiate it). */
  case class Px(id: Long, x: Int, y: Int)

  /** Two-phase connected components — the scale path: phase 1 labels
    * each PARTITION's pixels with a local union-find (one
    * `mapPartitions` pass, memory bounded by the tile partitioning —
    * at estate scale pixels arrive partitioned by (raster_id, tile)
    * so a partition holds one tile's foreground), phase 2 runs the
    * min-label fixpoint of [[connectedComponents]] on the CONTRACTED
    * graph whose nodes are phase-1 labels and whose edges are only the
    * cross-partition adjacencies — the classic local-CC + boundary-
    * graph contraction (Kiveris et al.). Label rule is unchanged:
    * every pixel ends with the MIN pixel id of its component, so the
    * oracle's reachability closure recomputes identical labels. For a
    * raster that fits one partition the fixpoint sees zero edges and
    * converges immediately — the whole CC is one pass.
    *
    * Requires `id = y*width + x` (the encoding both callers use). */
  def connectedComponentsTiled(fg: DataFrame, width: Int, tileRows: Int = 256): DataFrame = {
    val s = fg.sparkSession
    import s.implicits._
    val parts = graft.operators.Graph.ufParts(s, fg.count())
    val local = fg
      .select(col("id").cast("long").as("id"), col("x").cast("int").as("x"), col("y").cast("int").as("y"))
      .repartition(parts, floor(col("y") / tileRows))
      .as[Px]
      .mapPartitions { it =>
        val pix = new java.util.HashMap[Long, Px]()
        it.foreach(p => pix.put(p.id, p))
        val parent = new java.util.HashMap[Long, Long]()
        def find(a: Long): Long = {
          var r = a
          while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
          var c = a
          while (parent.getOrDefault(c, c) != c) { val nx = parent.getOrDefault(c, c); parent.put(c, r); c = nx }
          r
        }
        def union(a: Long, b: Long): Unit = {
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
        }
        val e = pix.entrySet().iterator()
        while (e.hasNext) {
          val p = e.next().getValue
          if (p.x < width - 1 && pix.containsKey(p.id + 1)) union(p.id, p.id + 1)
          if (pix.containsKey(p.id + width)) union(p.id, p.id + width)
        }
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](pix.size())
        val i2 = pix.keySet().iterator()
        while (i2.hasNext) { val id = i2.next(); out += ((id, find(id))) }
        out.iterator
      }
      .toDF("id", "lab")
      .transform(graft.operators.Staged.checkpoint)
    // single partition → the union-find saw the whole foreground; its
    // labels are global and no cross-partition edge can exist
    if (parts == 1) return local
    // contracted graph: cross-partition pixel adjacencies mapped to labels
    val lf = local
      .withColumn("x", (col("id") % width).cast("int"))
      .withColumn("y", (col("id") / width).cast("int"))
    val a = lf.select(col("lab").as("slab"), col("x"), col("y"))
    val b = lf.select(col("lab").as("dlab"), col("x").as("nx"), col("y").as("ny"))
    val cross = a
      .join(b, col("nx") === col("x") + 1 && col("ny") === col("y"))
      .select(col("slab"), col("dlab"))
      .union(
        a.join(b, col("nx") === col("x") && col("ny") === col("y") + 1)
          .select(col("slab"), col("dlab"))
      )
      .filter(col("slab") =!= col("dlab"))
    val contracted = cross
      .union(cross.select(col("dlab").as("slab"), col("slab").as("dlab")))
      .select(col("slab").as("src"), col("dlab").as("dst"))
      .distinct()
      .transform(graft.operators.Staged.checkpoint)
    // no cross-partition adjacency → the local union-find labels ARE
    // the global min-id labels; skip contraction fixpoint + re-join
    if (contracted.isEmpty) return local
    val nodes = local.select(col("lab").as("id")).distinct()
    val fixed = connectedComponents(nodes, contracted)
      .select(col("id").as("lab"), col("lab").as("glab"))
    local.join(fixed, Seq("lab")).select(col("id"), col("glab").as("lab"))
  }

  /** Border-ring base elevation — ref `stockpile.cpp:332-353`: mean
    * for sensitivity ≥ 0.3, sorted-middle element (index n/2) below.
    * Returns a 1-row (base) frame to broadcast onto the pixel plane. */
  def borderBase(pixels: DataFrame, width: Int, height: Int, sensitivity: Double): DataFrame = {
    val border = pixels.filter(
      col("x") === 0 || col("x") === width - 1 || col("y") === 0 || col("y") === height - 1
    )
    if (sensitivity >= 0.3) border.agg(avg("value").as("base"))
    else {
      // exact element at sorted index n/2 (0-based, ref :348) via the
      // distinct-value cumulative window — bounded by value cardinality
      val counts = border.groupBy(col("value")).agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("value").asc).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = counts
        .withColumn("hi", sum(col("c")).over(w))
        .withColumn("lo", col("hi") - col("c") + 1L)
      val total = border.agg(count(lit(1)).as("n"))
      ranked
        .crossJoin(broadcast(total))
        .filter(col("lo") <= expr("n div 2 + 1") && expr("n div 2 + 1") <= col("hi"))
        .agg(avg("value").as("base"))
    }
  }

  /** Full-DSM stockpile scan — ref `detectAllStockpilesJson`
    * (`stockpile.cpp:566-888`) with the border-ring base plane of the
    * single-click path (`:332-353`; the reference's low-pass trend is
    * a big-σ gaussian — same `convolveSeparable` machinery, applied by
    * callers that want it). Output: one row per detected component,
    * sorted by estimated volume desc, ids reassigned sequentially.
    *
    * Scale: everything before the component loop is column math + one
    * partial-agg shuffle per stage over pixels-as-rows; labeling is
    * the iterative fixpoint above; per-component stats are ONE
    * groupBy(label). No driver materialization of pixels anywhere. */
  def detectAll(
      pixels: DataFrame, // (x, y, value)
      width: Int,
      height: Int,
      cellArea: Double,
      sensitivity: Double = 0.5,
      minAreaM2: Double = 0.0,
      maxResults: Int = 50
  ): DataFrame = {
    val base = borderBase(pixels, width, height, sensitivity)
    val diff0 = pixels
      .crossJoin(broadcast(base))
      .select(col("x"), col("y"), (col("value") - col("base")).as("value"))
    val sm = convolveSeparable(diff0, Binomial5, width, height)
    val mp = sm.filter(col("value") > 0).agg(avg("value").as("mp"))
    val fg = sm
      .crossJoin(broadcast(mp))
      .filter(col("value") > col("mp") * lit(1.5 - sensitivity)) // ref :711 threshold
      .select(
        (col("y").cast("long") * width + col("x")).as("id"),
        col("x"),
        col("y"),
        col("value").as("d"),
        col("mp")
      )
      // materialize once: fg feeds the CC seed, both sides of the
      // adjacency joins, and the stats pass — without this the whole
      // smoothing pipeline re-runs for every consumer
      .transform(graft.operators.Staged.checkpoint)
    val edges = adjacencyEdges(fg)
    val labels = connectedComponentsTiled(fg, width)
    val p = fg.join(labels, Seq("id"))
    val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("nb"))
    val st = p
      .groupBy("lab")
      .agg(
        count(lit(1)).as("pc"),
        sum(when(col("d") > 0, col("d") * cellArea).otherwise(lit(0.0))).as("vol"), // ref :752
        sum("x").as("sx"),
        sum("y").as("sy"),
        max("d").as("mx"),
        first("mp").as("mp")
      )
    val bnd = p
      .join(deg, Seq("id"), "left")
      .filter(coalesce(col("nb"), lit(0L)) < 4)
      .groupBy("lab")
      .agg(count(lit(1)).as("bpx"))
    val w = Window.orderBy(col("vol").desc, col("lab").asc) // bounded: component count
    st.join(bnd, Seq("lab"))
      .filter(col("pc") >= 4 && col("pc") * cellArea >= minAreaM2) // ref :798-800
      .withColumn("compact", least(lit(1.0), lit(4 * math.Pi) * col("pc") / (col("bpx") * col("bpx"))))
      .withColumn("prom", least(lit(1.0), col("mx") / greatest(lit(1e-6), col("mp") * lit(4)))) // ref :833
      .withColumn(
        "confidence",
        least(lit(1.0), greatest(lit(0.0), lit(0.3) + lit(0.4) * col("compact") + lit(0.3) * col("prom")))
      )
      .withColumn("id", row_number().over(w))
      .filter(col("id") <= maxResults)
      .select(
        col("id"),
        col("pc").as("pixel_count"),
        round(col("pc") * cellArea, 4).as("area_m2"),
        round(col("vol"), 4).as("est_volume"),
        round(col("sx").cast("double") / col("pc"), 4).as("centroid_x"),
        round(col("sy").cast("double") / col("pc"), 4).as("centroid_y"),
        round(col("mx"), 4).as("max_diff"),
        round(col("confidence"), 6).as("confidence")
      )
  }

  /** Single-click detection — ref `detectStockpileJson`
    * (`stockpile.cpp:224-487`): same pipeline, but only the component
    * containing (seedX, seedY) is reported (the flood-fill-from-click
    * semantics). Returns 0 rows when the click is not on a detected
    * pile (the reference throws). */
  def detectAt(
      pixels: DataFrame,
      width: Int,
      height: Int,
      cellArea: Double,
      seedX: Int,
      seedY: Int,
      sensitivity: Double = 0.5
  ): DataFrame = {
    val base = borderBase(pixels, width, height, sensitivity)
    val diff0 = pixels
      .crossJoin(broadcast(base))
      .select(col("x"), col("y"), (col("value") - col("base")).as("value"))
    val sm = convolveSeparable(diff0, Binomial5, width, height)
    val mp = sm.filter(col("value") > 0).agg(avg("value").as("mp"))
    val fg = sm
      .crossJoin(broadcast(mp))
      .filter(col("value") > col("mp") * lit(1.5 - sensitivity))
      .select((col("y").cast("long") * width + col("x")).as("id"), col("x"), col("y"), col("value").as("d"))
      .transform(graft.operators.Staged.checkpoint) // same multi-consumer materialization as detectAll
    val labels = connectedComponentsTiled(fg, width)
    val seedLab = labels.filter(col("id") === seedY.toLong * width + seedX).select(col("lab"))
    fg.join(labels, Seq("id"))
      .join(broadcast(seedLab), Seq("lab"))
      .groupBy("lab")
      .agg(
        count(lit(1)).as("pixel_count"),
        round(sum(when(col("d") > 0, col("d") * cellArea).otherwise(lit(0.0))), 4).as("est_volume"),
        round(sum("x").cast("double") / count(lit(1)), 4).as("centroid_x"),
        round(sum("y").cast("double") / count(lit(1)), 4).as("centroid_y")
      )
      .drop("lab")
  }

  /** ◆ Stockpile detect-all under the oracle: a 64×64 synthetic DSM
    * (flat 100 m plane + six paraboloid mounds + one sub-threshold
    * bump, all exact dyadic arithmetic so every sum in both engines is
    * EXACT), sensitivity 0.6, 0.25 m² cells. Two of the mounds overlap
    * → ONE merged component, exercising the union step the flood fill
    * performs; the tiny bump must vanish below the adaptive threshold.
    * The DuckDB oracle recomputes the identical pipeline with the
    * labels derived from a recursive reachability closure (min id per
    * component — the same deterministic label rule). */
  def stockpileQuery(s: SparkSession, dir: String): DataFrame = {
    def m(cx: Int, cy: Int, r2: Int, amp: Double)(x: Column, y: Column): Column =
      lit(amp) * greatest(lit(0), lit(r2) - ((x - cx) * (x - cx) + (y - cy) * (y - cy)))
    val px = Raster.grid(s, 64, 64)((x, y) =>
      lit(100.0) +
        m(12, 12, 36, 0.25)(x, y) +
        m(44, 14, 64, 0.125)(x, y) +
        m(14, 46, 25, 0.25)(x, y) +
        m(52, 48, 49, 0.25)(x, y) +
        m(28, 34, 25, 0.25)(x, y) +
        m(33, 34, 25, 0.25)(x, y) +
        m(4, 58, 2, 0.5)(x, y)
    )
    detectAll(px, 64, 64, cellArea = 0.25, sensitivity = 0.6, minAreaM2 = 1.0, maxResults = 10)
  }
}
