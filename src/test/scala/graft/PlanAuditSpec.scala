package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-quality audit over the ENTIRE query inventory — the properties
  * that keep every query scale-safe, enforced as a regression gate:
  * no cartesian products, no filter sitting on a scan that pushed
  * nothing down, and the known dimension joins stay broadcast.
  */
class PlanAuditSpec extends SparkSuite {

  // every registered query, planned ONCE and shared by all gates (the
  // structured SparkPlan walks and the formatted-text checks read the
  // same QueryExecution)
  private lazy val qes: Map[String, org.apache.spark.sql.execution.QueryExecution] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf0001).queryExecution
    }

  private lazy val plans: Map[String, String] =
    qes.map { case (name, qe) => name -> qe.explainString(FormattedMode) }

  test("registry-wide lint: no multiplying join (cartesian / nested-loop over two data-sized sides)") {
    // PlanLint.boundedRows proves one side constant for the legitimate
    // nested-loop spines (a 1-row aggregate, a constant Range, a
    // LocalTableScan dimension, and their products — PageRank's
    // dangling-mass scalar, covariance's 64×64 pairs, the sensor DB).
    // The queries below carry a bound the PLAN cannot prove but the
    // construction guarantees — each names why:
    val semanticallyBounded = Map(
      // brute-force oracle lanes: the query side is a literal key
      // filter (vec_id < 5 / vec_id = 0) — a fixed probe set by
      // construction; the scalable lanes are q_ann_lsh/ivf/pq
      "q_ann_batch" -> "probe side fixed by literal vec_id < 5",
      "q_ann_topk" -> "probe side fixed by literal vec_id = 0",
      // CountMin probe: distinct tokens of ONE document (doc_id = 0)
      // crossed with the source dimension — both probe-bounded
      "q_cmsketch" -> "probe side = tokens of a single doc_id",
      // gap-fill spine: hours between min(ts) and max(ts) crossed with
      // the event_type domain — grows with the TIME RANGE, not rows
      "q_gapfill" -> "hour spine x type domain, time-bounded",
      // credential check: both sides literal key filters (< 100 / < 50)
      "q_password" -> "both sides literal doc_id range filters"
    )
    val bad = qes.toSeq.sortBy(_._1).flatMap { case (n, qe) =>
      if (semanticallyBounded.contains(n)) Nil
      else PlanLint.joinViolations(qe.sparkPlan).map(v => s"$n: $v")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
    // the whitelist must stay honest: every entry still plans a
    // nested-loop (delete the entry when the query stops needing it)
    val stale = semanticallyBounded.keys.filter(n => PlanLint.joinViolations(qes(n).sparkPlan).isEmpty)
    assert(stale.isEmpty, s"whitelist entries no longer needed: ${stale.mkString(", ")}")
  }

  test("registry-wide lint: every parquet scan carrying data filters pushes at least one down") {
    val bad = qes.toSeq.sortBy(_._1).flatMap { case (n, qe) =>
      PlanLint.unpushedScanViolations(qe.sparkPlan).map(v => s"$n: $v")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("lint self-check: a planted cartesian trips the gate; bounded spines pass") {
    import org.apache.spark.sql.functions.sum
    // data-sized × data-sized: the offender the gate exists for (both
    // sides are parquet scans — row counts grow with the data)
    val docs = Tables.documents(spark, sf0001).select("doc_id")
    val ev = Tables.eventsRaw(spark, sf0001).select("event_id")
    assert(
      PlanLint.joinViolations(docs.crossJoin(ev).queryExecution.sparkPlan).nonEmpty,
      "planted data×data cartesian must be flagged")
    // the legitimate spines must NOT be flagged: a 1-row aggregate
    // (broadcast scalar) and a constant Range (level/pair spine)
    val one = ev.agg(sum("event_id").as("s"))
    assert(
      PlanLint.joinViolations(docs.crossJoin(one).queryExecution.sparkPlan).isEmpty,
      "1-row aggregate spine is the allowed pattern")
    val levels = spark.range(9).toDF("level")
    assert(
      PlanLint.joinViolations(docs.crossJoin(levels).queryExecution.sparkPlan).isEmpty,
      "constant Range spine is the allowed pattern")
    // scan gate, both directions: a pushable-shaped filter over a scan
    // whose PushedFilters came back empty trips; a filter on a computed
    // expression (never pushable) does not
    import org.apache.spark.sql.functions.{col, pmod}
    val dir = java.nio.file.Files.createTempDirectory("planlint_scan").toString
    try {
      spark.range(100).toDF("v").write.mode("overwrite").parquet(dir)
      val pushed = spark.read.parquet(dir).filter(col("v") > 10)
      val scan = pushed.queryExecution.sparkPlan
        .collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
        .getOrElse(fail("no scan"))
      assert(scan.dataFilters.exists(PlanLint.pushableShaped), "plant precondition")
      // planted offender: the same pushable filters, but the scan
      // reports empty PushedFilters — the shape the gate exists for
      assert(
        PlanLint.scanViolation(scan.dataFilters, Some("[]")),
        "pushable filters over an empty PushedFilters scan must be flagged")
      // and the healthy scan (filters actually pushed) must pass
      assert(
        PlanLint.unpushedScanViolations(pushed.queryExecution.sparkPlan).isEmpty,
        "a scan that pushed its filters must not be flagged")
      val computed = spark.read.parquet(dir).filter(pmod(col("v"), org.apache.spark.sql.functions.lit(7)) === 0)
      assert(
        PlanLint.unpushedScanViolations(computed.queryExecution.sparkPlan).isEmpty,
        "a computed-expression filter is not pushable and must not be flagged")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("no query plans a CartesianProduct") {
    val bad = plans.filter(_._2.contains("CartesianProduct")).keys
    assert(bad.isEmpty, s"cartesian products in: ${bad.mkString(", ")}")
  }

  test("no filtering query leaves a scan with zero pushed predicates") {
    // a filtered plan whose scans ALL push nothing means the filter
    // runs entirely post-scan — the shape that dies at 100 TB
    val offenders = plans.collect {
      case (name, p)
          if p.contains("Filter (") && p.contains("PushedFilters: []") &&
            !raw"PushedFilters: \[[^\]]".r.findFirstIn(p).isDefined =>
        name
    }
    assert(offenders.isEmpty, s"unpushed filter-over-scan in: ${offenders.mkString(", ")}")
  }

  test("dimension joins broadcast (no shuffle for nation/region lookups)") {
    Seq("q_dim_rollup", "q_rollup").foreach { q =>
      assert(plans(q).contains("BroadcastHashJoin"), s"$q should broadcast its dims")
      assert(!plans(q).contains("SortMergeJoin"), s"$q must not sort-merge a dim join")
    }
  }

  test("filter queries push their predicates into the parquet scan") {
    Seq("q_like_scan", "q_temporal_filter", "q_semi_join", "q_asof_join").foreach { q =>
      assert(
        raw"PushedFilters: \[[^\]]".r.findFirstIn(plans(q)).isDefined,
        s"$q should have non-empty PushedFilters"
      )
    }
  }

  test("r9 wave: blocked/bucketed joins stay equi-joins, never cartesian") {
    // the r9 operators whose 100 TB story is a blocked pair-join
    // (grid-kNN, grid-DBSCAN, SymSpell blocking, peeling semi-joins,
    // rank exchange): each must plan at least one equi-join — the
    // bucket/block key doing its job — and no CartesianProduct ever
    // (the global gate also checks this; named here so a regression
    // points at the operator, not at a 158-query sweep)
    Seq("q_knn_join", "q_dbscan", "q_entity_resolution", "q_kcore", "q_pagerank").foreach { q =>
      assert(!plans(q).contains("CartesianProduct"), s"$q plans a CartesianProduct")
    }
    // the single-pass pipelines must show the blocking equi-join in the
    // final plan; the iterative ones (q_kcore, q_pagerank) checkpoint
    // each round, so their final plan is a scan of the staged result —
    // their per-round join shape is gated by GraphSpec instead
    Seq("q_knn_join", "q_dbscan", "q_entity_resolution").foreach { q =>
      val p = plans(q)
      assert(
        p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"),
        s"$q should plan an equi-join on its blocking key"
      )
    }
  }

  test("top-k queries plan TakeOrderedAndProject, not a global sort") {
    Seq("q_topk", "q_q3_revenue", "q_bm25").foreach { q =>
      assert(plans(q).contains("TakeOrderedAndProject"), s"$q should use a per-partition heap")
    }
  }

  test("bbox envelope predicates reach the parquet scan (min/max file prune) in both forms") {
    // the spatial filter's 100×-scale story is the parquet min/max
    // stats standing in for the reference's SpatiaLite MBR index
    // (stac.cpp:629-636): both the plain column-math form and the
    // codegen'd env_intersects expression (via EnvIntersectsRewrite)
    // must land all four envelope bounds in PushedFilters
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("planaudit_env").toString
    try {
      spark
        .range(100)
        .select(
          col("id"),
          (col("id") % 36).cast("double").alias("minx"),
          (col("id") % 17).cast("double").alias("miny"),
          (col("id") % 36 + 1).cast("double").alias("maxx"),
          (col("id") % 17 + 1).cast("double").alias("maxy")
        )
        .write
        .mode("overwrite")
        .parquet(dir)
      graft.plans.EnvExpressions.register(spark)
      val plain = spark.read.parquet(dir).filter(graft.core.Index.bboxIntersects(3.0, 2.0, 9.0, 8.0))
      val native = spark.read
        .parquet(dir)
        .filter(graft.plans.EnvExpressions.envIntersects(col("minx"), col("miny"), col("maxx"), col("maxy"), 3.0, 2.0, 9.0, 8.0))
      Seq("plain" -> plain, "env_intersects" -> native).foreach { case (label, q) =>
        val plan = q.queryExecution.explainString(FormattedMode)
        val pushed = raw"PushedFilters: \[([^\]]+)\]".r.findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
        Seq("minx", "miny", "maxx", "maxy").foreach { c =>
          assert(pushed.contains(c), s"$label: envelope column $c must reach PushedFilters, got [$pushed]")
        }
      }
      assert(
        plain.count() === native.count(),
        "both forms must select the same rows"
      )
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("bbox over a z-ordered layout prunes row groups at the scan; hash layout decodes everything") {
    // the two halves of the spatial-pruning story composed and measured
    // on the EXECUTED scan node: zorderWrite gives each file a tight
    // envelope, EnvIntersectsRewrite turns env_intersects into pushed
    // range predicates, and the parquet reader's row-group stats then
    // skip the files a 20°×20° bbox cannot touch — the scan's
    // numOutputRows is the rows it actually DECODED (pushed filters
    // prune row groups; exact filtering happens above the scan), so
    // z-order must decode a small fraction while a hash layout decodes
    // every row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.FileSourceScanExec
    val ev = graft.geo.GeoQueries
      .withLonLat(Tables.eventsRaw(spark, sf0001))
      .select(col("event_id"), col("lon"), col("lat"))
    val zDir = java.nio.file.Files.createTempDirectory("planaudit_zorder").toString
    val hDir = java.nio.file.Files.createTempDirectory("planaudit_hash").toString
    try {
      graft.geo.ZOrder.zorderWrite(ev, "lon", "lat", -180, -90, 180, 90, nFiles = 16, path = zDir)
      ev.repartition(16).write.mode("overwrite").parquet(hDir)
      graft.plans.EnvExpressions.register(spark)
      val total = spark.read.parquet(zDir).count()

      def decodedRows(dir: String): Long = {
        // a point's envelope is the point itself: after the rewrite the
        // scan pushes lon/lat range predicates
        val q = spark.read
          .parquet(dir)
          .filter(
            graft.plans.EnvExpressions
              .envIntersects(col("lon"), col("lat"), col("lon"), col("lat"), 10.0, 10.0, 30.0, 30.0)
          )
        q.collect()
        val scan = q.queryExecution.executedPlan
          .collectFirst { case f: FileSourceScanExec => f }
          .getOrElse(fail("no FileSourceScanExec in executed plan"))
        scan.metrics("numOutputRows").value
      }

      val zDecoded = decodedRows(zDir)
      val hDecoded = decodedRows(hDir)
      assert(hDecoded === total, s"hash layout has world-spanning row-group stats: nothing prunes ($hDecoded)")
      assert(zDecoded > 0 && zDecoded <= total / 3, s"z-order must skip most row groups, decoded $zDecoded/$total")
    } finally {
      Seq(zDir, hDir).foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("materialized tile pyramid serves level reads via partition pruning") {
    // the tiler's derived-artifact store must not scan other zoom
    // levels when one level is requested — the moral equivalent of the
    // reference's per-tile windowed read (gdaltiler.cpp:158-200)
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("planaudit_tiles").toString
    graft.geo.GeoQueries.writeTilePyramid(
      graft.geo.GeoQueries.tilePyramidQuery(spark, sf0001),
      dir
    )
    val plan = spark.read
      .parquet(dir)
      .filter(col("z") === 13)
      .queryExecution
      .explainString(FormattedMode)
    assert(raw"PartitionFilters: \[[^\]]".r.findFirstIn(plan).isDefined, s"z filter must prune partitions:\n$plan")
  }

  test("tile pyramid scans raw pixels once regardless of zoom count (overview rollup)") {
    // the r4 verdict flagged the per-zoom pixel explode (zoom-count ×
    // data scanned); the rollup builds z−1 from z's tiles, so the
    // pixel source must appear exactly once in the plan however many
    // levels are requested — and no Generate/explode remains
    import org.apache.spark.sql.functions.col
    def planFor(zooms: Seq[Int]): String = {
      val px = spark.range(1000).select(
        (col("id") % 100).cast("double").alias("x"),
        (col("id") / 100).cast("double").alias("y"))
        .select(
          (col("x") * 0.001 - 10.0).alias("lon"),
          (org.apache.spark.sql.functions.lit(40.0) - col("y") * 0.001).alias("lat"),
          (col("x").cast("int") % 256).alias("byte"))
      graft.geo.GeoQueries.tilePyramid(px, zooms)
        .queryExecution.explainString(FormattedMode)
    }
    Seq(Seq(12, 13, 14), Seq(9, 10, 11, 12, 13, 14)).foreach { zooms =>
      val p = planFor(zooms)
      def occurrences(hay: String, needle: String): Int = hay.sliding(needle.length).count(_ == needle)
      // the base level is materialized once at construction; the final
      // plan must read ONLY checkpointed tile stats — zero re-scans of
      // the pixel source, however many levels are requested
      val rangeScans = occurrences(p, "Scan Range") max occurrences(p, "Range (")
      assert(rangeScans === 0, s"zooms $zooms re-scans the pixel source:\n$p")
      assert(p.contains("ExistingRDD"), s"zooms $zooms should read materialized level stats")
      assert(!p.contains("Generate"), s"zooms $zooms must not explode pixels per zoom")
    }
  }

  test("no query plans an unpartitioned Window over raw (non-aggregated) rows") {
    // Window with an empty partitionSpec funnels EVERY input row
    // through one task — the classic scale-killer. It is tolerable
    // only when the window input is already an aggregate (cardinality
    // bounded by group count, e.g. a cumulative sum over distinct
    // values), never over raw scan output.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val bad = SparkEntry.queries.keys.filter { name =>
      qes(name).sparkPlan
        .collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        .exists(!_.child.exists { case _: BaseAggregateExec => true; case _ => false })
    }
    assert(bad.isEmpty, s"unpartitioned raw-row window in: ${bad.mkString(", ")}")
  }

  test("no Window over raw rows keyed ONLY by constant-domain columns") {
    // The unpartitioned gate's blind spot: a window partitioned by a
    // column whose domain does NOT grow with the data (a 3-value flag,
    // a language code) funnels the whole input through |domain| sort
    // tasks — same scale-killer, nonempty partitionSpec. Tolerable only
    // when the window input is already bounded: an aggregate below
    // (cardinality = group count, e.g. distinct-value counting) or a
    // prior finer-keyed window stage (the two-phase top-k pattern,
    // whose filter bounds rows per coarse key).
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val constantDomain = Set(
      "l_returnflag", "l_linestatus", "lang", "source", "event_type",
      "label", "r_name", "n_name", "cell_id", "z", "block", "band_name"
    )
    val bad = SparkEntry.queries.keys.filter { name =>
      qes(name).sparkPlan
        .collect { case w: WindowExec if w.partitionSpec.nonEmpty => w }
        .exists { w =>
          val keys = w.partitionSpec.flatMap(_.references.map(_.name.toLowerCase))
          val allConstant = keys.nonEmpty && keys.forall(constantDomain.contains)
          val boundedInput = w.child.exists {
            case _: BaseAggregateExec => true
            case _: WindowExec        => true
            case _                    => false
          }
          allConstant && !boundedInput
        }
    }
    assert(bad.isEmpty, s"constant-domain-keyed raw-row window in: ${bad.mkString(", ")}")
  }
}
