package graft.geo

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Laz

/** Distributed point-cloud octree tiler — the reference's
  * `pctiler.cpp` / `untwine_runner.cpp` (EPT/COPC octree build, which
  * it runs as a single-node external process) re-expressed as
  * relational passes:
  *
  *  1. [[octreeAssign]] — every point lands in exactly one octree
  *     node. An interior node keeps the `cap` hash-ranked points (a
  *     deterministic coarse sample — the EPT/COPC invariant that any
  *     node prefix renders a complete low-resolution cloud), overflow
  *     descends one level into the child voxel. One rank-window +
  *     one filter per level, level count ~ log(points)/3; no point
  *     ever sits on the driver.
  *  2. [[eptNodes]] — per-node LAZ encode (the per-artifact kernel:
  *     one task per node, nodes in parallel), yielding exactly the
  *     EPT layout (`ept-data/L-x-y-z.laz` + per-node counts) whose
  *     hierarchy face is [[graft.sources.Copc.hierarchyTable]]'s
  *     relational shape.
  *
  * Determinism end-to-end: the node sample is ranked by a salted md5
  * of the point id (not `rand()`), so the same corpus tiles
  * identically on any cluster size — and the assignment is
  * SQL-expressible, which is what the q_pctiler oracle checks.
  *
  * Scale: the rank window is keyed by (level, vx, vy, vz) — node
  * count grows with the data, so no constant-domain funnel. Each
  * level's frame is checkpoint-staged (released by the harness's
  * `Staged.releaseAll`), overflow shrinks geometrically, and the
  * per-node encode bounds task memory at `cap` plus leaf size.
  */
object PcTiler {

  /** Assign points to octree nodes. Input columns: `id` (long),
    * `x`,`y`,`z` (non-negative longs), `okey` (rank key string).
    * Output: id, x, y, z, level, vx, vy, vz. Levels `0..maxDepth-1`
    * keep at most `cap` points per node; whatever is left at
    * `maxDepth` stays there (cap-free terminal level), keeping the
    * operator total. */
  def octreeAssign(pts: DataFrame, cap: Int, maxDepth: Int = 5): DataFrame = {
    val b = pts
      .agg(
        min(col("x")).as("minx"),
        min(col("y")).as("miny"),
        min(col("z")).as("minz"),
        greatest(
          max(col("x")) - min(col("x")),
          max(col("y")) - min(col("y")),
          max(col("z")) - min(col("z")),
          lit(1L)
        ).as("size")
      )
    // Level-0 voxel exprs are computed (always 0) rather than literal:
    // a lit(0) partition key would constant-fold into an UNPARTITIONED
    // window — the root sample must stay a keyed plan.
    var cur: DataFrame = pts
      .crossJoin(broadcast(b))
      .withColumn("level", lit(0))
      .withColumn("vx", least(expr("(x - minx) div size"), lit(0L)))
      .withColumn("vy", least(expr("(y - miny) div size"), lit(0L)))
      .withColumn("vz", least(expr("(z - minz) div size"), lit(0L)))
    val kept = ArrayBuffer.empty[DataFrame]
    var depth = 0
    var drained = false
    while (!drained && depth < maxDepth) {
      // Exact per-node top-`cap` in two phases (the two-phase top-k
      // pattern): phase 1 ranks within (node, input-partition) — fully
      // parallel however few nodes exist (the root level has ONE) —
      // and keeps at most `cap` per (node, partition); phase 2 ranks
      // the ≤ cap·P survivors per node. A node's true top-cap always
      // survives phase 1, so the result is exact while no task ever
      // sorts more than max(partition, cap·P) rows. The phase-1 frame
      // is the one checkpoint per level: every consumer (keep set,
      // overflow, next level) reads it instead of re-running the big
      // window; overflow is phase-1 losers ∪ phase-2 losers, never an
      // anti-join back over the full level.
      val nodeKeys = Seq(col("level"), col("vx"), col("vy"), col("vz"))
      val w1 = Window.partitionBy(nodeKeys :+ col("pid"): _*).orderBy(col("okey"))
      val w2 = Window.partitionBy(nodeKeys: _*).orderBy(col("okey"))
      val staged = graft.operators.Staged.checkpoint(
        cur
          .withColumn("pid", spark_partition_id())
          .withColumn("rk1", row_number().over(w1))
      )
      val locals = staged.filter(col("rk1") <= cap).withColumn("rk", row_number().over(w2))
      kept += locals.filter(col("rk") <= cap).drop("pid", "rk1", "rk")
      val over = staged
        .filter(col("rk1") > cap)
        .drop("pid", "rk1")
        .unionByName(locals.filter(col("rk") > cap).drop("pid", "rk1", "rk"))
      if (over.head(1).isEmpty) drained = true
      else {
        val p = 1L << (depth + 1)
        cur = over
          .withColumn("level", lit(depth + 1))
          .withColumn("vx", least(expr(s"((x - minx) * $p) div size"), lit(p - 1)))
          .withColumn("vy", least(expr(s"((y - miny) * $p) div size"), lit(p - 1)))
          .withColumn("vz", least(expr(s"((z - minz) * $p) div size"), lit(p - 1)))
        depth += 1
      }
    }
    if (!drained) kept += cur // terminal level keeps everything
    kept
      .reduce(_ unionByName _)
      .select(col("id"), col("x"), col("y"), col("z"), col("level"), col("vx"), col("vy"), col("vz"))
  }

  /** Materialize the octree as EPT-style nodes: one row per node with
    * its LAZ bytes — the artifact a tile server range-reads. Point
    * coordinates are the raw integer grid (scale/offset fixed by the
    * caller's quantization, recorded in each node's LAZ header). */
  def eptNodes(assigned: DataFrame, scale: Double = 0.01): DataFrame = {
    val enc = udf { rows: Seq[Row] =>
      val ps = rows.sortBy(_.getLong(0)).map { r =>
        Laz.P(
          x = r.getLong(1).toInt,
          y = r.getLong(2).toInt,
          z = r.getLong(3).toInt,
          intensity = 0,
          returnByte = 9, // single-return
          classification = 0,
          scanAngle = 0,
          userData = 0,
          pointSource = 0,
          gpsTime = r.getLong(0).toDouble // point id rides the gps channel
        )
      }
      Laz.compress(ps, pointFormat = 1, chunkSize = 50000, scale = scale)
    }
    assigned
      .groupBy(col("level"), col("vx"), col("vy"), col("vz"))
      .agg(count(lit(1)).as("n_points"), collect_list(struct(col("id"), col("x"), col("y"), col("z"))).as("pts"))
      .withColumn("laz", enc(col("pts")))
      .select(col("level"), col("vx"), col("vy"), col("vz"), col("n_points"), col("laz"))
  }

  /** Per-node bare LAZ chunks (the COPC storage unit): like
    * [[eptNodes]] but emitting the chunk stream alone, ready for
    * [[graft.sources.Copc.assemble]]. `pointFormat` 6 emits the
    * COPC-conformant LAS 1.4 layered POINT14 v3 chunk
    * ([[graft.sources.Laz14.encodeChunk]]); 1 the POINT10 v2 one. */
  def nodeChunks(assigned: DataFrame, pointFormat: Int = 1): DataFrame = {
    require(pointFormat == 1 || pointFormat == 6, s"nodeChunks: unsupported point format $pointFormat")
    val enc = udf { rows: Seq[Row] =>
      val sorted = rows.sortBy(_.getLong(0))
      if (pointFormat == 6) {
        val ps = sorted.map { r =>
          graft.sources.Laz14.P14(
            x = r.getLong(1).toInt,
            y = r.getLong(2).toInt,
            z = r.getLong(3).toInt,
            intensity = 0,
            returnNumber = 1,
            numberOfReturns = 1,
            classificationFlags = 0,
            scannerChannel = 0,
            scanDirection = 0,
            edgeOfFlight = 0,
            classification = 0,
            userData = 0,
            scanAngle = 0,
            pointSource = 0,
            gpsTime = r.getLong(0).toDouble
          )
        }
        graft.sources.Laz14.encodeChunk(ps, fmt = 6)
      } else {
        val ps = sorted.map { r =>
          Laz.P(
            x = r.getLong(1).toInt,
            y = r.getLong(2).toInt,
            z = r.getLong(3).toInt,
            intensity = 0,
            returnByte = 9,
            classification = 0,
            scanAngle = 0,
            userData = 0,
            pointSource = 0,
            gpsTime = r.getLong(0).toDouble
          )
        }
        Laz.encodeChunk(ps, pointFormat = 1)
      }
    }
    assigned
      .groupBy(col("level"), col("vx"), col("vy"), col("vz"))
      .agg(count(lit(1)).as("n_points"), collect_list(struct(col("id"), col("x"), col("y"), col("z"))).as("pts"))
      .withColumn("chunk", enc(col("pts")))
      .select(col("level"), col("vx"), col("vy"), col("vz"), col("n_points"), col("chunk"))
  }

  /** The whole COPC artifact as a one-row frame — the per-artifact
    * kernel shape (`buildCog` pattern): node chunks encode in
    * parallel, then ONE task assembles the container byte layout
    * (a file is inherently sequential bytes; at estate scale one
    * task per CLOUD, clouds in parallel). */
  def copcArtifact(assigned: DataFrame, scale: Double = 0.01, pointFormat: Int = 1): DataFrame = {
    val s = assigned.sparkSession
    import s.implicits._
    val b = assigned.agg(
      min($"x").as("minx"),
      min($"y").as("miny"),
      min($"z").as("minz"),
      greatest(max($"x") - min($"x"), max($"y") - min($"y"), max($"z") - min($"z"), lit(1L)).as("size")
    )
    val asm = udf { (rows: Seq[Row], minx: Long, miny: Long, minz: Long, size: Long) =>
      val nodes = rows.map { r =>
        graft.sources.Copc.NodeChunk(
          r.getInt(0),
          r.getLong(1).toInt,
          r.getLong(2).toInt,
          r.getLong(3).toInt,
          r.getLong(4).toInt,
          r.getAs[Array[Byte]](5)
        )
      }
      graft.sources.Copc.assemble(
        nodes,
        minX = minx * scale,
        minY = miny * scale,
        minZ = minz * scale,
        cubeSize = size * scale,
        spacing = size * scale / 128,
        scale = scale,
        pointFormat = pointFormat
      )
    }
    nodeChunks(assigned, pointFormat)
      .agg(collect_list(struct($"level", $"vx", $"vy", $"vz", $"n_points", $"chunk")).as("nodes"))
      .crossJoin(broadcast(b))
      .select(
        asm($"nodes", $"minx", $"miny", $"minz", $"size").as("copc"),
        size($"nodes").as("n_nodes")
      )
  }

  /** Deterministic event-derived cloud for the tiler. */
  private def eventPoints(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables
      .eventsRaw(s, dir)
      .select(
        $"event_id".as("id"),
        ($"event_id" % 1000000L).as("x"),
        (($"user_id" * 7) % 1000000L).as("y"),
        (($"event_id" * 13) % 500000L).as("z"),
        md5(concat(lit("oct:"), $"event_id".cast("string"))).as("okey")
      )
  }

  /** Oracle row: octree-assign the event cloud, then per node run the
    * full LAZ encode→decode cycle and aggregate the DECODED points —
    * green iff both the assignment (mirrored in SQL level by level)
    * and the codec are exact. */
  def pctilerQuery(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assigned = octreeAssign(eventPoints(s, dir), cap = 500, maxDepth = 5)
    val kernel = udf { rows: Seq[Row] =>
      val ps = rows.sortBy(_.getLong(0)).map { r =>
        Laz.P(
          x = r.getLong(1).toInt,
          y = r.getLong(2).toInt,
          z = r.getLong(3).toInt,
          intensity = 0,
          returnByte = 9,
          classification = 0,
          scanAngle = 0,
          userData = 0,
          pointSource = 0,
          gpsTime = r.getLong(0).toDouble
        )
      }
      val laz = Laz.compress(ps, pointFormat = 1, chunkSize = 5000)
      val dec = Laz.decompress(laz)
      require(dec.length == ps.length, "pctiler node lost points in the LAZ cycle")
      Seq(
        dec.length.toLong,
        dec.map(_.x.toLong).sum,
        dec.map(_.y.toLong).sum,
        dec.map(_.z.toLong).sum,
        dec.map(_.gpsTime.toLong).sum
      )
    }.asNondeterministic() // pins the kernel ABOVE the Spread exchange (see Spread)
    // The LAZ cycle is CPU-heavy on tiny bytes — without the Spread
    // repartition AQE folds the node table into ONE task (a measured
    // 13 s serial stage at sf0.1; see operators.Spread).
    graft.operators.Spread.wide(
      assigned
        .groupBy($"level", $"vx", $"vy", $"vz")
        .agg(collect_list(struct($"id", $"x", $"y", $"z")).as("pts")))
      .withColumn("a", kernel($"pts"))
      .select(
        $"level",
        $"vx",
        $"vy",
        $"vz",
        $"a".getItem(0).as("n_points"),
        $"a".getItem(1).as("sum_x"),
        $"a".getItem(2).as("sum_y"),
        $"a".getItem(3).as("sum_z"),
        $"a".getItem(4).as("sum_id")
      )
  }
}
