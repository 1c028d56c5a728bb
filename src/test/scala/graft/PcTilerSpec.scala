package graft

import org.apache.spark.sql.functions._

import graft.geo.PcTiler
import graft.sources.Laz

/** Octree tiler invariants: cap respected on every non-terminal
  * level, parents of occupied children are full (they overflowed),
  * the assignment partitions the input exactly, voxel parentage is
  * the octree halving, determinism across runs, and every node's LAZ
  * bytes decode back to exactly the node's points (the EPT artifact
  * face). Plan shape: the rank stage never plans an unpartitioned
  * window (the root level is the dangerous one). */
class PcTilerSpec extends SparkSuite {

  private val cap = 40

  private def cloud(n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    (0 until n)
      .map { i =>
        val cl = rnd.nextInt(4) // clustered: 4 dense blobs + noise
        val (bx, by, bz) = (cl * 2500L, cl * 1800L, cl * 900L)
        (i.toLong, bx + rnd.nextInt(400), by + rnd.nextInt(400), bz + rnd.nextInt(200))
      }
      .toDF("id", "x", "y", "z")
      .withColumn("okey", md5(concat(lit("t:"), col("id").cast("string"))))
  }

  test("assignment partitions the input; caps hold; parents of occupied children are full") {
    val pts = cloud(1000)
    val a = PcTiler.octreeAssign(pts, cap = cap, maxDepth = 5).cache()
    assert(a.count() == 1000)
    assert(a.select("id").distinct().count() == 1000)

    val nodes = a
      .groupBy("level", "vx", "vy", "vz")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)), r.getLong(4)))
      .toMap
    nodes.foreach { case ((level, _, _, _), n) =>
      if (level < 5) assert(n <= cap, s"node over cap at level $level: $n")
    }
    // every occupied node below the root has a FULL parent chain: a
    // point only descends when its node overflowed
    nodes.keys.filter(_._1 > 0).foreach { case (level, vx, vy, vz) =>
      val parent = (level - 1, vx / 2, vy / 2, vz / 2)
      assert(nodes.get(parent).contains(cap.toLong), s"parent $parent of ($level,$vx,$vy,$vz) not full")
    }
    a.unpersist()
  }

  test("deterministic: two runs assign identically") {
    val pts = cloud(600)
    val r1 = PcTiler.octreeAssign(pts, cap, maxDepth = 5).collect().map(_.toSeq).toSet
    val r2 = PcTiler.octreeAssign(pts, cap, maxDepth = 5).collect().map(_.toSeq).toSet
    assert(r1 == r2)
  }

  test("partitioning-independent: the two-phase top-k gives the same assignment under any input layout") {
    // phase 1 ranks within (node, spark_partition_id) — the CLAIM is
    // that phase 2 erases the layout: a node's true top-cap always
    // survives phase 1 whatever the partitioning, so the final
    // assignment is identical on 1 partition, 7 partitions, or a
    // cluster's thousands.
    val pts = cloud(600)
    val base = PcTiler.octreeAssign(pts, cap, maxDepth = 5).collect().map(_.toSeq).toSet
    Seq(1, 7).foreach { n =>
      val alt = PcTiler.octreeAssign(pts.repartition(n), cap, maxDepth = 5).collect().map(_.toSeq).toSet
      assert(alt == base, s"assignment changed under repartition($n)")
    }
  }

  test("node sample is the hash-minimal subset: the root holds the cap globally-smallest okeys") {
    import spark.implicits._
    val pts = cloud(500)
    val a = PcTiler.octreeAssign(pts, cap, maxDepth = 5)
    val rootIds = a.filter($"level" === 0).select("id").as[Long].collect().toSet
    val expect = pts
      .orderBy("okey")
      .limit(cap)
      .select("id")
      .as[Long]
      .collect()
      .toSet
    assert(rootIds == expect)
  }

  test("eptNodes: every node's LAZ decodes to exactly the node's points") {
    import spark.implicits._
    val pts = cloud(700)
    val a = PcTiler.octreeAssign(pts, cap, maxDepth = 5)
    val byNode = a
      .groupBy("level", "vx", "vy", "vz")
      .agg(collect_list(struct($"id", $"x", $"y", $"z")).as("pts"))
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)),
        r.getSeq[org.apache.spark.sql.Row](4).map(p => (p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3))).sortBy(_._1)))
      .toMap
    val nodes = PcTiler.eptNodes(a).collect()
    assert(nodes.map(_.getLong(4)).sum == 700)
    nodes.foreach { r =>
      val key = (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val dec = Laz.decompress(r.getAs[Array[Byte]]("laz"))
      val got = dec.map(p => (p.gpsTime.toLong, p.x.toLong, p.y.toLong, p.z.toLong))
      assert(got == byNode(key), s"node $key bytes do not round-trip")
    }
  }

  test("copcArtifact round-trips through the Copc reader: info, hierarchy pages, per-node chunk decode") {
    import spark.implicits._
    val pts = cloud(900)
    val a = PcTiler.octreeAssign(pts, cap, maxDepth = 5).cache()
    val row = PcTiler.copcArtifact(a, scale = 0.01).collect().head
    val copc = row.getAs[Array[Byte]]("copc")
    val nNodes = row.getInt(1)

    // reader faces
    val meta = graft.sources.Copc.meta(copc)
    assert(meta.exists(_.format == "copc"))
    assert(meta.get.pointCount == 900L)
    val hier = graft.sources.Copc.hierarchy(copc)
    assert(hier.size == nNodes)
    assert(hier.exists(_.level >= 2), "want enough depth to exercise the child-page walk")

    // every hierarchy node's byte range decodes to exactly its points
    val byNode = a
      .groupBy("level", "vx", "vy", "vz")
      .agg(collect_list(struct($"id", $"x", $"y", $"z")).as("pts"))
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1).toInt, r.getLong(2).toInt, r.getLong(3).toInt),
        r.getSeq[org.apache.spark.sql.Row](4).map(p => (p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3))).sortBy(_._1)))
      .toMap
    hier.foreach { n =>
      val got = Laz
        .decodeChunk(copc, n.offset.toInt, n.offset.toInt + n.byteSize, n.pointCount, 1)
        .map(p => (p.gpsTime.toLong, p.x.toLong, p.y.toLong, p.z.toLong))
        .toSeq
      assert(got == byNode((n.level, n.x, n.y, n.z)), s"node ${(n.level, n.x, n.y, n.z)}")
    }

    // the estate-scan face reads the same octree with sane cube nesting
    val dir = java.nio.file.Files.createTempDirectory("copcspec")
    java.nio.file.Files.write(dir.resolve("a.copc.laz"), copc)
    val ht = graft.sources.Copc.hierarchyTable(spark, dir.toString).collect()
    assert(ht.length == nNodes)
    ht.foreach { r =>
      assert(r.getDouble(8) < r.getDouble(11) && r.getDouble(9) < r.getDouble(12) && r.getDouble(10) < r.getDouble(13))
    }
    a.unpersist()
  }

  test("nodePoints serves bbox + LOD cuts: decoded ids equal the selected nodes' assignment") {
    import spark.implicits._
    val pts = cloud(900)
    val a = PcTiler.octreeAssign(pts, cap, maxDepth = 5).cache()
    val copc = PcTiler.copcArtifact(a, scale = 0.01).collect().head.getAs[Array[Byte]]("copc")
    val dir = java.nio.file.Files.createTempDirectory("copcserve")
    java.nio.file.Files.write(dir.resolve("b.copc.laz"), copc)

    // full read = whole cloud
    val full = graft.sources.Copc.nodePoints(spark, dir.toString)
    assert(full.count() == 900)

    // bbox around the first blob (ints scaled by 0.01) — node-level
    // intersects semantics
    val bbox = (0.0, 0.0, 6.0, 6.0)
    val ht = graft.sources.Copc.hierarchyTable(spark, dir.toString)
    val wantNodes = ht
      .filter($"minx" <= bbox._3 && $"maxx" >= bbox._1 && $"miny" <= bbox._4 && $"maxy" >= bbox._2)
      .select($"level", $"vx", $"vy", $"vz")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet
    assert(wantNodes.nonEmpty && wantNodes.size < ht.count(), "bbox should prune some nodes")
    val wantIds = a
      .collect()
      .filter(r => wantNodes.contains((r.getInt(4), r.getLong(5).toInt, r.getLong(6).toInt, r.getLong(7).toInt)))
      .map(_.getLong(0))
      .toSet
    val gotIds = graft.sources.Copc
      .nodePoints(spark, dir.toString, bbox = Some(bbox))
      .select($"gps_time")
      .as[Double]
      .collect()
      .map(_.toLong)
      .toSet
    assert(gotIds == wantIds)

    // LOD cut: level <= 1 returns exactly the coarse sample
    val lod = graft.sources.Copc.nodePoints(spark, dir.toString, maxLevel = Some(1))
    val wantLod = a.filter($"level" <= 1).count()
    assert(lod.count() == wantLod)
    a.unpersist()
  }

  test("rank stage plans no unpartitioned window (root level included)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val pts = cloud(300)
    val plan = PcTiler.octreeAssign(pts, cap, maxDepth = 2).queryExecution.sparkPlan
    val bare = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(bare.isEmpty, "octreeAssign planned an unpartitioned window")
  }

  test("format-6 COPC (LAS 1.4 layered POINT14 v3, the conformant shape): assemble, node decode, serving read") {
    import spark.implicits._
    val pts = cloud(900)
    val a = PcTiler.octreeAssign(pts, cap, maxDepth = 5).cache()
    val copc = PcTiler.copcArtifact(a, scale = 0.01, pointFormat = 6).collect().head.getAs[Array[Byte]]("copc")

    // header declares the conformant family truthfully
    val h = graft.sources.Laz14.readHeader(copc)
    assert(h.pointFormat == 6 && h.compressor == 3 && h.pointCount == 900L)
    assert(graft.sources.Copc.info(copc).exists(_.pointCount == 900L))

    // every hierarchy node's byte range decodes (v3 path) to its points
    val byNode = a
      .groupBy("level", "vx", "vy", "vz")
      .agg(collect_list(struct($"id", $"x", $"y", $"z")).as("pts"))
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1).toInt, r.getLong(2).toInt, r.getLong(3).toInt),
        r.getSeq[org.apache.spark.sql.Row](4).map(p => (p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3))).sortBy(_._1)))
      .toMap
    val hier = graft.sources.Copc.hierarchy(copc)
    assert(hier.map(_.pointCount.toLong).sum == 900L)
    hier.foreach { n =>
      val got = graft.sources.Laz14
        .decodeChunk(copc, n.offset.toInt, n.offset.toInt + n.byteSize, n.pointCount, 6)
        .map(p => (p.gpsTime.toLong, p.x.toLong, p.y.toLong, p.z.toLong))
        .toSeq
      assert(got == byNode((n.level, n.x, n.y, n.z)), s"node ${(n.level, n.x, n.y, n.z)}")
    }

    // the serving read dispatches on the stored format transparently
    val dir = java.nio.file.Files.createTempDirectory("copc14")
    java.nio.file.Files.write(dir.resolve("c.copc.laz"), copc)
    val full = graft.sources.Copc.nodePoints(spark, dir.toString)
    assert(full.count() == 900)
    val ids = full.select($"gps_time").as[Double].collect().map(_.toLong).toSet
    assert(ids == (0L until 900L).toSet)
    val lod = graft.sources.Copc.nodePoints(spark, dir.toString, maxLevel = Some(1))
    assert(lod.count() == a.filter($"level" <= 1).count())
    a.unpersist()
  }
}
