package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Generic connected-components tests: the contracted local-union-find
  * path vs the min-label fixpoint must agree on every graph shape, and
  * both must produce the deterministic MIN-member-id label the SQL
  * oracles recompute.
  */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val chainNodes = (1L to 7L).toDF("id")
  // two components: {1,2,3,4} (a path) and {6,7}; 5 is isolated
  private val chainEdges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (6L, 7L)).toDF("src", "dst")
  private val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 6L, 7L -> 6L)

  test("components: single-partition local union-find labels a path + isolated node") {
    assert(labelsOf(Graph.components(chainNodes, chainEdges)) === expected)
  }

  test("components: forced multi-partition contraction agrees with the single-pass result") {
    for (p <- Seq(2, 3, 8)) {
      assert(labelsOf(Graph.components(chainNodes, chainEdges, partitions = Some(p))) === expected, s"parts=$p")
    }
  }

  test("components: agrees with the min-label fixpoint on a random-ish graph") {
    // 60 nodes, edges i -> i+k for a couple of strides: several rings
    val nodes = (0L until 60L).toDF("id")
    val edges = (0L until 60L)
      .flatMap(i => Seq((i, (i + 12) % 60), (i, (i + 30) % 60)))
      .toDF("src", "dst")
    val viaContract = labelsOf(Graph.components(nodes, edges, partitions = Some(4)))
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val viaFixpoint = labelsOf(Graph.connectedComponents(nodes, sym))
    assert(viaContract === viaFixpoint)
    // strides 12 and 30 over Z/60: components = residues mod gcd(12,30,60)=6
    assert(viaContract.values.toSet === (0L until 6L).toSet)
  }

  private val prScale = 1000000000000L

  test("pageRank: mass conserved to within the integer-truncation bound, sinks included") {
    // 0→1→…→8→9 with 9 a sink (dangling) and a 3→0 back-edge
    val nodes = (0L until 10L).toDF("id")
    val edges = ((0L until 9L).map(i => (i, i + 1)) :+ (3L, 0L)).toDF("src", "dst")
    val ranks = Graph.pageRank(nodes, edges).collect().map(_.getLong(1))
    val total = ranks.sum
    // per round each floor-division loses < 1 unit: ≤ m per-edge
    // contributions + n basePart shares + n dangling shares
    val bound = 10L * (2 * 10 + 10)
    assert(total <= prScale && total > prScale - bound, s"total=$total")
    assert(ranks.forall(_ > 0))
  }

  test("pageRank: cycle symmetry gives exactly equal ranks; star center outranks leaves") {
    val cyc = Graph
      .pageRank((0L until 3L).toDF("id"), Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst"))
      .collect()
      .map(_.getLong(1))
    // every node plays the identical role, and the arithmetic is
    // integer-deterministic — ranks must be EXACTLY equal
    assert(cyc.toSet.size === 1)
    assert(math.abs(cyc.head - prScale / 3) < 10)
    val star = Graph
      .pageRank((0L until 5L).toDF("id"), (1L to 4L).map(i => (i, 0L)).toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert((1L to 4L).forall(i => star(0L) > star(i)))
    assert((2L to 4L).forall(i => star(i) === star(1L))) // leaves symmetric
  }

  test("triangles: K4 has four, counted once each; C5 has none; brute force agrees on a dense graph") {
    def triSet(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long)] =
      Graph
        .triangles(edges.toDF("src", "dst"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
    // K4: every 3-subset is a triangle, lowest-rank-corner rule emits each once
    val k4 = triSet(for (i <- 0L until 4L; j <- i + 1 to 3L) yield (i, j))
    assert(k4.length === 4 && k4.distinct.length === 4)
    assert(k4.map { case (a, b, c) => Set(a, b, c) }.toSet === Set(0L, 1L, 2L, 3L).subsets(3).toSet)
    // odd cycle: no triangles
    assert(triSet(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L))).isEmpty)
    // dense-ish deterministic graph vs brute force
    val edges = (for (i <- 0L until 30L; j <- i + 1 until 30L if (i * 31 + j) % 3 == 0) yield (i, j)).toSeq
    val es = edges.toSet
    val brute = for {
      a <- 0L until 30L; b <- a + 1 until 30L; c <- b + 1 until 30L
      if es((a, b)) && es((b, c)) && es((a, c))
    } yield Set(a, b, c)
    val got = triSet(edges).map { case (a, b, c) => Set(a, b, c) }
    assert(got.length === got.distinct.length, "each triangle exactly once")
    assert(got.toSet === brute.toSet)
  }

  test("labelPropagation: two cliques converge to their min ids, isolated node keeps its own") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def clique(ids: Seq[Long]) = for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(0L to 4L) ++ clique(10L to 14L)).toDF("src", "dst")
    val nodes = ((0L to 4L) ++ (10L to 14L) :+ 20L).toDF("id")
    val labs = graft.operators.Graph
      .labelPropagation(nodes, edges, rounds = 5)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    (0L to 4L).foreach(i => assert(labs(i) === 0L, s"clique-1 node $i"))
    (10L to 14L).foreach(i => assert(labs(i) === 10L, s"clique-2 node $i"))
    assert(labs(20L) === 20L, "isolated node keeps its own label")
  }

  test("kCore: a 5-clique with a path tail peels to exactly the clique") {
    // clique 1..5 (degree 4 inside) + tail 5-6-7-8
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val edges = (clique ++ Seq((5L, 6L), (6L, 7L), (7L, 8L))).toDF("src", "dst")
    val out = Graph.kCore(edges, k = 3, rounds = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out.map(_._1).toSeq === (1L to 5L), s"core members: ${out.toSeq}")
    assert(out.forall(_._2 === 4L), "within-core degree is the clique degree")
  }

  test("kCore: fixpoint stable (8 vs 9 rounds identical) and nested in the lower-k core") {
    val ev = Tables.eventsRaw(spark, sf001)
    def h60(prefix: String) =
      conv(substring(md5(concat(lit(prefix), col("event_id").cast("string"))), 1, 15), 16, 10)
        .cast("long")
    val edges = ev
      .select((h60("ks:") % 500).as("src"), col("event_id"))
      .select(col("src"), (h60("kd:") % (col("src") + 1)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val r8 = Graph.kCore(edges, k = 20, rounds = 8).collect().map(_.toSeq).toSet
    val r9 = Graph.kCore(edges, k = 20, rounds = 9).collect().map(_.toSeq).toSet
    assert(r8 === r9, "peeling reached its fixpoint by round 8")
    val k20 = r8.map(_.head.asInstanceOf[Long])
    val k16 = Graph.kCore(edges, k = 16, rounds = 8).collect().map(_.getLong(0)).toSet
    assert(k20.subsetOf(k16), "higher-k core nests inside the lower-k core")
    assert(k20.nonEmpty && k16.size > k20.size, "peeling actually removed a fringe")
  }

  test("randomWalks: every step follows a real edge, dangling nodes hold position") {
    import org.apache.spark.sql.functions._
    val ev = Tables.eventsRaw(spark, sf0001)
    val edges = ev
      .select((col("event_id") % 500).as("src"), (col("event_id") * 7919 % 500).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val adj = edges
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (s, es) => s -> es.map(_._2).toSet }
    val walks = graft.operators.Graph.randomWalks(spark.range(500).select(col("id")), edges, 4).collect()
    assert(walks.length === 500)
    walks.foreach { r =>
      val path = (0 to 4).map {
        case 0 => r.getAs[Long]("start")
        case i => r.getAs[Long](s"s$i")
      }
      path.sliding(2).foreach { case Seq(a, b) =>
        if (adj.contains(a)) assert(adj(a).contains(b), s"step $a->$b is not an edge")
        else assert(a === b, s"dangling $a must hold position, moved to $b")
      }
    }
  }
}
