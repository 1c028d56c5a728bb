package graft

import graft.geo.Dbscan

/** Grid-blocked DBSCAN vs a serial reference implementation on the
  * collected point set — proves the 3×3 cell blocking loses no
  * neighbor and the CC/border composition implements the textbook
  * semantics. */
class DbscanSpec extends SparkSuite {

  // sf0.001 has 10× lower point density than the query's sf0.01, so
  // the spec widens eps to keep a non-degenerate cluster structure
  private val eps = 6.0
  private val minPts = 4

  private def reference(
      pts: Array[(Long, Double, Double)]
  ): (Map[Long, Long], Map[Long, Long]) = {
    val eps2 = eps * eps
    def near(a: (Long, Double, Double), b: (Long, Double, Double)): Boolean = {
      val dx = a._2 - b._2; val dy = a._3 - b._3
      a._1 != b._1 && dx * dx + dy * dy <= eps2
    }
    val neighbors = pts.map(p => p._1 -> pts.filter(q => near(p, q)).map(_._1)).toMap
    val core = pts.map(_._1).filter(id => neighbors(id).length >= minPts).toSet
    // union-find over core-core eps edges
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    for (c <- core; n <- neighbors(c) if core(n)) {
      val (ra, rb) = (find(c), find(n))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val coreLab = core.map(c => c -> find(c)).toMap
    // min-root canonical labels = min member id per component
    val minLab = coreLab.groupBy(_._2).map { case (root, m) => root -> m.keys.min }
    val labels = coreLab.map { case (c, r) => c -> minLab(r) }
    val borders = pts
      .map(_._1)
      .filterNot(core)
      .flatMap { id =>
        val coreN = neighbors(id).filter(core)
        if (coreN.isEmpty) None else Some(id -> coreN.map(labels).min)
      }
      .toMap
    (labels, borders)
  }

  test("grid DBSCAN equals the serial reference on sf0.001") {
    val pts = Dbscan
      .hashedPoints(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val (coreLab, borderLab) = reference(pts)
    val expected = (coreLab.map { case (id, lab) => (id, lab, 1L) }.toSeq ++
      borderLab.map { case (id, lab) => (id, lab, 0L) }.toSeq)
      .groupBy(_._2)
      .map { case (lab, m) =>
        (lab, m.count(_._3 == 1L).toLong, m.count(_._3 == 0L).toLong, m.map(_._1).sum)
      }
      .toSet
    val got = Dbscan
      .cluster(Dbscan.hashedPoints(spark, sf0001), eps, minPts)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
    assert(got.nonEmpty, "sf0.001 must produce at least one cluster")
  }
}
