package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

/** Bucket-blocked interval join: the blocked pair set must equal the
  * brute-force range join exactly — including pairs whose overlap
  * spans several buckets (emitted once via the first-common-bucket
  * rule) — and the plan must stay an equi-join, never a cartesian.
  */
class IntervalJoinSpec extends SparkSuite {
  import spark.implicits._

  // intervals engineered around bucket boundaries (bucket = 10):
  // long spans, exact-touch endpoints, bucket-interior, cross-bucket
  private val ivs = Seq(
    (1L, 0L, 25L), // spans buckets 0..2
    (2L, 5L, 9L), // inside bucket 0, overlaps 1
    (3L, 9L, 12L), // crosses 0→1, touches 2 at 9
    (4L, 20L, 31L), // crosses 2→3, overlaps 1
    (5L, 40L, 45L), // disjoint from everything but 6
    (6L, 45L, 50L), // touches 5 at 45
    (7L, 100L, 200L) // far away, alone
  ).toDF("id", "s", "e")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("blocked pairs == brute-force range join, each pair exactly once") {
    val blocked = IntervalJoin.overlapPairs(ivs, ivs, bucketSize = 10L, antiReflexive = true)
    val rows = blocked.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === rows.toSet.size, "first-common-bucket rule must emit each pair once")
    val brute = ivs
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .combinations(2)
      .collect { case Array((ia, sa, ea), (ib, sb, eb)) if sa <= eb && sb <= ea => (math.min(ia, ib), math.max(ia, ib)) }
      .toSet
    assert(rows.toSet === brute)
    // 2=(5,9) touches 3=(9,12) at 9 — closed intervals overlap
    assert(brute === Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (5L, 6L)), "fixture sanity")
  }

  test("two-sided join (no antiReflexive) matches brute force between distinct frames") {
    val right = Seq((10L, 8L, 22L), (11L, 60L, 70L)).toDF("id", "s", "e")
    val got = pairSet(IntervalJoin.overlapPairs(ivs, right, bucketSize = 10L))
    assert(got === Set((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L)))
  }

  test("plan is an equi-join on the bucket key — no cartesian, no nested loop over raw rows") {
    val plan = IntervalJoin
      .overlapPairs(ivs, ivs, bucketSize = 10L, antiReflexive = true)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("CartesianProduct"), s"blocked interval join must not plan a cartesian:\n$plan")
  }
}
