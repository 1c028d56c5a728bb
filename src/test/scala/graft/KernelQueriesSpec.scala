package graft

import org.apache.spark.sql.functions._

import graft.ann.Similarity
import graft.operators.Relational
import graft.raster.RasterQueries

/** Behavior tests for the round-3 kernel/lifecycle queries. */
class KernelQueriesSpec extends SparkSuite {
  import spark.implicits._

  test("volume: cut - fill = volume, area covers every pixel") {
    val r = RasterQueries.volumeQuery(spark, sf0001).collect().head
    val (cut, fill, vol, area) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getLong(3))
    assert(math.abs(cut - fill - vol) < 0.02) // rounding at 2 decimals
    assert(cut >= 0 && fill >= 0)
    assert(area === Tables.eventsRaw(spark, sf0001).count())
  }

  test("profile: 64 samples, monotonic distance, on-grid values filled") {
    val rows = RasterQueries.profileQuery(spark, sf0001).orderBy($"i").collect()
    assert(rows.length === 64)
    val dists = rows.map(_.getDouble(3))
    assert(dists.zip(dists.tail).forall { case (a, b) => b > a })
    assert(rows.head.getDouble(3) === 0.0)
    // the chosen line stays inside the 100x100 grid -> no nulls
    assert(rows.forall(!_.isNullAt(4)))
  }

  test("rescale: bytes within [0,255], histogram covers all rows") {
    val rows = RasterQueries.rescaleQuery(spark, sf0001).collect()
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 255))
    assert(rows.map(_.getLong(1)).sum === Tables.lineitem(spark, sf0001).count())
  }

  test("iso format: both datetime branches produce Zulu ISO8601") {
    val rows = graft.functions.Scalars.isoFormatQuery(spark, sf0001).collect()
    val isoRe = """\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z""".r
    rows.foreach { r =>
      assert(r.getString(0).matches("""\d{4}-\d{2}-\d{2}"""))
      assert(isoRe.matches(r.getString(2)) && isoRe.matches(r.getString(3)))
      assert(r.getString(2) <= r.getString(3))
    }
  }

  test("ivf: reported cosines equal exact cosine of the returned ids") {
    val res = Similarity.ivfQuery(spark, sf0001).collect()
    assert(res.length === 10)
    val vecs = Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val q = vecs(0L)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    res.foreach { r =>
      assert(math.abs(r.getDouble(1) - cos(vecs(r.getLong(0)), q)) < 1e-4)
    }
    // the query vector itself lands in its own probed cell at cos 1.0
    assert(res.head.getLong(0) === 0L && math.abs(res.head.getDouble(1) - 1.0) < 1e-9)
  }

  test("applyDelta KeepTheirs: removed paths gone, added hashes win") {
    val out = Relational.applyDeltaQuery(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val ev = Tables.eventsRaw(spark, sf0001)
      .select($"event_id", $"value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    ev.foreach { case (id, v) =>
      if (id % 23 == 0) assert(!out.contains(id.toString))
      else if (id % 11 == 0) assert(out(id.toString) === (v + 1.0).toString)
      else assert(out(id.toString) === v.toString)
    }
  }

  test("stac page: stable ordered page with constant numberMatched") {
    val rows = Relational.stacPageQuery(spark, sf0001).collect()
    assert(rows.length === 10)
    val paths = rows.map(_.getString(0))
    assert(paths.sorted.toSeq === paths.toSeq)
    assert(rows.map(_.getLong(4)).distinct.length === 1)
    assert(rows.head.getLong(4) > 10)
  }
}
