package graft

import graft.text.Chunking

/** Streaming twins for the document chunkers: both are per-document
  * (no cross-document state), so chunking COMMUTES with
  * micro-batching — a foreachBatch ingest that chunks each arriving
  * batch produces exactly the batch result over everything seen,
  * regardless of how documents were split across batches. That is
  * the property a streaming curation ingest relies on: chunk (and
  * CDC-fingerprint) on arrival, union downstream.
  */
class StreamChunkSpec extends SparkSuite {
  import spark.implicits._

  private def docs(ids: Range, seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    ids.map { i =>
      val words = (0 until 20 + rnd.nextInt(60)).map(_ => s"w${rnd.nextInt(50)}")
      (i.toLong, words.mkString(" "))
    }
  }

  test("token windows and Gear CDC commute with micro-batching (chunk-on-arrival ≡ batch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val gotWindows = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int, String)]
    val gotCdc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Long, String)]
    val q = ms
      .toDF()
      .toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val d = df.cache()
        gotWindows.synchronized {
          gotWindows ++= Chunking
            .tokenChunks(d)
            .collect()
            .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        }
        gotCdc.synchronized {
          gotCdc ++= Chunking
            .gearChunks(d)
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getString(4)))
        }
        d.unpersist()
        ()
      }
      .start()
    val batches = Seq(docs(0 until 7, 1), docs(7 until 12, 2), docs(12 until 20, 3))
    try {
      batches.foreach { b =>
        ms.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val all = batches.flatten.toDF("doc_id", "text")
    val wantWindows = Chunking
      .tokenChunks(all)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(gotWindows.sortBy(t => (t._1, t._2)).toSeq == wantWindows.sortBy(t => (t._1, t._2)).toSeq)
    val wantCdc = Chunking
      .gearChunks(all)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getString(4)))
    assert(gotCdc.sortBy(t => (t._1, t._2)).toSeq == wantCdc.sortBy(t => (t._1, t._2)).toSeq)
  }
}
