package graft

import graft.operators.Staged

/** The persist-lifecycle contract: operators stage intermediate frames
  * (persist / localCheckpoint) on behalf of their returned results; a
  * caller composing several operators in ONE session releases every
  * staged block with `Staged.releaseAll()` after consuming the results.
  * This spec is the leak gate: the three heaviest composers (the
  * end-to-end curation pipeline, decontamination, MinHash candidates —
  * between them they exercise persist, checkpointOwned/release, and the
  * Graph fixpoint's per-round release) run back-to-back and must leave
  * ZERO persistent RDDs behind.
  */
class StagedLifecycleSpec extends SparkSuite {

  test("composed operators leave no persistent RDDs after releaseAll") {
    val sc = spark.sparkContext
    // start from a clean slate — other suites share this session
    Staged.releaseAll()
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    assert(sc.getPersistentRDDs.isEmpty, "precondition: clean block manager")

    // back-to-back, one session, each result fully materialized
    val curate = graft.text.Curation.curateQuery(spark, sf0001).collect()
    val decontam = graft.text.Curation.decontamQuery(spark, sf0001).collect()
    val minhash = graft.text.Dedup.minhashQuery(spark, sf0001).collect()
    assert(curate.nonEmpty && minhash.nonEmpty)
    assert(decontam.length >= 0) // contamination may legitimately be empty at sf0.001

    // operators DID stage tables (the registry has work to do) …
    assert(sc.getPersistentRDDs.nonEmpty, "expected staged blocks before release")

    // … and the release path drops every one of them
    Staged.releaseAll()
    assert(
      sc.getPersistentRDDs.isEmpty,
      s"leaked persistent RDDs: ${sc.getPersistentRDDs.values.map(_.toString).mkString("; ")}"
    )
  }
}
