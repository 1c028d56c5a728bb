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

  test("two concurrent scopes: one caller's scope exit never drops the other's staged blocks") {
    import java.util.concurrent.CountDownLatch
    import org.apache.spark.storage.StorageLevel
    val sc = spark.sparkContext
    Staged.releaseAll()
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    val aStaged = new CountDownLatch(1)
    val bStaged = new CountDownLatch(1)
    val aExited = new CountDownLatch(1)
    @volatile var bLevelWhileAExited: StorageLevel = null
    @volatile var bLevelAfterOwnExit: StorageLevel = null
    @volatile var aLevelAfterExit: StorageLevel = null

    val a = new Thread(() => {
      Staged.scope {
        val df = Staged.persist(spark.range(1000).toDF("x"))
        df.count() // materialize inside the scope
        val inner = df
        aStaged.countDown()
        bStaged.await() // hold the scope open until B has staged too
        aLevelAfterExit = inner.storageLevel // still cached here
      }
      aExited.countDown()
    })
    val b = new Thread(() => {
      val df = Staged.scope {
        val d = Staged.persist(spark.range(2000).toDF("y"))
        d.count()
        bStaged.countDown()
        aExited.await() // A's scope has exited and released ITS block
        bLevelWhileAExited = d.storageLevel
        d
      }
      bLevelAfterOwnExit = df.storageLevel
    })
    a.start(); b.start(); a.join(30000); b.join(30000)

    assert(aLevelAfterExit.useMemory, "A's block cached while its scope was open")
    assert(
      bLevelWhileAExited != null && bLevelWhileAExited.useMemory,
      "B's staged block must SURVIVE A's scope exit — the r7 session-global registry dropped it"
    )
    assert(
      bLevelAfterOwnExit != null && !bLevelAfterOwnExit.useMemory,
      "B's own scope exit releases B's block"
    )
    assert(sc.getPersistentRDDs.isEmpty, "both scopes closed: no blocks remain")
    // the session-global registry was never touched by either scope
    Staged.releaseAll() // must be a no-op, not required for cleanliness above
  }
}
