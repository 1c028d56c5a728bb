package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.storage.StorageLevel

/** Persist lifecycle for operator-internal staged tables.
  *
  * Several operators stage an intermediate frame (a shingle table, an
  * inverted index, a survivors frame) that the RETURNED lazy result
  * references more than once — persisted so the expensive stage runs
  * once per action. `Dataset.persist`/`localCheckpoint` blocks outlive
  * the operator call, so a caller composing several operators in one
  * session (the bench harness, the curation pipeline, any library user)
  * needs a release path. The contract:
  *
  *  - operators stage frames via [[persist]] / [[checkpoint]] — both
  *    register a release handle in a session-wide registry;
  *  - the caller, after MATERIALIZING the returned result (action,
  *    write, collect), calls [[releaseAll]] — every staged block is
  *    dropped; the returned frame stays valid (persist-backed stages
  *    recompute lazily if re-run; checkpoint-backed RESULTS are
  *    released only via releaseAll, so call it when done, not between
  *    actions on the same frame).
  *
  * Iterative operators ([[Graph]]'s component fixpoint) use the
  * unregistered [[checkpointOwned]]/[[release]] pair instead: round
  * n−1's checkpoint blocks are dropped as soon as round n has
  * materialized, capping in-flight storage at two rounds regardless of
  * iteration count.
  */
object Staged {

  private val registry = new ConcurrentLinkedQueue[() => Unit]()

  /** Eagerly `localCheckpoint` `df`, returning the flattened frame AND
    * the persistent-RDD blocks the checkpoint created. The caller owns
    * the blocks: drop them with [[release]] once every consumer of the
    * frame has materialized (the blocks are the data — a released
    * checkpoint frame cannot be recomputed). */
  private[graft] def checkpointOwned(df: DataFrame): (DataFrame, Seq[RDD[_]]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint() // eager: materializes here
    val fresh = sc.getPersistentRDDs.collect { case (id, r) if !before.contains(id) => r }.toSeq
    (out, fresh)
  }

  private[graft] def release(blocks: Seq[RDD[_]]): Unit =
    blocks.foreach { r =>
      try r.unpersist(blocking = false)
      catch { case _: Throwable => () }
    }

  /** `localCheckpoint` with the blocks registered for [[releaseAll]] —
    * for iterative RESULTS whose lineage cannot stay lazy. */
  def checkpoint(df: DataFrame): DataFrame = {
    val (out, blocks) = checkpointOwned(df)
    register(blocks)
    out
  }

  /** Hand ownership of already-created blocks to the registry. */
  private[graft] def register(blocks: Seq[RDD[_]]): Unit =
    if (blocks.nonEmpty) registry.add(() => release(blocks))

  /** MEMORY_AND_DISK persist with the frame registered for
    * [[releaseAll]] — for staged tables referenced multiple times by a
    * returned lazy result. After release the result stays correct
    * (stages recompute), just uncached. */
  def persist[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist(StorageLevel.MEMORY_AND_DISK)
    registry.add { () =>
      try { ds.unpersist(blocking = false); () }
      catch { case _: Throwable => () }
    }
    ds
  }

  /** Drop every staged block operators registered on behalf of returned
    * results. Call after consuming the results of one or more composed
    * operator calls (the bench/verify harnesses call it per query).
    *
    * Concurrency note: the registry is session-wide — releaseAll drops
    * blocks staged by EVERY thread, so concurrent query runners should
    * either serialize releaseAll behind their materializations or let
    * one coordinator own the call (persist-backed stages recompute
    * correctly if released early; only throughput is at stake). */
  def releaseAll(): Unit = {
    var f = registry.poll()
    while (f != null) { f(); f = registry.poll() }
  }
}
