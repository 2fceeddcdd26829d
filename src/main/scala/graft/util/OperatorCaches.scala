package graft.util

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Registry for the MEMORY_AND_DISK intermediates the operators in
  * [[graft.operators]] materialize (signature tables, inverted indexes,
  * normalized-vector tables — see the scale notes on each operator).
  *
  * Operators persist through [[persist]] so the handle is recorded,
  * keyed by owning session; [[release]] unpersists one session's
  * relations through the CacheManager (clearing the plan→cache mapping,
  * so a later identical `persist()` re-materializes instead of silently
  * no-opping), and [[releaseAll]] does so for every session. This lets
  * a caller that runs operators repeatedly in one long-lived session —
  * the in-repo drivers ([[graft.Verify]], [[graft.Bench]]) or an
  * external library user — release per-batch without
  * `spark.catalog.clearCache()`, which would also drop any unrelated
  * caches the caller owns.
  *
  * Concurrency contract: release between batches, not mid-operator — a
  * release while another thread is still executing an operator in the
  * SAME session drops caches that operator's running join still reads
  * (the query stays correct; the materialization benefit is lost).
  * Handles are strong references: a caller that never releases keeps
  * each batch's persisted plans reachable, so long-lived embedders
  * should release per batch.
  */
object OperatorCaches {

  private val handles =
    mutable.Map.empty[SparkSession, mutable.ArrayBuffer[Dataset[_]]]

  /** Persist `df` MEMORY_AND_DISK and record the handle for release. */
  def persist(df: DataFrame): DataFrame = synchronized {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    handles.getOrElseUpdate(df.sparkSession, mutable.ArrayBuffer.empty) += df
    df
  }

  /** Unpersist the caches registered under `spark` and forget their
    * handles. Safe to call any number of times; caches already dropped
    * by other means (e.g. `clearCache()`) unpersist as a no-op. */
  def release(spark: SparkSession, blocking: Boolean = false): Unit =
    synchronized {
      handles.remove(spark).foreach(_.foreach(_.unpersist(blocking)))
    }

  /** [[release]] for every session with registered handles. */
  def releaseAll(blocking: Boolean = false): Unit = synchronized {
    handles.valuesIterator.foreach(_.foreach(_.unpersist(blocking)))
    handles.clear()
  }

  /** Number of currently-registered cache handles (test/monitoring aid). */
  def registered: Int = synchronized(handles.valuesIterator.map(_.size).sum)
}
