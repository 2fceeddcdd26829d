package graft.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.storage.StorageLevel

/** Registry for the MEMORY_AND_DISK intermediates the operators in
  * [[graft.operators]] materialize (signature tables, inverted indexes,
  * normalized-vector tables — see the scale notes on each operator).
  *
  * Operators persist through [[persist]] so the handle is recorded;
  * [[releaseAll]] then unpersists exactly those relations through the
  * CacheManager (clearing the plan→cache mapping, so a later identical
  * `persist()` re-materializes instead of silently no-opping). This lets
  * a caller that runs operators repeatedly in one long-lived session —
  * the in-repo drivers ([[graft.Verify]], [[graft.Bench]]) or an external
  * library user — release per-batch without `spark.catalog.clearCache()`,
  * which would also drop any unrelated caches the caller owns.
  */
object OperatorCaches {

  private val handles = ArrayBuffer.empty[Dataset[_]]

  /** Persist `df` MEMORY_AND_DISK and record the handle for release. */
  def persist(df: DataFrame): DataFrame = synchronized {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    handles += df
    df
  }

  /** Unpersist every operator-registered cache and forget the handles.
    * Safe to call any number of times; caches already dropped by other
    * means (e.g. `clearCache()`) unpersist as a no-op. */
  def releaseAll(blocking: Boolean = false): Unit = synchronized {
    handles.foreach(_.unpersist(blocking))
    handles.clear()
  }

  /** Number of currently-registered cache handles (test/monitoring aid). */
  def registered: Int = synchronized(handles.size)
}
