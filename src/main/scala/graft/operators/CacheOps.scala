package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

/** The persist → materialize → release discipline shared by operators
  * that reference a corpus-scale frame from several plan branches
  * (Catalyst does not reuse common subtrees, so a lazy frame would
  * re-execute per reference). */
private[graft] object CacheOps {

  /** Persist and eagerly materialize `df`; if the materializing action
    * itself fails, the fresh cache is released before the error
    * propagates — otherwise a failed operator strands a corpus-sized
    * cache in the session's CacheManager with no owner. */
  def persistMaterialized(df: DataFrame): DataFrame =
    persistMaterializedCounted(df)._1

  /** [[persistMaterialized]], also returning the row count the
    * materializing action produced — loops that need the count for
    * convergence checks must not pay a second count job per round. */
  def persistMaterializedCounted(df: DataFrame): (DataFrame, Long) = {
    val p = df.persist(MEMORY_AND_DISK)
    try { (p, p.count()) }
    catch { case t: Throwable => p.unpersist(blocking = true); throw t }
  }
}
