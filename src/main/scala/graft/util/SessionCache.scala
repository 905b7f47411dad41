package graft.util

import org.apache.spark.sql.SparkSession

/** (session, key) memo for persisted per-corpus frames (extraction run,
  * shingle table, LSH buckets). Entries whose SparkSession has been
  * stopped are evicted on every access, so a long-lived JVM that hosts
  * many short-lived sessions does not retain stopped-session references
  * or their cached Datasets for the process lifetime.
  *
  * The map lock is held only to look up / register a per-key holder;
  * the (possibly slow) materialization itself runs under the holder's
  * own lazy-val lock, so a first-touch pipeline persist does not block
  * unrelated (session, dir) lookups — concurrent callers of the SAME
  * key still coalesce onto one computation.
  */
final class SessionCache[V] {
  private final class Holder(mk: () => V) { lazy val value: V = mk() }

  private val m = scala.collection.mutable.Map.empty[(SparkSession, String), Holder]

  def getOrElseUpdate(s: SparkSession, key: String)(mk: => V): V = {
    val h = synchronized {
      m.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
      m.getOrElseUpdate((s, key), new Holder(() => mk))
    }
    h.value
  }

  /** Test/ops hook: drop everything. */
  def clear(): Unit = synchronized(m.clear())
}
