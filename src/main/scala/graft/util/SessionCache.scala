package graft.util

import org.apache.spark.sql.SparkSession

/** (session, key) memo for persisted per-corpus frames (extraction run,
  * shingle table, LSH buckets). Entries whose SparkSession has been
  * stopped are evicted on every access, so a long-lived JVM that hosts
  * many short-lived sessions does not retain stopped-session references
  * or their cached Datasets for the process lifetime.
  */
final class SessionCache[V] {
  private val m = scala.collection.mutable.Map.empty[(SparkSession, String), V]

  def getOrElseUpdate(s: SparkSession, key: String)(mk: => V): V = synchronized {
    m.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
    m.getOrElseUpdate((s, key), mk)
  }

  /** Test/ops hook: drop everything. */
  def clear(): Unit = synchronized(m.clear())
}
