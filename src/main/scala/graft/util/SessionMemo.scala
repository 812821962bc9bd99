package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for SMALL, expensive-to-build frames that several
  * operators share (dedup pair sets feed clustering, the contamination
  * audit, and the edit-distance verifier; the k-means codebook feeds
  * both its certification query and the learned-IVF probe). Each entry
  * must be an eagerly-materialized `localCheckpoint` of a tiny result —
  * a few hundred rows — so a repeated build costs a table lookup
  * instead of replaying a corpus-scale pipeline. Keys include the
  * fixture dir and every parameter, so every query stays independently
  * callable and results never leak across sessions or scales;
  * corpus-sized INTERMEDIATES are still unpersisted inside each builder
  * (only the tiny result is retained). Relying on CacheManager's
  * plan-matching for this cross-query reuse worked only when plans
  * canonicalized identically AND nothing had unpersisted the shared
  * frame — this makes the reuse deliberate.
  *
  * Eviction is EXPLICIT, not weak: a cached Dataset strongly references
  * its SparkSession, so a weak session key could never be collected
  * while its values live (a WeakHashMap here would pin every entry
  * forever). Instead each entry is dropped on the next memo access
  * after its session's context stops — a stopped session's checkpointed
  * RDDs are unreachable anyway, so releasing the frames then is both
  * safe and the earliest useful moment.
  */
object SessionMemo {
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      scala.collection.mutable.Map[String, Any]]()

  private def perSessionMap(spark: SparkSession)
      : scala.collection.mutable.Map[String, Any] = {
    val it = entries.keySet().iterator()
    while (it.hasNext) {
      if (it.next().sparkContext.isStopped) it.remove()
    }
    entries.computeIfAbsent(spark,
      _ => scala.collection.mutable.Map.empty[String, Any])
  }

  /** `build` must return an already-materialized frame: either an
    * eager `localCheckpoint` of a tiny result, or — for the iterative
    * graph/recursion operators — a `persist(MEMORY_AND_DISK)`ed edge
    * relation materialized with a `count()`. The latter is node-pair
    * scale (not corpus scale) and deliberately retained so repeated
    * pageRank/trustRank/recursive-reach calls in one session reuse ONE
    * cached copy instead of accumulating a fresh persisted relation
    * per call (cache-bloat until eviction). */
  def memoized(spark: SparkSession, key: String)
              (build: => DataFrame): DataFrame = {
    val m = perSessionMap(spark)
    m.synchronized(m.getOrElseUpdate(key, build)).asInstanceOf[DataFrame]
  }

  /** Same lifecycle for a small plain VALUE derived from the data (a
    * probe decision, a measured constant): computed by a Spark job once
    * per (session, key), then a map lookup. */
  def memoizedValue[T](spark: SparkSession, key: String)(build: => T): T = {
    val m = perSessionMap(spark)
    m.synchronized(m.getOrElseUpdate(key, build)).asInstanceOf[T]
  }
}
