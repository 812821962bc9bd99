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

  // ---- build-cost ledger ------------------------------------------------
  // Shared-infra accounting for the bench harness (VERDICT r11 #4): a
  // memo build is ONE-TIME infrastructure whose cost lands inside
  // whichever query happens to touch the key first — three rounds
  // running, that run-order dependence inflated a venue line (x20b,
  // x13a) into a false regression that needed manual solo
  // adjudication. Every executed build block records (key, seconds)
  // here; the bench drains the queue per query, charges the seconds to
  // an explicit `memo_builds` artifact entry, and reports the query
  // line operator-cost-only. Only TOP-LEVEL builds are logged (a memo
  // built inside another memo's build block is part of the outer
  // build's seconds — logging both would double-charge).
  private val buildLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
  private val buildDepth = new ThreadLocal[Integer] {
    override def initialValue: Integer = 0
  }

  private def logged[T](key: String)(build: => T): T = {
    val d = buildDepth.get(); buildDepth.set(d + 1)
    val t0 = System.nanoTime()
    try {
      val v = build
      if (d == 0) buildLog.add((key, (System.nanoTime() - t0) / 1e9))
      v
    } finally buildDepth.set(d)
  }

  /** Drain and return the (key, seconds) entries of every top-level
    * memo build executed since the last drain. */
  def drainBuildLog(): Seq[(String, Double)] = {
    val out = scala.collection.mutable.Buffer.empty[(String, Double)]
    var e = buildLog.poll()
    while (e != null) { out += e; e = buildLog.poll() }
    out.toSeq
  }

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
    m.synchronized(m.getOrElseUpdate(key, logged(key)(build)))
      .asInstanceOf[DataFrame]
  }

  /** Same lifecycle for a small plain VALUE derived from the data (a
    * probe decision, a measured constant): computed by a Spark job once
    * per (session, key), then a map lookup. */
  def memoizedValue[T](spark: SparkSession, key: String)(build: => T): T = {
    val m = perSessionMap(spark)
    m.synchronized(m.getOrElseUpdate(key, logged(key)(build)))
      .asInstanceOf[T]
  }
}
