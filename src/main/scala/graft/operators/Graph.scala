package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over relationship data — the
  * domain-authority half of corpus curation (CommonCrawl-class pipelines
  * rank registered domains by link centrality and gate document quality
  * on it; the reference's star schema has no link table, so the graph
  * here is the customer↔supplier trade graph its `lineitem ⋈ orders`
  * relation implies).
  *
  * Exactness discipline: ranks are integers at a fixed scale and every
  * per-edge contribution is a floored rational computed with the
  * identity `⌊r·w/W⌋ = (r div W)·w + ((r mod W)·w) div W` — all
  * intermediates non-negative and < 2^63, so the trajectory replays
  * bit-for-bit on any engine with 64-bit integer division (the DuckDB
  * oracle unrolls the same three iterations as CTEs).
  *
  * 100 TB shape: edges are the corpus-sized relation and are touched
  * once per iteration through a hash join on `src` against the
  * O(nodes) rank relation — both sides hash-partition on the node key,
  * so every iteration is one co-partitioned join + one reduce, the
  * textbook Pregel round expressed relationally. Nothing is collected
  * to the driver; the rank relation is never broadcast (at web scale,
  * nodes = domains ≈ 10^8 — small next to the edge set but not
  * driver-small). The aggregated edge relation is persisted across
  * iterations (one shuffle, three reuses); a longer-running job would
  * checkpoint ranks every ~5 rounds to truncate lineage.
  */
object Graph {

  private val Scale = 1000000000L // 1e9: 9 fractional digits of rank

  /** PageRank (damping 0.85, `iterations` synchronous rounds, default
    * 3 — the published x27 contract) over the symmetric
    * customer↔supplier graph: an edge per (custkey, suppkey) pair
    * weighted by its lineitem count, both directions, so every node
    * has out-mass and the dangling-mass term vanishes. Emits the
    * top-20 nodes by final rank with a total order.
    *
    * Longer jobs: every `checkpointInterval` rounds the O(nodes) rank
    * relation is checkpointed (lineage TRUNCATED) — without it each
    * round's plan nests the previous round's, so analysis/codegen cost
    * grows super-linearly with depth and a 20-round job replays the
    * whole chain on any partition loss. `localCheckpoint` here
    * (executor-local blocks — right for `local[*]` and for
    * fault-tolerance-by-recompute-is-fine jobs); at cluster scale with
    * long jobs prefer a reliable `checkpoint` dir — same call shape.
    * The default x27 depth (3 < interval) never checkpoints, so the
    * committed plans and the unrolled-CTE oracle are untouched. */
  def pageRank(spark: SparkSession, sfDir: String,
               iterations: Int = 3,
               checkpointInterval: Int = 5): DataFrame =
    pageRankCore(linkedEdges(spark, sfDir), iterations, checkpointInterval)

  /** The symmetric weighted trade graph folded with per-source
    * out-mass, hash-partitioned on the join key and cached so the
    * iteration joins reuse one shuffle (the Pregel invariant). */
  private def linkedEdges(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.SessionMemo.memoized(spark, s"linkedEdges|$sfDir") {
      buildLinkedEdges(spark, sfDir)
    }

  /** The weighted distinct trade-pair relation (custkey, suppkey,
    * lineitem-count) — the ONE corpus scan behind every graph-shaped
    * query (pageRank/trustRank edges here, the recursive-reach BFS in
    * [[SqlApi.recursiveReach]]). Session-memoized so the three queries
    * share a single lineitem⋈orders pass: pair-scale (≤ one row per
    * distinct trading relationship), persisted and materialized. */
  private[graft] def tradePairs(spark: SparkSession, sfDir: String)
      : DataFrame =
    graft.util.SessionMemo.memoized(spark, s"tradePairs|$sfDir") {
      val p = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .agg(count(lit(1)).as("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    }

  private def buildLinkedEdges(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val pairs = tradePairs(spark, sfDir)
    // node encoding: customer 2k, supplier 2k+1 — one integer key space
    val edges = pairs.select((col("c") * 2).as("src"),
        (col("s") * 2 + 1).as("dst"), col("w"))
      .unionByName(pairs.select((col("s") * 2 + 1).as("src"),
        (col("c") * 2).as("dst"), col("w")))
    // fold edge weights + out-mass into one relation so each iteration
    // joins ONE corpus-sized side; persisted because three iterations
    // reuse it (at cluster scale: cache to disk-backed storage levels)
    val outw = edges.groupBy("src").agg(sum("w").as("ow"))
    // hash-partition the edge relation on the JOIN key before caching:
    // the cached relation then carries HashPartitioning(src), so every
    // iteration's edges⋈ranks join reuses it and only the O(nodes)
    // rank relation moves per round — the corpus-sized side is
    // shuffled ONCE for the whole computation, the Pregel invariant.
    // The partition COUNT must be pinned explicitly: a bare
    // repartition(col) is removed as redundant with the join's output
    // partitioning and the cached plan's final partition count is then
    // AQE-chosen, so whether consumer joins can reuse it depends on
    // runtime re-validation against whatever count AQE picked —
    // planning inserts an Exchange over every cache scan and only
    // sometimes elides it. REPARTITION_BY_NUM survives optimization
    // and AQE renumbering, making the reuse deterministic.
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val linked = edges.join(outw, "src")
      .select("src", "dst", "w", "ow")
      .repartition(n, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize before the memo retains it: callers then share one
    // realized cache; without the memo, every pageRank/trustRank call
    // persisted a fresh copy that was never unpersisted (cache bloat
    // until LRU eviction under repeated invocation in one session)
    linked.count()
    linked
  }

  private def pageRankCore(linked: DataFrame, iterations: Int = 3,
                           checkpointInterval: Int = 5): DataFrame = {
    require(iterations >= 1 && checkpointInterval >= 1,
      s"pageRank: iterations ($iterations) and checkpointInterval " +
        s"($checkpointInterval) must be >= 1")
    val nodes = linked.select(col("src").as("node")).distinct()
    val r0 = nodes.select(col("node"), lit(Scale).as("rank"))
    val rFinal = (1 to iterations).foldLeft(r0) { (r, i) =>
      val next = linked.join(r, linked("src") === r("node"))
        .select(col("dst"),
          // ⌊rank·w/ow⌋ without the 128-bit product (overflow-safe)
          (expr("rank div ow") * col("w")
            + expr("((rank % ow) * w) div ow")).as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg((lit(15L * Scale / 100)
          + expr("85 * sum(contrib) div 100")).as("rank"))
      // Truncate lineage every `checkpointInterval` rounds: the rank
      // relation is O(nodes) — checkpointing it is cheap — while the
      // UNtruncated plan re-nests every prior round (analysis +
      // codegen grow with depth; a lost partition replays the chain).
      // Skipped on the final round (the consumer materializes it) and
      // never reached at the default depth of 3.
      if (i % checkpointInterval == 0 && i < iterations)
        next.localCheckpoint(eager = true)
      else next
    }
    // top-20 via sort+limit (TakeOrderedAndProject — a distributed
    // partial top-k, no global sort); the rank window then runs over
    // the 20 surviving rows, never the O(nodes) relation
    val out = rFinal
      .orderBy(col("rank").desc, col("node")).limit(20)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rank").desc, col("node"))))
      .select(col("rnk"),
        when(col("node") % 2 === 0, "customer").otherwise("supplier")
          .as("node_type"),
        expr("node div 2").as("orig_key"), col("rank"))
      .orderBy("rnk")
    out
  }

  /** TrustRank (seeded/personalized PageRank) — the spam-demotion half
    * of domain authority: teleport mass flows ONLY to a trusted seed
    * set (here customers with `custkey mod 7 = 0`, a deterministic
    * ~14% whitelist), so nodes reachable only through long untrusted
    * paths rank near zero however densely they interlink — exactly how
    * production link-spam demotion works (Gyöngyi et al.). Same exact
    * integer trajectory discipline as [[pageRank]]: r0 = Scale on
    * seeds, 0 elsewhere; each round `r' = [seed]·(0.15·Scale) +
    * ⌊0.85·Σ⌊r·w/W⌋⌋. The seed predicate is pure node arithmetic
    * (`node even ∧ (node div 2) mod 7 = 0`), so no seed relation joins
    * the iteration. Emits the top-20 with seed flags. */
  def trustRank(spark: SparkSession, sfDir: String): DataFrame = {
    val linked = linkedEdges(spark, sfDir)
    val seed = (col("node") % 2 === 0) && (expr("node div 2") % 7 === 0)
    val nodes = linked.select(col("src").as("node")).distinct()
    val r0 = nodes.select(col("node"),
      when(seed, Scale).otherwise(0L).as("rank"))
    val rFinal = (1 to 3).foldLeft(r0) { (r, _) =>
      linked.join(r, linked("src") === r("node"))
        .select(col("dst"),
          (expr("rank div ow") * col("w")
            + expr("((rank % ow) * w) div ow")).as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg(expr("85 * sum(contrib) div 100").as("flow"))
        .select(col("node"),
          (when(seed, 15L * Scale / 100).otherwise(0L) + col("flow"))
            .as("rank"))
    }
    rFinal
      .orderBy(col("rank").desc, col("node")).limit(20)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rank").desc, col("node"))))
      .select(col("rnk"),
        when(col("node") % 2 === 0, "customer").otherwise("supplier")
          .as("node_type"),
        expr("node div 2").as("orig_key"),
        seed.as("is_seed"), col("rank"))
      .orderBy("rnk")
  }

  /** The unrolled DuckDB twin of [[trustRank]]. */
  val trustRankOracle: String = {
    val seedSql = "(node % 2 = 0 AND (node // 2) % 7 = 0)"
    def iter(prev: String, cur: String) =
      s"""$cur AS (SELECT e.dst AS node,
         |  CAST(CASE WHEN (e.dst % 2 = 0 AND (e.dst // 2) % 7 = 0)
         |         THEN 150000000 ELSE 0 END
         |    + (85 * SUM((r.rank // e.ow) * e.w
         |        + ((r.rank % e.ow) * e.w) // e.ow)) // 100
         |    AS BIGINT) AS rank
         |FROM linked e JOIN $prev r ON e.src = r.node GROUP BY 1)"""
        .stripMargin
    s"""WITH pairs AS (
       |  SELECT o_custkey AS c, l_suppkey AS s, COUNT(*) AS w
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |edges AS (SELECT c*2 AS src, s*2+1 AS dst, w FROM pairs
       |          UNION ALL SELECT s*2+1, c*2, w FROM pairs),
       |outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow
       |         FROM edges GROUP BY 1),
       |linked AS (SELECT e.src, e.dst, CAST(e.w AS BIGINT) AS w, o.ow
       |           FROM edges e JOIN outw o ON e.src = o.src),
       |r0 AS (SELECT node,
       |         CAST(CASE WHEN $seedSql THEN 1000000000 ELSE 0 END
       |           AS BIGINT) AS rank
       |       FROM (SELECT DISTINCT src AS node FROM linked)),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")},
       |rk AS (SELECT node, rank,
       |         ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS rnk
       |       FROM r3)
       |SELECT CAST(rnk AS INT) AS rnk,
       |       CASE WHEN node % 2 = 0 THEN 'customer'
       |            ELSE 'supplier' END AS node_type,
       |       node // 2 AS orig_key, $seedSql AS is_seed, rank
       |FROM rk WHERE rnk <= 20 ORDER BY rnk""".stripMargin
  }

  /** The unrolled DuckDB twin of [[pageRank]] — same constants, same
    * floored-rational contribution, three iterations as chained CTEs. */
  val pageRankOracle: String = {
    def iter(prev: String, cur: String) =
      s"""$cur AS (SELECT e.dst AS node,
         |  CAST(150000000 + (85 * SUM((r.rank // e.ow) * e.w
         |    + ((r.rank % e.ow) * e.w) // e.ow)) // 100 AS BIGINT) AS rank
         |FROM linked e JOIN $prev r ON e.src = r.node GROUP BY 1)"""
        .stripMargin
    s"""WITH pairs AS (
       |  SELECT o_custkey AS c, l_suppkey AS s, COUNT(*) AS w
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |edges AS (SELECT c*2 AS src, s*2+1 AS dst, w FROM pairs
       |          UNION ALL SELECT s*2+1, c*2, w FROM pairs),
       |outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow
       |         FROM edges GROUP BY 1),
       |linked AS (SELECT e.src, e.dst, CAST(e.w AS BIGINT) AS w, o.ow
       |           FROM edges e JOIN outw o ON e.src = o.src),
       |r0 AS (SELECT DISTINCT src AS node,
       |         CAST(1000000000 AS BIGINT) AS rank FROM linked),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")},
       |rk AS (SELECT node, rank,
       |         ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS rnk
       |       FROM r3)
       |SELECT CAST(rnk AS INT) AS rnk,
       |       CASE WHEN node % 2 = 0 THEN 'customer'
       |            ELSE 'supplier' END AS node_type,
       |       node // 2 AS orig_key, rank
       |FROM rk WHERE rnk <= 20 ORDER BY rnk""".stripMargin
  }
}
