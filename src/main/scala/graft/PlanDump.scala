package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Generates `PLANS.md`: the physical plans of the headline queries in
  * `explain("formatted")` form, each annotated with the scale property
  * the plan must (and does) exhibit. PlanSpec asserts these properties
  * mechanically; this artifact makes them REVIEWABLE — a reader can
  * check the PushedFilters, the exchange count, and the codegen spans
  * without building the repo.
  *
  * Usage: `runMain graft.PlanDump [sfDir] [outFile]`.
  */
object PlanDump {

  // (query name, what to look for in the plan at 100 TB)
  private val picks: Seq[(String, String)] = Seq(
    "o02_etl_extract" ->
      ("The reference's core ETL (scan + range filter + inner equi-join). " +
        "Look for: `PushedFilters` carrying the `l_extendedprice` range " +
        "into the parquet scan, and the small side broadcast — the fact " +
        "table never shuffles."),
    "x02a_broadcast_join" ->
      ("Dimension join. Look for: `BroadcastHashJoin` (a sort-merge here " +
        "would shuffle the fact table for a dim of a few hundred rows)."),
    "x03_topk" ->
      ("Top-k. Look for: `TakeOrderedAndProject` — per-partition heaps + " +
        "a k-row driver merge, never a global sort."),
    "x09b_minhash_lsh" ->
      ("MinHash-LSH near-dup. The build (session-memoized) band-joins " +
        "DISTINCT shingle-set classes — candidates come from a hash " +
        "join on (band, bucket) over one row per distinct set, never an " +
        "all-pairs comparison and never multiplicity² in dup-dense " +
        "buckets; the signatures build in one map-side-combined " +
        "aggregate over the shared tokenize pass. The visible plan is " +
        "the doc-pair recovery: explode-only expansion over the two " +
        "class-level checkpoints (cross pairs with member lists; " +
        "dup-group members at jaccard 1.0) — no join, no shuffle until " +
        "the presentation sort."),
    "x09m_benchmark_decontam" ->
      ("Benchmark decontamination, broadcast side of the size gate. Look " +
        "for: the eval-gram set behind a `BroadcastExchange` probing the " +
        "corpus gram stream in place — the only shuffle is the per-doc " +
        "count aggregate (map-side combined). Past `maxBroadcastGrams` " +
        "the same query pins a keyed shuffle-merge join instead (OOM-" +
        "safe fallback, row-identical by spec)."),
    "x10a_cosine_topk" ->
      ("Brute-force cosine top-k baseline. Look for: the query set " +
        "broadcasts (`BroadcastNestedLoopJoin`); the corpus side streams " +
        "through the fused quantized-dot expression with NO exchange — " +
        "at 100 TB the corpus never moves."),
    "x15f_sql_q5" ->
      ("TPC-H Q5: 6-table snowflake. Look for: nation/region dims " +
        "broadcast, the c_nationkey = s_nationkey correlation riding the " +
        "fact join as a residual (no cartesian), and the o_orderdate " +
        "range pushed to the orders scan."),
    "x15t_sql_q21" ->
      ("TPC-H Q21 shape: double existential self-join. Look for: EXISTS " +
        "→ `LeftSemi` and NOT EXISTS → `LeftAnti` on the fact table — " +
        "Catalyst decorrelates both; nothing re-executes per row."),
    "x21_salted_join" ->
      ("Hot-key (Zipf 80/20) salted join. Look for: `__salt` inside the " +
        "shuffle keys — the 80%-mass key spreads across `nSalts` " +
        "reducers; the dim side explodes by the salt range (bounded ×8) " +
        "instead of one reducer absorbing 80% of the fact table."),
    "x11p_heavy_hitters" ->
      ("Exact heavy hitters. Look for: two passes over the token stream " +
        "— the Misra-Gries sketch aggregate (partial + final) and the " +
        "exact re-count semi-joined to the ≤capacity candidate set via " +
        "broadcast; no full-vocabulary shuffle."),
    "x23_batch_sessions" ->
      ("Batch sessionization. Look for: ONE hash exchange on user_id — " +
        "the lag window, the running session-id sum, and the per-session " +
        "aggregate all reuse it; gap arithmetic stays in whole-stage " +
        "codegen as BIGINT microseconds."),
    "x22b_incr_resample" ->
      ("Incremental grid refresh. Look for: the untouched-user branch " +
        "anti-joins `Scan ExistingRDD` (the checkpointed materialization " +
        "— NO event rescan) while the refresh branch semi-joins the " +
        "touched users; refresh cost scales with the CDC batch's user " +
        "footprint, not the corpus."),
    "x25_bloom_join" ->
      ("Explicit bloom semi-join reduction. Look for: the codegen'd " +
        "`might_contain` predicate filtering the lineitem scan BELOW " +
        "the `SortMergeJoin`, with the sketch arriving as a one-shot " +
        "`Subquery` (scalar subquery over the dim's bloom aggregate) — " +
        "the join shuffle only carries fact rows whose key is probably " +
        "in dim; false positives are re-verified by the join itself."),
    "x10l_knn_join" ->
      ("k-NN graph join. Look for: candidates born from the banded " +
        "bucket SELF-equi-join (hash join on (band, bandkey, sub) — " +
        "never corpus×corpus; the bucket relation is the session-" +
        "memoized checkpoint of fused quantized-dot sign projections " +
        "with HOT buckets iteratively split by reserve sign bits, so " +
        "both join branches scan it instead of replaying projection + " +
        "refinement), the two embedding joins shuffling only the " +
        "candidate relation, and the per-source rank cut running as " +
        "`WindowGroupLimit` (partial + final) so each shuffle side " +
        "keeps at most k rows per source before the full sort."),
    "x09p_containment" ->
      ("Asymmetric containment dedup. The build (session-memoized) " +
        "runs the rare-gram candidate self-join on `gid` over " +
        "identical-gram-set CLASSES with the hot-gram ceiling applied " +
        "below it (broadcast anti-join, class-size-weighted df), the " +
        "pair count aggregating a packed BIGINT key (one shuffle " +
        "column, map-side combined) and the integer τ filter at class " +
        "level. The visible plan is the bounded doc-pair recovery " +
        "(explode over the class-pair checkpoints, ≤8 partners per doc " +
        "per side) under the final top-8 `WindowGroupLimit`."),
    "x09q_incremental_dedup" ->
      ("Incremental dedup against a persisted signature index. Look " +
        "for: documents.parquet appearing ONLY doc_id-pruned (the " +
        "delta verdict-row join — ReadSchema carries no text), the " +
        "delta signatures riding in from the localCheckpoint RDD scan, " +
        "the corpus entering EXCLUSIVELY through the graft_mhidx_* " +
        "parquet scan (128 bytes/doc, not the text), and candidates " +
        "born from the (band, bandkey) equi-join — the daily batch " +
        "never re-shingles the corpus."),
    "x26_domain_curation" ->
      ("Domain-level curation. Look for: ONE partial/final " +
        "HashAggregate pair on the source key (output is O(domains)), " +
        "the integer cross-multiplied gate as plain projections above " +
        "it, and no second scan — keep/drop folds into the same " +
        "aggregate."),
    "x10m_jl_distortion" ->
      ("JL projection-distortion audit. Look for: the 32 sign " +
        "projections as ONE codegen'd projection stage over the scan " +
        "(no join, no shuffle — the signs are plan-time constants), " +
        "the query side behind a BroadcastExchange (corpus never " +
        "shuffles for scoring, the x10a shape), and the only exchange " +
        "feeding the per-query rank window."),
    "of18_rename_column" ->
      ("Reads after a metadata-only column rename. Look for: the " +
        "parquet scans still reading the FROZEN physical column " +
        "(o_totalprice) with the logical alias (o_price) applied as a " +
        "projection above the scan — no data motion anywhere in the " +
        "rename, and the pruned read's file list still a strict subset " +
        "via the physical stats key."),
    "of8_delete_where" ->
      ("Read path after a file-granular DELETE. Look for: the scan's " +
        "file list mixing v=1 (manifest-referenced untouched files) " +
        "and v=2 (rewritten) paths — the delete rewrote only the " +
        "stats-overlapping files; the aggregate above is an ordinary " +
        "grouped read, proof the manifest layer is invisible to the " +
        "planner."),
    "of10_point_lookup" ->
      ("Bloom-index point lookup. Look for: the scan's file index " +
        "holding ONLY the might-contain files (a strict subset of the " +
        "table — the manifest-level bloom skipped the rest before " +
        "planning), with the residual equality in PushedFilters so " +
        "parquet row-group stats prune inside the surviving files too. " +
        "This venue's key (the smallest part key) recurs across most " +
        "files, so skipping is modest here; SnapshotSpec's " +
        "scattered-unique-key venue pins the sharp case — bloom picks " +
        "~1 file of 8 where min/max bounds touch all 8."),
    "x27_pagerank" ->
      ("Iterative PageRank (3 synchronous rounds). Look for: the " +
        "persisted edge relation (InMemoryTableScan) reused by every " +
        "round; each round is ONE hash join (edges ⋈ ranks on src) + " +
        "ONE partial/final aggregate on dst — the relational Pregel " +
        "round. The rank relation is never broadcast (O(nodes) at web " +
        "scale) and nothing collects to the driver; the final top-20 " +
        "is TakeOrderedAndProject, not a global sort. NOTE the " +
        "planning-time Exchange above each InMemoryTableScan below is " +
        "elided at runtime: the cache is built with a pinned " +
        "REPARTITION_BY_NUM on src, so once the cache stage " +
        "materializes, AQE re-validates and the iteration joins " +
        "consume it co-partitioned — PlanSpec pins the final adaptive " +
        "plan mechanically (zero shuffles over the cache scan, " +
        "broadcast disabled)."),
    "x15w_sql_recursive" ->
      ("WITH RECURSIVE BFS reachability (Spark 4.x iterative SQL). " +
        "Look for: the UnionLoop node holding the anchor (seed " +
        "predicate o_custkey % 97 = 0 pushed into the orders scan) " +
        "and the recursive term (UnionLoopRef ⋈ edges, per-step " +
        "DISTINCT as an Aggregate on (node, hop)) — the working table " +
        "is the frontier, bounded by |nodes| per step, never the d^k " +
        "path enumeration. Honest cost note: the edges CTE subtree " +
        "sits INSIDE the loop body, so the bounded depth (4 steps) " +
        "re-derives it per step — the SQL-surface form; the " +
        "materialized-once iterative form of the same graph is x27 " +
        "(Graph.linkedEdges' pinned-partition cache)."),
    "x28_token_budget" ->
      ("Budgeted data selection via histogram threshold. Look for: " +
        "the corpus scanned a bounded number of times with NO " +
        "corpus-wide window anywhere — the only unpartitioned windows " +
        "run over the ≤1001-row score histogram and the O(chunks) " +
        "boundary relation; the full-bucket keep is a BroadcastExchange " +
        "semi-join; the boundary bucket's per-doc rank windows " +
        "partition by 1024-doc chunks. The naive form this replaces is " +
        "one window over the whole corpus order — a single-task sort " +
        "at 100 TB."),
    "x13f_sessionize_append" ->
      ("Append-mode streaming sessionization (r13) — the plan shown is " +
        "the sink RE-READ (the streaming drain already ran); what to " +
        "look for is the SHAPE claim stated by the operator: sessions " +
        "emit once, when the watermark passes their end, so each " +
        "micro-batch's sink write is O(sessions closed by that batch) " +
        "— never the O(corpus) running-result overwrite complete mode " +
        "re-emits (x13b). The finalization cut is exact: sink ≡ batch " +
        "sessions with end_us ≤ (max_us div 1000 − delay_ms) · 1000 " +
        "(Spark's ms-truncated watermark), oracle-checked per run."))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outFile = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb ++= s"""# PLANS — physical plans of the headline queries
               |
               |Generated by `runMain graft.PlanDump $sfDir` (re-run after
               |any operator change; PlanSpec asserts the load-bearing
               |properties mechanically, this file is the human-readable
               |record). Read each plan bottom-up: scans → exchanges →
               |joins/aggregates. The things that matter at 100 TB:
               |
               |- `PushedFilters` / `ReadSchema` on every parquet scan —
               |  filters and pruning reach storage.
               |- Exchange count — every `Exchange` is a cluster-wide
               |  shuffle; the plans below carry only the shuffles their
               |  semantics require.
               |- `BroadcastExchange` on dimension/query/eval-set sides —
               |  the corpus-sized relation never moves for these joins.
               |- `WholeStageCodegen` spans — the hot path stays inside
               |  generated code (custom expressions here implement
               |  `doGenCode`).
               |""".stripMargin

    // queries whose returned frame is an eager checkpoint (plan = RDD
    // scan) expose a plan-only form so the real physical plan stays on
    // the record
    val planOnly: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "x15w_sql_recursive" ->
        ((s, d) => graft.operators.SqlApi.recursiveReachPlanOnly(s, d)))
    picks.foreach { case (name, note) =>
      val df = planOnly.getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb ++= s"\n## $name\n\n$note\n\n```\n$plan```\n"
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      sb.toString.getBytes("UTF-8"))
    println(s"wrote $outFile (${picks.size} plans)")
    spark.stop()
  }
}
