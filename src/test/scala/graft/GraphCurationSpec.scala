package graft

import graft.operators.{Curation, Graph}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins for the round-8 curation additions: PageRank's exact integer
  * trajectory (shape + partitioning-independence; exact values are the
  * DuckDB oracle's job), the token-budget histogram-threshold plan's
  * EQUALITY with the naive corpus-wide window it replaces, and the
  * deterministic corpus shuffle's permutation invariants. */
class GraphCurationSpec extends SparkSuite {

  test("pageRank: top-20 shape, positive ranks, strict rank order") {
    val out = Graph.pageRank(spark, sf).collect()
    assert(out.length == 20)
    assert(out.map(_.getInt(0)).toSeq == (1 to 20))
    val ranks = out.map(_.getLong(3))
    assert(ranks.forall(_ > 0))
    // rnk is ordered by (rank desc, node) — ranks must be non-increasing
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    assert(out.map(_.getString(1)).forall(
      t => t == "customer" || t == "supplier"))
  }

  test("pageRank is partitioning-independent (exact integer trajectory)") {
    val a = Graph.pageRank(spark, sf).collect().toSeq
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val b = Graph.pageRank(spark, sf).collect().toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("pageRank at depth 10: checkpoint cadence is trajectory-neutral") {
    // VERDICT r13 #6: the iterations/checkpointInterval parameters.
    // A 10-round run crosses the default interval-5 checkpoint twice;
    // truncating lineage must not perturb the exact integer trajectory
    // — pin it against the same depth with checkpointing effectively
    // off, and pin that depth actually changes the answer vs 3 rounds
    // (the parameter is live, not decorative).
    val deep = Graph.pageRank(spark, sf, iterations = 10).collect().toSeq
    val noCkpt = Graph.pageRank(spark, sf, iterations = 10,
      checkpointInterval = 100).collect().toSeq
    assert(deep == noCkpt,
      "lineage checkpointing changed the rank trajectory")
    assert(deep.length == 20)
    assert(deep.map(_.getLong(3)).forall(_ > 0))
    val shallow = Graph.pageRank(spark, sf).collect().toSeq
    assert(deep != shallow, "10 rounds should move ranks vs 3")
  }

  test("trustRank: teleport mass reaches only seed-connected nodes") {
    val out = Graph.trustRank(spark, sf).collect()
    assert(out.length == 20)
    // every seed in the top-20 carries at least its own teleport mass
    out.filter(_.getBoolean(3)).foreach { r =>
      assert(r.getLong(4) >= 150000000L,
        s"seed ${r.getLong(2)} below its teleport floor: ${r.getLong(4)}")
    }
    // the whitelist exists and the ranking is genuinely seeded: the
    // top node must be seed-adjacent (rank > 0 requires a trusted path)
    assert(out.exists(_.getBoolean(3)), "no seed reached the top-20")
    assert(out.forall(_.getLong(4) > 0))
    // deterministic under a different partitioning
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      assert(Graph.trustRank(spark, sf).collect().toSeq == out.toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("recursive CTE reachability equals an independent iterative BFS") {
    // the SQL (x15w) accumulates per-step DISTINCT frontiers and takes
    // min(hop); an independently-coded driver-side BFS over the same
    // graph must produce the identical (hops, nodes, min, max) profile
    val out = graft.operators.SqlApi.recursiveReach(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"))
    val od = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(od, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
    val edges = pairs
      .select((col("c") * 2).as("src"), (col("s") * 2 + 1).as("dst"))
      .union(pairs.select((col("s") * 2 + 1).as("src"),
        (col("c") * 2).as("dst")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2).toSet
    }
    val seeds = pairs.select((col("c") * 2).as("n")).distinct()
      .collect().map(_.getLong(0)).filter(n => (n / 2) % 97 == 0).toSet
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (h <- 1 to 3) {
      val fresh = frontier.flatMap(n => adj.getOrElse(n, Set.empty[Long]))
        .filterNot(dist.contains)
      dist ++= fresh.map(_ -> h)
      frontier = fresh
    }
    val expect = dist.groupBy(_._2).toSeq.map { case (h, m) =>
      val ns = m.keys
      (h, ns.size.toLong, ns.min, ns.max)
    }.sortBy(_._1)
    assert(out == expect, s"sql=$out bfs=$expect")
    assert(out.head._1 == 0 && out.head._2 == seeds.size.toLong)
  }

  test("tokenBudgetSelect equals the naive corpus-wide cumulative window") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast("long")
          .as("n_distinct"))
      .withColumn("score", expr("(n_distinct * 1000) div n_tokens"))
    val budget = docs.agg(expr("2 * sum(n_tokens) div 5")).head().getLong(0)
    // the naive form: ONE window over the whole corpus order
    val naive = docs
      .withColumn("cum", sum("n_tokens").over(
        Window.orderBy(col("score").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("source")
      .agg(sum(when(col("cum") <= budget, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("cum") <= budget, 0L).otherwise(1L)).as("n_dropped"),
        sum(when(col("cum") <= budget, col("n_tokens")).otherwise(0L))
          .as("kept_tokens"))
      .orderBy("source").collect().toSeq
    val dist = Curation.tokenBudgetSelect(spark, sf).collect().toSeq
    assert(dist == naive)
    // and the budget actually bites: something kept, something dropped
    assert(dist.map(_.getLong(1)).sum > 0 && dist.map(_.getLong(2)).sum > 0)
  }

  test("weightedSample: ~20% kept, long docs overrepresented, deterministic") {
    val out = graft.operators.TextAnalysis.weightedSample(spark, sf).collect()
    val nDocs = out.map(_.getLong(1)).sum
    val nKept = out.map(_.getLong(2)).sum
    val keptChars = out.map(_.getLong(3)).sum
    assert(nKept > nDocs / 10 && nKept < nDocs / 2,
      s"kept $nKept of $nDocs — inclusion rule off")
    // weight bias: mean chars of a KEPT doc exceeds the corpus mean
    // (that is the point of ∝-weight sampling)
    val totalChars = graft.sources.Tables.documents(spark, sf)
      .agg(sum("n_chars")).head().getLong(0)
    assert(keptChars * nDocs > totalChars * nKept,
      s"kept-doc mean ${keptChars / nKept} not above corpus mean " +
        s"${totalChars / nDocs}")
    assert(graft.operators.TextAnalysis.weightedSample(spark, sf)
      .collect().toSeq == out.toSeq)
  }

  test("weightedSample: 64-bit headroom violation fails loudly, not wrap-to-empty") {
    // a corpus whose total weight crosses 2^32 used to wrap the
    // u·Σw product negative in non-ANSI mode and silently keep zero
    // rows while the DuckDB oracle errored; the operator now raises
    // with the measured values instead
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_wsoverflow_").toString
    (1L to 3L).map(i => (i, s"src$i", 2147483647L))
      .toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[Exception] {
      graft.operators.TextAnalysis.weightedSample(spark, dir).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("headroom"), s"unexpected failure: $e")
  }

  test("corpusShuffle: permutation covers every doc exactly once") {
    val docs = graft.sources.Tables.documents(spark, sf).count()
    val out = Curation.corpusShuffle(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == docs)
    // all 8 shards populated, keys within the LCG modulus
    assert(out.map(_.getLong(0)).toSet == (0L to 7L).toSet)
    assert(out.forall(r => r.getLong(2) >= 0 && r.getLong(3) < 2147483647L))
    // deterministic: a rerun (different partition count) is identical
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      assert(Curation.corpusShuffle(spark, sf).collect().toSeq
        == out.toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
