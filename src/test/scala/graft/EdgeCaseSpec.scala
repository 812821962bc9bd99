package graft

import graft.operators.{Dedup, PartitionCache, Similarity, TextAnalysis}

/** Degenerate-corpus behavior: a CLEAN corpus (no near-dups), an empty
  * corpus, and a single document must flow through every pipeline
  * without crashing — the failure mode the reference has (int(NaN) on
  * an unknown county) and an iterative CC loop can hit (NULL label sum
  * on an empty pair graph). */
class EdgeCaseSpec extends SparkSuite {

  /** Fixture dir containing EMPTY documents/embeddings with the real
    * schemas. */
  private def sliced(n: Int, label: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(label).toString
    // events.ts is read raw (nanosAsLong set for the ns fixture
    // generation; the µs-NTZ generation round-trips as NTZ) — either
    // way Tables.normalizeTs lands the slice on the certified type
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (t <- Seq("documents", "embeddings", "events", "lineitem", "orders"))
      spark.read.parquet(s"$sf/$t.parquet").limit(n)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    dir
  }

  private lazy val emptySf: String = sliced(0, "graft_empty_")

  /** Fixture dir with exactly one document / one vector / one event. */
  private lazy val oneSf: String = sliced(1, "graft_one_")

  test("dedup family is empty-safe (clean corpus → zero pairs, no crash)") {
    assert(Dedup.exactDedup(spark, emptySf).count() == 0)
    assert(Dedup.minhashLsh(spark, emptySf).count() == 0)
    assert(Dedup.simhashPairs(spark, emptySf).count() == 0)
    assert(Dedup.ngramJaccard(spark, emptySf).count() == 0)
    assert(Dedup.dedupClusters(spark, emptySf).count() == 0)
    assert(Dedup.contamination(spark, emptySf).count() == 0)
  }

  test("text analysis is empty-safe") {
    assert(TextAnalysis.fingerprint(spark, emptySf).count() == 0)
    assert(TextAnalysis.tfidfTop(spark, emptySf).count() == 0)
    assert(TextAnalysis.chunkDocs(spark, emptySf).count() == 0)
    assert(TextAnalysis.cleanText(spark, emptySf).count() == 0)
    assert(TextAnalysis.stratifiedSample(spark, emptySf).count() == 0)
    assert(TextAnalysis.repetition(spark, emptySf).count() == 0)
    assert(TextAnalysis.piiRedaction(spark, emptySf).count() == 0)
    assert(Dedup.chunkDedup(spark, emptySf).count() == 0)
    // BPE on an empty corpus: no words → no pairs → an empty merge
    // table (each round's LIMIT-1 argmax is empty, not an error)
    assert(TextAnalysis.bpeMerges(spark, emptySf).count() == 0)
    assert(TextAnalysis.bpeEncode(spark, emptySf).count() == 0)
    // funnel: empty corpus → every stage empty → zero stage rows
    assert(TextAnalysis.corpusFunnel(spark, emptySf).count() == 0)
    assert(TextAnalysis.heavyHitters(spark, emptySf).count() == 0)
  }

  test("multimodal featurizers are empty-safe and keep their schemas") {
    val r = graft.operators.Multimodal.resizedImages(spark, emptySf)
    assert(r.count() == 0 && r.columns.contains("resized_sum"))
    val f = graft.operators.Multimodal.audioFrames(spark, emptySf)
    assert(f.count() == 0 &&
      f.columns.toSeq == Seq("doc_id", "frame", "n_frame_samples",
        "frame_abs_sum"))
    // one doc: exactly one modality's rows, by doc_id % 3
    val one = graft.operators.Multimodal.decodedMeta(spark, oneSf).collect()
    assert(one.length == 1)
  }

  test("similarity search is empty-safe") {
    assert(Similarity.cosineTopK(spark, emptySf).count() == 0)
    assert(Similarity.annLsh(spark, emptySf).count() == 0)
    assert(Similarity.embeddingNearDup(spark, emptySf).count() == 0)
    assert(Similarity.labelCentroids(spark, emptySf).count() == 0)
    assert(Similarity.nearestCentroid(spark, emptySf).count() == 0)
  }

  test("single-document corpus yields no pairs but full per-doc rows") {
    assert(Dedup.minhashLsh(spark, oneSf).count() == 0)
    assert(Dedup.ngramJaccard(spark, oneSf).count() == 0)
    assert(Dedup.dedupClusters(spark, oneSf).count() == 0)
    assert(Dedup.simhash(spark, oneSf).count() == 1)
    assert(TextAnalysis.fingerprint(spark, oneSf).count() == 1)
    assert(TextAnalysis.chunkDocs(spark, oneSf).count() >= 1)
    assert(TextAnalysis.repetition(spark, oneSf).count() == 1)
    // one document: every block is globally unique -> zero dup blocks
    val cd = Dedup.chunkDedup(spark, oneSf).collect()
    assert(cd.length == 1 && cd.head.getLong(2) == 0L)
    // one vector: it is its own nearest centroid
    val conf = Similarity.nearestCentroid(spark, oneSf).collect()
    assert(conf.length == 1 && conf.head.getLong(2) == 1L)
  }

  test("round-5 ops are empty- and single-row-safe") {
    // empty corpus: every pipeline flows to zero rows, no NULL crashes
    assert(Similarity.semanticDedup(spark, emptySf).count() == 0)
    assert(Dedup.benchmarkDecontam(spark, emptySf).count() == 0)
    assert(TextAnalysis.mixtureSample(spark, emptySf).count() == 0)
    assert(TextAnalysis.vocabCoverage(spark, emptySf).count() == 0)
    // one document / one vector
    val sd = Similarity.semanticDedup(spark, oneSf).collect()
    assert(sd.length == 1 && sd.head.getInt(2) == 1,
      "a lone vector must keep itself")
    assert(Dedup.benchmarkDecontam(spark, oneSf).count() == 0,
      "no test split → nothing can be contaminated")
    val mx = TextAnalysis.mixtureSample(spark, oneSf).collect()
    assert(mx.length == 1, "a lone doc saturates its tier's rate at 1")
    val vc = TextAnalysis.vocabCoverage(spark, oneSf).collect()
    assert(vc.length == 4 && vc.forall(_.getLong(1) >= 1))
  }

  test("repeated spans, LM scoring, and outlier flagging are edge-safe") {
    import graft.operators.Relational
    // empty corpus / empty events: zero rows, no crash
    assert(Dedup.repeatedSpans(spark, emptySf).count() == 0)
    assert(TextAnalysis.lmScore(spark, emptySf).count() == 0)
    assert(Relational.outlierEvents(spark, emptySf).count() == 0)
    // one document: no cross-doc repeats, but the doc still scores
    assert(Dedup.repeatedSpans(spark, oneSf).count() == 0,
      "a lone doc has no cross-document spans")
    val lm = TextAnalysis.lmScore(spark, oneSf).collect()
    assert(lm.length == 1 && lm.head.getLong(2) >= 0)
    // a singleton group has zero variance AND zero deviation: 0 > 0 is
    // false, so it can never flag itself
    assert(Relational.outlierEvents(spark, oneSf).count() == 0)
    // an empty stream must not hang the outer join's eviction-flush wait
    assert(graft.streaming.Streaming
      .streamStreamOuterJoin(spark, emptySf).count() == 0)
  }

  test("round-8 ops are empty- and single-row-safe") {
    import graft.operators.{Curation, Graph}
    // graph centrality: empty trade graph → no nodes → empty top-20
    assert(Graph.pageRank(spark, emptySf).count() == 0)
    assert(Graph.trustRank(spark, emptySf).count() == 0)
    // a single (lineitem, order) slice: at most one edge pair → ≤ 2
    // ranked nodes, no crash either way (the rows may not even join)
    assert(Graph.pageRank(spark, oneSf).count() <= 2)
    // curation: empty in, empty (or zero-count) out
    assert(Curation.tokenBudgetSelect(spark, emptySf).count() == 0)
    assert(Curation.corpusShuffle(spark, emptySf).count() == 0)
    assert(TextAnalysis.weightedSample(spark, emptySf).count() == 0)
    assert(Similarity.int8Export(spark, emptySf).count() == 0)
    assert(Dedup.crossSourceMatrix(spark, emptySf).count() == 0)
    assert(TextAnalysis.funnelAttribution(spark, emptySf).count() == 0)
    val pad = TextAnalysis.paddingAudit(spark, emptySf).collect()
    assert(pad.length == 2 && pad.forall(_.getLong(1) == 0L),
      "empty corpus must yield zero batches under both strategies")
    // single doc: the budget (2/5 of its tokens) cannot fit it — one
    // per-source row, nothing kept; shuffle/sample/export all 1-row
    assert(Curation.tokenBudgetSelect(spark, oneSf).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((0L, 1L)))
    assert(Curation.corpusShuffle(spark, oneSf)
      .agg(org.apache.spark.sql.functions.sum("n_docs"))
      .head().getLong(0) == 1L)
    assert(Similarity.int8Export(spark, oneSf).count() == 1)
  }

  test("HLL sketch rollup: bounded error and merge == direct over all days") {
    import org.apache.spark.sql.functions._
    val est = graft.operators.Relational.sketchRollup(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = graft.sources.Tables.events(spark, sf)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = graft.sources.Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).first().getLong(0)
    // lgK=14 HLL: relative standard error ~0.81%; 4σ bound
    exact.foreach { case (day, n) =>
      assert(math.abs(est(day) - n) <= math.max(4, 0.033 * n),
        s"day $day: estimate ${est(day)} vs exact $n out of bound")
    }
    assert(math.abs(est("(all)") - exactAll) <= math.max(4, 0.033 * exactAll),
      s"merged estimate ${est("(all)")} vs exact $exactAll out of bound")
    // merging the per-day sketches must agree with sketching the whole
    // column directly — the property that makes the rollup reusable
    val direct = graft.sources.Tables.events(spark, sf)
      .select(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14)))
        .as("e")).first().getLong(0).toDouble
    assert(math.abs(est("(all)") - direct) <= math.max(2, 0.01 * direct),
      s"union-of-days ${est("(all)")} vs direct sketch $direct diverge")
  }

  test("partition cache defines empty-key AVG as 0 (reference crashes)") {
    val cacheDir = java.nio.file.Files.createTempDirectory("graft_ec_").toString
    val (avg, src) = PartitionCache.calcAvg(spark, sf, cacheDir, "ZZZ")
    assert(avg == 0L && src == "create")
    val (avg2, src2) = PartitionCache.calcAvg(spark, sf, cacheDir, "ZZZ")
    assert(avg2 == 0L && src2 == "reuse")
  }
}
