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
  private lazy val emptySf: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_").toString
    for (t <- Seq("documents", "embeddings"))
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    dir
  }

  /** Fixture dir with exactly one document / one vector. */
  private lazy val oneSf: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_one_").toString
    for (t <- Seq("documents", "embeddings"))
      spark.read.parquet(s"$sf/$t.parquet").limit(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    dir
  }

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

  test("partition cache defines empty-key AVG as 0 (reference crashes)") {
    val cacheDir = java.nio.file.Files.createTempDirectory("graft_ec_").toString
    val (avg, src) = PartitionCache.calcAvg(spark, sf, cacheDir, "ZZZ")
    assert(avg == 0L && src == "create")
    val (avg2, src2) = PartitionCache.calcAvg(spark, sf, cacheDir, "ZZZ")
    assert(avg2 == 0L && src2 == "reuse")
  }
}
