package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation primitives that are ORDER problems in disguise —
  * data selection under a token budget and deterministic global
  * shuffling — implemented with the distributed shapes that survive a
  * global sort being impossible to centralize at 100 TB:
  *
  *  - [[tokenBudgetSelect]] replaces the naive corpus-wide cumulative
  *    window with a score-histogram threshold (O(score-domain) driver
  *    relation) plus a two-phase rank inside the single boundary
  *    bucket, and is certified EQUAL to the naive window by the DuckDB
  *    oracle, which runs the naive form.
  *  - [[corpusShuffle]] derives a deterministic pseudo-random
  *    permutation from an exact LCG permutation of the doc key (no
  *    engine RNG, replays anywhere), and ranks within fine hash
  *    buckets so no window partition ever exceeds ~1/2^10 of a shard.
  *
  * All arithmetic is non-negative 64-bit integer (products bounded
  * < 2^63 by construction, trunc = floor), so both engines replay the
  * identical trajectory bit-for-bit.
  */
object Curation {

  private def toks: Column = split(col("text"), " ")

  /** doc relation with exact integer token count and quality score
    * (type-token ratio in permille — integer, bounded domain [0,1000],
    * which is what makes the histogram threshold O(1)). */
  private def scored(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .withColumn("score", expr("(n_distinct * 1000) div n_tokens"))

  /** Select the best-scoring documents whose cumulative token count
    * fits a 40%-of-corpus token budget, ordering by (score DESC,
    * doc_id) — the data-selection step of every budgeted pre-training
    * run. Emits per-source kept/dropped counts + kept tokens.
    *
    * Naive semantics (what the oracle runs): cumulative token sum over
    * the corpus-wide (score DESC, doc_id) order, keep while cum ≤
    * budget — a single-partition window over the corpus. The
    * distributed plan here never materializes that order:
    *   1. histogram per score value (one map-side-combined groupBy,
    *      ≤ 1001 rows), cumulative over the histogram;
    *   2. buckets whose cum_end ≤ budget are kept WHOLE (a broadcast
    *      semi-join — no per-doc arithmetic at all);
    *   3. the one boundary bucket straddling the budget is ranked by a
    *      two-phase cumulative sum: chunk subtotals (doc_id div 1024)
    *      → cumulative over the O(chunks) relation → within-chunk
    *      window — so the widest window partition is 1024 docs even if
    *      every document in the corpus lands on the boundary score.
    * Since cum is strictly increasing (every doc has ≥ 1 token), the
    * kept set is exactly the naive prefix. */
  def tokenBudgetSelect(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = scored(spark, sfDir)
    val budget = docs.agg(
      expr("2 * sum(n_tokens) div 5").as("budget"))
    val hist = docs.groupBy("score")
      .agg(sum("n_tokens").as("b_tokens"))
      .crossJoin(broadcast(budget))
      .withColumn("cum_end",
        sum("b_tokens").over(Window.orderBy(col("score").desc)))
      .withColumn("cum_start", col("cum_end") - col("b_tokens"))
    val fullBuckets = hist.filter(col("cum_end") <= col("budget"))
      .select("score")
    val boundary = hist.filter(
      col("cum_start") < col("budget") && col("budget") < col("cum_end"))
      .select("score", "cum_start", "budget")
    val keptFull = docs.join(broadcast(fullBuckets), Seq("score"), "left_semi")
    // boundary bucket: chunked two-phase cumulative (see scaladoc)
    val bdocs = docs.join(broadcast(boundary), Seq("score"))
      .withColumn("chunk", expr("doc_id div 1024"))
    val chunkCum = bdocs.groupBy("chunk")
      .agg(sum("n_tokens").as("c_tokens"))
      .withColumn("c_before",
        sum("c_tokens").over(Window.orderBy("chunk")) - col("c_tokens"))
      .select("chunk", "c_before")
    val keptBoundary = bdocs.join(broadcast(chunkCum), Seq("chunk"))
      .withColumn("wcum", sum("n_tokens").over(
        Window.partitionBy("chunk").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_start") + col("c_before") + col("wcum")
        <= col("budget"))
      .select(keptFull.columns.map(col): _*)
    val kept = keptFull.unionByName(keptBoundary)
      .select(col("doc_id"), col("source"), col("n_tokens"))
    docs.select("doc_id", "source", "n_tokens")
      .join(kept.select(col("doc_id"), lit(1L).as("k")), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(sum(when(col("k").isNotNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("k").isNotNull, col("n_tokens")).otherwise(0L))
          .as("kept_tokens"))
      .orderBy("source")
  }

  /** The naive single-window DuckDB twin of [[tokenBudgetSelect]] —
    * proving the histogram-threshold plan computes the identical
    * prefix. */
  val tokenBudgetOracle: String =
    """WITH d AS (SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |      AS n_distinct
      |  FROM documents),
      |s AS (SELECT doc_id, source, n_tokens,
      |        (n_distinct * 1000) // n_tokens AS score FROM d),
      |b AS (SELECT (2 * CAST(SUM(n_tokens) AS BIGINT)) // 5 AS budget
      |      FROM s),
      |c AS (SELECT doc_id, source, n_tokens,
      |        CAST(SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          AS BIGINT) AS cum
      |      FROM s)
      |SELECT source,
      |  CAST(SUM(CASE WHEN cum <= (SELECT budget FROM b)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN cum <= (SELECT budget FROM b)
      |    THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
      |  CAST(SUM(CASE WHEN cum <= (SELECT budget FROM b)
      |    THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  /** Deterministic global corpus shuffle + shard assignment: the
    * training-order randomization step before sequence packing. The
    * permutation key is an exact LCG step `(doc_id·1664525 +
    * 1013904223) mod (2^31-1)` — injective for doc_id < 2^31-1 (the
    * multiplier is invertible mod the prime), engine-independent, and
    * reproducible from the seed constants alone. shard = key mod 8;
    * within a shard the training order is (key, doc_id).
    *
    * Positions are assigned per (shard, bucket = key div 2^21) — fine
    * hash buckets, ~2^10 ranges per 2^31 key space — so the ranking
    * window never holds more than ~1/1024 of a shard regardless of
    * corpus size; global order within a shard is (bucket, pos), which
    * the order-sensitive fingerprint encodes. Emits one audit row per
    * shard: count, key range, and the exact order fingerprint
    * Σ ((bucket·4096 + pos) mod 65521) · (doc_id mod 65521), which any
    * engine that reproduces the same permutation must match. */
  def corpusShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    val keyed = Tables.documents(spark, sfDir)
      .select(col("doc_id"))
      .withColumn("key",
        // reduced form ((id mod P)·a + c) mod P — identical to the raw
        // product for ids < 2^31, overflow-free for wider ones (the
        // raw product would escape 2^63 past id ≈ 5.5e12; snowflake-
        // style ids do)
        expr("((doc_id % 2147483647) * 1664525 + 1013904223) % 2147483647"))
      .withColumn("shard", col("key") % 8)
      .withColumn("bucket", expr("key div 2097152"))
    keyed
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard", "bucket").orderBy("key", "doc_id")))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        min("key").as("min_key"), max("key").as("max_key"),
        sum(((col("bucket") * 4096 + col("pos")) % 65521)
          * (col("doc_id") % 65521)).as("order_fp"))
      .orderBy("shard")
  }

  val corpusShuffleOracle: String =
    """WITH k AS (SELECT doc_id,
      |    ((doc_id % 2147483647) * 1664525 + 1013904223) % 2147483647
      |      AS key
      |  FROM documents),
      |p AS (SELECT doc_id, key, key % 8 AS shard, key // 2097152 AS bucket,
      |        ROW_NUMBER() OVER (PARTITION BY key % 8, key // 2097152
      |          ORDER BY key, doc_id) AS pos
      |      FROM k)
      |SELECT shard, COUNT(*) AS n_docs,
      |  MIN(key) AS min_key, MAX(key) AS max_key,
      |  CAST(SUM(((bucket * 4096 + pos) % 65521) * (doc_id % 65521))
      |    AS BIGINT) AS order_fp
      |FROM p GROUP BY shard ORDER BY shard""".stripMargin
}
