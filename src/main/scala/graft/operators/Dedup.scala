package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** X9: corpus deduplication — exact, MinHash+LSH, and SimHash
  * (SURVEY §2.4). The LLM-pipeline workhorse ops, designed so every hash
  * is arithmetic over data-derived ids (not engine-native string hashes),
  * which makes the whole pipeline replayable in the DuckDB oracle and
  * stable across engines/versions.
  *
  * Scale design: candidate generation is always an equi-join on a bucket
  * key (shared shingle, LSH band signature), never an O(n²) cross join of
  * the corpus; the only cross join in this file is SimHash pair scoring,
  * which operates on the tiny per-doc fingerprint relation and would be
  * band-bucketed the same way at 100 TB.
  */
object Dedup {
  private val P = 2147483647L // 2^31-1, Mersenne prime for linear hashes

  /** Exact dedup by full content: one shuffle on the text (in practice
    * on its hash — we also emit sha256 as the content key a 100 TB
    * pipeline would group by instead of the raw text).
    */
  def exactDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy("text")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"),
        sha2(col("text"), 256).as("content_hash"))
      .select("keep_id", "n_copies", "content_hash")
      .orderBy("keep_id")

  /** Distinct 3-token shingles per document (the MinHash input set). */
  def shingles(docs: DataFrame): DataFrame = {
    val t = TextAnalysis.tokens(docs)
    val w = Window.partitionBy("doc_id").orderBy("ord")
    t.withColumn("t2", lead("tok", 1).over(w))
      .withColumn("t3", lead("tok", 2).over(w))
      .filter(col("t3").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t2"), col("t3"))
        .as("shingle"))
      .distinct()
  }

  /** Shingle vocabulary ids (same construction as [[TextAnalysis.vocab]]). */
  private def shingleIds(docs: DataFrame): DataFrame = {
    val sh = shingles(docs)
    val v = sh.select("shingle").distinct()
      .withColumn("sid", row_number().over(Window.orderBy("shingle")).cast(LongType))
    sh.join(v, "shingle").select("doc_id", "sid")
  }

  /** MinHash + LSH near-dedup:
    * 16 linear min-hashes over shingle ids → 4 bands × 4 rows → band
    * signature keys → candidate pairs by band equi-join → exact Jaccard
    * verification of candidates only. Emits verified pairs with
    * jaccard ≥ 0.5 (the fixture's planted near-dups sit at ≥ 0.8 with a
    * clean gap below — see SURVEY §5 methodology).
    */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val ds = shingleIds(Tables.documents(spark, sfDir)).cache()

    // All 16 min-hashes in ONE aggregation pass via the sketch-style
    // custom aggregate (graft.plans.MinHashAgg): the shingle-id set
    // collapses map-side into a 16-long buffer per document — no 16×
    // row blow-up, no extra shuffle, 128 bytes per doc on the wire.
    graft.plans.MinHashAgg.register(spark)
    val mhWide = ds.groupBy("doc_id")
      .agg(expr(s"${graft.plans.MinHashAgg.name}(sid)").as("mh"))

    // Band signature: order-free weighted sum of the band's 4 min-hashes
    // (weights 31^k) — one BIGINT key per (doc, band), join-able without
    // any array/string aggregation.
    val weights = Seq(1L, 31L, 961L, 29791L)
    def bandKey(bd: Int) =
      (0 until 4).map(r =>
        element_at(col("mh"), bd * 4 + r + 1) * weights(r)).reduce(_ + _)
    val bands = mhWide.select(col("doc_id"), explode(array(
        (0 until 4).map(bd =>
          struct(lit(bd).as("band"), bandKey(bd).as("bandkey"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bandkey").as("bandkey"))

    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bandkey") === col("y.bandkey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    val sizes = ds.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(ds.as("da"), col("doc_a") === col("da.doc_id"))
      .join(ds.as("db"),
        col("doc_b") === col("db.doc_id") && col("da.sid") === col("db.sid"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))

    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast(DoubleType)
          / (col("sa.n") + col("sb.n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash fingerprints (32-bit) + near-dup pairs at Hamming ≤ 3.
    * Per-bit sign of the sum of ±1 votes from every token occurrence's
    * linear hash. Pair scoring is over the fingerprint relation only.
    */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val P2 = 4294967291L // prime < 2^32 → 32 usable bits
    val t = TextAnalysis.tokens(Tables.documents(spark, sfDir))
    val v = TextAnalysis.vocab(t)
    val hashed = t.join(v, "tok")
      .withColumn("g", (lit(982451653L) * col("token_id") + lit(12345L)) % P2)
    // All 32 bit-vote sums in ONE aggregation pass (map-side combined) —
    // no 32× row blow-up; the fingerprint assembles from the 32 sums in
    // a single projection.
    val voteCols = (0 until 32).map { b =>
      sum(when(expr(s"shiftright(g, $b) % 2") === 1, 1L).otherwise(-1L))
        .as(s"s$b")
    }
    val fingerprintExpr = (0 until 32).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    hashed.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"), fingerprintExpr.as("simhash"))
      .orderBy("doc_id")
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ 3 over the fingerprint
    * relation, via byte-banding: with the 32 bits split into 4 bytes, any
    * pair within hamming 3 must share at least one identical byte
    * (pigeonhole), so candidates come from an equi-join on
    * (byte-index, byte-value) — ~256× fewer scored pairs than the naive
    * cross join, and a keyed shuffle instead of an all-pairs broadcast.
    */
  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = simhash(spark, sfDir).cache()
    val banded = fp.select(col("doc_id"), explode(array((0 until 4).map(bd =>
        struct(lit(bd).as("bb"),
          expr(s"shiftright(simhash, ${8 * bd}) % 256").as("bv"))): _*))
        .as("s"))
      .select(col("doc_id"), col("s.bb").as("bb"), col("s.bv").as("bv"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.bb") === col("y.bb") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(fp.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a")), "doc_a")
      .join(fp.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(sim_a ^ sim_b) AS INT)").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** Near-dup clusters: connected components over the n-gram-Jaccard
    * pair graph, labeled by the component's minimum doc_id — the step
    * that turns pairwise near-dup hits into "keep one per cluster"
    * corpus dedup. Iterative min-label propagation (the small-star
    * backbone of large-scale CC): each round is one keyed join +
    * aggregate; component diameters of near-dup graphs are tiny, so it
    * converges in a few rounds. Oracle: recursive-CTE transitive
    * closure in DuckDB.
    */
  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = ngramJaccard(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).cache()
    val sym = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cache()
    var labels = sym.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id")).cache()
    // Labels only ever decrease, so the label-sum is a monotone
    // potential: fixpoint ⇔ sum unchanged (one cheap aggregate per
    // round instead of a join-based diff).
    def labelSum(df: DataFrame): Long =
      df.agg(sum("label")).head().getLong(0)
    var prevSum = labelSum(labels)
    var iter = 0
    while (iter < 20) {
      val neighborMin = sym
        .join(labels.select(col("doc_id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("doc_id")).agg(min("label").as("nmin"))
      val updated = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .cache()
      val s = labelSum(updated)
      labels.unpersist()
      labels = updated
      iter += 1
      if (s == prevSum) iter = 20 else prevSum = s
    }
    labels.select(col("doc_id"), col("label").as("cluster_id"))
      .orderBy("doc_id")
  }

  /** N-gram (bigram) Jaccard similarity via inverted-index candidate
    * generation: docs sharing at least one bigram are joined through the
    * bigram (an equi-join — the classic scalable near-dup plan), then
    * exact Jaccard is computed and thresholded.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val t = TextAnalysis.tokens(Tables.documents(spark, sfDir))
    val w = Window.partitionBy("doc_id").orderBy("ord")
    val grams = t.withColumn("t2", lead("tok", 1).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t2")).as("gram"))
      .distinct().cache()
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = grams.as("x").join(grams.as("y"),
        col("x.gram") === col("y.gram") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast(DoubleType)
          / (col("sa.n") + col("sb.n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.6)
      .orderBy("doc_a", "doc_b")
  }
}
