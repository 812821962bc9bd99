package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** X11: text-analysis operators over the `documents` corpus — the
  * token-level building blocks an LLM-data pipeline runs before training
  * (SURVEY §2.4). All heuristics are deliberately expressible in portable
  * SQL so the DuckDB oracle can replay them exactly (no engine-specific
  * string hashing anywhere).
  */
object TextAnalysis {

  /** Whitespace tokenization with 1-based position. Explode keeps the
    * work distributed; nothing ever collects a document on the driver.
    */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("ord0", "tok")))
      .select(col("doc_id"), (col("ord0") + 1).cast(LongType).as("ord"),
        col("tok"))

  /** Per-entity ordered reassembly: the aggregated `value`s space-joined
    * in `key` order. Bounded by the entity's own row count (document /
    * word length) — the shared idiom behind every byte-exact
    * certification hash ([[graft.operators.Dedup.spanScrub]],
    * [[bpeEncode]]); keep the three sites on THIS helper so the
    * ordering/null semantics can never silently diverge. */
  private[operators] def orderedConcat(key: Column, value: Column): Column =
    concat_ws(" ", transform(
      sort_array(collect_list(struct(key.as("k"), value.as("v")))),
      s => s.getField("v")))

  private val P = 2147483647L // 2^31-1, Mersenne prime

  /** Token/shingle id as a data-derived polynomial hash over character
    * codes: `h = fold(codes, (acc, c) => (acc*31 + c) mod (2^31-1))`.
    *
    * This replaces the round-1 dense-vocabulary construction
    * (`row_number` over a GLOBAL window — a single-partition sort of
    * every distinct token/shingle, the classic 100 TB bottleneck: shingle
    * cardinality grows near-linearly with corpus size). The hash needs no
    * vocabulary relation at all — no distinct, no window, no join-back;
    * it is a pure per-row projection that scales embarrassingly and stays
    * engine-portable (DuckDB replays it with `list_reduce` over
    * `ascii()` codes — engine-native string hashes never match across
    * engines, arithmetic over character codes always does).
    *
    * Id collisions are possible (31-bit space) but harmless for the
    * downstream set/sketch ops, and the oracle reproduces them exactly.
    *
    * Routed through the native codegen'd [[graft.plans.PolyHash]]
    * expression (the composed HOF form is ~2× slower on the corpus-wide
    * token/gram streams; equality pinned in PolyHashSpec).
    */
  def polyHash(s: Column): Column = {
    // Registration keys off the ACTIVE session: correct for every
    // driver-contract entry point (the session passed in is the active
    // one). A pipeline built against a non-active `newSession()` should
    // call `graft.plans.PolyHash.register(thatSession)` first — the
    // function registry is session-scoped.
    graft.plans.PolyHash.register(SparkSession.active)
    call_function(graft.plans.PolyHash.name, s)
  }

  /** Composed-builtins reference form of [[polyHash]] (HOF fold over
    * `ascii` codes) — kept as the executable spec the native expression
    * is pinned against; NULL on empty input where the native form
    * returns 0 (the tokenizer emits no empty strings). */
  def polyHashHof(s: Column): Column = {
    val codes = transform(split(s, ""), ch => ascii(ch).cast(LongType))
    aggregate(slice(codes, lit(2), size(codes) - 1), element_at(codes, 1),
      (acc, c) => (acc * 31L + c) % P)
  }

  private def markerCount(toks: Column, words: Seq[String]): Column =
    words.map(w => size(filter(toks, t => t === w))).reduce(_ + _)

  /** Language-ID by marker-token scoring with a deterministic CASE-chain
    * argmax (ties resolve in fixed priority order en>es>de>fr>zh).
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val markers = Seq(
      "en" -> Seq("the", "a"), "es" -> Seq("data", "table"),
      "de" -> Seq("window", "row"), "fr" -> Seq("filter", "stream"),
      "zh" -> Seq("spark", "query"))
    val scored = Tables.documents(spark, sfDir).select(
      col("doc_id") +: col("lang").as("actual_lang") +:
        markers.map { case (l, ws) => markerCount(toks, ws).as(s"score_$l") }: _*)
    val Seq(en, es, de, fr, zh) =
      Seq("en", "es", "de", "fr", "zh").map(l => col(s"score_$l"))
    scored.withColumn("predicted",
        when(en >= es && en >= de && en >= fr && en >= zh, "en")
          .when(es >= de && es >= fr && es >= zh, "es")
          .when(de >= fr && de >= zh, "de")
          .when(fr >= zh, "fr")
          .otherwise("zh"))
      .orderBy("doc_id")
  }

  /** Quality scoring: token count, type-token ratio, mean token length,
    * stopword ratio, and a keep/drop flag — the standard pre-training
    * corpus filters, all in exact integer/rational arithmetic.
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"),
        length(col("text")).as("len_chars"),
        markerCount(toks, Seq("the", "a")).as("n_stop"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("len_chars"),
        (col("n_distinct") / col("n_tokens")).as("ttr"),
        ((col("len_chars") - (col("n_tokens") - 1)) / col("n_tokens"))
          .as("avg_tok_len"),
        (col("n_stop") / col("n_tokens")).as("stop_ratio"),
        when(col("n_tokens") >= 20 && col("n_distinct") / col("n_tokens") >= 0.25, 1)
          .otherwise(0).as("keep"))
      .orderBy("doc_id")
  }

  /** Per-document token statistics incl. a BPE-ish size estimate
    * (chars/4 is the classic tokens-per-byte rule of thumb).
    */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"),
        length(col("text")).as("n_chars"),
        ceil(length(col("text")) / 4.0).cast(LongType).as("est_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Train/valid/test corpus split by a deterministic linear hash of the
    * document key (80/10/10) — the reproducible-split primitive every
    * training pipeline needs: stable under reruns, engine-independent
    * (no RNG, no engine-native hash), and shardable (the split column
    * can drive a partitioned write). Emits per-split counts + exact
    * content totals as the auditable summary.
    */
  /** The shared membership/ordering hash `(key · a) mod P`, computed
    * `((key mod P) · a) mod P`: identical to the raw form for every
    * key < 2^31 (all fixtures — the oracles keep the unreduced
    * expression, and DuckDB's overflow-checked BIGINT would error
    * rather than wrap anyway), and overflow-safe for full 64-bit ids
    * at corpus scale — `(key mod P) < 2^31` and `a < 2^32` keep the
    * product under 2^63, where the raw `key · a` wraps negative past
    * key ≈ 3.47e9 and would silently pass every `< threshold` test. */
  private[operators] def keyHash(key: Column,
                                 a: Long = 2654435761L): Column =
    ((key % lit(P)) * lit(a)) % lit(P)

  /** The split-assignment hash shared by [[trainTestSplit]] and
    * `Dedup.contamination` (ONE definition — the contamination audit
    * must agree with the split it audits) and mirrored in the DuckDB
    * oracles. */
  def splitOf(key: Column): Column = {
    val bucket = keyHash(key) % 10
    when(bucket < 8, "train").when(bucket === 8, "valid").otherwise("test")
  }

  def trainTestSplit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("split", splitOf(col("doc_id")))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy("split")

  /** Corpus text cleaning — the canonicalization pass that runs before
    * dedup/tokenization in a training pipeline: lowercase, strip
    * non-alphanumerics, collapse runs of whitespace, trim. Pure
    * columnar regexp projection (no UDF, no shuffle); emits the cleaned
    * text's audit columns (length, token count, content hash) so the
    * transform is verifiable without dumping full text.
    */
  def cleanText(spark: SparkSession, sfDir: String): DataFrame = {
    val cleaned = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), cleaned.as("clean"))
      .select(col("doc_id"),
        length(col("clean")).as("clean_len"),
        size(split(col("clean"), " ")).as("n_clean_tokens"),
        sha2(col("clean"), 256).as("clean_hash"))
      .orderBy("doc_id")
  }

  /** Stratified deterministic sampling — the training-mix rebalancing
    * primitive: per-class keep-rates (here: downsample the dominant
    * `en` class to 25%, keep 50% of the rest) applied via a linear hash
    * of the document key, so the sample is reproducible across runs,
    * engines, and cluster sizes (no RNG, no `TABLESAMPLE`), and any
    * shard can be sampled independently (pure per-row predicate — no
    * shuffle added to the pipeline). Emits per-class audit totals.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val rates = Seq("en" -> 250, "de" -> 500, "es" -> 500,
      "fr" -> 500, "zh" -> 500) // keep-rate in per-mille
    val rate = rates.tail.foldLeft(
      when(col("lang") === rates.head._1, rates.head._2)) {
      case (acc, (l, r)) => acc.when(col("lang") === l, r)
    }.otherwise(0)
    Tables.documents(spark, sfDir)
      .withColumn("h", keyHash(col("doc_id")) % 1000)
      .withColumn("kept", (col("h") < rate).cast("int"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        sum(col("kept")).as("n_kept"),
        sum(col("kept") * col("n_chars")).as("kept_chars"),
        min(when(col("kept") === 1, col("doc_id"))).as("first_kept"))
      .orderBy("lang")
  }

  /** TF-IDF term ranking per document — the classic relevance/keyword
    * primitive, in exact arithmetic: the idf is the exact rational
    * `n_docs / df` (no logarithm — libm ulp differences are what break
    * cross-engine determinism), so `score = tf · n_docs / df` with ONE
    * IEEE division as the last step. Top-3 terms per document with a
    * deterministic tiebreak. The per-doc window is partitioned by
    * doc_id (bounded), the df aggregate is one keyed shuffle, and the
    * corpus size joins in as a broadcast scalar — no global stage.
    */
  def tfidfTop(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val t = tokens(docs)
    val tf = t.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "tok").crossJoin(broadcast(nDocs))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast(DoubleType) / col("df"))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("tok"))
    scored.withColumn("rnk", row_number().over(w).cast(IntegerType))
      .filter(col("rnk") <= k)
      .select("doc_id", "rnk", "tok", "tf", "df", "score")
      .orderBy("doc_id", "rnk")
  }

  /** BM25 relevance ranking — the inverted-index scoring primitive a
    * retrieval/contamination pipeline runs per query term, with the
    * Okapi parameters k1 = 1.2, b = 0.75 multiplied out into ONE exact
    * integer numerator and denominator:
    *
    * {{{
    *   tf-part = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))   avgdl = T/N
    *   idf-core = (N − df + ½) / (df + ½)        (the log's argument)
    *   score = 44·tf·T·(2N − 2df + 1)
    *           ────────────────────────────────────
    *           (20·tf·T + 6·T + 18·dl·N) · (2df + 1)
    * }}}
    *
    * Both sides are BIGINT-exact (the ×20 and ×2 clear the 1.2/0.75/½
    * fractions), so the only IEEE operation is the final division —
    * engine-exact the same way [[tfidfTop]]'s rational idf is. Within
    * one term df (hence idf) is constant across documents, so the
    * per-term document ranking certified here — descending tf-part
    * scaled by the positive core — is identical to BM25 under the
    * standard positive idf `ln(1 + idf-core)` (the Lucene/ATIRE form)
    * for every df, and to the raw Robertson `ln(idf-core)` whenever
    * df ≤ N/2 (beyond that the Robertson log is negative and reverses
    * its own per-term order — the pathology the +1 form exists to
    * remove). The emitted score is the rational core, log deferred. At 100 TB the corpus constants T and N would saturate
    * the int product — there they join as the double constants they
    * are (per-corpus scalars known before planning); tf/df/dl stay
    * integer. Plan shape: tf and dl are one keyed shuffle each over
    * the token stream, df one over the tf table, the corpus totals a
    * broadcast scalar, and the final top-k is a window partitioned by
    * term — the inverted-index shard key, bounded per posting list.
    */
  def bm25Top(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val t = tokens(docs)
    val tf = t.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dl = t.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val totals = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(t.agg(count(lit(1)).as("t_total")))
    val num = lit(44L) * col("tf") * col("t_total") *
      (lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L))
    val den = (lit(20L) * col("tf") * col("t_total") +
      lit(6L) * col("t_total") + lit(18L) * col("dl") * col("n_docs")) *
      (lit(2L) * col("df") + lit(1L))
    val scored = tf.join(dl, "doc_id").join(df, "tok")
      .crossJoin(broadcast(totals))
      .withColumn("score", num.cast(DoubleType) / den.cast(DoubleType))
    val w = Window.partitionBy("tok").orderBy(desc("score"), asc("doc_id"))
    scored.withColumn("rnk", row_number().over(w).cast(IntegerType))
      .filter(col("rnk") <= k)
      .select("tok", "rnk", "doc_id", "tf", "dl", "df", "score")
      .orderBy("tok", "rnk")
  }

  /** Fixed-size token chunking with overlap — the document→training-
    * sequence transform every LLM pipeline runs (context-window-sized
    * chunks, strided so boundaries overlap). Pure columnar: the token
    * array materializes once per document, chunk starts come from
    * `sequence`, and each chunk's content hash is computed inline — no
    * shuffle, no explode-then-window, embarrassingly parallel at any
    * corpus size. Emits audit rows (doc, chunk ordinal, bounds, hash),
    * not the chunk text itself.
    */
  def chunkDocs(spark: SparkSession, sfDir: String,
                chunkLen: Int = 128, stride: Int = 96): DataFrame = {
    graft.plans.PolyHash.register(spark)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("arr"))
      .select(col("doc_id"), col("arr"), size(col("arr")).as("n"),
        posexplode(sequence(lit(1), size(col("arr")), lit(stride)))
          .as(Seq("idx0", "start")))
      .select(col("doc_id"),
        (col("idx0") + 1).cast(LongType).as("chunk_idx"),
        col("start").cast(LongType).as("start"),
        least(lit(chunkLen), col("n") - col("start") + 1).cast(LongType)
          .as("n_tokens"),
        polyHash(concat_ws(" ",
          slice(col("arr"), col("start"), lit(chunkLen)))).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** BPE-style regex-class tokenization counts — the closer-to-real
    * token accounting next to [[tokenStats]]'s whitespace + chars/4
    * estimate: character-class runs (letter runs, digit runs, single
    * non-alphanumerics — the GPT-2 pre-tokenizer shape, in the regex
    * subset Java and RE2 agree on) counted per document, with the
    * class breakdown. Pure per-row projection.
    */
  def regexTokens(spark: SparkSession, sfDir: String): DataFrame = {
    val Tok = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit(Tok), lit(0)))
          .as("n_regex_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0)))
          .as("n_alpha_runs"),
        size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
          .as("n_digit_runs"))
      .orderBy("doc_id")
  }

  /** Within-document repetition metrics (the Gopher-family quality
    * filter batch pipelines run before training): per document, total
    * and distinct bigram counts, the duplicated-bigram fraction, and the
    * most-repeated bigram's count. Machine-generated and boilerplate
    * text shows up as high dup_fraction / max_repeat. Shape at scale:
    * one explode + one keyed aggregate per (doc, gram) + one per doc —
    * all map-side-combinable, no corpus-wide relation anywhere.
    */
  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    // ONE bigram-construction definition corpus-wide: reuse Dedup's
    // shingle builder so gram semantics can never diverge between the
    // dedup pipelines and this filter (both mirror the same oracle CTE).
    val grams = Dedup.tokArr(Tables.documents(spark, sfDir))
      .filter(size(col("arr")) >= 2)
      .select(col("doc_id"),
        explode(Dedup.shingleArrOf(col("arr"), 2)).as("gram"))
    grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max("c").as("max_repeat"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct_bigrams"),
        ((col("n_bigrams") - col("n_distinct_bigrams")).cast(DoubleType)
          / col("n_bigrams")).as("dup_fraction"),
        col("max_repeat"))
      .orderBy("doc_id")
  }

  /** PII detection + redaction audit — the scrub every training corpus
    * goes through. The fixture corpus is synthetic and PII-free, so the
    * operator first PLANTS deterministic PII (key-derived, so both
    * engines plant identically), then detects with portable regexes
    * (Java and RE2 agree on this subset), redacts, and emits the audit:
    * per-doc match counts per category plus the redacted text's hash —
    * verifying the full plant→detect→redact→audit loop without dumping
    * text. Pure per-row projection: no shuffle, shardable at any scale.
    */
  def piiRedaction(spark: SparkSession, sfDir: String): DataFrame = {
    val EmailPat = "[a-z0-9]+@[a-z0-9.]+\\.[a-z]+"
    val PhonePat = "555-[0-9]{4}"
    val IpPat = "10\\.[0-9]+\\.[0-9]+\\.[0-9]+"
    val planted = concat(col("text"),
      when(col("doc_id") % 5 === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
        .when(col("doc_id") % 5 === 1,
          concat(lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .when(col("doc_id") % 5 === 2,
          concat(lit(" host 10.0."), (col("doc_id") % 256), lit(".7")))
        .otherwise(lit("")))
    val redacted = regexp_replace(regexp_replace(regexp_replace(
      col("pii_text"), EmailPat, "[EMAIL]"), PhonePat, "[PHONE]"),
      IpPat, "[IP]")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), planted.as("pii_text"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("pii_text"), lit(EmailPat), lit(0)))
          .as("n_emails"),
        size(regexp_extract_all(col("pii_text"), lit(PhonePat), lit(0)))
          .as("n_phones"),
        size(regexp_extract_all(col("pii_text"), lit(IpPat), lit(0)))
          .as("n_ips"),
        redacted.as("redacted"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        length(col("redacted")).as("redacted_len"),
        sha2(col("redacted"), 256).as("redacted_hash"))
      .orderBy("doc_id")
  }

  /** Position-sensitive document fingerprint: XOR-fold of a linear hash
    * of (token content hash, position). Two docs share a fingerprint iff
    * they are (with overwhelming probability) the same token sequence —
    * an order-aware complement to content-hash dedup. The token id is
    * [[polyHash]] computed inline: no vocabulary shuffle, the whole
    * pipeline is explode → project → one keyed aggregate.
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    graft.plans.PolyHash.register(spark)
    val t = tokens(Tables.documents(spark, sfDir))
    t.withColumn("token_id", polyHash(col("tok")))
      .withColumn("h",
        (lit(982451653L) * col("token_id") + lit(12345L)
          + lit(40503L) * col("ord")) % lit(2147483647L))
      .groupBy("doc_id")
      .agg(expr("bit_xor(h)").as("fingerprint"),
        count(lit(1)).as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Training-sequence packing accounting — assign every document to a
    * fixed-token-budget training sequence ("pack") and emit per-pack
    * audit rows. The batch-assembly step between corpus prep and the
    * training loader: docs are dealt into `shards` independent lanes by
    * a deterministic hash, shuffled WITHIN each lane by a second hash
    * (the training-order randomization), and a running token total
    * assigns pack boundaries: a doc belongs to the pack where its
    * cumulative count started, so packs can overflow the budget by at
    * most one document (greedy whole-doc packing — the loader truncates
    * or pads; nothing here splits a document).
    *
    * 100 TB shape: ONE shuffle (hash-partition by shard) + an
    * in-partition sort; the cumulative sum never crosses shard
    * boundaries, so there is no global coordination and `shards` scales
    * with the cluster (thousands in production — 4 here only so the
    * sf0.001 fixture still yields multi-doc packs). Pack ids are
    * (shard, local ordinal): globally unique without a global sequence.
    * The budget is a power of two so the boundary is an exact bit shift
    * on both engines. Production note: the linear-hash lane/order keys
    * assume bounded non-negative ids (like every split hash here —
    * content-hash ids get pre-folded into [0, 2^31)).
    */
  def seqPacking(spark: SparkSession, sfDir: String,
                 budgetBits: Int = 9, shards: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lane = keyHash(col("doc_id")) % shards
    val ord = keyHash(col("doc_id"), a = 1540483477L)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
        lane.as("shard"), ord.as("ord"))
    val w = Window.partitionBy("shard").orderBy(col("ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("pack_id", shiftright(col("cum_before"), budgetBits))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("pack_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .withColumn("fill", // exact: division by a power of two
        col("pack_tokens") / lit((1L << budgetBits).toDouble))
      .orderBy("shard", "pack_id")
  }

  /** Padding-efficiency audit (`x19b`): what fraction of a training
    * batch's token slots are PADDING under (a) arrival-order batching
    * vs (b) length-sorted batching — the FLOPs question behind every
    * batching strategy (a batch pads every sequence to its longest
    * member; sorting by length makes batches length-homogeneous).
    * Per strategy: batch count, real tokens, padded slots, and the
    * waste share as one division of exact integers. Sequences truncate
    * at `maxLen` (the context window), batches are `batchSize` docs.
    *
    * 100 TB shape: batching is per-SHARD (hash lane), exactly like a
    * distributed data loader — the rank windows partition by shard, so
    * no corpus-wide order is ever materialized; everything after the
    * one scan is per-shard windows + one O(batches) aggregate. */
  def paddingAudit(spark: SparkSession, sfDir: String,
                   maxLen: Int = 512, batchSize: Int = 8,
                   shards: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        least(size(split(col("text"), " ")).cast(LongType), lit(maxLen.toLong))
          .as("t"))
      .withColumn("shard", keyHash(col("doc_id")) % shards)
    def strategy(name: String, order: Seq[Column]) = {
      val w = Window.partitionBy("shard").orderBy(order: _*)
      docs
        .withColumn("rn", row_number().over(w))
        .withColumn("batch", expr(s"(rn - 1) div $batchSize"))
        .groupBy("shard", "batch")
        .agg(count(lit(1)).as("n_docs"), max("t").as("mx"),
          sum("t").as("real"))
        .agg(count(lit(1)).as("n_batches"),
          sum("real").as("real_tokens"),
          sum(col("n_docs") * col("mx")).as("padded_slots"))
        .select(lit(name).as("strategy"), col("n_batches"),
          col("real_tokens"), col("padded_slots"),
          ((col("padded_slots") - col("real_tokens")).cast(DoubleType)
            / col("padded_slots")).as("waste_share"))
    }
    strategy("arrival", Seq(col("doc_id")))
      .unionByName(strategy("length_sorted", Seq(col("t"), col("doc_id"))))
      .orderBy("strategy")
  }

  /** Per-source quota sampling — cap every source's contribution to the
    * training mix at `quota` documents, chosen by deterministic hash
    * rank (not arrival order, so the sample is stable under re-ingest
    * and unbiased w.r.t. position). The data-mixing primitive for
    * over-represented sources (one crawl dominating the corpus).
    *
    * 100 TB shape: the rank filter is `row_number() <= k` over
    * (source), which Spark's WindowGroupLimit rewrites into partial
    * per-partition top-k BEFORE the shuffle (plan-asserted in
    * PlanSpec) — a dominant source never materializes its full row set
    * on one reducer; each map task forwards at most k rows per source.
    */
  /** Vocabulary coverage curve — the tokenizer-prep question "how many
    * vocabulary entries cover p% of all token occurrences": token
    * counts ranked by (count desc, token asc), running coverage, and
    * for each requested percentile the smallest vocabulary prefix that
    * clears it. All integer arithmetic (`cum·100 ≥ pct·total` instead
    * of a float ratio), so the curve replays exactly.
    *
    * 100 TB shape: the corpus collapses to the VOCAB relation in one
    * map-side-combined count aggregate (the only corpus-sized
    * exchange); the ranking window and cumulative sum then run over
    * distinct tokens — orders of magnitude smaller than the corpus,
    * and the standard single-sort step of every real vocab build (BPE
    * training does the same global frequency sort). The percentile
    * probe is a broadcast of a literal handful of rows.
    */
  def vocabCoverage(spark: SparkSession, sfDir: String,
                    pcts: Seq[Int] = Seq(50, 90, 95, 99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val c = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
    val w = Window.orderBy(desc("n"), asc("tok"))
    val ranked = c
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .withColumn("cum", sum("n").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = c.agg(sum("n").as("total_tokens"))
    val probes = pcts.toDF("pct")
    ranked.crossJoin(broadcast(tot)).crossJoin(broadcast(probes))
      .filter(col("cum") * 100 >= col("pct") * col("total_tokens"))
      .groupBy("pct")
      .agg(min("rnk").as("vocab_size"),
        min_by(col("cum"), col("rnk")).as("covered_tokens"),
        min("total_tokens").as("total_tokens"))
      .orderBy("pct")
  }

  /** Temperature-weighted mixture sampling — the training-mix primitive
    * that sets per-source sampling rates by `w_s ∝ c_s^α` (α = 1/2
    * here, the multilingual-training upweighting of rare sources) and
    * materializes the mix with a deterministic per-row hash test. The
    * fixture's 20 uniform sources are folded into three skewed tiers
    * (web/books/code) so the temperature actually re-weights: a rare
    * tier's keep-RATE comes out higher than proportional sampling
    * would give it, a dominant tier's lower.
    *
    * Exactness: c^(1/2) is taken as ISQRT (floor of the IEEE sqrt of an
    * exact integer — identical in any IEEE engine), so the weight
    * normalizer Σ isqrt is an exact BIGINT sum and each tier's keep
    * threshold `min(P, T·isqrt·P div (Σisqrt·c))` is pure integer
    * arithmetic: no float accumulation anywhere, the oracle replays
    * bit-for-bit.
    *
    * 100 TB shape: per-tier counts are one map-side-combined aggregate;
    * the thresholds are a broadcast relation of one row per tier; and
    * membership is a shuffle-free per-row integer predicate — the mix
    * materializes in a single pass with no repartition of the corpus
    * (contrast [[sourceQuota]]'s top-k, which needs per-source ranking).
    */
  def mixtureSample(spark: SparkSession, sfDir: String,
                    target: Long = 200L): DataFrame = {
    val tier = {
      val sfx = substring(col("source"), 4, 10).cast(IntegerType)
      when(sfx < 14, "web").when(sfx < 18, "books").otherwise("code")
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tier.as("tier"))
    val counts = docs.groupBy("tier")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("isq",
        floor(sqrt(col("n_docs").cast(DoubleType))).cast(LongType))
    val tot = counts.agg(sum(col("isq")).as("tot_isq"))
    val thresholds = counts.crossJoin(broadcast(tot))
      .select(col("tier"),
        expr(s"least(CAST($P AS BIGINT), ($target * isq * $P) div (tot_isq * n_docs))")
          .as("threshold"))
    docs.join(broadcast(thresholds), "tier")
      .filter(keyHash(col("doc_id")) < col("threshold"))
      .select(col("tier"), col("doc_id"))
      .orderBy("tier", "doc_id")
  }

  /** Deterministic WEIGHTED (Poisson) sampling — include each document
    * with probability proportional to its weight (n_chars here; any
    * quality score in production), expected size one fifth of the
    * corpus — in ONE scan with no sort and no RNG. The inclusion test
    * is the exact integer cross-multiplication
    * `u·Σw < n*·w·P` (u = the membership hash in [0, P)), which is
    * `u/P < n*·w/Σw` with zero rounding — any engine replays the
    * identical sample. Docs with `n*·w ≥ Σw` (truncated π = 1) are
    * certainly kept and counted separately, the Horvitz-Thompson
    * bookkeeping a weighted estimator needs.
    *
    * 100 TB shape: the totals are one map-side-combined aggregate
    * broadcast back over the scan — a pure filter, embarrassingly
    * parallel, where the classic weighted-reservoir alternative
    * (exp-keyed top-k) costs a corpus-wide ordering and engine-bound
    * `log()` floats. Overflow headroom: u·Σw < 2^31·Σw needs Σw <
    * 2^32, and (n*·w)·P < 2^63 needs n*·max(w) < 2^32 — ENFORCED (not
    * just documented) by an `assert_true` riding the one-row totals
    * relation, because non-ANSI Spark would otherwise wrap the product
    * negative and silently drop every row while the DuckDB oracle
    * errors. At larger corpus mass pre-divide Σw and every w by a
    * common 2^k in BOTH engines' texts (the test is scale-invariant up
    * to the truncation); the guard is what tells you it's time. */
  def weightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("u", keyHash(col("doc_id"), a = 1103515245L))
    val lim = 4294967296L // 2^32
    val tot = docs.agg(sum("n_chars").as("s_w"),
        expr("count(1) div 5").as("n_star"),
        max("n_chars").as("max_w"))
      // assert_true yields NULL when the bound holds (row passes) and
      // raises with the measured values when it doesn't; expressed as a
      // filter so the optimizer can never prune it as an unused column
      // empty corpus: SUM/MAX are NULL and assert_true treats a NULL
      // condition as failure, so the bounds coalesce to 0 (vacuously in
      // headroom — the downstream filter keeps nothing anyway)
      .filter(coalesce(assert_true(
        coalesce(col("s_w"), lit(0L)) < lim &&
          coalesce(col("n_star") * col("max_w"), lit(0L)) < lim,
        concat(lit("weightedSample 64-bit headroom exceeded: s_w="),
          col("s_w"), lit(" n_star*max_w="),
          col("n_star") * col("max_w"),
          lit(" (right-shift weights by a common 2^k in operator AND oracle)"))),
        lit(true)))
      .select("s_w", "n_star")
    docs.crossJoin(broadcast(tot))
      .withColumn("kept",
        col("u") * col("s_w") < col("n_star") * col("n_chars") * lit(P))
      .withColumn("certain", col("n_star") * col("n_chars") >= col("s_w"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_chars")).otherwise(0L))
          .as("kept_chars"),
        sum(when(col("certain"), 1L).otherwise(0L)).as("n_certain"))
      .orderBy("source")
  }

  /** Corpus-trained bigram-LM fluency scoring — the CCNet-style
    * perplexity filter every LLM-data pipeline runs before training,
    * re-expressed without transcendental functions so the oracle can
    * replay it bit-for-bit (the BM25 discipline: sum exact integers,
    * divide once, defer the log).
    *
    * Model: add-one (Laplace) bigram LM trained on the corpus itself,
    * `P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V)`. Instead of the mean log of
    * those probabilities (perplexity — a transcendental per engine),
    * each document is scored by the ratio-of-sums surprisal
    *
    * {{{ surprisal = Σ (c(w1)+V)  /  Σ (c(w1w2)+1) }}}
    *
    * over its bigrams — both sides exact BIGINT sums, ONE IEEE division
    * per document. The ratio orders documents the same way the mean
    * inverse conditional probability does (high = rare transitions =
    * disfluent/novel text), which is exactly what the CCNet head/
    * middle/tail split consumes. Buckets are decided by the integer
    * comparisons `Σden < 30·Σnum` / `< 31·Σnum` — fixed cutoffs the way
    * CCNet's per-language perplexity cutoffs are fixed pipeline
    * constants, chosen here where the fixture's distribution (ratio
    * 26–35, median ~30 at every SF — the closed 31-token vocabulary
    * pins V) splits into three non-degenerate bands. `n_hapax` (bigrams
    * seen exactly once in the corpus) rides along as the exact novelty
    * count.
    *
    * 100 TB shape: bigram extraction is a pure per-row projection
    * (token-hash array zipped with its own tail — no self-join, no
    * window); the model is two map-side-combined counting aggregates
    * (unigram and packed-bigram ids, both BIGINT keys); V is a
    * one-row broadcast; scoring joins each doc-bigram to the two count
    * relations by integer key — all keyed equi-joins that shard by
    * hash, never corpus×corpus — and the per-doc score is one more
    * keyed aggregate. Nothing funnels through a single task.
    */
  def lmScore(spark: SparkSession, sfDir: String): DataFrame = {
    graft.plans.PolyHash.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val harr = docs.select(col("doc_id"),
      transform(split(col("text"), " "), t => polyHash(t)).as("hs"))
    val occ = harr.select(explode(col("hs")).as("h"))
    val uni = occ.groupBy("h").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    // Packed bigram id: h1·2^31 + h2 (each hash < 2^31-1) — one BIGINT
    // join key, no string concat on the wire.
    val bi = harr.filter(size(col("hs")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("hs"), lit(1), size(col("hs")) - 1),
        slice(col("hs"), lit(2), size(col("hs")) - 1),
        (a, b) => struct(a.as("h1"),
          (a * lit(2147483648L) + b).as("bid")))).as("bg"))
      .select(col("doc_id"), col("bg.h1").as("h1"), col("bg.bid").as("bid"))
    val c12 = bi.groupBy("bid").agg(count(lit(1)).as("c12"))
    val scored = bi.join(c12, "bid")
      .join(uni.withColumnRenamed("h", "h1"), "h1")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c12") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("c1") + col("v")).as("sden"),
        sum(col("c12") + lit(1L)).as("snum"))
    scored.select(col("doc_id"), col("n_bigrams"), col("n_hapax"),
        (col("sden").cast(DoubleType) / col("snum").cast(DoubleType))
          .as("surprisal"),
        when(col("sden") < col("snum") * 30, "head")
          .when(col("sden") < col("snum") * 31, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy("doc_id")
  }

  /** BPE merge-rule learning — the tokenizer-TRAINING primitive
    * ([[vocabCoverage]] sizes a word vocabulary; this LEARNS the
    * subword merges an actual BPE tokenizer ships with). Classic
    * Sennrich-style character BPE: start from single characters, and
    * each round (a) count adjacent symbol pairs weighted by word
    * frequency, (b) pick the most frequent pair (ties broken by the
    * pair's symbols ascending — the deterministic total order the
    * oracle replays), (c) merge every non-overlapping occurrence
    * greedily left-to-right. Emits the learned merge table
    * `(merge_rank, left_sym, right_sym, pair_freq)` — the artifact a
    * tokenizer consumes.
    *
    * 100 TB shape: the ONLY corpus-scale stage is the word-frequency
    * aggregate (one map-side-combined shuffle — the same relation every
    * real BPE trainer starts from, since merge decisions depend on the
    * corpus only through word counts). All `rounds` iterations run on
    * the distinct-WORD relation: symbol rows shard by word, each round
    * is per-word windows (bounded by word length) plus one tiny pair
    * aggregate, and the chosen pair is a one-row broadcast — nothing
    * corpus-sized ever re-enters the loop, and nothing ever funnels
    * through the driver. Greedy non-overlap is resolved relationally
    * in ONE running window: a position's offset inside its run of
    * consecutive matches is `pos − last non-match pos`, and exactly
    * the odd offsets merge (for a run like `aaaa` with pair (a,a),
    * positions 1 and 3 merge — exact greedy semantics) — no
    * island-id self-join, just window arithmetic. Lineage is cut per
    * round (the k-means/CC loop discipline).
    */
  def bpeMerges(spark: SparkSession, sfDir: String,
                rounds: Int = 6): DataFrame =
    bpeTrained(spark, sfDir, rounds)._1.orderBy("merge_rank")

  /** One training run shared by [[bpeMerges]] (the merge table) and
    * [[bpeEncode]] (the final word→symbol state — which IS the encoded
    * form of every distinct word, since each round applies its merge to
    * the whole word relation). Memoized per (dir, rounds) so the
    * certification query and the encoder never train twice. */
  private def bpeTrained(spark: SparkSession, sfDir: String,
                         rounds: Int): (DataFrame, DataFrame) = {
    // rounds < 1 would leave `merges` empty and make the final
    // `merges.reduce(_ union _)` throw — reject it up front.
    require(rounds >= 1, s"bpe rounds must be >= 1, got $rounds")
    graft.util.SessionMemo.memoizedValue(
      spark, s"bpeTrained|$sfDir|$rounds") {
    // corpus-build width (r14): the merge loop is `rounds` fixed-shape
    // window+aggregate stages over the VOCAB-sized symbol state — at
    // session width every tiny round pays a core-count of task overhead
    // (see Layout.corpusBuildWidth); at deployment scale the cap wins.
    Layout.withShuffleWidth(spark, Layout.corpusBuildWidth(spark, sfDir)) {
    import org.apache.spark.sql.expressions.Window
    // Empty tokens (split() keeps them for doubled/trailing spaces) are
    // excluded from the word relation: BPE over a zero-char word is
    // meaningless, and the engines disagree on its explosion — Spark's
    // sequence(1, 0) is the DESCENDING [1,0] (two phantom '' symbol
    // rows) while DuckDB's range(1, 1) is empty. With the filter both
    // sides agree an empty token contributes nothing (and the encode
    // join drops it from the sequence on both engines identically).
    val words = tokens(Tables.documents(spark, sfDir))
      .filter(col("tok") =!= "")
      .groupBy(col("tok").as("word")).agg(count(lit(1)).as("freq"))
    val wWin = Window.partitionBy("word").orderBy("pos")
    var cur = words
      .select(col("word"), col("freq"),
        posexplode(transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))).as(Seq("pos0", "sym")))
      .select(col("word"), col("freq"),
        (col("pos0") + 1).cast(LongType).as("pos"), col("sym"))
      .localCheckpoint()
    val merges = collection.mutable.Buffer.empty[DataFrame]
    var r = 1
    while (r <= rounds) {
      val pr = cur.withColumn("nxt", lead("sym", 1).over(wWin))
      val best = pr.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("l"), col("nxt").as("r"))
        .agg(sum("freq").as("pf"))
        .orderBy(desc("pf"), asc("l"), asc("r")).limit(1)
        .localCheckpoint() // one-row relation: reused by the merge table
                           // AND the rebuild below; never collect()ed
      merges += best.select(lit(r).as("merge_rank"), col("l").as("left_sym"),
        col("r").as("right_sym"), col("pf").as("pair_freq"))
      // Greedy merge realization, all in running windows over the
      // dense positions: a match merges iff its OFFSET inside the run
      // of consecutive matches (pos − last non-match pos, 0 when the
      // run opens the word) is odd; a row is consumed iff its
      // predecessor merged.
      // LEFT join (not cross): an EXHAUSTED round (no pairs left →
      // empty best) must leave the symbol state intact — a cross join
      // against the empty one-row relation would collapse the state to
      // zero rows, which the merge table survives but [[bpeEncode]]'s
      // final-state read would not. coalesce pins mt to false both for
      // the exhausted round and for each word's last symbol (nxt null).
      val m = pr.join(
        broadcast(best.select(col("l").as("bl"), col("r").as("br"))),
        lit(true), "left")
        .withColumn("mt", coalesce(
          col("sym") === col("bl") && col("nxt") === col("br"), lit(false)))
      val runWin = wWin.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      cur = m
        .withColumn("s1", col("mt") &&
          ((col("pos") - coalesce(
            max(when(!col("mt"), col("pos"))).over(runWin), lit(0L)))
            % 2 === 1))
        .withColumn("consumed", lag(col("s1"), 1, false).over(wWin))
        .filter(!col("consumed"))
        .select(col("word"), col("freq"),
          row_number().over(wWin).cast(LongType).as("pos"),
          when(col("s1"), concat(col("sym"), col("nxt")))
            .otherwise(col("sym")).as("sym"))
        .localCheckpoint()
      r += 1
    }
    (merges.reduce(_ union _), cur)
  }}}

  /** BPE ENCODING — the application half of the tokenizer story
    * ([[bpeMerges]] learns the rules; this runs them over the corpus,
    * which at production scale is the single biggest job a training
    * pipeline executes). Each distinct WORD is encoded exactly once —
    * the learned loop's final symbol state already is the per-word
    * subword sequence — and documents pick their words up by equi-join.
    * Emits one row per document: word/subword counts, fertility
    * (subwords per word — THE tokenizer-quality number), and the
    * sha256 of the full encoded sequence in token order, which pins the
    * byte-exact encoding in the oracle without shipping the encoded
    * corpus through the result set (the [[graft.operators.Dedup
    * .spanScrub]] certification trick).
    *
    * 100 TB shape: tokenize-and-count touches the corpus twice (the
    * training word-frequency aggregate, then this keyed join) — never
    * per merge round; the encode state is VOCAB-sized and joins by
    * token hash (sharded equi-join; broadcastable when the vocab fits,
    * but nothing requires it); per-doc reassembly is one aggregate
    * whose collect_list is bounded by document length, the same
    * per-entity bound every per-doc array op here relies on.
    */
  def bpeEncode(spark: SparkSession, sfDir: String,
                rounds: Int = 6): DataFrame = {
    val state = bpeTrained(spark, sfDir, rounds)._2
    val enc = state.groupBy("word").agg(
      count(lit(1)).as("n_subwords"),
      orderedConcat(col("pos"), col("sym")).as("subtoks"))
    tokens(Tables.documents(spark, sfDir))
      .join(enc, col("tok") === col("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_subwords").as("n_subwords"),
        sha2(orderedConcat(col("ord"), col("subtoks")), 256)
          .as("encoded_hash"))
      .withColumn("fertility",
        col("n_subwords").cast(DoubleType) / col("n_words"))
      .select("doc_id", "n_words", "n_subwords", "fertility",
        "encoded_hash")
      .orderBy("doc_id")
  }

  /** Exact heavy hitters by the two-pass sketch-then-verify pattern:
    * pass 1 runs the [[graft.functions.MisraGries]] frequent-items
    * sketch (counter maps bounded at < 2×capacity per partition with
    * amortized-O(1) batched decrements, merged map-side) plus the
    * exact token total in the same scan; pass 2 re-counts ONLY the
    * candidate tokens (a broadcast semi-join — the candidate relation
    * is ≤capacity rows by construction: `finish` compresses any
    * buffer the batched reduce left above capacity) and keeps
    * those above the φ = 1/`phiDen` frequency threshold with their
    * EXACT counts.
    *
    * Correctness: MG with capacity c guarantees every token of true
    * frequency > N/(c+1) survives in the candidate set under any merge
    * order; with c+1 > `phiDen` the candidates are a guaranteed
    * SUPERSET of the answer, and the exact re-count + threshold makes
    * the final result deterministic and partitioning-invariant — which
    * is what lets a closed-form SQL oracle certify a sketch query at
    * all. 100 TB shape: two corpus scans, no vocabulary-sized shuffle
    * anywhere (contrast [[vocabCoverage]], which deliberately pays the
    * vocab sort because its answer needs the full distribution).
    */
  def heavyHitters(spark: SparkSession, sfDir: String,
                   phiDen: Long = 30L, capacity: Int = 48): DataFrame = {
    require(capacity + 1 > phiDen,
      "MG capacity must exceed phiDen-1 for the superset guarantee")
    val t = tokens(Tables.documents(spark, sfDir)).select("tok")
    val mgSketch = udaf(new graft.functions.MisraGries(capacity))
    val pass1 = t.agg(mgSketch(col("tok")).as("cand"),
      count(lit(1)).as("total"))
    val cands = pass1.select(explode(col("cand")).as("tok"), col("total"))
    t.join(broadcast(cands), "tok")
      .groupBy("tok", "total").agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * phiDen > col("total"))
      .select(col("tok").as("token"), col("n_occurrences"),
        (col("n_occurrences").cast(DoubleType) / col("total")).as("share"))
      .orderBy(desc("n_occurrences"), asc("token"))
  }

  /** End-to-end corpus-build funnel — the composed pipeline a training
    * run actually executes, as ONE query: raw → language filter →
    * quality filter → exact dedup → near-dedup (cluster survivor) →
    * train split, emitting per-stage document and token counts (the
    * yield report every corpus release ships with). The point is
    * COMPOSITION: each stage is the already-certified operator's
    * predicate applied to the previous stage's survivors, so the
    * funnel proves the library's pieces snap together without glue.
    *
    * Stage semantics on survivors (not the raw corpus): exact dedup
    * keeps the minimum surviving doc_id per identical text; near-dedup
    * keeps the minimum SURVIVING member per near-dup cluster (the
    * cluster relation is the memoized [[Dedup.dedupClusters]] output —
    * tiny, so the join broadcasts), so a cluster whose canonical was
    * already dropped by quality still keeps one representative.
    *
    * 100 TB shape: one corpus scan computes every per-doc predicate;
    * the only corpus-wide exchanges are the exact-dedup window (the
    * same one shuffle-by-content [[Dedup.exactDedup]] pays) and the
    * final tiny stage aggregate; the cluster relation joins as a
    * broadcast. Stages multiply the scan by 6 row-copies of ONE long
    * column, not of the text.
    */
  /** The per-document stage-survival flags shared by [[corpusFunnel]]
    * (cumulative yields) and [[funnelAttribution]] (first-failing-stage
    * histogram): s2 lang → s3 quality → s4 exact dedup → s5 near-dup
    * survivor → s6 train split, each conjoined with its predecessor. */
  private def funnelFlags(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksArr = split(col("text"), " ")
    def score(ws: Seq[String]) = markerCount(toksArr, ws)
    val feat = Tables.documents(spark, sfDir).select(
      col("doc_id"), col("source"), col("text"),
      size(toksArr).cast(LongType).as("n_tokens"),
      size(array_distinct(toksArr)).as("n_distinct"),
      score(Seq("the", "a")).as("en"), score(Seq("data", "table")).as("es"),
      score(Seq("window", "row")).as("de"),
      score(Seq("filter", "stream")).as("fr"),
      score(Seq("spark", "query")).as("zh"))
    val flag3 = feat
      .withColumn("s2", col("en") >= col("es") && col("en") >= col("de")
        && col("en") >= col("fr") && col("en") >= col("zh"))
      .withColumn("s3", col("s2") && col("n_tokens") >= 20
        && col("n_distinct") / col("n_tokens") >= 0.25)
    val flag4 = flag3.withColumn("s4",
      col("s3") && col("doc_id") ===
        min(when(col("s3"), col("doc_id"))).over(Window.partitionBy("text")))
    val clus = Dedup.dedupClusters(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"))
    // The survivor window partitions by coalesce(cluster_id, doc_id),
    // NOT cluster_id: unclustered docs (NULL cluster — most of the
    // corpus) would otherwise share ONE window partition and funnel
    // the whole corpus through a single task at scale. With the
    // coalesce key each unclustered doc is its own singleton partition
    // (its min-surviving member is itself, so the predicate reduces to
    // s4 — same result, sharded plan).
    flag4.join(broadcast(clus), Seq("doc_id"), "left")
      .withColumn("s5", col("s4") && (col("cluster_id").isNull ||
        col("doc_id") === min(when(col("s4"), col("doc_id")))
          .over(Window.partitionBy(
            coalesce(col("cluster_id"), col("doc_id"))))))
      .withColumn("s6", col("s5") && splitOf(col("doc_id")) === "train")
  }

  def corpusFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val flag6 = funnelFlags(spark, sfDir)
    flag6.select(col("n_tokens"), explode(array(
        struct(lit(1).as("o"), lit("raw").as("st"), lit(true).as("kept")),
        struct(lit(2).as("o"), lit("lang_en").as("st"), col("s2").as("kept")),
        struct(lit(3).as("o"), lit("quality").as("st"), col("s3").as("kept")),
        struct(lit(4).as("o"), lit("exact_dedup").as("st"),
          col("s4").as("kept")),
        struct(lit(5).as("o"), lit("near_dedup").as("st"),
          col("s5").as("kept")),
        struct(lit(6).as("o"), lit("train_split").as("st"),
          col("s6").as("kept")))).as("stg"))
      .filter(col("stg.kept"))
      .groupBy(col("stg.o").as("stage_ord"), col("stg.st").as("stage"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("stage_ord")
  }

  /** "Why was this document dropped?" — the funnel's per-document
    * attribution: every doc labeled with its FIRST failing stage (or
    * kept), histogrammed by source. The debuggability query every
    * production pipeline runs after a yield drop: one scan over the
    * shared [[funnelFlags]] relation, one case-when projection, one
    * O(sources × stages) aggregate. Labels carry the stage ordinal so
    * lexicographic order IS pipeline order. */
  def funnelAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    funnelFlags(spark, sfDir)
      .withColumn("dropped_at",
        when(!col("s2"), "2_lang_en")
          .when(!col("s3"), "3_quality")
          .when(!col("s4"), "4_exact_dedup")
          .when(!col("s5"), "5_near_dedup")
          .when(!col("s6"), "6_train_split")
          .otherwise("7_kept"))
      .groupBy("source", "dropped_at")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("source", "dropped_at")
  }

  def sourceQuota(spark: SparkSession, sfDir: String,
                  quota: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        (keyHash(col("doc_id"))).as("h"))
    val kept = docs
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("h"), col("doc_id"))))
      .filter(col("rn") <= quota)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum("n_chars").as("kept_chars"),
        min("doc_id").as("first_kept"))
    val totals = docs.groupBy("source").agg(count(lit(1)).as("n_total"))
    totals.join(kept, "source")
      .select(col("source"), col("n_total"), col("n_kept"),
        col("kept_chars"), col("first_kept"))
      .orderBy("source")
  }

  /** X11r: Unicode canonicalization (`x11r_unicode_canon`) — the
    * cross-source dedup prerequisite: byte hashes of visually identical
    * text disagree until combining sequences are composed to NFC
    * (U+0065 U+0301 vs U+00E9). Runs the native codegen'd
    * [[graft.plans.NfcNormalize]] expression over a canonical key
    * (NFC ∘ lower), then certifies the composition with per-doc
    * codepoint counts and a SHA-256 of the canonical bytes.
    *
    * The fixture corpus is ASCII (NFC-invariant), so the query
    * manufactures its own decomposed carrier deterministically —
    * every 'e' becomes 'e'+COMBINING ACUTE — and the oracle replays
    * the same injection and composes with utf8proc's `nfc_normalize`;
    * the hash match proves java.text.Normalizer and utf8proc agree
    * byte-for-byte on every composed row. At 100 TB this is a pure
    * per-row projection (no shuffle beyond the final order), and the
    * already-NFC common case returns the input buffer unchanged
    * (NfcNormalize's isNormalized fast path — no allocation).
    */
  def unicodeCanon(spark: SparkSession, sfDir: String): DataFrame = {
    graft.plans.NfcNormalize.register(spark)
    // decomposed carrier: 'e' + COMBINING ACUTE as an explicit escape,
    // so no editor/normalizer can ever silently compose the literal
    val deco = regexp_replace(col("text"), "e", "e" + '\u0301')
    val canon = call_function(graft.plans.NfcNormalize.name, lower(deco))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), deco.as("deco"))
      .select(col("doc_id"),
        (length(col("deco")) - length(col("text"))).cast(IntegerType)
          .as("n_marks"),
        length(canon).cast(IntegerType).as("canon_len"),
        sha2(canon, 256).as("canon_hash"))
      .orderBy("doc_id")
  }

  /** X26: DOMAIN-level curation (`x26_domain_curation`) — the
    * C4/RefinedWeb motion that doc-level filters can't express: score
    * each SOURCE (domain) on aggregate signals and drop whole domains
    * below the bar, because a domain whose sampled pages are junk is
    * junk everywhere (boilerplate farms, SEO spam, non-target-language
    * sites). Signals here: English share and mean document length,
    * both gated on INTEGER cross-multiplications (`n_en·5 < n_docs·2`,
    * `sum_chars < 280·n_docs`) so the flag replays exactly in any
    * engine — never a float threshold.
    *
    * 100 TB shape: ONE map-side-combined groupBy on the domain key
    * (output is O(domains), millions of rows, not O(docs)), and the
    * doc-level keep/drop is a broadcast semi/anti-join of the tiny
    * flagged-domain list back against the corpus — here folded into
    * the same aggregate (`n_kept`), so the corpus is touched once. */
  /** X11s: MARKUP STRIP / boilerplate extraction
    * (`x11s_markup_strip`) — the WET-extraction step every web-crawl
    * pipeline runs before any text filter: drop script blocks, drop
    * navigation boilerplate, strip tags, collapse whitespace. The
    * fixture corpus is plain text, so (the [[unicodeCanon]]
    * discipline) the query MANUFACTURES its markup deterministically —
    * title from the first token, a script block, the body re-wrapped
    * in per-token paragraph tags, a nav div — then extracts, and
    * certifies LOSSLESSNESS: the extract must equal title + original
    * text exactly (boolean column, oracle-replayed), so a regex that
    * eats a character or leaves a tag cannot hash-match. Patterns
    * stay inside the Java∩RE2 common subset (non-greedy `.*?`,
    * `[^>]*`, `' +'` — no `\\s` classes, no dotall) so both engines
    * read them identically. Pure per-row projection at any scale. */
  def markupStrip(spark: SparkSession, sfDir: String): DataFrame = {
    val tok1 = split_part(col("text"), lit(" "), lit(1))
    val html = concat(
      lit("<html><head><title>"), tok1,
      lit("</title><script>var x=1;</script></head><body><p>"),
      regexp_replace(col("text"), " ", "</p> <p>"),
      lit("</p><div class=\"nav\">menu home about</div></body></html>"))
    val noScript = regexp_replace(html, "<script>.*?</script>", " ")
    val noNav = regexp_replace(noScript,
      "<div class=\"nav\">.*?</div>", " ")
    val noTags = regexp_replace(noNav, "<[^>]*>", " ")
    val extract = trim(regexp_replace(noTags, " +", " "))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        length(html).cast(IntegerType).as("html_len"),
        length(extract).cast(IntegerType).as("extract_len"),
        (length(html) - length(regexp_replace(html, "<", "")))
          .cast(IntegerType).as("n_tags"),
        (extract === concat(tok1, lit(" "), col("text")))
          .as("lossless"))
      .orderBy("doc_id")
  }

  /** X17e: LEAKAGE-SAFE train/val/test split
    * (`x17e_leakage_safe_split`) — the split no one notices is wrong
    * until eval day: hashing DOC ids sends near-duplicate documents to
    * opposite sides, so the model is evaluated on paraphrases of its
    * own training data (the classic benchmark-leakage mechanism).
    * The fix is to hash the near-dup CLUSTER id (singletons hash their
    * own id), so every connected component of the pair graph lands on
    * ONE side. Output certifies both policies side by side: under the
    * cluster split the cross-split pair count is ZERO by construction,
    * and the doc-split counter-factual's leak count measures exactly
    * the contamination the operator prevents. Same deterministic
    * bucket rule as the corpus funnel's train gate (Knuth
    * multiplicative hash, 8/1/1). At 100 TB: cluster labels come from
    * the dedup pass you already ran; the split itself is a pure
    * projection, and the certification joins are O(pairs). */
  def leakageSafeSplit(spark: SparkSession, sfDir: String): DataFrame = {
    // keyHash's reduced form `((k mod P)·a) mod P` — identical to the
    // raw product for every key < 2^31 (the oracle keeps the raw form)
    // and overflow-free for the wide ids a 100 TB corpus (or the
    // sf-scaled fixtures' replica-shifted ids) actually carries
    def bucketOf(c: org.apache.spark.sql.Column) =
      keyHash(c) % 10
    def splitOf(c: org.apache.spark.sql.Column) =
      when(bucketOf(c) < 8, "train")
        .when(bucketOf(c) === 8, "val").otherwise("test")
    val assigned = Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(Dedup.dedupClusters(spark, sfDir), Seq("doc_id"), "left")
      .withColumn("unit", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split", splitOf(col("unit")))
      .withColumn("doc_split", splitOf(col("doc_id")))
      .cache()
    val pairs = Dedup.ngramJaccard(spark, sfDir)
      .select("doc_a", "doc_b")
    def leakEndpoints(splitCol: String) = {
      val sa = assigned.select(col("doc_id").as("doc_a"),
        col(splitCol).as("sa"))
      val sb = assigned.select(col("doc_id").as("doc_b"),
        col(splitCol).as("sb"))
      pairs.join(sa, "doc_a").join(sb, "doc_b")
        .filter(col("sa") =!= col("sb"))
        .select(explode(array(col("sa"), col("sb"))).as("split"))
        .groupBy("split").agg(count(lit(1)).as("n"))
    }
    assigned.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("unit")).as("n_units"))
      .join(leakEndpoints("split")
        .withColumnRenamed("n", "n_leaky_cluster"), Seq("split"), "left")
      .join(leakEndpoints("doc_split")
        .withColumnRenamed("n", "n_leaky_doc"), Seq("split"), "left")
      .select(col("split"), col("n_docs"), col("n_units"),
        coalesce(col("n_leaky_cluster"), lit(0L)).as("n_leaky_cluster"),
        coalesce(col("n_leaky_doc"), lit(0L)).as("n_leaky_doc"))
      .orderBy("split")
  }

  /** X18d: FILTER-IMPACT drift audit (`x18d_filter_drift`) — the
    * question every curation step must answer before it ships: what
    * did the gate DO to the corpus distribution? Compares the full
    * corpus against the gate's survivors (here the length gate
    * `n_chars ≥ 280`) per feature bin — length in 8 fixed-width bins,
    * language as categorical — and flags drifted bins with an INTEGER
    * cross-multiplication (`|n_kept·total_all − n_all·total_kept| >
    * total_all·total_kept/10`, i.e. share moved by >10 points), the
    * same no-float-gate discipline as [[domainCuration]]. `share_delta`
    * (kept-share minus all-share) is emitted as a double for reading,
    * computed from exact counts so it replays bit-for-bit — no
    * PSI/KL logarithms, whose libm last-ulp behavior is not portable
    * across engines. One pass over the corpus: both sides aggregate
    * from the same scan (kept is a conditional count), output is
    * O(bins). */
  def filterDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("kept", col("n_chars") >= 280)
    val binned = docs.select(
      col("kept"),
      least(expr("n_chars div 64"), lit(7)).cast("long").as("len_bin"),
      col("lang"))
    def oneFeature(feature: String, bin: org.apache.spark.sql.Column) =
      binned.groupBy(bin.as("bin"))
        .agg(count(lit(1)).as("n_all"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .withColumn("feature", lit(feature))
    val perBin = oneFeature("len_bin", col("len_bin").cast("string"))
      .unionByName(oneFeature("lang", col("lang")))
    val totals = binned.agg(count(lit(1)).as("total_all"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("total_kept"))
    perBin.crossJoin(broadcast(totals))
      .select(col("feature"), col("bin"), col("n_all"), col("n_kept"),
        (col("n_kept").cast("double") / col("total_kept")
          - col("n_all").cast("double") / col("total_all"))
          .as("share_delta"),
        (abs(col("n_kept") * col("total_all")
          - col("n_all") * col("total_kept")) * 10
          > col("total_all") * col("total_kept")).as("drifted"))
      .orderBy("feature", "bin")
  }

  def domainCuration(spark: SparkSession, sfDir: String): DataFrame = {
    val perSource = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        sum(col("n_chars")).as("sum_chars"))
    perSource
      .withColumn("flagged",
        col("n_en") * 5 < col("n_docs") * 2
          || col("sum_chars") < col("n_docs") * 280)
      .withColumn("n_kept",
        when(col("flagged"), 0L).otherwise(col("n_docs")))
      .select("source", "n_docs", "n_en", "sum_chars", "flagged", "n_kept")
      .orderBy("source")
  }
}
