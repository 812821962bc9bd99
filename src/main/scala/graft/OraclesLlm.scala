package graft

/** DuckDB oracle SQL for the LLM-pipeline operators (SURVEY §2.4
  * X9-X11): dedup, similarity search, text analysis. Each statement
  * replays the corresponding Spark pipeline exactly — same data-derived
  * content-hash ids (polynomial hash over character codes — portable
  * arithmetic, where engine-native string hashes never match), same
  * linear-hash constants, same exact-decimal accumulation — so results
  * hash-match bit-for-bit.
  */
object OraclesLlm {

  /** Polynomial char-code hash, mirroring `TextAnalysis.polyHash`:
    * fold over character codes with `(acc*31 + code) mod (2^31-1)`. */
  private def polyHash(e: String) =
    s"""list_reduce(list_transform(string_split($e,''),
       | ch -> CAST(ascii(ch) AS BIGINT)), (a,b) -> (a*31+b) % 2147483647)""".stripMargin

  /** Tokens with 1-based position (mirrors TextAnalysis.tokens). */
  private val toks =
    """toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |              unnest(range(1, len(string_split(text,' '))+1)) AS ord
      |         FROM documents)""".stripMargin

  /** Distinct 3-shingle content-hash ids per doc
    * (mirrors Dedup.shingles/shingleIds). */
  private val shingleCtes =
    s"""sh0 AS (SELECT a.doc_id, a.tok||' '||b.tok||' '||c.tok AS shingle
       |        FROM toks a JOIN toks b ON a.doc_id=b.doc_id AND b.ord=a.ord+1
       |                    JOIN toks c ON a.doc_id=c.doc_id AND c.ord=a.ord+2),
       |ds AS (SELECT DISTINCT doc_id, ${polyHash("shingle")} AS sid FROM sh0)""".stripMargin

  /** Width-n-gram Jaccard near-dup pairs `npairs(doc_a, doc_b, jaccard)`
    * (mirrors Dedup.ngramJaccard incl. the df ≤ 300 stop-gram ceiling;
    * requires the `toks` CTE). The gram is `width` consecutive tokens
    * joined with single spaces — identical to the Spark side's
    * `shingleArrOf(arr, width)` string before hashing. */
  /** Distinct width-n gram-id CTEs `g0`/`grams0` (mirrors the Spark
    * side's `shingleArrOf(arr, width)` string before hashing). */
  /** Width-n gram via self-join of `toks`: the concat expression and
    * the join chain, shared by every gram-building oracle so the toks
    * convention lives in one place. */
  private def gramJoin(width: Int): (String, String) = {
    val als = ('a' to 'z').take(width).map(_.toString)
    val concat = als.map(_ + ".tok").mkString("||' '||")
    val joins = als.tail.zipWithIndex.map { case (al, i) =>
      s"JOIN toks $al ON a.doc_id=$al.doc_id AND $al.ord=a.ord+${i + 1}"
    }.mkString(" ")
    (concat, joins)
  }

  private def gramCtesOf(width: Int): String = {
    val (concat, joins) = gramJoin(width)
    s"""g0 AS (SELECT a.doc_id, $concat AS gram FROM toks a $joins),
       |grams0 AS (SELECT DISTINCT doc_id, ${polyHash("gram")} AS gid FROM g0)""".stripMargin
  }

  private def ngramPairCtesOf(width: Int): String = {
    s"""${gramCtesOf(width)},
       |hot AS (SELECT gid FROM grams0 GROUP BY gid HAVING COUNT(*) > 300),
       |grams AS (SELECT * FROM grams0 g
       |          WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.gid = g.gid)),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
       |inters AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS inter
       |           FROM grams x JOIN grams y
       |             ON x.gid=y.gid AND x.doc_id<y.doc_id GROUP BY 1,2),
       |npairs AS (SELECT i.doc_a, i.doc_b,
       |             CAST(i.inter AS DOUBLE)/(sa.n + sb.n - i.inter) AS jaccard
       |           FROM inters i JOIN sizes sa ON i.doc_a=sa.doc_id
       |                         JOIN sizes sb ON i.doc_b=sb.doc_id
       |           WHERE CAST(i.inter AS DOUBLE)/(sa.n + sb.n - i.inter) >= 0.6)""".stripMargin
  }
  private val ngramPairCtes = ngramPairCtesOf(2)

  /** SimHash per-doc 64-bit fingerprints, two 32-bit halves
    * (mirrors Dedup.simhash). */
  private val simhashCtes =
    s"""$toks,
       |h AS (SELECT t.doc_id,
       |        (982451653*${polyHash("tok")} + 12345) % 4294967291 AS g1,
       |        (1540483477*${polyHash("tok")} + 99991) % 4294967291 AS g2
       |      FROM toks t),
       |bits AS (SELECT doc_id, b,
       |           SUM(CASE WHEN (g1 >> CAST(b AS INT)) % 2 = 1 THEN 1 ELSE -1 END) AS s,
       |           SUM(CASE WHEN (g2 >> CAST(b AS INT)) % 2 = 1 THEN 1 ELSE -1 END) AS t
       |         FROM h, range(0,32) r(b) GROUP BY doc_id, b),
       |fp AS (SELECT doc_id,
       |         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
       |             ELSE 0 END) AS BIGINT) AS simhash_lo,
       |         CAST(SUM(CASE WHEN t > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
       |             ELSE 0 END) AS BIGINT) AS simhash_hi
       |       FROM bits GROUP BY doc_id)""".stripMargin

  /** Exploded int-quantized embeddings + exact integer norms
    * (mirrors VectorOps.quantize/norm2Q). */
  private val vecCtes =
    """ex AS (SELECT vec_id, unnest(range(1,65)) AS pos, unnest(embedding) AS vf
      |       FROM embeddings),
      |exq AS (SELECT vec_id, pos,
      |          CAST(ROUND(CAST(vf AS DOUBLE)*1000000) AS BIGINT) AS q FROM ex),
      |norms AS (SELECT vec_id, CAST(SUM(q*q) AS BIGINT) AS n2
      |          FROM exq GROUP BY vec_id)""".stripMargin

  /** Per-subspace PQ trajectory for x10h (mirrors
    * Similarity.pqCodebooksBuild/pqAssign): subspace slice, k = 4
    * singleton seeds, two Lloyd's iterations with integer-FLOORED
    * centroids, then codes (argmin over the final codebook), the
    * per-query LUT, and the per-subspace ADC partials — all exact
    * BIGINT so the trajectory replays bit-for-bit. */
  private def pqSubCtes(j: Int): String = {
    val off = j * 16
    def distCte(name: String, cbName: String) =
      s"""$name AS (SELECT s.vec_id, c.cell,
         |            CAST(SUM((s.q - c.cq)*(s.q - c.cq)) AS BIGINT) AS dist
         |          FROM sub$j s JOIN $cbName c ON s.p = c.p GROUP BY 1, 2)"""
        .stripMargin
    def argminCte(name: String, dName: String) =
      s"""$name AS (SELECT vec_id, cell FROM
         |            (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |               ORDER BY dist, cell) AS rnk FROM $dName)
         |          WHERE rnk = 1)""".stripMargin
    def rebuildCte(name: String, aName: String) =
      s"""$name AS (SELECT a.cell, s.p,
         |            CAST(FLOOR(CAST(SUM(s.q) AS DOUBLE)/COUNT(*)) AS BIGINT) AS cq
         |          FROM sub$j s JOIN $aName a ON s.vec_id = a.vec_id
         |          GROUP BY 1, 2)""".stripMargin
    Seq(
      s"""sub$j AS (SELECT vec_id, pos - $off AS p, q FROM exq
         |          WHERE pos BETWEEN ${off + 1} AND ${off + 16})""".stripMargin,
      s"cb0_$j AS (SELECT vec_id AS cell, p, q AS cq FROM sub$j WHERE vec_id < 4)",
      distCte(s"d1_$j", s"cb0_$j"),
      argminCte(s"a1_$j", s"d1_$j"),
      rebuildCte(s"cb1_$j", s"a1_$j"),
      distCte(s"d2_$j", s"cb1_$j"),
      argminCte(s"a2_$j", s"d2_$j"),
      rebuildCte(s"cb2_$j", s"a2_$j"),
      distCte(s"d3_$j", s"cb2_$j"),
      argminCte(s"code_$j", s"d3_$j"),
      s"lut_$j AS (SELECT vec_id AS query_id, cell, dist AS d FROM d3_$j WHERE vec_id < 8)",
      s"""adc_$j AS (SELECT l.query_id, k.vec_id, l.d
         |           FROM code_$j k JOIN lut_$j l ON l.cell = k.cell)""".stripMargin
    ).mkString(",\n")
  }

  private val pqCtes = (0 until 4).map(pqSubCtes).mkString(",\n")

  /** Connected-components cluster chain over the near-dup pair graph
    * (requires WITH RECURSIVE and `$toks` + `$ngramPairCtes` upstream):
    * ends at `clus(doc_id, cluster_id)`. Shared by x09g and x09k. */
  private lazy val clusterCtes =
    s"""$ngramPairCtes,
       |e AS (SELECT doc_a AS s, doc_b AS d FROM npairs
       |      UNION ALL SELECT doc_b, doc_a FROM npairs),
       |reach(s, d) AS (SELECT s, d FROM e
       |                UNION
       |                SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s),
       |verts AS (SELECT DISTINCT s FROM e),
       |clus AS (SELECT v.s AS doc_id, LEAST(v.s, MIN(r.d)) AS cluster_id
       |         FROM verts v JOIN reach r ON r.s = v.s
       |         GROUP BY v.s)""".stripMargin

  /** IVF assignment / probe / candidate chain over the learned
    * codebook `c2` (mirrors Similarity.ivfTopK with kmeans cells):
    * ends at `cand(query_id, vec_id)`. Shared by x10e2 (exact rescore)
    * and x10i (ADC rescore). */
  private val ivfCandCtes =
    """sc AS (SELECT e.vec_id, c.cell, c.n, CAST(SUM(e.q*c.s) AS BIGINT) AS num
      |       FROM exq e JOIN c2 c ON e.pos = c.pos GROUP BY 1, 2, 3),
      |cs AS (SELECT vec_id, cell, CAST(num AS DOUBLE)/n AS cellscore FROM sc),
      |assign AS (SELECT vec_id, cell FROM
      |             (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      |                ORDER BY cellscore DESC, cell) AS rnk FROM cs)
      |           WHERE rnk = 1),
      |probes AS (SELECT vec_id AS query_id, cell FROM
      |             (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      |                ORDER BY cellscore DESC, cell) AS rnk
      |              FROM cs WHERE vec_id < 8)
      |           WHERE rnk <= 2),
      |cand AS (SELECT DISTINCT p.query_id, a.vec_id
      |         FROM probes p JOIN assign a
      |           ON p.cell = a.cell AND a.vec_id <> p.query_id)""".stripMargin

  /** Lloyd's k-means trajectory as unrolled CTE pairs over the
    * TRAINING SAMPLE of `src` — ends at `c2(cell, pos, n, s)`, the
    * learned codebook. The derivation itself is replayed in SQL
    * (mirrors Similarity.annGeometry): `n` = vector count of the
    * trained population (`nFrom`), sample stride = n // 65536 + 1,
    * k = max(8, floor(sqrt(n/32))); seeds are the k LOWEST sample
    * vec_ids (rank-based). Iterations run over the sample only; the
    * full-corpus assignment happens downstream (ivfCandCtes / sc3),
    * mirroring the staged-index build. Shared by the x10g
    * certification, the x10e2/x10i/x10j learned-IVF probes, and
    * x09l's SemDeDup clustering. */
  private def kmeansCtesOn(src: String, nFrom: String): String =
    s"""kmp AS (SELECT n, n // 65536 + 1 AS stride,
       |          GREATEST(8, CAST(FLOOR(SQRT(CAST(n AS DOUBLE)/32)) AS BIGINT)) AS kk
       |        FROM (SELECT $nFrom AS n)),
       |kms AS (SELECT e.* FROM $src e, kmp p WHERE e.vec_id % p.stride = 0),
       |kmseed AS (SELECT vec_id FROM
       |             (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) AS rnk
       |              FROM (SELECT DISTINCT vec_id FROM kms) dv)
       |           WHERE rnk <= (SELECT kk FROM kmp)),
       |c0 AS (SELECT s.vec_id AS cell, CAST(1 AS BIGINT) AS n, s.pos, s.q AS s
       |       FROM kms s JOIN kmseed d ON s.vec_id = d.vec_id),
       |s1 AS (SELECT e.vec_id, c.cell, c.n, CAST(SUM(e.q*c.s) AS BIGINT) AS num
       |       FROM kms e JOIN c0 c ON e.pos = c.pos GROUP BY 1, 2, 3),
       |a1 AS (SELECT vec_id, cell FROM
       |         (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |            ORDER BY CAST(num AS DOUBLE)/n DESC, cell) AS rnk FROM s1)
       |       WHERE rnk = 1),
       |c1 AS (SELECT a.cell, e.pos, COUNT(*) AS n,
       |         CAST(SUM(e.q) AS BIGINT) AS s
       |       FROM kms e JOIN a1 a ON e.vec_id = a.vec_id GROUP BY 1, 2),
       |s2 AS (SELECT e.vec_id, c.cell, c.n, CAST(SUM(e.q*c.s) AS BIGINT) AS num
       |       FROM kms e JOIN c1 c ON e.pos = c.pos GROUP BY 1, 2, 3),
       |a2 AS (SELECT vec_id, cell FROM
       |         (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |            ORDER BY CAST(num AS DOUBLE)/n DESC, cell) AS rnk FROM s2)
       |       WHERE rnk = 1),
       |c2 AS (SELECT a.cell, e.pos, COUNT(*) AS n,
       |         CAST(SUM(e.q) AS BIGINT) AS s
       |       FROM kms e JOIN a2 a ON e.vec_id = a.vec_id GROUP BY 1, 2)""".stripMargin

  private val kmeansCtes =
    kmeansCtesOn("exq", "(SELECT COUNT(*) FROM embeddings)")

  /** BPE merge trajectory (mirrors TextAnalysis.bpeMerges), rounds
    * UNROLLED like the k-means CTEs: each round re-derives adjacent
    * pair counts over the evolving symbol rows, picks the argmax pair
    * under the same total order (freq DESC, symbols ASC), realizes the
    * greedy non-overlapping merge via the identical island/parity
    * window arithmetic, and renumbers positions. All counts are exact
    * integers; requires `$toks` upstream. Ends at one `b_r` CTE per
    * round holding that round's learned pair. */
  private def bpeRoundCtes(r: Int): String = {
    val p = r - 1
    s"""pr_$r AS (SELECT word, freq, pos, sym,
       |                 LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
       |          FROM s_$p),
       |b_$r AS (SELECT sym AS l, nxt AS r, CAST(SUM(freq) AS BIGINT) AS pf
       |         FROM pr_$r WHERE nxt IS NOT NULL
       |         GROUP BY 1, 2 ORDER BY pf DESC, l, r LIMIT 1),
       |m_$r AS (SELECT p.word, p.freq, p.pos, p.sym, p.nxt,
       |                COALESCE(p.sym = b.l AND p.nxt = b.r, FALSE) AS mt
       |         FROM pr_$r p LEFT JOIN b_$r b ON TRUE),
       |s_$r AS (SELECT word, freq,
       |                CAST(ROW_NUMBER() OVER
       |                  (PARTITION BY word ORDER BY pos) AS BIGINT) AS pos,
       |                CASE WHEN s1 THEN sym || nxt ELSE sym END AS sym
       |         FROM (SELECT *, LAG(s1, 1, FALSE) OVER
       |                 (PARTITION BY word ORDER BY pos) AS consumed
       |               FROM (SELECT *,
       |                       (mt AND (pos - COALESCE(
       |                          MAX(CASE WHEN NOT mt THEN pos END) OVER
       |                            (PARTITION BY word ORDER BY pos
       |                             ROWS BETWEEN UNBOUNDED PRECEDING
       |                               AND CURRENT ROW), 0)) % 2 = 1) AS s1
       |                     FROM m_$r))
       |         WHERE NOT consumed)""".stripMargin
  }

  private val bpeRounds = 6

  private val bpeCtes =
    s"""words AS (SELECT tok AS word, COUNT(*) AS freq FROM toks
       |          WHERE tok <> '' GROUP BY tok),
       |s_0 AS (SELECT word, freq,
       |               CAST(unnest(range(1, length(word)+1)) AS BIGINT) AS pos,
       |               unnest(string_split(word, '')) AS sym
       |        FROM words),
       |${(1 to bpeRounds).map(bpeRoundCtes).mkString(",\n")}""".stripMargin

  private val bpeFinal =
    (1 to bpeRounds).map(r =>
      s"SELECT $r AS merge_rank, l AS left_sym, r AS right_sym, pf AS pair_freq FROM b_$r")
      .mkString("\nUNION ALL ")

  /** The corpus-funnel stage-flag CTE chain shared by x20 (cumulative
    * yields) and x20b (first-failing-stage attribution) — mirrors
    * TextAnalysis.funnelFlags. Expects `$toks` and `$clusterCtes` in
    * scope. */
  private lazy val funnelCtes =
    """feat AS (SELECT doc_id, source, text,
      |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
      |    len(list_distinct(string_split(text,' '))) AS n_distinct,
      |    len(list_filter(string_split(text,' '), t -> t='the'))
      |      + len(list_filter(string_split(text,' '), t -> t='a')) AS en,
      |    len(list_filter(string_split(text,' '), t -> t='data'))
      |      + len(list_filter(string_split(text,' '), t -> t='table')) AS es,
      |    len(list_filter(string_split(text,' '), t -> t='window'))
      |      + len(list_filter(string_split(text,' '), t -> t='row')) AS de,
      |    len(list_filter(string_split(text,' '), t -> t='filter'))
      |      + len(list_filter(string_split(text,' '), t -> t='stream')) AS fr,
      |    len(list_filter(string_split(text,' '), t -> t='spark'))
      |      + len(list_filter(string_split(text,' '), t -> t='query')) AS zh
      |  FROM documents),
      |f3 AS (SELECT *,
      |    (en>=es AND en>=de AND en>=fr AND en>=zh) AS s2,
      |    (en>=es AND en>=de AND en>=fr AND en>=zh
      |      AND n_tokens >= 20 AND n_distinct/n_tokens >= 0.25) AS s3
      |  FROM feat),
      |f4 AS (SELECT *, (s3 AND doc_id = MIN(CASE WHEN s3 THEN doc_id END)
      |    OVER (PARTITION BY text)) AS s4 FROM f3),
      |f6 AS (SELECT f.*, (f.s4 AND (c.cluster_id IS NULL OR
      |      f.doc_id = MIN(CASE WHEN f.s4 THEN f.doc_id END)
      |        OVER (PARTITION BY COALESCE(c.cluster_id, f.doc_id)))) AS s5,
      |    (f.s4 AND (c.cluster_id IS NULL OR
      |      f.doc_id = MIN(CASE WHEN f.s4 THEN f.doc_id END)
      |        OVER (PARTITION BY COALESCE(c.cluster_id, f.doc_id)))
      |      AND ((f.doc_id * 2654435761) % 2147483647) % 10 < 8) AS s6
      |  FROM f4 f LEFT JOIN clus c ON f.doc_id = c.doc_id)""".stripMargin

  val sql: Map[String, String] = Map(
    // The sketch query's final output is EXACT by construction (the MG
    // candidates are a guaranteed superset, then re-counted exactly),
    // so the oracle is the closed-form frequency threshold.
    "x11p_heavy_hitters" ->
      s"""WITH $toks,
         |tot AS (SELECT COUNT(*) AS total FROM toks)
         |SELECT tok AS token, COUNT(*) AS n_occurrences,
         |       CAST(COUNT(*) AS DOUBLE) / MIN(t.total) AS share
         |FROM toks, tot t
         |GROUP BY tok
         |HAVING COUNT(*) * 30 > MIN(t.total)
         |ORDER BY n_occurrences DESC, token""".stripMargin,
    // Composed corpus-build funnel: each stage's predicate is the
    // already-certified operator's oracle fragment applied to the
    // previous stage's survivors; near-dedup reuses the recursive CC
    // cluster chain. HAVING drops empty stages exactly like the
    // engine's filter-then-group.
    "x20_corpus_funnel" ->
      s"""WITH RECURSIVE $toks,
         |$clusterCtes,
         |$funnelCtes
         |SELECT 1 AS stage_ord, 'raw' AS stage,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |FROM f6 HAVING COUNT(*) > 0
         |UNION ALL SELECT 2, 'lang_en', COUNT(*), CAST(SUM(n_tokens) AS BIGINT)
         |FROM f6 WHERE s2 HAVING COUNT(*) > 0
         |UNION ALL SELECT 3, 'quality', COUNT(*), CAST(SUM(n_tokens) AS BIGINT)
         |FROM f6 WHERE s3 HAVING COUNT(*) > 0
         |UNION ALL SELECT 4, 'exact_dedup', COUNT(*), CAST(SUM(n_tokens) AS BIGINT)
         |FROM f6 WHERE s4 HAVING COUNT(*) > 0
         |UNION ALL SELECT 5, 'near_dedup', COUNT(*), CAST(SUM(n_tokens) AS BIGINT)
         |FROM f6 WHERE s5 HAVING COUNT(*) > 0
         |UNION ALL SELECT 6, 'train_split', COUNT(*), CAST(SUM(n_tokens) AS BIGINT)
         |FROM f6 WHERE s6 HAVING COUNT(*) > 0
         |ORDER BY stage_ord""".stripMargin,
    "x20b_funnel_attribution" ->
      s"""WITH RECURSIVE $toks,
         |$clusterCtes,
         |$funnelCtes
         |SELECT source,
         |  CASE WHEN NOT s2 THEN '2_lang_en'
         |       WHEN NOT s3 THEN '3_quality'
         |       WHEN NOT s4 THEN '4_exact_dedup'
         |       WHEN NOT s5 THEN '5_near_dedup'
         |       WHEN NOT s6 THEN '6_train_split'
         |       ELSE '7_kept' END AS dropped_at,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |FROM f6 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x11o_bpe_merges" ->
      s"""WITH $toks,
         |$bpeCtes
         |$bpeFinal
         |ORDER BY merge_rank""".stripMargin,
    // Encode = the trajectory's FINAL word-symbol state (s_N) aggregated
    // per word, joined back to the token stream; the sha256 pins the
    // byte-exact encoded sequence.
    "x11q_bpe_encode" ->
      s"""WITH $toks,
         |$bpeCtes,
         |enc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_subwords,
         |               STRING_AGG(sym, ' ' ORDER BY pos) AS subtoks
         |        FROM s_$bpeRounds GROUP BY word)
         |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |       CAST(SUM(e.n_subwords) AS BIGINT) AS n_subwords,
         |       CAST(SUM(e.n_subwords) AS DOUBLE)/COUNT(*) AS fertility,
         |       sha256(STRING_AGG(e.subtoks, ' ' ORDER BY t.ord))
         |         AS encoded_hash
         |FROM toks t JOIN enc e ON t.tok = e.word
         |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,
    "x09a_exact_dedup" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
        |       sha256(text) AS content_hash
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "x09b_minhash_lsh" ->
      s"""WITH $toks,
         |$shingleCtes,
         |params AS (SELECT CAST(i AS INT) AS i,
         |             (1103515245*(i+1)) % 2147483647 AS a,
         |             (12345 + 2654435761*i) % 2147483647 AS b
         |           FROM range(0,16) t(i)),
         |mh AS (SELECT doc_id, i, MIN((a*sid+b) % 2147483647) AS mh
         |       FROM ds, params GROUP BY doc_id, i),
         |bands AS (SELECT doc_id, i//4 AS band,
         |            SUM(mh * (CASE i%4 WHEN 0 THEN 1 WHEN 1 THEN 31
         |                      WHEN 2 THEN 961 ELSE 29791 END)) AS bandkey
         |          FROM mh GROUP BY doc_id, i//4),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM bands x JOIN bands y
         |           ON x.band=y.band AND x.bandkey=y.bandkey AND x.doc_id<y.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM ds GROUP BY doc_id),
         |inters AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
         |           FROM cand c JOIN ds da ON c.doc_a=da.doc_id
         |                       JOIN ds db ON c.doc_b=db.doc_id AND da.sid=db.sid
         |           GROUP BY c.doc_a, c.doc_b)
         |SELECT i.doc_a, i.doc_b,
         |       CAST(i.inter AS DOUBLE)/(sa.n + sb.n - i.inter) AS jaccard
         |FROM inters i JOIN sizes sa ON i.doc_a=sa.doc_id
         |              JOIN sizes sb ON i.doc_b=sb.doc_id
         |WHERE CAST(i.inter AS DOUBLE)/(sa.n + sb.n - i.inter) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "x09c_simhash" ->
      s"""WITH $simhashCtes
         |SELECT doc_id, simhash_lo, simhash_hi FROM fp ORDER BY doc_id""".stripMargin,
    // All-pairs in the oracle (tiny at oracle scale); the engine's
    // 16-bit banding is pigeonhole-complete for hamming ≤ 3, so the
    // result sets are provably equal. The QUALIFY mirrors the engine's
    // bounded output contract (top-8 closest partners per left doc) —
    // pair-emitting queries must stay O(docs) under any fixture
    // density.
    "x09d_simhash_pairs" ->
      s"""WITH $simhashCtes
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.simhash_lo, b.simhash_lo))
         |          + bit_count(xor(a.simhash_hi, b.simhash_hi)) AS INT) AS hamming
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash_lo, b.simhash_lo))
         |    + bit_count(xor(a.simhash_hi, b.simhash_hi)) <= 3
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY a.doc_id
         |  ORDER BY bit_count(xor(a.simhash_lo, b.simhash_lo))
         |         + bit_count(xor(a.simhash_hi, b.simhash_hi)),
         |           b.doc_id) <= 8
         |ORDER BY doc_a, doc_b""".stripMargin,
    "x09e_ngram_jaccard" ->
      s"""WITH $toks,
         |$ngramPairCtes
         |SELECT doc_a, doc_b, jaccard FROM npairs
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_a
         |  ORDER BY jaccard DESC, doc_b) <= 8
         |ORDER BY doc_a, doc_b""".stripMargin,
    // the PrefixFilter strategy certified on its OPEN-VOCABULARY venue:
    // width-4 shingles (31-token fixture vocabulary → ~924k possible
    // grams, rare-gram mass 0.93) — the corpus shape where the prefix
    // prune pays, i.e. the 100 TB Zipf-text case. Same logical op and
    // threshold; only the shingle width differs from x09e.
    "x09e2_jaccard_prefix" ->
      s"""WITH $toks,
         |${ngramPairCtesOf(4)}
         |SELECT doc_a, doc_b, jaccard FROM npairs
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_a
         |  ORDER BY jaccard DESC, doc_b) <= 8
         |ORDER BY doc_a, doc_b""".stripMargin,
    // x11s: the same manufacture→extract pipeline in RE2; the
    // `lossless` boolean is the cross-engine certificate that neither
    // regex dialect ate or leaked a character.
    "x11s_markup_strip" ->
      """WITH b AS (SELECT doc_id, text,
        |             string_split(text, ' ')[1] AS tok1
        |           FROM documents),
        |h AS (SELECT doc_id, text, tok1,
        |        '<html><head><title>' || tok1 ||
        |        '</title><script>var x=1;</script></head><body><p>' ||
        |        replace(text, ' ', '</p> <p>') ||
        |        '</p><div class="nav">menu home about</div></body></html>'
        |          AS html
        |      FROM b),
        |x AS (SELECT doc_id, text, tok1, html,
        |        trim(regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(html, '<script>.*?</script>', ' ', 'g'),
        |              '<div class="nav">.*?</div>', ' ', 'g'),
        |            '<[^>]*>', ' ', 'g'),
        |          ' +', ' ', 'g')) AS extract
        |      FROM h)
        |SELECT doc_id,
        |       CAST(length(html) AS INT) AS html_len,
        |       CAST(length(extract) AS INT) AS extract_len,
        |       CAST(length(html) - length(replace(html, '<', ''))
        |         AS INT) AS n_tags,
        |       extract = tok1 || ' ' || text AS lossless
        |FROM x ORDER BY doc_id""".stripMargin,
    // x17e: clusters replayed (recursive reach), both split policies
    // from the same Knuth bucket rule, leak endpoints counted per side
    // — a pair crossing the cluster split anywhere cannot hash-match
    // the pinned zeros.
    "x17e_leakage_safe_split" ->
      s"""WITH RECURSIVE $toks,
         |$clusterCtes,
         |assigned AS (SELECT d.doc_id,
         |    COALESCE(c.cluster_id, d.doc_id) AS unit
         |  FROM documents d LEFT JOIN clus c ON d.doc_id = c.doc_id),
         |sp AS (SELECT doc_id, unit,
         |    CASE WHEN (unit*2654435761) % 2147483647 % 10 < 8 THEN 'train'
         |         WHEN (unit*2654435761) % 2147483647 % 10 = 8 THEN 'val'
         |         ELSE 'test' END AS split,
         |    CASE WHEN (doc_id*2654435761) % 2147483647 % 10 < 8 THEN 'train'
         |         WHEN (doc_id*2654435761) % 2147483647 % 10 = 8 THEN 'val'
         |         ELSE 'test' END AS doc_split
         |  FROM assigned),
         |base AS (SELECT split, COUNT(*) AS n_docs,
         |           COUNT(DISTINCT unit) AS n_units
         |         FROM sp GROUP BY split),
         |lc AS (SELECT side AS split, COUNT(*) AS n FROM (
         |         SELECT a.split AS side FROM npairs p
         |           JOIN sp a ON p.doc_a = a.doc_id
         |           JOIN sp b ON p.doc_b = b.doc_id
         |         WHERE a.split <> b.split
         |         UNION ALL
         |         SELECT b.split FROM npairs p
         |           JOIN sp a ON p.doc_a = a.doc_id
         |           JOIN sp b ON p.doc_b = b.doc_id
         |         WHERE a.split <> b.split) GROUP BY side),
         |ld AS (SELECT side AS split, COUNT(*) AS n FROM (
         |         SELECT a.doc_split AS side FROM npairs p
         |           JOIN sp a ON p.doc_a = a.doc_id
         |           JOIN sp b ON p.doc_b = b.doc_id
         |         WHERE a.doc_split <> b.doc_split
         |         UNION ALL
         |         SELECT b.doc_split FROM npairs p
         |           JOIN sp a ON p.doc_a = a.doc_id
         |           JOIN sp b ON p.doc_b = b.doc_id
         |         WHERE a.doc_split <> b.doc_split) GROUP BY side)
         |SELECT b.split, CAST(b.n_docs AS BIGINT) AS n_docs,
         |       CAST(b.n_units AS BIGINT) AS n_units,
         |       CAST(COALESCE(lc.n, 0) AS BIGINT) AS n_leaky_cluster,
         |       CAST(COALESCE(ld.n, 0) AS BIGINT) AS n_leaky_doc
         |FROM base b LEFT JOIN lc ON b.split = lc.split
         |            LEFT JOIN ld ON b.split = ld.split
         |ORDER BY b.split""".stripMargin,
    // x18d: per-bin counts exact, share_delta a deterministic division
    // of exact counts, the drift flag an integer cross-multiplication
    // (>10 share-points) — no logarithms anywhere.
    "x18d_filter_drift" ->
      """WITH d AS (SELECT n_chars >= 280 AS kept,
        |             CAST(LEAST(n_chars // 64, 7) AS VARCHAR) AS len_bin,
        |             lang
        |           FROM documents),
        |     per AS (SELECT 'len_bin' AS feature, len_bin AS bin,
        |               COUNT(*) AS n_all,
        |               SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS n_kept
        |             FROM d GROUP BY len_bin
        |             UNION ALL
        |             SELECT 'lang', lang, COUNT(*),
        |               SUM(CASE WHEN kept THEN 1 ELSE 0 END)
        |             FROM d GROUP BY lang),
        |     tot AS (SELECT COUNT(*) AS total_all,
        |               SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS total_kept
        |             FROM d)
        |SELECT feature, bin, CAST(n_all AS BIGINT) AS n_all,
        |       CAST(n_kept AS BIGINT) AS n_kept,
        |       CAST(n_kept AS DOUBLE)/total_kept
        |         - CAST(n_all AS DOUBLE)/total_all AS share_delta,
        |       ABS(n_kept*total_all - n_all*total_kept) * 10
        |         > total_all*total_kept AS drifted
        |FROM per, tot
        |ORDER BY feature, bin""".stripMargin,
    // x26: per-domain signals + an integer-cross-multiplied gate —
    // no float threshold anywhere, so the flag replays exactly.
    "x26_domain_curation" ->
      """WITH s AS (SELECT source, COUNT(*) AS n_docs,
        |             SUM(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS n_en,
        |             SUM(n_chars) AS sum_chars
        |           FROM documents GROUP BY source)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |       CAST(n_en AS BIGINT) AS n_en,
        |       CAST(sum_chars AS BIGINT) AS sum_chars,
        |       (n_en*5 < n_docs*2 OR sum_chars < n_docs*280) AS flagged,
        |       CAST(CASE WHEN n_en*5 < n_docs*2
        |                   OR sum_chars < n_docs*280
        |                 THEN 0 ELSE n_docs END AS BIGINT) AS n_kept
        |FROM s ORDER BY source""".stripMargin,
    // x09q: the incremental path's verdicts replay from a FULL minhash
    // recompute — same params as x09b; candidates restricted to pairs
    // whose later side is the delta batch (doc_id % 5 = 0), component
    // agreement counted over the 16-long signatures, per-doc top-8, and
    // a LEFT JOIN pins the novel-doc NULL rows.
    "x09q_incremental_dedup" ->
      s"""WITH $toks,
         |$shingleCtes,
         |params AS (SELECT CAST(i AS INT) AS i,
         |             (1103515245*(i+1)) % 2147483647 AS a,
         |             (12345 + 2654435761*i) % 2147483647 AS b
         |           FROM range(0,16) t(i)),
         |mh AS (SELECT doc_id, i, MIN((a*sid+b) % 2147483647) AS mh
         |       FROM ds, params GROUP BY doc_id, i),
         |bands AS (SELECT doc_id, i//4 AS band,
         |            SUM(mh * (CASE i%4 WHEN 0 THEN 1 WHEN 1 THEN 31
         |                      WHEN 2 THEN 961 ELSE 29791 END)) AS bandkey
         |          FROM mh GROUP BY doc_id, i//4),
         |cand AS (SELECT DISTINCT d.doc_id, p.doc_id AS partner
         |         FROM bands d JOIN bands p
         |           ON d.band=p.band AND d.bandkey=p.bandkey
         |         WHERE d.doc_id % 5 = 0 AND p.doc_id <> d.doc_id
         |           AND (p.doc_id % 5 <> 0 OR p.doc_id < d.doc_id)),
         |nm AS (SELECT c.doc_id, c.partner,
         |         CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)
         |           AS INT) AS n_match
         |       FROM cand c JOIN mh a ON a.doc_id = c.doc_id
         |                   JOIN mh b ON b.doc_id = c.partner AND b.i = a.i
         |       GROUP BY c.doc_id, c.partner),
         |top AS (SELECT doc_id, partner, n_match FROM nm
         |        WHERE n_match >= 12
         |        QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
         |          ORDER BY n_match DESC, partner) <= 8)
         |SELECT d.doc_id, t.partner, t.n_match
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
         |LEFT JOIN top t ON d.doc_id = t.doc_id
         |ORDER BY d.doc_id, t.partner""".stripMargin,
    // x09r: both detectors replayed in full (the x09b and x09f
    // pipelines verbatim), fused with a FULL JOIN on the pair key —
    // a pair in the wrong signal class cannot hash-match.
    "x09r_ensemble_dedup" ->
      s"""WITH $toks,
         |$shingleCtes,
         |params AS (SELECT CAST(i AS INT) AS i,
         |             (1103515245*(i+1)) % 2147483647 AS a,
         |             (12345 + 2654435761*i) % 2147483647 AS b
         |           FROM range(0,16) t(i)),
         |mh AS (SELECT doc_id, i, MIN((a*sid+b) % 2147483647) AS mh
         |       FROM ds, params GROUP BY doc_id, i),
         |mbands AS (SELECT doc_id, i//4 AS band,
         |            SUM(mh * (CASE i%4 WHEN 0 THEN 1 WHEN 1 THEN 31
         |                      WHEN 2 THEN 961 ELSE 29791 END)) AS bandkey
         |          FROM mh GROUP BY doc_id, i//4),
         |mcand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |          FROM mbands x JOIN mbands y
         |            ON x.band=y.band AND x.bandkey=y.bandkey
         |           AND x.doc_id<y.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM ds GROUP BY doc_id),
         |inters AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
         |           FROM mcand c JOIN ds da ON c.doc_a=da.doc_id
         |                        JOIN ds db ON c.doc_b=db.doc_id
         |                                  AND da.sid=db.sid
         |           GROUP BY c.doc_a, c.doc_b),
         |lexp AS (SELECT i.doc_a, i.doc_b,
         |           CAST(i.inter AS DOUBLE)/(sa.n + sb.n - i.inter) AS jaccard
         |         FROM inters i JOIN sizes sa ON i.doc_a=sa.doc_id
         |                       JOIN sizes sb ON i.doc_b=sb.doc_id
         |         WHERE CAST(i.inter AS DOUBLE)/(sa.n + sb.n - i.inter) >= 0.5),
         |$vecCtes,
         |hyp AS (SELECT j, pos,
         |          2*((1103515245*(j*64+pos)+12345) % 1000003) - 1000003 AS wnum
         |        FROM range(0,16) t(j), range(1,65) r(pos)),
         |proj AS (SELECT e.vec_id, h.j, CAST(SUM(e.q*h.wnum) AS BIGINT) AS p
         |         FROM exq e JOIN hyp h ON e.pos = h.pos GROUP BY 1, 2),
         |buck AS (SELECT vec_id, j//8 AS band,
         |           CAST(SUM(CASE WHEN p >= 0
         |               THEN (CAST(1 AS BIGINT) << CAST(j%8 AS INT))
         |               ELSE 0 END) AS BIGINT) AS bandkey
         |         FROM proj GROUP BY vec_id, j//8),
         |vpairs AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |           FROM buck a JOIN buck b
         |             ON a.band = b.band AND a.bandkey = b.bandkey
         |            AND a.vec_id < b.vec_id),
         |vdots AS (SELECT p.vec_a, p.vec_b, CAST(SUM(qa.q*qb.q) AS BIGINT) AS dot
         |          FROM vpairs p JOIN exq qa ON qa.vec_id = p.vec_a
         |                       JOIN exq qb ON qb.vec_id = p.vec_b
         |                                  AND qb.pos = qa.pos
         |          GROUP BY 1, 2),
         |semp AS (SELECT vec_a, vec_b,
         |           CAST(dot AS DOUBLE) /
         |             (SQRT(CAST(na.n2 AS DOUBLE))
         |              *SQRT(CAST(nb.n2 AS DOUBLE))) AS cosine
         |         FROM vdots JOIN norms na ON vec_a = na.vec_id
         |                    JOIN norms nb ON vec_b = nb.vec_id
         |         WHERE CAST(dot AS DOUBLE) /
         |             (SQRT(CAST(na.n2 AS DOUBLE))
         |              *SQRT(CAST(nb.n2 AS DOUBLE))) >= 0.45)
         |SELECT COALESCE(l.doc_a, s.vec_a) AS doc_a,
         |       COALESCE(l.doc_b, s.vec_b) AS doc_b,
         |       l.jaccard, s.cosine,
         |       CASE WHEN l.doc_a IS NOT NULL AND s.vec_a IS NOT NULL
         |              THEN 'both'
         |            WHEN l.doc_a IS NOT NULL THEN 'lexical'
         |            ELSE 'semantic' END AS signal
         |FROM lexp l FULL JOIN semp s
         |  ON l.doc_a = s.vec_a AND l.doc_b = s.vec_b
         |ORDER BY doc_a, doc_b""".stripMargin,
    // x09p: asymmetric containment over width-4 rare-gram candidates —
    // the integer τ-filter (inter·5 ≥ n·3) and the per-doc top-8 bound
    // replay exactly; floats only in the emitted cont_a/cont_b.
    "x09p_containment" ->
      s"""WITH $toks,
         |${gramCtesOf(4)},
         |hot AS (SELECT gid FROM grams0 GROUP BY gid HAVING COUNT(*) > 300),
         |grams AS (SELECT * FROM grams0 g
         |          WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.gid = g.gid)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
         |inters AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |             COUNT(*) AS inter
         |           FROM grams x JOIN grams y
         |             ON x.gid=y.gid AND x.doc_id<y.doc_id GROUP BY 1,2),
         |cpairs AS (SELECT i.doc_a, i.doc_b, sa.n AS n_a, sb.n AS n_b,
         |             i.inter,
         |             CAST(i.inter AS DOUBLE)/sa.n AS cont_a,
         |             CAST(i.inter AS DOUBLE)/sb.n AS cont_b
         |           FROM inters i JOIN sizes sa ON i.doc_a=sa.doc_id
         |                         JOIN sizes sb ON i.doc_b=sb.doc_id
         |           WHERE i.inter*5 >= sa.n*3 OR i.inter*5 >= sb.n*3)
         |SELECT doc_a, doc_b, n_a, n_b, inter, cont_a, cont_b FROM cpairs
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_a
         |  ORDER BY GREATEST(cont_a, cont_b) DESC, doc_b) <= 8
         |ORDER BY doc_a, doc_b""".stripMargin,
    "x09g_dedup_clusters" ->
      s"""WITH RECURSIVE $toks,
         |$clusterCtes
         |SELECT doc_id, cluster_id FROM clus ORDER BY doc_id""".stripMargin,
    // Canonical survivor per cluster: all-integer argmax (distinct
    // tokens desc, length desc, id asc) — mirrors Dedup.canonicalDocs.
    "x09k_canonical" ->
      s"""WITH RECURSIVE $toks,
         |$clusterCtes,
         |feats AS (SELECT doc_id,
         |            CAST(len(list_distinct(string_split(text,' '))) AS INT)
         |              AS n_distinct,
         |            CAST(length(text) AS INT) AS len_chars
         |          FROM documents),
         |m AS (SELECT c.cluster_id, c.doc_id, f.n_distinct, f.len_chars,
         |        ROW_NUMBER() OVER (PARTITION BY c.cluster_id
         |          ORDER BY f.n_distinct DESC, f.len_chars DESC, c.doc_id)
         |          AS rnk,
         |        COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members
         |      FROM clus c JOIN feats f USING (doc_id))
         |SELECT cluster_id, doc_id AS keep_id,
         |       CAST(n_members AS BIGINT) AS n_members, n_distinct, len_chars
         |FROM m WHERE rnk = 1 ORDER BY cluster_id""".stripMargin,
    "x09f_embedding_dedup" ->
      s"""WITH $vecCtes,
         |hyp AS (SELECT j, pos,
         |          2*((1103515245*(j*64+pos)+12345) % 1000003) - 1000003 AS wnum
         |        FROM range(0,16) t(j), range(1,65) r(pos)),
         |proj AS (SELECT e.vec_id, h.j, CAST(SUM(e.q*h.wnum) AS BIGINT) AS p
         |         FROM exq e JOIN hyp h ON e.pos = h.pos GROUP BY 1, 2),
         |buck AS (SELECT vec_id, j//8 AS band,
         |           CAST(SUM(CASE WHEN p >= 0
         |               THEN (CAST(1 AS BIGINT) << CAST(j%8 AS INT))
         |               ELSE 0 END) AS BIGINT) AS bandkey
         |         FROM proj GROUP BY vec_id, j//8),
         |pairs AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |          FROM buck a JOIN buck b
         |            ON a.band = b.band AND a.bandkey = b.bandkey
         |           AND a.vec_id < b.vec_id),
         |dots AS (SELECT p.vec_a, p.vec_b, CAST(SUM(qa.q*qb.q) AS BIGINT) AS dot
         |         FROM pairs p JOIN exq qa ON qa.vec_id = p.vec_a
         |                      JOIN exq qb ON qb.vec_id = p.vec_b AND qb.pos = qa.pos
         |         GROUP BY 1, 2),
         |cosv AS (SELECT vec_a, vec_b,
         |           CAST(dot AS DOUBLE) /
         |             (SQRT(CAST(na.n2 AS DOUBLE))*SQRT(CAST(nb.n2 AS DOUBLE))) AS cosine
         |         FROM dots JOIN norms na ON vec_a = na.vec_id
         |                   JOIN norms nb ON vec_b = nb.vec_id)
         |SELECT vec_a, vec_b, cosine FROM cosv
         |WHERE cosine >= 0.45 ORDER BY vec_a, vec_b""".stripMargin,
    "x10a_cosine_topk" ->
      s"""WITH $vecCtes,
         |dots AS (SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         |           CAST(SUM(q.q*e.q) AS BIGINT) AS dot
         |         FROM exq q JOIN exq e
         |           ON q.pos = e.pos AND q.vec_id < 8 AND e.vec_id <> q.vec_id
         |         GROUP BY 1, 2),
         |cosv AS (SELECT d.query_id, d.vec_id,
         |           CAST(d.dot AS DOUBLE) /
         |             (SQRT(CAST(nq.n2 AS DOUBLE))*SQRT(CAST(ne.n2 AS DOUBLE))) AS cosine
         |         FROM dots d JOIN norms nq ON d.query_id = nq.vec_id
         |                     JOIN norms ne ON d.vec_id = ne.vec_id),
         |rk AS (SELECT query_id, vec_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY cosine DESC, vec_id) AS rkn FROM cosv)
         |SELECT query_id, CAST(rkn AS INT) AS rnk, vec_id, cosine
         |FROM rk WHERE rkn <= 5 ORDER BY query_id, rnk""".stripMargin,
    // x10l: the int8 PTQ export replayed per element — same shifted
    // non-negative round-half formula, exact error numerator
    "x10l_int8_export" ->
      s"""WITH $vecCtes,
         |mx AS (SELECT vec_id, CAST(MAX(ABS(q)) AS BIGINT) AS maxabs
         |       FROM exq GROUP BY 1),
         |codes AS (SELECT e.vec_id, e.q, m.maxabs,
         |    CASE WHEN m.maxabs = 0 THEN CAST(0 AS BIGINT)
         |         ELSE ((e.q + m.maxabs) * 254 + m.maxabs)
         |                // (2 * m.maxabs) - 127 END AS code
         |  FROM exq e JOIN mx m ON e.vec_id = m.vec_id)
         |SELECT vec_id, maxabs,
         |  CAST(MIN(code) AS BIGINT) AS min_code,
         |  CAST(MAX(code) AS BIGINT) AS max_code,
         |  CAST(SUM(code) AS BIGINT) AS sum_code,
         |  CAST(MAX(ABS(q*127 - code*maxabs)) AS BIGINT) AS max_err_num,
         |  CAST(MAX(ABS(q*127 - code*maxabs)) AS BIGINT) * 2 <= maxabs
         |    AS within_half
         |FROM codes GROUP BY vec_id, maxabs ORDER BY vec_id""".stripMargin,
    "x10b_ann_lsh" ->
      s"""WITH $vecCtes,
         |hyp AS (SELECT j, pos,
         |          2*((1103515245*(j*64+pos)+12345) % 1000003) - 1000003 AS wnum
         |        FROM range(0,16) t(j), range(1,65) r(pos)),
         |proj AS (SELECT e.vec_id, h.j, CAST(SUM(e.q*h.wnum) AS BIGINT) AS p
         |         FROM exq e JOIN hyp h ON e.pos = h.pos GROUP BY 1, 2),
         |buck AS (SELECT vec_id, j//8 AS band,
         |           CAST(SUM(CASE WHEN p >= 0
         |               THEN (CAST(1 AS BIGINT) << CAST(j%8 AS INT))
         |               ELSE 0 END) AS BIGINT) AS bandkey
         |         FROM proj GROUP BY vec_id, j//8),
         |cand AS (SELECT DISTINCT q.vec_id AS query_id, e.vec_id AS vec_id
         |         FROM buck q JOIN buck e
         |           ON q.band = e.band AND q.bandkey = e.bandkey
         |          AND q.vec_id < 8 AND e.vec_id <> q.vec_id),
         |dots AS (SELECT c.query_id, c.vec_id,
         |           CAST(SUM(qd.q*ed.q) AS BIGINT) AS dot
         |         FROM cand c
         |         JOIN exq qd ON qd.vec_id = c.query_id
         |         JOIN exq ed ON ed.vec_id = c.vec_id AND ed.pos = qd.pos
         |         GROUP BY 1, 2),
         |cosv AS (SELECT d.query_id, d.vec_id,
         |           CAST(d.dot AS DOUBLE) /
         |             (SQRT(CAST(nq.n2 AS DOUBLE))*SQRT(CAST(ne.n2 AS DOUBLE))) AS cosine
         |         FROM dots d JOIN norms nq ON d.query_id = nq.vec_id
         |                     JOIN norms ne ON d.vec_id = ne.vec_id),
         |rk AS (SELECT query_id, vec_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY cosine DESC, vec_id) AS rkn FROM cosv)
         |SELECT query_id, CAST(rkn AS INT) AS rnk, vec_id, cosine
         |FROM rk WHERE rkn <= 3 ORDER BY query_id, rnk""".stripMargin,
    // x10l: the k-NN graph — x10b's bucket/cosine replay with DIRECTED
    // all-pairs candidates (every vector a source, not just the 8
    // queries) and a per-source rank cut.
    // x10m: signs from the LCG residue, projections/dots exact BIGINT,
    // exact cosine replayed at full precision; per-query distortion
    // quantiles are RANK-SELECTED (the x05e discipline) so the doubles
    // hash-match — a float mean would not.
    "x10m_jl_distortion" ->
      s"""WITH $vecCtes,
         |signs AS (SELECT j, pos,
         |            CASE WHEN 2*((1103515245*(j*64 + pos - 1) + 12345)
         |                   % 1000003) < 1000003
         |                 THEN 1 ELSE -1 END AS s
         |          FROM range(0,32) t(j), range(1,65) u(pos)),
         |proj AS (SELECT e.vec_id, s.j, CAST(SUM(e.q * s.s) AS BIGINT) AS p
         |         FROM exq e JOIN signs s ON s.pos = e.pos GROUP BY 1, 2),
         |tdots AS (SELECT q.vec_id AS query_id, e.vec_id,
         |            CAST(SUM(q.q*e.q) AS BIGINT) AS dot
         |          FROM exq q JOIN exq e
         |            ON q.pos = e.pos AND q.vec_id < 8 AND e.vec_id <> q.vec_id
         |          GROUP BY 1, 2),
         |tcos AS (SELECT d.query_id, d.vec_id,
         |           CAST(d.dot AS DOUBLE) /
         |             (SQRT(CAST(nq.n2 AS DOUBLE))
         |              * SQRT(CAST(ne.n2 AS DOUBLE))) AS cos_exact
         |         FROM tdots d JOIN norms nq ON d.query_id = nq.vec_id
         |                      JOIN norms ne ON d.vec_id = ne.vec_id),
         |dims AS (SELECT UNNEST([8, 32]) AS d),
         |pnorm AS (SELECT m.d, p.vec_id, CAST(SUM(p.p*p.p) AS BIGINT) AS pn2
         |          FROM proj p JOIN dims m ON p.j < m.d GROUP BY 1, 2),
         |pdots AS (SELECT m.d, q.vec_id AS query_id, e.vec_id,
         |            CAST(SUM(q.p*e.p) AS BIGINT) AS dot
         |          FROM proj q JOIN dims m ON q.j < m.d
         |                      JOIN proj e ON q.j = e.j
         |          WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id
         |          GROUP BY 1, 2, 3),
         |errs AS (SELECT d.d, d.query_id, d.vec_id,
         |           ABS(CAST(d.dot AS DOUBLE) /
         |               (SQRT(CAST(nq.pn2 AS DOUBLE))
         |                * SQRT(CAST(ne.pn2 AS DOUBLE)))
         |             - t.cos_exact) AS err
         |         FROM pdots d
         |         JOIN pnorm nq ON nq.d = d.d AND d.query_id = nq.vec_id
         |         JOIN pnorm ne ON ne.d = d.d AND d.vec_id = ne.vec_id
         |         JOIN tcos t ON t.query_id = d.query_id
         |                    AND t.vec_id = d.vec_id),
         |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY d, query_id
         |           ORDER BY err, vec_id) AS rn,
         |          COUNT(*) OVER (PARTITION BY d, query_id) AS n
         |        FROM errs)
         |SELECT query_id, CAST(d AS INT) AS proj_dims,
         |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |       MAX(err) AS max_err,
         |       MAX(CASE WHEN rn = (n+1)//2 THEN err END) AS p50_err,
         |       MAX(CASE WHEN rn = (9*n+9)//10 THEN err END) AS p90_err
         |FROM rk GROUP BY query_id, d
         |ORDER BY query_id, proj_dims""".stripMargin,
    "x10l_knn_join" ->
      s"""WITH $vecCtes,
         |hyp AS (SELECT j, pos,
         |          2*((1103515245*(j*64+pos)+12345) % 1000003) - 1000003 AS wnum
         |        FROM range(0,16) t(j), range(1,65) r(pos)),
         |proj AS (SELECT e.vec_id, h.j, CAST(SUM(e.q*h.wnum) AS BIGINT) AS p
         |         FROM exq e JOIN hyp h ON e.pos = h.pos GROUP BY 1, 2),
         |buck AS (SELECT vec_id, j//8 AS band,
         |           CAST(SUM(CASE WHEN p >= 0
         |               THEN (CAST(1 AS BIGINT) << CAST(j%8 AS INT))
         |               ELSE 0 END) AS BIGINT) AS bandkey
         |         FROM proj GROUP BY vec_id, j//8),
         |cand AS (SELECT DISTINCT x.vec_id AS src_id, y.vec_id AS nbr_id
         |         FROM buck x JOIN buck y
         |           ON x.band = y.band AND x.bandkey = y.bandkey
         |          AND y.vec_id <> x.vec_id),
         |dots AS (SELECT c.src_id, c.nbr_id,
         |           CAST(SUM(sd.q*nd.q) AS BIGINT) AS dot
         |         FROM cand c
         |         JOIN exq sd ON sd.vec_id = c.src_id
         |         JOIN exq nd ON nd.vec_id = c.nbr_id AND nd.pos = sd.pos
         |         GROUP BY 1, 2),
         |cosv AS (SELECT d.src_id, d.nbr_id,
         |           CAST(d.dot AS DOUBLE) /
         |             (SQRT(CAST(ns.n2 AS DOUBLE))*SQRT(CAST(nn.n2 AS DOUBLE))) AS cosine
         |         FROM dots d JOIN norms ns ON d.src_id = ns.vec_id
         |                     JOIN norms nn ON d.nbr_id = nn.vec_id),
         |rk AS (SELECT src_id, nbr_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY src_id
         |           ORDER BY cosine DESC, nbr_id) AS rkn FROM cosv)
         |SELECT src_id, CAST(rkn AS INT) AS rnk, nbr_id, cosine
         |FROM rk WHERE rkn <= 3 ORDER BY src_id, rnk""".stripMargin,
    // x11r: utf8proc's nfc_normalize replays java.text.Normalizer —
    // the injected combining marks must compose to identical bytes on
    // both engines for the sha256 to match.
    "x11r_unicode_canon" ->
      """SELECT doc_id,
        |       CAST(length(deco) - length(text) AS INT) AS n_marks,
        |       CAST(length(nfc_normalize(lower(deco))) AS INT) AS canon_len,
        |       sha256(nfc_normalize(lower(deco))) AS canon_hash
        |FROM (SELECT doc_id, text,
        |        replace(text, 'e', 'e' || chr(769)) AS deco
        |      FROM documents) s
        |ORDER BY doc_id""".stripMargin,
    "x11a_lang_id" ->
      """SELECT doc_id, actual_lang, score_en, score_es, score_de, score_fr,
        |       score_zh,
        |       CASE WHEN score_en>=score_es AND score_en>=score_de
        |                 AND score_en>=score_fr AND score_en>=score_zh THEN 'en'
        |            WHEN score_es>=score_de AND score_es>=score_fr
        |                 AND score_es>=score_zh THEN 'es'
        |            WHEN score_de>=score_fr AND score_de>=score_zh THEN 'de'
        |            WHEN score_fr>=score_zh THEN 'fr'
        |            ELSE 'zh' END AS predicted
        |FROM (SELECT doc_id, lang AS actual_lang,
        |        CAST(len(list_filter(string_split(text,' '), t -> t='the'))
        |           + len(list_filter(string_split(text,' '), t -> t='a')) AS INT) AS score_en,
        |        CAST(len(list_filter(string_split(text,' '), t -> t='data'))
        |           + len(list_filter(string_split(text,' '), t -> t='table')) AS INT) AS score_es,
        |        CAST(len(list_filter(string_split(text,' '), t -> t='window'))
        |           + len(list_filter(string_split(text,' '), t -> t='row')) AS INT) AS score_de,
        |        CAST(len(list_filter(string_split(text,' '), t -> t='filter'))
        |           + len(list_filter(string_split(text,' '), t -> t='stream')) AS INT) AS score_fr,
        |        CAST(len(list_filter(string_split(text,' '), t -> t='spark'))
        |           + len(list_filter(string_split(text,' '), t -> t='query')) AS INT) AS score_zh
        |      FROM documents) s
        |ORDER BY doc_id""".stripMargin,
    "x11b_quality_score" ->
      """SELECT doc_id, n_tokens, n_distinct, len_chars,
        |       n_distinct/n_tokens AS ttr,
        |       (len_chars - (n_tokens - 1))/n_tokens AS avg_tok_len,
        |       n_stop/n_tokens AS stop_ratio,
        |       CASE WHEN n_tokens >= 20 AND n_distinct/n_tokens >= 0.25
        |            THEN 1 ELSE 0 END AS keep
        |FROM (SELECT doc_id,
        |        CAST(len(string_split(text,' ')) AS INT) AS n_tokens,
        |        CAST(len(list_distinct(string_split(text,' '))) AS INT) AS n_distinct,
        |        CAST(length(text) AS INT) AS len_chars,
        |        CAST(len(list_filter(string_split(text,' '), t -> t='the'))
        |           + len(list_filter(string_split(text,' '), t -> t='a')) AS INT) AS n_stop
        |      FROM documents) s
        |ORDER BY doc_id""".stripMargin,
    "x11c_token_stats" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text,' ')) AS INT) AS n_tokens,
        |       CAST(len(list_distinct(string_split(text,' '))) AS INT) AS n_distinct,
        |       CAST(length(text) AS INT) AS n_chars,
        |       CAST(CEIL(length(text)/4.0) AS BIGINT) AS est_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x11e_tfidf" ->
      s"""WITH $toks,
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |s AS (SELECT tf.doc_id, tf.tok, tf.tf, dfq.df,
         |        CAST(tf.tf * n.n_docs AS DOUBLE)/dfq.df AS score
         |      FROM tf JOIN dfq USING (tok), n),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |        ORDER BY score DESC, tok) AS rnk FROM s)
         |SELECT doc_id, CAST(rnk AS INT) AS rnk, tok, tf, df, score
         |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    // BM25 with k1=1.2, b=0.75 multiplied out to exact integers (see
    // TextAnalysis.bm25Top): one IEEE division per row, log deferred.
    "x11l_bm25" ->
      s"""WITH $toks,
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |dln AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
         |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
         |g AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         |             (SELECT COUNT(*) FROM toks) AS t_total),
         |s AS (SELECT tf.tok, tf.doc_id, tf.tf, dln.dl, dfq.df,
         |        CAST(44*tf.tf*g.t_total*(2*g.n_docs - 2*dfq.df + 1) AS DOUBLE)
         |        / CAST((20*tf.tf*g.t_total + 6*g.t_total
         |                + 18*dln.dl*g.n_docs)*(2*dfq.df + 1) AS DOUBLE)
         |          AS score
         |      FROM tf JOIN dln USING (doc_id) JOIN dfq USING (tok), g),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY tok
         |        ORDER BY score DESC, doc_id) AS rnk FROM s)
         |SELECT tok, CAST(rnk AS INT) AS rnk, doc_id, tf, dl, df, score
         |FROM r WHERE rnk <= 3 ORDER BY tok, rnk""".stripMargin,
    "x10c_label_centroids" ->
      """WITH ex AS (SELECT label, unnest(range(1,65)) AS pos,
        |              unnest(embedding) AS vf FROM embeddings),
        |exq AS (SELECT label, pos,
        |          CAST(ROUND(CAST(vf AS DOUBLE)*1000000) AS BIGINT) AS q FROM ex)
        |SELECT label, pos, COUNT(*) AS n_vecs,
        |       CAST(SUM(q) AS DOUBLE)/COUNT(*)/1e6 AS centroid
        |FROM exq GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "x11g_chunking" ->
      s"""WITH $toks,
         |nn AS (SELECT doc_id, MAX(ord) AS n FROM toks GROUP BY doc_id),
         |starts AS (SELECT doc_id, n, unnest(range(1, n + 1, 96)) AS start
         |           FROM nn),
         |chunks AS (SELECT s.doc_id, (s.start - 1)//96 + 1 AS chunk_idx,
         |             s.start, LEAST(128, s.n - s.start + 1) AS n_tokens,
         |             ${polyHash("string_agg(t.tok, ' ' ORDER BY t.ord)")}
         |               AS chunk_hash
         |           FROM starts s JOIN toks t ON t.doc_id = s.doc_id
         |             AND t.ord >= s.start AND t.ord < s.start + 128
         |           GROUP BY s.doc_id, s.start, s.n)
         |SELECT doc_id, chunk_idx, start, n_tokens, chunk_hash
         |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin,
    "x09h_contamination" ->
      s"""WITH $toks,
         |$ngramPairCtes,
         |sp AS (SELECT doc_id,
         |         CASE WHEN ((doc_id * 2654435761) % 2147483647) % 10 < 8
         |                THEN 'train'
         |              WHEN ((doc_id * 2654435761) % 2147483647) % 10 = 8
         |                THEN 'valid'
         |              ELSE 'test' END AS split
         |       FROM documents)
         |SELECT sa.split AS split_a, sb.split AS split_b, COUNT(*) AS n_pairs
         |FROM npairs p JOIN sp sa ON p.doc_a = sa.doc_id
         |              JOIN sp sb ON p.doc_b = sb.doc_id
         |GROUP BY 1, 2 ORDER BY split_a, split_b""".stripMargin,
    // Decontamination: width-8 gram ids, test-split gram set, per-train-
    // doc hit counts (HUGEINT sums pinned back to BIGINT for Spark).
    "x09m_benchmark_decontam" ->
      s"""WITH $toks,
         |${gramCtesOf(8)},
         |sp AS (SELECT doc_id,
         |         CASE WHEN ((doc_id * 2654435761) % 2147483647) % 10 < 8
         |                THEN 'train'
         |              WHEN ((doc_id * 2654435761) % 2147483647) % 10 = 8
         |                THEN 'valid'
         |              ELSE 'test' END AS split
         |       FROM documents),
         |bench AS (SELECT DISTINCT gid FROM grams0 g
         |          JOIN sp ON g.doc_id = sp.doc_id WHERE sp.split = 'test'),
         |tr AS (SELECT g.doc_id, g.gid FROM grams0 g
         |       JOIN sp ON g.doc_id = sp.doc_id WHERE sp.split = 'train')
         |SELECT t.doc_id, COUNT(*) AS n_grams,
         |       CAST(SUM(CASE WHEN b.gid IS NOT NULL THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_hit_grams
         |FROM tr t LEFT JOIN bench b ON t.gid = b.gid
         |GROUP BY t.doc_id
         |HAVING SUM(CASE WHEN b.gid IS NOT NULL THEN 1 ELSE 0 END) > 0
         |ORDER BY t.doc_id""".stripMargin,
    "x11f_clean_text" ->
      """SELECT doc_id,
        |       CAST(length(clean) AS INT) AS clean_len,
        |       CAST(len(string_split(clean, ' ')) AS INT) AS n_clean_tokens,
        |       sha256(clean) AS clean_hash
        |FROM (SELECT doc_id,
        |        trim(regexp_replace(regexp_replace(lower(text),
        |          '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean
        |      FROM documents) s
        |ORDER BY doc_id""".stripMargin,
    "x10d_nearest_centroid" ->
      """WITH ex AS (SELECT vec_id, label, unnest(range(1,65)) AS pos,
        |              unnest(embedding) AS vf FROM embeddings),
        |exq AS (SELECT vec_id, label, pos,
        |          CAST(ROUND(CAST(vf AS DOUBLE)*1000000) AS BIGINT) AS q FROM ex),
        |cent AS (SELECT label AS c_label, pos, CAST(SUM(q) AS BIGINT) AS s,
        |           COUNT(*) AS n
        |         FROM exq GROUP BY label, pos),
        |sc AS (SELECT e.vec_id, e.label AS true_label, c.c_label AS label, c.n,
        |         CAST(SUM(e.q * c.s) AS BIGINT) AS num
        |       FROM exq e JOIN cent c ON e.pos = c.pos
        |       GROUP BY 1, 2, 3, 4),
        |scored AS (SELECT vec_id, true_label, label,
        |             CAST(num AS DOUBLE)/n AS score FROM sc),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |        ORDER BY score DESC, label) AS rnk FROM scored)
        |SELECT true_label, label AS predicted_label, COUNT(*) AS n_vecs
        |FROM r WHERE rnk = 1
        |GROUP BY 1, 2 ORDER BY true_label, predicted_label""".stripMargin,
    // SemDeDup: k-means cells (trajectory CTEs above), assignment with
    // retained centroid score, per-cell centrality rank, and the
    // upper-triangular within-cell cosine drop rule — integer dots,
    // trailing IEEE divisions only, so kept flags replay exactly.
    "x09l_semantic_dedup" ->
      s"""WITH $vecCtes,
         |$kmeansCtes,
         |sc3 AS (SELECT e.vec_id, c.cell, c.n, CAST(SUM(e.q*c.s) AS BIGINT) AS num
         |        FROM exq e JOIN c2 c ON e.pos = c.pos GROUP BY 1, 2, 3),
         |a3 AS (SELECT vec_id, cell, cs FROM
         |         (SELECT vec_id, cell, CAST(num AS DOUBLE)/n AS cs,
         |            ROW_NUMBER() OVER (PARTITION BY vec_id
         |              ORDER BY CAST(num AS DOUBLE)/n DESC, cell) AS rnk FROM sc3)
         |       WHERE rnk = 1),
         |ranked AS (SELECT vec_id, cell,
         |             ROW_NUMBER() OVER (PARTITION BY cell
         |               ORDER BY cs DESC, vec_id) AS crnk FROM a3),
         |pairs AS (SELECT x.vec_id AS va, y.vec_id AS vb
         |          FROM ranked x JOIN ranked y
         |            ON x.cell = y.cell AND x.crnk < y.crnk),
         |pdots AS (SELECT p.va, p.vb, CAST(SUM(ea.q*eb.q) AS BIGINT) AS dot
         |          FROM pairs p JOIN exq ea ON ea.vec_id = p.va
         |                       JOIN exq eb ON eb.vec_id = p.vb AND eb.pos = ea.pos
         |          GROUP BY 1, 2),
         |dup AS (SELECT DISTINCT d.vb AS vec_id
         |        FROM pdots d JOIN norms na ON d.va = na.vec_id
         |                     JOIN norms nb ON d.vb = nb.vec_id
         |        WHERE CAST(d.dot AS DOUBLE) /
         |          (SQRT(CAST(na.n2 AS DOUBLE))*SQRT(CAST(nb.n2 AS DOUBLE))) >= 0.45)
         |SELECT r.vec_id, r.cell,
         |       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
         |FROM ranked r LEFT JOIN dup d ON r.vec_id = d.vec_id
         |ORDER BY r.vec_id""".stripMargin,
    // Lloyd's k-means, iterations UNROLLED as CTE pairs (score+argmax →
    // rebuild): every compare is on exact integers or on doubles formed
    // identically from them, and the argmax tiebreak is total, so the
    // whole trajectory replays bit-for-bit.
    "x10g_kmeans_cells" ->
      s"""WITH $vecCtes,
         |$kmeansCtes
         |SELECT cell, pos, n AS n_vecs, CAST(s AS DOUBLE)/n/1e6 AS centroid
         |FROM c2 ORDER BY cell, pos""".stripMargin,
    // IVF probing over the LEARNED codebook: the x10g k-means trajectory
    // (CTEs above) produces the cells; assignment/probe/score replay
    // x10e's pipeline against c2 instead of the label centroids.
    "x10e2_ivf_learned" ->
      s"""WITH $vecCtes,
         |$kmeansCtes,
         |$ivfCandCtes,
         |dots AS (SELECT c.query_id, c.vec_id, CAST(SUM(qd.q*ed.q) AS BIGINT) AS dot
         |         FROM cand c
         |         JOIN exq qd ON qd.vec_id = c.query_id
         |         JOIN exq ed ON ed.vec_id = c.vec_id AND ed.pos = qd.pos
         |         GROUP BY 1, 2),
         |cosv AS (SELECT d.query_id, d.vec_id,
         |           CAST(d.dot AS DOUBLE) /
         |             (SQRT(CAST(nq.n2 AS DOUBLE))*SQRT(CAST(ne.n2 AS DOUBLE))) AS cosine
         |         FROM dots d JOIN norms nq ON d.query_id = nq.vec_id
         |                     JOIN norms ne ON d.vec_id = ne.vec_id),
         |rk AS (SELECT query_id, vec_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY cosine DESC, vec_id) AS rkn FROM cosv)
         |SELECT query_id, CAST(rkn AS INT) AS rnk, vec_id, cosine
         |FROM rk WHERE rkn <= 3 ORDER BY query_id, rnk""".stripMargin,
    // IVF-PQ: candidates from the learned-codebook IVF chain, scored by
    // the PQ ADC partials — the composition of the two trajectories.
    "x10i_ivfpq" ->
      s"""WITH $vecCtes,
         |$kmeansCtes,
         |$ivfCandCtes,
         |$pqCtes,
         |adcu AS (SELECT * FROM adc_0 UNION ALL SELECT * FROM adc_1
         |         UNION ALL SELECT * FROM adc_2 UNION ALL SELECT * FROM adc_3),
         |adc AS (SELECT a.query_id, a.vec_id, CAST(SUM(a.d) AS BIGINT) AS adc_dist
         |        FROM adcu a JOIN cand c
         |          ON a.query_id = c.query_id AND a.vec_id = c.vec_id
         |        GROUP BY 1, 2),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY adc_dist, vec_id) AS rnk FROM adc)
         |SELECT query_id, CAST(rnk AS INT) AS rnk, vec_id, adc_dist
         |FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,
    // PQ + asymmetric distance: four independent subspace trajectories
    // (pqSubCtes) union their ADC partials; all-integer output.
    "x10h_pq_adc" ->
      s"""WITH $vecCtes,
         |$pqCtes,
         |adcu AS (SELECT * FROM adc_0 UNION ALL SELECT * FROM adc_1
         |         UNION ALL SELECT * FROM adc_2 UNION ALL SELECT * FROM adc_3),
         |adc AS (SELECT query_id, vec_id, CAST(SUM(d) AS BIGINT) AS adc_dist
         |        FROM adcu WHERE vec_id <> query_id GROUP BY 1, 2),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY adc_dist, vec_id) AS rnk FROM adc)
         |SELECT query_id, CAST(rnk AS INT) AS rnk, vec_id, adc_dist
         |FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,
    // Recall@3 certification: brute-force truth (x10a chain, cut at 3),
    // each ANN method's top-3 (the x10b / x10e2 / x10i chains verbatim,
    // CTE names prefixed), exact intersection counts.
    "x10j_ann_recall" ->
      s"""WITH $vecCtes,
         |tdots AS (SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         |            CAST(SUM(q.q*e.q) AS BIGINT) AS dot
         |          FROM exq q JOIN exq e
         |            ON q.pos = e.pos AND q.vec_id < 8 AND e.vec_id <> q.vec_id
         |          GROUP BY 1, 2),
         |tcos AS (SELECT d.query_id, d.vec_id,
         |           CAST(d.dot AS DOUBLE) /
         |             (SQRT(CAST(nq.n2 AS DOUBLE))*SQRT(CAST(ne.n2 AS DOUBLE))) AS cosine
         |         FROM tdots d JOIN norms nq ON d.query_id = nq.vec_id
         |                      JOIN norms ne ON d.vec_id = ne.vec_id),
         |trk AS (SELECT query_id, vec_id,
         |          ROW_NUMBER() OVER (PARTITION BY query_id
         |            ORDER BY cosine DESC, vec_id) AS rkn FROM tcos),
         |truth AS (SELECT query_id, vec_id FROM trk WHERE rkn <= 3),
         |$kmeansCtes,
         |$ivfCandCtes,
         |idots AS (SELECT c.query_id, c.vec_id, CAST(SUM(qd.q*ed.q) AS BIGINT) AS dot
         |          FROM cand c
         |          JOIN exq qd ON qd.vec_id = c.query_id
         |          JOIN exq ed ON ed.vec_id = c.vec_id AND ed.pos = qd.pos
         |          GROUP BY 1, 2),
         |icos AS (SELECT d.query_id, d.vec_id,
         |           CAST(d.dot AS DOUBLE) /
         |             (SQRT(CAST(nq.n2 AS DOUBLE))*SQRT(CAST(ne.n2 AS DOUBLE))) AS cosine
         |         FROM idots d JOIN norms nq ON d.query_id = nq.vec_id
         |                      JOIN norms ne ON d.vec_id = ne.vec_id),
         |irk AS (SELECT query_id, vec_id,
         |          ROW_NUMBER() OVER (PARTITION BY query_id
         |            ORDER BY cosine DESC, vec_id) AS rkn FROM icos),
         |m_ivf AS (SELECT query_id, vec_id FROM irk WHERE rkn <= 3),
         |$pqCtes,
         |adcu AS (SELECT * FROM adc_0 UNION ALL SELECT * FROM adc_1
         |         UNION ALL SELECT * FROM adc_2 UNION ALL SELECT * FROM adc_3),
         |padc AS (SELECT a.query_id, a.vec_id, CAST(SUM(a.d) AS BIGINT) AS adc_dist
         |         FROM adcu a JOIN cand c
         |           ON a.query_id = c.query_id AND a.vec_id = c.vec_id
         |         GROUP BY 1, 2),
         |prk AS (SELECT query_id, vec_id,
         |          ROW_NUMBER() OVER (PARTITION BY query_id
         |            ORDER BY adc_dist, vec_id) AS rkn FROM padc),
         |m_ivfpq AS (SELECT query_id, vec_id FROM prk WHERE rkn <= 3),
         |hyp AS (SELECT j, pos,
         |          2*((1103515245*(j*64+pos)+12345) % 1000003) - 1000003 AS wnum
         |        FROM range(0,16) t(j), range(1,65) r(pos)),
         |proj AS (SELECT e.vec_id, h.j, CAST(SUM(e.q*h.wnum) AS BIGINT) AS p
         |         FROM exq e JOIN hyp h ON e.pos = h.pos GROUP BY 1, 2),
         |buck AS (SELECT vec_id, j//8 AS band,
         |           CAST(SUM(CASE WHEN p >= 0
         |               THEN (CAST(1 AS BIGINT) << CAST(j%8 AS INT))
         |               ELSE 0 END) AS BIGINT) AS bandkey
         |         FROM proj GROUP BY vec_id, j//8),
         |lcand AS (SELECT DISTINCT q.vec_id AS query_id, e.vec_id AS vec_id
         |          FROM buck q JOIN buck e
         |            ON q.band = e.band AND q.bandkey = e.bandkey
         |           AND q.vec_id < 8 AND e.vec_id <> q.vec_id),
         |ldots AS (SELECT c.query_id, c.vec_id,
         |            CAST(SUM(qd.q*ed.q) AS BIGINT) AS dot
         |          FROM lcand c
         |          JOIN exq qd ON qd.vec_id = c.query_id
         |          JOIN exq ed ON ed.vec_id = c.vec_id AND ed.pos = qd.pos
         |          GROUP BY 1, 2),
         |lcos AS (SELECT d.query_id, d.vec_id,
         |           CAST(d.dot AS DOUBLE) /
         |             (SQRT(CAST(nq.n2 AS DOUBLE))*SQRT(CAST(ne.n2 AS DOUBLE))) AS cosine
         |         FROM ldots d JOIN norms nq ON d.query_id = nq.vec_id
         |                      JOIN norms ne ON d.vec_id = ne.vec_id),
         |lrk AS (SELECT query_id, vec_id,
         |          ROW_NUMBER() OVER (PARTITION BY query_id
         |            ORDER BY cosine DESC, vec_id) AS rkn FROM lcos),
         |m_lsh AS (SELECT query_id, vec_id FROM lrk WHERE rkn <= 3)
         |SELECT method, hits, denom FROM (
         |  SELECT 'ivf_learned' AS method,
         |         (SELECT COUNT(*) FROM m_ivf m JOIN truth t
         |            ON m.query_id = t.query_id AND m.vec_id = t.vec_id) AS hits,
         |         (SELECT COUNT(*) FROM truth) AS denom
         |  UNION ALL
         |  SELECT 'ivfpq',
         |         (SELECT COUNT(*) FROM m_ivfpq m JOIN truth t
         |            ON m.query_id = t.query_id AND m.vec_id = t.vec_id),
         |         (SELECT COUNT(*) FROM truth)
         |  UNION ALL
         |  SELECT 'lsh',
         |         (SELECT COUNT(*) FROM m_lsh m JOIN truth t
         |            ON m.query_id = t.query_id AND m.vec_id = t.vec_id),
         |         (SELECT COUNT(*) FROM truth)
         |) ORDER BY method""".stripMargin,
    // Incremental IVF maintenance: the oracle replays the CERTIFYING
    // property — a FULL reassignment of every vector against the
    // codebook trained on the historical (pre-threshold) corpus must
    // equal the Spark side's snapshot-composed incremental result.
    "x10k_incremental_ivf" ->
      s"""WITH $vecCtes,
         |thr AS (SELECT MAX(vec_id)+1 - (MAX(vec_id)+1)//4 AS t FROM embeddings),
         |exb AS (SELECT e.vec_id, e.pos, e.q FROM exq e, thr WHERE e.vec_id < thr.t),
         |${kmeansCtesOn("exb",
             "(SELECT COUNT(*) FROM embeddings, thr WHERE vec_id < thr.t)")},
         |sca AS (SELECT e.vec_id, c.cell, c.n, CAST(SUM(e.q*c.s) AS BIGINT) AS num
         |        FROM exq e JOIN c2 c ON e.pos = c.pos GROUP BY 1, 2, 3)
         |SELECT vec_id, cell FROM
         |  (SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |     ORDER BY CAST(num AS DOUBLE)/n DESC, cell) AS rnk FROM sca)
         |WHERE rnk = 1 ORDER BY vec_id""".stripMargin,
    "x10e_ivf_topk" ->
      """WITH ex AS (SELECT vec_id, label, unnest(range(1,65)) AS pos,
        |              unnest(embedding) AS vf FROM embeddings),
        |exq AS (SELECT vec_id, label, pos,
        |          CAST(ROUND(CAST(vf AS DOUBLE)*1000000) AS BIGINT) AS q FROM ex),
        |norms AS (SELECT vec_id, CAST(SUM(q*q) AS BIGINT) AS n2
        |          FROM exq GROUP BY vec_id),
        |cent AS (SELECT label AS cell, pos, CAST(SUM(q) AS BIGINT) AS s,
        |           COUNT(*) AS n
        |         FROM exq GROUP BY label, pos),
        |sc AS (SELECT e.vec_id, c.cell, c.n, CAST(SUM(e.q*c.s) AS BIGINT) AS num
        |       FROM exq e JOIN cent c ON e.pos = c.pos GROUP BY 1, 2, 3),
        |cs AS (SELECT vec_id, cell, CAST(num AS DOUBLE)/n AS cellscore FROM sc),
        |assign AS (SELECT vec_id, cell FROM
        |             (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |                ORDER BY cellscore DESC, cell) AS rnk FROM cs)
        |           WHERE rnk = 1),
        |probes AS (SELECT vec_id AS query_id, cell FROM
        |             (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |                ORDER BY cellscore DESC, cell) AS rnk
        |              FROM cs WHERE vec_id < 8)
        |           WHERE rnk <= 2),
        |cand AS (SELECT DISTINCT p.query_id, a.vec_id
        |         FROM probes p JOIN assign a
        |           ON p.cell = a.cell AND a.vec_id <> p.query_id),
        |dots AS (SELECT c.query_id, c.vec_id, CAST(SUM(qd.q*ed.q) AS BIGINT) AS dot
        |         FROM cand c
        |         JOIN exq qd ON qd.vec_id = c.query_id
        |         JOIN exq ed ON ed.vec_id = c.vec_id AND ed.pos = qd.pos
        |         GROUP BY 1, 2),
        |cosv AS (SELECT d.query_id, d.vec_id,
        |           CAST(d.dot AS DOUBLE) /
        |             (SQRT(CAST(nq.n2 AS DOUBLE))*SQRT(CAST(ne.n2 AS DOUBLE))) AS cosine
        |         FROM dots d JOIN norms nq ON d.query_id = nq.vec_id
        |                     JOIN norms ne ON d.vec_id = ne.vec_id),
        |rk AS (SELECT query_id, vec_id, cosine,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |           ORDER BY cosine DESC, vec_id) AS rkn FROM cosv)
        |SELECT query_id, CAST(rkn AS INT) AS rnk, vec_id, cosine
        |FROM rk WHERE rkn <= 3 ORDER BY query_id, rnk""".stripMargin,
    "x10f_class_separation" ->
      s"""WITH exl AS (SELECT vec_id, label, unnest(range(1,65)) AS pos,
         |               unnest(embedding) AS vf
         |             FROM embeddings WHERE vec_id < 64),
         |exq AS (SELECT vec_id, label, pos,
         |          CAST(ROUND(CAST(vf AS DOUBLE)*1000000) AS BIGINT) AS q
         |        FROM exl),
         |norms AS (SELECT vec_id, CAST(SUM(q*q) AS BIGINT) AS n2
         |          FROM exq GROUP BY vec_id),
         |lbl AS (SELECT DISTINCT vec_id, label FROM exl),
         |dots AS (SELECT a.vec_id AS va, b.vec_id AS vb,
         |           CAST(SUM(a.q*b.q) AS BIGINT) AS dot
         |         FROM exq a JOIN exq b ON a.pos = b.pos AND a.vec_id < b.vec_id
         |         GROUP BY 1, 2),
         |pairs AS (SELECT CASE WHEN la.label = lb.label THEN 'same_label'
         |                 ELSE 'cross_label' END AS stratum,
         |            CAST(d.dot AS DOUBLE) /
         |              (SQRT(CAST(na.n2 AS DOUBLE))*SQRT(CAST(nb.n2 AS DOUBLE)))
         |              AS cosine
         |          FROM dots d
         |          JOIN lbl la ON d.va = la.vec_id
         |          JOIN lbl lb ON d.vb = lb.vec_id
         |          JOIN norms na ON d.va = na.vec_id
         |          JOIN norms nb ON d.vb = nb.vec_id)
         |SELECT stratum, COUNT(*) AS n_pairs,
         |       CAST(SUM(CASE WHEN cosine >= 0.2 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_above_threshold,
         |       MIN(cosine) AS min_cosine, MAX(cosine) AS max_cosine
         |FROM pairs GROUP BY stratum ORDER BY stratum""".stripMargin,
    "x17b_stratified_sample" ->
      """SELECT lang, COUNT(*) AS n_total,
        |       CAST(SUM(kept) AS BIGINT) AS n_kept,
        |       CAST(SUM(kept * n_chars) AS BIGINT) AS kept_chars,
        |       MIN(CASE WHEN kept = 1 THEN doc_id END) AS first_kept
        |FROM (SELECT doc_id, lang, n_chars,
        |        CASE WHEN ((doc_id * 2654435761) % 2147483647) % 1000 <
        |          CASE lang WHEN 'en' THEN 250 WHEN 'de' THEN 500
        |                    WHEN 'es' THEN 500 WHEN 'fr' THEN 500
        |                    WHEN 'zh' THEN 500 ELSE 0 END
        |        THEN 1 ELSE 0 END AS kept
        |      FROM documents) s
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "x09j_edit_distance" ->
      s"""WITH $simhashCtes,
         |hp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(bit_count(xor(a.simhash_lo, b.simhash_lo))
         |            + bit_count(xor(a.simhash_hi, b.simhash_hi)) AS INT)
         |           AS hamming
         |       FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |       WHERE bit_count(xor(a.simhash_lo, b.simhash_lo))
         |           + bit_count(xor(a.simhash_hi, b.simhash_hi)) <= 3
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY a.doc_id
         |         ORDER BY bit_count(xor(a.simhash_lo, b.simhash_lo))
         |                + bit_count(xor(a.simhash_hi, b.simhash_hi)),
         |                  b.doc_id) <= 8)
         |SELECT hp.doc_a, hp.doc_b, hp.hamming,
         |       CAST(levenshtein(da.text, db.text) AS INT) AS edit_dist,
         |       CAST(levenshtein(da.text, db.text) AS DOUBLE)
         |         / GREATEST(length(da.text), length(db.text), 1) AS edit_ratio
         |FROM hp JOIN documents da ON hp.doc_a = da.doc_id
         |        JOIN documents db ON hp.doc_b = db.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,
    "x11h_repetition" ->
      s"""WITH $toks,
         |g AS (SELECT a.doc_id, a.tok||' '||b.tok AS gram
         |      FROM toks a JOIN toks b ON a.doc_id=b.doc_id AND b.ord=a.ord+1),
         |c AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         |       COUNT(*) AS n_distinct_bigrams,
         |       CAST(SUM(c) - COUNT(*) AS DOUBLE)/CAST(SUM(c) AS DOUBLE)
         |         AS dup_fraction,
         |       CAST(MAX(c) AS BIGINT) AS max_repeat
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x09i_chunk_dedup" ->
      s"""WITH $toks,
         |nn AS (SELECT doc_id, MAX(ord) AS n FROM toks GROUP BY doc_id),
         |starts AS (SELECT doc_id, unnest(range(1, n + 1, 16)) AS start
         |           FROM nn),
         |blocks AS (SELECT s.doc_id, s.start,
         |             ${polyHash("string_agg(t.tok, ' ' ORDER BY t.ord)")}
         |               AS bh
         |           FROM starts s JOIN toks t ON t.doc_id = s.doc_id
         |             AND t.ord >= s.start AND t.ord < s.start + 16
         |           GROUP BY s.doc_id, s.start),
         |occ AS (SELECT bh, COUNT(*) AS occ FROM blocks GROUP BY bh)
         |SELECT b.doc_id, COUNT(*) AS n_blocks,
         |       CAST(SUM(CASE WHEN o.occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_dup_blocks,
         |       CAST(SUM(CASE WHEN o.occ > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |         / COUNT(*) AS dup_ratio
         |FROM blocks b JOIN occ o ON b.bh = o.bh
         |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin,
    "x11i_pii_redaction" ->
      """WITH p AS (SELECT doc_id, text ||
        |             CASE WHEN doc_id % 5 = 0
        |                    THEN ' contact user'||doc_id||'@example.com'
        |                  WHEN doc_id % 5 = 1
        |                    THEN ' call 555-'||lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |                  WHEN doc_id % 5 = 2
        |                    THEN ' host 10.0.'||(doc_id % 256)||'.7'
        |                  ELSE '' END AS pii_text
        |           FROM documents),
        |r AS (SELECT doc_id, pii_text,
        |        regexp_replace(regexp_replace(regexp_replace(pii_text,
        |          '[a-z0-9]+@[a-z0-9.]+\.[a-z]+', '[EMAIL]', 'g'),
        |          '555-[0-9]{4}', '[PHONE]', 'g'),
        |          '10\.[0-9]+\.[0-9]+\.[0-9]+', '[IP]', 'g') AS redacted
        |      FROM p)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(pii_text,
        |         '[a-z0-9]+@[a-z0-9.]+\.[a-z]+')) AS INT) AS n_emails,
        |       CAST(len(regexp_extract_all(pii_text,
        |         '555-[0-9]{4}')) AS INT) AS n_phones,
        |       CAST(len(regexp_extract_all(pii_text,
        |         '10\.[0-9]+\.[0-9]+\.[0-9]+')) AS INT) AS n_ips,
        |       CAST(length(redacted) AS INT) AS redacted_len,
        |       sha256(redacted) AS redacted_hash
        |FROM r ORDER BY doc_id""".stripMargin,
    "x11k_regex_tokens" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
        |       CAST(len(regexp_extract_all(text,
        |         '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_regex_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT)
        |         AS n_alpha_runs,
        |       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT)
        |         AS n_digit_runs
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x11d_fingerprint" ->
      s"""WITH $toks
         |SELECT t.doc_id,
         |       bit_xor((982451653*${polyHash("t.tok")} + 12345 + 40503*t.ord)
         |               % 2147483647)
         |         AS fingerprint,
         |       COUNT(*) AS n_tokens
         |FROM toks t
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // Vocab coverage: all-integer cum·100 ≥ pct·total probe (HUGEINT
    // window sums / MIN pinned back to BIGINT to match Spark's longs).
    "x11m_vocab_coverage" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |c AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY tok),
        |r AS (SELECT tok, n,
        |        ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rnk,
        |        CAST(SUM(n) OVER (ORDER BY n DESC, tok
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |      FROM c),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_tokens FROM c),
        |p(pct) AS (VALUES (50), (90), (95), (99))
        |SELECT p.pct, CAST(MIN(r.rnk) AS BIGINT) AS vocab_size,
        |       CAST(MIN_BY(r.cum, r.rnk) AS BIGINT) AS covered_tokens,
        |       MIN(tot.total_tokens) AS total_tokens
        |FROM r, tot, p
        |WHERE r.cum * 100 >= p.pct * tot.total_tokens
        |GROUP BY p.pct ORDER BY p.pct""".stripMargin,
    "x17c_source_quota" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
        |             ROW_NUMBER() OVER (PARTITION BY source
        |               ORDER BY (doc_id * 2654435761) % 2147483647, doc_id)
        |               AS rn
        |           FROM documents),
        |k AS (SELECT source, COUNT(*) AS n_kept,
        |             CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
        |             MIN(doc_id) AS first_kept
        |      FROM r WHERE rn <= 10 GROUP BY source),
        |t AS (SELECT source, COUNT(*) AS n_total FROM documents
        |      GROUP BY source)
        |SELECT t.source, t.n_total, k.n_kept, k.kept_chars, k.first_kept
        |FROM t JOIN k ON t.source = k.source
        |ORDER BY t.source""".stripMargin,
    // Temperature mixture: isqrt weights, exact-integer thresholds,
    // hash membership — note HUGEINT intermediates (DuckDB SUM/products)
    // never reach the output, so types still line up with Spark.
    "x17d_mixture_sample" ->
      """WITH d AS (SELECT doc_id,
        |             CASE WHEN CAST(SUBSTR(source, 4) AS INT) < 14 THEN 'web'
        |                  WHEN CAST(SUBSTR(source, 4) AS INT) < 18 THEN 'books'
        |                  ELSE 'code' END AS tier
        |           FROM documents),
        |counts AS (SELECT tier, COUNT(*) AS n_docs FROM d GROUP BY tier),
        |c2 AS (SELECT tier, n_docs,
        |         CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS isq
        |       FROM counts),
        |tot AS (SELECT CAST(SUM(isq) AS BIGINT) AS tot_isq FROM c2),
        |th AS (SELECT tier,
        |         LEAST(2147483647, (200 * isq * 2147483647)
        |           // (tot_isq * n_docs)) AS threshold
        |       FROM c2, tot)
        |SELECT d.tier, d.doc_id
        |FROM d JOIN th ON d.tier = th.tier
        |WHERE (d.doc_id * 2654435761) % 2147483647 < th.threshold
        |ORDER BY d.tier, d.doc_id""".stripMargin,
    // x09s: the near-dup pair graph attributed to source pairs —
    // replays the full pair pipeline, then two provenance joins
    "x09s_cross_source" ->
      s"""WITH $toks,
         |$ngramPairCtes,
         |att AS (SELECT LEAST(da.source, db.source) AS source_a,
         |               GREATEST(da.source, db.source) AS source_b,
         |               p.jaccard
         |        FROM npairs p
         |        JOIN documents da ON p.doc_a = da.doc_id
         |        JOIN documents db ON p.doc_b = db.doc_id)
         |SELECT source_a, source_b, COUNT(*) AS n_pairs,
         |       MAX(jaccard) AS max_jaccard
         |FROM att GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // x17f: the exact cross-multiplied Poisson inclusion test replayed
    // verbatim — u·Σw < n*·w·P, all BIGINT
    "x17f_weighted_sample" ->
      """WITH d AS (SELECT doc_id, source, n_chars,
        |             ((doc_id % 2147483647) * 1103515245) % 2147483647
        |               AS u
        |           FROM documents),
        |t AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS s_w,
        |             COUNT(*) // 5 AS n_star FROM d)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN u * t.s_w < t.n_star * n_chars * 2147483647
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN u * t.s_w < t.n_star * n_chars * 2147483647
        |    THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
        |  CAST(SUM(CASE WHEN t.n_star * n_chars >= t.s_w
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_certain
        |FROM d, t GROUP BY source ORDER BY source""".stripMargin,
    // Repeated-substring spans: stride-1 width-8 gram ids (char-level
    // content hash of the gram string), cross-doc repeated grams
    // (min<>max doc), islands interval merge (mirrors
    // Dedup.repeatedSpans).
    "x09n_repeated_spans" -> {
      val (cat, joins) = gramJoin(8)
      s"""WITH $toks,
         |g AS (SELECT a.doc_id, a.ord AS start, ${polyHash(cat)} AS gid
         |      FROM toks a $joins),
         |rep AS (SELECT gid FROM g GROUP BY gid
         |        HAVING MIN(doc_id) <> MAX(doc_id)),
         |sp AS (SELECT g.doc_id, g.start, g.start + 7 AS e
         |       FROM g JOIN rep USING (gid)),
         |wm AS (SELECT doc_id, start, e,
         |         MAX(e) OVER (PARTITION BY doc_id ORDER BY start
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         |       FROM sp),
         |f AS (SELECT doc_id, start, e,
         |        CASE WHEN pm IS NULL OR start > pm THEN 1 ELSE 0 END AS news
         |      FROM wm),
         |i AS (SELECT doc_id, start, e,
         |        CAST(SUM(news) OVER (PARTITION BY doc_id ORDER BY start
         |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS isl FROM f)
         |SELECT doc_id, MIN(start) AS span_start, MAX(e) AS span_end,
         |       MAX(e) - MIN(start) + 1 AS span_tokens,
         |       COUNT(*) AS n_grams
         |FROM i GROUP BY doc_id, isl ORDER BY doc_id, span_start""".stripMargin
    },
    // Span-scrub application: the x09n span chain, then NOT EXISTS
    // against the merged spans drops covered tokens and the survivors
    // reassemble in position order; docs scrubbed to nothing surface
    // with kept=0 and a NULL hash (mirrors Dedup.spanScrub).
    "x09o_span_scrub" -> {
      val (cat, joins) = gramJoin(8)
      s"""WITH $toks,
         |g AS (SELECT a.doc_id, a.ord AS start, ${polyHash(cat)} AS gid
         |      FROM toks a $joins),
         |rep AS (SELECT gid FROM g GROUP BY gid
         |        HAVING MIN(doc_id) <> MAX(doc_id)),
         |sp AS (SELECT g.doc_id, g.start, g.start + 7 AS e
         |       FROM g JOIN rep USING (gid)),
         |wm AS (SELECT doc_id, start, e,
         |         MAX(e) OVER (PARTITION BY doc_id ORDER BY start
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         |       FROM sp),
         |f AS (SELECT doc_id, start, e,
         |        CASE WHEN pm IS NULL OR start > pm THEN 1 ELSE 0 END AS news
         |      FROM wm),
         |i AS (SELECT doc_id, start, e,
         |        CAST(SUM(news) OVER (PARTITION BY doc_id ORDER BY start
         |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS isl FROM f),
         |ms AS (SELECT doc_id, MIN(start) AS span_start, MAX(e) AS span_end
         |       FROM i GROUP BY doc_id, isl),
         |keptt AS (SELECT t.doc_id, t.ord, t.tok FROM toks t
         |          WHERE NOT EXISTS (SELECT 1 FROM ms m
         |            WHERE m.doc_id = t.doc_id
         |              AND t.ord BETWEEN m.span_start AND m.span_end)),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens_kept,
         |               sha256(string_agg(tok, ' ' ORDER BY ord)) AS cleaned_hash
         |        FROM keptt GROUP BY doc_id),
         |bef AS (SELECT doc_id,
         |          CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
         |        FROM documents)
         |SELECT b.doc_id, b.n_tokens,
         |       COALESCE(a.n_tokens_kept, 0) AS n_tokens_kept,
         |       a.cleaned_hash
         |FROM bef b LEFT JOIN agg a USING (doc_id)
         |WHERE COALESCE(a.n_tokens_kept, 0) < b.n_tokens
         |ORDER BY doc_id""".stripMargin
    },
    // Bigram-LM surprisal: exact BIGINT numerator/denominator sums, one
    // IEEE division per doc, integer-compare buckets (mirrors
    // TextAnalysis.lmScore; DuckDB HUGEINT sums pinned back to BIGINT).
    "x11n_lm_score" ->
      s"""WITH $toks,
         |h AS (SELECT doc_id, ord, ${polyHash("tok")} AS h FROM toks),
         |bg AS (SELECT a.doc_id, a.h AS h1, a.h*2147483648 + b.h AS bid
         |       FROM h a JOIN h b ON a.doc_id=b.doc_id AND b.ord=a.ord+1),
         |c1 AS (SELECT h, COUNT(*) AS c1 FROM h GROUP BY h),
         |v AS (SELECT COUNT(*) AS v FROM c1),
         |c12 AS (SELECT bid, COUNT(*) AS c12 FROM bg GROUP BY bid),
         |s AS (SELECT bg.doc_id, COUNT(*) AS n_bigrams,
         |        CAST(SUM(CASE WHEN c12.c12 = 1 THEN 1 ELSE 0 END)
         |          AS BIGINT) AS n_hapax,
         |        CAST(SUM(c1.c1 + v.v) AS BIGINT) AS sden,
         |        CAST(SUM(c12.c12 + 1) AS BIGINT) AS snum
         |      FROM bg JOIN c12 USING (bid) JOIN c1 ON bg.h1 = c1.h, v
         |      GROUP BY 1)
         |SELECT doc_id, n_bigrams, n_hapax,
         |       CAST(sden AS DOUBLE)/CAST(snum AS DOUBLE) AS surprisal,
         |       CASE WHEN sden < snum*30 THEN 'head'
         |            WHEN sden < snum*31 THEN 'middle'
         |            ELSE 'tail' END AS bucket
         |FROM s ORDER BY doc_id""".stripMargin,
    // x19b: both batching strategies replayed shard-for-shard — the
    // same per-shard rank windows, exact token arithmetic
    "x19b_padding_audit" ->
      """WITH d AS (SELECT doc_id,
        |    LEAST(CAST(len(string_split(text, ' ')) AS BIGINT), 512) AS t,
        |    (((doc_id % 2147483647) * 2654435761) % 2147483647) % 16
        |      AS shard
        |  FROM documents),
        |ab AS (SELECT shard,
        |         (ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id)
        |           - 1) // 8 AS batch, t
        |       FROM d),
        |ag AS (SELECT shard, batch, COUNT(*) AS n_docs, MAX(t) AS mx,
        |         CAST(SUM(t) AS BIGINT) AS rtok
        |       FROM ab GROUP BY 1, 2),
        |ares AS (SELECT 'arrival' AS strategy,
        |           COUNT(*) AS n_batches,
        |           CAST(SUM(rtok) AS BIGINT) AS real_tokens,
        |           CAST(SUM(n_docs * mx) AS BIGINT) AS padded_slots
        |         FROM ag),
        |sb AS (SELECT shard,
        |         (ROW_NUMBER() OVER (PARTITION BY shard ORDER BY t, doc_id)
        |           - 1) // 8 AS batch, t
        |       FROM d),
        |sg AS (SELECT shard, batch, COUNT(*) AS n_docs, MAX(t) AS mx,
        |         CAST(SUM(t) AS BIGINT) AS rtok
        |       FROM sb GROUP BY 1, 2),
        |sres AS (SELECT 'length_sorted' AS strategy,
        |           COUNT(*) AS n_batches,
        |           CAST(SUM(rtok) AS BIGINT) AS real_tokens,
        |           CAST(SUM(n_docs * mx) AS BIGINT) AS padded_slots
        |         FROM sg)
        |SELECT strategy, n_batches, real_tokens, padded_slots,
        |       CAST(padded_slots - real_tokens AS DOUBLE) / padded_slots
        |         AS waste_share
        |FROM (SELECT * FROM ares UNION ALL SELECT * FROM sres)
        |ORDER BY strategy""".stripMargin,
    "x19_seq_packing" ->
      """WITH d AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT)
        |               AS n_tokens,
        |             ((doc_id * 2654435761) % 2147483647) % 4 AS shard,
        |             (doc_id * 1540483477) % 2147483647 AS ord
        |           FROM documents),
        |c AS (SELECT doc_id, n_tokens, shard,
        |             -- DuckDB SUM(BIGINT) is HUGEINT; pin back to BIGINT
        |             -- so pack_id's type matches Spark's LongType
        |             CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
        |               ORDER BY ord, doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) AS BIGINT) AS cum_before
        |      FROM d)
        |SELECT shard, cum_before >> 9 AS pack_id, COUNT(*) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
        |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
        |       CAST(SUM(n_tokens) AS DOUBLE) / 512 AS fill
        |FROM c GROUP BY shard, pack_id
        |ORDER BY shard, pack_id""".stripMargin,
  )
}
