package graft

import graft.operators.{Multimodal, TextAnalysis}

class TextMultimodalSpec extends SparkSuite {

  private lazy val nDocs =
    spark.read.parquet(s"$sf/documents.parquet").count()

  test("per-doc text analytics cover every document") {
    assert(TextAnalysis.tokenStats(spark, sf).count() == nDocs)
    assert(TextAnalysis.qualityScore(spark, sf).count() == nDocs)
    assert(TextAnalysis.langId(spark, sf).count() == nDocs)
  }

  test("quality ratios are well-formed") {
    TextAnalysis.qualityScore(spark, sf).collect().foreach { r =>
      val ttr = r.getDouble(4)
      assert(ttr > 0 && ttr <= 1.0, s"ttr out of range: $ttr")
    }
  }

  test("polyHash matches the DuckDB replay values (pinned)") {
    // Pinned against DuckDB 1.0: list_reduce(list_transform(
    //   string_split(s,''), ch -> CAST(ascii(ch) AS BIGINT)),
    //   (a,b) -> (a*31+b) % 2147483647)
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rows = Seq("a", "abc", "the quick fox").toDF("s")
      .select(col("s"), TextAnalysis.polyHash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("a") == 97L)
    assert(rows("abc") == 96354L)
    assert(rows("the quick fox") == 2081235932L)
  }

  test("fingerprints are deterministic across runs") {
    val a = TextAnalysis.fingerprint(spark, sf).collect().toSeq
    val b = TextAnalysis.fingerprint(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("train/valid/test split partitions the corpus exactly") {
    val rows = graft.operators.TextAnalysis.trainTestSplit(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "valid"))
    assert(rows.map(_.getLong(1)).sum == nDocs)
    // deterministic across runs
    val again = graft.operators.TextAnalysis.trainTestSplit(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("stratified sample downsamples per-class deterministically") {
    val rows = TextAnalysis.stratifiedSample(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.values.forall { case (total, kept) => kept <= total })
    assert(rows.keySet == Set("de", "en", "es", "fr", "zh"))
    // en keeps ~25%, the rest ~50% — allow generous sampling slack
    val (enTotal, enKept) = rows("en")
    assert(enKept.toDouble / enTotal < 0.40, s"en keep-rate too high: $rows")
    val again = TextAnalysis.stratifiedSample(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows == again)
  }

  test("tf-idf ranks rare terms above stopwords") {
    val rows = TextAnalysis.tfidfTop(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.values.forall(rs => rs.map(_.getInt(1)).sorted.sameElements(
      (1 to rs.length))), "ranks must be 1..k per doc")
    byDoc.values.foreach { rs =>
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(5))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // a term appearing in every document scores n_docs/df = 1 per
    // occurrence; top terms should beat that baseline
    assert(rows.filter(_.getInt(1) == 1).forall(_.getDouble(5) >= 1.0))
  }

  test("text cleaning canonicalizes and is verifiable by hash") {
    val rows = TextAnalysis.cleanText(spark, sf).collect()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      assert(r.getInt(1) >= 0)
      assert(r.getInt(2) >= 1)
      assert(r.getString(3).length == 64, "sha256 hex expected")
    }
  }

  test("chunking covers every token with the configured stride") {
    val chunks = TextAnalysis.chunkDocs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nToks = spark.read.parquet(s"$sf/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to sorted.length),
        s"chunk ordinals not contiguous for doc $doc")
      sorted.foreach { case (_, idx, start, n) =>
        assert(start == 1 + (idx - 1) * 96)
        assert(n >= 1 && n <= 128)
      }
      val last = sorted.last
      assert(last._3 + last._4 - 1 == nToks(doc),
        s"doc $doc tokens not fully covered")
    }
  }

  test("nearest-centroid assigns every vector exactly once") {
    val conf = graft.operators.Similarity.nearestCentroid(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(conf.map(_.getLong(2)).sum == total,
      "confusion matrix must partition the corpus")
    conf.foreach(r => assert(r.getLong(2) > 0))
  }

  test("label centroids cover every (label, dim) with bounded values") {
    val rows = graft.operators.Similarity.labelCentroids(spark, sf).collect()
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label").distinct().count()
    assert(rows.length == labels * 64)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3)) <= 1.0, s"centroid out of range: $r")
    }
  }

  test("media decode parses real PPM/BMP/WAV blobs, dispatched by magic") {
    val feats = Multimodal.decodeMedia(Multimodal.encodeBlobs(spark, sf))
      .collect()
    assert(feats.length == nDocs)
    feats.foreach { f =>
      f.media_type match {
        case "image/ppm" | "image/bmp" =>
          assert(f.doc_id % 3 == (if (f.media_type == "image/ppm") 0 else 1))
          assert(f.width >= 1 && f.width <= 64)
          assert(f.height >= 1 && f.height <= 48)
          assert(f.sample_rate == 0 && f.n_samples == 0)
        case "audio/wav" =>
          assert(f.doc_id % 3 == 2)
          assert(f.sample_rate >= 8000 && f.sample_rate <= 15000)
          assert(f.n_samples >= 16 && f.n_samples < 272)
          assert(f.width == 0 && f.height == 0)
        case other => fail(s"unexpected media type $other")
      }
      assert(f.n_bytes > 0 && f.payload_byte_sum > 0)
    }
  }

  test("decoder reads hand-crafted blobs it did not encode") {
    import spark.implicits._
    // 2x1 PPM, pixels 1..6 -> sum 21; 8-sample 11025 Hz WAV of zeros
    val ppm = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6)
    val wav = java.nio.ByteBuffer.allocate(44 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(36 + 16)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(11025).putInt(22050)
      .putShort(2).putShort(16).put("data".getBytes("US-ASCII"))
      .putInt(16).array()
    val out = Multimodal
      .decodeMedia(Seq((1L, ppm), (2L, wav)).toDF("doc_id", "content"))
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).media_type == "image/ppm")
    assert(out(1L).width == 2 && out(1L).height == 1)
    assert(out(1L).payload_byte_sum == 21)
    assert(out(2L).media_type == "audio/wav")
    assert(out(2L).sample_rate == 11025 && out(2L).n_samples == 8)
    assert(out(2L).payload_byte_sum == 0)
  }
  test("resize and frame-sample derive exactly from the decoded payloads") {
    import spark.implicits._
    // a 2x2 identity "resize" (w2=h2 matching a hand-crafted 2x2 PPM)
    // must reproduce the full pixel sum — the stride/offset proof
    val px = Array.tabulate[Byte](12)(i => (i + 1).toByte) // sum 78
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ px
    val li = Multimodal
      .resizedImagesOf(Seq((1L, ppm)).toDF("doc_id", "content"), 2, 2)
      .collect()
    assert(li.length == 1)
    assert(li.head.getAs[Long]("resized_sum") == 78L)
    // fixture-wide shape pins (values are oracle-certified in xm3/xm4)
    val imgs = Multimodal.resizedImages(spark, sf).collect()
    assert(imgs.nonEmpty && imgs.forall { r =>
      r.getAs[Long]("resized_sum") >= 0 &&
        r.getAs[Long]("resized_sum") <= 255L * 8 * 8 * 3
    })
    val fr = Multimodal.audioFrames(spark, sf).collect()
    val perDoc = fr.groupBy(_.getAs[Long]("doc_id"))
    assert(perDoc.nonEmpty && perDoc.forall(_._2.length == 4))
    // frames tile the stream exactly: counts sum to ns per doc
    perDoc.foreach { case (_, rows) =>
      val ns = rows.map(_.getAs[Int]("n_frame_samples")).sum
      assert(ns >= 16 && ns < 272)
    }
  }

  test("repetition metrics are well-formed and cover the corpus") {
    val rows = TextAnalysis.repetition(spark, sf).collect()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (n, d, frac, mx) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))
      assert(d <= n && mx >= 1 && mx <= n)
      assert(frac >= 0.0 && frac < 1.0)
      assert(math.abs(frac - (n - d).toDouble / n) < 1e-15)
    }
  }

  test("pii redaction finds every planted item and only redacts what it finds") {
    val rows = TextAnalysis.piiRedaction(spark, sf).collect()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (e, p, i) = (r.getInt(1), r.getInt(2), r.getInt(3))
      (id % 5) match {
        case 0 => assert(e >= 1, s"doc $id: planted email not found")
        case 1 => assert(p >= 1, s"doc $id: planted phone not found")
        case 2 => assert(i >= 1, s"doc $id: planted ip not found")
        case _ => assert(e + p + i == 0,
          s"doc $id: unexpected PII in clean synthetic text")
      }
    }
  }

  test("chunk dedup finds the planted cross-document block sharing") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Dedup.chunkDedup(spark, sf).collect()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "dup blocks exceed total")
      assert(math.abs(r.getDouble(3) - r.getLong(2).toDouble / r.getLong(1)) < 1e-15)
    }
    // block partitioning is exhaustive: ceil(n_tokens / 16) blocks per doc
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .select(ceil(size(split(col("text"), " ")) / 16.0)).collect()
      .map(_.getLong(0)).sum
    assert(rows.map(_.getLong(1)).sum == expected)
  }

  test("sequence packing is a partition of the corpus into budget-bounded packs") {
    import org.apache.spark.sql.functions._
    val packs = TextAnalysis.seqPacking(spark, sf).collect()
    // every document lands in exactly one pack, no token lost
    assert(packs.map(_.getLong(2)).sum == nDocs)
    val totalToks = spark.read.parquet(s"$sf/documents.parquet")
      .select(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    assert(packs.map(_.getLong(3)).sum == totalToks)
    // greedy whole-doc boundary: a pack overflows 512 only by its last
    // doc, so pack_tokens < 512 + max single-doc tokens; and every pack
    // except possibly the last in its shard reaches the budget boundary
    val maxDoc = spark.read.parquet(s"$sf/documents.parquet")
      .select(max(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    packs.foreach { p =>
      assert(p.getLong(3) > 0 && p.getLong(3) < 512 + maxDoc,
        s"pack ${p.getLong(0)}/${p.getLong(1)} tokens out of range: $p")
      assert(math.abs(p.getDouble(6) - p.getLong(3) / 512.0) == 0.0)
    }
    packs.groupBy(_.getLong(0)).foreach { case (shard, ps) =>
      val last = ps.map(_.getLong(1)).max
      // pack ids within a shard are dense from 0 (shiftright of a
      // contiguous cumulative range)
      assert(ps.map(_.getLong(1)).sorted.sameElements(0L to last))
      // every non-final pack is full: the cumulative token count
      // through pack k must reach boundary (k+1)*512, else pack k+1
      // could not have started
      val ordered = ps.sortBy(_.getLong(1))
      ordered.scanLeft(0L)(_ + _.getLong(3)).drop(1)
        .zip(ordered).dropRight(1).foreach { case (cum, p) =>
          assert(cum >= (p.getLong(1) + 1) * 512,
            s"shard $shard pack ${p.getLong(1)} closed before its boundary")
        }
    }
  }

  test("bigram-LM surprisal covers the corpus with monotone buckets") {
    val rows = TextAnalysis.lmScore(spark, sf).collect()
    // every fixture doc has >= 2 tokens, so every doc is scored
    assert(rows.length == nDocs)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_hapax bounded by n_bigrams")
      assert(r.getDouble(3) > 1.0, "add-one surprisal is > 1 by construction")
    }
    // buckets partition the surprisal axis monotonically: every head
    // score below every middle score below every tail score
    val byBucket = rows.groupBy(_.getString(4))
      .view.mapValues(_.map(_.getDouble(3))).toMap
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
    for {
      lo <- byBucket.get("head"); hi <- byBucket.get("middle")
    } assert(lo.max <= hi.min)
    for {
      lo <- byBucket.get("middle"); hi <- byBucket.get("tail")
    } assert(lo.max <= hi.min)
    val again = TextAnalysis.lmScore(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("BPE merges realize greedy non-overlapping semantics") {
    // 'aaaa' (freq 2): round 1 must pick (a,a) with freq 2·3=6 and merge
    // positions 1 and 3 ONLY (greedy left-to-right — merging position 2
    // would double-consume the middle symbols), leaving [aa, aa]; round
    // 2 then merges (aa, aa); round 3 finds no pairs at all and the
    // merge table simply ENDS (no padding rows) — the engine and the
    // oracle agree on exhaustion by construction (empty LIMIT 1).
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_")
    try {
      import spark.implicits._
      Seq((0L, "aaaa aaaa b", "en", "synthetic", 11L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val m = TextAnalysis.bpeMerges(spark, dir.toString, rounds = 4)
        .collect()
      assert(m.map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq ==
        Seq((1, "a", "a", 6L), (2, "aa", "aa", 2L)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("BPE ignores empty tokens (doubled/trailing spaces)") {
    // split() keeps empty tokens; the engines DISAGREE on exploding a
    // zero-char word (Spark sequence(1,0) = [1,0] descending — two
    // phantom rows — vs DuckDB's empty range), so the word relation
    // excludes them and the encode join drops them from the sequence
    // identically on both sides. 'aa aa  b ' has two empties (double
    // space + trailing): training must see words {aa, b} only and
    // encode must reassemble "aa aa b".
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_sp_")
    try {
      import spark.implicits._
      Seq((0L, "aa aa  b ", "en", "synthetic", 9L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val m = TextAnalysis.bpeMerges(spark, dir.toString, rounds = 2)
        .collect()
      assert(m.map(r => (r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq == Seq(("a", "a", 2L)), s"phantom pair leaked: ${m.toSeq}")
      val e = TextAnalysis.bpeEncode(spark, dir.toString, rounds = 2)
        .collect()
      assert(e.length == 1)
      assert((e.head.getLong(1), e.head.getLong(2)) == (3L, 3L))
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val want = md.digest("aa aa b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(e.head.getString(4) == want)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("BPE encode applies learned merges; exhausted rounds keep state") {
    // Same corpus as the greedy test, trained PAST exhaustion
    // (rounds=4, only 2 merges exist): the encoder must still see the
    // round-2 state — 'aaaa'→[aaaa], 'b'→[b] — so the doc re-encodes
    // as "aaaa aaaa b" (3 words, 3 subwords, fertility 1). The hash
    // pins the byte-exact sequence.
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_enc_")
    try {
      import spark.implicits._
      Seq((0L, "aaaa aaaa b", "en", "synthetic", 11L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val e = TextAnalysis.bpeEncode(spark, dir.toString, rounds = 4)
        .collect()
      assert(e.length == 1)
      val r = e.head
      assert((r.getLong(1), r.getLong(2), r.getDouble(3)) == (3L, 3L, 1.0))
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val want = md.digest("aaaa aaaa b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getString(4) == want, "encoded sequence hash must match")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("BPE encode on the fixture: subword mass bounded by chars/words") {
    val e = TextAnalysis.bpeEncode(spark, sf).collect()
    assert(e.nonEmpty)
    // per doc: words ≤ subwords (merging never splits past one symbol
    // per char) and fertility ≥ 1; encoded hashes are 64-hex
    assert(e.forall(r => r.getLong(2) >= r.getLong(1)))
    assert(e.forall(r => r.getDouble(3) >= 1.0))
    assert(e.forall(r => r.getString(4).matches("[0-9a-f]{64}")))
  }

  test("BPE merge table on the fixture is well-formed") {
    val m = TextAnalysis.bpeMerges(spark, sf).collect()
    assert(m.map(_.getInt(0)).toSeq == (1 to 6), "ranks must be 1..6")
    // the chosen pair frequency is non-increasing over rounds: merging
    // can only remove occurrences of existing pairs, and any pair born
    // from a merge occurs at most as often as the merge it contains
    val freqs = m.map(_.getLong(3)).toSeq
    assert(freqs == freqs.sorted.reverse, s"non-monotone: $freqs")
    assert(m.forall(r => r.getString(1).nonEmpty && r.getString(2).nonEmpty
      && r.getLong(3) > 0))
    // (the synthetic greedy test above covers merges CONSUMING learned
    // symbols — its round 2 merges (aa, aa); the fixture's first 6
    // rounds stay single-char at this scale)
  }

  test("Misra-Gries heavy hitters are exact under undersized capacity") {
    // capacity 3 on a stream with >3 distinct tokens forces BOTH
    // overflow paths (reduce's decrement-all and merge's cut-subtract);
    // the two-pass query must still return exactly the tokens above
    // the threshold with exact counts, for any input layout.
    val dir = java.nio.file.Files.createTempDirectory("graft_hh_")
    try {
      import spark.implicits._
      // 40×a, 25×b, 12×c, singletons d..k: with φ = 1/4 over N=85,
      // the answer is {a (40), b (25)}; c and the tail must be pruned
      val text = (Seq.fill(40)("a") ++ Seq.fill(25)("b") ++
        Seq.fill(12)("c") ++ Seq("d", "e", "f", "g", "h", "i", "j", "k"))
      val docs = text.grouped(5).zipWithIndex
        .map { case (g, i) => (i.toLong, g.mkString(" "), "en", "s", 1L) }
        .toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      docs.repartition(7).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val got = TextAnalysis.heavyHitters(spark, dir.toString,
        phiDen = 4L, capacity = 4).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == Seq(("a", 40L), ("b", 25L)), s"got $got")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("MG buffer honors the superset guarantee across merge trees") {
    // pure unit exercise of the Aggregator's algebra: feed three
    // partitions through reduce, merge in both associations, and the
    // guaranteed-heavy item must be tracked in every outcome
    val mg = new graft.functions.MisraGries(2)
    val parts = Seq(
      Seq("x", "y", "x", "z", "x"), // x=3 of 5
      Seq("x", "w", "x", "y", "x"),
      Seq("x", "z", "x", "w", "x"))
    val bufs = parts.map(_.foldLeft(mg.zero)(mg.reduce))
    val left = mg.merge(mg.merge(bufs(0), bufs(1)), bufs(2))
    val right = mg.merge(bufs(0), mg.merge(bufs(1), bufs(2)))
    // x has frequency 9/15 > N/(capacity+1) = 5 → must survive any tree
    assert(left.contains("x") && right.contains("x"))
    assert(left.size <= 2 && right.size <= 2, "capacity bound violated")
  }

  test("corpus funnel stages are monotone and agree with the operators") {
    val rows = TextAnalysis.corpusFunnel(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 6))
    // survivors can only shrink stage to stage (docs AND tokens)
    val docs = rows.map(_.getLong(2)).toSeq
    val toks = rows.map(_.getLong(3)).toSeq
    assert(docs == docs.sorted.reverse && toks == toks.sorted.reverse)
    // stage 1 is the raw corpus; stage 2 equals the certified langId op
    assert(docs.head == nDocs)
    val enDocs = TextAnalysis.langId(spark, sf)
      .filter(org.apache.spark.sql.functions.col("predicted") === "en")
      .count()
    assert(docs(1) == enDocs, "funnel lang stage diverged from langId")
  }

  test("markup strip: extraction is lossless on every document") {
    val rows = TextAnalysis.markupStrip(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getBoolean(4)))
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    rows.foreach { case (id, htmlLen, exLen, nTags, lossless) =>
      assert(lossless, s"doc $id extraction not lossless")
      val text = texts(id)
      val tok1 = text.split(" ")(0)
      // extract == title + ' ' + text, so its length is fully pinned
      assert(exLen == tok1.length + 1 + text.length, s"doc $id length")
      assert(htmlLen > exLen)
      // 14 structural tags + 2 per inter-token boundary (</p> <p>)
      assert(nTags == 14 + 2 * (text.count(_ == ' ')), s"doc $id tags")
    }
  }

  test("leakage-safe split: clusters never straddle, the naive split's leak is measured") {
    val rows = TextAnalysis.leakageSafeSplit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._2).sum == total, "splits must partition the corpus")
    // the operator's contract: ZERO cross-split near-dup pairs
    assert(rows.forall(_._4 == 0L), s"cluster split leaked: $rows")
    // the counter-factual proves the operator matters on this corpus
    assert(rows.map(_._5).sum > 0, "doc-split should leak on this fixture")
    // endpoint counts are even in total (each leaky pair has 2 sides)
    assert(rows.map(_._5).sum % 2 == 0)
    // cross-check against the raw cluster labels: every cluster's docs
    // share one split under the unit rule
    val clus = graft.operators.Dedup.dedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def splitOf(u: Long) = (u * 2654435761L % 2147483647L % 10) match {
      case b if b < 8 => "train"; case 8 => "val"; case _ => "test"
    }
    clus.groupBy(_._2).foreach { case (cid, members) =>
      val sides = members.map(m => splitOf(cid)).toSet
      assert(sides.size == 1, s"cluster $cid split across $sides")
    }
  }

  test("image phash dedup: banding finds exactly the brute-force hamming<=12 pairs, symmetrically") {
    val rows = Multimodal.imagePhashDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getInt(6))))
    assert(rows.nonEmpty)
    // fingerprint halves are clean 32-bit values
    rows.foreach { case (_, lo, hi, _, _, _) =>
      assert(lo >= 0 && lo < (1L << 32) && hi >= 0 && hi < (1L << 32))
    }
    // pigeonhole completeness: the banded candidates must recover the
    // FULL brute-force hamming<=12 pair set (16 bands cover <=15)
    val hashes = rows.map(r => r._1 -> (r._2 | (r._3 << 32))).toMap
    def hamming(a: Long, b: Long) =
      java.lang.Long.bitCount(hashes(a) ^ hashes(b))
    val ids = hashes.keys.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b && hamming(a, b) <= 12
    } yield (a, b)).toSet
    val found = rows.filter(_._4 > 0).map(_._1).toSet
    assert(brute.flatMap(p => Seq(p._1, p._2)) == found,
      s"banded match set diverged from brute force: $brute vs $found")
    // best partner is the true minimum, matches are symmetric
    rows.filter(_._4 > 0).foreach { case (id, _, _, _, Some(p), Some(hm)) =>
      assert(hamming(id, p) == hm)
      val best = ids.filter(o => o != id && hamming(id, o) <= 12)
        .map(o => (hamming(id, o), o)).min
      assert((hm, p) == best, s"doc $id best partner")
      assert(rows.exists(r => r._1 == p && r._5.isDefined))
    case _ => fail()
    }
  }

  test("source quota caps every source deterministically") {
    val rows = TextAnalysis.sourceQuota(spark, sf).collect()
    val perSource = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == perSource.size)
    rows.foreach { r =>
      val (src, total, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(total == perSource(src))
      assert(kept == math.min(10L, total), s"$src kept $kept of $total")
      assert(r.getLong(3) > 0) // kept_chars
    }
  }

}
