package graft

import graft.operators.Similarity
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The staged ANN index contract (round-10 design: the N×k corpus
  * assignment is index MAINTENANCE — committed once to disk — and
  * queries are probe-only):
  *   - derived geometry follows the documented integer formulas and
  *     floors at the historical (stride 1, k 8) through oracle scales;
  *   - the staged probe path is byte-identical to the inline path over
  *     the same codebook;
  *   - a second session reuses the PUBLISHED index (no rebuild — the
  *     on-disk root is untouched by later readers);
  *   - a fixture whose files change gets a fresh fingerprint and a
  *     fresh index root (stale state can never be read).
  */
class StagedIndexSpec extends SparkSuite {

  private def indexRoots: Seq[Path] = {
    val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_annindex")
    if (!Files.exists(base)) Seq.empty
    else Files.list(base).iterator().asScala.toSeq
  }

  test("derived ANN geometry: integer formulas, floored at (1, 8) through oracle scales") {
    // oracle-scale floors: sf0.001/sf0.01 (500 vecs) and sf0.1 (2000)
    assert(Similarity.annGeometry(500) == (1L, 8))
    assert(Similarity.annGeometry(2000) == (1L, 8))
    // the k floor releases exactly at n = 81*32 = 2592
    assert(Similarity.annGeometry(2591) == (1L, 8))
    assert(Similarity.annGeometry(2592) == (1L, 9))
    // soak scales: k follows sqrt(n/32); stride engages past 65536
    assert(Similarity.annGeometry(20000) == (1L, 25))
    assert(Similarity.annGeometry(200000) == (4L, 79))
    // degenerate corpora stay well-defined
    assert(Similarity.annGeometry(0) == (1L, 8))
    assert(Similarity.annGeometry(1) == (1L, 8))
  }

  test("staged probe path is byte-identical to the inline path over the same codebook") {
    val staged = Similarity.ivfTopKLearned(spark, sf).collect().map(_.toSeq).toSeq
    val inline = Similarity.ivfTopK(spark, sf,
      cells = Some(Similarity.kmeansSums(spark, sf))).collect().map(_.toSeq).toSeq
    assert(staged == inline)
    assert(staged.nonEmpty)
  }

  test("a second session reads the published index without rebuilding it") {
    Similarity.stagedIvfIndex(spark, sf) // ensure published
    val fpRoots = indexRoots
    assert(fpRoots.nonEmpty, "publishing must create an index root")
    val root = fpRoots.maxBy(p => Files.getLastModifiedTime(p).toMillis)
    assert(Files.exists(root.resolve("_COMPLETE")))
    val before = Files.walk(root).iterator().asScala
      .map(p => (p.toString, Files.getLastModifiedTime(p).toMillis)).toSet
    // a FRESH session (separate SessionMemo) must open, not rebuild:
    // the on-disk tree is untouched and results match the first session
    val s2 = spark.newSession()
    val viaS2 = Similarity.ivfTopKLearned(s2, sf).collect().map(_.toSeq).toSeq
    val after = Files.walk(root).iterator().asScala
      .map(p => (p.toString, Files.getLastModifiedTime(p).toMillis)).toSet
    assert(after == before, "second session must not rewrite the index")
    assert(viaS2 == Similarity.ivfTopKLearned(spark, sf)
      .collect().map(_.toSeq).toSeq)
  }

  test("a changed fixture gets a fresh fingerprint, geometry probe, and index root") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_annfp_")
    try {
      val src = spark.read.parquet(s"$sf/embeddings.parquet")
      src.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out1 = Similarity.ivfTopKLearned(spark, dir.toString)
        .collect().map(_.toSeq).toSeq
      val n1 = indexRoots.size
      // rewrite the fixture with HALF the corpus: same dir, new bytes —
      // the fingerprint memo key must miss and a new index must stage
      src.filter(col("vec_id") < 250)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out2 = Similarity.ivfTopKLearned(spark, dir.toString)
        .collect().map(_.toSeq).toSeq
      assert(indexRoots.size == n1 + 1, "rewritten fixture must restage")
      assert(out1 != out2, "the halved corpus must change the result")
      // and the half-corpus result is self-consistent with inline
      assert(out2 == Similarity.ivfTopK(spark, dir.toString,
        cells = Some(Similarity.kmeansSums(spark, dir.toString)))
        .collect().map(_.toSeq).toSeq)
    } finally {
      Files.walk(dir).iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(p => Files.deleteIfExists(p))
    }
  }
}
