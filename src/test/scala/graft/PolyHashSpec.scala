package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Native PolyHash expression ≡ composed-HOF reference form, on real
  * corpus tokens and on arbitrary non-empty strings (the two forms and
  * the DuckDB oracle replay must stay bit-identical). */
class PolyHashSpec extends SparkSuite {

  test("native and HOF forms agree on every corpus token and shingle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val toks = docs.select(explode(split(col("text"), " ")).as("s"))
    val mismatch = toks
      .select(TextAnalysis.polyHash(col("s")).as("a"),
        TextAnalysis.polyHashHof(col("s")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(mismatch.count() == 0)
  }

  test("native form agrees with the JVM reference on arbitrary strings") {
    import spark.implicits._
    val gen = Gen.listOfN(200, Gen.nonEmptyListOf(Gen.asciiPrintableChar)
      .map(_.mkString))
    val samples = gen(Gen.Parameters.default, Seed(42L)).get
    val got = samples.toDF("s")
      .select(col("s"), TextAnalysis.polyHash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    got.foreach { case (s, h) =>
      assert(h == graft.plans.PolyHash.hash(s), s"mismatch for '$s'")
    }
  }

  test("native form works inside higher-order lambdas") {
    import spark.implicits._
    val got = Seq(Seq("ab", "cd")).toDF("a")
      .select(transform(col("a"), s => TextAnalysis.polyHash(s)).as("h"))
      .head().getSeq[Long](0)
    assert(got == Seq(graft.plans.PolyHash.hash("ab"),
      graft.plans.PolyHash.hash("cd")))
  }

  test("pinned values match the DuckDB replay") {
    assert(graft.plans.PolyHash.hash("a") == 97L)
    assert(graft.plans.PolyHash.hash("abc") == 96354L)
    assert(graft.plans.PolyHash.hash("the quick fox") == 2081235932L)
    assert(graft.plans.PolyHash.hash("") == 0L)
  }
}
