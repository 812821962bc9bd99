package graft

import graft.operators.Similarity

/** Pins the three physical strategies of the x09f/x09r near-dup pair
  * engine (`graft.neardup.strategy`, VERDICT r13 #4) to VALUE
  * equality: "smj" (standing payload-carrying sort-merge), "hash"
  * (payload-carrying shuffled hash join — no external sorts), "light"
  * (ids-only candidates + payload re-join) must emit the identical
  * survivor-pair set with identical cosines — the A/B in BENCH_NOTES
  * r14 is purely a physical-cost comparison. */
class NearDupStrategySpec extends SparkSuite {

  // The tiny smoke fixture yields no survivors under the derived
  // geometry/threshold — pin the strategies over a wider config that
  // does (the DedupSimilaritySpec recall venue's shape).
  private def run(s: String): Seq[String] = {
    spark.conf.set("graft.neardup.strategy", s)
    try Similarity.embeddingNearDup(spark, sf, threshold = 0.3,
        planes = 24, bands = 3)
      .collect().map(_.toString).sorted.toSeq
    finally spark.conf.unset("graft.neardup.strategy")
  }

  test("near-dup pair engine strategies are value-identical") {
    val smj = run("smj")
    assert(smj.nonEmpty, "fixture must produce near-dup pairs")
    assert(run("hash") == smj, "hash strategy diverges from smj")
    assert(run("light") == smj, "light strategy diverges from smj")
    // default (conf unset) is the standing smj shape
    assert(Similarity.embeddingNearDup(spark, sf, threshold = 0.3,
      planes = 24, bands = 3)
      .collect().map(_.toString).sorted.toSeq == smj)
  }

  test("hash strategy plans a shuffled hash join, not a sort-merge") {
    spark.conf.set("graft.neardup.strategy", "hash")
    try {
      val p = Similarity.embeddingNearDup(spark, sf)
        .queryExecution.executedPlan.toString
      assert(p.contains("ShuffledHashJoin"),
        s"expected ShuffledHashJoin in:\n$p")
    } finally spark.conf.unset("graft.neardup.strategy")
  }
}
