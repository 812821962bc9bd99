package graft

/** Driver-contract invariants: the correctness gate hash-compares each
  * `queries` entry against its `oracleSql` twin, so a key typo or a
  * missing oracle silently downgrades a query to a weaker check. Pin
  * the alignment and the exact rows-only exception set. */
class ContractSpec extends SparkSuite {

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("rows-only queries are exactly the documented sketch/fs set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set(
      "o13_block_locations",   // filesystem metadata — not visible to SQL
      "x05b_approx_distinct",  // HLL++ sketch values are engine-specific
      "x05d_approx_quantiles", // GK sketch values are engine-specific
      "x24_sketch_rollup"      // Datasketches HLL — no DuckDB twin;
                               // error bound spec-pinned in EdgeCaseSpec
    ), s"unexpected rows-only set: $rowsOnly")
  }

  test("flagship entry returns rows (driver smoke-check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query function builds an analyzable plan") {
    // Construction must not throw (resolution errors, missing columns,
    // bad registrations) for any declared query; execution is the
    // verify/bench mains' job.
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.schema.fields.nonEmpty, s"$name has an empty schema")
    }
  }

  test("README hardcodes no query-surface count (drift guard)") {
    // The surface count lives in ONE place: SparkEntry.queries.size.
    // README copies of it went stale twice (rounds 5 and 6); ban the
    // pattern outright so the next addition can't drift.
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val hits = "\\b\\d+\\s+(?:quer|oracle|spec)".r.findAllIn(readme).toList
    assert(hits.isEmpty,
      s"README hardcodes surface counts $hits — reference " +
        s"SparkEntry.queries (currently ${SparkEntry.queries.size}) " +
        "without a literal number instead")
  }
}
