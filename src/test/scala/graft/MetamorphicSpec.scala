package graft

import org.apache.spark.sql.DataFrame

/** Metamorphic differential testing: a seeded generator produces random
  * relational queries (filter → join? → group → agg → sort/limit?) over
  * the fixture tables, and every query must return the IDENTICAL row
  * set under execution-strategy perturbations that may not change
  * semantics:
  *
  *   - AQE on vs off (runtime re-planning must be result-invariant),
  *   - whole-stage codegen on vs off (generated vs interpreted
  *     evaluation must agree),
  *   - `spark.sql.shuffle.partitions` 8 vs 1 vs 17 (merge order and
  *     partition boundaries must not leak into results).
  *
  * This is the engine-testing net the DuckDB oracle can't provide: the
  * oracle certifies 130+ CURATED queries cross-engine; this certifies
  * the execution config space on queries nobody hand-picked. All
  * aggregates are over exact types (BIGINT counts, decimal-exact sums
  * cast to DOUBLE once per the repo convention) so equality is exact,
  * not approximate.
  */
class MetamorphicSpec extends SparkSuite {

  private def lineitem = sources.Tables.table(spark, sf, "lineitem")
  private def orders = sources.Tables.table(spark, sf, "orders")

  /** One random query plan as a thunk (re-built per config so each run
    * re-plans under the active conf). */
  private def randomQuery(seed: Int): () => DataFrame = {
    val r = new scala.util.Random(seed)
    import org.apache.spark.sql.functions._
    // every random literal is drawn EAGERLY here — a draw inside the
    // lambda would re-roll per invocation and hand each config variant
    // a different query
    val qtyLit = r.nextInt(40)
    val discLit = (r.nextInt(8) + 1) / 100.0
    val flagLit = Seq("A", "N", "R")(r.nextInt(3))
    val priceLit = 20000 + r.nextInt(80000)
    val filters = Vector[DataFrame => DataFrame](
      _.filter(col("l_quantity") > qtyLit),
      _.filter(col("l_discount") <= discLit),
      _.filter(col("l_returnflag") === flagLit),
      _.filter(col("l_extendedprice") < priceLit))
    val groupCols = Seq(
      Seq("l_returnflag"), Seq("l_linestatus"),
      Seq("l_returnflag", "l_linestatus"), Seq("l_suppkey"))(r.nextInt(4))
    val aggs = Vector(
      count(lit(1)).as("n"),
      functions.Exact.dsum(col("l_quantity")).as("sq"),
      functions.Exact.dsum(col("l_extendedprice")).as("se"),
      max("l_orderkey").as("mo"),
      min("l_partkey").as("mp"))
    val pickedAggs = r.shuffle(aggs).take(1 + r.nextInt(3))
    val doJoin = r.nextBoolean()
    // optional pre-aggregation running-sum window over a TOTAL order
    // (l_orderkey, l_linenumber is a lineitem key) — deterministic by
    // construction, so it too must survive every execution config
    val doWindow = r.nextBoolean()
    val doUnionSplit = r.nextInt(3) == 0
    // scalar-subquery filter (the x25/of8 query class): a one-shot
    // aggregate embedded in the predicate — Catalyst executes it as a
    // separate subquery job whose result folds into the filter, a
    // mechanism AQE/codegen variations must not perturb
    val doScalarSub = r.nextInt(3) == 0
    val subFrac = 2 + r.nextInt(3)
    val f1 = filters(r.nextInt(filters.size))
    val limit = if (r.nextBoolean()) Some(10 + r.nextInt(50)) else None
    () => {
      import org.apache.spark.sql.expressions.Window
      var df = f1(lineitem)
      if (doScalarSub) {
        lineitem.createOrReplaceTempView("__meta_li")
        df = df.filter(col("l_orderkey") <=
          expr(s"(SELECT MAX(l_orderkey) FROM __meta_li) / $subFrac"))
      }
      if (doWindow) {
        val w = Window.partitionBy("l_returnflag")
          .orderBy(col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df = df.withColumn("run_qty",
          sum(col("l_quantity").cast("long")).over(w))
      }
      if (doJoin)
        df = df.join(orders.filter(col("o_totalprice") > 1000),
          col("l_orderkey") === col("o_orderkey"))
      if (doUnionSplit)
        // identity union-split: same row set, but the plan now carries a
        // Union of two scans — exercised under every config
        df = df.filter(col("l_orderkey") % 2 === 0)
          .unionByName(df.filter(col("l_orderkey") % 2 =!= 0))
      val windowAggs =
        if (doWindow) Seq(max("run_qty").as("mrq")) else Seq.empty
      val allAggs = pickedAggs ++ windowAggs
      var out = df.groupBy(groupCols.map(col): _*).agg(allAggs.head,
        allAggs.tail: _*)
      limit.foreach { n =>
        out = out.orderBy((groupCols.map(col) :+ col(out.columns.last).desc): _*)
          .limit(n)
      }
      out
    }
  }

  /** Canonical row-set: collect, stringify, sort — order-free equality
    * (LIMIT queries order by a total key first, so their row set is
    * deterministic too). */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("random queries are invariant under AQE / codegen / partition-count") {
    val conf = spark.conf
    var nonEmpty = 0
    val variants: Seq[(String, Map[String, String])] = Seq(
      "baseline" -> Map(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.codegen.wholeStage" -> "true",
        "spark.sql.shuffle.partitions" -> "8"),
      "no-aqe" -> Map("spark.sql.adaptive.enabled" -> "false"),
      "no-codegen" -> Map("spark.sql.codegen.wholeStage" -> "false"),
      "one-partition" -> Map("spark.sql.shuffle.partitions" -> "1"),
      "prime-partitions" -> Map("spark.sql.shuffle.partitions" -> "17"),
      // join-STRATEGY invariance: broadcast vs sort-merge vs shuffled
      // hash must agree row-for-row
      "no-broadcast" -> Map("spark.sql.autoBroadcastJoinThreshold" -> "-1"),
      "shuffled-hash" -> Map(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.join.preferSortMergeJoin" -> "false"))
    val saved = variants.flatMap(_._2.keys).distinct
      .map(k => k -> conf.get(k)).toMap
    try {
      (1 to 25).foreach { i =>
        val q = randomQuery(i)
        val results = variants.map { case (name, overrides) =>
          saved.keys.foreach(k => conf.set(k, saved(k))) // reset
          overrides.foreach { case (k, v) => conf.set(k, v) }
          name -> canon(q())
        }
        val (refName, ref) = results.head
        results.tail.foreach { case (name, got) =>
          assert(got == ref,
            s"query #$i: '$name' disagrees with '$refName' " +
              s"(${got.size} vs ${ref.size} rows); first got=${got.headOption} " +
              s"ref=${ref.headOption}")
        }
        if (ref.nonEmpty) nonEmpty += 1
      }
      // a degenerate generator that only produced empty results would
      // make the invariance vacuous — require real coverage
      assert(nonEmpty >= 20, s"only $nonEmpty/25 queries returned rows")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }
}
