package graft.operators

import graft.functions.Exact
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational breadth beyond the reference (SURVEY §2.4 X1-X8): grouped
  * aggregates, the join family, top-k, windows, distinct/approx-distinct,
  * rollup/cube, set operations, scalar-function surface.
  *
  * All money/measure aggregates route through [[Exact]] decimal helpers so
  * results are independent of partition/summation order — both for the
  * DuckDB oracle and for plan stability at scale.
  */
object Relational {
  import Exact._

  /** X1: grouped aggregate in the TPC-H Q1 shape — partial (map-side)
    * aggregation then one shuffle on the low-cardinality group key.
    */
  def groupedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val discounted = col("l_extendedprice").cast(Dec2) * oneMinus(col("l_discount"))
    li.filter(col("l_shipdate") <= to_timestamp(lit("2000-01-01")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(discounted).cast(DoubleType).as("sum_disc_price"),
        sum(discounted * (lit(1).cast(Dec2) + col("l_tax").cast(Dec2)))
          .cast(DoubleType).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** X2: broadcast hash join — `part` is a bounded dimension, so it ships
    * to every executor and the fact table joins map-side with no shuffle
    * of the 100 TB side.
    */
  def broadcastJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir).filter(col("p_size") <= 20)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
      .groupBy("p_brand")
      .agg(
        sum(col("l_extendedprice").cast(Dec2) * oneMinus(col("l_discount")))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** X2: left-semi join (EXISTS) — only the keys of the probe side move;
    * no row duplication, output bounded by the left side.
    */
  def semiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val big = Tables.lineitem(spark, sfDir).filter(col("l_quantity") >= 48)
    o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** X2: left-anti join (NOT EXISTS) — customers that never ordered. */
  def antiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** X2: FULL OUTER join — rich customers vs big-spend order books, with
    * both unmatched sides surviving (the reconciliation-report shape:
    * who has money but no big orders, who places big orders without a
    * rich profile). Keys coalesce; a match-class column makes the three
    * populations auditable. Same single keyed shuffle as the inner join
    * — outer-ness is a property of the join operator, not extra passes.
    */
  def outerJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val rich = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") > 7000)
      .select(col("c_custkey"), col("c_name"))
    val big = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 250000)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_big_orders"),
        Exact.dsum(col("o_totalprice")).as("sum_big_price"))
    rich.join(big, rich("c_custkey") === big("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"),
        col("n_big_orders"),
        col("sum_big_price"),
        when(col("c_custkey").isNull, "orders_only")
          .when(col("o_custkey").isNull, "customer_only")
          .otherwise("both").as("match_class"))
      .orderBy("custkey")
  }

  /** X2: multi-way star join (TPC-H Q5 shape) — revenue per nation.
    * Small dims (`nation`, `region`, `supplier` at fixture scale) go
    * broadcast; the fact⋈orders join shuffles once on the order key.
    */
  def starJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(li, o("o_orderkey") === li("l_orderkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("l_extendedprice").cast(Dec2) * oneMinus(col("l_discount")))
        .cast(DoubleType).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** X3: top-k — planned as `TakeOrderedAndProject` (per-partition heap +
    * driver merge of k rows), NOT a global sort of 100 TB.
    */
  def topK(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  /** X4: ranking window — top-3 orders per customer by value. */
  def windowRank(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  /** X4: frame window — per-supplier 3-row moving sum + lag over the
    * ship-date timeline (decimal-exact inside the frame).
    */
  def windowMoving(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (orderkey, linenumber) is not unique in the fixture — include
    // l_partkey + l_extendedprice so the frame order is total.
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey",
        "l_extendedprice")
    Tables.lineitem(spark, sfDir)
      .filter(col("l_suppkey") <= 5)
      .withColumn("moving_sum3",
        sum(col("l_extendedprice").cast(Dec2))
          .over(w.rowsBetween(-2, 0)).cast(DoubleType))
      .withColumn("prev_price", lag(col("l_extendedprice"), 1).over(w))
      .select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
        "l_partkey", "l_extendedprice", "moving_sum3", "prev_price")
      .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
        "l_partkey", "l_extendedprice")
  }

  /** X4: value-RANGE frame window — peers defined by the ordering
    * VALUE (±2 quantity units), not row positions, so the result is
    * tie-order independent by construction. */
  def windowRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_returnflag").orderBy(col("l_quantity"))
      .rangeBetween(-2, 2)
    Tables.lineitem(spark, sfDir)
      .filter(col("l_suppkey") <= 3)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_returnflag"), col("l_quantity"))
      .withColumn("n_near_qty", count(lit(1)).over(w))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
        "l_returnflag")
  }

  /** X5: exact distinct counts per group (expand + two-phase aggregate). */
  def distinctAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** X5: approximate distinct (HyperLogLog++) — constant memory per group
    * vs the expand of exact distinct; the 100 TB default. Sketch values
    * are engine-specific → no DuckDB oracle (rows-only check).
    */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
      .orderBy("l_returnflag")

  /** X5: exact per-group median via rank arithmetic — integer-exact
    * order statistics, portable across engines (interpolating
    * `percentile` built-ins differ in float arithmetic). */
  def medianAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    val wn = Window.partitionBy("l_returnflag")
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy("l_returnflag")
      .agg(((max(when(col("rn") === expr("(n+1) div 2"), col("l_quantity")))
        + max(when(col("rn") === expr("n div 2 + 1"), col("l_quantity"))))
        / 2.0).as("median_qty"))
      .orderBy("l_returnflag")
  }

  /** X5: approximate percentiles (GK sketch) — the constant-memory
    * distributed path for quantiles at 100 TB. Sketch-dependent values →
    * rows-only check; the quartile array is exploded to scalar rows
    * `(l_returnflag, quantile, value)` so the dump stays sortable.
    *
    * `accuracy` is the scale knob: rank error is ≤ 1/accuracy, but the
    * final merge per group processes one partial sketch PER SCAN
    * PARTITION, each O(accuracy) — cost ∝ partitions × accuracy (the
    * measured sf1 outlier in BENCH_NOTES: 0.6→9.8 s when 8 MB splits
    * multiplied the partition count at accuracy 10000). 2500 keeps
    * rank error at 0.04 % and cuts the merge constant 4×; raise it
    * when the answer needs tighter tails, lower the split-derived
    * partition count when it needs both. */
  def approxPercentiles(spark: SparkSession, sfDir: String,
                        accuracy: Int = 2500): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(accuracy))
        .as("price_quartiles"))
      .select(col("l_returnflag"),
        posexplode(col("price_quartiles")).as(Seq("pos0", "value")))
      .select(col("l_returnflag"),
        ((col("pos0") + 1) * 0.25).as("quantile"), col("value"))
      .orderBy("l_returnflag", "quantile")

  /** SCD Type-2 history build: compress each user's event-type timeline
    * into state intervals — a row per state CHANGE with effective-from/
    * effective-to bounds (open-ended for the current state). The classic
    * warehouse dimension-history op, as two window passes over a total
    * (ts, event_id) order: lag() finds the change points, lead() over
    * the change rows closes each interval. Per-user partitions bound the
    * sorts; no global stage.
    */
  def scd2History(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val changes = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull
        || col("prev_type") =!= col("event_type"))
    changes
      .withColumn("eff_to", lead("ts", 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("eff_from"),
        date_format(col("eff_to"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("eff_to"))
      // TOTAL presentation order (all output columns): two state changes
      // in the same microsecond must still dump identically across
      // engines and shardings
      .orderBy("user_id", "eff_from", "state", "eff_to")
  }

  /** X18: equi-width histogram of a measure — the distribution profile a
    * pipeline health check renders. Fixed bucket width in exact
    * arithmetic (integer-safe: a 2-decimal price can't round across a
    * 5000 boundary in IEEE division), one map-side-combinable aggregate;
    * buckets with no rows are absent by construction (sparse output, not
    * a dense zero-filled domain).
    */
  def histogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(floor(col("l_extendedprice") / 5000).cast(IntegerType)
        .as("bucket"), col("l_extendedprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("l_extendedprice").as("lo"),
        max("l_extendedprice").as("hi"))
      .orderBy("bucket")

  /** X18: statistical outlier flagging — the data-quality filter that
    * drops anomalous measurements before training (|x − μ| > k·σ per
    * group), re-expressed with NO floating-point statistics: values
    * quantize to exact integer centi-units, per-group (n, Σq, Σq²) are
    * exact integer sums, and the z-test compares SQUARES —
    *
    * {{{ (q·n − Σq)² > k² · (n·Σq² − (Σq)²) }}}
    *
    * — which is |q−μ| > k·σ_pop multiplied out by n², so no sqrt, no
    * division, no float accumulation anywhere; the oracle replays the
    * integer comparison bit-for-bit. The squared sides can exceed 2^63
    * at corpus scale, so the comparison runs in DECIMAL(38,0)
    * (HUGEINT in the oracle) — exact integers either way.
    *
    * 100 TB shape: one map-side-combined stats aggregate (groups =
    * event types, a handful), stats broadcast back, and membership is a
    * shuffle-free per-row integer predicate — the mixture-sampling
    * shape: the corpus is never repartitioned.
    */
  def outlierEvents(spark: SparkSession, sfDir: String,
                    k: Int = 3): DataFrame = {
    val dec = DecimalType(38, 0)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("value") * 100).cast(LongType).as("q"))
    // Σq² aggregates in DECIMAL from the start: the per-row q·q product
    // would wrap in Long arithmetic (non-ANSI) before any later cast
    // could save it once |value| reaches ~1e8
    val stats = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("q").as("sq"),
        sum(col("q").cast(dec) * col("q").cast(dec)).as("sq2"))
    val lhs = col("q").cast(dec) * col("n").cast(dec) - col("sq").cast(dec)
    val rhs = col("n").cast(dec) * col("sq2").cast(dec) -
      col("sq").cast(dec) * col("sq").cast(dec)
    ev.join(broadcast(stats), "event_type")
      .filter(lhs * lhs > lit(k.toLong * k).cast(dec) * rhs)
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** X4: window distribution functions — ntile bucketing, percent_rank,
    * cume_dist over a TOTAL per-partition order (unique tiebreak), so
    * every rank is tie-free and the rational rank arithmetic
    * ((rn−1)/(n−1), rn/n, equal-split tiles) is engine-exact.
    */
  def windowDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_returnflag")
      .orderBy("l_quantity", "l_orderkey", "l_linenumber", "l_partkey")
    Tables.lineitem(spark, sfDir)
      .filter(col("l_suppkey") <= 3)
      .select(col("l_returnflag"), col("l_quantity"), col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"))
      .withColumn("qtile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber",
        "l_partkey")
  }

  /** X5: EXACT discrete quartiles by rank arithmetic — the exact,
    * hash-matchable twin of [[approxPercentiles]]'s GK sketch (which is
    * engine-specific and so only rows-checked). Each quartile p = k/4 is
    * the value at rank ⌈p·n⌉ (percentile_disc semantics), computed with
    * integer arithmetic only — `(k·n+3) div 4` — so both engines pick
    * the identical element: no interpolation, no float rank. Two window
    * passes per group partition (rank + count), then one aggregate; at
    * scale the partition key bounds the sort. */
  def exactQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_returnflag")
      .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    val wn = Window.partitionBy("l_returnflag")
    val ranked = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
    ranked.groupBy("l_returnflag")
      .agg(
        max(when(col("rn") === expr("(1*n+3) div 4"), col("l_extendedprice")))
          .as("q25"),
        max(when(col("rn") === expr("(2*n+3) div 4"), col("l_extendedprice")))
          .as("q50"),
        max(when(col("rn") === expr("(3*n+3) div 4"), col("l_extendedprice")))
          .as("q75"))
      .orderBy("l_returnflag")
  }

  /** X16: batch interval join at scale — purchases matched to the same
    * user's clicks in the preceding hour. A naive plan joins on user_id
    * alone and filters the time predicate AFTER pairing (per-user
    * cross-product — quadratic in events-per-user, the classic range-join
    * trap Spark's equi-join planner can't avoid on its own). This plan
    * BUCKETS time by the interval length: each click lands in one hour
    * bucket, each purchase probes its own and the previous bucket
    * (`[ts−1h, ts]` spans at most two), so the join is a pure equi-join
    * on (user, bucket) with the exact interval refined afterwards —
    * candidate volume drops from |user-group|² to pairs within adjacent
    * buckets. A purchase's two probe buckets are distinct, so no pair
    * can match twice: no dedup pass needed. Same result as the
    * stream-stream join `x12d` (one-batch equivalence).
    */
  def intervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val us = unix_micros(col("ts"))
    val HourUs = 3600L * 1000000L
    // integer div, NOT `/`: double division can round across a bucket
    // boundary at epoch-micros magnitudes (same pitfall as x13d)
    val bucketOf = expr(s"unix_micros(ts) div $HourUs")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), us.as("c_us"),
        col("event_id").as("click_id"), bucketOf.as("bucket"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), us.as("p_us"),
        col("event_id").as("purchase_id"),
        explode(array(bucketOf, bucketOf - 1)).as("bucket"))
    purchases.join(clicks,
        col("p_user") === col("c_user") &&
          purchases("bucket") === clicks("bucket") &&
          col("c_us") <= col("p_us") &&
          col("c_us") >= col("p_us") - HourUs)
      .select(col("purchase_id"), col("click_id"),
        col("p_user").as("user_id"))
      .orderBy("purchase_id", "click_id")
  }

  /** X6: pivot with explicit key values (no driver-side distinct pass —
    * at scale, always enumerate the pivot domain). */
  def pivotAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .orderBy("l_returnflag")

  /** X6: unpivot/melt — wide measures to long (id, measure, val). */
  def unpivotMeasures(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_suppkey") <= 2)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber"), col("l_partkey")),
        Array(col("l_quantity"), col("l_extendedprice")),
        "measure", "val")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "measure", "val")

  /** Data profiling: per-measure column statistics in one pass over the
    * unpivoted measures (count, distinct, min/max, exact mean) — the
    * data-quality summary a pipeline runs before training on a new
    * source.
    */
  def profileMeasures(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .unpivot(Array.empty[org.apache.spark.sql.Column],
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "measure", "val")
      .groupBy("measure")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("val")).as("n_distinct"),
        min(col("val")).as("min_val"), max(col("val")).as("max_val"),
        davg(col("val")).as("mean_val"))
      .orderBy("measure")

  /** X6: rollup — multi-granularity totals in one pass. */
  def rollupAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** X6: cube — all grouping-set combinations. */
  def cubeAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy("status", "priority")

  /** X7: set operations — UNION (distinct), INTERSECT, EXCEPT over two
    * customer-key sets, tagged and stacked into one result.
    */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val rich = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") > 5000).select("c_custkey")
    val bigSpenders = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("c_custkey")).distinct()
    val u = rich.union(bigSpenders).distinct().withColumn("op", lit("union"))
    val i = rich.intersect(bigSpenders).withColumn("op", lit("intersect"))
    val e = rich.except(bigSpenders).withColumn("op", lit("except"))
    val ia = rich.intersectAll(bigSpenders).withColumn("op", lit("intersect_all"))
    val ea = rich.exceptAll(bigSpenders).withColumn("op", lit("except_all"))
    u.union(i).union(e).union(ia).union(ea)
      .select("op", "c_custkey")
      .orderBy("op", "c_custkey")
  }

  /** X16: as-of join (event-time attribution) — each `purchase` event
    * matched to the same user's most recent prior-or-simultaneous
    * `click`. Composed from a tagged union + running `last_value` over
    * the merged timeline (SURVEY §7.4 preference (a): builtins express
    * the semantics — one shuffle on user_id, no custom physical
    * operator needed). The classic join for attribution/feature
    * pipelines; at scale it stays a single keyed window, never a range
    * cross join.
    */
  def asofAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
    // clicks sort before purchases at the same (ts) via the tag so a
    // simultaneous click is visible to the purchase.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_type"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        date_format(col("last_click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("click_ts"))
      .orderBy("user_id", "purchase_ts", "event_id")
  }

  /** X8: string scalar functions over `part`. */
  def stringFns(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"),
        replace(col("p_name"), lit(" "), lit("_")).as("name_snake"))
      .filter(col("p_name").contains("a"))
      .orderBy("p_partkey")

  /** X8: date/time scalar functions over `orders`. */
  def dateFns(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        dayofmonth(col("o_orderdate")).as("order_day"),
        (weekday(col("o_orderdate")) + 1).as("order_isodow"),
        date_format(date_add(to_date(col("o_orderdate")), 30), "yyyy-MM-dd")
          .as("due_date"))
      .orderBy("o_orderkey")

  /** X8: math scalar functions (boundary-safe choices only — see
    * SURVEY §7.5 on cross-engine float traps).
    */
  def mathFns(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_suppkey") <= 3)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        floor(col("l_extendedprice")).cast(LongType).as("price_floor"),
        ceil(col("l_extendedprice")).cast(LongType).as("price_ceil"),
        round(col("l_discount") * 100).cast(LongType).as("disc_pct"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "price_floor",
        "disc_pct")

  /** X8: JSON extraction over `events.props` + grouped exact sums. */
  def jsonFns(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).cast(LongType).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** X8: map scalar functions — build a typed map per event, then
    * extract/inspect it (MapType round-trip through columnar ops). */
  def mapFns(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        map(lit("type"), col("event_type"),
          lit("k"), get_json_object(col("props"), "$.k")).as("m"))
      .select(col("event_id"),
        element_at(col("m"), "type").as("type_val"),
        element_at(col("m"), "k").cast(IntegerType).as("k_val"),
        size(col("m")).as("m_size"),
        array_join(map_keys(col("m")), ",").as("keys"))
      .orderBy("event_id")

  /** X8: regexp scalar functions (patterns restricted to constructs
    * with identical semantics in Java regex and RE2). */
  def regexpFns(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "[a-z]+", 0).as("first_word"),
        regexp_replace(col("p_type"), "[AEIOU]", "_").as("type_devoweled"),
        col("p_brand").rlike("[0-9]$").cast(IntegerType).as("brand_ends_digit"))
      .orderBy("p_partkey")

  /** X8: higher-order array functions (lambda transforms executed per
    * row inside codegen — the array-processing surface LLM pipelines
    * lean on). Counts/sums over int-quantized values keep it exact. */
  def higherOrderFns(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        size(filter(col("embedding"), x => x > 0)).as("n_positive"),
        aggregate(
          transform(col("embedding"),
            x => round(x.cast(DoubleType) * 1000000).cast(LongType)),
          lit(0L), (acc, x) => acc + abs(x)).as("l1_q"),
        size(filter(col("embedding"), x => abs(x) > lit(0.1f))).as("n_large"))
      .orderBy("vec_id")

  /** X8: array scalar functions over the embedding vectors. */
  def arrayFns(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(
        col("vec_id"),
        size(col("embedding")).as("n_dims"),
        element_at(col("embedding"), 1).as("first_dim"),
        array_max(col("embedding")).as("max_dim"),
        array_min(col("embedding")).as("min_dim"))
      .orderBy("vec_id")

  /** X22: time-series resample + forward-fill (the downsample-to-grid /
    * gap-fill workhorse): per-user daily buckets, a dense per-user day
    * grid spanning [min, max] observed day, and last-observation-
    * carried-forward for the gaps.
    *
    * 100 TB shape: every exchange is KEYED on user_id-prefixed keys
    * (bucket aggregate, grid aggregate, fill window — plan-asserted
    * ≤3 hash exchanges, no cartesian); after the first aggregate the
    * relation is bucket-grained, ≈ users × span-days rows independent
    * of event count, so resampling 10× the events over the same
    * calendar span shuffles ZERO extra grid rows. Fill is
    * decimal-exact [[Exact.dsum]] per bucket.
    */
  def resampleFfill(spark: SparkSession, sfDir: String): DataFrame =
    resampleOf(Tables.events(spark, sfDir)).orderBy("user_id", "day")

  /** The resample body over an arbitrary events relation — the grid,
    * fill, and flags are USER-LOCAL (each output row depends only on
    * that user's events), which is what makes [[resampleIncremental]]'s
    * keyed partition refresh exact. */
  private def resampleOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val obs = events
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(dsum(col("value")).as("day_value"))
    val grid = obs.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
          .as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "day"), "left")
      .select(col("user_id"),
        // date STRING, not timestamp: events-derived timestamps write as
        // parquet ns and defeat the oracle's value compare (the x16
        // string-ts convention)
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"),
        when(col("day_value").isNull, 1).otherwise(0).cast(IntegerType)
          .as("is_gap"))
  }

  /** X22b: INCREMENTAL resample maintenance — the materialized-view
    * refresh shape for a growing event log. The "historical" grid
    * (events below an id threshold) is materialized once per (session,
    * fixture); a CDC batch of new events then refreshes ONLY the grids
    * of users it touches: untouched users' rows are SERVED FROM the
    * materialization (anti-join — no event rescan), touched users
    * recompute from their full history (semi-join, keyed). Because the
    * resample is user-local ([[resampleOf]]), the refreshed union is
    * EXACTLY the full recompute — certified by running this
    * incremental path against the same full-computation DuckDB oracle
    * as x22.
    *
    * 100 TB shape: refresh cost scales with the BATCH's user
    * footprint (|touched users| × their history), not the corpus; the
    * materialized base is the snapshot-table analog of x10k's
    * committed assignment table.
    */
  def resampleIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val t = graft.util.SessionMemo.memoizedValue(
      spark, s"resampleEventThreshold|$sfDir") {
      val n = ev.agg(max(col("event_id"))).first().getLong(0) + 1L
      n - n / 4
    }
    // the pre-batch materialization (in production: a committed
    // snapshot); users × span-days rows — eager checkpoint per the
    // SessionMemo contract
    val base = graft.util.SessionMemo.memoized(
      spark, s"resampleBase|$sfDir") {
      resampleOf(ev.filter(col("event_id") < t)).localCheckpoint()
    }
    // tiny (distinct users of one CDC batch) and consumed by BOTH joins
    // — checkpoint so each consumer reads the set, not the event log
    val touched = ev.filter(col("event_id") >= t)
      .select("user_id").distinct().localCheckpoint()
    val kept = base.join(touched, Seq("user_id"), "left_anti")
    val refreshed = resampleOf(
      ev.join(touched, Seq("user_id"), "left_semi"))
    kept.unionByName(refreshed).orderBy("user_id", "day")
  }

  /** X24: mergeable distinct-count sketches (Datasketches HLL via the
    * native `hll_sketch_agg`) — the scale pattern for distinct users:
    * build one sketch PER DAY in a single pass, then answer any date-
    * range distinct-count by MERGING sketches (`hll_union_agg`),
    * never rescanning the event log. Unlike `approx_count_distinct`
    * (one-shot estimate, x05b), the sketch is a first-class mergeable
    * column — the committed per-day sketch table is the production
    * analog of a snapshot-maintained rollup.
    *
    * No SQL oracle (DuckDB has no wire-compatible HLL): the driver
    * records rows-only; the ERROR BOUND vs exact COUNT(DISTINCT) and
    * the merge-vs-direct consistency are spec-pinned (EdgeCaseSpec).
    */
  def sketchRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
    val perDay = daily.select(col("day"),
      hll_sketch_estimate(col("sk")).as("est_users"))
    val merged = daily
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as("est_users"))
      .select(lit("(all)").as("day"), col("est_users"))
    perDay.unionByName(merged).orderBy("day")
  }

  /** X23: BATCH sessionization (the 30-minute-gap session windows of
    * the x13b STREAMING sessionizer, as one relational pass for
    * backfill/reprocessing): a session starts where the gap to the
    * previous event REACHES the threshold — `>=`, the `session_window`
    * convention (its window end is exclusive: an event exactly at
    * last + gap opens a new session), so batch backfill and the
    * streaming sessionizer agree event-for-event (spec-pinned in
    * StreamingSpec). Session ids are the running count of session
    * starts. Gap arithmetic is exact BIGINT microseconds
    * (`unix_micros` here, `epoch_us` in the oracle) — a seconds-
    * truncating cast would misclassify sub-second boundary gaps
    * differently per engine.
    *
    * 100 TB shape: one shuffle on user_id; both windows (lag, running
    * sum) and the final per-session aggregate share that partitioning.
    * Ties on ts break by event_id so sessions are deterministic.
    */
  def batchSessions(spark: SparkSession, sfDir: String,
                    gapUs: Long = 1800000000L): DataFrame =
    sessionsOf(Tables.events(spark, sfDir), gapUs)
      .orderBy("user_id", "sess_id")

  /** The sessionization body over an arbitrary events relation —
    * USER-LOCAL like [[resampleOf]] (a user's sessions depend only on
    * that user's events), so [[sessionsIncremental]]'s keyed refresh
    * is exact. */
  private def sessionsOf(events: DataFrame, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(ord))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") >= gapUs, 1).otherwise(0))
      .withColumn("sess_id",
        sum("new_sess").over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(LongType))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        // exact epoch-µs BIGINTs (the x16 portable-ts convention)
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
  }

  /** X23c: snapshot-MAINTAINED session table — [[sessionsIncremental]]
    * taken to its 100 TB conclusion. x23b refreshes correctly but still
    * pays O(corpus) to EMIT the whole refreshed relation each call; a
    * production session table is a SNAPSHOT TABLE range-laid on
    * `user_id` with per-file stats, and a CDC batch MAINTAINS it with a
    * file-granular [[Snapshot.mergeCommit]]: only the touched users'
    * sessions recompute (their full history, semi-join — session
    * identity is user-local), and only the FILES whose `user_id`
    * interval contains a touched user rewrite; everything else rides
    * into the new version by manifest reference (the of22 write-path
    * economics composed with sessionization). The CDC batch here is
    * the last ~1% of event ids — the new-arrivals shape, whose users
    * sit at the top of the key space, so the merge's touch set is
    * naturally clustered exactly like x10k's insert-only delta.
    * Certified equal to the full recompute by x23's own oracle: base
    * (pre-threshold users' sessions) ∪ refresh (touched users' full
    * history) IS the full session table because `touched` is defined
    * as every user with a post-threshold event. Multi-row merge keys
    * are exercised deliberately — `mergeCommit` replaces ALL of a
    * matching user's session rows with the batch's (anti-join on key,
    * union), the semantics a per-user table needs. */
  def sessionsMaintained(spark: SparkSession, sfDir: String,
                         gapUs: Long = 1800000000L): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val t = graft.util.SessionMemo.memoizedValue(
      spark, s"sessMaintThreshold|$sfDir") {
      val n = Layout.footerMaxLong(spark, s"$sfDir/events.parquet",
          "event_id")
        .getOrElse(ev.agg(max(col("event_id"))).first().getLong(0)) + 1L
      n - math.max(1L, n / 100L)
    }
    val touched = ev.filter(col("event_id") >= t)
      .select("user_id").distinct().localCheckpoint()
    // the maintained table: one commit per (session, fixture, gap) —
    // in production this is the long-lived table, here a session-scoped
    // venue in exit-GC'd scratch
    val root = graft.util.SessionMemo.memoizedValue(
      spark, s"sessTableRoot|$sfDir|$gapUs") {
      val dir = graft.util.Scratch.dir("graft_sesstbl_") + "/sessions"
      // the base holds every user's PRE-threshold sessions — touched
      // users' rows are STALE by construction (a new event can extend,
      // merge, or split their sessions) and the merge must REPLACE
      // them, which is the maintenance shape under test
      val base = sessionsOf(ev.filter(col("event_id") < t), gapUs)
      // sessions ≤ events; width from the upper bound — footer
      // metadata, not a count job (r14)
      val width = graft.operators.Snapshot.derivedCommitFiles(
        Layout.footerRowCount(spark, s"$sfDir/events.parquet"))
      graft.operators.Snapshot.commitWithStats(
        base.repartitionByRange(width, col("user_id"))
          .sortWithinPartitions("user_id", "sess_id"),
        dir, Seq("user_id"))
      dir
    }
    val refreshed = sessionsOf(
      ev.join(touched, Seq("user_id"), "left_semi"), gapUs)
    graft.operators.Snapshot.mergeCommit(spark, root, refreshed, "user_id")
    graft.operators.Snapshot.readCurrent(spark, root)
      .orderBy("user_id", "sess_id")
  }

  /** X23b: INCREMENTAL sessionization — [[resampleIncremental]]'s
    * materialized-refresh shape applied to the session table. A new
    * event can extend, merge, or split ONLY its own user's sessions
    * (session ids are per-user running counts), so the CDC batch's
    * touched users recompute from their history while everyone else is
    * served from the checkpointed base — certified equal to the full
    * recompute via x23's own oracle. The production pair: the
    * change-feed read (`of7`) supplies exactly this touched-user set.
    */
  def sessionsIncremental(spark: SparkSession, sfDir: String,
                          gapUs: Long = 1800000000L): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val t = graft.util.SessionMemo.memoizedValue(
      spark, s"resampleEventThreshold|$sfDir") {
      val n = ev.agg(max(col("event_id"))).first().getLong(0) + 1L
      n - n / 4
    }
    val base = graft.util.SessionMemo.memoized(
      spark, s"sessionsBase|$sfDir|$gapUs") {
      sessionsOf(ev.filter(col("event_id") < t), gapUs).localCheckpoint()
    }
    val touched = ev.filter(col("event_id") >= t)
      .select("user_id").distinct().localCheckpoint()
    val kept = base.join(touched, Seq("user_id"), "left_anti")
    val refreshed = sessionsOf(
      ev.join(touched, Seq("user_id"), "left_semi"), gapUs)
    kept.unionByName(refreshed).orderBy("user_id", "sess_id")
  }
}
