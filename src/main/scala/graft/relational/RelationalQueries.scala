package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator coverage (SURVEY.md §2.7).
  *
  * The reference engine has no relational layer at all (verified in
  * SURVEY §2.7 — no SQL, no DataFrame usage); these capabilities come
  * from Spark SQL itself. Each query here is a `SparkEntry.queries`
  * entry with a DuckDB oracle, exercising one §2.7 checklist row over
  * the driver's TPC-H-ish parquet tables.
  *
  * Scale notes (100 TB discipline):
  *  - dimension joins (`region`, `nation`, `supplier`, `customer`) are
  *    explicitly `broadcast()` so no shuffle of the fact side occurs;
  *  - aggregations are plain `groupBy().agg()` → partial + final hash
  *    aggregation with map-side combine, no `groupByKey`;
  *  - top-k is `orderBy().limit(k)` → `TakeOrderedAndProject`
  *    (per-partition heap + driver merge), never a global sort;
  *  - every output is deterministically ordered and doubles are rounded
  *    so the driver's hash compare is stable across partitionings.
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables(spark, dir, name)

  /** Exact decimal summation for float aggregates that get rounded for
    * the hash compare. A double sum is order-dependent (parallel
    * partial sums here vs DuckDB's sequential scan), and a last-ulp
    * difference that straddles a rounding boundary flips the rounded
    * value — observed on q19 revenue at sf0.001: true sum ≈289145.575,
    * one engine rounded .57, the other .58. Casting each row to
    * DECIMAL(30,8) first (exact: the source values carry ≤8 decimal
    * digits of true precision) makes the sum exact and
    * order-independent in both engines; cast back to double keeps the
    * compared schema DOUBLE. Mirrored verbatim in the oracle SQL. */
  private def decSum(e: Column, scale: Int): Column =
    round(sum(e.cast(DecimalType(30, 8))), scale).cast("double")

  /** Exact-sum average: decimal sum (order-independent) divided as
    * double — both engines then divide identical inputs. */
  private def decAvg(e: Column, scale: Int): Column =
    graft.functions.Rounding.roundEven(
      sum(e.cast(DecimalType(30, 8))).cast("double") / count(e), scale)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- aggregation: TPC-H Q1 pricing summary (partial+final hash agg) ---
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          decSum(col("l_extendedprice"), 2).as("sum_base_price"),
          decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("sum_disc_price"),
          graft.functions.Rounding.roundEven(avg(col("l_quantity")), 4).as("avg_qty"),
          decAvg(col("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // --- filter + projection (predicate/column pushdown to parquet scan) ---
    "q2_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * col("l_discount"), 4).as("revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // --- fact-fact join + broadcast dim join + agg + top-k ---
    "q3_join_topk" -> ((s, dir) => {
      val cust = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // --- multi-way broadcast dimension join ---
    "q4_dim_join" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      sup.join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"), col("r_name"))
        .orderBy(col("s_suppkey"))
    }),

    // --- window functions: rank + running sum per customer ---
    "q5_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          round(sum(col("o_totalprice").cast(DecimalType(30, 8))).over(w), 2)
            .cast("double").as("running_total"))
        .where(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // --- rollup ---
    "q6_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // --- cube ---
    "q7_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), decAvg(col("o_totalprice"), 2).as("avg_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    // --- grouping sets (SQL surface) ---
    "q8_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(1) AS n
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    }),

    // --- sort + limit (TakeOrderedAndProject, no global sort) ---
    "q9_sort_limit" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)
    }),

    // --- set operations: union / intersect / except ---
    "q10_setops" -> ((s, dir) => {
      val ordCust = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val building = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
      val auto = t(s, dir, "customer").where(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("k"))
      ordCust.intersect(building).union(auto.except(ordCust.distinct()))
        .distinct().orderBy(col("k"))
    }),

    // --- scalar functions: string / date / math / array ---
    "q11_scalar_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_up"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type_pfx"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          round(sqrt(col("p_retailprice")), 4).as("price_sqrt"),
          round(log1p(col("p_retailprice")), 4).as("price_log1p"),
          pmod(col("p_size"), lit(7)).as("size_mod"),
          abs(col("p_size") - 25).as("size_dist"),
          size(split(col("p_name"), " ")).as("name_words"))
        .orderBy(col("p_partkey"))
    }),

    // --- date/time functions over orders ---
    "q12_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
        .orderBy(col("o_orderkey"))
    }),

    // --- distinct aggregates + having ---
    "q13_distinct_having" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .where(col("n_rows") > 100)
        .orderBy(col("l_returnflag"))
    }),

    // --- semi + anti join ---
    "q14_semi_anti" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders").where(col("o_totalprice") > 200000)
      val withBig = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("has_big").as("tag"))
      val without = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("no_big").as("tag"))
      withBig.union(without).orderBy(col("c_custkey"))
    }),

    // --- tumbling event-time windows (batch form of the streaming agg) ---
    "q15_events_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), decSum(col("value"), 4).as("sum_value"))
        .select(col("w.start").cast("long").as("win_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    // --- sessionization: 30-min-gap sessions per user (gaps-and-islands) ---
    "q16_events_session" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(byUser))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("session_start"),
          max(unix_micros(col("ts"))).as("session_end"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // --- TPC-H Q5-class 6-way join: Catalyst join reordering +
    //     broadcast dims; local-supplier revenue per nation ---
    "q19_multijoin" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region").where(col("r_name").isin("ASIA", "EUROPE"))
      cust.join(ord, cust("c_custkey") === ord("o_custkey"))
        .join(li, ord("o_orderkey") === li("l_orderkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey") &&
          cust("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // --- JSON scalar extraction (props is a JSON string column);
    //     regexp-based so the DuckDB oracle needs no JSON extension ---
    "q18_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k_val",
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k_val")).as("sum_k"),
          graft.functions.Rounding.roundEven(avg(col("k_val")), 4).as("avg_k"))
        .orderBy(col("event_type"))
    }),

    // --- correlated EXISTS subquery (TPC-H Q4 shape): Catalyst
    //     rewrites the subquery to a left-semi join on l_orderkey ---
    "q20_exists_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_q20")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q20")
      s.sql(
        """SELECT o_orderpriority, count(1) AS n
          |FROM orders_q20
          |WHERE EXISTS (
          |  SELECT 1 FROM lineitem_q20
          |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    }),

    // --- correlated scalar-aggregate subquery (TPC-H Q17 shape):
    //     per-brand average via subquery → Catalyst plans one
    //     aggregated build side joined back on the correlation key ---
    "q21_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part_q21")
      s.sql(
        """SELECT p_partkey, p_brand, p_retailprice
          |FROM part_q21 p
          |WHERE p_retailprice > 1.1 * (
          |  SELECT avg(p2.p_retailprice) FROM part_q21 p2 WHERE p2.p_brand = p.p_brand)
          |ORDER BY p_partkey""".stripMargin)
    }),

    // --- uncorrelated scalar subquery + NOT EXISTS (TPC-H Q22 shape):
    //     above-average-balance customers who never ordered ---
    "q22_anti_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_q22")
      t(s, dir, "orders").createOrReplaceTempView("orders_q22")
      s.sql(
        """SELECT c_mktsegment, count(1) AS n_cust,
          |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_bal
          |FROM customer_q22 c
          |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE)
          |                     / count(c_acctbal)
          |                   FROM customer_q22 WHERE c_acctbal > 0)
          |  AND NOT EXISTS (SELECT 1 FROM orders_q22 WHERE o_custkey = c_custkey)
          |GROUP BY c_mktsegment
          |ORDER BY c_mktsegment""".stripMargin)
    }),

    // --- ordered-set aggregates: exact interpolated percentiles
    //     (Spark `percentile` == DuckDB quantile_cont); the
    //     approx_percentile sketch is the 100 TB path but is not
    //     hash-comparable across engines, so the entry pins the exact
    //     form and rounds to absorb interpolation float noise ---
    "q25_percentiles" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
          round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95_price"))
        .orderBy("l_returnflag")),

    // --- approx_percentile: the 100 TB path next to q25's exact form
    //     (bounded GK sketch state instead of buffering every value
    //     per group). The sketch values differ across engines, so the
    //     entry materializes the accuracy CONTRACT instead: each
    //     approx quantile must sit within tolerance of the exact one
    //     (|Δ| <= 1.0 for the discrete 1..50 quantity; 1% relative
    //     for the continuous price tail — both far above the rank-
    //     epsilon bound of accuracy=10000), and the oracle pins those
    //     booleans TRUE per group. ---
    "q26_approx_percentiles" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("ap50"),
          expr("percentile(l_quantity, 0.5)").as("ep50"),
          expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("ap95"),
          expr("percentile(l_extendedprice, 0.95)").as("ep95"))
        .select(col("l_returnflag"),
          (abs(col("ap50") - col("ep50")) <= 1.0).as("p50_ok"),
          (abs(col("ap95") / col("ep95") - 1.0) <= 0.01).as("p95_ok"))
        .orderBy("l_returnflag")),

    // --- salted two-phase aggregation (skew path): identical result
    //     to a plain groupBy, but one hot key spreads over 8 reducers
    //     before the final combine — the explicit-salt fallback for
    //     when AQE's skew handling can't help (pre-aggregation). The
    //     summed values are small integers in doubles, so the result
    //     is association-exact and oracle-checkable. ---
    "q23_skew_agg" -> ((s, dir) =>
      graft.functions.SkewUtils
        .saltedSumCount(t(s, dir, "lineitem"), "l_returnflag", "l_quantity", nSalts = 8)
        .select(col("l_returnflag"), round(col("sum"), 2).as("sum_qty"),
          col("count").as("n"))
        .orderBy("l_returnflag")),

    // --- pivot (wide aggregation): order counts per status x priority;
    //     oracle uses portable conditional aggregation ---
    "q24_pivot" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("o_orderstatus"), col("1-URGENT").as("p1"), col("2-HIGH").as("p2"),
          col("3-MEDIUM").as("p3"), col("4-NOT SPECIFIED").as("p4"), col("5-LOW").as("p5"))
        .orderBy("o_orderstatus")),

    // --- native session_window operator (batch form of the streaming
    //     sessionization; window end = last event + gap) ---
    "q17_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), decSum(col("value"), 4).as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start"),
          unix_micros(col("w.end")).as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // --- salted equi-join (skew fallback): the 150 hot user keys
    //     spread over (key, salt) reducers, dim side replicated
    //     nSalts times; identical result to the plain join ---
    "q27_skew_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("value"), col("event_id"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.functions.SkewUtils
        .saltedJoin(ev, cust, Seq("user_id"), nSalts = 8, saltBy = Seq(col("event_id")))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"), decSum(col("value"), 4).as("sum_value"))
        .orderBy("c_mktsegment")
    }),

    // --- staged funnel (view -> click -> purchase, each stage
    //     strictly after the previous): three per-user aggregations
    //     co-partitioned on user_id (AQE reuses the exchange), never
    //     a per-event sequence scan — stage columns stay one row per
    //     user at any corpus size ---
    "q28_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
      val u1 = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val u2 = ev.where(col("event_type") === "click").join(u1, "user_id")
        .where(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val u3 = ev.where(col("event_type") === "purchase").join(u2, "user_id")
        .where(col("ts") > col("t2"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      val stages = Seq(("1_view", u1), ("2_click_after_view", u2),
        ("3_purchase_after_click", u3))
      stages.map { case (name, df) =>
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
      }.reduceLeft(_ unionAll _).orderBy("stage")
    }),

    // --- daily resample with gap fill: per-user daily grid between
    //     first and last activity, missing days zero-filled, last
    //     event type forward-filled. Grid rows explode in-row from
    //     one sequence() per user (span-bounded, never corpus-bounded)
    //     and the fill is one window over the user's own days ---
    "q29_resample" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"), decSum(col("value"), 4).as("sum_value"),
          max(struct(col("ts"), col("event_id"), col("event_type")))
            .getField("event_type").as("day_last_type"))
      val grid = daily.groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"),
          last(col("day_last_type"), ignoreNulls = true).over(w).as("last_type"))
        .orderBy("user_id", "day")
    }),

    // --- as-of join (point-in-time lookup): each purchase joined to
    //     the user's latest click at or before it — union + window,
    //     ONE shuffle, no join node, no row amplification
    //     (TemporalJoins scaladoc has the scale argument). Clicks are
    //     pre-deduped to one per (user, ts) so the at-instant winner
    //     is engine-independent. ---
    "asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.where(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
      TemporalJoins.asofJoin(purchases, clicks, Seq("user_id"), "ts",
          valueCols = Seq("click_id"), rightOrd = "click_id")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("asof_click_id"))
        .orderBy("event_id")
    }),

    // --- interval aggregate (range join + count, joinlessly): clicks
    //     per user within the hour before each purchase, via a RANGE
    //     frame over the unioned event stream — the inequality-join
    //     formulation amplifies rows and plans as a nested loop;
    //     this is one shuffle and zero amplification. ---
    "range_join_count" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      TemporalJoins.rangeCount(purchases, clicks, Seq("user_id"), "ts",
          horizonMicros = 3600L * 1000000L)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("n_right").as("n_clicks_1h"), col("last_right_us").as("last_click_us"))
        .orderBy("event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_disc_price,
        |  round_even((avg(l_quantity)) * 1e4, 0) / 1e4 AS avg_qty,
        |  round_even((CAST(sum(CAST(l_discount AS DECIMAL(30,8))) AS DOUBLE) / count(l_discount)) * 1e4, 0) / 1e4 AS avg_disc,
        |  count(1) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * l_discount, 4) AS revenue
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q3_join_topk" ->
      """SELECT l_orderkey,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q4_dim_join" ->
      """SELECT s_suppkey, s_name, n_name, r_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY s_suppkey""".stripMargin,

    "q5_window" ->
      """SELECT o_custkey, o_orderkey, rn, running_total FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
        |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
        |  FROM orders) x
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q6_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(1) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q7_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(1) AS n,
        |  round_even((CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) / count(o_totalprice)) * 1e2, 0) / 1e2 AS avg_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q8_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(1) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q9_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,

    "q10_setops" ->
      """SELECT k FROM (
        |  SELECT k FROM (
        |    SELECT o_custkey AS k FROM orders
        |    INTERSECT
        |    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
        |  UNION
        |  SELECT k FROM (
        |    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |    EXCEPT
        |    SELECT DISTINCT o_custkey AS k FROM orders))
        |ORDER BY k""".stripMargin,

    "q11_scalar_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_up,
        |  length(p_name) AS name_len,
        |  substring(p_type, 1, 5) AS type_pfx,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  round(sqrt(p_retailprice), 4) AS price_sqrt,
        |  round(ln(1 + p_retailprice), 4) AS price_log1p,
        |  p_size % 7 AS size_mod,
        |  abs(p_size - 25) AS size_dist,
        |  len(string_split(p_name, ' ')) AS name_words
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q12_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr,
        |  month(o_orderdate) AS mo,
        |  dayofmonth(o_orderdate) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q13_distinct_having" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(1) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |HAVING count(1) > 100
        |ORDER BY l_returnflag""".stripMargin,

    "q14_semi_anti" ->
      """SELECT c_custkey, 'has_big' AS tag FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |UNION ALL
        |SELECT c_custkey, 'no_big' AS tag FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,

    "q15_events_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start, event_type,
        |  count(1) AS n, CAST(round(sum(CAST(value AS DECIMAL(30,8))), 4) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY win_start, event_type""".stripMargin,

    "q16_events_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sessions AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(1) AS n_events,
        |  min(epoch_us(ts)) AS session_start,
        |  max(epoch_us(ts)) AS session_end
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q19_multijoin" ->
      """SELECT n_name,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue,
        |  count(1) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND r_name IN ('ASIA', 'EUROPE')
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q18_json_extract" ->
      """SELECT event_type, count(1) AS n,
        |  CAST(sum(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |  round_even((avg(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT))) * 1e4, 0) / 1e4 AS avg_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q17_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sessions AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id,
        |  min(epoch_us(ts)) AS session_start,
        |  max(epoch_us(ts)) + 1800 * 1000000 AS session_end,
        |  count(1) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(30,8))), 4) AS DOUBLE) AS sum_value
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,

    "q20_exists_subquery" ->
      """SELECT o_orderpriority, count(1) AS n
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q21_scalar_subquery" ->
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part p
        |WHERE p_retailprice > 1.1 * (
        |  SELECT avg(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand)
        |ORDER BY p_partkey""".stripMargin,

    "q25_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the accuracy contract: every approx quantile within tolerance
    // of exact (the Spark side computes the booleans; here they must
    // all be TRUE)
    "q26_approx_percentiles" ->
      """SELECT l_returnflag, TRUE AS p50_ok, TRUE AS p95_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q23_skew_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |  count(1) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q24_pivot" ->
      """SELECT o_orderstatus,
        |  count(1) FILTER (o_orderpriority = '1-URGENT') AS p1,
        |  count(1) FILTER (o_orderpriority = '2-HIGH') AS p2,
        |  count(1) FILTER (o_orderpriority = '3-MEDIUM') AS p3,
        |  count(1) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4,
        |  count(1) FILTER (o_orderpriority = '5-LOW') AS p5
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q22_anti_subquery" ->
      """SELECT c_mktsegment, count(1) AS n_cust,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_bal
        |FROM customer c
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE)
        |                     / count(c_acctbal)
        |                   FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    // plain join+agg: the salted join must be result-identical
    "q27_skew_join" ->
      """SELECT c_mktsegment, count(1) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(30,8))), 4) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // staged funnel: same three-level strictly-after aggregation
    "q28_funnel" ->
      """WITH u1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
        |), u2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN u1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY 1
        |), u3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN u2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY 1
        |)
        |SELECT '1_view' AS stage, count(1) AS n_users FROM u1
        |UNION ALL SELECT '2_click_after_view', count(1) FROM u2
        |UNION ALL SELECT '3_purchase_after_click', count(1) FROM u3
        |ORDER BY stage""".stripMargin,

    // daily grid + zero fill + IGNORE NULLS forward fill
    "q29_resample" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(1) AS n_events,
        |    CAST(round(sum(CAST(value AS DECIMAL(30,8))), 4) AS DOUBLE) AS sum_value,
        |    max({'ts': ts, 'eid': event_id, 'et': event_type}) AS mx
        |  FROM events GROUP BY 1, 2
        |), grid AS (
        |  SELECT user_id, unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE AS day
        |  FROM daily GROUP BY user_id
        |)
        |SELECT g.user_id, g.day,
        |  coalesce(d.n_events, 0) AS n_events,
        |  coalesce(d.sum_value, 0.0) AS sum_value,
        |  last_value(d.mx.et IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_type
        |FROM grid g LEFT JOIN daily d USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,

    // DuckDB's native ASOF LEFT JOIN is the oracle for the union+window
    // as-of; clicks pre-deduped per (user, ts) in both engines so the
    // at-instant winner is engine-independent
    "asof_join" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        |), clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
        |)
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  c.click_id AS asof_click_id
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY event_id""".stripMargin,

    "range_join_count" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        |), clicks AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'click'
        |)
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  count(c.user_id) AS n_clicks_1h,
        |  max(epoch_us(c.ts)) AS last_click_us
        |FROM purchases p LEFT JOIN clicks c
        |  ON c.user_id = p.user_id
        |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |GROUP BY 1, 2, 3
        |ORDER BY event_id""".stripMargin
  )
}
