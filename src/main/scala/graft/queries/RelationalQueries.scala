package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft.{events, table}

/** Relational operator coverage over the driver-generated TPC-H-ish tables
  * — the Spark-side surface the reference engine lacks entirely (SURVEY
  * §2.5: joins, aggregations, windows, set ops are all absent there), made
  * first-class here.
  *
  * Conventions shared with the DuckDB oracle SQL:
  *  - double aggregates go through `DECIMAL(18,2)` casts so sums are exact
  *    and independent of partition/accumulation order (a plain double sum
  *    differs between engines in the last ulp); averages are exact decimal
  *    sums cast to double divided by exact counts — one double division
  *    with identical operands on both sides;
  *  - every query has a total ORDER BY so row order is deterministic;
  *  - timestamp outputs are `timestamp_ntz` or formatted strings — never
  *    zone-adjusted timestamps, which pandas/DuckDB render differently.
  *
  * Scale notes are on each query: what shuffles, what broadcasts, what
  * survives a 100× scale-up.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def decSum(c: Column): Column = sum(dec(c)).cast("double")
  private val one = lit(1).cast("decimal(18,2)")

  /** TPC-H Q1-shaped pricing summary. One shuffle on a 6-value grouping
    * key with map-side partial aggregation: the shuffle carries only
    * (#map tasks × #groups) rows at any scale. */
  val q1_agg: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (decSum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Scan + filter + projection: predicate and column pruning reach the
    * Parquet reader (PushedFilters on l_shipdate/l_quantity; ReadSchema is
    * 4 of 11 columns) — verified in PlanSpec. */
  val q_scan_filter: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-03-01").cast("timestamp_ntz") &&
        col("l_quantity") < 10)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Top-K: TakeOrderedAndProject — per-partition heaps + single merge of
    * K rows, never a full sort, at any scale. */
  val q_topk: Q = (s, dir) =>
    table(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** Star join through two tiny dims: both sides of the dim chain
    * broadcast (region 5 rows, nation 25 rows — explicit broadcast()), so
    * the fact table never shuffles. */
  val q_join_broadcast: Q = (s, dir) => {
    val c = table(s, dir, "customer")
    val n = broadcast(table(s, dir, "nation"))
    val r = broadcast(table(s, dir, "region"))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("customers"), decSum(col("c_acctbal")).as("total_acctbal"))
      .orderBy(col("r_name"))
  }

  /** Fact-to-fact join: shuffle hash/sort-merge on o_orderkey. Both sides
    * partition on the join key — the canonical big-join shape; AQE picks
    * the physical strategy and handles skew at scale. */
  val q_join_shuffle: Q = (s, dir) => {
    val l = table(s, dir, "lineitem")
    val o = table(s, dir, "orders")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("line_count"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Left-semi join = EXISTS; only keys shuffle, no payload duplication. */
  val q_semi_join: Q = (s, dir) => {
    val c = table(s, dir, "customer")
    val o = table(s, dir, "orders")
      .where(col("o_totalprice") > 150000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join = NOT EXISTS (filtered build side so the result is
    * non-empty: customers with no high-value order). */
  val q_anti_join: Q = (s, dir) => {
    val c = table(s, dir, "customer")
    val o = table(s, dir, "orders").where(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Left outer join preserving empty groups. */
  val q_outer_join: Q = (s, dir) => {
    val c = table(s, dir, "customer")
    val o = table(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("order_count"),
        coalesce(decSum(col("o_totalprice")), lit(0.0)).as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  /** Window functions: rank within partition + running sum. One shuffle on
    * the partition key; within-partition sort only. */
  val q_window: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("running_value",
        sum(dec(col("value"))).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double"))
      .where(col("rn") <= 3)
      .select(col("user_id"), col("rn"), col("event_id"), col("event_type"),
        col("running_value"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** DISTINCT — hash aggregate without aggregates. */
  val q_distinct: Q = (s, dir) =>
    table(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  /** UNION ALL / INTERSECT / EXCEPT as one result (tagged). */
  val q_set_ops: Q = (s, dir) => {
    val c = table(s, dir, "customer")
    val auto = c.where(col("c_mktsegment") === "AUTOMOBILE").select(col("c_nationkey"))
    val bldg = c.where(col("c_mktsegment") === "BUILDING").select(col("c_nationkey"))
    val inter = auto.intersect(bldg).withColumn("op", lit("intersect"))
    val exc = auto.except(bldg).withColumn("op", lit("except"))
    val uni = auto.union(bldg).distinct().withColumn("op", lit("union"))
    inter.union(exc).union(uni)
      .groupBy(col("op")).agg(count(lit(1)).as("n"))
      .orderBy(col("op"))
  }

  /** ROLLUP grouping sets with grouping_id to disambiguate null groups. */
  val q_rollup: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), decSum(col("l_quantity")).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("<all>")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("<all>")).as("linestatus"),
        col("n"), col("qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** CUBE over two dims. */
  val q_cube: Q = (s, dir) =>
    table(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
        coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
        col("n"))
      .orderBy(col("status"), col("priority"))

  /** HAVING — post-aggregation filter. */
  val q_having: Q = (s, dir) =>
    table(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("total"))
      .where(col("n") >= 3)
      .orderBy(col("o_custkey"))

  /** Exact + distinct aggregation; countDistinct shuffles by (group, key)
    * then by group — the expand-based plan Catalyst generates. */
  val q_count_distinct: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("distinct_supp"),
        countDistinct(col("l_partkey")).as("distinct_part"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** Scalar function battery: string/math/date functions in one
    * projection — all codegen'd builtins. */
  val q_scalar_functions: Q = (s, dir) =>
    table(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        round(dec(col("p_retailprice")) * lit(110).cast("decimal(18,2)") / lit(100), 2)
          .cast("double").as("price_plus_10pct"),
        (col("p_size") % 7).as("size_mod"),
        abs(col("p_size") - 25).as("size_dist"),
        when(col("p_size") > 25, "large").otherwise("small").as("size_class"))
      .orderBy(col("p_partkey"))

  /** Correlated scalar subquery shape: customers above their nation's
    * average balance (expressed as join against an aggregated subframe —
    * the plan Catalyst would decorrelate to). */
  val q_subquery: Q = (s, dir) => {
    val c = table(s, dir, "customer")
    val nationAvg = table(s, dir, "customer")
      .groupBy(col("c_nationkey").as("nk"))
      .agg((decSum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
    c.join(broadcast(nationAvg), c("c_nationkey") === nationAvg("nk"))
      .where(dec(col("c_acctbal")).cast("double") > col("avg_bal"))
      .select(col("c_custkey"), col("c_nationkey"))
      .orderBy(col("c_custkey"))
  }

  /** Conditional aggregation (pivot shape). */
  val q_case_agg: Q = (s, dir) =>
    events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("purchases"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("errors"),
        decSum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0)))
          .as("purchase_value"))
      .orderBy(col("user_id"))

  /** Tumbling event-time windows over the events stream table (batch view
    * of the Structured Streaming aggregation — same plan shape). */
  val q_event_windows: Q = (s, dir) =>
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("bucket"), col("event_type"))

  /** Sliding event-time windows (1 hour long, 30-minute hop): every event
    * belongs to exactly two windows — start = bucket30(ts) and
    * bucket30(ts) - 30min — the Structured Streaming
    * `window(ts, "1 hour", "30 minutes")` shape, expressed so the oracle
    * can mirror it with time_bucket arithmetic. */
  val q_sliding_windows: Q = (s, dir) => {
    val ev = events(s, dir)
    val hop = expr("ts_us div 1800000000 * 1800000000") // floor to 30min in micros
    val starts = array(hop, hop - lit(1800000000L))
    ev.withColumn("w_start_us", explode(starts))
      .groupBy(col("w_start_us"), col("event_type"))
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("total_value"))
      .select(
        date_format(timestamp_micros(col("w_start_us")).cast("timestamp_ntz"),
          "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("w_start"), col("event_type"))
  }

  /** Explicit GROUPING SETS (beyond rollup/cube) through the SQL surface. */
  val q_grouping_sets: Q = (s, dir) => {
    table(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    s.sql(
      """SELECT coalesce(l_returnflag, '<all>') AS returnflag,
        |  coalesce(l_linestatus, '<all>') AS linestatus,
        |  count(*) AS n
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** Gap-based sessionization (30-minute inactivity closes a session) —
    * the batch view of `session_window`/flatMapGroupsWithState streaming
    * state: lag + running sum of session starts, one shuffle on user_id.
    * All math is on exact microsecond longs so the oracle hash-matches. */
  val q_sessionize: Q = (s, dir) => {
    val gapMicros = 1800000000L // 30 min
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us").as("tus"))
      .withColumn("new_session",
        when(lag(col("tus"), 1).over(w).isNull ||
          col("tus") - lag(col("tus"), 1).over(w) > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("tus")) - min(col("tus"))).as("duration_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** As-of join: for every purchase event, the most recent click at-or-
    * before it by the same user. Spark-first shape: NOT a range join —
    * union both event streams, one shuffle on user_id, and a running
    * `max(click_ts)` window gives each purchase its as-of match in a
    * single sort pass (clicks sort before purchases at equal timestamps so
    * ties are visible, matching ASOF's `>=`). Scales as sort-within-user,
    * the same plan a 1000-executor backfill would want. */
  val q_asof_join: Q = (s, dir) => {
    val ev = events(s, dir)
      .where(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"))
    val isPurchase = when(col("event_type") === "purchase", 1).otherwise(0)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), isPurchase, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.withColumn("click_us",
        max(when(col("event_type") === "click", col("ts_us"))).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("click_us"))
      .orderBy(col("event_id"))
  }

  /** Range join (interval self-join): pairs of events by the same user
    * within a 5-minute window, counted per user. The naive form is a
    * quadratic within-user join; the scale path used here buckets time
    * into window-width cells and equi-joins on (user, bucket) with the
    * left side exploded into its own and the next bucket — candidate
    * pairs are bounded by bucket occupancy, and the exact range predicate
    * filters after the equi-join. Same result as the oracle's naive join. */
  val q_range_join: Q = (s, dir) => {
    val W = 300000000L // 5 minutes in micros
    val ev = events(s, dir).select(col("user_id"), col("event_id"), col("ts_us"))
    val bkt = expr(s"ts_us div $W")
    val a = ev.select(col("user_id"), col("event_id").as("a_id"), col("ts_us").as("a_us"),
        explode(array(bkt, bkt + 1)).as("bkt"))
    val b = ev.select(col("user_id"), bkt.as("bkt"),
      col("event_id").as("b_id"), col("ts_us").as("b_us"))
    a.join(b, Seq("user_id", "bkt"))
      .where(col("b_us") > col("a_us") && col("b_us") <= col("a_us") + W)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  /** PIVOT: per linestatus, quantity totals fanned out by return flag.
    * Spark's pivot with explicit values compiles to one pass of
    * conditional aggregates — no extra shuffle over the plain groupBy. */
  val q_pivot: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(decSum(col("l_quantity")))
      .select(col("l_linestatus"), col("A").as("qty_a"), col("N").as("qty_n"),
        col("R").as("qty_r"))
      .orderBy(col("l_linestatus"))

  /** Unpivot (wide→long melt) — the inverse of [[q_pivot]]: per-order
    * metric rows from two value columns. Pure per-row Generate (each
    * input row fans to exactly 2 output rows): narrow, no shuffle. The
    * oracle writes the portable UNION ALL form, which is exactly the
    * relational meaning of UNPIVOT in both engines. */
  val q_unpivot: Q = (s, dir) =>
    table(s, dir, "orders")
      .select(col("o_orderkey"),
        dec(col("o_totalprice")).cast("double").as("total_price"),
        year(col("o_orderdate")).cast("double").as("order_year"))
      .unpivot(Array(col("o_orderkey")),
        Array(col("total_price"), col("order_year")), "metric", "value")
      .orderBy(col("o_orderkey"), col("metric"))

  /** Exact percentiles (linear interpolation) of quantity per return flag
    * — Spark `percentile` ≡ DuckDB `quantile_cont`. Exact-sort-based here;
    * the approximate sketch path at scale is `approx_percentile`, whose
    * t-digest is engine-specific and therefore not oracle-gated. */
  val q_percentile: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"))
      .orderBy(col("l_returnflag"))

  /** KMV (k-minimum-values) distinct-count sketch, k=256: hash every key,
    * keep the k smallest distinct hashes, estimate distinct = (k-1)/u_k
    * where u_k is the k-th minimum normalized to (0,1). Deterministic
    * md5-derived hashes make the estimate bit-identical in DuckDB —
    * unlike HLL, whose register layout is engine-specific. The
    * `orderBy.limit(k)` is TakeOrdered (per-partition heaps, no global
    * sort), so the sketch costs one scan at any scale. */
  val q_kmv_distinct: Q = (s, dir) => {
    val k = 256
    val h = table(s, dir, "lineitem")
      .select(conv(substring(md5(col("l_partkey").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
    val kth = h.distinct().orderBy(col("h")).limit(k)
      .agg(max(col("h")).as("hk"))
    // (k-1)/u_k = (k-1)·2^60/h_k, computed in double (exact operands, one
    // division) then floored — identical in both engines.
    kth.select(
      floor(lit((k - 1).toDouble) * lit(1.152921504606846976e18) /
        col("hk").cast("double")).cast("long").as("est_distinct"))
  }

  /** Window frames beyond row_number: per-customer running order total
    * (ROWS UNBOUNDED PRECEDING), 3-row moving average, dense_rank and
    * ntile(4) — one shuffle on o_custkey serves all four functions (same
    * window spec → one sort). */
  val q_window_frames: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val mov = w.rowsBetween(-2, 0)
    table(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(run).cast("double").as("running_total"),
        (sum(dec(col("o_totalprice"))).over(mov).cast("double") /
          count(lit(1)).over(mov)).as("moving_avg"),
        dense_rank().over(w).cast("long").as("drank"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Skew-safe two-phase aggregation: pre-aggregate on a salted key
    * (group, salt) so one hot group fans across partitions, then re-
    * aggregate the partials. Result ≡ the plain groupBy (the oracle); the
    * salt column never escapes. At 100 TB this is the standard fix when a
    * handful of keys dominate (AQE skew handling covers joins; salting
    * covers aggregations with huge per-group state). */
  val q_skew_agg: Q = (s, dir) => {
    val salted = events(s, dir)
      .withColumn("__salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(dec(col("value"))).as("pv"))
    salted.groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"),
        sum(col("pv")).cast("double").as("total_value"))
      .orderBy(col("event_type"))
  }

  /** JSON path extraction from the events props column. */
  val q_json_path: Q = (s, dir) =>
    events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .where(col("k") > 50)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"))
      .orderBy(col("event_type"))

  val all: Map[String, Q] = Map(
    "q1_agg" -> q1_agg,
    "q_scan_filter" -> q_scan_filter,
    "q_topk" -> q_topk,
    "q_join_broadcast" -> q_join_broadcast,
    "q_join_shuffle" -> q_join_shuffle,
    "q_semi_join" -> q_semi_join,
    "q_anti_join" -> q_anti_join,
    "q_outer_join" -> q_outer_join,
    "q_window" -> q_window,
    "q_distinct" -> q_distinct,
    "q_set_ops" -> q_set_ops,
    "q_rollup" -> q_rollup,
    "q_cube" -> q_cube,
    "q_having" -> q_having,
    "q_count_distinct" -> q_count_distinct,
    "q_scalar_functions" -> q_scalar_functions,
    "q_subquery" -> q_subquery,
    "q_case_agg" -> q_case_agg,
    "q_event_windows" -> q_event_windows,
    "q_sliding_windows" -> q_sliding_windows,
    "q_grouping_sets" -> q_grouping_sets,
    "q_sessionize" -> q_sessionize,
    "q_json_path" -> q_json_path,
    "q_asof_join" -> q_asof_join,
    "q_range_join" -> q_range_join,
    "q_pivot" -> q_pivot,
    "q_percentile" -> q_percentile,
    "q_kmv_distinct" -> q_kmv_distinct,
    "q_window_frames" -> q_window_frames,
    "q_skew_agg" -> q_skew_agg,
    "q_unpivot" -> q_unpivot
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_day
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-03-01'
        |  AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_join_broadcast" ->
      """SELECT r_name, count(*) AS customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_join_shuffle" ->
      """SELECT o_orderpriority, count(*) AS line_count,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS order_count,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_window" ->
      """SELECT user_id, rn, event_id, event_type, running_value FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER w AS rn,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |) WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_set_ops" ->
      """WITH auto AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
        |bldg AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |tagged AS (
        |  SELECT 'intersect' AS op, c_nationkey FROM (SELECT DISTINCT c_nationkey FROM auto INTERSECT SELECT DISTINCT c_nationkey FROM bldg)
        |  UNION ALL
        |  SELECT 'except' AS op, c_nationkey FROM (SELECT DISTINCT c_nationkey FROM auto EXCEPT SELECT DISTINCT c_nationkey FROM bldg)
        |  UNION ALL
        |  SELECT 'union' AS op, c_nationkey FROM (SELECT DISTINCT c_nationkey FROM (SELECT c_nationkey FROM auto UNION ALL SELECT c_nationkey FROM bldg))
        |)
        |SELECT op, count(*) AS n FROM tagged GROUP BY op ORDER BY op""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, '<all>') AS returnflag,
        |  coalesce(l_linestatus, '<all>') AS linestatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderstatus, '<all>') AS status,
        |  coalesce(o_orderpriority, '<all>') AS priority, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_having" ->
      """SELECT o_custkey, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 3 ORDER BY o_custkey""".stripMargin,
    "q_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS distinct_supp,
        |  count(DISTINCT l_partkey) AS distinct_part, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_scalar_functions" ->
      """SELECT p_partkey, upper(p_brand) AS brand_upper, length(p_name) AS name_len,
        |  substring(p_type, 1, 5) AS type_prefix,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  CAST(round(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(110 AS DECIMAL(18,2)) / 100, 2) AS DOUBLE) AS price_plus_10pct,
        |  p_size % 7 AS size_mod,
        |  abs(p_size - 25) AS size_dist,
        |  CASE WHEN p_size > 25 THEN 'large' ELSE 'small' END AS size_class
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_subquery" ->
      """WITH nation_avg AS (
        |  SELECT c_nationkey AS nk,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
        |  FROM customer GROUP BY c_nationkey
        |)
        |SELECT c_custkey, c_nationkey FROM customer JOIN nation_avg ON c_nationkey = nk
        |WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) > avg_bal
        |ORDER BY c_custkey""".stripMargin,
    "q_case_agg" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0.0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_event_windows" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_json_path" ->
      """SELECT event_type, count(*) AS n, CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
        |FROM events WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sliding_windows" ->
      """WITH w AS (
        |  SELECT epoch_us(ts) // 1800000000 * 1800000000 AS hop, event_type, value FROM events),
        |expanded AS (
        |  SELECT hop AS w_start_us, event_type, value FROM w
        |  UNION ALL
        |  SELECT hop - 1800000000 AS w_start_us, event_type, value FROM w)
        |SELECT strftime(make_timestamp(w_start_us), '%Y-%m-%d %H:%M:%S') AS w_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM expanded GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '<all>') AS returnflag,
        |  coalesce(l_linestatus, '<all>') AS linestatus,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_asof_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS tus FROM events
        |  WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, c.tus AS click_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.tus >= c.tus
        |ORDER BY p.event_id""".stripMargin,
    "q_range_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events)
        |SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |  AND b.tus > a.tus AND b.tus <= a.tus + 300000000
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    "q_pivot" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a,
        |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_n,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.9) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_unpivot" ->
      """SELECT o_orderkey, metric, value FROM (
        |  SELECT o_orderkey, 'total_price' AS metric,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS value
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'order_year' AS metric,
        |         CAST(year(o_orderdate) AS DOUBLE) AS value
        |  FROM orders)
        |ORDER BY o_orderkey, metric""".stripMargin,
    "q_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM lineitem),
        |kth AS (SELECT max(h) AS hk FROM (SELECT h FROM h ORDER BY h LIMIT 256))
        |SELECT CAST(floor(255.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE)) AS BIGINT)
        |  AS est_distinct
        |FROM kth""".stripMargin,
    "q_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_run AS DOUBLE) AS running_total,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_mov AS DOUBLE)
        |    / count(*) OVER w_mov AS moving_avg,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW
        |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w_mov AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_skew_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |marked AS (
        |  SELECT user_id, event_id, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |           OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |sessions AS (
        |  SELECT user_id, tus,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  max(tus) - min(tus) AS duration_us
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin
  )
}
