package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational / analytical query pack over the synthetic star schema.
  *
  * Each query has a DuckDB oracle (same column names, same rounding, same
  * deterministic ORDER BY). Design notes for 100 TB scale:
  *  - dimension joins are broadcast (region/nation/customer/supplier/part
  *    are tiny relative to facts);
  *  - window specs always carry a total order — (orderkey, linenumber,
  *    quantity): the synthetic lineitem duplicates ~2% of (orderkey,
  *    linenumber) pairs — so results are deterministic under any
  *    partitioning;
  *  - double aggregates are rounded in BOTH engines to absorb summation
  *    order differences.
  */
object Relational {

  private def r2(c: Column): Column = round(c, 2)

  /** Ordered within-window event pairs for q15: for each event, every
    * LATER event by the same user at most `binUs` micros after it
    * (ties on the timestamp ordered by event_id). Input columns:
    * (event_id, user_id, event_type, us). The window predicate is
    * non-equi, but bucketizing time into window-sized bins turns it
    * into an EQUI-join: a within-window successor lives in the same
    * bin or the next one, so the left side probes exactly those two
    * bins (explode) and the residual predicate filters bin-mates
    * outside the window. Shuffles on (user_id, bin) like any hash
    * join — no nested loop, no range explosion.
    */
  /** Strict-sequence funnel stage per user + the one-row summary (q19):
    * a user reaches stage k+1 at the FIRST qualifying event after the
    * event that granted stage k. One shuffle on user_id; the per-user
    * (micros, event_id, type) triples sort inside the aggregate and a
    * single aggregate() fold walks the state machine — no per-stage
    * self-joins, no window re-sorts.
    *
    * Buffer bound: collect_list skips nulls, so only events that can
    * still ADVANCE the state machine (the three funnel types) enter the
    * aggregation buffer — map-side partials drop signup/error/etc
    * before the shuffle while every user still groups (n_users keeps
    * non-funnel-only users). Per-user state is then O(funnel events per
    * user), not O(all events); the residual power-law-user skew bound
    * is documented in SCALING.md §3 (an exact strict-sequence funnel
    * has no constant-size mergeable sufficient statistic — the first-
    * click-after-t query needs the click set).
    */
  private[graft] def funnelStages(ev: DataFrame): DataFrame =
    ev.select(col("user_id"),
        when(col("event_type").isin("view", "click", "purchase"),
          struct(unix_micros(col("ts")).as("t"), col("event_id").as("e"),
            col("event_type").as("ty"))).as("ev"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("ev"))).as("evs"))
      .select(col("user_id"), expr("""aggregate(evs, 0, (st, x) ->
          CASE WHEN st = 0 AND x.ty = 'view' THEN 1
               WHEN st = 1 AND x.ty = 'click' THEN 2
               WHEN st = 2 AND x.ty = 'purchase' THEN 3
               ELSE st END)""").as("stage"))

  private[graft] def funnelSummary(ev: DataFrame): DataFrame =
    funnelStages(ev)
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("stage") >= 1, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("stage") >= 2, 1L).otherwise(0L)).as("n_click"),
        sum(when(col("stage") >= 3, 1L).otherwise(0L)).as("n_purchase"))
      .select(col("n_users"), col("n_view"), col("n_click"), col("n_purchase"),
        round(col("n_view").cast("double") / col("n_users"), 6).as("r_view"),
        round(col("n_click").cast("double") / col("n_view"), 6).as("r_click"),
        round(col("n_purchase").cast("double") / col("n_click"), 6)
          .as("r_purchase"))

  private[queries] def cooccurPairs(ev: DataFrame, binUs: Long): DataFrame = {
    val left = ev.select(col("user_id"), col("event_id").as("a_id"),
        col("event_type").as("a_type"), col("us").as("a_us"))
      .withColumn("bin", explode(array(
        floor(col("a_us") / binUs), floor(col("a_us") / binUs) + 1)))
    val right = ev.select(col("user_id"), col("event_id").as("b_id"),
        col("event_type").as("b_type"), col("us").as("b_us"),
        floor(col("us") / binUs).as("bin"))
    left.join(right, Seq("user_id", "bin"))
      .filter((col("b_us") > col("a_us") ||
               (col("b_us") === col("a_us") && col("b_id") > col("a_id"))) &&
              col("b_us") - col("a_us") <= binUs)
      .select(col("user_id"), col("a_id"), col("a_type"), col("a_us"),
        col("b_id"), col("b_type"), col("b_us"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 style: full scan + hash agg (map-side partial agg for free).
    "q01_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r2(sum(col("l_quantity"))).as("sum_qty"),
          r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_revenue"),
          r2(avg(col("l_quantity"))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Multi-way join: fact joined to broadcast dims, revenue per nation.
    "q02_revenue_by_nation" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      val c  = Tables.customer(s, dir)
      val n  = Tables.nation(s, dir)
      val r  = Tables.region(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(n("n_name"), r("r_name"))
        .agg(
          r2(sum(li("l_extendedprice") * (lit(1) - li("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"), col("r_name"))
    }),

    // Top-k by aggregated revenue; deterministic tiebreak on key.
    "q03_top_orders" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      li.groupBy(col("l_orderkey"))
        .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .join(o, col("l_orderkey") === o("o_orderkey"))
        .select(col("l_orderkey"), col("revenue"), o("o_orderstatus").as("o_orderstatus"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // Window: per-supplier running quantity; total order inside partition.
    "q04_running_quantity" -> ((s, dir) => {
      // (orderkey, linenumber) is NOT unique in the synthetic lineitem
      // (~2% duplicated): l_quantity completes the tiebreak so the
      // window order is total up to fully-identical (interchangeable)
      // rows — one genuine 4-column tie exists at sf0.1
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          // quantities are integral: accumulate as BIGINT so the running
          // sum is exact — double accumulation orders differ between
          // engines (Spark running adds vs DuckDB's segment tree) and
          // round(,2) landed on a boundary at sf0.1
          sum(col("l_quantity").cast("long")).over(w).as("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // lead() lookahead — the CDXJ "length from next record offset" shape
    // (reference: fastwarc-py/fastwarc/cli.py:277-283).
    "q05_next_ship_gap" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
      Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          datediff(lead(col("l_shipdate"), 1).over(w), col("l_shipdate")).as("gap_days"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // Selective filter (pushed to parquet) + single agg (TPC-H Q6 style).
    "q06_forecast_revenue" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
                col("l_discount") >= 0.02 && col("l_discount") <= 0.09 &&
                col("l_quantity") < 24)
        .agg(r2(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"),
             count(lit(1)).as("n_rows"))
    }),

    // Semi/anti join: customers with vs without orders, by segment.
    "q07_customer_activity" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).select(col("o_custkey"))
      val active = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_active"))
      val idle = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_idle"))
      active.join(idle, Seq("c_mktsegment"), "full_outer")
        .select(col("c_mktsegment"),
          coalesce(col("n_active"), lit(0L)).as("n_active"),
          coalesce(col("n_idle"), lit(0L)).as("n_idle"))
        .orderBy(col("c_mktsegment"))
    }),

    // Event-time bucketing (streaming-shaped agg run in batch).
    "q08_events_hourly" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), r2(sum(col("value"))).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // Sessionization: gap > 30 min starts a new session (lag + running sum).
    "q09_event_sessions" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
               unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // Backward as-of join (click -> purchase attribution): for each
    // purchase, the user's most recent click at or before it. Spark has
    // no native ASOF operator; the scalable sort-merge-asof shape is
    // tag-union -> ONE shuffle on the key -> per-key time sort -> a
    // running last-click carried by a window. No range explosion, no
    // per-probe lookups; ties at equal ts resolve click-first (tag 0)
    // matching ASOF's <= bound. Ties among clicks with identical
    // (user_id, ts) resolve to max(event_id) on BOTH sides: the window
    // order makes last() pick the max here, and the oracle pre-aggregates
    // its click side, so neither engine is left to an arbitrary pick.
    // Oracle: DuckDB's native ASOF LEFT JOIN.
    "q12_asof_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val tagged = ev.filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "click", 0).otherwise(1).as("tag"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("click_event_id",
          last(when(col("tag") === 0, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("click_ts",
          last(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("user_id"), col("click_event_id"),
          (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
        .orderBy(col("event_id"))
    }),

    // Multi-level aggregation: ROLLUP subtotals + grand total in one
    // pass (Spark expands grouping sets map-side; one shuffle).
    "q11_revenue_rollup" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_rows"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // ANALYZE-style column profiling: count / nulls / exact NDV /
    // min / max per column. Topology: one groupBy(value)-count per
    // column, then a tiny reduce over the grouped keys — every stage a
    // partial-combined HASH aggregate. The tempting alternative (one
    // multi-countDistinct agg + stack unpivot) is a trap twice over:
    // Catalyst's distinct rewrite expands rows x(cols+1), and min/max
    // over STRING columns cannot live in a mutable hash-agg buffer, so
    // the whole expanded stream falls back to SortAggregate — measured
    // 6.5 s vs 0.6 s for this shape at sf0.1. Here the string min/max
    // runs over the few grouped keys, not the raw rows, and each arm
    // scans only its own (column-pruned) parquet column, so total I/O
    // equals one 5-column scan.
    "q13_table_profile" -> ((s, dir) => {
      val numCols = Seq("l_orderkey", "l_quantity", "l_extendedprice")
      val strCols = Seq("l_returnflag", "l_linestatus")
      def profile(c: String, isNum: Boolean) = {
        val g = Tables.lineitem(s, dir)
          .groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        g.agg(
            coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
            coalesce(sum(when(col(c).isNotNull, col("cnt"))), lit(0L)).as("n_notnull"),
            count(when(col(c).isNotNull, lit(1))).as("ndv"),
            (if (isNum) round(min(col(c)).cast("double"), 6)
             else lit(null).cast("double")).as("min_num"),
            (if (isNum) round(max(col(c)).cast("double"), 6)
             else lit(null).cast("double")).as("max_num"),
            (if (isNum) lit(null).cast("string") else min(col(c))).as("min_str"),
            (if (isNum) lit(null).cast("string") else max(col(c))).as("max_str"))
          .select(lit(c).as("column_name"), col("n_rows"), col("n_notnull"),
            (col("n_rows") - col("n_notnull")).as("n_null"), col("ndv"),
            col("min_num"), col("max_num"), col("min_str"), col("max_str"))
      }
      (numCols.map(profile(_, isNum = true)) ++
        strCols.map(profile(_, isNum = false)))
        .reduce(_ unionAll _)
        .orderBy(col("column_name"))
    }),

    // KMV (k-minimum-values) distinct-count sketch vs exact NDV — the
    // deterministic sketch: estimate = (k-1) / normalized k-th smallest
    // hash (Bar-Yossef et al. 2002). Unlike HLL, every engine computes
    // the IDENTICAL estimate, so it is oracle-checkable. The scale
    // story: ORDER BY hash LIMIT k compiles to TakeOrderedAndProject —
    // per-partition top-k then a k-row merge on one reducer; the
    // distinct-hash shuffle below is the demo-scale shortcut, replaced
    // by a k-min Aggregator at 100 TB (same merge shape as e04's topk).
    "q14_kmv_ndv" -> ((s, dir) => {
      val k = 256
      val h = Tables.lineitem(s, dir)
        .select(md5(col("l_orderkey").cast("string")).as("h"))
        .distinct()
      val kth = h.orderBy(col("h")).limit(k)
        .agg(max(col("h")).as("h_k"), count(lit(1)).as("n_sketch"))
      val exact = Tables.lineitem(s, dir)
        .agg(countDistinct(col("l_orderkey")).as("exact_ndv"))
      kth.crossJoin(exact)
        .select(col("n_sketch"), col("exact_ndv"),
          // first 8 hex chars -> fraction of 2^32; estimate (k-1)/frac
          when(col("n_sketch") < k, col("exact_ndv").cast("double"))
            .otherwise(round(lit(k - 1) /
              (conv(substring(col("h_k"), 1, 8), 16, 10).cast("double")
                / lit(4294967296.0)), 2)).as("est_ndv"))
        .withColumn("rel_err",
          round(abs(col("est_ndv") - col("exact_ndv")) / col("exact_ndv"), 4))
    }),

    // JSON projection from the props payload column.
    "q10_events_json" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // Native gap-based sessionization: Spark's session_window operator
    // (the streaming-native session abstraction — the SAME expression
    // works under a watermark in a readStream query, where state is
    // per-key and expires at gap timeout). q09 derives sessions with
    // the lag+running-sum islands idiom; this exercises the built-in
    // operator and pins the two against one DuckDB islands oracle:
    // session boundaries, per-session event counts and value sums all
    // match. Shuffles once on user_id; the session merge is key-local.
    "q18_session_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), r2(sum(col("value"))).as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          unix_micros(col("session_window.end")).as("session_end_us"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // Strict-sequence conversion funnel (view -> click -> purchase), the
    // product-analytics staple: a user reaches stage k+1 at the FIRST
    // qualifying event after the event that granted stage k. One shuffle
    // on user_id; each user's (micros, event_id, type) triples sort
    // inside the aggregate and a single aggregate() fold walks the state
    // machine — no per-stage self-joins, no window re-sorts, and at
    // 100 TB the shuffle carries 3-field structs, never props/values.
    // The oracle states the same semantics as min-row_number chains
    // (event_id uniqueness makes the orders identical).
    "q19_funnel" -> ((s, dir) => funnelSummary(Tables.events(s, dir))),

    // Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005) —
    // the third mergeable sketch next to q14 KMV and q16 HLL: 4 hash
    // rows × 64 counters summarize per-user event counts in 256 cells
    // regardless of key cardinality. Build = one posexplode to (row,
    // cell) pairs with map-side combine (the sketch IS a 256-row
    // aggregate, mergeable by addition across any partitioning); query
    // = each key probes its 4 cells and takes the min. 150 users into
    // 64 columns FORCES collisions, so the one-sided error guarantee
    // (estimate >= exact, never under) is exercised for real — the
    // output carries exact counts beside the estimates as the gauge.
    "q20_cm_heavy_hitters" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id").cast("string").as("k"))
      def cell(i: Int) = (conv(substring(
        md5(concat(lit(s"$i:"), col("k"))), 1, 8), 16, 10)
        .cast("long") % 64).as(s"h$i")
      val hashes = array((0 until 4).map(cell): _*)
      val counters = ev.select(posexplode(hashes).as(Seq("i", "h")))
        .groupBy(col("i"), col("h")).agg(count(lit(1)).as("c"))
      val exact = ev.groupBy(col("k")).agg(count(lit(1)).as("exact"))
      val probes = exact.select(col("k"), col("exact"),
        posexplode(hashes).as(Seq("i", "h")))
      probes.join(counters, Seq("i", "h"))
        .groupBy(col("k"), col("exact")).agg(min(col("c")).as("cm_est"))
        .select(col("k").as("user_key"), col("exact"), col("cm_est"),
          (col("cm_est") - col("exact")).as("overest"))
        .orderBy(col("cm_est").desc, col("user_key")).limit(10)
    }),

    // Cohort retention triangle — the other product-analytics staple
    // next to q19's funnel: users cohort by the week of their FIRST
    // qualifying event, each later qualifying week lands in (cohort,
    // week-offset) cells, and retention = cell actives / cohort size.
    // The qualifying behavior is big-ticket purchases (value > 60):
    // sparse enough (~3/user/month) that first occurrences SPREAD over
    // weeks — 4 cohorts with ~0.5 weekly retention — where raw
    // activity (67 events/user/month) degenerates to one all-1.0
    // cohort. Three aggregations, all keyed and map-side-combinable;
    // the corpus never moves wider than (user_id, week) pairs.
    // offset-0 retention is 1.0 by construction (every user qualifies
    // in their own first week), the spec's self-check.
    "q21_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type") === "purchase" && col("value") > 60d)
        .select(col("user_id"),
          floor(datediff(to_date(col("ts")), lit("2024-01-01")) / 7)
            .cast("long").as("week"))
      val firstW = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
      val activity = ev.distinct()
      val cells = activity.join(firstW, "user_id")
        .groupBy(col("cohort"), (col("week") - col("cohort")).as("offset"))
        .agg(count(lit(1)).as("n_active"))
      val sizes = firstW.groupBy(col("cohort")).agg(count(lit(1)).as("n_cohort"))
      cells.join(sizes, "cohort")
        .select(col("cohort"), col("offset"), col("n_cohort"), col("n_active"),
          round(col("n_active").cast("double") / col("n_cohort"), 6)
            .as("retention"))
        .orderBy(col("cohort"), col("offset"))
    }),

    // Interval self-join (event co-occurrence): ordered pairs of events
    // by the same user within a 5-minute window, counted per type pair.
    // The naive form is a non-equi self-join (O(n^2) nested-loop at
    // scale); the scale shape used here BUCKETIZES time into
    // window-sized bins so the pair search becomes an EQUI-join on
    // (user_id, bin): a later event within 300s of an earlier one lives
    // in the same bin or the next, so each left row probes exactly two
    // bins (explode), the join shuffles on (user_id, bin) like any hash
    // join, and the residual time/order predicate filters bin-mates
    // beyond the window. No nested loop, no range explosion; skew =
    // one user's burst within one 5-min bin, bounded by event rate.
    "q15_time_cooccur" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      cooccurPairs(ev, 300000000L) // 5-minute window
        .groupBy(col("a_type"), col("b_type"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("a_type"), col("b_type"))
    }),

    // HyperLogLog distinct-count sketch (Flajolet et al. 2007), fully
    // deterministic so the DuckDB oracle computes the IDENTICAL
    // estimate: md5-derived 64-bit hash, p=9 (512 buckets from the top
    // 9 bits of the first half), rank = leading zeros of the remaining
    // 55 bits + 1 via bit-length (length(bin(w)) — exact integer path,
    // no float log), and the 2^-M harmonic sum kept EXACT by scaling to
    // 2^56 integers summed as DECIMAL(38,0) (double summation order
    // would differ between engines). One groupBy(bucket).max — at
    // 100 TB this is a 512-row hash aggregate with map-side partial
    // max; the sketch merges across any partitioning (max is
    // commutative), which is the whole point of HLL on a cluster.
    // Companion to q14's KMV over the same ground truth.
    "q16_hll_ndv" -> ((s, dir) => {
      val m = 512
      val scaled = 72057594037927936L // 2^56
      val parts = Tables.lineitem(s, dir)
        .select(md5(col("l_orderkey").cast("string")).as("h"))
        .select(
          conv(substring(col("h"), 1, 8), 16, 10).cast("long").as("h1"),
          conv(substring(col("h"), 9, 8), 16, 10).cast("long").as("h2"))
      val maxRank = parts
        .select(shiftright(col("h1"), 23).as("bucket"),
          (col("h1").bitwiseAND(lit(0x7FFFFFL)) * lit(4294967296L) + col("h2")).as("w"))
        .select(col("bucket"),
          when(col("w") === 0, lit(56L))
            .otherwise(lit(56L) - length(bin(col("w")))).as("rank"))
        .groupBy(col("bucket")).agg(max(col("rank")).as("mr"))
      val sketch = maxRank.agg(
        count(lit(1)).as("n_buckets"),
        sum(expr("cast(shiftleft(1L, cast(56 - mr as int)) as decimal(38,0))")).as("ssum"))
      val exact = Tables.lineitem(s, dir)
        .agg(countDistinct(col("l_orderkey")).as("exact_ndv"))
      sketch.crossJoin(exact)
        .select(col("exact_ndv"),
          (lit(m) - col("n_buckets")).cast("long").as("v_empty"),
          ((lit(0.7213 / (1.0 + 1.079 / m)) * m * m * scaled.toDouble) /
            (col("ssum") + (lit(m) - col("n_buckets")).cast("decimal(38,0)") * lit(scaled))
              .cast("double")).as("raw"))
        .select(col("exact_ndv"),
          round(when(col("raw") <= lit(2.5 * m) && col("v_empty") > 0,
              lit(m.toDouble) * log(lit(m.toDouble) / col("v_empty")))
            .otherwise(col("raw")), 2).as("est_ndv"))
        .withColumn("rel_err",
          round(abs(col("est_ndv") - col("exact_ndv")) / col("exact_ndv"), 4))
    }),

    // Distributed quantile estimation from a deterministic mergeable
    // sample: the k rows with the smallest md5(row-key) are a uniform
    // sample that every engine/partitioning selects IDENTICALLY (hash
    // order is data-defined), so the estimate itself is oracle-checked,
    // not just the machinery. ORDER BY hash LIMIT k compiles to
    // TakeOrderedAndProject (per-partition top-k + one k-row merge —
    // the same shape a t-digest/GK sketch would merge with, minus the
    // nondeterminism those sketches carry across merge orders). The
    // window that ranks the k-row sample runs on ONE partition of k
    // rows — bounded by construction, never by input size. Estimates at
    // q50/q90/q99 sit beside the exact interpolated quantiles.
    "q17_sample_quantiles" -> ((s, dir) => {
      val k = 1024
      // spread the single-row-group scan (r17): the md5 sample key and
      // the exact-percentile partials otherwise run on ONE core
      val li = Tables.lineitemSpread(s, dir).select(col("l_extendedprice").as("v"),
        md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))).as("h"))
      val sample = li.orderBy(col("h"), col("v")).limit(k)
        .select(col("v"))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("v")))) // k rows, single partition by design
      // one pass over the sample: a per-q union would re-run the
      // TakeOrderedAndProject (a full-input top-k) once per quantile —
      // measured 3x the whole query's cost
      val ranks = Seq(0.5, 0.9, 0.99).map(q => math.ceil(q * k).toLong)
      val est = sample.filter(col("rn").isin(ranks: _*))
        .select(when(col("rn") === ranks(0), 0.5)
            .when(col("rn") === ranks(1), 0.9).otherwise(0.99).as("q"),
          col("v").as("est_v"))
      // ONE array-percentile aggregate: three scalar percentile() calls
      // each build and merge their own full value buffer — measured
      // 6.6s vs 4.0s for this form at sf0.1 (the buffer itself is the
      // irreducible cost of EXACT quantiles; at corpus scale only the
      // sample estimate survives, this column is the gauge's truth).
      // r17 examined and KEPT: a distributed count-table rendition of
      // the same interpolation was built and measured SLOWER (l_extendedprice
      // is 583k distinct of 600k rows at sf0.1, so the count table
      // compresses nothing and its cumulative window + bracket joins
      // re-ran the scan subtree per branch); the serial ~1.2 s buffer
      // merge is the honest price of the exact gauge column.
      val exact = li.agg(
        expr("percentile(v, array(0.5D, 0.9D, 0.99D))").as("xs"))
      est.crossJoin(exact)
        .select(col("q"), round(col("est_v"), 2).as("est_v"),
          round(element_at(col("xs"),
            when(col("q") === 0.5, 1).when(col("q") === 0.9, 2)
              .otherwise(3)), 2).as("exact_v"))
        .withColumn("abs_err", round(abs(col("est_v") - col("exact_v")), 2))
        .orderBy(col("q"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q13_table_profile" -> {
      val numCols = Seq("l_orderkey", "l_quantity", "l_extendedprice")
      val strCols = Seq("l_returnflag", "l_linestatus")
      val rows = (numCols.map { c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
            count($c) AS n_notnull, count(*) - count($c) AS n_null,
            count(DISTINCT $c) AS ndv,
            round(CAST(min($c) AS DOUBLE), 6) AS min_num,
            round(CAST(max($c) AS DOUBLE), 6) AS max_num,
            CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
            FROM lineitem"""
      } ++ strCols.map { c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
            count($c) AS n_notnull, count(*) - count($c) AS n_null,
            count(DISTINCT $c) AS ndv,
            CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
            min($c) AS min_str, max($c) AS max_str
            FROM lineitem"""
      }).mkString(" UNION ALL ")
      s"SELECT * FROM ($rows) ORDER BY column_name"
    },
    "q14_kmv_ndv" ->
      """WITH h AS (SELECT DISTINCT md5(CAST(l_orderkey AS VARCHAR)) AS h
           FROM lineitem),
         kth AS (SELECT max(h) AS h_k, count(*) AS n_sketch
           FROM (SELECT h FROM h ORDER BY h LIMIT 256)),
         ex AS (SELECT count(DISTINCT l_orderkey) AS exact_ndv FROM lineitem)
         SELECT CAST(n_sketch AS BIGINT) AS n_sketch,
           CAST(exact_ndv AS BIGINT) AS exact_ndv,
           CASE WHEN n_sketch < 256 THEN CAST(exact_ndv AS DOUBLE)
                ELSE round(255.0 / (CAST(('0x' || substring(h_k, 1, 8)) AS BIGINT)
                  / 4294967296.0), 2) END AS est_ndv,
           round(abs(CASE WHEN n_sketch < 256 THEN CAST(exact_ndv AS DOUBLE)
                ELSE round(255.0 / (CAST(('0x' || substring(h_k, 1, 8)) AS BIGINT)
                  / 4294967296.0), 2) END - exact_ndv) / exact_ndv, 4) AS rel_err
         FROM kth CROSS JOIN ex""",
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
         round(avg(l_quantity), 2) AS avg_qty,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_revenue_by_nation" ->
      """SELECT n_name, r_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY n_name, r_name ORDER BY n_name, r_name""",
    "q03_top_orders" ->
      """SELECT l_orderkey, revenue, o_orderstatus FROM (
           SELECT l_orderkey,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM lineitem GROUP BY l_orderkey) agg
         JOIN orders ON l_orderkey = o_orderkey
         ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",
    "q04_running_quantity" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty
         FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "q05_next_ship_gap" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         CAST(date_diff('day', l_shipdate, lead(l_shipdate, 1) OVER (
           PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)) AS INT)
           AS gap_days
         FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "q06_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
         count(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_shipdate <  TIMESTAMP '1996-01-01'
           AND l_discount BETWEEN 0.02 AND 0.09 AND l_quantity < 24""",
    "q07_customer_activity" ->
      """SELECT c_mktsegment,
         count(*) FILTER (WHERE has_order) AS n_active,
         count(*) FILTER (WHERE NOT has_order) AS n_idle
         FROM (SELECT c_mktsegment,
                 EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_order
               FROM customer) t
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q08_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
         count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q09_event_sessions" ->
      """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
         FROM (SELECT user_id,
                 CASE WHEN prev_ts IS NULL
                        OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
                      THEN 1 ELSE 0 END AS new_session
               FROM (SELECT user_id, ts,
                       lag(ts, 1) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev_ts
                     FROM events) a) b
         GROUP BY user_id ORDER BY user_id""",
    "q10_events_json" ->
      """SELECT event_type, CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
         count(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q19_funnel" ->
      """WITH r AS (SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn
           FROM events),
         v AS (SELECT user_id, min(rn) AS v_rn FROM r
           WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT r.user_id, min(rn) AS c_rn FROM r JOIN v USING (user_id)
           WHERE event_type = 'click' AND rn > v_rn GROUP BY r.user_id),
         p AS (SELECT r.user_id, min(rn) AS p_rn FROM r JOIN c USING (user_id)
           WHERE event_type = 'purchase' AND rn > c_rn GROUP BY r.user_id),
         u AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
         s AS (SELECT (SELECT n_users FROM u) AS n_users,
             (SELECT count(*) FROM v) AS n_view,
             (SELECT count(*) FROM c) AS n_click,
             (SELECT count(*) FROM p) AS n_purchase)
         SELECT CAST(n_users AS BIGINT) AS n_users,
           CAST(n_view AS BIGINT) AS n_view,
           CAST(n_click AS BIGINT) AS n_click,
           CAST(n_purchase AS BIGINT) AS n_purchase,
           round(CAST(n_view AS DOUBLE) / n_users, 6) AS r_view,
           round(CAST(n_click AS DOUBLE) / n_view, 6) AS r_click,
           round(CAST(n_purchase AS DOUBLE) / n_click, 6) AS r_purchase
         FROM s""",
    "q21_retention" ->
      """WITH ev AS (SELECT user_id,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
             AS BIGINT) AS week
         FROM events WHERE event_type = 'purchase' AND value > 60),
         f AS (SELECT user_id, min(week) AS cohort FROM ev GROUP BY user_id),
         a AS (SELECT DISTINCT user_id, week FROM ev),
         c AS (SELECT f.cohort, a.week - f.cohort AS offset,
             count(*) AS n_active
           FROM a JOIN f USING (user_id) GROUP BY 1, 2),
         s AS (SELECT cohort, count(*) AS n_cohort FROM f GROUP BY cohort)
         SELECT c.cohort, c.offset, CAST(s.n_cohort AS BIGINT) AS n_cohort,
           CAST(c.n_active AS BIGINT) AS n_active,
           round(CAST(c.n_active AS DOUBLE) / s.n_cohort, 6) AS retention
         FROM c JOIN s USING (cohort) ORDER BY c.cohort, c.offset""",
    "q20_cm_heavy_hitters" ->
      """WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
         hs AS (SELECT k, i,
             CAST(('0x' || substring(md5(CAST(i AS VARCHAR) || ':' || k), 1, 8))
               AS BIGINT) % 64 AS h
           FROM ev CROSS JOIN (SELECT unnest(range(0, 4)) AS i) r),
         counters AS (SELECT i, h, count(*) AS c FROM hs GROUP BY i, h),
         exact AS (SELECT k, count(*) AS exact FROM ev GROUP BY k),
         probes AS (SELECT DISTINCT e.k, e.exact, s.i, s.h
           FROM exact e JOIN hs s ON e.k = s.k),
         est AS (SELECT p.k, p.exact, min(c.c) AS cm_est
           FROM probes p JOIN counters c ON p.i = c.i AND p.h = c.h
           GROUP BY p.k, p.exact)
         SELECT k AS user_key, CAST(exact AS BIGINT) AS exact,
           CAST(cm_est AS BIGINT) AS cm_est,
           CAST(cm_est - exact AS BIGINT) AS overest
         FROM est ORDER BY cm_est DESC, user_key LIMIT 10""",
    "q12_asof_attribution" ->
      """SELECT p.event_id AS event_id, p.user_id AS user_id,
         c.event_id AS click_event_id,
         CAST(date_diff('microsecond', c.ts, p.ts) AS BIGINT) AS gap_us
         FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS event_id
                         FROM events WHERE event_type = 'click'
                         GROUP BY user_id, ts) c
           ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY p.event_id""",
    "q11_revenue_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_rows,
         CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    // Islands idiom re-derives session_window's gap semantics: a new
    // session starts when the gap from the previous event is >= 30 min
    // (Spark sessions are [start, last+gap) — an event landing exactly
    // at the previous session's end opens a NEW session).
    "q18_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
         m AS (SELECT *, CASE WHEN prev_us IS NULL
                 OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS ns
           FROM (SELECT *, lag(us) OVER (PARTITION BY user_id
                   ORDER BY us) AS prev_us FROM e) a),
         g AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY us
                 ROWS UNBOUNDED PRECEDING) AS sid FROM m)
         SELECT user_id, make_timestamp(min(us)) AS session_start,
           max(us) + 1800000000 AS session_end_us,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM g GROUP BY user_id, sid
         ORDER BY user_id, session_start""",

    // The oracle states the SEMANTICS as the naive non-equi self-join;
    // the engine's bucketed equi-join must enumerate the same pairs.
    "q15_time_cooccur" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
           FROM events)
         SELECT a.event_type AS a_type, b.event_type AS b_type,
           count(*) AS n_pairs
         FROM e a JOIN e b ON a.user_id = b.user_id
           AND (b.us > a.us OR (b.us = a.us AND b.event_id > a.event_id))
           AND b.us - a.us <= 300000000
         GROUP BY a.event_type, b.event_type
         ORDER BY a_type, b_type""",
    "q16_hll_ndv" ->
      """WITH p AS (SELECT
           CAST(('0x' || substring(h, 1, 8)) AS BIGINT) AS h1,
           CAST(('0x' || substring(h, 9, 8)) AS BIGINT) AS h2
           FROM (SELECT md5(CAST(l_orderkey AS VARCHAR)) AS h FROM lineitem)),
         mr AS (SELECT h1 >> 23 AS bucket,
             max(CASE WHEN (h1 & 8388607) * 4294967296 + h2 = 0 THEN 56
                 ELSE 56 - length(bin((h1 & 8388607) * 4294967296 + h2)) END) AS mr
           FROM p GROUP BY bucket),
         sk AS (SELECT count(*) AS n_buckets,
             sum(CAST((CAST(1 AS BIGINT) << CAST(56 - mr AS INTEGER))
                 AS DECIMAL(38,0))) AS ssum
           FROM mr),
         ex AS (SELECT count(DISTINCT l_orderkey) AS exact_ndv FROM lineitem),
         t AS (SELECT exact_ndv, (512 - n_buckets) AS v_empty,
             (0.7213 / (1 + 1.079 / 512) * 512 * 512 * 72057594037927936.0) /
             CAST(ssum + CAST(512 - n_buckets AS DECIMAL(38,0))
               * 72057594037927936 AS DOUBLE) AS raw
           FROM sk CROSS JOIN ex),
         t2 AS (SELECT exact_ndv,
             round(CASE WHEN raw <= 1280.0 AND v_empty > 0
                   THEN 512.0 * ln(512.0 / v_empty) ELSE raw END, 2) AS est_ndv
           FROM t)
         SELECT CAST(exact_ndv AS BIGINT) AS exact_ndv, est_ndv,
           round(abs(est_ndv - exact_ndv) / exact_ndv, 4) AS rel_err
         FROM t2""",
    "q17_sample_quantiles" ->
      """WITH li AS (SELECT l_extendedprice AS v,
           md5(CAST(l_orderkey AS VARCHAR) || '|'
               || CAST(l_linenumber AS VARCHAR)) AS h
           FROM lineitem),
         s AS (SELECT v, row_number() OVER (ORDER BY v) AS rn
           FROM (SELECT v FROM li ORDER BY h, v LIMIT 1024)),
         e AS (SELECT quantile_cont(v, 0.5) AS x50,
             quantile_cont(v, 0.9) AS x90, quantile_cont(v, 0.99) AS x99
           FROM li),
         est AS (SELECT CAST(0.5 AS DOUBLE) AS q, v AS est_v FROM s WHERE rn = 512
           UNION ALL SELECT CAST(0.9 AS DOUBLE), v FROM s WHERE rn = 922
           UNION ALL SELECT CAST(0.99 AS DOUBLE), v FROM s WHERE rn = 1014),
         r AS (SELECT q, round(est_v, 2) AS est_v,
             round(CASE WHEN q = 0.5 THEN x50 WHEN q = 0.9 THEN x90
                   ELSE x99 END, 2) AS exact_v
           FROM est CROSS JOIN e)
         SELECT q, est_v, exact_v, round(abs(est_v - exact_v), 2) AS abs_err
         FROM r ORDER BY q""",
  )
}
