package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}
import graft.Det._

/** Relational operator surface (SURVEY.md §2 groups A–G), expressed as
  * Catalyst-friendly DataFrame plans over the harness tables, each paired
  * with an equivalent DuckDB oracle SQL for the driver's hash compare.
  *
  * Determinism discipline (see [[graft.Det]]): double aggregates go through
  * exact DECIMAL sums; time arithmetic is epoch-micros longs; every
  * tie-breakable order carries a total key.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Register all harness tables as temp views and run a SQL text that is
    * valid in BOTH Spark SQL and DuckDB (used for GROUPING SETS etc.). */
  private def viaSql(q: String): Q = (s, d) => {
    Tables.all.foreach { n =>
      val df = if (n == "events") Tables.events(s, d) else Tables.load(s, d, n)
      df.createOrReplaceTempView(n)
    }
    s.sql(q)
  }

  private val dayUs = 86400000000L
  private val jan1_2024Us = 1704067200000000L

  // ---------------------------------------------------------------- queries

  val queries: Map[String, Q] = Map(
    // C8/C1/C6 — pricing summary (hash agg, decimal-exact sums). Ref: reporting.py:172-198 (avg/sum over groups).
    "q1_agg" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          round(sum(dec($"l_extendedprice") * (lit(1.0).cast(Det.Money) - dec($"l_discount"))), 2)
            .cast("double").as("sum_disc_price"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // A6/B1/B5 — parquet scan with pushed filter + pruned columns. Ref: discovery.py:218-225 (projection).
    "a6_scan_prune" -> ((s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .filter($"p_size" >= 40)
        .select($"p_partkey", $"p_size", $"p_retailprice")
    }),

    // B3 — IN-list filter. Ref: discovery.py:24,58 (isin).
    "b3_isin" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_returnflag".isin("A", "R"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
    }),

    // B5 — conjunctive range predicates. Ref: utils.py:191-195.
    "b5_range" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
                $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
                $"l_discount" >= 0.05 && $"l_quantity" < 25)
        .agg(count(lit(1)).as("n"), dsumProd($"l_extendedprice", $"l_discount").as("revenue"))
    }),

    // B4/D3 — anti join: parts with no 1995 shipment. Ref: handoff_batch.py:84-94 (NOT-IN).
    "b4_anti" -> ((s, d) => {
      import s.implicits._
      val shipped95 = Tables.lineitem(s, d)
        .filter($"l_shipdate" < lit("1996-01-01").cast("timestamp"))
        .select($"l_partkey")
      Tables.part(s, d)
        .join(shipped95, $"p_partkey" === $"l_partkey", "left_anti")
        .groupBy($"p_brand").agg(count(lit(1)).as("n_never_shipped"))
    }),

    // B6/B7 — conditional rewrite (when/otherwise banding). Ref: discovery.py:183-187 (np.where).
    "b6_band" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .withColumn("band",
          when($"o_totalprice" < 100000d, "low")
            .when($"o_totalprice" < 300000d, "mid")
            .otherwise("high"))
        .groupBy($"band")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_price"))
    }),

    // B11/G5 — string scalar functions. Ref: handoff_batch.py:83,111,125.
    "b11_strings" -> ((s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .filter($"p_name".contains("e"))
        .select(
          $"p_partkey",
          upper($"p_name").as("uname"),
          regexp_replace($"p_name", "[aeiou]", "").as("consonants"),
          length($"p_name").as("name_len"))
    }),

    // B12 — null-fill / coalesce. Ref: batch_detection.R:50 (NOT_SET fill).
    "b12_coalesce" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .withColumn("status_full", coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")))
        .groupBy($"status_full").agg(count(lit(1)).as("n"))
    }),

    // C1 — per-group min/max of timestamps. Ref: utils.py:30-51.
    "c1_minmax" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(min($"l_shipdate").as("first_ship"), max($"l_shipdate").as("last_ship"),
          count(lit(1)).as("n_items"))
    }),

    // C2 — argmin-correlated aggregate via struct ordering: price of the
    // lexicographically (shipdate, price)-minimal item. Ref: utils.py:93-106.
    "c2_argmin" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(min(struct($"l_shipdate", dec($"l_extendedprice").as("price"))).as("m"))
        .select($"l_orderkey", $"m.l_shipdate".as("first_ship"),
          $"m.price".cast("double").as("price_at_first_ship"))
    }),

    // C3 — two-level aggregate: per user, latest first-occurrence over event
    // types. Ref: utils.py:54-66 (batch-instance enabled).
    "c3_twolevel" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id", $"event_type").agg(min($"ts").as("first_ts"))
        .groupBy($"user_id")
        .agg(max($"first_ts").as("latest_first_ts"), count(lit(1)).as("n_types"))
    }),

    // C4 — count distinct + histogram of it. Ref: discovery.py:29, utils.py:190-196.
    "c4_distinct" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_partkey").agg(countDistinct($"l_suppkey").as("n_supp"))
        .groupBy($"n_supp").agg(count(lit(1)).as("n_parts"))
    }),

    // C5 — distinct-sorted set as a group key. Ref: utils.py:14-27.
    "c5_setkey" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id")
        .agg(concat_ws(",", sort_array(collect_set($"event_type"))).as("type_set"))
    }),

    // C6 — group-size gate (HAVING). Ref: activation_rules.py:180.
    "c6_having" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
        .filter($"n" > 4)
    }),

    // C7 — histogram of group sizes. Ref: reporting.py:171,189.
    "c7_hist" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_orderkey").agg(count(lit(1)).as("sz"))
        .groupBy($"sz").agg(count(lit(1)).as("n_orders"))
    }),

    // C9/C10 — ratio of sums with zero guard (CTE metric). Ref: reporting.py:201-206.
    "c9_ratio" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(dratio($"l_extendedprice" * $"l_discount", $"l_extendedprice").as("disc_share"))
    }),

    // C11 — global max id allocation. Ref: discovery.py:40,74.
    "c11_maxid" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d).agg((max($"o_orderkey") + 1).as("next_id"), count(lit(1)).as("n"))
    }),

    // C13/W1/E3 — deterministic first-row-per-group via struct-min (total
    // order: ts, event_id). Ref: reporting.py:29,48; analysis.py:73.
    "c13_first" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id")
        .agg(min(struct($"ts", $"event_id", $"event_type")).as("m"))
        .select($"user_id", $"m.ts".as("first_ts"), $"m.event_id".as("first_event_id"),
          $"m.event_type".as("first_type"))
    }),

    // C14 — EXACT per-group quantiles (rank-based / SQL type-1: the value at
    // rank ceil(p*n)), the exact-path complement of j6_sketch's
    // percentile_approx. Values are e6-quantized longs so the rank order is
    // total and engine-identical; the target rank is computed in INTEGER
    // arithmetic ((pct*n + 99) div 100) — ceil(0.99*n) in doubles is off by
    // one whenever 0.99*n lands epsilon above an integer. One sort per
    // group (windows partition on event_type); exact quantiles fundamentally
    // order the group — at extreme scale the approx sketch (j6) is the
    // cheap path, this is the exact one. Ref: reporting.py:171-198 (summary
    // statistics surface).
    "c14_quantiles" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val v = Tables.events(s, d)
        .select($"event_type", round($"value" * 1000000d).cast("long").as("v6"))
      val ranked = v.withColumn("rn",
        row_number().over(Window.partitionBy($"event_type").orderBy($"v6")).cast("long"))
      val counts = v.groupBy($"event_type").agg(count(lit(1)).as("n"))
      val pcts = s.range(1).select(explode(typedLit(Seq(50L, 90L, 99L))).as("p_pct"))
      // 3-row broadcast product join (allowlisted bounded side), then the
      // integer rank predicate selects one row per (group, pct).
      ranked.join(counts, Seq("event_type"))
        .crossJoin(broadcast(pcts))
        .filter($"rn" === expr("(p_pct * n + 99) div 100"))
        .select($"event_type", $"p_pct", $"n", $"v6".as("quantile_e6"))
    }),

    // C16 — per-group z-score normalization (feature standardization): the
    // group stats come from EXACT decimal sums (sum, sum of squares,
    // count), cast to double once, then one fixed-shape IEEE expression —
    // (v − s/n) / sqrt((q − s²/n)/(n−1)) — evaluates to the same bits in
    // any engine (+,−,×,÷,sqrt are all correctly rounded). The stats grain
    // is |event_type| rows: broadcast back, row-local verdicts — one
    // aggregate shuffle total at any scale.
    "c16_zscore" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d).select($"event_id", $"event_type", $"value")
      val stats = e.groupBy($"event_type").agg(
        sum(dec($"value")).as("sd"),
        sum(dec($"value") * dec($"value")).as("sq"),
        count(lit(1)).as("n"))
      val s1 = $"sd".cast("double"); val q = $"sq".cast("double")
      val nd = $"n".cast("double")
      val mean = s1 / nd
      val variance = (q - (s1 * s1) / nd) / (nd - 1d)
      e.join(broadcast(stats), Seq("event_type"))
        .select($"event_id", $"event_type", $"value",
          when($"n" > 1L && variance > 0d,
            round(($"value" - mean) / sqrt(variance), 6)).otherwise(0d).as("z"))
    }),

    // C-gs — GROUPING SETS (report two-level output). Ref: reporting.py:142-198.
    "cx_grouping_sets" -> viaSql(
      """SELECT l_returnflag, coalesce(l_linestatus, 'ALL') AS linestatus,
        |count(*) AS cnt,
        |CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus))""".stripMargin),

    // E4 — ORDERED FUNNEL: how far does each user progress through
    // click -> view -> purchase, where each stage must occur AT OR AFTER
    // the previous stage's first instant (the product-analytics
    // conversion query). Three stage-aggregates, each a shuffle on
    // user_id reusing the same partitioning; no window over the event
    // grain. Output is the 4-row stage histogram.
    "e4_funnel" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
        .select($"user_id", $"event_type", graft.Det.us($"ts").as("t"))
      val c = e.filter($"event_type" === "click")
        .groupBy($"user_id").agg(min($"t").as("tc"))
      val v = e.filter($"event_type" === "view").join(c, Seq("user_id"))
        .filter($"t" >= $"tc")
        .groupBy($"user_id").agg(min($"t").as("tv"))
      val p = e.filter($"event_type" === "purchase").join(v, Seq("user_id"))
        .filter($"t" >= $"tv")
        .groupBy($"user_id").agg(min($"t").as("tp"))
      e.select($"user_id").distinct()
        .join(c, Seq("user_id"), "left")
        .join(v, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(when($"tp".isNotNull, 3L).when($"tv".isNotNull, 2L)
          .when($"tc".isNotNull, 1L).otherwise(0L).as("funnel_stage"))
        .groupBy($"funnel_stage").agg(count(lit(1)).as("n_users"))
    }),

    // E5 — COHORT RETENTION: users grouped by first-seen day; how many
    // return exactly 1 / 7 days later. Two user-grain aggregates joined
    // on user_id, then conditional counts per cohort day — the layout
    // that keeps the retention matrix a |days|^2-bounded output no
    // matter the event count.
    "e5_cohort" -> ((s, d) => {
      import s.implicits._
      val days = Tables.events(s, d)
        .select($"user_id", graft.Det.dayI($"ts").as("day_i")).distinct()
      val cohort = days.groupBy($"user_id").agg(min($"day_i").as("c0"))
      cohort
        .join(days.select($"user_id", $"day_i".as("d1i")), Seq("user_id"), "left")
        .groupBy($"user_id", $"c0")
        .agg(max(when($"d1i" === $"c0" + 1, 1L).otherwise(0L)).as("r1"),
          max(when($"d1i" === $"c0" + 7, 1L).otherwise(0L)).as("r7"))
        .groupBy($"c0".as("cohort_day_i"))
        .agg(count(lit(1)).as("n_users"), sum($"r1").as("n_day1"),
          sum($"r7").as("n_day7"))
    }),

    // Cx — ROLLING window frame (RANGE BETWEEN on a day key): 7-day
    // rolling totals per event type over the daily aggregate grain. The
    // RANGE frame is value-based — a day with no events still closes the
    // frame correctly (a ROWS frame would silently span gaps). Partitioned
    // by event_type; the frame walks the (tiny) per-type day series, not
    // the event grain, so the window input is |types| x |days| regardless
    // of corpus size.
    "cx_rolling" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"day_i")
        .rangeBetween(-6, 0)
      Tables.events(s, d)
        .select($"event_type", graft.Det.dayI($"ts").as("day_i"), $"value")
        .groupBy($"event_type", $"day_i")
        .agg(count(lit(1)).as("n"),
          round(sum($"value".cast("decimal(18,2)")), 2).as("sd"))
        .select($"event_type", $"day_i", $"n",
          sum($"n").over(w).as("roll_n"),
          sum($"sd").over(w).cast("double").as("roll_sum"))
    }),

    // Cx — the analytic-window bundle (lag/lead/first_value/percent_rank/
    // cume_dist): per-user ordered event context in ONE window pass (all
    // five functions share a frame, so one shuffle + one sort). Total
    // order (ts, event_id) makes every output deterministic; the
    // rank-family doubles are single divisions of exact integers, rounded
    // identically on both engines. Partitioned by user_id — corpus-
    // parallel, no single-partition window.
    "cx_analytics" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .select($"event_id", $"user_id",
          lag($"event_type", 1).over(w).as("prev_type"),
          lead($"event_type", 1).over(w).as("next_type"),
          first($"event_type").over(w).as("first_type"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
    }),

    // Cx — PIVOT (long -> wide reshape): per-user event-type counts as
    // columns. Values are passed EXPLICITLY — an implicit pivot runs an
    // extra distinct JOB over the full table at plan time just to learn
    // the column set; at 100 TB the schema (not the data) should define
    // it. Compiles to one ordinary hash aggregate with pivot-first
    // combine — no extra shuffle vs the long groupBy.
    // Cx — SESSIONIZATION (30-min inactivity gap): the canonical
    // event-stream grouping, as a batch op. One window pass per user
    // (lag -> new-session flag -> running sum), then a session-grain
    // aggregate — partitioned by user_id, corpus-parallel, the batch twin
    // of st_session's streaming session window. Total order (ts, event_id)
    // makes session boundaries deterministic under timestamp ties.
    "cx_sessions" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"us", $"event_id")
      val run = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .select($"user_id", $"event_id", graft.Det.us($"ts").as("us"))
        .withColumn("prev", lag($"us", 1).over(w))
        .withColumn("flag", when($"prev".isNull || $"us" - $"prev" > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_no", sum($"flag").over(run))
        .groupBy($"user_id", $"session_no")
        .agg(count(lit(1)).as("n_events"),
          min($"us").as("start_us"), max($"us").as("end_us"))
        .select($"user_id", $"session_no", $"n_events", $"start_us", $"end_us",
          ($"end_us" - $"start_us").as("dur_us"))
    }),

    "cx_pivot" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select($"user_id", $"click".as("n_click"), $"error".as("n_error"),
          $"purchase".as("n_purchase"), $"signup".as("n_signup"),
          $"view".as("n_view"))
    }),

    // D1 — aggregate write-back as shuffle equi-join (the per-user aggregate
    // grain grows with the data — a forced broadcast OOMs at 100 TB; AQE
    // still broadcasts at runtime when the side is small). Ref:
    // analysis.py:82-105.
    "d1_writeback" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
      val perUser = e.groupBy($"user_id".as("u"))
        .agg(count(lit(1)).as("user_n"), dsum($"value").as("user_sum"))
      e.select($"event_id", $"user_id", $"value")
        .join(perUser, $"user_id" === $"u")
        .select($"event_id", $"user_id", $"value", $"user_n", $"user_sum")
    }),

    // D1 at a HOT key — the salted-join demo: event_type has a handful of
    // values over the whole fact table, the definitional skew join. The
    // salt is plan-side only; the result is bit-identical to the plain
    // join (the DuckDB oracle is the unsalted form).
    "d8_salted_join" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
      val perType = e.groupBy($"event_type")
        .agg((dsum($"value") / count(lit(1))).as("type_avg"))
      SkewOps.saltedJoin(e.select($"event_id", $"event_type", $"value"),
          perType, Seq("event_type"))
        .filter($"value" > lit(1.9) * $"type_avg")
        .select($"event_id", $"event_type", $"value",
          round($"type_avg", 6).as("type_avg"))
    }),

    // Layout — Morton (Z-order) clustering key over two bounded dims; the
    // sort-before-write key that buys parquet min/max pruning on BOTH
    // columns (see Layout.zorder2). Graded as the deterministic top-20 by
    // key (the clustering order itself — what a writer would sort by).
    "g9_zorder" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_partkey", $"l_linenumber",
          Layout.zorder2(pmod($"l_orderkey", lit(1024)).cast("long"),
            pmod($"l_partkey", lit(1024)).cast("long")).as("zkey"))
        .orderBy($"zkey", $"l_orderkey", $"l_partkey", $"l_linenumber")
        .limit(20)
    }),

    // D9 — bucket-co-located fact-fact join: both sides written bucketed +
    // sorted by the join key, so the join itself plans with no Exchange
    // and no Sort (PlanSpec locks it); the only shuffle is the final
    // small aggregate. See relational.Bucketing.
    "d9_bucket_join" -> ((s, d) => Bucketing.bucketJoinAgg(s, d)),

    // D2 — left-semi join. Ref: handoff_batch.py:66-74.
    "d2_semi" -> ((s, d) => {
      import s.implicits._
      val highDisc = Tables.lineitem(s, d).filter($"l_discount" >= 0.08).select($"l_orderkey")
      Tables.orders(s, d)
        .join(highDisc, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    }),

    // D4 — interval (theta) join: per daily instant, active events/users
    // (event active in [ts, ts + value minutes]). Ref: utils.py:179-196 workload.
    "d4_interval" -> ((s, d) => {
      import s.implicits._
      val instants = s.range(0, 31)
        .select(Det.tsNtz(lit(jan1_2024Us) + $"id" * dayUs).as("instant"))
      val e = Tables.events(s, d)
        .withColumn("end_us", us($"ts") + round($"value" * 60000000d).cast("long"))
      e.join(broadcast(instants),
          us($"ts") <= us($"instant") && us($"instant") <= $"end_us")
        .groupBy($"instant")
        .agg(countDistinct($"user_id").as("n_users"), count(lit(1)).as("n_active"))
    }),

    // D5 — as-of (predecessor) join: latest click before each purchase,
    // same user. Ref: handoff_batch.py:163-173.
    "d5_asof" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
      val p = e.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts")
      val c = e.filter($"event_type" === "click")
        .select($"user_id".as("cu"), $"ts".as("cts"))
      // Bounded lookback (30 days): an unbanded `cts <= ts` join is correct
      // but accumulates unbounded per-key state at 100 TB — the band caps
      // the per-purchase candidate set the same way st_join's attribution
      // twin bounds its stream state. prev/count semantics are "within the
      // band", mirrored exactly in the oracle.
      p.join(c, $"user_id" === $"cu" && $"cts" <= $"ts" &&
          $"cts" >= $"ts" - expr("INTERVAL 30 DAYS"), "left")
        .groupBy($"event_id")
        .agg(max($"cts").as("prev_click_ts"), count($"cts").as("n_prior_clicks"))
    }),

    // D5b — FORWARD as-of join (the other temporal-join direction: "the
    // NEXT click within 7 days after each purchase" — follow-up /
    // time-to-next-event analytics). Same bounded-band state argument as
    // d5_asof; min over the band is the earliest follower.
    "d5_asof_fwd" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
      val p = e.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts")
      val c = e.filter($"event_type" === "click")
        .select($"user_id".as("cu"), $"ts".as("cts"))
      p.join(c, $"user_id" === $"cu" && $"cts" > $"ts" &&
          $"cts" <= $"ts" + expr("INTERVAL 7 DAYS"), "left")
        .groupBy($"event_id")
        .agg(min($"cts").as("next_click_ts"), count($"cts").as("n_next_clicks"))
    }),

    // D6 — UNION ALL then aggregate. Ref: handoff_batch.py:59,213.
    "d6_union" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
      e.filter($"event_type" === "purchase")
        .unionByName(e.filter($"event_type" === "error"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
    }),

    // E2 — deterministic top-k (total order incl. tiebreak). Ref: handoff_batch.py:73.
    "e2_topk" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
        .select($"o_orderkey", $"o_totalprice")
    }),

    // G1 — date-part extraction; weekday is Monday=0 (pandas origin, SURVEY G1).
    "g1_dateparts" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d).select(
        $"event_id",
        weekday($"ts").as("day_of_week"),
        dayofmonth($"ts").as("day_of_month"),
        hour($"ts").as("hour_of_day"),
        minute($"ts").as("minute_of_hour"))
    }),

    // G4 — floor/round/pmod arithmetic. Ref: batch_injection.py:50,127-134.
    "g4_math" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("r", round($"value").cast("long"))
        .groupBy($"event_type")
        .agg(
          sum(floor($"value").cast("long")).as("sum_floor"),
          sum($"r").as("sum_round"),
          count(when(pmod($"r", lit(7)) === 0, 1)).as("n_mod7"))
    }),

    // G8 — semi-structured props extraction (regexp over JSON-ish text).
    "g8_json" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("k", regexp_extract($"props", "\"k\":\\s*(\\d+)", 1).cast("long"))
        .groupBy($"event_type")
        .agg(sum($"k").as("sum_k"), max($"k").as("max_k"), count(lit(1)).as("n"))
    }),

    // Multi-join + top-k (TPC-H Q3 shape): shipping-priority revenue.
    "q3_revenue" -> ((s, d) => {
      import s.implicits._
      val cust = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      val ord = Tables.orders(s, d).filter($"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      val li = Tables.lineitem(s, d).filter($"l_shipdate" > lit("1997-01-01").cast("timestamp"))
      // no broadcast() hint on customer: it grows with SF (1.5B rows at
      // TPC-H SF10k), so a forced broadcast is an executor OOM at scale —
      // the static 10MB threshold / AQE picks broadcast when actually small
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(round(sum(dec($"l_extendedprice") * (lit(1.0).cast(Det.Money) - dec($"l_discount"))), 2)
          .cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
        .select($"l_orderkey", $"revenue", $"o_orderdate")
    }),

    // Snowflake join chain (TPC-H Q5 shape): revenue per nation, one region,
    // customer and supplier in same nation. Dims broadcast.
    "q5_nation_revenue" -> ((s, d) => {
      import s.implicits._
      val nat = Tables.nation(s, d)
        .join(Tables.region(s, d).filter($"r_name" === "ASIA"),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")
      val cust = Tables.customer(s, d).select($"c_custkey", $"c_nationkey")
      val supp = Tables.supplier(s, d).select($"s_suppkey", $"s_nationkey")
      val ord = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
        .select($"o_orderkey", $"o_custkey")
      // supplier/customer scale with SF — no forced broadcast (see q3);
      // nation filtered by region is <= 25 rows, genuinely bounded
      Tables.lineitem(s, d)
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(supp, $"l_suppkey" === $"s_suppkey")
        .join(cust, $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(round(sum(dec($"l_extendedprice") * (lit(1.0).cast(Det.Money) - dec($"l_discount"))), 2)
          .cast("double").as("revenue"))
    })
  )

  // ------------------------------------------------------------ oracle SQL

  private val sumQty = "CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)"
  private val revenueExpr =
    "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)"

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |$sumQty AS sum_qty,
         |CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
         |$revenueExpr AS sum_disc_price,
         |round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity), 6) AS avg_qty,
         |round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount), 6) AS avg_disc,
         |count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "a6_scan_prune" ->
      "SELECT p_partkey, p_size, p_retailprice FROM part WHERE p_size >= 40",

    "b3_isin" ->
      s"""SELECT l_returnflag, count(*) AS n, $sumQty AS sum_qty
         |FROM lineitem WHERE l_returnflag IN ('A','R') GROUP BY l_returnflag""".stripMargin,

    "b5_range" ->
      """SELECT count(*) AS n,
        |CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |AND l_discount >= 0.05 AND l_quantity < 25""".stripMargin,

    "b4_anti" ->
      """SELECT p_brand, count(*) AS n_never_shipped FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_partkey = p.p_partkey AND l.l_shipdate < TIMESTAMP '1996-01-01 00:00:00')
        |GROUP BY p_brand""".stripMargin,

    "b6_band" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
        |WHEN o_totalprice < 300000 THEN 'mid' ELSE 'high' END AS band,
        |count(*) AS n,
        |CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,

    "b11_strings" ->
      """SELECT p_partkey, upper(p_name) AS uname,
        |regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants,
        |CAST(length(p_name) AS INT) AS name_len
        |FROM part WHERE contains(p_name, 'e')""".stripMargin,

    "b12_coalesce" ->
      """SELECT coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_full, count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,

    "c1_minmax" ->
      """SELECT l_orderkey, min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
        |count(*) AS n_items FROM lineitem GROUP BY l_orderkey""".stripMargin,

    "c2_argmin" ->
      """SELECT l_orderkey, min(l_shipdate) AS first_ship,
        |CAST(min(CASE WHEN l_shipdate = ms THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS price_at_first_ship
        |FROM (SELECT *, min(l_shipdate) OVER (PARTITION BY l_orderkey) AS ms FROM lineitem)
        |GROUP BY l_orderkey""".stripMargin,

    "c3_twolevel" ->
      """SELECT user_id, max(first_ts) AS latest_first_ts, count(*) AS n_types
        |FROM (SELECT user_id, event_type, min(ts) AS first_ts FROM events GROUP BY 1, 2)
        |GROUP BY user_id""".stripMargin,

    "c4_distinct" ->
      """SELECT n_supp, count(*) AS n_parts
        |FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS n_supp FROM lineitem GROUP BY 1)
        |GROUP BY n_supp""".stripMargin,

    "c5_setkey" ->
      """SELECT user_id, string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS type_set
        |FROM events GROUP BY user_id""".stripMargin,

    "c6_having" ->
      "SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey HAVING count(*) > 4",

    "c7_hist" ->
      """SELECT sz, count(*) AS n_orders
        |FROM (SELECT l_orderkey, count(*) AS sz FROM lineitem GROUP BY 1)
        |GROUP BY sz""".stripMargin,

    "c9_ratio" ->
      """SELECT l_returnflag,
        |CASE WHEN CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) = 0 THEN 0
        |ELSE round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6) END AS disc_share
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "c11_maxid" ->
      "SELECT max(o_orderkey) + 1 AS next_id, count(*) AS n FROM orders",

    "c13_first" ->
      """SELECT user_id, ts AS first_ts, event_id AS first_event_id, event_type AS first_type
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events)
        |WHERE rn = 1""".stripMargin,

    "c14_quantiles" ->
      """WITH v AS (SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS v6 FROM events),
        |r AS (SELECT event_type, v6,
        |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY v6) AS BIGINT) AS rn,
        |  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM v)
        |SELECT event_type, p_pct, n, v6 AS quantile_e6
        |FROM r, (VALUES (CAST(50 AS BIGINT)), (90), (99)) t(p_pct)
        |WHERE rn = (p_pct * n + 99) // 100""".stripMargin,

    "c16_zscore" ->
      """WITH st AS (
        |  SELECT event_type,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS q,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) AS DOUBLE) AS nd
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value,
        |  CASE WHEN st.n > 1 AND (st.q - (st.s1 * st.s1) / st.nd) / (st.nd - 1) > 0
        |    THEN round((e.value - st.s1 / st.nd) /
        |      sqrt((st.q - (st.s1 * st.s1) / st.nd) / (st.nd - 1)), 6)
        |    ELSE 0 END AS z
        |FROM events e JOIN st USING (event_type)""".stripMargin,

    "cx_grouping_sets" ->
      """SELECT l_returnflag, coalesce(l_linestatus, 'ALL') AS linestatus,
        |count(*) AS cnt,
        |CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus))""".stripMargin,

    "e4_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
        |c AS (SELECT user_id, min(t) AS tc FROM e WHERE event_type = 'click' GROUP BY 1),
        |v AS (SELECT e.user_id, min(t) AS tv FROM e JOIN c USING (user_id)
        |  WHERE event_type = 'view' AND t >= tc GROUP BY 1),
        |p AS (SELECT e.user_id, min(t) AS tp FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'purchase' AND t >= tv GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM e)
        |SELECT CASE WHEN tp IS NOT NULL THEN 3 WHEN tv IS NOT NULL THEN 2
        |    WHEN tc IS NOT NULL THEN 1 ELSE 0 END AS funnel_stage,
        |  count(*) AS n_users
        |FROM u LEFT JOIN c USING (user_id) LEFT JOIN v USING (user_id)
        |  LEFT JOIN p USING (user_id)
        |GROUP BY 1""".stripMargin,

    "e5_cohort" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_i FROM events),
        |cohort AS (SELECT user_id, min(day_i) AS c0 FROM days GROUP BY 1),
        |flags AS (SELECT c.user_id, c.c0,
        |    max(CASE WHEN d.day_i = c.c0 + 1 THEN 1 ELSE 0 END) AS r1,
        |    max(CASE WHEN d.day_i = c.c0 + 7 THEN 1 ELSE 0 END) AS r7
        |  FROM cohort c LEFT JOIN days d ON d.user_id = c.user_id
        |  GROUP BY 1, 2)
        |SELECT c0 AS cohort_day_i, count(*) AS n_users,
        |  CAST(sum(r1) AS BIGINT) AS n_day1, CAST(sum(r7) AS BIGINT) AS n_day7
        |FROM flags GROUP BY 1""".stripMargin,

    "cx_rolling" ->
      """WITH dtot AS (SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_i,
        |    count(*) AS n,
        |    round(sum(CAST(value AS DECIMAL(18,2))), 2) AS sd
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day_i, n,
        |  CAST(sum(n) OVER w AS BIGINT) AS roll_n,
        |  CAST(sum(sd) OVER w AS DOUBLE) AS roll_sum
        |FROM dtot
        |WINDOW w AS (PARTITION BY event_type ORDER BY day_i
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,

    "cx_analytics" ->
      """SELECT event_id, user_id,
        |  lag(event_type) OVER w AS prev_type,
        |  lead(event_type) OVER w AS next_type,
        |  first_value(event_type) OVER w AS first_type,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "cx_sessions" ->
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |f AS (SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS flag
        |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |g AS (SELECT user_id, us,
        |    CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        |  FROM f)
        |SELECT user_id, session_no, count(*) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us, max(us) - min(us) AS dur_us
        |FROM g GROUP BY 1, 2""".stripMargin,

    "cx_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS n_click,
        |  count(*) FILTER (event_type = 'error') AS n_error,
        |  count(*) FILTER (event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (event_type = 'signup') AS n_signup,
        |  count(*) FILTER (event_type = 'view') AS n_view
        |FROM events GROUP BY 1""".stripMargin,

    "d1_writeback" ->
      """SELECT e.event_id, e.user_id, e.value, a.user_n, a.user_sum
        |FROM events e JOIN (
        |  SELECT user_id, count(*) AS user_n,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS user_sum
        |  FROM events GROUP BY user_id) a ON e.user_id = a.user_id""".stripMargin,

    "g9_zorder" ->
      s"""WITH z AS (SELECT l_orderkey, l_partkey, l_linenumber,
         |  ${Layout.zorder2Sql("(l_orderkey % 1024)", "(l_partkey % 1024)")} AS zkey
         |  FROM lineitem)
         |SELECT l_orderkey, l_partkey, l_linenumber, CAST(zkey AS BIGINT) AS zkey
         |FROM z ORDER BY zkey, l_orderkey, l_partkey, l_linenumber LIMIT 20""".stripMargin,

    "d8_salted_join" ->
      """SELECT e.event_id, e.event_type, e.value, round(a.type_avg, 6) AS type_avg
        |FROM events e JOIN (
        |  SELECT event_type,
        |    CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) / count(*) AS type_avg
        |  FROM events GROUP BY event_type) a ON e.event_type = a.event_type
        |WHERE e.value > 1.9 * a.type_avg""".stripMargin,

    "d9_bucket_join" ->
      """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,

    "d2_semi" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.08)
        |GROUP BY o_orderpriority""".stripMargin,

    "d4_interval" ->
      """WITH inst AS (
        |  SELECT make_timestamp(1704067200000000 + i * 86400000000) AS instant
        |  FROM generate_series(0, 30) t(i))
        |SELECT instant, count(DISTINCT user_id) AS n_users, count(*) AS n_active
        |FROM inst JOIN events e
        |  ON epoch_us(e.ts) <= epoch_us(instant)
        | AND epoch_us(instant) <= epoch_us(e.ts) + CAST(round(e.value * 60000000.0) AS BIGINT)
        |GROUP BY instant""".stripMargin,

    "d5_asof" ->
      """SELECT p.event_id, max(c.ts) AS prev_click_ts, count(c.ts) AS n_prior_clicks
        |FROM events p LEFT JOIN events c
        |  ON c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts
        |  AND c.ts >= p.ts - INTERVAL 30 DAY
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id""".stripMargin,

    "d5_asof_fwd" ->
      """SELECT p.event_id, min(c.ts) AS next_click_ts, count(c.ts) AS n_next_clicks
        |FROM events p LEFT JOIN events c
        |  ON c.event_type = 'click' AND c.user_id = p.user_id AND c.ts > p.ts
        |  AND c.ts <= p.ts + INTERVAL 7 DAY
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id""".stripMargin,

    "d6_union" ->
      """SELECT event_type, count(*) AS n,
        |CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase'
        |      UNION ALL SELECT * FROM events WHERE event_type = 'error')
        |GROUP BY event_type""".stripMargin,

    "e2_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "g1_dateparts" ->
      """SELECT event_id, CAST(isodow(ts) - 1 AS INT) AS day_of_week,
        |CAST(day(ts) AS INT) AS day_of_month, CAST(hour(ts) AS INT) AS hour_of_day,
        |CAST(minute(ts) AS INT) AS minute_of_hour FROM events""".stripMargin,

    "g4_math" ->
      """SELECT event_type,
        |CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor,
        |CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS sum_round,
        |count(CASE WHEN CAST(round(value) AS BIGINT) % 7 = 0 THEN 1 END) AS n_mod7
        |FROM events GROUP BY event_type""".stripMargin,

    "g8_json" ->
      """SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k, count(*) AS n
        |FROM (SELECT event_type, CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k FROM events)
        |GROUP BY event_type""".stripMargin,

    "q3_revenue" ->
      s"""SELECT l_orderkey, $revenueExpr AS revenue, o_orderdate
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      s"""SELECT n_name, $revenueExpr AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin
  )
}
