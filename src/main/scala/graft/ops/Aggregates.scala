package graft.ops

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.4, A1–A8).
  *
  * Re-expresses the reference's aggregate surface — grouped COUNT/SUM/AVG/
  * MIN/MAX (`/root/reference/sql/fact_dim_tables.sql:350-367`), COUNT
  * DISTINCT (`fact_dim_tables.sql:354`), STDDEV
  * (`sql/analysis_queries.sql:141`), conditional aggregation
  * (`fact_dim_tables.sql:362-365`), exact percentiles
  * (`sql/analysis_queries.sql:58-59`), HAVING (`analysis_queries.sql:208`),
  * ratio-of-aggregates (`analysis_queries.sql:340`) and 5-key grouping
  * (`analysis_queries.sql:313-347`) — as Spark `groupBy().agg()` plans.
  *
  * Scale notes: every one of these is a hash aggregate with map-side partial
  * aggregation, so the shuffle carries one row per (group × partition), not
  * per input row. Group cardinality here is tiny (flags × statuses × dates),
  * so at 100 TB the shuffle stays in the kilobytes; the scan is the cost and
  * column pruning keeps it to the referenced columns. `countDistinct` is the
  * exception — it expands to a two-phase distinct-then-agg; for 100 TB ad-hoc
  * use, `approx_count_distinct` (HLL) is the right default and is exposed in
  * the same query.
  */
object Aggregates {

  /** A1 — pricing-summary-style grouped aggregate over lineitem (also the
    * flagship `SparkEntry.entry`). */
  val aggBasic: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("sum_disc_price"),
        ravg(col("l_quantity")).as("avg_qty"),
        ravg(col("l_extendedprice")).as("avg_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** A2 — COUNT(DISTINCT) per group + HLL approximate variant (the 100 TB
    * path: HLL avoids the exact-distinct double shuffle). */
  val aggCountDistinct: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(col("o_orderstatus")).as("n_statuses"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** A3 — sample standard deviation per group (PostgreSQL STDDEV = sample:
    * `/root/reference/sql/analysis_queries.sql:141`). */
  val aggStddev: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        rstddev(col("l_quantity")).as("sd_qty"),
        rstddev(col("l_extendedprice")).as("sd_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** A4 — conditional aggregation / manual pivot
    * (`/root/reference/sql/fact_dim_tables.sql:362-365`). */
  val aggConditional: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"),
        count(when(col("o_totalprice") > 100000d, lit(1))).as("n_big"))
      .orderBy(col("o_orderpriority"))

  /** A5 — exact interpolated percentiles
    * (`PERCENTILE_CONT WITHIN GROUP`, `analysis_queries.sql:58-59`);
    * `percentile_approx` is the documented 100 TB variant (exact percentile
    * sorts each group). */
  val aggPercentile: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_quantity"), lit(0.25)), 4).as("p25"),
        round(percentile(col("l_quantity"), lit(0.5)), 4).as("p50"),
        round(percentile(col("l_quantity"), lit(0.75)), 4).as("p75"),
        round(percentile(col("l_quantity"), lit(0.95)), 4).as("p95"))
      .orderBy(col("l_returnflag"))

  /** A5b — DISCRETE percentile (the `percentile_disc` half of the SQL
    * percentile pair; [[aggPercentile]] is the continuous half): the
    * p-quantile is an actual observed value — the element at rank
    * ⌈p·n⌉ — never an interpolation, which is what you want for "a real
    * order at the median price" and for value domains where midpoints
    * are meaningless (ids, codes, enum-like prices). Spark has no
    * percentile_disc; the scalable spelling is rank-selection: one sort
    * window per group + a conditional max at the target rank. The
    * target index is computed in INTEGER arithmetic — `(p·n)⌉` as
    * `(k·n + (d−1)) div d` — because the double spelling `ceil(0.9*n)`
    * misfires exactly when 9n/10 is integral (0.9·10 = 9.000…002 in
    * IEEE). Cents domain end to end; /100 presentation divide last. */
  val aggPercentileDisc: Q = (s, d) => {
    val wOrd = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("cents"), col("o_orderkey"))
    val wAll = Window.partitionBy(col("o_orderpriority"))
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"),
              floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("n")).as("n_orders"),
           (max(when(col("rn") === expr("(n + 1) div 2"), col("cents")))
             .cast("double") / 100.0).as("p50_price"),
           (max(when(col("rn") === expr("(9 * n + 9) div 10"), col("cents")))
             .cast("double") / 100.0).as("p90_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** A11 — several COUNT(DISTINCT) columns in ONE aggregate: Catalyst
    * plans multi-distinct via the Expand operator — each input row is
    * replicated once per distinct column (×3 here) with a grouping-id,
    * then two aggregate phases dedupe and count. That ×k row expansion
    * is the real 100 TB cost of casually stacking distincts in a
    * dashboard query; the documented alternatives are one
    * `approx_count_distinct` per column (no expansion, HLL error) or
    * [[graft.ops.Advanced]]'s bitmap partials (exact, mergeable). This
    * entry pins the exact semantics; the plan's Expand is the teaching
    * point. */
  val aggMultiDistinct: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
           countDistinct(to_date(col("ts"))).as("n_days"),
           countDistinct(col("user_id"), to_date(col("ts")))
             .as("n_user_days"),
           count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** A10 — Herfindahl–Hirschman concentration index per event type:
    * how concentrated each event stream is across users (10 000 ≈ one
    * user owns it; 1/n_users ≈ uniform) — the audit behind "is this
    * metric driven by a handful of accounts", and on a corpus the same
    * query is source-concentration for mixture risk. Two hash
    * aggregates (user grain, then type grain); the index is the exact
    * integer ratio Σc²·10⁶ div (Σc)² — parts-per-million, no doubles.
    * BIGINT envelope: Σc²·10⁶ overflows past ~3M events on one
    * (type,user) pair; the DECIMAL(38,0) spelling is the documented
    * 100 TB fallback, same query. */
  val aggHhi: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
           sum(col("c")).as("n_events"),
           sum(col("c") * col("c")).as("ss"))
      .withColumn("hhi_ppm", expr("ss * 1000000 div (n_events * n_events)"))
      .select(col("event_type"), col("n_users"), col("n_events"),
              col("hhi_ppm"))
      .orderBy(col("event_type"))

  /** A6 — HAVING post-aggregation filter (`analysis_queries.sql:208`). */
  val aggHaving: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("total_spent"))
      .filter(col("n_orders") >= 3)
      .orderBy(col("o_custkey"))

  /** A7 — ratio-of-aggregates in one pass (significant-delay-rate shape,
    * `analysis_queries.sql:340`), with NULLIF-style zero guard.
    * The 4-dp rate is exact integer half-up — ⌊(2·a·10⁴ + n) / (2n)⌋ —
    * instead of round(double/double, 4): a pure count/count quotient
    * can land EXACTLY on a halfway point (a/n = k.00005), and while the
    * round-9 probes showed Spark (shortest-repr HALF_UP) and DuckDB
    * (multiply + half-away) agree on those today, the integer spelling
    * is immune to either engine changing its float-rounding path. */
  val aggRatio: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("l_quantity") > 30d, lit(1))).as("hi_q"),
        count(when(col("l_discount") >= 0.05, lit(1))).as("hi_d"))
      .select(col("l_returnflag"), col("n_rows"),
        (expr("(2 * hi_q * 10000 + n_rows) div (2 * n_rows)")
          .cast("double") / 10000.0).as("high_qty_rate"),
        (expr("(2 * hi_d * 10000 + n_rows) div (2 * n_rows)")
          .cast("double") / 10000.0).as("discounted_rate"))
      .orderBy(col("l_returnflag"))

  /** A8 — multi-key (5-key) grouping (`analysis_queries.sql:313-347`). */
  val aggMultikey: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(
        col("l_returnflag"), col("l_linestatus"),
        year(col("l_shipdate")).as("ship_year"),
        month(col("l_shipdate")).as("ship_month"),
        (col("l_suppkey") % 5).as("supp_bucket"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"), col("ship_year"),
               col("ship_month"), col("supp_bucket"))

  /** A9 — Pearson correlation per group (value vs hour-of-day), computed
    * EXPLICITLY from exact decimal sums rather than `corr()`: the builtin
    * accumulates doubles in partition-merge order (engine- and
    * plan-dependent), while n/Σx/Σy/Σxy/Σx²/Σy² as decimals are
    * order-independent, so the final fixed-shape double expression
    * (n·Σxy − ΣxΣy)/(√(n·Σx²−Σx²)·√(n·Σy²−Σy²)) is bit-identical across
    * engines. Same one-pass partial-aggregate plan as any other group-by
    * — the portability costs nothing. */
  val aggCorr: Q = (s, d) => {
    val x = col("value").cast("decimal(18,6)")
    val y = hour(col("ts")).cast("decimal(18,6)")
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(x).as("sx"), sum(y).as("sy"),
           sum(x * y).as("sxy"), sum(x * x).as("sxx"),
           sum(y * y).as("syy"))
      .select(col("event_type"), col("n"), {
        // zero-variance guard (fuzz seed 200): a single-event or
        // constant-column group has n·Σx²−(Σx)² = 0 — ANSI double
        // division THROWS where DuckDB's /0 is NULL. The test is on the
        // EXACT decimals, so both engines branch identically; the
        // oracle needs no CASE (its division is naturally NULL there).
        val vx = col("n") * col("sxx") - col("sx") * col("sx")
        val vy = col("n") * col("syy") - col("sy") * col("sy")
        when(vx > 0 && vy > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
                (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))), 6))
          .as("corr_value_hour")
      })
      .orderBy(col("event_type"))
  }

  /** A10 — string aggregation (LISTAGG shape): distinct statuses per
    * priority, comma-joined. Determinism discipline: collect_set is
    * partition-order-dependent, so the list is `array_sort`ed BEFORE
    * joining — which is exactly `string_agg(DISTINCT … ORDER BY …)` on
    * the oracle side. */
  val aggStringAgg: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
             .as("statuses"),
           count_distinct(col("o_orderstatus")).as("n_statuses"))
      .orderBy(col("o_orderpriority"))

  /** A11 — boolean + bitwise aggregates (EVERY/ANY, BIT_AND/BIT_OR/
    * BIT_XOR): flag rollups and bitmask accumulation, all exact. */
  val aggBoolBit: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(bool_and(col("value") > 0d).as("all_positive"),
           bool_or(col("value") > 199d).as("any_near_max"),
           bit_and(col("event_id").bitwiseAND(lit(255L))).as("band"),
           bit_or(col("event_id").bitwiseAND(lit(255L))).as("bor"),
           bit_xor(col("event_id")).as("bxor"))
      .orderBy(col("event_type"))

  /** A12 — skewness per group from exact raw moments (same discipline as
    * [[aggCorr]]): n, Σx, Σx², Σx³ as decimals (order-free), then the
    * population-skewness formula in ONE fixed double expression —
    * engines' built-in `skewness()` accumulate doubles in merge order
    * and differ in bias correction, so neither side uses it. decimal
    * precision: x ≤ ~10³ at scale 6 → x³ ≤ 10⁹ at scale 18; the sum has
    * 38−18 = 20 integer digits of headroom (10¹¹ rows at x=10³). */
  val aggSkewness: Q = (s, d) => {
    // Exact INTEGER moments, not decimal ones: the cube of any decimal
    // wide enough for the data blows past precision 38, where Spark and
    // DuckDB reduce scale differently (observed 1e-15 s3 drift), and
    // DuckDB's decimal multiply overflows its int64-backed widths.
    // Values are floor-quantized to 1e-4 (floor, not round — round can
    // split a .5 boundary across engines), cubes accumulate exactly in
    // decimal(38,0) here / HUGEINT in the oracle, and skewness is
    // invariant under the 10^4 scaling, so the formula is unchanged.
    val xi = floor(col("value") * 10000).cast("long")
    val xd = xi.cast("decimal(38,0)")
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(xd).as("s1"),
           sum(xd * xi).as("s2"), sum(xd * xi * xi).as("s3"))
      .select(col("event_type"), col("n"), {
        val n = col("n").cast("double")
        val m = col("s1").cast("double") / n
        val m2 = col("s2").cast("double") / n - m * m
        val m3 = col("s3").cast("double") / n -
          lit(3.0) * m * (col("s2").cast("double") / n) +
          lit(2.0) * m * m * m
        // round(6) here is load-bearing, unlike keep_best: the moment
        // sums exceed 2^53 and DuckDB's int128->double conversion can
        // land 1 ulp away from JVM BigDecimal.doubleValue (observed at
        // sf0.001), so the raw doubles are NOT bit-identical — this is
        // exactly the representation drift round() exists to absorb.
        // m2=0 guard (fuzz seed 200): an all-equal or single-event
        // group makes pow(m2,1.5)=0 — ANSI throws, DuckDB /0 is NULL;
        // m2 is the same double expression on both engines, so the
        // branch is taken identically and the oracle needs no CASE
        when(m2 > 0d, round(m3 / pow(m2, 1.5), 6)).as("skewness")
      })
      .orderBy(col("event_type"))
  }

  /** A13 — Shannon entropy of the event-type mix per day (the
    * distribution-drift profiling signal): exact per-(day, type) counts,
    * each type's −p·ln p term rounded to 12 decimals and decimal-summed
    * so the 5-term reduction is order-free (the [[Curation.extLmScore]]
    * trick at aggregate grain). */
  val aggEntropy: Q = (s, d) => {
    val byDay = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val withTot = byDay
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("day"))))
    val p = col("c").cast("double") / col("n").cast("double")
    withTot
      .select(col("day"), col("n"),
              round(-p * log(p), 12).cast("decimal(18,12)").as("term"))
      .groupBy(col("day"))
      .agg(max(col("n")).as("n_events"),
           sum(col("term")).cast("double").as("entropy_nats"))
      .orderBy(col("day"))
  }

  /** A14 — fixed-bucket histogram per group (the profiling shape behind
    * every distribution dashboard): bucket = ⌊value / width⌋ with a
    * pinned width — exact double division + floor, identical on both
    * engines, no width_bucket dependency (DuckDB lacks it). Count per
    * (group, bucket); empty buckets simply absent (dense grids are
    * [[graft.ops.Extras.fnResampleFfill]]'s job). */
  val aggHistogram: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"),
               floor(col("value") / 25.0).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"),
           min(col("value")).as("lo"), max(col("value")).as("hi"))
      .orderBy(col("event_type"), col("bucket"))

  /** A15 — per-group simple linear regression (price explained by
    * quantity): slope / intercept / r² from exact integer raw moments,
    * the [[aggSkewness]] discipline applied to the bivariate case.
    * Both engines' native `regr_*` accumulate doubles in partition-merge
    * order, so neither side uses them: values are floor-quantized to
    * cents (floor, not round — see skewness note), the five moment sums
    * accumulate exactly in decimal(38,0) / HUGEINT, and the closed-form
    * OLS expressions run in ONE fixed double shape. Slope and r² are
    * invariant under the common ×100 scaling; the intercept divides it
    * back out. round(6) absorbs the ≤1-ulp int128→double conversion
    * drift (observed on skewness).
    *
    * This is the trend-fit the reference's delay-trend queries eyeball
    * (`/root/reference/sql/analysis_queries.sql:158-191`) and its model
    * tier learns (`/root/reference/train_delay_model.py:274-355`) —
    * expressed as a one-pass partial aggregate. */
  val aggRegression: Q = (s, d) => {
    val xi = floor(col("l_quantity") * 100).cast("long")
    val yi = floor(col("l_extendedprice") * 100).cast("long")
    val xd = xi.cast("decimal(38,0)")
    val yd = yi.cast("decimal(38,0)")
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           sum(xd).as("sx"), sum(yd).as("sy"),
           sum(xd * yi).as("sxy"), sum(xd * xi).as("sxx"),
           sum(yd * yi).as("syy"))
      .select(col("l_returnflag"), col("n"), {
        val n   = col("n").cast("double")
        val sx  = col("sx").cast("double");  val sy  = col("sy").cast("double")
        val sxy = col("sxy").cast("double"); val sxx = col("sxx").cast("double")
        val syy = col("syy").cast("double")
        val cov = n * sxy - sx * sy
        val vx  = n * sxx - sx * sx
        val vy  = n * syy - sy * sy
        // degenerate-variance guard: Spark (non-ANSI) yields NULL for
        // x/0 while DuckDB's IEEE default yields inf/NaN — a constant-x
        // or constant-y group must be NULL on BOTH engines, so the zero
        // test (on identical exact-integer-derived doubles) is explicit
        struct(
          when(vx =!= 0.0, round(cov / vx, 6)).as("slope"),
          when(vx =!= 0.0,
               round((sy - (cov / vx) * sx) / n / 100.0, 6)).as("intercept"),
          when(vx =!= 0.0 && vy =!= 0.0,
               round(cov * cov / (vx * vy), 6)).as("r2"))
      }.as("r"))
      .select(col("l_returnflag"), col("n"),
              col("r.slope").as("slope"), col("r.intercept").as("intercept"),
              col("r.r2").as("r2"))
      .orderBy(col("l_returnflag"))
  }

  /** A16 — z-score outlier screen per group (the distribution-drift /
    * bad-batch detector every curation pipeline runs before training):
    * per order priority, mean and sample stddev of the order total from
    * exact integer moments, then the count of orders beyond 2σ. Two
    * passes over orders with the 5-row moment frame joined back — AQE
    * broadcasts it, so the probe pass is scan + map; the window
    * alternative (moments OVER (PARTITION BY priority)) would shuffle
    * every order into 5 skew-prone partitions, the wrong trade at scale.
    * The classification is fully integer-exact: |x−μ| > 2σ with
    * μ = s1/n and σ² = (n·s2 − s1²)/(n(n−1)) is equivalent (squaring,
    * then multiplying through by n²(n−1) > 0) to
    *   (n·x − s1)² · (n−1)  >  4·n·(n·s2 − s1²)
    * — every term an integer, computed in decimal(38,0) on Spark and
    * HUGEINT (int128) in the oracle, so no double ever enters the
    * boundary test and no engine-specific rounding can flip a row (a
    * round(6) margin on doubles provably could: the r04 driver gate
    * caught a boundary order within ~1e-9 of the rounding grid).
    * round(6) survives only on the *reported* mean/stddev columns.
    * Envelope: the largest product is (n·z)²·n ≈ n³·z²; with z ≤ ~6e7
    * cents this stays under 10³⁸ (decimal38 / int128) through ~3e7 rows
    * per group (≈ TPC-H SF100 per priority). Beyond that, pre-aggregate
    * per (priority, z) first — the test stays exact at any corpus size
    * because distinct z is price-bounded. */
  val aggOutlierZscore: Q = (s, d) => {
    val zi = floor(col("o_totalprice") * 100).cast("long")
    val zd = zi.cast("decimal(38,0)")
    val o = Tables.orders(s, d)
    val m = o.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(zd).as("s1"), sum(zd * zi).as("s2"))
      .select(col("o_orderpriority"), col("n"), col("s1"), col("s2"), {
        val n = col("n").cast("double")
        val s1 = col("s1").cast("double"); val s2 = col("s2").cast("double")
        // n > 1 guard: sample stddev of a single-order priority group is
        // UNDEFINED — ANSI double division throws on the n(n−1)=0
        // denominator (fuzz seed 101, one-order group), while DuckDB's
        // /0.0 yields NULL. Explicit NULL is the stddev_samp contract
        // both engines agree on (oracle carries the same CASE).
        struct((s1 / n).as("mean_c"),
               when(col("n") > 1,
                 // greatest(…, 0) — seed-700 class: integer cents sums
                 // beyond 2^53 round in the double cast, so n·s2 − s1²
                 // can cancel to −ε on a constant group; DuckDB's
                 // sqrt(−ε) throws, Spark's is NaN. Clamped both sides.
                 sqrt(greatest(n * s2 - s1 * s1, lit(0d)) /
                   (n * (n - lit(1.0)))))
                 .as("std_c"))
      }.as("ms"))
    val nD   = col("n").cast("decimal(38,0)")
    val diff = nD * col("z") - col("s1")
    o.select(col("o_orderpriority"), zd.as("z"))
      .join(m, Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("n")).as("n_orders"),
           max(col("s1")).as("s1g"),
           round(max(col("ms.std_c")) / 100.0, 6).as("stddev_price"),
           sum(when(diff * diff * (nD - lit(1)) >
                    lit(4) * nD * (nD * col("s2") - col("s1") * col("s1")), 1L)
                 .otherwise(0L)).as("n_outliers"))
      // mean in exact integer micro-units (sign split, trunc-toward-zero
      // at 1e-6): round(s1/n/100, 6) hit a HALF_UP halfway point on fuzz
      // seed 411 — quotients of integer cent sums land exactly on
      // x.xxxxx5 where Spark's exact-decimal and DuckDB's float-multiply
      // rounding disagree; the floor-divide spelling has no boundary.
      .select(col("o_orderpriority"), col("n_orders"),
              (when(col("s1g") < 0, -1L).otherwise(1L) *
                expr("CAST(abs(s1g) * 10000 AS DECIMAL(38,0)) div n_orders"))
                .cast("double")./(1000000.0).as("mean_price"),
              col("stddev_price"), col("n_outliers"))
      .orderBy(col("o_orderpriority"))
  }

  /** A17 — deterministic per-group mode (most frequent value): neither
    * engine's native `mode()` pins tie-breaks, so it's expressed as
    * count-per-(group, value) + row_number ordered by (count DESC,
    * value ASC) — fully deterministic and the identical plan both
    * engines run anyway. The rank window partitions by group over the
    * (group × distinct-value) frame, which is cardinality-bounded, not
    * row-bounded. */
  val aggMode: Q = (s, d) => {
    val counts = Tables.orders(s, d)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("mode_count"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("mode_count").desc, col("o_orderpriority"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderstatus"),
              col("o_orderpriority").as("mode_priority"), col("mode_count"))
      .orderBy(col("o_orderstatus"))
  }

  /** A18 — weighted aggregates: quantity-weighted mean unit price per
    * flag — Σ(w·x)/Σw with BOTH sums exact decimals ([[dsumProd]]
    * discipline) and ONE final IEEE division, the weighted twin of
    * [[graft.ops.ravg]]. The weighted mean every mixture/importance
    * computation reduces to. */
  // Weighted mean in exact integer micro-units end-to-end: the original
  // decimal-sum→double→divide spelling was bit-exact up to sf1 but
  // diverged at sf3 (fuzz-era scale sweep) — once Σqty·price·10⁴ crosses
  // 2⁵³, DuckDB's decimal→double goes hugeint→double→/10⁴ (TWO
  // roundings) while Spark's BigDecimal conversion rounds once. The
  // micro-unit quotient ⌊|A|·10⁴ / B⌋ (A = Σqc·pc in cent², B = Σqc in
  // cents) never touches a lossy double until the final exact ≤3e11
  // integer; the signs of BOTH operands are split out (abs/abs with the
  // combined sign applied after) so the floor-vs-truncate divergence
  // can't bite on negative numerators (credit-line prices) OR a
  // negative weight mass (negative quantities are a live fuzz axis),
  // and a zero weight mass (all-zero quantities) is an explicit NULL.
  val aggWeighted: Q = (s, d) => {
    val qc = (col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
    val pc = (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           dsum(col("l_quantity")).as("sum_w"),
           sum((qc * pc).cast("decimal(38,0)")).as("a4"),
           sum(qc).as("b"))
      .select(col("l_returnflag"), col("n"), col("sum_w"),
              when(col("b") =!= 0,
                   (when(col("a4") < 0, -1L).otherwise(1L) *
                     when(col("b") < 0, -1L).otherwise(1L) *
                     expr("CAST(abs(a4) * 10000 AS DECIMAL(38,0)) div abs(b)"))
                     .cast("double") / 1000000.0).as("wavg_price"))
      .orderBy(col("l_returnflag"))
  }

  /** A19 — Gini coefficient of order value per priority (the
    * concentration number behind every "top X% of keys hold Y% of
    * mass" skew statement — [[graft.ops.Quality.extKeySkew]]'s summary
    * scalar): the rank formula G = 2·Σ(i·x₍ᵢ₎)/(n·Σx) − (n+1)/n over
    * cent-quantized values, with rank ties broken by o_orderkey so the
    * weighted sum is identical cross-engine, and both Σ accumulating as
    * decimal(38,0)/HUGEINT (i·x reaches ~1e16 — past double's exact
    * integer range). One sort-window per group + one aggregate. */
  val aggGini: Q = (s, d) => {
    val zi = floor(col("o_totalprice") * 100).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("z"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"), zi.as("z"))
      .withColumn("i", row_number().over(w))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           sum(col("z").cast("decimal(38,0)")).as("sx"),
           sum(col("z").cast("decimal(38,0)") * col("i")).as("six"))
      .select(col("o_orderpriority"), col("n"), {
        val n = col("n").cast("double")
        round(lit(2.0) * col("six").cast("double") /
                (n * col("sx").cast("double")) -
              (n + 1.0) / n, 6).as("gini")
      })
      .orderBy(col("o_orderpriority"))
  }

  /** A20 — exact grouped median (interpolated, as [[aggPercentile]]
    * already proves bit-portable at corpus grain): the per-group
    * spelling every dashboard's "median by segment" needs. */
  val aggMedianGrouped: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           round(percentile(col("o_totalprice"), lit(0.5)), 4).as("median_price"))
      .orderBy(col("o_orderpriority"))

  /** A21 — day-of-week seasonality index per event type: mean daily
    * volume on each weekday ÷ overall mean daily volume — the weekday/
    * weekend factor the reference's synthetic tier bakes in explicitly
    * (`/root/reference/generate_synthetic_data.py:148-151` models
    * seasonality; its analysis tier eyeballs it back out). All counts
    * exact; the index is one fixed double expression of four exact
    * longs (day counts enter as counts, not averages, so no
    * intermediate quotient accumulates). */
  val aggSeasonality: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", dayofweek(col("day")))
    daily.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("n")).as("n_dow"), count(lit(1)).as("days_dow"))
      .join(daily.groupBy(col("event_type"))
              .agg(sum(col("n")).as("n_all"), count(lit(1)).as("days_all")),
            Seq("event_type"))
      .select(col("event_type"), col("dow"), col("n_dow"), col("days_dow"),
        round((col("n_dow").cast("double") / col("days_dow").cast("double")) /
              (col("n_all").cast("double") / col("days_all").cast("double")),
              6).as("seasonality_idx"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** A22 — winsorized mean per group: clamp order totals to the exact
    * [p05, p95] percentiles, then average — the robust central estimate
    * a heavy-tailed metric needs (the complement of
    * [[aggOutlierZscore]]: instead of counting the tail, neutralize
    * it). Cutoffs come from the proven interpolated-exact percentile;
    * the clamp and the mean run over cent-quantized exact values with
    * one final division, so no float ordering anywhere. Two passes
    * (cutoff aggregate broadcast back), same shape as the z-score
    * screen. */
  val aggWinsorizedMean: Q = (s, d) => {
    // FULLY-EXACT integer spelling (round-12 fuzz seed 1705: the prior
    // spelling's round(clamped, 6) over interpolated-percentile DOUBLE
    // cutoffs left one ulp-coincidence residual — a cutoff one
    // cross-engine ulp from a 6-dp boundary flipped the final rounded
    // quotient by 1e-6). With p = 1/20, the type-7 interpolated cutoff
    // over integer cents is EXACTLY rational with denominator 20:
    //   pos = (n-1)p; k = ⌊pos⌋; cut·20 = 20·z[k+1] + (pos mod 1)·20·Δ
    // so the whole pipeline — order statistics (row_number over z; ties
    // hold equal VALUES, so which tied row takes rank k is irrelevant),
    // 20ths-scaled cutoffs, clamp, sum, and the ⌊(2a·10⁶+b)/(2b)⌋
    // half-up round — runs in int64 with no float op anywhere. A fixed
    // +1e10-cent offset keeps every div/% operand positive (fuzz draws
    // negative totals; Spark div truncates where DuckDB // floors on
    // negatives) and cancels exactly at the end (OFF/100 = 1e8 is an
    // integer, and integer shifts commute with winsorize + round).
    // Overflow audit (round-13, n-independent): per-row z' ≤ ~1e10+6e7
    // cents and z'·20 ≤ 2.1e11 stay in int64, but Σ zc20 would wrap
    // int64 past ~4.4e7 rows/group (non-ANSI Spark wraps silently), so
    // the SUM runs as decimal(38,0) — exact to n ≈ 5e26 rows/group,
    // i.e. unbounded at any storage-expressible scale, and overflow
    // past that nulls/errors loudly instead of wrapping. The quotient
    // s20 div (2000n) ≈ 1.05e8 and the half-up remainder term
    // 2·(Σ mod 2000n)·10⁶ + 2000n ≤ 4·10⁹·n remain decimal until the
    // final integral divide, whose result < 10⁶ — nothing re-enters
    // int64 at a magnitude that can wrap.
    val off = 10000000000L
    val zi = floor(col("o_totalprice") * 100).cast("long") + off
    val o = Tables.orders(s, d).select(col("o_orderpriority"), zi.as("z"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("z"))
    val r = o.select(col("o_orderpriority"), col("z"),
      row_number().over(w).as("rn"),
      count(lit(1)).over(
        Window.partitionBy(col("o_orderpriority"))).as("n"))
    val cuts = r.groupBy(col("o_orderpriority"))
      .agg(
        max(when(col("rn") === expr("(n-1) div 20 + 1"), col("z")))
          .as("z1lo"),
        max(when(col("rn") === expr("(n-1) div 20 + 2"), col("z")))
          .as("z2lo"),
        max(when(col("rn") === expr("(19*(n-1)) div 20 + 1"), col("z")))
          .as("z1hi"),
        max(when(col("rn") === expr("(19*(n-1)) div 20 + 2"), col("z")))
          .as("z2hi"),
        max(col("n")).as("n"))
      .select(col("o_orderpriority"),
        expr("20*z1lo + ((n-1) % 20) * (coalesce(z2lo, z1lo) - z1lo)")
          .as("lo20"),
        expr("20*z1hi + ((19*(n-1)) % 20) * (coalesce(z2hi, z1hi) - z1hi)")
          .as("hi20"))
    o.join(broadcast(cuts), Seq("o_orderpriority"))
      .select(col("o_orderpriority"),
        greatest(least(col("z") * 20, col("hi20")), col("lo20"))
          .as("zc20"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("zc20").cast("decimal(38,0)")).as("s20"))
      .select(col("o_orderpriority"), col("n"),
        expr("cast((s20 div (2000*n)) * 1000000" +
             " + (2*(s20 % (2000*n))*1000000 + 2000*n) div (2*(2000*n))" +
             " - 100000000000000 as double) / 1000000.0")
          .as("winsorized_mean"))
      .orderBy(col("o_orderpriority"))
  }

  /** A23 — median absolute deviation per group: MAD =
    * median(|x − median(x)|), the robust scale estimate that pairs with
    * [[aggWinsorizedMean]] (robust location) the way stddev pairs with
    * mean — outlier thresholds built on MAD don't move when the outliers
    * themselves do. Two passes: the group median broadcasts back (exact
    * interpolated percentile over cent-quantized longs), then the
    * deviation median. Deviations |z − med| are exact: z is integer
    * cents and med is a .5-at-worst interpolation, so ×2 keeps
    * everything integral — both engines interpolate identically per the
    * percentile precedent, and the final /200 returns dollars. */
  val aggMad: Q = (s, d) => {
    val zi = floor(col("o_totalprice") * 100).cast("long")
    val o = Tables.orders(s, d).select(col("o_orderpriority"), zi.as("z"))
    val med = o.groupBy(col("o_orderpriority"))
      .agg(percentile(col("z"), lit(0.5)).as("med_c"))
    o.join(med, Seq("o_orderpriority"))
      // 2·|z − med| is exactly integral (med is k or k+0.5 cents)
      .select(col("o_orderpriority"),
              abs(col("z") * 2 - col("med_c") * 2).as("dev2"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           (percentile(col("dev2"), lit(0.5)) / 200.0).as("mad"))
      .orderBy(col("o_orderpriority"))
  }

  /** A24 — top-N concentration: the share of total order value held by
    * the 10 biggest customers — the headline concentration number
    * ([[aggGini]] is the whole-distribution version; this is the
    * one-liner a dashboard quotes). Per-customer totals are exact
    * decimals; top-10 is a (value DESC, key) rank — deterministic under
    * ties; the share is one division of two exact-decimal-derived
    * doubles. Plan: partial-aggregated customer rollup, rank window
    * over the customer frame, one global reduce. */
  val aggTopnShare: Q = (s, d) => {
    val byCust = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rev").desc, col("o_custkey"))
    byCust.withColumn("rn", row_number().over(w))
      .agg(count(lit(1)).as("n_customers"),
           sum(col("rev")).cast("double").as("total_rev"),
           sum(when(col("rn") <= 10, col("rev"))).cast("double")
             .as("top10_rev"))
      .select(col("n_customers"), col("total_rev"), col("top10_rev"),
              (col("top10_rev") / col("total_rev")).as("top10_share"))
  }

  /** A18 — decile report per order priority (the BI "spend deciles"
    * table): NTILE(10) over (price, key) — a total order, so decile
    * membership is deterministic — then per-decile count/min/max/sum.
    * The window partitions by priority: 5 partitions regardless of SF,
    * which is the documented trade — exact NTILE needs a per-partition
    * sort, so a 100 TB run swaps this spelling for percentile_approx
    * decile THRESHOLDS (map-side sketch, no global sort) and a bucket
    * join; this entry pins the exact semantics that approximation is
    * judged against. Cent integers end to end; the long sum is exact
    * and both engines cast the identical integer to double. */
  val aggDecileStats: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("cents"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"),
              floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("o_orderpriority"), col("decile"))
      .agg(count(lit(1)).as("n_orders"),
           (min(col("cents")).cast("double") / 100.0).as("min_price"),
           (max(col("cents")).cast("double") / 100.0).as("max_price"),
           (sum(col("cents")).cast("double") / 100.0).as("sum_price"))
      .orderBy(col("o_orderpriority"), col("decile"))
  }

  /** A19 — Welch two-sample t-test between click and purchase values:
    * the A/B-experiment readout (unequal variances, the safe default).
    * Every moment (n, Σx, Σx²) is an exact integer in cents, so mean and
    * variance are the same doubles on both engines (identical
    * int→double casts and one arithmetic shape); t and the
    * Welch–Satterthwaite df are reported round(6). The statistic rides
    * two partial-aggregated scans collapsed to a 2×1-row cross join —
    * nothing here scales with rows but the moment aggregation itself. */
  val aggTtest: Q = (s, d) => {
    def m(tpe: String, p: String) =
      Tables.events(s, d).filter(col("event_type") === tpe)
        .select(floor(col("value") * 100).cast("long").as("z"))
        .agg(count(lit(1)).as(s"n$p"), sum(col("z")).as(s"s1$p"),
             sum(col("z") * col("z")).as(s"s2$p"))
    def mean(p: String) =
      col(s"s1$p").cast("double") / col(s"n$p").cast("double") / 100.0
    // n<2 guard (fuzz seed 303): a single-sample side has undefined
    // sample variance — NULL (propagating into t/df), not an ANSI
    // throw on /(n·(n−1))=0; DuckDB's /0 is naturally NULL there
    def variance(p: String) = {
      val n = col(s"n$p").cast("double")
      when(n > 1d,
        (n * col(s"s2$p").cast("double") -
          col(s"s1$p").cast("double") * col(s"s1$p").cast("double")) /
          (n * (n - 1.0)) / 10000.0)
    }
    m("click", "1").crossJoin(m("purchase", "2"))
      .select(col("n1"), col("n2"),
        round(mean("1"), 6).as("mean1"), round(mean("2"), 6).as("mean2"), {
          val se1 = variance("1") / col("n1").cast("double")
          val se2 = variance("2") / col("n2").cast("double")
          // all-ties guard: both variances 0 makes both statistics'
          // denominators 0 — NULL on both engines (a NULL se turns the
          // conditions NULL → false, so they never divide by n−1=0)
          struct(
            when(se1 + se2 > 0d,
              round((mean("1") - mean("2")) / sqrt(se1 + se2), 6)).as("t"),
            when(se1 * se1 / (col("n1").cast("double") - 1.0) +
                 se2 * se2 / (col("n2").cast("double") - 1.0) > 0d,
              round((se1 + se2) * (se1 + se2) /
                (se1 * se1 / (col("n1").cast("double") - 1.0) +
                 se2 * se2 / (col("n2").cast("double") - 1.0)), 2)).as("df"))
        }.as("st"))
      .select(col("n1"), col("n2"), col("mean1"), col("mean2"),
              col("st.t").as("t_stat"), col("st.df").as("welch_df"))
  }

  /** A20 — Benford first-digit audit over order totals: the
    * forensic-accounting screen (fabricated numbers rarely follow
    * Benford's log distribution). Digit extraction is string-based
    * (portable: no log10 at runtime) and the expected shares are the
    * nine PINNED ppm constants — hardcoding them dodges the only
    * nondeterminism in the whole query, a possible last-ulp libm
    * disagreement in log10 between engines. Counts → ppm in integer
    * floor-divide; 9-row output from one hash aggregate. */
  val aggBenford: Q = (s, d) => {
    val benford = Seq(301029L, 176091L, 124938L, 96910L, 79181L,
                      66946L, 57991L, 51152L, 45757L)
    val bmap = map((1 to 9).flatMap(i =>
      Seq(lit(i), lit(benford(i - 1)))): _*)
    Tables.orders(s, d)
      // try_cast + 1..9 filter: a sub-1 price yields digit 0 (absent
      // from the map — ANSI element_at would THROW, fuzz-class hazard)
      // and a negative price yields '-' (ANSI string→int cast throws).
      // The oracle applies the same WHERE digit BETWEEN 1 AND 9 BEFORE
      // its total, so the obs_ppm denominator matches on both engines
      // even when digit-0/NULL rows exist (fuzz corpora).
      .select(expr("try_cast(substring(cast(cast(floor(o_totalprice) as " +
                   "bigint) as string), 1, 1) as int)").as("digit"))
      .filter(col("digit").between(1, 9))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("digit"), col("n"),
              expr("n * 1000000 div total").as("obs_ppm"),
              element_at(bmap, col("digit")).as("benford_ppm"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("benford_ppm")))
      .orderBy(col("digit"))
  }

  /** A21 — chi-square independence test: is event type independent of
    * day-of-week? Observed 5×7 contingency counts vs expected
    * row·col/N, χ² = Σ(o−e)²/e. The only nondeterminism hazard is the
    * SUM ORDER over cell contributions (doubles): each contribution is
    * rounded(6) and cast to decimal first, so the reduction is
    * order-independent and bit-identical — same discipline as every
    * money sum in this repo. Day-of-week via ISO `dayofweek` shifted to
    * 0=Sunday on both engines. Bounded 35-cell frame after one
    * count shuffle. */
  val aggChisq: Q = (s, d) => {
    val cells = Tables.events(s, d)
      .select(col("event_type"),
              (dayofweek(to_date(col("ts"))) - 1).as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("o"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val wRow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    val wCol = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dow"))
    cells
      .withColumn("r", sum(col("o")).over(wRow))
      .withColumn("c", sum(col("o")).over(wCol))
      .withColumn("t", sum(col("o")).over(wAll))
      .withColumn("e", col("r").cast("double") * col("c").cast("double") /
                       col("t").cast("double"))
      .withColumn("contrib",
        round((col("o").cast("double") - col("e")) *
              (col("o").cast("double") - col("e")) / col("e"), 6)
          .cast("decimal(18,6)"))
      .agg(count(lit(1)).as("n_cells"),
           countDistinct(col("event_type")).as("n_types"),
           countDistinct(col("dow")).as("n_dows"),
           sum(col("contrib")).cast("double").as("chi2"),
           max(col("contrib")).cast("double").as("max_contrib"))
      .select(col("n_cells"), col("n_types"), col("n_dows"), col("chi2"),
              col("max_contrib"),
              ((col("n_types") - 1) * (col("n_dows") - 1)).as("df"))
  }

  /** A22 — lag-1 autocorrelation of the daily value series per event
    * type: the "is today predicted by yesterday" number behind
    * seasonality detection and forecast-model sanity checks. Pairs
    * (xₜ, xₜ₋₁) come from one lag window over the day grain; Pearson r
    * over the pairs is computed from exact integer-cent moments
    * (n·Σxy − ΣxΣy over the two variance terms), so both engines build
    * identical doubles before the single round(6). Degenerate series
    * (constant, or <2 pairs) → NULL via the variance guard. Day-grain
    * frames only — nothing scales with raw rows except the first
    * aggregate. */
  val aggAutocorr: Q = (s, d) => {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val pairs = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("x"))
      .withColumn("y", lag(col("x"), 1).over(w))
      .filter(col("y").isNotNull)
    pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("x")).as("sx"),
           sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
           sum(col("x") * col("x")).as("sxx"),
           sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("n_pairs"), {
        val n = col("n_pairs").cast("double")
        val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
        val cov = n * col("sxy").cast("double") - sx * sy
        val vx = n * col("sxx").cast("double") - sx * sx
        val vy = n * col("syy").cast("double") - sy * sy
        when(vx > 0 && vy > 0,
             round(cov / sqrt(vx * vy), 6)).as("lag1_autocorr")
      })
      .orderBy(col("event_type"))
  }

  /** A23 — argument extremes (`max_by`/`min_by`, DuckDB `arg_max`/
    * `arg_min`): WHO had the biggest/smallest event per type — the
    * lookup every leaderboard needs without a rank window. Neither
    * engine pins tie-breaks, so the ordering key is a composite
    * integer (cents·10⁸ + event_id — unique by construction, envelope
    * ~1e13 ≪ 2⁶³ at any test SF; a corpus deployment widens to
    * decimal) making the answer deterministic. One hash aggregate. */
  val aggArgExtremes: Q = (s, d) => {
    val key = floor(col("value") * 100).cast("long") * 100000000L +
      col("event_id")
    Tables.events(s, d)
      .select(col("event_type"), col("user_id"), col("value"),
              key.as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           max_by(col("user_id"), col("k")).as("top_user"),
           min_by(col("user_id"), col("k")).as("bottom_user"),
           max(col("k")).as("kmax"), min(col("k")).as("kmin"))
      .select(col("event_type"), col("n_events"), col("top_user"),
              col("bottom_user"),
              expr("kmax div 100000000").as("max_cents"),
              expr("kmin div 100000000").as("min_cents"))
      .orderBy(col("event_type"))
  }

  /** A24 — two-sample Kolmogorov–Smirnov distance between the click and
    * purchase value distributions — the distribution-drift detector
    * that, unlike [[aggTtest]], sees shape changes a mean can't
    * (completes the stats trio: t locates, χ² associates, KS shapes).
    * FULLY integer-exact: at each distinct cent value the scaled CDF
    * gap is |cum₁·n₂ − cum₂·n₁| (every factor an exact count, products
    * in decimal(38,0)/HUGEINT), the statistic is its max, and the
    * reported D is a ppm floor-divide — no float ever enters the
    * comparison. The cumulative window runs over the DISTINCT-value
    * grain (price-domain-bounded, not row-bounded); scale note: the
    * value domain is what bounds the single-partition window, the same
    * envelope argument as agg_percentile_disc. */
  val aggKsTest: Q = (s, d) => {
    val base = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("z"))
    val per = base.groupBy(col("z"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
           sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c2"))
    val w = Window.orderBy(col("z"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val totals = base.agg(
      sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n1"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n2"))
    per
      .withColumn("cum1", sum(col("c1")).over(w).cast("decimal(38,0)"))
      .withColumn("cum2", sum(col("c2")).over(w).cast("decimal(38,0)"))
      .crossJoin(broadcast(totals))
      .select(col("n1"), col("n2"),
        abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("gap"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("gap")).as("dmax"))
      .select(col("n1"), col("n2"),
        // one sample EMPTY (no clicks or no purchases in the corpus)
        // makes n1*n2 = 0: ANSI div throws, DuckDB // yields NULL — pin
        // the portable NULL-statistic contract (fuzz seed 451)
        when(col("n1") > 0 && col("n2") > 0,
          expr("CAST((dmax * 1000000) div (CAST(n1 AS DECIMAL(38,0)) * n2) " +
               "AS BIGINT)")).as("ks_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "agg_ks_test" -> aggKsTest,
    "agg_arg_extremes" -> aggArgExtremes,
    "agg_autocorr" -> aggAutocorr,
    "agg_benford" -> aggBenford,
    "agg_chisq" -> aggChisq,
    "agg_ttest" -> aggTtest,
    "agg_decile_stats" -> aggDecileStats,
    "agg_multi_distinct" -> aggMultiDistinct,
    "agg_hhi" -> aggHhi,
    "agg_percentile_disc" -> aggPercentileDisc,
    "agg_topn_share" -> aggTopnShare,
    "agg_mad" -> aggMad,
    "agg_winsorized_mean" -> aggWinsorizedMean,
    "agg_seasonality" -> aggSeasonality,
    "agg_regression" -> aggRegression,
    "agg_outlier_zscore" -> aggOutlierZscore,
    "agg_weighted" -> aggWeighted,
    "agg_gini" -> aggGini,
    "agg_median_grouped" -> aggMedianGrouped,
    "agg_mode" -> aggMode,
    "agg_histogram" -> aggHistogram,
    "agg_skewness" -> aggSkewness,
    "agg_entropy" -> aggEntropy,
    "agg_corr" -> aggCorr,
    "agg_string_agg" -> aggStringAgg,
    "agg_bool_bit" -> aggBoolBit,
    "agg_basic" -> aggBasic,
    "agg_count_distinct" -> aggCountDistinct,
    "agg_stddev" -> aggStddev,
    "agg_conditional" -> aggConditional,
    "agg_percentile" -> aggPercentile,
    "agg_having" -> aggHaving,
    "agg_ratio" -> aggRatio,
    "agg_multikey" -> aggMultikey)

  val oracles: Map[String, String] = Map(
    // integer-exact KS: |cum1*n2 - cum2*n1| in HUGEINT, ppm floor-div
    "agg_ks_test" ->
      """WITH base AS (
        |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS z
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |per AS (
        |  SELECT z,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM base GROUP BY 1),
        |t AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n2
        |  FROM base),
        |c AS (
        |  SELECT
        |    CAST(SUM(c1) OVER (ORDER BY z ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS HUGEINT) AS cum1,
        |    CAST(SUM(c2) OVER (ORDER BY z ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS HUGEINT) AS cum2
        |  FROM per),
        |g AS (
        |  SELECT t.n1, t.n2, MAX(abs(cum1 * t.n2 - cum2 * t.n1)) AS dmax
        |  FROM c, t GROUP BY 1, 2)
        |SELECT n1, n2,
        |  CAST((dmax * 1000000) // (CAST(n1 AS HUGEINT) * n2) AS BIGINT)
        |    AS ks_ppm
        |FROM g""".stripMargin,
    // composite unique ordering key makes arg_max/arg_min deterministic
    "agg_arg_extremes" ->
      """WITH b AS (
        |  SELECT event_type, user_id, event_id,
        |    CAST(floor(value * 100) AS BIGINT) * 100000000 + event_id AS k
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  arg_max(user_id, k) AS top_user,
        |  arg_min(user_id, k) AS bottom_user,
        |  CAST(max(k) // 100000000 AS BIGINT) AS max_cents,
        |  CAST(min(k) // 100000000 AS BIGINT) AS min_cents
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical integer moments -> identical doubles -> one round(6)
    "agg_autocorr" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    SUM(CAST(floor(value * 100) AS BIGINT)) AS x
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT event_type, x,
        |    lag(x) OVER (PARTITION BY event_type ORDER BY day) AS y
        |  FROM daily),
        |q AS (SELECT * FROM p WHERE y IS NOT NULL),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM q GROUP BY 1)
        |SELECT event_type, n_pairs,
        |  CASE WHEN
        |      CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |    AND CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
        |  THEN round(
        |    (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  END AS lag1_autocorr
        |FROM m ORDER BY event_type""".stripMargin,
    // pinned Benford ppm constants — no runtime log10 on either engine
    "agg_benford" ->
      """WITH b(digit, benford_ppm) AS (VALUES
        |  (1, CAST(301029 AS BIGINT)), (2, 176091), (3, 124938),
        |  (4, 96910), (5, 79181), (6, 66946), (7, 57991), (8, 51152),
        |  (9, 45757)),
        |o AS (
        |  SELECT digit, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT TRY_CAST(substr(CAST(CAST(floor(o_totalprice)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |    FROM orders)
        |  WHERE digit BETWEEN 1 AND 9 GROUP BY 1),
        |t AS (SELECT SUM(n) AS total FROM o)
        |SELECT o.digit, o.n,
        |  CAST(o.n * 1000000 // t.total AS BIGINT) AS obs_ppm,
        |  b.benford_ppm,
        |  abs(CAST(o.n * 1000000 // t.total AS BIGINT) - b.benford_ppm)
        |    AS dev_ppm
        |FROM o JOIN b USING (digit) CROSS JOIN t
        |ORDER BY digit""".stripMargin,
    // per-cell contributions rounded->decimal so the chi2 reduction is
    // order-independent; dow shifted to 0=Sunday on both engines
    "agg_chisq" ->
      """WITH cells AS (
        |  SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dow,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, dow, o,
        |    SUM(o) OVER (PARTITION BY event_type) AS r,
        |    SUM(o) OVER (PARTITION BY dow) AS c,
        |    SUM(o) OVER () AS t
        |  FROM cells),
        |k AS (
        |  SELECT event_type, dow, o,
        |    CAST(round((CAST(o AS DOUBLE) - CAST(r AS DOUBLE)
        |        * CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
        |      * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE)
        |        * CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
        |      / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(t AS DOUBLE)),
        |      6) AS DECIMAL(18,6)) AS contrib
        |  FROM m)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
        |  CAST(COUNT(DISTINCT dow) AS BIGINT) AS n_dows,
        |  CAST(SUM(contrib) AS DOUBLE) AS chi2,
        |  CAST(MAX(contrib) AS DOUBLE) AS max_contrib,
        |  CAST((COUNT(DISTINCT event_type) - 1)
        |     * (COUNT(DISTINCT dow) - 1) AS BIGINT) AS df
        |FROM k""".stripMargin,
    // identical arithmetic shape: int moments -> same doubles -> round
    "agg_ttest" ->
      """WITH ca AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n1,
        |    CAST(SUM(z) AS BIGINT) AS s1a, CAST(SUM(z * z) AS BIGINT) AS s2a
        |  FROM (SELECT CAST(floor(value * 100) AS BIGINT) AS z FROM events
        |        WHERE event_type = 'click')),
        |cb AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n2,
        |    CAST(SUM(z) AS BIGINT) AS s1b, CAST(SUM(z * z) AS BIGINT) AS s2b
        |  FROM (SELECT CAST(floor(value * 100) AS BIGINT) AS z FROM events
        |        WHERE event_type = 'purchase')),
        |m AS (
        |  SELECT n1, n2,
        |    CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0 AS m1,
        |    CAST(s1b AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0 AS m2,
        |    (CAST(n1 AS DOUBLE) * CAST(s2a AS DOUBLE)
        |       - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) / 10000.0
        |      / CAST(n1 AS DOUBLE) AS se1,
        |    (CAST(n2 AS DOUBLE) * CAST(s2b AS DOUBLE)
        |       - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE))
        |      / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) / 10000.0
        |      / CAST(n2 AS DOUBLE) AS se2
        |  FROM ca, cb)
        |SELECT n1, n2, round(m1, 6) AS mean1, round(m2, 6) AS mean2,
        |  round((m1 - m2) / sqrt(se1 + se2), 6) AS t_stat,
        |  round((se1 + se2) * (se1 + se2)
        |    / (se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)
        |     + se2 * se2 / (CAST(n2 AS DOUBLE) - 1.0)), 2) AS welch_df
        |FROM m""".stripMargin,
    "agg_decile_stats" ->
      """WITH b AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |t AS (
        |  SELECT o_orderpriority, cents,
        |    CAST(ntile(10) OVER (PARTITION BY o_orderpriority
        |      ORDER BY cents, o_orderkey) AS INTEGER) AS decile
        |  FROM b)
        |SELECT o_orderpriority, decile,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(min(cents) AS DOUBLE) / 100.0 AS min_price,
        |  CAST(max(cents) AS DOUBLE) / 100.0 AS max_price,
        |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS sum_price
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "agg_multi_distinct" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
        |  CAST(COUNT(DISTINCT (CAST(user_id AS VARCHAR) || '|' ||
        |    CAST(CAST(ts AS DATE) AS VARCHAR))) AS BIGINT) AS n_user_days,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "agg_hhi" ->
      """WITH per AS (
        |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(SUM(c) AS BIGINT) AS n_events,
        |    CAST(SUM(c * c) AS BIGINT) AS ss
        |  FROM per GROUP BY 1)
        |SELECT event_type, n_users, n_events,
        |  ss * 1000000 // (n_events * n_events) AS hhi_ppm
        |FROM g ORDER BY event_type""".stripMargin,
    "agg_percentile_disc" ->
      """WITH b AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, cents,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
        |  FROM b)
        |SELECT o_orderpriority, max(n) AS n_orders,
        |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS DOUBLE)
        |    / 100.0 AS p50_price,
        |  CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN cents END)
        |    AS DOUBLE) / 100.0 AS p90_price
        |FROM r GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "agg_topn_share" ->
      """WITH c AS (
        |  SELECT o_custkey,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT rev,
        |    row_number() OVER (ORDER BY rev DESC, o_custkey) AS rn
        |  FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(rev) AS DOUBLE) AS total_rev,
        |  CAST(SUM(CASE WHEN rn <= 10 THEN rev END) AS DOUBLE) AS top10_rev,
        |  CAST(SUM(CASE WHEN rn <= 10 THEN rev END) AS DOUBLE)
        |    / CAST(sum(rev) AS DOUBLE) AS top10_share
        |FROM r""".stripMargin,
    "agg_mad" ->
      """WITH o AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS z
        |  FROM orders),
        |m AS (
        |  SELECT o_orderpriority, quantile_cont(z, 0.5) AS med_c
        |  FROM o GROUP BY 1)
        |SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  quantile_cont(abs(z * 2 - med_c * 2), 0.5) / 200.0 AS mad
        |FROM o JOIN m USING (o_orderpriority)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_winsorized_mean" ->
      """WITH o AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) + 10000000000 AS z
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, z,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY z) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM o),
        |c AS (
        |  SELECT o_orderpriority,
        |    max(CASE WHEN rn = (n-1) // 20 + 1 THEN z END) AS z1lo,
        |    max(CASE WHEN rn = (n-1) // 20 + 2 THEN z END) AS z2lo,
        |    max(CASE WHEN rn = (19*(n-1)) // 20 + 1 THEN z END) AS z1hi,
        |    max(CASE WHEN rn = (19*(n-1)) // 20 + 2 THEN z END) AS z2hi,
        |    max(n) AS n
        |  FROM r GROUP BY 1),
        |cut AS (
        |  SELECT o_orderpriority,
        |    20*z1lo + ((n-1) % 20) * (coalesce(z2lo, z1lo) - z1lo) AS lo20,
        |    20*z1hi + ((19*(n-1)) % 20) * (coalesce(z2hi, z1hi) - z1hi) AS hi20
        |  FROM c),
        |g AS (
        |  SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(greatest(least(z * 20, hi20), lo20)) AS BIGINT) AS s20
        |  FROM o JOIN cut USING (o_orderpriority) GROUP BY 1)
        |SELECT o_orderpriority, n,
        |  CAST((s20 // (2000*n)) * 1000000
        |    + (2*(s20 % (2000*n))*1000000 + 2000*n) // (2*(2000*n))
        |    - 100000000000000 AS DOUBLE) / 1000000.0 AS winsorized_mean
        |FROM g ORDER BY 1""".stripMargin,
    // dow convention: Spark dayofweek() is 1=Sunday..7=Saturday;
    // DuckDB dayofweek() is 0=Sunday..6 — hence the +1
    "agg_seasonality" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |dw AS (
        |  SELECT event_type, CAST(dayofweek(day) + 1 AS INTEGER) AS dow,
        |    CAST(sum(n) AS BIGINT) AS n_dow,
        |    CAST(count(*) AS BIGINT) AS days_dow
        |  FROM daily GROUP BY 1, 2),
        |al AS (
        |  SELECT event_type, CAST(sum(n) AS BIGINT) AS n_all,
        |    CAST(count(*) AS BIGINT) AS days_all
        |  FROM daily GROUP BY 1)
        |SELECT dw.event_type, dow, n_dow, days_dow,
        |  round((CAST(n_dow AS DOUBLE) / CAST(days_dow AS DOUBLE))
        |        / (CAST(n_all AS DOUBLE) / CAST(days_all AS DOUBLE)), 6)
        |    AS seasonality_idx
        |FROM dw JOIN al USING (event_type)
        |ORDER BY 1, 2""".stripMargin,
    "agg_gini" ->
      """WITH r AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS z,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT),
        |               o_orderkey) AS i
        |  FROM orders),
        |a AS (
        |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(z AS HUGEINT)) AS sx,
        |    SUM(CAST(z AS HUGEINT) * i) AS six
        |  FROM r GROUP BY 1)
        |SELECT o_orderpriority, n,
        |  round(2.0 * CAST(six AS DOUBLE)
        |          / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
        |        - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
        |FROM a ORDER BY 1""".stripMargin,
    "agg_median_grouped" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS median_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // micro-unit weighted mean: HUGEINT mirror of the decimal(38,0)
    // spelling — no decimal→double before the final exact integer
    "agg_weighted" ->
      """WITH g AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_w,
        |    SUM(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
        |          AS HUGEINT)
        |        * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |          AS BIGINT)) AS a4,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS HUGEINT) AS b
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n, sum_w,
        |  CASE WHEN b <> 0 THEN
        |    CAST((CASE WHEN a4 < 0 THEN -1 ELSE 1 END)
        |         * (CASE WHEN b < 0 THEN -1 ELSE 1 END)
        |         * ((abs(a4) * 10000) // abs(b)) AS DOUBLE) / 1000000.0
        |  END AS wavg_price
        |FROM g ORDER BY l_returnflag""".stripMargin,
    "agg_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority,
        |         CAST(count(*) AS BIGINT) AS mode_count,
        |         row_number() OVER (PARTITION BY o_orderstatus
        |           ORDER BY count(*) DESC, o_orderpriority) AS rn
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, mode_count
        |FROM c WHERE rn = 1 ORDER BY 1""".stripMargin,
    "agg_regression" ->
      """WITH a AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(CAST(floor(l_quantity * 100) AS BIGINT) AS HUGEINT)) AS sx,
        |    SUM(CAST(CAST(floor(l_extendedprice * 100) AS BIGINT) AS HUGEINT)) AS sy,
        |    SUM(CAST(CAST(floor(l_quantity * 100) AS BIGINT) AS HUGEINT)
        |        * CAST(floor(l_extendedprice * 100) AS BIGINT)) AS sxy,
        |    SUM(CAST(CAST(floor(l_quantity * 100) AS BIGINT) AS HUGEINT)
        |        * CAST(floor(l_quantity * 100) AS BIGINT)) AS sxx,
        |    SUM(CAST(CAST(floor(l_extendedprice * 100) AS BIGINT) AS HUGEINT)
        |        * CAST(floor(l_extendedprice * 100) AS BIGINT)) AS syy
        |  FROM lineitem GROUP BY 1),
        |b AS (
        |  SELECT l_returnflag, n,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
        |  FROM a)
        |SELECT l_returnflag, n,
        |  CASE WHEN vx <> 0 THEN round(cov / vx, 6) END AS slope,
        |  CASE WHEN vx <> 0 THEN
        |    round((syd - (cov / vx) * sxd) / CAST(n AS DOUBLE) / 100.0, 6)
        |  END AS intercept,
        |  CASE WHEN vx <> 0 AND vy <> 0 THEN
        |    round(cov * cov / (vx * vy), 6)
        |  END AS r2
        |FROM b ORDER BY 1""".stripMargin,
    "agg_outlier_zscore" ->
      """WITH m AS (
        |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS HUGEINT)) AS s1,
        |    SUM(CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS HUGEINT)
        |        * CAST(floor(o_totalprice * 100) AS BIGINT)) AS s2
        |  FROM orders GROUP BY 1),
        |ms AS (
        |  SELECT o_orderpriority, n, s1, s2,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
        |    CASE WHEN n > 1 THEN
        |      sqrt(greatest(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
        |            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE), 0.0)
        |           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
        |    END AS std_c
        |  FROM m)
        |SELECT o.o_orderpriority,
        |  max(ms.n) AS n_orders,
        |  CAST((CASE WHEN max(ms.s1) < 0 THEN -1 ELSE 1 END)
        |       * ((abs(max(ms.s1)) * 10000) // max(ms.n)) AS DOUBLE)
        |    / 1000000.0 AS mean_price,
        |  round(max(ms.std_c) / 100.0, 6) AS stddev_price,
        |  CAST(SUM(CASE WHEN
        |        (CAST(ms.n AS HUGEINT)
        |           * CAST(floor(o.o_totalprice * 100) AS BIGINT) - ms.s1)
        |        * (CAST(ms.n AS HUGEINT)
        |           * CAST(floor(o.o_totalprice * 100) AS BIGINT) - ms.s1)
        |        * (CAST(ms.n AS HUGEINT) - 1)
        |        > 4 * CAST(ms.n AS HUGEINT)
        |            * (CAST(ms.n AS HUGEINT) * ms.s2 - ms.s1 * ms.s1)
        |           THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)
        |    AS BIGINT) AS n_outliers
        |FROM orders o JOIN ms USING (o_orderpriority)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_histogram" ->
      """SELECT event_type,
        |  CAST(floor(value / 25.0) AS INTEGER) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  min(value) AS lo, max(value) AS hi
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "agg_skewness" ->
      """WITH a AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(CAST(floor(value * 10000) AS BIGINT) AS HUGEINT)) AS s1,
        |    SUM(CAST(CAST(floor(value * 10000) AS BIGINT) AS HUGEINT)
        |        * CAST(floor(value * 10000) AS BIGINT)) AS s2,
        |    SUM(CAST(CAST(floor(value * 10000) AS BIGINT) AS HUGEINT)
        |        * CAST(floor(value * 10000) AS BIGINT)
        |        * CAST(floor(value * 10000) AS BIGINT)) AS s3
        |  FROM events GROUP BY 1)
        |SELECT event_type, n,
        |  round((CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
        |     - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |         * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
        |     + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        |   / pow(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |     - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 1.5),
        |   6) AS skewness
        |FROM a ORDER BY 1""".stripMargin,
    "agg_entropy" ->
      """WITH c AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT day, c,
        |    CAST(sum(c) OVER (PARTITION BY day) AS BIGINT) AS n
        |  FROM c)
        |SELECT day, max(n) AS n_events,
        |  CAST(SUM(CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 12)
        |    AS DECIMAL(18,12))) AS DOUBLE) AS entropy_nats
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_string_agg" ->
      """SELECT o_orderpriority,
        |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
        |    AS statuses,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_bool_bit" ->
      """SELECT event_type,
        |  bool_and(value > 0) AS all_positive,
        |  bool_or(value > 199) AS any_near_max,
        |  bit_and(event_id & 255) AS band,
        |  bit_or(event_id & 255) AS bor,
        |  bit_xor(event_id) AS bxor
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_corr" ->
      """WITH t AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,6)) AS x,
        |    CAST(EXTRACT(hour FROM ts) AS DECIMAL(18,6)) AS y
        |  FROM events),
        |a AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM t GROUP BY 1)
        |SELECT event_type, n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr_value_hour
        |FROM a ORDER BY 1""".stripMargin,
    "agg_basic" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumProdSql("l_extendedprice", "1.0 - l_discount")} AS sum_disc_price,
         |  ${ravgSql("l_quantity")} AS avg_qty,
         |  ${ravgSql("l_extendedprice")} AS avg_price,
         |  min(l_shipdate) AS min_ship,
         |  max(l_shipdate) AS max_ship
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "agg_count_distinct" ->
      """SELECT o_orderpriority,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_stddev" ->
      s"""SELECT l_returnflag,
         |  ${rstddevSql("l_quantity")} AS sd_qty,
         |  ${rstddevSql("l_extendedprice")} AS sd_price,
         |  CAST(count(*) AS BIGINT) AS n_rows
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_conditional" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        |  CAST(count(CASE WHEN o_totalprice > 100000 THEN 1 END) AS BIGINT) AS n_big
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS p75,
        |  round(quantile_cont(l_quantity, 0.95), 4) AS p95
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_having" ->
      s"""SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS total_spent
         |FROM orders GROUP BY 1 HAVING count(*) >= 3 ORDER BY 1""".stripMargin,
    // exact integer half-up rates (see aggRatio scaladoc)
    "agg_ratio" ->
      """WITH c AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(CASE WHEN l_quantity > 30 THEN 1 END) AS BIGINT) AS hi_q,
        |    CAST(count(CASE WHEN l_discount >= 0.05 THEN 1 END) AS BIGINT) AS hi_d
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n_rows,
        |  CAST((2 * hi_q * 10000 + n_rows) // (2 * n_rows) AS DOUBLE)
        |    / 10000.0 AS high_qty_rate,
        |  CAST((2 * hi_d * 10000 + n_rows) // (2 * n_rows) AS DOUBLE)
        |    / 10000.0 AS discounted_rate
        |FROM c ORDER BY 1""".stripMargin,
    "agg_multikey" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS ship_year,
         |  CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS ship_month,
         |  l_suppkey % 5 AS supp_bucket,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY 1, 2, 3, 4, 5 ORDER BY 1, 2, 3, 4, 5""".stripMargin)
}
