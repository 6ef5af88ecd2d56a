package graft.ops

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the `events` stream — the product-analytics
  * triple (ordered funnel, cohort retention, transition matrix) that the
  * reference's trend/dashboard tier implies but never names: its daily /
  * weekly delay-trend queries (`/root/reference/sql/analysis_queries.sql:
  * 70-100,158-191`) and the Streamlit dashboard's per-period rollups
  * (`/root/reference/streamlit_dashboard.py:80-140`) are exactly the
  * cohort/period-offset shape, and the Airflow incremental tier replays
  * user-ordered event sequences. All three are single-logical-shuffle
  * plans keyed on `user_id`.
  *
  * Determinism discipline: counts are exact longs; every ratio is ONE
  * IEEE division of values both engines hold bit-identically (see
  * [[graft.ops.ravg]] for why quotients are left unrounded).
  */
object Behavior {

  /** Strictly-ordered conversion funnel signup → view → click → purchase:
    * a user reaches stage k+1 only with an event of that type STRICTLY
    * AFTER their stage-k timestamp (independent per-type minima would
    * count a purchase that precedes the first view).
    *
    * Shape: four chained `min(CASE …) OVER (PARTITION BY user_id)`
    * aggregates — each references the previous stage's timestamp, which
    * is partition-constant, so all four Window operators share ONE
    * hash-partitioning on user_id (one exchange; no sort needed for
    * unbounded frames) and the per-user reduce + global count ride the
    * same partitioning. At 100 TB this is the plan you want: events
    * shuffle once, stage logic is map-side over each user's partition
    * slice, and the output is 4 rows. The staged-join alternative
    * (frontier ⋈ events per stage) costs one shuffle PER stage.
    */
  val extFunnel: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
    def stageMin(tpe: String, after: Option[String]): org.apache.spark.sql.Column = {
      val hit = after match {
        case None       => col("event_type") === tpe
        case Some(prev) => col("event_type") === tpe && col("ts") > col(prev)
      }
      min(when(hit, col("ts"))).over(w)
    }
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t1", stageMin("signup", None))
      .withColumn("t2", stageMin("view", Some("t1")))
      .withColumn("t3", stageMin("click", Some("t2")))
      .withColumn("t4", stageMin("purchase", Some("t3")))
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
           max(col("t3")).as("t3"), max(col("t4")).as("t4"))
      .agg(count(col("t1")).as("u1"), count(col("t2")).as("u2"),
           count(col("t3")).as("u3"), count(col("t4")).as("u4"))
      .selectExpr(
        """stack(4,
          |  1, 'signup',   u1,
          |  2, 'view',     u2,
          |  3, 'click',    u3,
          |  4, 'purchase', u4) AS (stage_no, stage, users)""".stripMargin)
      // unpartitioned window over the 4-row stage frame only (the
      // single-partition WARN it logs is about THIS frame, not events)
      .withColumn("conv_from_first", {
        // zero-denominator guard: an empty first stage (u1 = 0) must be
        // NULL on both engines (Spark x/0 → NULL, DuckDB IEEE → NaN)
        val u1 = first(col("users")).over(Window.orderBy(col("stage_no")))
        when(u1 =!= 0, col("users").cast("double") / u1)
      })
      .orderBy(col("stage_no"))
  }

  /** Weekly cohort retention: cohort = ISO week of a user's first event;
    * cell (cohort_week, week_no) = distinct users of that cohort active
    * week_no weeks later. One user_id shuffle for the first-event window,
    * a distinct on (user, cohort, week) grain, then the final cell
    * aggregate — cells are bounded by weeks², not by events. */
  val extCohortRetention: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"))
      .withColumn("cohort_week",
        date_trunc("week", min(col("ts")).over(w)).cast("date"))
      .withColumn("week", date_trunc("week", col("ts")).cast("date"))
      .select(col("user_id"), col("cohort_week"), col("week"))
      .distinct()
      .withColumn("week_no",
        (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_no"))
      .agg(count(lit(1)).as("active_users"))
      .orderBy(col("cohort_week"), col("week_no"))
  }

  /** Event-type transition matrix (first-order Markov counts): per user,
    * each consecutive event pair (lag over ts with event_id tiebreak so
    * the order is total), counted per (prev, curr) with the row-
    * conditional probability. The lag window and nothing else touches
    * event volume; the matrix itself is |types|² rows. */
  val winEventTransitions: Q = (s, d) => {
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(wo))
      .filter(col("prev_type").isNotNull)
      .select(col("prev_type"), col("event_type").as("curr_type"))
      .groupBy(col("prev_type"), col("curr_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .orderBy(col("prev_type"), col("curr_type"))
  }

  /** E29 — PageRank over the event-type transition graph (10 fixed
    * power iterations, damping 0.85): the centrality score of each
    * event type in user flows, completing the graph tier (components =
    * [[graft.ops.Clustering]], reachability = sql_recursive_cte,
    * centrality = here). Edge weights are the exact transition counts;
    * the per-iteration contribution sum is made order-free by the
    * [[graft.ops.Aggregates.aggEntropy]] trick — each r·p term is
    * rounded to 12 decimals and accumulated as decimal(28,12), so ten
    * chained iterations stay bit-identical across engines (a raw double
    * sum would drift with shuffle merge order). No dangling-mass
    * redistribution: both sides use the same simple update, and the
    * transition graph has out-edges everywhere.
    *
    * Scale shape: the iteration state is one row per NODE (event type —
    * cardinality-bounded); all ten iterations are narrow joins against
    * the types² edge frame inside ONE lazy plan, evaluated as a single
    * job. The general-graph (unbounded-node) variant would checkpoint
    * per round exactly like connectedComponents. */
  val extPagerank: Q = (s, d) => {
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("src", lag(col("event_type"), 1).over(wo))
      .filter(col("src").isNotNull)
      .select(col("src"), col("event_type").as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    val out = trans.groupBy(col("src")).agg(sum(col("n")).as("outn"))
    val edges = trans.join(out, Seq("src"))
      .select(col("src"), col("dst"),
              (col("n").cast("double") / col("outn").cast("double")).as("p"))
    val nodes = Tables.events(s, d).select(col("event_type").as("node")).distinct()
    val nn = nodes.agg(count(lit(1)).cast("double").as("nn"))
    var r = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("nn")).as("r"))
    for (_ <- 1 to 10) {
      val contrib = r.join(edges, col("node") === col("src"))
        .select(col("dst"),
                round(col("r") * col("p"), 12).cast("decimal(28,12)").as("t"))
        .groupBy(col("dst")).agg(sum(col("t")).as("st"))
      r = nodes.crossJoin(broadcast(nn))
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
                (lit(0.15) / col("nn") +
                 lit(0.85) * coalesce(col("st").cast("double"), lit(0.0)))
                  .as("r"))
    }
    r.select(col("node"), round(col("r"), 10).as("pagerank"))
      .orderBy(col("node"))
  }

  /** W15 — longest consecutive-day activity streak per user: the
    * gaps-and-islands pattern (day − row_number() is constant within a
    * consecutive run, so it IS the island key), the remaining classic
    * SQL shape the sessionize/window entries don't cover. One user_id
    * shuffle; islands are day-grain, so nothing scales with raw event
    * volume past the distinct. */
  val winStreak: Q = (s, d) => {
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days.withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
           max(col("len")).as("longest_streak"))
      .orderBy(col("user_id"))
  }

  /** W16 — inter-arrival profile: exact p50/p95 of the gap (seconds)
    * between a user's consecutive events, per event type of the later
    * event — the cadence signal behind session-gap threshold choices
    * (the 30-minute default in [[graft.ops.Windows]]' sessionizers is
    * exactly a quantile judgement on this distribution). Gaps are exact
    * integer seconds (epoch difference); the percentile is the same
    * interpolated-exact aggregate [[graft.ops.Aggregates.aggPercentile]]
    * already proves bit-portable. One user_id sort window, then a
    * per-type aggregate. */
  val winInterarrival: Q = (s, d) => {
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(wo))
      .filter(col("prev_ts").isNotNull)
      .select(col("event_type"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")))
          .as("gap_s"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
           round(percentile(col("gap_s"), lit(0.5)), 4).as("p50_gap_s"),
           round(percentile(col("gap_s"), lit(0.95)), 4).as("p95_gap_s"))
      .orderBy(col("event_type"))
  }

  /** W17 — month-over-month rank movement: each event type's volume
    * rank within the month, and its movement vs the previous month —
    * the "movers" column on every leaderboard dashboard (the
    * reference's weekly route rankings are this at route grain).
    * Two stacked windows over the (month × type) frame: rank within
    * month (count DESC, type tie-break), then lag of rank per type
    * across months. Everything integral. */
  val winRankChange: Q = (s, d) => {
    val monthly = Tables.events(s, d)
      .groupBy(date_trunc("month", col("ts")).cast("date").as("month"),
               col("event_type"))
      .agg(count(lit(1)).as("n"))
    val wRank = Window.partitionBy(col("month"))
      .orderBy(col("n").desc, col("event_type"))
    val wLag = Window.partitionBy(col("event_type")).orderBy(col("month"))
    monthly
      .withColumn("rank", row_number().over(wRank))
      .withColumn("rank_change",
        lag(col("rank"), 1).over(wLag) - col("rank"))
      .orderBy(col("month"), col("rank"))
  }

  /** W18 — overlapping-interval union (merge-then-measure): each event
    * opens a 300 s activity interval `[t, t+300)`; per user, overlapping
    * intervals merge into islands and the query reports islands, covered
    * seconds, and event count — "how long was the user actually active",
    * the billable-time / uptime-union primitive (naive per-event ×300 s
    * double-counts overlap badly). Classic gaps-and-islands: a running
    * `max(end)` over everything STRICTLY BEFORE the row flags
    * island-openers (`start > run_end`), a running sum of flags numbers
    * the islands, two bounded aggregates measure them. All integer
    * epoch-seconds ([[winInterarrival]]'s discipline) — bit-exact
    * cross-engine. One user-partitioned sort window + two hash
    * aggregates; at 100 TB the window partitions by user (no global
    * sort) and state per partition is one running long. Ties on
    * (start, end) are order-insensitive: equal rows produce identical
    * flag outcomes whichever engine orders them first. */
  val winIntervalMerge: Q = (s, d) => {
    val span = 300L
    // event_id tiebreak makes the window order UNIQUE: the island math
    // is tie-insensitive (duplicate (st,en) rows are interchangeable),
    // but DuckDB's parallel window execution is NON-DETERMINISTIC on
    // tied ORDER BY keys (fuzz seed 454: duplicate-timestamp corpus
    // flipped island ids between runs) — a tie-free order pins both
    // engines to the one deterministic frame
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("st"), col("en"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
              unix_timestamp(col("ts")).as("st"))
      .withColumn("en", col("st") + span)
      .withColumn("run_end", max(col("en"))
        .over(wo.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("island",
        sum(when(col("st") > col("run_end"), 1L).otherwise(0L))
          .over(wo.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("st")).as("ist"), max(col("en")).as("ien"),
           count(lit(1)).as("n_ev"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
           sum(col("ien") - col("ist")).as("covered_sec"),
           sum(col("n_ev")).as("n_events"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, Q] = Map(
    "win_interval_merge" -> winIntervalMerge,
    "ext_funnel" -> extFunnel,
    "ext_cohort_retention" -> extCohortRetention,
    "ext_pagerank" -> extPagerank,
    "win_streak" -> winStreak,
    "win_interarrival" -> winInterarrival,
    "win_rank_change" -> winRankChange,
    "win_event_transitions" -> winEventTransitions)

  /** DuckDB replay of the ten PageRank iterations, generated as unrolled
    * CTEs (recursive CTEs disallow aggregation in the recursive member,
    * so the fixed iteration count is spelled out). */
  private val pagerankSql: String = {
    val header =
      """WITH tr AS (
        |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM (
        |    SELECT event_type AS dst,
        |      lag(event_type) OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS src
        |    FROM events)
        |  WHERE src IS NOT NULL GROUP BY 1, 2),
        |o AS (SELECT src, CAST(sum(n) AS BIGINT) AS outn FROM tr GROUP BY 1),
        |edges AS (
        |  SELECT tr.src, tr.dst,
        |    CAST(n AS DOUBLE) / CAST(outn AS DOUBLE) AS p
        |  FROM tr JOIN o USING (src)),
        |nodes AS (SELECT DISTINCT event_type AS node FROM events),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
        |r0 AS (SELECT node, 1.0 / nn.nn AS r FROM nodes CROSS JOIN nn)"""
        .stripMargin
    val iters = (1 to 10).map { k =>
      s"""r$k AS (
         |  SELECT nd.node,
         |    0.15 / nn.nn + 0.85 * coalesce(CAST(c.st AS DOUBLE), 0.0) AS r
         |  FROM nodes nd CROSS JOIN nn LEFT JOIN (
         |    SELECT e.dst,
         |      SUM(CAST(round(pr.r * e.p, 12) AS DECIMAL(28,12))) AS st
         |    FROM r${k - 1} pr JOIN edges e ON pr.node = e.src
         |    GROUP BY e.dst) c
         |    ON c.dst = nd.node)""".stripMargin
    }.mkString(",\n")
    header + ",\n" + iters +
      "\nSELECT node, round(r, 10) AS pagerank FROM r10 ORDER BY node"
  }

  val oracles: Map[String, String] = Map(
    // first row's run_end is NULL → CASE yields 0 on both engines, so
    // island ids start at 0 identically
    "win_interval_merge" ->
      """WITH ev AS (
        |  -- event_id tiebreak: tie-free window order (DuckDB's parallel
        |  -- window path is non-deterministic on tied keys, fuzz seed 454)
        |  SELECT user_id, event_id,
        |    CAST(floor(EXTRACT(EPOCH FROM ts)) AS BIGINT) AS st,
        |    CAST(floor(EXTRACT(EPOCH FROM ts)) AS BIGINT) + 300 AS en
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, st, en,
        |    max(en) OVER (PARTITION BY user_id ORDER BY st, en, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_end
        |  FROM ev),
        |f AS (
        |  SELECT user_id, st, en,
        |    SUM(CASE WHEN st > run_end THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY st, en, event_id
        |        ROWS UNBOUNDED PRECEDING) AS island
        |  FROM m),
        |i AS (
        |  SELECT user_id, island, min(st) AS ist, max(en) AS ien,
        |    count(*) AS n_ev
        |  FROM f GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(SUM(ien - ist) AS BIGINT) AS covered_sec,
        |  CAST(SUM(n_ev) AS BIGINT) AS n_events
        |FROM i GROUP BY 1 ORDER BY user_id""".stripMargin,
    "ext_pagerank" -> pagerankSql,
    "win_rank_change" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
        |    event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT month, event_type, n,
        |    CAST(row_number() OVER (PARTITION BY month
        |      ORDER BY n DESC, event_type) AS INTEGER) AS rank
        |  FROM m)
        |SELECT month, event_type, n, rank,
        |  lag(rank) OVER (PARTITION BY event_type ORDER BY month) - rank
        |    AS rank_change
        |FROM r ORDER BY month, rank""".stripMargin,
    // floor(EXTRACT(EPOCH ...)) matches Spark's flooring unix_timestamp
    "win_interarrival" ->
      """WITH g AS (
        |  SELECT event_type,
        |    CAST(floor(EXTRACT(EPOCH FROM ts)) AS BIGINT)
        |      - CAST(floor(EXTRACT(EPOCH FROM
        |          lag(ts) OVER (PARTITION BY user_id
        |                        ORDER BY ts, event_id))) AS BIGINT) AS gap_s
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |  round(quantile_cont(gap_s, 0.5), 4) AS p50_gap_s,
        |  round(quantile_cont(gap_s, 0.95), 4) AS p95_gap_s
        |FROM g WHERE gap_s IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "win_streak" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |g AS (
        |  SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id
        |                                  ORDER BY day) AS INTEGER) AS grp
        |  FROM days),
        |s AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
        |      FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  CAST(max(len) AS BIGINT) AS longest_streak
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "ext_funnel" ->
      """WITH a AS (
        |  SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'signup' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |b AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' AND ts > t1 THEN ts END)
        |      OVER (PARTITION BY user_id) AS t2 FROM a),
        |c AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t2 THEN ts END)
        |      OVER (PARTITION BY user_id) AS t3 FROM b),
        |d AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t3 THEN ts END)
        |      OVER (PARTITION BY user_id) AS t4 FROM c),
        |u AS (
        |  SELECT user_id, max(t1) AS t1, max(t2) AS t2,
        |         max(t3) AS t3, max(t4) AS t4
        |  FROM d GROUP BY 1),
        |n AS (
        |  SELECT count(t1) AS u1, count(t2) AS u2,
        |         count(t3) AS u3, count(t4) AS u4 FROM u),
        |st AS (
        |  SELECT 1 AS stage_no, 'signup' AS stage, u1 AS users FROM n
        |  UNION ALL SELECT 2, 'view', u2 FROM n
        |  UNION ALL SELECT 3, 'click', u3 FROM n
        |  UNION ALL SELECT 4, 'purchase', u4 FROM n)
        |SELECT stage_no, stage, users,
        |  CASE WHEN first_value(users) OVER (ORDER BY stage_no) <> 0 THEN
        |    CAST(users AS DOUBLE) /
        |      first_value(users) OVER (ORDER BY stage_no)
        |  END AS conv_from_first
        |FROM st ORDER BY stage_no""".stripMargin,
    "ext_cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, ts,
        |    CAST(date_trunc('week', min(ts) OVER (PARTITION BY user_id))
        |         AS DATE) AS cohort_week,
        |    CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events),
        |g AS (SELECT DISTINCT user_id, cohort_week, week FROM f)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, week) / 7 AS INTEGER) AS week_no,
        |  CAST(count(*) AS BIGINT) AS active_users
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "win_event_transitions" ->
      """WITH t AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |g AS (
        |  SELECT prev_type, event_type AS curr_type,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, curr_type, n,
        |  CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type) AS p
        |FROM g ORDER BY 1, 2""".stripMargin)
}
