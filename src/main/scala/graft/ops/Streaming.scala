package graft.ops

import graft.streaming.EventsStream

/** Streaming operator entries (SURVEY.md §2.10). The streaming results are
  * deterministic once AvailableNow drains the source, so the batch SQL that
  * a DuckDB oracle can run IS the equivalence check (SURVEY §5.4: streaming
  * output == batch aggregation over the same data).
  */
object Streaming {

  val queries: Map[String, Q] = Map(
    "stream_hourly_agg" -> ((s, d) => EventsStream.hourlyAgg(s, d)),
    "stream_sliding_agg" -> ((s, d) => EventsStream.slidingAgg(s, d)),
    "stream_chained_agg" -> ((s, d) => EventsStream.chainedAgg(s, d)),
    "stream_dedup_counts" -> ((s, d) => EventsStream.dedupCounts(s, d)),
    "stream_sessionize" -> ((s, d) => EventsStream.sessionStats(s, d)),
    "stream_running_max" -> ((s, d) => EventsStream.runningMaxQuery(s, d)),
    "stream_incremental_daily" ->
      ((s, d) => EventsStream.incrementalDailyQuery(s, d)),
    "stream_enrich_join" -> ((s, d) => EventsStream.enrichJoin(s, d)),
    "stream_interval_join" -> ((s, d) => EventsStream.intervalJoin(s, d)),
    "stream_interval_left_join" ->
      ((s, d) => EventsStream.intervalLeftJoin(s, d)),
    "stream_upsert_merge" -> ((s, d) => EventsStream.upsertMerge(s, d)),
    "stream_embedding_drift" ->
      ((s, d) => EventsStream.embeddingDriftStream(s, d)))

  val oracles: Map[String, String] = Map(
    // micro-batched IVF-cell occupancy drained to completion == the
    // batch assignment's cell histogram (ann_ivf's replay, cell grain)
    "stream_embedding_drift" ->
      s"""WITH assigned AS (
         |  SELECT vec_id, seed_id AS list_id FROM (
         |    SELECT e.vec_id, s.vec_id AS seed_id,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${Similarity.cosSql("e.embedding", "s.embedding")} DESC,
         |        s.vec_id) AS rn
         |    FROM embeddings e CROSS JOIN
         |      (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 16) s)
         |  WHERE rn = 1)
         |SELECT list_id, CAST(count(*) AS BIGINT) AS n_vecs
         |FROM assigned GROUP BY 1 ORDER BY list_id""".stripMargin,
    "stream_hourly_agg" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // sliding 2h/1h: each event lands in exactly two hourly-aligned
    // window starts — trunc(ts) and trunc(ts) - 1h
    "stream_sliding_agg" ->
      """SELECT win_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT unnest([date_trunc('hour', ts),
        |                 date_trunc('hour', ts) - INTERVAL 1 HOUR])
        |    AS win_start, event_type, value
        |  FROM events)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_dedup_counts" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM (SELECT DISTINCT ON (event_id, ts) * FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // arbitrary stateful processing drained to completion == batch max
    "stream_running_max" ->
      """SELECT event_type, max(value) AS running_max
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // exactly-once incremental day-partitioned append == batch daily counts
    "stream_incremental_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // stream-static broadcast enrich drained to completion == batch join
    "stream_enrich_join" ->
      """SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // stream-stream interval join drained == batch interval self-join
    "stream_interval_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  c.ts AS click_ts, p.ts AS purchase_ts
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY 1, 2, 3""".stripMargin,
    // chained aggs in append mode emit only days finalized before the
    // terminal watermark (max ts - 1 h)
    "stream_chained_agg" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events)
        |SELECT CAST(date_trunc('day', h) AS DATE) AS day, event_type,
        |  max(n_events) AS max_hourly, CAST(count(*) AS BIGINT) AS n_hours
        |FROM hourly, wm
        |WHERE CAST(date_trunc('day', h) AS DATE) + INTERVAL 1 DAY
        |      <= wm.w
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // left-outer stream-stream join drained == matched pairs + clicks
    // whose 30-min window closed before the terminal watermark
    // (min of the two stream maxima - 1 h)
    "stream_interval_left_join" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id AS p_user_id,
        |    ts AS purchase_ts
        |  FROM events WHERE event_type = 'purchase'),
        |wm AS (
        |  -- NULL-STRICT terminal watermark: DuckDB's least() IGNORES a
        |  -- NULL operand, but an EMPTY stream side means the streaming
        |  -- watermark never advances and NO left row can ever emit
        |  -- (fuzz seed 451: a zero-purchase corpus) — so an absent
        |  -- maximum must poison the cutoff, not be skipped
        |  SELECT CASE WHEN maxc IS NULL OR maxp IS NULL THEN NULL
        |         ELSE least(maxc, maxp) - INTERVAL 1 HOUR END AS w
        |  FROM (SELECT
        |    (SELECT max(ts) FROM events WHERE event_type = 'click') AS maxc,
        |    (SELECT max(ts) FROM events WHERE event_type = 'purchase') AS maxp)),
        |m AS (
        |  SELECT c.user_id, c.click_id, p.purchase_id,
        |    c.click_ts, p.purchase_ts
        |  FROM c JOIN p ON c.user_id = p.p_user_id
        |    AND p.purchase_ts >= c.click_ts
        |    AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE)
        |SELECT user_id, click_id, purchase_id, click_ts, purchase_ts FROM m
        |UNION ALL
        |SELECT c.user_id, c.click_id, CAST(NULL AS BIGINT),
        |  c.click_ts, CAST(NULL AS TIMESTAMP)
        |FROM c, wm
        |WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.click_id = c.click_id)
        |  AND c.click_ts + INTERVAL 30 MINUTE < wm.w
        |ORDER BY user_id, click_id, purchase_id""".stripMargin,
    // foreachBatch merge drained == batch last-event-per-user
    "stream_upsert_merge" ->
      """WITH r AS (
        |  SELECT user_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |c AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT c.user_id, n_events, r.ts AS last_ts, r.value AS last_value
        |FROM c JOIN r ON c.user_id = r.user_id AND rn = 1
        |ORDER BY 1""".stripMargin,
    // gap-method sessionization: new session iff gap >= 30 min (matches
    // session_window's half-open [start, last+gap) semantics). event_id
    // tiebreak in BOTH windows: DuckDB's parallel window execution is
    // non-deterministic on tied ORDER BY keys (round-8 seed 454), and a
    // duplicate-ts corpus would otherwise make the sid cumsum unstable
    // run-to-run even though the flag math is tie-insensitive.
    "stream_sessionize" ->
      """WITH flags AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flags),
        |grouped AS (
        |  SELECT user_id, sid, count(*) AS n FROM sess GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(max(n) AS BIGINT) AS max_session_events,
        |  CAST(sum(n) AS BIGINT) AS total_events
        |FROM grouped GROUP BY 1 ORDER BY 1""".stripMargin)
}
