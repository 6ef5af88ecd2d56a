package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** Scalar string / date / math functions (SURVEY.md §2.8, F1–F6).
  *
  * Covers every scalar the reference exercises: EXTRACT family + DATE_TRUNC
  * (`/root/reference/sql/fact_dim_tables.sql:163-170,319-321`), TO_CHAR
  * date keys and day/month names (`fact_dim_tables.sql:161-170,189`),
  * generate_series (`fact_dim_tables.sql:179-183`), date arithmetic
  * (`sql/analysis_queries.sql:281`), `string_to_array` time-splitting
  * (`sql/create_schema.sql:211-216` — full GTFS parser in
  * [[graft.functions.GtfsTime]]), and ROUND/GREATEST/LEAST/NULLIF/ABS/SQRT
  * math (`analysis_queries.sql:42-46`, `fact_dim_tables.sql:320-321`).
  *
  * Cross-engine traps handled here (SURVEY §2.8 F1):
  *  - PostgreSQL/DuckDB `EXTRACT(DOW)` is 0=Sunday; Spark `dayofweek` is
  *    1=Sunday → we emit `dayofweek(ts) - 1` to keep the PG convention.
  *  - `EXTRACT(WEEK)` is ISO week in both PG/DuckDB and Spark `weekofyear`.
  *  - EXTRACT returns BIGINT in DuckDB vs Spark's INT → oracle casts.
  *
  * Scale notes: all pure per-row expressions inside whole-stage codegen —
  * no shuffle, no UDF boundary. The series generator is `spark.range`
  * (parallel, no driver materialization).
  */
object Scalars {

  /** F1 — the EXTRACT family over event timestamps. */
  val fnDatetimeExtract: Q = (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        year(col("ts")).as("y"),
        quarter(col("ts")).as("q"),
        month(col("ts")).as("mon"),
        weekofyear(col("ts")).as("iso_week"),
        dayofmonth(col("ts")).as("dom"),
        (dayofweek(col("ts")) - 1).as("dow_pg"),
        hour(col("ts")).as("h"),
        minute(col("ts")).as("mi"),
        unix_timestamp(col("ts")).as("epoch_s"),
        // date_trunc promotes NTZ→TZ; cast back so the dump stays naive
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("ts_hour"))
      .orderBy(col("event_id"))

  /** F2 — TO_CHAR-style date keys and names (dim_date shape). */
  val fnDateFormat: Q = (s, d) =>
    Tables.orders(s, d)
      .select(to_date(col("o_orderdate")).as("day")).distinct()
      .select(
        col("day"),
        date_format(col("day"), "yyyyMMdd").cast("int").as("date_key"),
        date_format(col("day"), "MMMM").as("month_name"),
        date_format(col("day"), "EEEE").as("day_name"))
      .orderBy(col("date_key"))

  /** F3 — generate_series: calendar spine left-joined to per-day activity. */
  val fnDateSeries: Q = (s, d) => {
    val spine = s.range(0, 31)
      .select(date_add(lit("2024-01-01").cast("date"),
                       col("id").cast("int")).as("day"))
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("day"))
  }

  /** F4 — date/timestamp arithmetic (+/- intervals). */
  val fnDateArith: Q = (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        (col("ts") + expr("INTERVAL 7 DAYS")).as("ts_plus7d"),
        (col("ts") - expr("INTERVAL 90 MINUTES")).as("ts_minus90m"),
        date_sub(to_date(col("ts")), 7).as("day_minus7"),
        date_add(to_date(col("ts")), 30).as("day_plus30"))
      .orderBy(col("event_id"))

  /** F5 — string split + element casts (the GTFS "HH:MM:SS" shape: the
    * time string is derived from ts, split on ':', and rebuilt into
    * seconds-since-midnight exactly like
    * `staging.gtfs_time_to_interval`). */
  val fnStringSplit: Q = (s, d) => {
    val tstr = date_format(col("ts"), "HH:mm:ss")
    Tables.events(s, d)
      .select(col("event_id"), tstr.as("tstr"),
              (element_at(split(tstr, ":"), 1).cast("int") * 3600 +
               element_at(split(tstr, ":"), 2).cast("int") * 60 +
               element_at(split(tstr, ":"), 3).cast("int")).as("secs"))
      .orderBy(col("event_id"))
  }

  /** F6 — ROUND/GREATEST/LEAST/NULLIF/ABS/SQRT + int-division bucketing. */
  val fnMath: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        greatest(col("l_quantity"), lit(25.0)).as("g25"),
        least(col("l_quantity"), lit(25.0)).as("l25"),
        round(abs(col("l_quantity") - 25.0), 2).as("abs_dev"),
        // sqrt domain guard: negative prices (credit lines) are NULL on
        // both engines, not Spark-NaN-vs-DuckDB-error
        when(col("l_extendedprice") >= 0,
             round(sqrt(col("l_extendedprice")), 4)).as("sqrt_price"),
        nullif(col("l_tax"), lit(0.0)).as("tax_or_null"),
        (floor(col("l_quantity") / 15) * 15).cast("int").as("qty_bucket"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
               col("sqrt_price"))

  /** F6b — trigonometric surface (the reference's synthetic tier models
    * seasonality with sinusoids — `/root/reference/
    * generate_synthetic_data.py:148,151`; any cyclic-feature encoding
    * needs these). Both JVM Math and C libm guarantee ≤1-ulp accuracy
    * but not the SAME 1 ulp — so sin/cos/atan values are rounded to 10
    * decimals (empirically bit-identical on this corpus; the round
    * guards the tail). radians/degrees are NOT left to the builtins:
    * `toDegrees` does v·180/π while DuckDB multiplies a precomputed
    * 180/π, a guaranteed-different double — both sides instead spell
    * out the identical op sequence v·π/180 and v·180/π, which makes
    * them bit-exact with no rounding needed at all. */
  val fnTrig: Q = (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        round(sin(col("value")), 10).as("sin_v"),
        round(cos(col("value")), 10).as("cos_v"),
        round(atan(col("value")), 10).as("atan_v"),
        round(atan2(col("value"), lit(100.0)), 10).as("atan2_v"),
        (col("value") * lit(math.Pi) / lit(180.0)).as("rad_v"),
        (col("value") * lit(180.0) / lit(math.Pi)).as("deg_v"))
      .orderBy(col("event_id"))

  /** F6c — exponential/logarithm surface (log-scaling features, decay
    * weights, perplexity math — [[graft.ops.Curation.extLmScore]] builds
    * on ln). Same ≤1-ulp libm caveat as [[fnTrig]], so round(10);
    * arguments are shifted (+1, /100) to keep every input strictly in
    * the functions' well-conditioned domain. */
  // Domain guards are part of the contract: Spark log/sqrt of an
  // out-of-domain value returns NULL/NaN where DuckDB raises — the
  // portable spelling makes "out of domain → NULL" explicit on BOTH
  // engines (negative event values are legal refund-shaped rows; fuzz
  // seed 400 reached them first).
  val fnExpLog: Q = (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        round(exp(col("value") / 100.0), 10).as("exp_v"),
        when(col("value") + 1.0 > 0,
             round(log(col("value") + lit(1.0)), 10)).as("ln_v"),
        when(col("value") + 1.0 > 0,
             round(log10(col("value") + lit(1.0)), 10)).as("log10_v"),
        when(col("value") + 1.0 > 0,
             round(log2(col("value") + lit(1.0)), 10)).as("log2_v"),
        when(col("value") >= 0,
             round(pow(col("value"), lit(0.5)), 10)).as("pow_half"))
      .orderBy(col("event_id"))

  /** F9 — safe-cast (TRY_CAST) surface: the ingestion-hardening
    * semantics ANSI mode demands — malformed numerics, integer
    * overflow, and impossible dates become NULL instead of a job-killing
    * exception. Probed over strings derived from real rows: a
    * non-numeric name, its digit substring, a deliberately overflowing
    * digit string, and a month that may not exist. Engine caveat kept
    * OUT of the query on purpose: decimal strings ('12.9' → INT) round
    * in DuckDB but null in Spark — the portable subset is
    * integral/overflow/date validity, which is what ingestion actually
    * gates on. Pure map stage. */
  val fnTryCast: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"),
        expr("try_cast(c_name AS INT)").as("name_as_int"),
        expr("try_cast(regexp_extract(c_name, '([0-9]+)', 1) AS INT)")
          .as("digits_as_int"),
        expr("try_cast(concat(regexp_extract(c_name, '([0-9]+)', 1), " +
             "'9999999999') AS INT)").as("overflow_as_int"),
        expr("try_cast(concat('2024-', cast(c_custkey % 13 + 1 AS STRING)," +
             " '-28') AS DATE)").as("maybe_date"))
      .orderBy(col("c_custkey"))

  /** F10 — batch time-bucketing via `window()` (the same tumbling
    * `window(ts, "15 minutes")` the streaming tier uses, here in a
    * batch aggregate — proving the grouping primitive is
    * engine-uniform across modes). Buckets are epoch-aligned; the
    * oracle spells the identical bucketing as epoch floor-division
    * (`time_bucket` origins differ between engines — arithmetic
    * doesn't). Counts + exact decimal sums. */
  val fnTimeBucket: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").cast("timestamp_ntz").as("bucket_start"),
              col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("bucket_start"), col("event_type"))

  /** F11 — regex extraction surface (`regexp_extract_all` / masking):
    * all length-≥5 word matches per document, their count, the first
    * match, non-overlapping vowel-pair occurrences, and a masked prefix
    * — the pattern layer PII scrubbing and tokenizer pre-splits build
    * on. Pure map stage over the text scan: no shuffle, codegen'd
    * regex, linear at any corpus size.
    *
    * Cross-engine contract: the patterns use only character classes and
    * bounded repetition, where Java regex (Spark) and RE2 (DuckDB)
    * agree on leftmost non-overlapping match semantics; both engines'
    * extract-all return arrays in match order, so element-1 and counts
    * are identical. The masked prefix runs on a fixed 40-char substring
    * so output width is bounded regardless of document length. */
  val fnRegexExtract: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
              size(regexp_extract_all(col("text"), lit("[a-z]{5,}"), lit(0)))
                .as("n_long_words"),
              // try_element_at, NOT element_at: ANSI element_at THROWS on
              // an empty array, so a document with no ≥5-char word (never
              // in the driver testdata; fuzz seed 42 found it) would fail
              // the whole query instead of falling to coalesce's ''.
              // DuckDB's list_extract is NULL out-of-bounds — try_ matches.
              coalesce(try_element_at(
                regexp_extract_all(col("text"), lit("[a-z]{5,}"), lit(0)),
                lit(1)), lit("")).as("first_long"),
              size(regexp_extract_all(col("text"), lit("[aeiou][aeiou]"),
                lit(0))).as("n_vowel_pairs"),
              regexp_replace(substring(col("text"), 1, 40), "[aeiou]", "*")
                .as("masked40"))
      .orderBy(col("doc_id"))

  /** F12 — URL parsing surface (the canonicalization layer every
    * web-crawl curation pipeline starts with): deterministic synthetic
    * URLs (scheme + optional www + source host + lang/path + optional
    * tracking query + optional fragment, all keyed off doc_id so both
    * engines build identical strings), then regex decomposition into
    * host / registrable core / path / query / fragment plus path depth
    * and a tracking-param flag. Pure map stage — no shuffle, codegen'd
    * regex, linear at any corpus size.
    *
    * Cross-engine contract: anchors, character classes and literal
    * escapes only — Java regex (Spark) and RE2 (DuckDB) agree on these;
    * both engines return '' for a no-match extract, and both split
    * "/a/b" into 3 elements (leading empty kept). */
  val fnUrlParse: Q = (s, d) => {
    val hostRe = "^https://([^/?#]+)"
    val pathRe = "^https://[^/?#]+(/[^?#]*)"
    val queryRe = "\\?([^#]*)"
    Tables.documents(s, d)
      .withColumn("url", concat(
        lit("https://"),
        when(col("doc_id") % 2 === 0, lit("www.")).otherwise(lit("")),
        col("source"), lit(".example.org/"), col("lang"), lit("/p"),
        col("doc_id").cast("string"),
        when(col("doc_id") % 3 === 0,
             concat(lit("?utm_source="), col("source"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit("#sec1")).otherwise(lit(""))))
      .select(col("doc_id"), col("url"),
        regexp_extract(col("url"), hostRe, 1).as("host"),
        regexp_replace(regexp_extract(col("url"), hostRe, 1), "^www\\.", "")
          .as("host_core"),
        regexp_extract(col("url"), pathRe, 1).as("path"),
        (size(split(regexp_extract(col("url"), pathRe, 1), "/")) - 1)
          .as("path_depth"),
        regexp_extract(col("url"), queryRe, 1).as("query_str"),
        regexp_extract(col("url"), "#(.*)$", 1).as("fragment"),
        when(substring(regexp_extract(col("url"), queryRe, 1), 1, 4)
               === "utm_", 1).otherwise(0).as("is_tracked"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "fn_url_parse" -> fnUrlParse,
    "fn_regex_extract" -> fnRegexExtract,
    "fn_time_bucket" -> fnTimeBucket,
    "fn_try_cast" -> fnTryCast,
    "fn_datetime_extract" -> fnDatetimeExtract,
    "fn_date_format" -> fnDateFormat,
    "fn_date_series" -> fnDateSeries,
    "fn_date_arith" -> fnDateArith,
    "fn_string_split" -> fnStringSplit,
    "fn_math" -> fnMath,
    "fn_trig" -> fnTrig,
    "fn_exp_log" -> fnExpLog)

  val oracles: Map[String, String] = Map(
    // identical synthetic URL construction and anchored class-only
    // patterns; both engines return '' on no-match and keep the leading
    // empty split element
    "fn_url_parse" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' ||
        |    CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END ||
        |    source || '.example.org/' || lang || '/p' ||
        |    CAST(doc_id AS VARCHAR) ||
        |    CASE WHEN doc_id % 3 = 0 THEN '?utm_source=' || source
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN '#sec1' ELSE '' END AS url
        |  FROM documents)
        |SELECT doc_id, url,
        |  regexp_extract(url, '^https://([^/?#]+)', 1) AS host,
        |  regexp_replace(regexp_extract(url, '^https://([^/?#]+)', 1),
        |    '^www\.', '') AS host_core,
        |  regexp_extract(url, '^https://[^/?#]+(/[^?#]*)', 1) AS path,
        |  CAST(len(string_split(
        |    regexp_extract(url, '^https://[^/?#]+(/[^?#]*)', 1), '/')) - 1
        |    AS INTEGER) AS path_depth,
        |  regexp_extract(url, '\?([^#]*)', 1) AS query_str,
        |  regexp_extract(url, '#(.*)$', 1) AS fragment,
        |  CASE WHEN substr(regexp_extract(url, '\?([^#]*)', 1), 1, 4)
        |    = 'utm_' THEN 1 ELSE 0 END AS is_tracked
        |FROM u ORDER BY doc_id""".stripMargin,
    // same class-only patterns; RE2 and Java regex agree on these
    "fn_regex_extract" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]{5,}')) AS INTEGER)
        |    AS n_long_words,
        |  coalesce(list_extract(regexp_extract_all(text, '[a-z]{5,}'), 1),
        |    '') AS first_long,
        |  CAST(len(regexp_extract_all(text, '[aeiou][aeiou]')) AS INTEGER)
        |    AS n_vowel_pairs,
        |  regexp_replace(substr(text, 1, 40), '[aeiou]', '*', 'g')
        |    AS masked40
        |FROM documents ORDER BY doc_id""".stripMargin,
    // epoch floor-division bucketing — identical alignment both engines
    "fn_time_bucket" ->
      s"""SELECT
         |  to_timestamp(CAST(floor(EXTRACT(EPOCH FROM ts) / 900) * 900
         |    AS BIGINT)) AT TIME ZONE 'UTC' AS bucket_start,
         |  event_type, CAST(count(*) AS BIGINT) AS n_events,
         |  ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "fn_try_cast" ->
      """SELECT c_custkey, c_name,
        |  TRY_CAST(c_name AS INTEGER) AS name_as_int,
        |  TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) AS INTEGER)
        |    AS digits_as_int,
        |  TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) || '9999999999'
        |    AS INTEGER) AS overflow_as_int,
        |  TRY_CAST('2024-' || CAST(c_custkey % 13 + 1 AS VARCHAR) || '-28'
        |    AS DATE) AS maybe_date
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_exp_log" ->
      """SELECT event_id,
        |  round(exp(value / 100.0), 10) AS exp_v,
        |  CASE WHEN value + 1.0 > 0
        |    THEN round(ln(value + 1.0), 10) END AS ln_v,
        |  CASE WHEN value + 1.0 > 0
        |    THEN round(log10(value + 1.0), 10) END AS log10_v,
        |  CASE WHEN value + 1.0 > 0
        |    THEN round(log2(value + 1.0), 10) END AS log2_v,
        |  CASE WHEN value >= 0
        |    THEN round(pow(value, 0.5), 10) END AS pow_half
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_trig" ->
      """SELECT event_id,
        |  round(sin(value), 10) AS sin_v,
        |  round(cos(value), 10) AS cos_v,
        |  round(atan(value), 10) AS atan_v,
        |  round(atan2(value, 100.0), 10) AS atan2_v,
        |  value * pi() / 180.0 AS rad_v,
        |  value * 180.0 / pi() AS deg_v
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_datetime_extract" ->
      """SELECT event_id,
        |  CAST(EXTRACT(YEAR FROM ts) AS INTEGER) AS y,
        |  CAST(EXTRACT(QUARTER FROM ts) AS INTEGER) AS q,
        |  CAST(EXTRACT(MONTH FROM ts) AS INTEGER) AS mon,
        |  CAST(EXTRACT(WEEK FROM ts) AS INTEGER) AS iso_week,
        |  CAST(EXTRACT(DAY FROM ts) AS INTEGER) AS dom,
        |  CAST(EXTRACT(DOW FROM ts) AS INTEGER) AS dow_pg,
        |  CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS h,
        |  CAST(EXTRACT(MINUTE FROM ts) AS INTEGER) AS mi,
        |  CAST(floor(EXTRACT(EPOCH FROM ts)) AS BIGINT) AS epoch_s,
        |  date_trunc('hour', ts) AS ts_hour
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_date_format" ->
      """SELECT day,
        |  CAST(strftime(day, '%Y%m%d') AS INTEGER) AS date_key,
        |  strftime(day, '%B') AS month_name,
        |  strftime(day, '%A') AS day_name
        |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders)
        |ORDER BY date_key""".stripMargin,
    "fn_date_series" ->
      """SELECT spine.day, CAST(coalesce(daily.n_events, 0) AS BIGINT) AS n_events
        |FROM (SELECT DATE '2024-01-01' + CAST(i AS INTEGER) AS day
        |      FROM range(31) t(i)) spine
        |LEFT JOIN (SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
        |           FROM events GROUP BY 1) daily ON spine.day = daily.day
        |ORDER BY spine.day""".stripMargin,
    "fn_date_arith" ->
      """SELECT event_id,
        |  ts + INTERVAL 7 DAY AS ts_plus7d,
        |  ts - INTERVAL 90 MINUTE AS ts_minus90m,
        |  CAST(ts AS DATE) - 7 AS day_minus7,
        |  CAST(ts AS DATE) + 30 AS day_plus30
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_string_split" ->
      """SELECT event_id, strftime(ts, '%H:%M:%S') AS tstr,
        |  CAST(string_split(strftime(ts, '%H:%M:%S'), ':')[1] AS INTEGER) * 3600 +
        |  CAST(string_split(strftime(ts, '%H:%M:%S'), ':')[2] AS INTEGER) * 60 +
        |  CAST(string_split(strftime(ts, '%H:%M:%S'), ':')[3] AS INTEGER) AS secs
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  greatest(l_quantity, 25.0) AS g25,
        |  least(l_quantity, 25.0) AS l25,
        |  round(abs(l_quantity - 25.0), 2) AS abs_dev,
        |  CASE WHEN l_extendedprice >= 0
        |    THEN round(sqrt(l_extendedprice), 4) END AS sqrt_price,
        |  nullif(l_tax, 0.0) AS tax_or_null,
        |  CAST(floor(l_quantity / 15) * 15 AS INTEGER) AS qty_bucket
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, sqrt_price""".stripMargin)
}
