package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series analytics over the event stream: gap-filled resampling,
  * per-series trend fitting, and an A/B contingency test — the
  * reporting layer a production event pipeline runs downstream of the
  * interval counts (reference semantics: the same "count events over
  * aligned time buckets" family as kafka-storm-starter's rolling-count
  * bolts, extended to the dense/aligned form analytic consumers need).
  *
  * Scale notes:
  *   - The calendar scaffold (series keys × days) is |keys|·|span|
  *     rows — a metadata-sized frame built from a 1-row min/max
  *     aggregate broadcast (the approved 1-row cross-join pattern, see
  *     PlanLintSpec), NEVER a per-event explode. The raw events are
  *     touched exactly once, by the map-side-combinable daily count.
  *   - Regression reduces each series to five integer sums
  *     (n, Σx, Σy, Σxx, Σxy) — partial-aggregated before the one
  *     shuffle on the series key; the closed-form OLS division happens
  *     on the final |keys|-row frame. Integer sums keep both engines
  *     bit-identical until the final double division (round 6).
  *   - The chi-square test aggregates users (one shuffle on user_id,
  *     map-side combinable), then 2 variant rows, then 1 output row.
  */
object TimeSeries {

  /** Gap-filled daily counts per event type over the global day span:
    * missing (type, day) cells become explicit zeros, plus a running
    * cumulative count per type. The dense/aligned series every
    * downstream chart or forecast consumer requires — a groupBy alone
    * silently drops empty days.
    */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_type", to_date($"ts").as("day"))
    val counts = ev.groupBy($"event_type", $"day").agg(count(lit(1)).as("cnt"))
    val span = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
    val scaffold = ev.select($"event_type").distinct()
      .crossJoin(broadcast(span))
      .select($"event_type",
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val byType = Window.partitionBy($"event_type").orderBy($"day")
    scaffold.join(counts, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce($"cnt", lit(0L)))
      .withColumn("cum_cnt", sum($"cnt").over(byType))
      .select($"event_type", date_format($"day", "yyyy-MM-dd").as("day"),
        $"cnt", $"cum_cnt")
  }

  val gapFillSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
      |counts AS (
      |  SELECT event_type, day, count(*) AS cnt FROM ev GROUP BY 1, 2),
      |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      |days AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span),
      |scaffold AS (
      |  SELECT t.event_type, d.day
      |  FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN days d)
      |SELECT s.event_type, strftime(s.day, '%Y-%m-%d') AS day,
      |  CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt,
      |  CAST(sum(coalesce(c.cnt, 0)) OVER (PARTITION BY s.event_type
      |    ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS cum_cnt
      |FROM scaffold s LEFT JOIN counts c
      |  ON s.event_type = c.event_type AND s.day = c.day""".stripMargin

  /** Per-type linear trend (OLS) of the gap-filled daily series:
    * y = daily count, x = day index from the global span start. The
    * five sufficient statistics are exact integer sums; slope and
    * intercept come from the closed forms
    *   slope     = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)
    *   intercept = (Σy·Σxx − Σx·Σxy) / (n·Σxx − Σx²)
    * with ONE double division each (round 6) — no iterative fit, no
    * double accumulation, engine-exact by construction. Gap days count
    * as zeros (a present-days-only fit would bias the slope upward).
    */
  def trendRegression(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_type", to_date($"ts").as("day"))
    val counts = ev.groupBy($"event_type", $"day").agg(count(lit(1)).as("cnt"))
    val span = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
    val series = ev.select($"event_type").distinct()
      .crossJoin(broadcast(span))
      .select($"event_type", $"d0",
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .join(counts, Seq("event_type", "day"), "left")
      .select($"event_type", datediff($"day", $"d0").cast("long").as("x"),
        coalesce($"cnt", lit(0L)).as("y"))
    series.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
      .select($"event_type", $"n_days",
        round(($"n_days" * $"sxy" - $"sx" * $"sy").cast("double")
          / ($"n_days" * $"sxx" - $"sx" * $"sx").cast("double"), 6).as("slope"),
        round(($"sy" * $"sxx" - $"sx" * $"sxy").cast("double")
          / ($"n_days" * $"sxx" - $"sx" * $"sx").cast("double"), 6)
          .as("intercept"))
  }

  val trendRegressionSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
      |counts AS (
      |  SELECT event_type, day, count(*) AS cnt FROM ev GROUP BY 1, 2),
      |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      |days AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day,
      |    d0
      |  FROM span),
      |series AS (
      |  SELECT t.event_type,
      |    CAST(datediff('day', d.d0, d.day) AS BIGINT) AS x,
      |    CAST(coalesce(c.cnt, 0) AS BIGINT) AS y
      |  FROM (SELECT DISTINCT event_type FROM ev) t
      |  CROSS JOIN days d
      |  LEFT JOIN counts c ON t.event_type = c.event_type AND d.day = c.day),
      |sums AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM series GROUP BY 1)
      |SELECT event_type, n AS n_days,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE)
      |    / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
      |  round(CAST(sy * sxx - sx * sxy AS DOUBLE)
      |    / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS intercept
      |FROM sums""".stripMargin

  /** A/B contingency test: users split by a deterministic assignment
    * (user_id parity — the stand-in for a hash-bucketed experiment
    * arm), "converted" = any purchase above the value threshold; the
    * 2×2 chi-square statistic (no continuity correction) decides
    * whether arm and conversion are independent. Counts stay integer
    * through the contingency table; the statistic is one double
    * expression evaluated identically by both engines (round 6).
    */
  def abChisquare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val users = Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase" && $"value" > 180.0, 1L)
        .otherwise(0L)).as("conv"))
      .select(($"user_id" % 2 === 0).as("is_a"), $"conv")
    val cells = users.groupBy($"is_a")
      .agg(count(lit(1)).as("n"), sum($"conv").as("c"))
    cells.agg(
        sum(when($"is_a", $"n").otherwise(0L)).as("n_a"),
        sum(when($"is_a", $"c").otherwise(0L)).as("conv_a"),
        sum(when(!$"is_a", $"n").otherwise(0L)).as("n_b"),
        sum(when(!$"is_a", $"c").otherwise(0L)).as("conv_b"))
      .selectExpr("n_a", "conv_a", "n_b", "conv_b",
        "round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a",
        "round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b",
        """round(CASE WHEN conv_a + conv_b = 0
          |         OR (n_a - conv_a) + (n_b - conv_b) = 0 THEN NULL
          |  ELSE CAST(n_a + n_b AS DOUBLE)
          |    * CAST(conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a) AS DOUBLE)
          |    * CAST(conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a) AS DOUBLE)
          |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
          |       * CAST(conv_a + conv_b AS DOUBLE)
          |       * CAST((n_a - conv_a) + (n_b - conv_b) AS DOUBLE))
          |  END, 6) AS chi2""".stripMargin)
  }

  val abChisquareSql: String =
    """WITH users AS (
      |  SELECT user_id % 2 = 0 AS is_a,
      |    max(CASE WHEN event_type = 'purchase' AND "value" > 180.0
      |        THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |cells AS (
      |  SELECT is_a, count(*) AS n, sum(conv) AS c FROM users GROUP BY 1),
      |tbl AS (
      |  SELECT
      |    CAST(sum(CASE WHEN is_a THEN n ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN is_a THEN c ELSE 0 END) AS BIGINT) AS conv_a,
      |    CAST(sum(CASE WHEN NOT is_a THEN n ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN NOT is_a THEN c ELSE 0 END) AS BIGINT) AS conv_b
      |  FROM cells)
      |SELECT n_a, conv_a, n_b, conv_b,
      |  round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
      |  round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
      |  round(CASE WHEN conv_a + conv_b = 0
      |           OR (n_a - conv_a) + (n_b - conv_b) = 0 THEN NULL
      |    ELSE CAST(n_a + n_b AS DOUBLE)
      |      * CAST(conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a) AS DOUBLE)
      |      * CAST(conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a) AS DOUBLE)
      |      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      |         * CAST(conv_a + conv_b AS DOUBLE)
      |         * CAST((n_a - conv_a) + (n_b - conv_b) AS DOUBLE))
      |    END, 6) AS chi2
      |FROM tbl""".stripMargin

  /** Weekly cohort-retention matrix — the classic growth-analytics
    * triangle [[EventOps.retention]] does NOT give (that one merges all
    * cohorts into a single day-offset curve): users are cohorted by
    * first-active ISO week, and each (cohort, week-offset) cell reports
    * distinct active users plus the rate against the cohort's size.
    * Both engines truncate to Monday-start weeks, and the offset is an
    * exact integer day-difference div 7.
    *
    * Scale: one distinct over (user, week) — the only user-keyed
    * shuffle; cohorts come from a partial-aggregated min; the matrix is
    * |weeks|² cells regardless of event volume.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val weeks = Tables.events(s, dir)
      .select($"user_id", to_date(date_trunc("week", $"ts")).as("week"))
      .distinct()
    val first = weeks.groupBy($"user_id").agg(min($"week").as("cohort"))
    val sizes = first.groupBy($"cohort").agg(count(lit(1)).as("cohort_size"))
    weeks.join(first, "user_id")
      .select($"cohort", expr("datediff(week, cohort) div 7").as("week_offset"),
        $"user_id")
      .groupBy($"cohort", $"week_offset")
      .agg(countDistinct($"user_id").as("n_active"))
      .join(sizes, "cohort")
      .select(date_format($"cohort", "yyyy-MM-dd").as("cohort"),
        $"week_offset".cast("int").as("week_offset"), $"n_active",
        $"cohort_size",
        round($"n_active".cast("double") / $"cohort_size", 6).as("retention"))
  }

  val cohortRetentionSql: String =
    """WITH weeks AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS week
      |  FROM events),
      |first AS (
      |  SELECT user_id, min(week) AS cohort FROM weeks GROUP BY user_id),
      |sizes AS (
      |  SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
      |  FROM first GROUP BY cohort),
      |cells AS (
      |  SELECT f.cohort,
      |    CAST(datediff('day', f.cohort, w.week) // 7 AS INT) AS week_offset,
      |    CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_active
      |  FROM weeks w JOIN first f ON w.user_id = f.user_id
      |  GROUP BY 1, 2)
      |SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort, c.week_offset,
      |  c.n_active, s.cohort_size,
      |  round(CAST(c.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
      |FROM cells c JOIN sizes s ON c.cohort = s.cohort""".stripMargin

  /** Rolling z-score anomaly flags over the gap-filled daily series —
    * the alerting pass on top of [[gapFill]]: each day scored against
    * its trailing 7-day window (inclusive), anomalous when |z| > 2.
    * The z-score algebra is arranged so EVERYTHING except one sqrt and
    * one division is exact integer arithmetic:
    *   z = (n·y − S) / √(n·(n·Q − S²))  ... × √n / √n, with S=Σy, Q=Σy²
    * (derivation: (y−S/n) / (√(nQ−S²)/n) — population std over the
    * frame). Zero-variance frames → NULL z, non-anomalous. Same single
    * event_type shuffle as the gap fill; the window is ROWS-bounded so
    * state per series is 7 rows regardless of history length.
    */
  def anomalyZscore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_type", to_date($"ts").as("day"))
    val counts = ev.groupBy($"event_type", $"day").agg(count(lit(1)).as("cnt"))
    val span = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
    val scaffold = ev.select($"event_type").distinct()
      .crossJoin(broadcast(span))
      .select($"event_type",
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val series = scaffold.join(counts, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce($"cnt", lit(0L)))
    val w = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(-6, 0)
    series
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum($"cnt").over(w))
      .withColumn("q", sum($"cnt" * $"cnt").over(w))
      .selectExpr("event_type", "date_format(day, 'yyyy-MM-dd') AS day", "cnt",
        """round(CASE WHEN n * q - s * s = 0 THEN NULL
          |  ELSE CAST(n * cnt - s AS DOUBLE)
          |    / sqrt(CAST(n * (n * q - s * s) AS DOUBLE))
          |  END, 6) AS z""".stripMargin)
      .selectExpr("event_type", "day", "cnt", "z",
        "CASE WHEN z IS NULL THEN false ELSE abs(z) > 2.0 END AS is_anomaly")
  }

  val anomalyZscoreSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
      |counts AS (
      |  SELECT event_type, day, count(*) AS cnt FROM ev GROUP BY 1, 2),
      |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      |days AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span),
      |series AS (
      |  SELECT t.event_type, d.day,
      |    CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
      |  FROM (SELECT DISTINCT event_type FROM ev) t
      |  CROSS JOIN days d
      |  LEFT JOIN counts c ON t.event_type = c.event_type AND d.day = c.day),
      |winstats AS (
      |  SELECT event_type, day, cnt,
      |    CAST(count(*) OVER w AS BIGINT) AS n,
      |    CAST(sum(cnt) OVER w AS BIGINT) AS s,
      |    CAST(sum(cnt * cnt) OVER w AS BIGINT) AS q
      |  FROM series
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
      |scored AS (
      |  SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cnt,
      |    round(CASE WHEN n * q - s * s = 0 THEN NULL
      |      ELSE CAST(n * cnt - s AS DOUBLE)
      |        / sqrt(CAST(n * (n * q - s * s) AS DOUBLE))
      |      END, 6) AS z
      |  FROM winstats)
      |SELECT event_type, day, cnt, z,
      |  CASE WHEN z IS NULL THEN false ELSE abs(z) > 2.0 END AS is_anomaly
      |FROM scored""".stripMargin

  /** Semi-structured property extraction through Spark 4's VARIANT type
    * — `parse_json` once into the binary variant encoding, then typed
    * path access (`variant_get`), the schema-on-read shape for ragged
    * event properties. Narrow map + one aggregate; variant decode is
    * columnar and never reparses the JSON text per access at scale
    * (parse once, extract many). The oracle restates the same paths
    * with DuckDB's JSON accessors.
    */
  def variantProps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .selectExpr("event_type",
        "variant_get(try_parse_json(props), '$.k', 'int') AS k")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"k".isNull, 1L).otherwise(0L)).as("n_missing"),
        sum($"k".cast("long")).as("sum_k"),
        sum(when($"k" >= 50, 1L).otherwise(0L)).as("n_high"))
      .withColumn("avg_k",
        round($"sum_k".cast("double") / ($"n" - $"n_missing"), 6))
  }

  val variantPropsSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_missing,
      |  CAST(sum(k) AS BIGINT) AS sum_k,
      |  CAST(sum(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      |  round(CAST(sum(k) AS DOUBLE)
      |    / (count(*) - sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END)), 6)
      |    AS avg_k
      |FROM (
      |  SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |  FROM events)
      |GROUP BY event_type""".stripMargin

  /** MapType round-trip — the per-entity feature-map shape (entity →
    * {feature: value}) built with map_from_entries over a
    * DETERMINISTICALLY ORDERED entry list (sort_array before the map
    * build: collect_list order is partition-dependent, and a map built
    * from an unordered list would make the query nondeterministic even
    * though map lookup semantics wouldn't care), then consumed by typed
    * lookups. The oracle restates the lookups as conditional
    * aggregates — proving the map plumbing preserves exactly the
    * underlying group-by.
    */
  def typeMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("cnt"))
      .groupBy($"user_id")
      .agg(map_from_entries(
        sort_array(collect_list(struct($"event_type", $"cnt")))).as("m"))
      .select($"user_id", size($"m").as("n_types"),
        coalesce(element_at($"m", "click"), lit(0L)).as("clicks"),
        coalesce(element_at($"m", "purchase"), lit(0L)).as("purchases"))
  }

  val typeMapSql: String =
    """SELECT user_id,
      |  CAST(count(DISTINCT event_type) AS INT) AS n_types,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS clicks,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS purchases
      |FROM events GROUP BY user_id""".stripMargin

  /** Cumulative distinct users to date — the growth curve. The naive
    * form (COUNT(DISTINCT user) OVER an expanding frame) re-scans every
    * prefix and holds per-frame distinct state; the scalable identity
    * is: distinct-to-date(d) = #users whose FIRST day ≤ d. One
    * user-keyed min, one tiny per-day count, one running sum over the
    * gap-filled calendar (so days with no new users still emit the
    * carried total). This is the textbook rewrite every metrics
    * pipeline ships.
    */
  def cumulativeUsers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", to_date($"ts").as("day"))
    val firstDay = ev.groupBy($"user_id").agg(min($"day").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("new_users"))
    val span = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
    val days = span.select(
      explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(firstDay, Seq("day"), "left")
      .withColumn("new_users", coalesce($"new_users", lit(0L)))
      .withColumn("users_to_date", sum($"new_users").over(w))
      .select(date_format($"day", "yyyy-MM-dd").as("day"), $"new_users",
        $"users_to_date")
  }

  val cumulativeUsersSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |fd AS (
      |  SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM (
      |    SELECT user_id, min(day) AS day FROM ev GROUP BY user_id)
      |  GROUP BY day),
      |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      |days AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span)
      |SELECT strftime(d.day, '%Y-%m-%d') AS day,
      |  CAST(coalesce(f.new_users, 0) AS BIGINT) AS new_users,
      |  CAST(sum(coalesce(f.new_users, 0)) OVER (ORDER BY d.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS users_to_date
      |FROM days d LEFT JOIN fd f ON d.day = f.day""".stripMargin

  /** Kaplan–Meier survival for time-to-first-purchase with right
    * censoring — the survival-analysis shape (churn, conversion-latency,
    * reliability) none of the other analytics cover: each user either
    * converts on their first purchase day (event) or is censored at
    * their last-seen day; S(t) = Π_{s≤t} (1 − d_s/n_s) with n_s = users
    * still at risk (reverse running sum over the calendar).
    *
    * Determinism: the product is computed as exp(Σ ln(1 − d/n)) with
    * each ln term rounded to 9 dp and summed as DECIMAL (the pagerank
    * convention for iterated float arithmetic) — identical on both
    * engines; a day with d = n absorbs S to exactly 0 via a CASE, never
    * through ln(0). Everything upstream is integer counts over one
    * user-keyed aggregate plus the day scaffold.
    */
  def survivalKm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", $"event_type", to_date($"ts").as("day"))
    val users = ev.groupBy($"user_id")
      .agg(min(when($"event_type" === "purchase", $"day")).as("fp_day"),
        max($"day").as("last_day"))
      .select(coalesce($"fp_day", $"last_day").as("obs_day"),
        when($"fp_day".isNotNull, 1L).otherwise(0L).as("event"))
    val daily = users.groupBy($"obs_day")
      .agg(sum($"event").as("d"), sum(lit(1L) - $"event").as("c"))
    val span = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
    val days = span.select(
      explode(expr("sequence(d0, d1, interval 1 day)")).as("obs_day"))
    val riskW = Window.orderBy($"obs_day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cumW = Window.orderBy($"obs_day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(daily, Seq("obs_day"), "left")
      .select($"obs_day", coalesce($"d", lit(0L)).as("d"),
        coalesce($"c", lit(0L)).as("c"))
      .withColumn("n_at_risk", sum($"d" + $"c").over(riskW))
      .withColumn("lnterm",
        when($"n_at_risk" > 0 && $"d" < $"n_at_risk",
          round(log(lit(1.0) - $"d".cast("double") / $"n_at_risk"), 9)
            .cast("decimal(18,9)"))
          .otherwise(lit(0).cast("decimal(18,9)")))
      .withColumn("absorbed",
        max(when($"d" > 0 && $"d" === $"n_at_risk", 1L).otherwise(0L))
          .over(cumW))
      .withColumn("survival",
        when($"absorbed" === 1L, lit(0.0)).otherwise(
          round(exp(sum($"lnterm").over(cumW).cast("double")), 6)))
      .select(date_format($"obs_day", "yyyy-MM-dd").as("day"),
        $"n_at_risk", $"d", $"c", $"survival")
  }

  val survivalKmSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(ts AS DATE) AS day FROM events),
      |users AS (
      |  SELECT coalesce(fp_day, last_day) AS obs_day,
      |    CASE WHEN fp_day IS NOT NULL THEN 1 ELSE 0 END AS event
      |  FROM (
      |    SELECT user_id,
      |      min(CASE WHEN event_type = 'purchase' THEN day END) AS fp_day,
      |      max(day) AS last_day
      |    FROM ev GROUP BY user_id)),
      |daily AS (
      |  SELECT obs_day, CAST(sum(event) AS BIGINT) AS d,
      |    CAST(sum(1 - event) AS BIGINT) AS c
      |  FROM users GROUP BY obs_day),
      |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      |days AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
      |    AS obs_day FROM span),
      |base AS (
      |  SELECT dy.obs_day, coalesce(da.d, 0) AS d, coalesce(da.c, 0) AS c
      |  FROM days dy LEFT JOIN daily da ON da.obs_day = dy.obs_day),
      |risk AS (
      |  SELECT obs_day, d, c,
      |    CAST(sum(d + c) OVER (ORDER BY obs_day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
      |      AS n_at_risk
      |  FROM base),
      |scored AS (
      |  SELECT obs_day, d, c, n_at_risk,
      |    CASE WHEN n_at_risk > 0 AND d < n_at_risk
      |      THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_at_risk), 9)
      |        AS DECIMAL(18,9))
      |      ELSE CAST(0 AS DECIMAL(18,9)) END AS lnterm,
      |    max(CASE WHEN d > 0 AND d = n_at_risk THEN 1 ELSE 0 END)
      |      OVER (ORDER BY obs_day
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS absorbed
      |  FROM risk)
      |SELECT strftime(obs_day, '%Y-%m-%d') AS day,
      |  n_at_risk, d, c,
      |  CASE WHEN absorbed = 1 THEN 0.0
      |    ELSE round(exp(CAST(sum(lnterm) OVER (ORDER BY obs_day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6)
      |  END AS survival
      |FROM scored""".stripMargin

  /** Rolling 7-day Pearson correlation between two event series (daily
    * clicks vs daily purchases) — the co-movement monitor a metrics
    * pipeline runs next to the per-series z-scores: all six sufficient
    * statistics are integer sums over the ROWS-bounded window (gap
    * days as explicit zeros, same scaffold as [[gapFill]]), so the only
    * doubles are two sqrts and one division in the same expression
    * order both engines evaluate (round 6; degenerate zero-variance
    * windows → NULL).
    */
  def movingCorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .where($"event_type".isin("click", "purchase"))
      .select($"event_type", to_date($"ts").as("day"))
    val counts = ev.groupBy($"day")
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
    val span = Tables.events(s, dir)
      .agg(min(to_date($"ts")).as("d0"), max(to_date($"ts")).as("d1"))
    val days = span.select(
      explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = Window.orderBy($"day").rowsBetween(-6, 0)
    days.join(counts, Seq("day"), "left")
      .select($"day", coalesce($"x", lit(0L)).as("x"),
        coalesce($"y", lit(0L)).as("y"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum($"x").over(w))
      .withColumn("sy", sum($"y").over(w))
      .withColumn("sxx", sum($"x" * $"x").over(w))
      .withColumn("syy", sum($"y" * $"y").over(w))
      .withColumn("sxy", sum($"x" * $"y").over(w))
      .selectExpr("date_format(day, 'yyyy-MM-dd') AS day", "x", "y",
        """round(CASE WHEN n * sxx - sx * sx = 0
          |         OR n * syy - sy * sy = 0 THEN NULL
          |  ELSE CAST(n * sxy - sx * sy AS DOUBLE)
          |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
          |       * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
          |  END, 6) AS rolling_corr""".stripMargin)
  }

  val movingCorrSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day FROM events
      |  WHERE event_type IN ('click', 'purchase')),
      |counts AS (
      |  SELECT day,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM ev GROUP BY day),
      |span AS (
      |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      |  FROM events),
      |days AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
      |    AS day FROM span),
      |series AS (
      |  SELECT d.day, coalesce(c.x, 0) AS x, coalesce(c.y, 0) AS y
      |  FROM days d LEFT JOIN counts c ON c.day = d.day),
      |winstats AS (
      |  SELECT day, x, y,
      |    CAST(count(*) OVER w AS BIGINT) AS n,
      |    CAST(sum(x) OVER w AS BIGINT) AS sx,
      |    CAST(sum(y) OVER w AS BIGINT) AS sy,
      |    CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
      |    CAST(sum(y * y) OVER w AS BIGINT) AS syy,
      |    CAST(sum(x * y) OVER w AS BIGINT) AS sxy
      |  FROM series
      |  WINDOW w AS (ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT strftime(day, '%Y-%m-%d') AS day, x, y,
      |  round(CASE WHEN n * sxx - sx * sx = 0
      |           OR n * syy - sy * sy = 0 THEN NULL
      |    ELSE CAST(n * sxy - sx * sy AS DOUBLE)
      |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |         * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
      |    END, 6) AS rolling_corr
      |FROM winstats""".stripMargin

  /** CUPED variance reduction for the A/B test — the covariate
    * adjustment every mature experimentation platform applies before
    * the significance test ([[abChisquare]] is the raw test; this is
    * the power upgrade): pre-period purchase counts as the covariate x,
    * experiment-period counts as the metric y,
    * θ = cov(x,y)/var(x) pooled, y_adj = y − θ·(x − x̄). Per arm the
    * report derives mean/variance of both raw and adjusted metrics FROM
    * INTEGER SUFFICIENT STATISTICS only (n, Σx, Σy, Σxx, Σyy, Σxy per
    * arm + global) — θ and the algebra run as one identical double
    * expression on both engines; var(y_adj) uses the closed form
    * var(y) − 2θ·cov + θ²·var(x), never a second data pass.
    */
  def abCuped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val SplitNs = 1705276800000000000L // 2024-01-15T00:00:00Z
    val users = Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(sum(when($"event_type" === "purchase" && $"ts_ns" < SplitNs, 1L)
        .otherwise(0L)).as("x"),
        sum(when($"event_type" === "purchase" && $"ts_ns" >= SplitNs, 1L)
          .otherwise(0L)).as("y"))
      .select(($"user_id" % 2).cast("int").as("arm"), $"x", $"y")
    val g = users.agg(count(lit(1)).as("ng"), sum($"x").as("sxg"),
      sum($"y").as("syg"), sum($"x" * $"x").as("sxxg"),
      sum($"x" * $"y").as("sxyg"))
    users.groupBy($"arm")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
        sum($"x" * $"y").as("sxy"))
      .crossJoin(broadcast(g))
      .selectExpr("arm", "n",
        "round(CAST(sy AS DOUBLE) / n, 6) AS mean_y",
        """round(CAST(sy AS DOUBLE) / n
          | - (CAST(ng * sxyg - sxg * syg AS DOUBLE)
          |    / CAST(ng * sxxg - sxg * sxg AS DOUBLE))
          |   * (CAST(sx AS DOUBLE) / n - CAST(sxg AS DOUBLE) / ng), 6)
          | AS mean_y_adj""".stripMargin,
        "round(CAST(n * syy - sy * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6) AS var_y",
        """round(CAST(n * syy - sy * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n)
          | - 2 * (CAST(ng * sxyg - sxg * syg AS DOUBLE)
          |        / CAST(ng * sxxg - sxg * sxg AS DOUBLE))
          |     * (CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n))
          | + (CAST(ng * sxyg - sxg * syg AS DOUBLE)
          |    / CAST(ng * sxxg - sxg * sxg AS DOUBLE))
          |   * (CAST(ng * sxyg - sxg * syg AS DOUBLE)
          |      / CAST(ng * sxxg - sxg * sxg AS DOUBLE))
          |   * (CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * n)), 6)
          | AS var_y_adj""".stripMargin)
  }

  val abCupedSql: String =
    """WITH users AS (
      |  SELECT CAST(user_id % 2 AS INT) AS arm,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      AND epoch_us(ts) * 1000 < 1705276800000000000
      |      THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      AND epoch_us(ts) * 1000 >= 1705276800000000000
      |      THEN 1 ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY user_id),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS ng, CAST(sum(x) AS BIGINT) AS sxg,
      |    CAST(sum(y) AS BIGINT) AS syg, CAST(sum(x * x) AS BIGINT) AS sxxg,
      |    CAST(sum(x * y) AS BIGINT) AS sxyg
      |  FROM users),
      |arms AS (
      |  SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy, CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM users GROUP BY arm)
      |SELECT arm, n,
      |  round(CAST(sy AS DOUBLE) / n, 6) AS mean_y,
      |  round(CAST(sy AS DOUBLE) / n
      |    - (CAST(ng * sxyg - sxg * syg AS DOUBLE)
      |       / CAST(ng * sxxg - sxg * sxg AS DOUBLE))
      |      * (CAST(sx AS DOUBLE) / n - CAST(sxg AS DOUBLE) / ng), 6)
      |    AS mean_y_adj,
      |  round(CAST(n * syy - sy * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6) AS var_y,
      |  round(CAST(n * syy - sy * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n)
      |    - 2 * (CAST(ng * sxyg - sxg * syg AS DOUBLE)
      |           / CAST(ng * sxxg - sxg * sxg AS DOUBLE))
      |        * (CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n))
      |    + (CAST(ng * sxyg - sxg * syg AS DOUBLE)
      |       / CAST(ng * sxxg - sxg * sxg AS DOUBLE))
      |      * (CAST(ng * sxyg - sxg * syg AS DOUBLE)
      |         / CAST(ng * sxxg - sxg * sxg AS DOUBLE))
      |      * (CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * n)), 6)
      |    AS var_y_adj
      |FROM arms CROSS JOIN g""".stripMargin

  /** Day-of-week seasonal indices — the decomposition-lite profile
    * behind every "weekday vs weekend" capacity/alerting adjustment:
    * per (event_type, ISO weekday), the mean daily volume relative to
    * the type's overall mean daily volume. Both means are exact
    * integer ratios (events on that weekday / occurrences of that
    * weekday in the span), so the index is one identical double
    * expression (round 6). The calendar scaffold counts weekday
    * occurrences including zero-event days — a groupBy over event days
    * alone would bias the index up.
    */
  def seasonalityDow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_type", to_date($"ts").as("day"))
    val span = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
    val dowDays = span
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .select(dayofweek($"day").as("dow"))
      .groupBy($"dow").agg(count(lit(1)).as("n_days"))
    val total = ev.groupBy($"event_type").agg(count(lit(1)).as("tot"))
    val totalDays = span.selectExpr("datediff(d1, d0) + 1 AS span_days")
    ev.select($"event_type", dayofweek($"day").as("dow"))
      .groupBy($"event_type", $"dow").agg(count(lit(1)).as("cnt"))
      .join(dowDays, "dow")
      .join(total, "event_type")
      .crossJoin(broadcast(totalDays))
      .selectExpr("event_type", "dow", "cnt", "n_days",
        """round((CAST(cnt AS DOUBLE) / n_days)
          | / (CAST(tot AS DOUBLE) / span_days), 6) AS seasonal_index""".stripMargin)
  }

  val seasonalityDowSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
      |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      |dd AS (
      |  SELECT dayofweek(day) + 1 AS dow, CAST(count(*) AS BIGINT) AS n_days
      |  FROM (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
      |    AS DATE) AS day FROM span)
      |  GROUP BY 1),
      |tot AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS tot FROM ev GROUP BY 1),
      |sd AS (SELECT datediff('day', d0, d1) + 1 AS span_days FROM span)
      |SELECT e.event_type, CAST(dayofweek(e.day) + 1 AS INT) AS dow,
      |  CAST(count(*) AS BIGINT) AS cnt, d.n_days,
      |  round((CAST(count(*) AS DOUBLE) / d.n_days)
      |    / (CAST(t.tot AS DOUBLE) / sd.span_days), 6) AS seasonal_index
      |FROM ev e
      |JOIN dd d ON d.dow = dayofweek(e.day) + 1
      |JOIN tot t ON t.event_type = e.event_type
      |CROSS JOIN sd
      |GROUP BY e.event_type, dayofweek(e.day) + 1, d.n_days, t.tot, sd.span_days""".stripMargin

  /** Zero-initialized EWMA of daily event volume per type:
    * e(t) = Σ_{k≥0} 0.5^(k+1) · cnt(t-k), truncated at 20 days back
    * (0.5^21 < 5·10⁻⁷ — the bounded-state form a streaming engine holds
    * anyway). The smoothing is time-aware: the exponent is the CALENDAR
    * day gap, so a quiet day genuinely halves the average rather than
    * being skipped over.
    *
    * Cross-engine exactness WITHOUT per-term rounding: 0.5^k has an
    * exact 20-digit decimal expansion, so the weights ship as decimal
    * LITERALS (one Scala BigDecimal source generates both the Spark
    * array and the oracle's list) and every term is
    * DECIMAL(8,0)·DECIMAL(28,20) → DECIMAL(37,20), exact on both
    * engines; only the final per-cell sum is rounded (scale 9, the
    * pagerank convention) and cast to double. The plan is one
    * daily-count aggregate, a constant ×20 narrow explode of the
    * |types|·|days| count table (NOT of raw events), and one re-keyed
    * aggregate — no window over doubles, no pow(), no double sums.
    */
  val EwmaLookback = 20

  private val ewmaWeights: Seq[String] = (1 to EwmaLookback).map(k =>
    (BigDecimal(1) / BigDecimal(2).pow(k)).bigDecimal.toPlainString)

  def ewmaDaily(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_type", to_date($"ts").as("day"))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).cast("decimal(8,0)").as("cnt"))
    ewmaFromCounts(ev)
  }

  /** EWMA finalize from a zero-gap (event_type, day DATE,
    * cnt DECIMAL(8,0)) count table — shared verbatim by the batch query
    * and `stream_ewma` (whose drained per-day counter state closes
    * through it), the lambda contract for this family.
    */
  private[graft] def ewmaFromCounts(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val wArr = array(ewmaWeights.map(w => lit(w).cast("decimal(28,20)")): _*)
    val mx = ev.agg(max($"day").as("dmax"))
    ev.select($"event_type", $"day", $"cnt",
        explode(sequence(lit(0), lit(EwmaLookback - 1))).as("k"))
      .select($"event_type", expr("date_add(day, k)").as("day2"),
        ($"cnt" * element_at(wArr, $"k" + 1)).as("term"))
      .crossJoin(broadcast(mx))
      .where($"day2" <= $"dmax")
      .groupBy($"event_type", $"day2")
      // the exact decimal sum is rounded to scale 9 BEFORE the double
      // cast: scale-20 decimals convert to double through a hugeint
      // multiply in DuckDB (off-by-one-ulp vs Spark's BigDecimal
      // conversion), while scale ≤ 9 conversions are the proven-green
      // pagerank convention
      .agg(round(sum($"term"), 9).cast("double").as("ewma_cnt"))
      .select($"event_type",
        date_format($"day2", "yyyy-MM-dd").as("day"), $"ewma_cnt")
  }

  val ewmaDailySql: String = {
    val wList = ewmaWeights.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH ev AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(count(*) AS DECIMAL(8,0)) AS cnt
       |  FROM events GROUP BY 1, 2),
       |mx AS (SELECT max(day) AS dmax FROM ev),
       |contrib AS (
       |  SELECT event_type, day + CAST(k AS INTEGER) AS day2,
       |    cnt * CAST($wList[k + 1] AS DECIMAL(28,20)) AS term
       |  FROM ev CROSS JOIN (SELECT unnest(range(0, $EwmaLookback)) AS k) o)
       |SELECT event_type, strftime(day2, '%Y-%m-%d') AS day,
       |  CAST(round(sum(term), 9) AS DOUBLE) AS ewma_cnt
       |FROM contrib CROSS JOIN mx
       |WHERE day2 <= dmax
       |GROUP BY 1, 2""".stripMargin
  }

  /** CUSUM changepoint detection per event-type daily series — the
    * level-shift locator every pipeline-health dashboard runs when a
    * source starts over- or under-delivering. The statistic stays
    * EXACT integers until the final normalization: for counts x_1..x_n
    * with total T, the cumulative deviation Σ_{i≤k}(x_i − T/n) scaled
    * by n is n·prefix_k − k·T — two longs per row from one running-sum
    * window over the zero-filled calendar scaffold ([[anomalyZscore]]'s
    * shape: the scaffold is |types|·|days| metadata-sized rows, the raw
    * events are touched once by a map-side-combinable count). The
    * changepoint is argmax_k |scaled_k| over interior prefixes
    * (k < n — the full-series prefix is identically 0), earliest day on
    * ties, via one row_number window; the reported magnitude divides by
    * n only at the end (floor-round 6 — the cross-engine convention).
    * At 100 TB: one count aggregate + two windows per type partition —
    * no pass is ever quadratic in days and nothing leaves the cluster.
    */
  def changepoint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.events(s, dir)
      .select($"event_type", to_date($"ts").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("cnt"))
    changepointFromCounts(counts)
  }

  /** Changepoint finalize from a sparse (event_type, day DATE, cnt)
    * count table: zero-fill over the global span, then the CUSUM
    * argmax — shared verbatim by the batch query and
    * `stream_changepoint` (whose drained per-day counter state closes
    * through it). The span/type universe derived from the counts
    * equals the one derived from raw events: every type has ≥ 1 row
    * and the global min/max day is attained by some count row.
    */
  private[graft] def changepointFromCounts(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    val span = counts.agg(min($"day").as("d0"), max($"day").as("d1"))
    val scaffold = counts.select($"event_type").distinct()
      .crossJoin(broadcast(span))
      .select($"event_type",
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val series = scaffold.join(counts, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce($"cnt", lit(0L)))
    cusumPeak(series)
  }

  /** CUSUM argmax over a zero-filled (event_type, day, cnt) series —
    * the engine behind [[changepoint]], factored so specs can plant a
    * known level shift.
    */
  def cusumPeak(series: DataFrame): DataFrame = {
    val s = series.sparkSession
    import s.implicits._
    val byType = Window.partitionBy($"event_type")
    val ordered = byType.orderBy($"day")
    val scored = series
      .withColumn("k", row_number().over(ordered))
      .withColumn("prefix", sum($"cnt").over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("total", sum($"cnt").over(byType))
      .withColumn("scaled", $"n" * $"prefix" - $"k" * $"total")
      .where($"k" < $"n")
    scored
      .withColumn("rn", row_number().over(byType.orderBy(
        abs($"scaled").desc, $"day".asc)))
      .where($"rn" === 1)
      .selectExpr("event_type",
        "date_format(day, 'yyyy-MM-dd') AS cp_day",
        "n", "total", "abs(scaled) AS peak_scaled",
        "floor(CAST(abs(scaled) AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS peak_cusum")
  }

  val changepointSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
      |counts AS (
      |  SELECT event_type, day, count(*) AS cnt FROM ev GROUP BY 1, 2),
      |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      |days AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span),
      |series AS (
      |  SELECT t.event_type, d.day,
      |    CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
      |  FROM (SELECT DISTINCT event_type FROM ev) t
      |  CROSS JOIN days d
      |  LEFT JOIN counts c ON t.event_type = c.event_type AND d.day = c.day),
      |scored AS (
      |  SELECT event_type, day,
      |    CAST(row_number() OVER w AS BIGINT) AS k,
      |    CAST(sum(cnt) OVER w AS BIGINT) AS prefix,
      |    CAST(count(*) OVER t AS BIGINT) AS n,
      |    CAST(sum(cnt) OVER t AS BIGINT) AS total
      |  FROM series
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         t AS (PARTITION BY event_type)),
      |interior AS (
      |  SELECT event_type, day, n, total,
      |    abs(n * prefix - k * total) AS a
      |  FROM scored WHERE k < n),
      |best AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY event_type ORDER BY a DESC, day ASC) AS rn
      |  FROM interior)
      |SELECT event_type, strftime(day, '%Y-%m-%d') AS cp_day,
      |  n, total, a AS peak_scaled,
      |  floor(CAST(a AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6
      |    AS peak_cusum
      |FROM best WHERE rn = 1""".stripMargin

  /** Gini coefficient of per-user activity within each event type — the
    * concentration measure behind "is this source dominated by a few
    * power users / scraper accounts". Uses the sorted-rank identity
    * G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i), but never materializes
    * per-user ranks: equal counts share a contiguous rank block, so
    * Σ i·x_i collapses to Σ_c c·(m_c·below_c + m_c(m_c+1)/2) over the
    * (type, count-value) TIE BLOCKS — the window input shrinks from
    * |users| rows to |distinct activity levels| rows per type (a
    * few hundred no matter the corpus), which is what makes the exact
    * statistic affordable at 100 TB where a per-user rank window would
    * funnel each type into one sort partition. All sums are exact
    * longs (m(m+1) is even, so the /2 is exact); the one double
    * division lands at the end under floor-round 6. The oracle
    * deliberately states the per-user row_number formulation — two
    * independent derivations, same rows (the `q_skyline_parts`
    * pattern), which is itself the proof of tie-order invariance.
    */
  def giniUsers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    giniOfCounts(Tables.events(s, dir)
      .groupBy($"event_type", $"user_id")
      .agg(count(lit(1)).as("cnt")))
  }

  /** Tie-block Gini per `event_type` group over (event_type, user_id,
    * cnt) rows — factored for planted-fixture specs.
    */
  def giniOfCounts(perUser: DataFrame): DataFrame = {
    val s = perUser.sparkSession
    import s.implicits._
    val blocks = perUser.groupBy($"event_type", $"cnt")
      .agg(count(lit(1)).as("m"))
    val cumW = Window.partitionBy($"event_type").orderBy($"cnt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    blocks
      .withColumn("below", sum($"m").over(cumW) - $"m")
      .withColumn("wblk",
        $"cnt" * ($"m" * $"below" + $"m" * ($"m" + 1) / 2))
      .groupBy($"event_type")
      .agg(sum($"m").as("n_users"), sum($"cnt" * $"m").as("total"),
        sum($"wblk").as("w"))
      .selectExpr("event_type", "n_users", "total",
        """floor(CAST(2 * w - (n_users + 1) * total AS DOUBLE)
          |  / CAST(n_users * total AS DOUBLE) * 1e6 + 0.5) / 1e6
          |  AS gini""".stripMargin)
  }

  val giniUsersSql: String =
    """WITH pu AS (
      |  SELECT event_type, user_id, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, cnt,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY cnt ASC, user_id ASC) AS BIGINT) AS i
      |  FROM pu),
      |g AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
      |    CAST(sum(cnt) AS BIGINT) AS total,
      |    CAST(sum(i * cnt) AS BIGINT) AS w
      |  FROM r GROUP BY 1)
      |SELECT event_type, n_users, total,
      |  floor(CAST(2 * w - (n_users + 1) * total AS DOUBLE)
      |    / CAST(n_users * total AS DOUBLE) * 1e6 + 0.5) / 1e6 AS gini
      |FROM g""".stripMargin

  /** Difference-in-differences — the third member of the causal-
    * inference family ([[abChisquare]] tests independence,
    * [[abCuped]] tightens variance; DiD estimates a treatment effect
    * when assignment isn't randomized over TIME): split purchase
    * revenue into the 2×2 (arm × pre/post) design — arm by the same
    * deterministic user_id parity as the A/B tests, period at the
    * mid-month boundary — and report each cell's exact-decimal mean
    * plus the interaction did = (treat_post − treat_pre) −
    * (ctrl_post − ctrl_pre). One map-side-combinable 4-cell aggregate;
    * the estimator is five two-operand IEEE ops on four exact-decimal
    * means, floor-pinned at 6 dp.
    */
  def didEstimator(s: SparkSession, dir: String): DataFrame =
    didOf(Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .selectExpr("user_id % 2 = 0 AS treat",
        "ts >= TIMESTAMP '2024-01-16 00:00:00' AS post", "value"))

  /** DiD over any (treat, post, value) frame — factored for
    * planted-fixture specs.
    */
  def didOf(obs: DataFrame): DataFrame = {
    val s = obs.sparkSession
    import s.implicits._
    val cells = obs
      .groupBy($"treat", $"post")
      .agg(count(lit(1)).as("n"), Exact.dsum($"value").as("sv"))
    cells.agg(
        sum(when($"treat" && $"post", $"n")).as("n_tp"),
        sum(when($"treat" && $"post", $"sv")).as("s_tp"),
        sum(when($"treat" && !$"post", $"n")).as("n_tr"),
        sum(when($"treat" && !$"post", $"sv")).as("s_tr"),
        sum(when(!$"treat" && $"post", $"n")).as("n_cp"),
        sum(when(!$"treat" && $"post", $"sv")).as("s_cp"),
        sum(when(!$"treat" && !$"post", $"n")).as("n_cr"),
        sum(when(!$"treat" && !$"post", $"sv")).as("s_cr"))
      .selectExpr("n_tp", "n_tr", "n_cp", "n_cr",
        "floor(s_tp / n_tp * 1e6 + 0.5) / 1e6 AS mean_treat_post",
        "floor(s_tr / n_tr * 1e6 + 0.5) / 1e6 AS mean_treat_pre",
        "floor(s_cp / n_cp * 1e6 + 0.5) / 1e6 AS mean_ctrl_post",
        "floor(s_cr / n_cr * 1e6 + 0.5) / 1e6 AS mean_ctrl_pre",
        """floor(((s_tp / n_tp - s_tr / n_tr) - (s_cp / n_cp - s_cr / n_cr))
          |  * 1e6 + 0.5) / 1e6 AS did""".stripMargin)
  }

  val didEstimatorSql: String =
    """WITH cells AS (
      |  SELECT user_id % 2 = 0 AS treat,
      |    ts >= TIMESTAMP '2024-01-16 00:00:00' AS post,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
      |  FROM events WHERE event_type = 'purchase'
      |  GROUP BY 1, 2),
      |w AS (
      |  SELECT
      |    sum(CASE WHEN treat AND post THEN n END) AS n_tp,
      |    sum(CASE WHEN treat AND post THEN sv END) AS s_tp,
      |    sum(CASE WHEN treat AND NOT post THEN n END) AS n_tr,
      |    sum(CASE WHEN treat AND NOT post THEN sv END) AS s_tr,
      |    sum(CASE WHEN NOT treat AND post THEN n END) AS n_cp,
      |    sum(CASE WHEN NOT treat AND post THEN sv END) AS s_cp,
      |    sum(CASE WHEN NOT treat AND NOT post THEN n END) AS n_cr,
      |    sum(CASE WHEN NOT treat AND NOT post THEN sv END) AS s_cr
      |  FROM cells)
      |SELECT CAST(n_tp AS BIGINT) AS n_tp, CAST(n_tr AS BIGINT) AS n_tr,
      |  CAST(n_cp AS BIGINT) AS n_cp, CAST(n_cr AS BIGINT) AS n_cr,
      |  floor(s_tp / n_tp * 1e6 + 0.5) / 1e6 AS mean_treat_post,
      |  floor(s_tr / n_tr * 1e6 + 0.5) / 1e6 AS mean_treat_pre,
      |  floor(s_cp / n_cp * 1e6 + 0.5) / 1e6 AS mean_ctrl_post,
      |  floor(s_cr / n_cr * 1e6 + 0.5) / 1e6 AS mean_ctrl_pre,
      |  floor(((s_tp / n_tp - s_tr / n_tr) - (s_cp / n_cp - s_cr / n_cr))
      |    * 1e6 + 0.5) / 1e6 AS did
      |FROM w""".stripMargin

  // ------------------------------------------------- Holt forecasting

  /** Holt double-exponential smoothing (level + trend) over the last
    * [[HoltWindow]] days of each event-type daily series, with the
    * one-step-ahead forecast — the capacity-planning readout a volume
    * dashboard publishes.
    *
    * The recursion (α = β = ½, init l₁ = y₁, b₁ = y₂ − y₁) is LINEAR in
    * the observations, so it unrolls to two fixed dyadic coefficient
    * vectors computed once at class-load by running the recursion
    * symbolically on unit vectors (max denominator 2⁻¹², so scale-16
    * decimals hold them exactly — the [[ewmaDaily]] convention: exact
    * decimal products, scale-9 round, then the double cast). Both
    * engines consume the SAME plain-string literals; days missing from
    * the window (series shorter than W) are zero on both sides by
    * construction because offsets anchor to max(day).
    *
    * Scale: one map-side-combinable daily count, a |types|·W scaffold
    * (metadata-sized), one aggregate. The 1-row max(day) broadcast is
    * the approved scalar-anchor cross join.
    */
  val HoltWindow = 8

  /** (level, trend) coefficient vectors over window offsets 0 (oldest)
    * .. W−1 (= max day), as exact plain decimal strings.
    */
  val holtCoeffs: (Seq[String], Seq[String]) = {
    val W = HoltWindow
    val half = BigDecimal(1) / 2
    var cl = Vector.tabulate(W)(i => if (i == 0) BigDecimal(1) else BigDecimal(0))
    var cb = Vector.tabulate(W)(i =>
      if (i == 0) BigDecimal(-1) else if (i == 1) BigDecimal(1) else BigDecimal(0))
    for (t <- 2 until W) {
      val e = Vector.tabulate(W)(i => if (i == t) BigDecimal(1) else BigDecimal(0))
      val nl = Vector.tabulate(W)(i => half * e(i) + half * (cl(i) + cb(i)))
      val nb = Vector.tabulate(W)(i => half * (nl(i) - cl(i)) + half * cb(i))
      cl = nl; cb = nb
    }
    (cl.map(_.underlying.toPlainString), cb.map(_.underlying.toPlainString))
  }

  def holtForecast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (wl, wb) = holtCoeffs
    val lArr = array(wl.map(w => lit(w).cast("decimal(28,16)")): _*)
    val bArr = array(wb.map(w => lit(w).cast("decimal(28,16)")): _*)
    val ev = Tables.events(s, dir)
      .select($"event_type", to_date($"ts").as("day"))
    val counts = ev.groupBy($"event_type", $"day")
      .agg(count(lit(1)).cast("decimal(8,0)").as("cnt"))
    val mx = ev.agg(max($"day").as("dmax"))
    val scaffold = ev.select($"event_type").distinct()
      .crossJoin(broadcast(mx))
      .select($"event_type",
        explode(sequence(lit(0), lit(HoltWindow - 1))).as("k"),
        $"dmax")
      .select($"event_type", $"k",
        expr(s"date_sub(dmax, $HoltWindow - 1 - k)").as("day"))
    scaffold.join(counts, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce($"cnt", lit(0).cast("decimal(8,0)")))
      .groupBy($"event_type")
      .agg(
        round(sum($"cnt" * element_at(lArr, $"k" + 1)), 9).cast("double").as("level"),
        round(sum($"cnt" * element_at(bArr, $"k" + 1)), 9).cast("double").as("trend"),
        round(sum($"cnt" * (element_at(lArr, $"k" + 1) + element_at(bArr, $"k" + 1))), 9)
          .cast("double").as("forecast_next"))
  }

  val holtForecastSql: String = {
    val (wl, wb) = holtCoeffs
    val lList = wl.map(w => s"'$w'").mkString("[", ", ", "]")
    val bList = wb.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH ev AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
       |counts AS (
       |  SELECT event_type, day, CAST(count(*) AS DECIMAL(8,0)) AS cnt
       |  FROM ev GROUP BY 1, 2),
       |mx AS (SELECT max(day) AS dmax FROM ev),
       |scaffold AS (
       |  SELECT t.event_type, k.k,
       |    dmax - CAST($HoltWindow - 1 - k.k AS INTEGER) AS day
       |  FROM (SELECT DISTINCT event_type FROM ev) t
       |  CROSS JOIN (SELECT unnest(range(0, $HoltWindow)) AS k) k
       |  CROSS JOIN mx),
       |joined AS (
       |  SELECT s.event_type, s.k, coalesce(c.cnt, 0) AS cnt
       |  FROM scaffold s LEFT JOIN counts c
       |    ON c.event_type = s.event_type AND c.day = s.day)
       |SELECT event_type,
       |  CAST(round(sum(cnt * CAST($lList[k + 1] AS DECIMAL(28,16))), 9) AS DOUBLE) AS level,
       |  CAST(round(sum(cnt * CAST($bList[k + 1] AS DECIMAL(28,16))), 9) AS DOUBLE) AS trend,
       |  CAST(round(sum(cnt * (CAST($lList[k + 1] AS DECIMAL(28,16)) + CAST($bList[k + 1] AS DECIMAL(28,16)))), 9) AS DOUBLE) AS forecast_next
       |FROM joined GROUP BY event_type""".stripMargin
  }

  /** Rolling-origin backtest of the Holt forecast — the eval that
    * justifies shipping any forecaster: for each of the last
    * [[BacktestOrigins]] days, forecast that day from the 8-day window
    * ENDING the day before (same coefficient vectors as
    * [[holtForecast]], anchors shifted), compare to the actual count,
    * and report MAE next to the naive-persistence baseline
    * (yesterday's count) with the skill ratio. Forecast errors go
    * decimal → |diff| → scale-9 round → micro-floor, so the per-origin
    * errors are engine-exact integers and the MAE is one final
    * division.
    *
    * Scale: the scaffold is |types|·origins·W rows (metadata-sized);
    * the corpus is touched once by the daily count.
    */
  val BacktestOrigins = 5

  def holtBacktest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (wl, wb) = holtCoeffs
    val wf = wl.zip(wb).map { case (a, b) => BigDecimal(a) + BigDecimal(b) }
      .map(_.underlying.toPlainString)
    val fArr = array(wf.map(w => lit(w).cast("decimal(28,16)")): _*)
    val ev = Tables.events(s, dir)
      .select($"event_type", to_date($"ts").as("day"))
    val counts = ev.groupBy($"event_type", $"day")
      .agg(count(lit(1)).cast("decimal(8,0)").as("cnt"))
    val mx = ev.agg(max($"day").as("dmax"))
    val scaffold = ev.select($"event_type").distinct()
      .crossJoin(broadcast(mx))
      .select($"event_type",
        explode(sequence(lit(0), lit(BacktestOrigins - 1))).as("o"), $"dmax")
      .select($"event_type", $"o", expr("date_sub(dmax, o)").as("origin"))
      .select($"event_type", $"origin",
        explode(sequence(lit(0), lit(HoltWindow - 1))).as("k"))
      .select($"event_type", $"origin", $"k",
        expr(s"date_sub(origin, $HoltWindow - k)").as("day"))
    val win = scaffold.join(counts, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce($"cnt", lit(0).cast("decimal(8,0)")))
      .groupBy($"event_type", $"origin")
      .agg(
        sum($"cnt" * element_at(fArr, $"k" + 1)).as("forecast"),
        max(when($"k" === HoltWindow - 1, $"cnt")).as("naive"))
    val actual = counts.select($"event_type", $"day".as("origin"),
      $"cnt".as("actual"))
    win.join(actual, Seq("event_type", "origin"), "left")
      .withColumn("actual", coalesce($"actual", lit(0).cast("decimal(8,0)")))
      .selectExpr("event_type",
        "CAST(floor(CAST(round(abs(forecast - actual), 9) AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS err_micro",
        "CAST(floor(CAST(abs(naive - actual) AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS naive_micro")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_origins"),
        sum($"err_micro").as("se"), sum($"naive_micro").as("sn"))
      .selectExpr("event_type", "n_origins",
        "floor(CAST(se AS DOUBLE) / n_origins + 0.5) / 1e6 AS mae_holt",
        "floor(CAST(sn AS DOUBLE) / n_origins + 0.5) / 1e6 AS mae_naive",
        """CASE WHEN sn = 0 THEN NULL
          |ELSE floor(CAST(se AS DOUBLE) / sn * 1e6 + 0.5) / 1e6 END AS skill"""
          .stripMargin)
  }

  val holtBacktestSql: String = {
    val (wl, wb) = holtCoeffs
    val wf = wl.zip(wb).map { case (a, b) => BigDecimal(a) + BigDecimal(b) }
      .map(_.underlying.toPlainString)
    val fList = wf.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH ev AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
       |counts AS (
       |  SELECT event_type, day, CAST(count(*) AS DECIMAL(8,0)) AS cnt
       |  FROM ev GROUP BY 1, 2),
       |mx AS (SELECT max(day) AS dmax FROM ev),
       |scaffold AS (
       |  SELECT t.event_type,
       |    dmax - CAST(o.o AS INTEGER) AS origin, k.k,
       |    dmax - CAST(o.o AS INTEGER) - CAST($HoltWindow - k.k AS INTEGER) AS day
       |  FROM (SELECT DISTINCT event_type FROM ev) t
       |  CROSS JOIN (SELECT unnest(range(0, $BacktestOrigins)) AS o) o
       |  CROSS JOIN (SELECT unnest(range(0, $HoltWindow)) AS k) k
       |  CROSS JOIN mx),
       |win AS (
       |  SELECT s.event_type, s.origin,
       |    sum(coalesce(c.cnt, 0) * CAST($fList[s.k + 1] AS DECIMAL(28,16))) AS forecast,
       |    max(CASE WHEN s.k = $HoltWindow - 1 THEN coalesce(c.cnt, 0) END) AS naive
       |  FROM scaffold s LEFT JOIN counts c
       |    ON c.event_type = s.event_type AND c.day = s.day
       |  GROUP BY s.event_type, s.origin),
       |err AS (
       |  SELECT w.event_type,
       |    CAST(floor(CAST(round(abs(w.forecast - coalesce(a.cnt, 0)), 9) AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS err_micro,
       |    CAST(floor(CAST(abs(w.naive - coalesce(a.cnt, 0)) AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS naive_micro
       |  FROM win w LEFT JOIN counts a
       |    ON a.event_type = w.event_type AND a.day = w.origin)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_origins,
       |  floor(CAST(sum(err_micro) AS DOUBLE) / count(*) + 0.5) / 1e6 AS mae_holt,
       |  floor(CAST(sum(naive_micro) AS DOUBLE) / count(*) + 0.5) / 1e6 AS mae_naive,
       |  CASE WHEN sum(naive_micro) = 0 THEN NULL
       |    ELSE floor(CAST(sum(err_micro) AS DOUBLE) / sum(naive_micro) * 1e6 + 0.5) / 1e6 END AS skill
       |FROM err GROUP BY event_type""".stripMargin
  }

  /** Sample autocorrelation function of the hourly event-count series,
    * lags 1..[[AcfMaxLag]] — the seasonality/memory diagnostic run
    * before any forecasting choice (Box–Jenkins identification: a
    * daily cycle shows as a lag-24 peak, short-term burstiness as
    * fast-decaying low lags).
    *
    *   r_k = Σ_{t≤N−k} (c_t − m)(c_{t+k} − m) / Σ_t (c_t − m)²,
    *   m = Σc / N over the GAP-FILLED hour span (missing hours are
    *   real zeros — dropping them would shift every lag).
    *
    * Cross-engine exactness: multiplying through by N² clears the
    * rational mean, so both engines sum INTEGER deviations
    * dev_t = N·c_t − S (S = Σc) — r_k = Σ dev_t·dev_{t+k} / Σ dev_t²
    * with decimal(38,0) product sums (order-independent), one double
    * division at the end (round-6's order-proof pattern). Plan: one
    * scan-side hourly count, the 1-row span scaffold (approved 1-row
    * cross), a self equi-join on t+k (12 lag copies of the |hours|-row
    * dense series — metadata-sized, NEVER per-event), two 1-row
    * broadcasts for totals and denominator.
    */
  val AcfMaxLag = 12

  def acf(s: SparkSession, dir: String): DataFrame =
    acfFromCounts(hourlyEventCounts(s, dir))

  /** Sparse per-hour event counts (t = epoch-hours) — the series input
    * shared by [[acf]], [[decompose]], and the streaming ACF's
    * reconstructed state.
    */
  private[graft] def hourlyEventCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(expr("unix_micros(ts) div 3600000000").as("t"))
      .groupBy($"t").agg(count(lit(1)).as("c"))
  }

  /** Gap-fill a sparse (t, c) hour series to the dense span — missing
    * hours become explicit zeros (1-row span aggregate, narrow explode,
    * one equi-join; the series frame is metadata-sized).
    */
  private def denseHours(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    val span = counts.agg(min($"t").as("t0"), max($"t").as("t1"))
    span.select(explode(expr("sequence(t0, t1)")).as("t"))
      .join(counts, Seq("t"), "left")
      .withColumn("c", coalesce($"c", lit(0L)))
  }

  /** ACF finalize from a sparse (t, c) counts frame — shared verbatim by
    * the batch and streaming forms (the streaming query's drained state
    * IS a counts frame).
    */
  private[graft] def acfFromCounts(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    val dense = denseHours(counts)
    val tot = dense.agg(count(lit(1)).as("n"), sum($"c").as("s"))
    val devs = dense.crossJoin(broadcast(tot))
      .select($"t", ($"n" * $"c" - $"s").as("dev"))
    val den = devs.agg(sum(expr(
      "CAST(dev AS DECIMAL(19,0)) * CAST(dev AS DECIMAL(19,0))")).as("den"))
    devs.withColumn("k", explode(expr(s"sequence(1, $AcfMaxLag)")))
      .select($"k", ($"t" + $"k").as("t2"), $"dev".as("dev_a"))
      .join(devs.select($"t".as("t2"), $"dev".as("dev_b")), "t2")
      .groupBy($"k")
      .agg(count(lit(1)).as("n_terms"),
        sum(expr("CAST(dev_a AS DECIMAL(19,0)) * CAST(dev_b AS DECIMAL(19,0))"))
          .as("num"))
      .crossJoin(broadcast(den))
      .where($"den" > 0)
      .select($"k".cast("long").as("k"), $"n_terms",
        expr("floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6 + 0.5) / 1e6")
          .as("acf"))
  }

  /** The ACF oracle's CTE chain (everything up to the final SELECT),
    * shared verbatim by [[acfSql]] and the PACF oracle built on top of
    * it ([[pacfSql]]) — one restatement of the series math, two final
    * statistics.
    */
  private[graft] val acfCtes: String =
    s"""counts AS (
       |  SELECT epoch_us(ts) // 3600000000 AS t, count(*) AS c
       |  FROM events GROUP BY 1),
       |span AS (SELECT min(t) AS t0, max(t) AS t1 FROM counts),
       |dense AS (
       |  SELECT u.t AS t, coalesce(c.c, 0) AS c
       |  FROM (SELECT unnest(range(t0, t1 + 1)) AS t FROM span) u
       |  LEFT JOIN counts c ON c.t = u.t),
       |tot AS (SELECT count(*) AS n, sum(c) AS s FROM dense),
       |devs AS (SELECT t, n * c - s AS dev FROM dense CROSS JOIN tot),
       |den AS (
       |  SELECT sum(CAST(dev AS DECIMAL(19,0)) * CAST(dev AS DECIMAL(19,0)))
       |    AS den FROM devs),
       |nums AS (
       |  SELECT k, count(*) AS n_terms,
       |    sum(CAST(a.dev AS DECIMAL(19,0)) * CAST(b.dev AS DECIMAL(19,0)))
       |      AS num
       |  FROM devs a
       |  CROSS JOIN (SELECT unnest(range(1, ${AcfMaxLag + 1})) AS k) ks
       |  JOIN devs b ON b.t = a.t + k
       |  GROUP BY k)""".stripMargin

  val acfSql: String =
    s"""WITH $acfCtes
       |SELECT CAST(k AS BIGINT) AS k, CAST(n_terms AS BIGINT) AS n_terms,
       |  floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6 + 0.5) / 1e6
       |    AS acf
       |FROM nums CROSS JOIN den WHERE den > 0""".stripMargin

  /** PACF lags emitted — the recursion depth of the unrolled
    * Durbin–Levinson ladder (ACF supplies [[AcfMaxLag]] = 12 lags;
    * the first 8 partials are the Box–Jenkins AR-order diagnostic).
    */
  val PacfMaxLag = 8

  /** Unrolled Durbin–Levinson step definitions, in dependency order —
    * ONE generated list of `(column, sql)` pairs consumed verbatim by
    * BOTH engines (a `withColumn`/`expr` fold on the Spark side, a
    * chained-CTE restatement on the DuckDB side), so the recursion's
    * IEEE double arithmetic is literally the same expression tree:
    *
    *   φ₁₁ = r₁
    *   φₖₖ = (rₖ − Σⱼ φₖ₋₁ⱼ·rₖ₋ⱼ) / (1 − Σⱼ φₖ₋₁ⱼ·rⱼ)
    *   φₖⱼ = φₖ₋₁ⱼ − φₖₖ·φₖ₋₁ₖ₋ⱼ            (j < k)
    *
    * Every division and every ladder update is re-rounded with the
    * engine-stable `floor(x·1e6+0.5)/1e6` idiom (native `round` is
    * documented engine-divergent at boundaries); the Σ terms are
    * written left-associated in a fixed j order so both engines fold
    * the doubles identically. A zero denominator (perfectly predicted
    * series) rides as NULL via `nullif` — identical propagation, and
    * the finalizer drops NULL partials on both sides.
    */
  private[graft] val durbinLevinsonDefs: Seq[(String, String)] = {
    def rnd(x: String) = s"floor(($x) * 1e6 + 0.5) / 1e6"
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    out += ("phi_1_1" -> "r1")
    for (k <- 2 to PacfMaxLag) {
      val num = (1 until k).map(j => s"phi_${k - 1}_$j * r${k - j}")
        .mkString(" + ")
      val den = (1 until k).map(j => s"phi_${k - 1}_$j * r$j")
        .mkString(" + ")
      out += (s"phi_${k}_$k" ->
        rnd(s"(r$k - ($num)) / nullif(1 - ($den), 0)"))
      for (j <- 1 until k)
        out += (s"phi_${k}_$j" ->
          rnd(s"phi_${k - 1}_$j - phi_${k}_$k * phi_${k - 1}_${k - j}"))
    }
    out.toSeq
  }

  /** Partial autocorrelation (lags 1..[[PacfMaxLag]]) of the hourly
    * event-count series — the second half of the Box–Jenkins
    * identification pair: [[acf]] cuts off for MA(q) processes, PACF
    * cuts off at lag p for AR(p), so the two plots together pick the
    * ARIMA order before any forecasting choice ([[holtForecast]] etc.).
    *
    * Shape: the entire computation after [[acf]]'s scan-side hourly
    * count is METADATA-SIZED — a 12-row ACF frame pivoted to one row,
    * then the [[durbinLevinsonDefs]] scalar ladder folded as column
    * expressions on that single row (no driver collect, no extra scan;
    * the 100 TB cost is identical to `ev_acf`'s). Cross-engine
    * exactness comes from evaluating the SAME generated expression
    * text on both engines over inputs already rounded to 6 dp.
    */
  def pacf(s: SparkSession, dir: String): DataFrame =
    pacfFromAcf(acf(s, dir))

  /** PACF finalize from an ACF frame (k, …, acf) — shared verbatim by
    * the batch query and `stream_pacf` (whose drained hourly-count
    * state closes through [[acfFromCounts]] first).
    */
  private[graft] def pacfFromAcf(acfOut: DataFrame): DataFrame = {
    val s = acfOut.sparkSession
    import s.implicits._
    val rCols = (1 to PacfMaxLag).map(i =>
      max(when($"k" === i, $"acf")).as(s"r$i"))
    val base = acfOut.groupBy().agg(rCols.head, rCols.tail: _*)
    val folded = durbinLevinsonDefs.foldLeft(base) {
      case (df, (name, sql)) => df.withColumn(name, expr(sql))
    }
    val kv = (1 to PacfMaxLag).flatMap(k =>
      Seq(lit(k.toLong), col(s"phi_${k}_$k")))
    folded.select(explode(map(kv: _*)).as(Seq("k", "pacf")))
      .where($"pacf".isNotNull)
  }

  /** PACF oracle. The ladder CTEs are `AS MATERIALIZED`: DuckDB's
    * projection inlining otherwise SUBSTITUTES each φ expression into
    * every successor that references it — exponential in ladder depth
    * (the single-statement cousin of the SemDedup unrolled-k-means
    * re-expansion) — turning a 1-row fold into minutes of optimizer
    * work. Materializing pins each step to one evaluation; semantics
    * are unchanged and the Spark side is unaffected.
    */
  /** AR model order fitted by [[yuleWalker]]. */
  val ArOrder = 4

  /** Yule–Walker AR(p) fit of the hourly count series, p = [[ArOrder]]
    * — the MODEL the [[pacf]] diagnostic selects: the final row of the
    * same Durbin–Levinson ladder IS the Yule–Walker solution φ_{p,1..p}
    * (the ladder is the O(p²) solver for the Toeplitz normal
    * equations), and the innovation-variance ratio σ²_p/γ₀ =
    * Π_{k≤p}(1 − φ_{k,k}²) falls out of the reflection coefficients.
    * Emitted as (term, value) rows: 'ar1'..'ar4' coefficients plus
    * 'var_ratio' — the one-scan-plus-metadata cost shape of
    * [[acf]]/[[pacf]] (the fit itself is a 1-row expression fold).
    */
  def yuleWalker(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val acfOut = acf(s, dir)
    val rCols = (1 to PacfMaxLag).map(i =>
      max(when($"k" === i, $"acf")).as(s"r$i"))
    val base = acfOut.groupBy().agg(rCols.head, rCols.tail: _*)
    val folded = durbinLevinsonDefs.foldLeft(base) {
      case (df, (name, sql)) => df.withColumn(name, expr(sql))
    }.withColumn("var_ratio", expr(varRatioExpr))
    val kv = (1 to ArOrder).flatMap(j =>
      Seq(lit(s"ar$j"), col(s"phi_${ArOrder}_$j"))) ++
      Seq(lit("var_ratio"), col("var_ratio"))
    folded.select(explode(map(kv: _*)).as(Seq("term", "value")))
      .where($"value".isNotNull)
  }

  /** σ²_p/γ₀ = Π (1 − φ_kk²), re-rounded once at the end — identical
    * expression text on both engines.
    */
  private def varRatioExpr: String = {
    val prod = (1 to ArOrder)
      .map(k => s"(1 - phi_${k}_$k * phi_${k}_$k)").mkString(" * ")
    s"floor(($prod) * 1e6 + 0.5) / 1e6"
  }

  val yuleWalkerSql: String = {
    val ctes = durbinLevinsonDefs.zipWithIndex.map { case ((n, e), i) =>
      val prev = if (i == 0) "pacf_base" else s"dl$i"
      s"dl${i + 1} AS MATERIALIZED (SELECT *, $e AS $n FROM $prev)"
    }
    val last = s"dl${durbinLevinsonDefs.size}"
    val pivot = (1 to PacfMaxLag)
      .map(i => s"max(CASE WHEN k = $i THEN acf END) AS r$i").mkString(", ")
    val rows = ((1 to ArOrder)
      .map(j => s"SELECT 'ar$j' AS term, phi_${ArOrder}_$j AS value FROM fin") :+
      s"SELECT 'var_ratio', var_ratio FROM fin").mkString(" UNION ALL ")
    s"""WITH $acfCtes,
       |acf_out AS MATERIALIZED (
       |  SELECT k,
       |    floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6 + 0.5) / 1e6
       |      AS acf
       |  FROM nums CROSS JOIN den WHERE den > 0),
       |pacf_base AS MATERIALIZED (SELECT $pivot FROM acf_out),
       |${ctes.mkString(",\n")},
       |fin AS MATERIALIZED (SELECT *, $varRatioExpr AS var_ratio FROM $last)
       |SELECT term, value FROM ($rows) u WHERE value IS NOT NULL""".stripMargin
  }

  /** Forecast horizon for [[arForecast]]. */
  val ArForecastH = 6

  /** Generated h-step AR forecast definitions over the fitted
    * coefficients: x̂_{T+h} = m + Σⱼ φ_{p,j}·(v_{h−j} − m) where the
    * v window slides over observations x1..x4 (most recent first) and
    * earlier forecasts — the same shared-text discipline as
    * [[durbinLevinsonDefs]], re-rounded per step.
    */
  private[graft] val arForecastDefs: Seq[(String, String)] = {
    var window = List("x1", "x2", "x3", "x4")
    (1 to ArForecastH).map { h =>
      val terms = (1 to ArOrder)
        .map(j => s"phi_${ArOrder}_$j * (${window(j - 1)} - m)")
        .mkString(" + ")
      val d = s"f$h" -> s"floor((m + $terms) * 1e6 + 0.5) / 1e6"
      window = s"f$h" :: window
      d
    }
  }

  /** AR(p) h-step FORECAST of the hourly count series — the stage the
    * Box–Jenkins chain exists for: [[acf]]/[[pacf]] identify,
    * [[yuleWalker]] fits, this entry projects h = 1..[[ArForecastH]]
    * hours ahead by the textbook recursion (forecasts feed back into
    * the lag window; mean-adjusted because the fit is on
    * autocorrelations). Same cost shape as the rest of the family: one
    * scan, then 1-row expression folds; the three 1-row cross joins
    * (ladder pivot × last-4 window × mean) are the approved totals
    * broadcast.
    */
  def arForecast(s: SparkSession, dir: String): DataFrame =
    arForecastFromCounts(hourlyEventCounts(s, dir))

  /** Forecast finalize from a sparse (t, c) counts frame — shared
    * verbatim by the batch query and `stream_ar_forecast` (whose
    * drained hourly-count state IS a counts frame).
    */
  private[graft] def arForecastFromCounts(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dense = denseHours(counts)
    val last4 = dense
      .withColumn("rn", row_number().over(Window.orderBy($"t".desc)))
      .where($"rn" <= 4)
      .groupBy().agg(
        max(when($"rn" === 1, $"c")).as("x1"),
        max(when($"rn" === 2, $"c")).as("x2"),
        max(when($"rn" === 3, $"c")).as("x3"),
        max(when($"rn" === 4, $"c")).as("x4"))
    val msel = dense.agg(count(lit(1)).as("n"), sum($"c").as("s"))
      .select(expr("floor(CAST(s AS DOUBLE) / n * 1e6 + 0.5) / 1e6").as("m"))
    val rCols = (1 to PacfMaxLag).map(i =>
      max(when($"k" === i, $"acf")).as(s"r$i"))
    val base = acfFromCounts(counts).groupBy().agg(rCols.head, rCols.tail: _*)
      .crossJoin(broadcast(last4)).crossJoin(broadcast(msel))
    val folded = (durbinLevinsonDefs ++ arForecastDefs).foldLeft(base) {
      case (df, (name, sql)) => df.withColumn(name, expr(sql))
    }
    val kv = (1 to ArForecastH).flatMap(h =>
      Seq(lit(h.toLong), col(s"f$h")))
    folded.select(explode(map(kv: _*)).as(Seq("h", "forecast")))
      .where($"forecast".isNotNull)
  }

  val arForecastSql: String = {
    val allDefs = durbinLevinsonDefs ++ arForecastDefs
    val ctes = allDefs.zipWithIndex.map { case ((n, e), i) =>
      val prev = if (i == 0) "arf_base" else s"af$i"
      s"af${i + 1} AS MATERIALIZED (SELECT *, $e AS $n FROM $prev)"
    }
    val last = s"af${allDefs.size}"
    val pivot = (1 to PacfMaxLag)
      .map(i => s"max(CASE WHEN k = $i THEN acf END) AS r$i").mkString(", ")
    val rows = (1 to ArForecastH)
      .map(h => s"SELECT $h AS h, f$h AS forecast FROM $last")
      .mkString(" UNION ALL ")
    s"""WITH $acfCtes,
       |acf_out AS MATERIALIZED (
       |  SELECT k,
       |    floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6 + 0.5) / 1e6
       |      AS acf
       |  FROM nums CROSS JOIN den WHERE den > 0),
       |last4 AS (
       |  SELECT max(CASE WHEN rn = 1 THEN c END) AS x1,
       |    max(CASE WHEN rn = 2 THEN c END) AS x2,
       |    max(CASE WHEN rn = 3 THEN c END) AS x3,
       |    max(CASE WHEN rn = 4 THEN c END) AS x4
       |  FROM (SELECT c, row_number() OVER (ORDER BY t DESC) AS rn FROM dense)
       |  WHERE rn <= 4),
       |msel AS (
       |  SELECT floor(CAST(s AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS m
       |  FROM (SELECT count(*) AS n, sum(c) AS s FROM dense)),
       |arf_base AS MATERIALIZED (
       |  SELECT * FROM (SELECT $pivot FROM acf_out)
       |  CROSS JOIN last4 CROSS JOIN msel),
       |${ctes.mkString(",\n")}
       |SELECT CAST(h AS BIGINT) AS h, forecast FROM ($rows) u
       |WHERE forecast IS NOT NULL""".stripMargin
  }

  /** Lags tested by the [[ljungBox]] portmanteau diagnostic. */
  val LjungBoxLags = 8

  /** One-step AR(p) prediction text over lag columns l1..lp and the
    * 6-dp mean m — generated ONCE, evaluated verbatim by both engines
    * (left-associated, the ladder discipline).
    */
  private def arPredExpr: String = {
    val terms = (1 to ArOrder)
      .map(j => s"phi_${ArOrder}_$j * (l$j - m)").mkString(" + ")
    s"m + $terms"
  }

  /** Q = n(n+2)·Σₖ r²ₖ/(n−k) over the pivoted residual
    * autocorrelations rr1..rrh — one generated text, both engines.
    */
  private def qStatExpr: String = {
    val terms = (1 to LjungBoxLags)
      .map(k => s"rr$k * rr$k / (n - $k)").mkString(" + ")
    s"floor((n * (n + 2) * ($terms)) * 1e6 + 0.5) / 1e6"
  }

  /** Ljung–Box residual diagnostic of the AR([[ArOrder]]) fit — the
    * CHECKING stage of the Box–Jenkins loop ([[acf]]/[[pacf]]
    * identify, [[yuleWalker]] estimates, this validates, [[arForecast]]
    * projects): in-sample one-step residuals eₜ = xₜ − x̂ₜ over the
    * dense hourly series, their autocorrelations r₁..r₈, and the
    * portmanteau Q = n(n+2)Σ r²ₖ/(n−k) that rejects the fitted order
    * when residual structure remains (χ² with h−p df).
    *
    * Shape: everything after the hourly-count scan is metadata-sized —
    * the 1-row ladder fit and mean broadcast onto the dense series
    * (the approved totals pattern), residuals via lag windows, then
    * the [[acfFromCounts]] decimal-exact sum discipline on 6-dp
    * residuals (DECIMAL(18,6) products — partition-order-proof) and a
    * 1-row pivot for the generated Q text. Emitted as (term, value):
    * r1..r8, q_stat, n_resid.
    */
  def ljungBox(s: SparkSession, dir: String): DataFrame =
    ljungBoxFromCounts(hourlyEventCounts(s, dir))

  private[graft] def ljungBoxFromCounts(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dense = denseHours(counts)
    val msel = dense.agg(count(lit(1)).as("n_all"), sum($"c").as("sc"))
      .select(expr("floor(CAST(sc AS DOUBLE) / n_all * 1e6 + 0.5) / 1e6")
        .as("m"))
    val rCols = (1 to PacfMaxLag).map(i =>
      max(when($"k" === i, $"acf")).as(s"r$i"))
    val fitted = durbinLevinsonDefs.foldLeft(
        acfFromCounts(counts).groupBy().agg(rCols.head, rCols.tail: _*)) {
      case (df, (name, sql)) => df.withColumn(name, expr(sql))
    }
    val model = fitted.select(
      (1 to ArOrder).map(j => col(s"phi_${ArOrder}_$j")): _*)
    val w = Window.orderBy($"t")
    val lagged = (1 to ArOrder).foldLeft(dense) {
      case (df, j) => df.withColumn(s"l$j", lag($"c", j).over(w))
    }
    val resid = lagged.where(col(s"l$ArOrder").isNotNull)
      .crossJoin(broadcast(model)).crossJoin(broadcast(msel))
      .select($"t",
        expr(s"floor((c - ($arPredExpr)) * 1e6 + 0.5) / 1e6").as("e"))
    val rden = resid.agg(count(lit(1)).as("n"),
      sum(expr("CAST(e AS DECIMAL(18,6)) * CAST(e AS DECIMAL(18,6))"))
        .as("den"))
    val rnums = resid
      .withColumn("k", explode(expr(s"sequence(1, $LjungBoxLags)")))
      .select($"k", ($"t" + $"k").as("t2"), $"e".as("e_a"))
      .join(resid.select($"t".as("t2"), $"e".as("e_b")), "t2")
      .groupBy($"k")
      .agg(sum(expr("CAST(e_a AS DECIMAL(18,6)) * CAST(e_b AS DECIMAL(18,6))"))
        .as("num"))
    val racf = rnums.crossJoin(broadcast(rden)).where($"den" > 0)
      .select($"k", $"n",
        expr("floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6 + 0.5) / 1e6")
          .as("r"))
    val rrCols = (1 to LjungBoxLags).map(i =>
      max(when($"k" === i, $"r")).as(s"rr$i"))
    val fin = racf.groupBy().agg(max($"n").as("n"), rrCols: _*)
      .withColumn("q_stat", expr(qStatExpr))
    val kv = Seq(lit("q_stat"), $"q_stat",
        lit("n_resid"), $"n".cast("double")) ++
      (1 to LjungBoxLags).flatMap(k => Seq(lit(s"r$k"), col(s"rr$k")))
    fin.select(explode(map(kv: _*)).as(Seq("term", "value")))
      .where($"value".isNotNull)
  }

  val ljungBoxSql: String = {
    val ctes = durbinLevinsonDefs.zipWithIndex.map { case ((n, e), i) =>
      val prev = if (i == 0) "lb_base" else s"lb$i"
      s"lb${i + 1} AS MATERIALIZED (SELECT *, $e AS $n FROM $prev)"
    }
    val last = s"lb${durbinLevinsonDefs.size}"
    val pivot = (1 to PacfMaxLag)
      .map(i => s"max(CASE WHEN k = $i THEN acf END) AS r$i").mkString(", ")
    val lagCols = (1 to ArOrder)
      .map(j => s"lag(c, $j) OVER (ORDER BY t) AS l$j").mkString(", ")
    val rrPivot = (1 to LjungBoxLags)
      .map(i => s"max(CASE WHEN k = $i THEN r END) AS rr$i").mkString(", ")
    val rows = ((1 to LjungBoxLags)
      .map(k => s"SELECT 'r$k' AS term, rr$k AS value FROM finq") :+
      s"SELECT 'q_stat', q_stat FROM finq" :+
      s"SELECT 'n_resid', CAST(n AS DOUBLE) FROM finq").mkString(" UNION ALL ")
    s"""WITH $acfCtes,
       |acf_out AS MATERIALIZED (
       |  SELECT k,
       |    floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6 + 0.5) / 1e6
       |      AS acf
       |  FROM nums CROSS JOIN den WHERE den > 0),
       |msel AS (
       |  SELECT floor(CAST(s AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS m
       |  FROM (SELECT count(*) AS n, sum(c) AS s FROM dense)),
       |lb_base AS MATERIALIZED (SELECT $pivot FROM acf_out),
       |${ctes.mkString(",\n")},
       |model AS MATERIALIZED (
       |  SELECT ${(1 to ArOrder).map(j => s"phi_${ArOrder}_$j").mkString(", ")}
       |  FROM $last),
       |lagged AS (SELECT t, c, $lagCols FROM dense),
       |resid AS MATERIALIZED (
       |  SELECT t, floor((c - ($arPredExpr)) * 1e6 + 0.5) / 1e6 AS e
       |  FROM lagged CROSS JOIN model CROSS JOIN msel
       |  WHERE l$ArOrder IS NOT NULL),
       |rden AS (
       |  SELECT count(*) AS n,
       |    sum(CAST(e AS DECIMAL(18,6)) * CAST(e AS DECIMAL(18,6))) AS den
       |  FROM resid),
       |rnums AS (
       |  SELECT k,
       |    sum(CAST(a.e AS DECIMAL(18,6)) * CAST(b.e AS DECIMAL(18,6))) AS num
       |  FROM resid a
       |  CROSS JOIN (SELECT unnest(range(1, ${LjungBoxLags + 1})) AS k) ks
       |  JOIN resid b ON b.t = a.t + k
       |  GROUP BY k),
       |racf AS MATERIALIZED (
       |  SELECT k, n,
       |    floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6 + 0.5) / 1e6
       |      AS r
       |  FROM rnums CROSS JOIN rden WHERE den > 0),
       |fin AS MATERIALIZED (SELECT max(n) AS n, $rrPivot FROM racf),
       |finq AS (SELECT *, $qStatExpr AS q_stat FROM fin)
       |SELECT term, value FROM ($rows) u WHERE value IS NOT NULL""".stripMargin
  }

  /** Robust MAD anomaly scores over the per-type daily series — the
    * median-based counterpart of `ev_anomaly_zscore` (a mean/stddev
    * window is itself dragged by the outliers it hunts; the
    * median-absolute-deviation estimator has a 50% breakdown point):
    * score = (cnt − median) / (1.4826·MAD), flagged at |score| > 3,
    * with 1.4826 the standard consistency constant making MAD estimate
    * σ under normality. Medians are the exact `percentile` ↔
    * `quantile_cont` pairing (the q_percentiles contract); the score
    * re-round uses the floor idiom. All-constant series (MAD = 0)
    * yield NULL scores, never flags — both engines.
    */
  def anomalyMad(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.events(s, dir)
      .select($"event_type", to_date($"ts").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("cnt"))
    anomalyMadFromCounts(counts)
  }

  /** MAD finalize from a sparse per-(type, day) counts frame — shared
    * VERBATIM by the batch query and `stream_anomaly_mad` (whose
    * drained update-mode counters ARE such a frame; the span and type
    * set derived from the counts equal the batch's, since every event
    * lands in exactly one count).
    */
  private[graft] def anomalyMadFromCounts(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    val span = counts.agg(min($"day").as("d0"), max($"day").as("d1"))
    val scaffold = counts.select($"event_type").distinct()
      .crossJoin(broadcast(span))
      .select($"event_type",
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val series = scaffold.join(counts, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce($"cnt", lit(0L)))
    val med = series.groupBy($"event_type")
      .agg(expr("percentile(cnt, 0.5)").as("med"))
    val withMed = series.join(med, "event_type")
    val mad = withMed.groupBy($"event_type")
      .agg(expr("percentile(abs(cnt - med), 0.5)").as("mad"))
    withMed.join(mad, "event_type")
      .selectExpr("event_type", "date_format(day, 'yyyy-MM-dd') AS day", "cnt",
        """CASE WHEN mad = 0 THEN NULL
          |  ELSE floor((cnt - med) / (1.4826 * mad) * 1e6 + 0.5) / 1e6
          |END AS mad_score""".stripMargin,
        """CASE WHEN mad = 0 THEN false
          |  ELSE abs(floor((cnt - med) / (1.4826 * mad) * 1e6 + 0.5) / 1e6) > 3.0
          |END AS is_anomaly""".stripMargin)
  }

  val anomalyMadSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
      |counts AS (
      |  SELECT event_type, day, count(*) AS cnt FROM ev GROUP BY 1, 2),
      |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      |days AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
      |    AS day
      |  FROM span),
      |series AS (
      |  SELECT t.event_type, d.day, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
      |  FROM (SELECT DISTINCT event_type FROM ev) t
      |  CROSS JOIN days d
      |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day),
      |med AS (
      |  SELECT event_type, quantile_cont(cnt, 0.5) AS med
      |  FROM series GROUP BY 1),
      |wm AS (SELECT s.*, m.med FROM series s JOIN med m USING (event_type)),
      |md AS (
      |  SELECT event_type, quantile_cont(abs(cnt - med), 0.5) AS mad
      |  FROM wm GROUP BY 1)
      |SELECT wm.event_type, strftime(wm.day, '%Y-%m-%d') AS day, wm.cnt,
      |  CASE WHEN mad = 0 THEN NULL
      |    ELSE floor((cnt - med) / (1.4826 * mad) * 1e6 + 0.5) / 1e6
      |  END AS mad_score,
      |  CASE WHEN mad = 0 THEN false
      |    ELSE abs(floor((cnt - med) / (1.4826 * mad) * 1e6 + 0.5) / 1e6) > 3.0
      |  END AS is_anomaly
      |FROM wm JOIN md USING (event_type)""".stripMargin

  /** Holt–Winters window (4 weekly seasons of daily counts), seasonal
    * period, and forecast horizon.
    */
  val HwWindow = 28
  val HwPeriod = 7
  val HwH = 7

  /** Additive Holt–Winters forecast WEIGHTS, one vector per horizon
    * h = 1..[[HwH]] over the [[HwWindow]] most recent daily counts —
    * the [[holtCoeffs]] trick extended to the seasonal recursion:
    * with fixed smoothing constants the level/trend/seasonal states
    * are LINEAR in the observations, so the whole recursion
    * (Hyndman–Athanasopoulos additive form, α = 1/4, β = 1/8,
    * γ = 1/4 — all exact binary fractions) is propagated symbolically
    * over coefficient vectors in exact BigDecimal on the JVM, and the
    * per-series query collapses to decimal dot products. Unlike the
    * α = 1/2, W = 8 Holt weights (exact in 16 dp), these can exceed
    * 16 decimal digits, so each final weight is rounded HALF_UP to
    * 16 dp HERE and the already-representable string is what BOTH
    * engines cast — no engine-side rounding ever happens.
    *
    * Init: ℓ₀ = mean(season 1), b₀ = (mean(s2) − mean(s1))/m,
    * sᵢ = yᵢ − ℓ₀; forecast ŷ_{T+h} = ℓ_T + h·b_T + s_phase(T+h).
    */
  val hwCoeffs: Seq[Seq[String]] = {
    val W = HwWindow
    val m = HwPeriod
    val a = BigDecimal(1) / 4
    val b = BigDecimal(1) / 8
    val g = BigDecimal(1) / 4
    type V = Vector[BigDecimal]
    val zeros: V = Vector.fill(W)(BigDecimal(0))
    def e(t: Int): V = zeros.updated(t, BigDecimal(1))
    def add(x: V, y: V): V = x.zip(y).map { case (p, q) => p + q }
    def scale(c: BigDecimal, x: V): V = x.map(c * _)
    val m1 = BigDecimal(1) / m
    var l: V = Vector.tabulate(W)(i => if (i < m) m1 else BigDecimal(0))
    var tr: V = Vector.tabulate(W)(i =>
      if (i < m) -m1 / m else if (i < 2 * m) m1 / m else BigDecimal(0))
    var sea: Vector[V] = Vector.tabulate(m)(i => add(e(i), scale(-1, l)))
    for (t <- m until W) {
      val sPrev = sea(t % m)
      val lNew = add(scale(a, add(e(t), scale(-1, sPrev))),
        scale(1 - a, add(l, tr)))
      val bNew = add(scale(b, add(lNew, scale(-1, l))), scale(1 - b, tr))
      val sNew = add(scale(g, add(e(t), scale(-1, add(l, tr)))),
        scale(1 - g, sPrev))
      l = lNew; tr = bNew; sea = sea.updated(t % m, sNew)
    }
    (1 to HwH).map { h =>
      val w = add(add(l, scale(BigDecimal(h), tr)), sea((W - 1 + h) % m))
      w.map(_.setScale(16, BigDecimal.RoundingMode.HALF_UP)
        .underlying.toPlainString)
    }
  }

  /** Additive Holt–Winters h-step forecasts per event type — the
    * SEASONAL completion of the Holt level/trend pair (`ev_holt_*`):
    * weekly period over the trailing 4-week daily grid, emitted as
    * (event_type, h, forecast) for h = 1..7. One scan, a 28-day
    * scaffold left-join, and 7 decimal dot products with the
    * [[hwCoeffs]] weight vectors — identical cost shape to
    * `ev_holt_forecast`, just 7 columns wide.
    */
  def holtWinters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val arrs = hwCoeffs.map(ws =>
      array(ws.map(w => lit(w).cast("decimal(28,16)")): _*))
    val ev = Tables.events(s, dir)
      .select($"event_type", to_date($"ts").as("day"))
    val counts = ev.groupBy($"event_type", $"day")
      .agg(count(lit(1)).cast("decimal(8,0)").as("cnt"))
    val mx = ev.agg(max($"day").as("dmax"))
    val scaffold = ev.select($"event_type").distinct()
      .crossJoin(broadcast(mx))
      .select($"event_type",
        explode(sequence(lit(0), lit(HwWindow - 1))).as("k"),
        $"dmax")
      .select($"event_type", $"k",
        expr(s"date_sub(dmax, $HwWindow - 1 - k)").as("day"))
    val aggs = arrs.zipWithIndex.map { case (arr, i) =>
      round(sum($"cnt" * element_at(arr, $"k" + 1)), 9)
        .cast("double").as(s"f${i + 1}")
    }
    val wide = scaffold.join(counts, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce($"cnt", lit(0).cast("decimal(8,0)")))
      .groupBy($"event_type")
      .agg(aggs.head, aggs.tail: _*)
    val kv = (1 to HwH).flatMap(h => Seq(lit(h.toLong), col(s"f$h")))
    wide.select($"event_type",
      explode(map(kv: _*)).as(Seq("h", "forecast")))
  }

  val holtWintersSql: String = {
    val lists = hwCoeffs.map(_.map(w => s"'$w'").mkString("[", ", ", "]"))
    val rows = lists.zipWithIndex.map { case (lst, i) =>
      s"""SELECT event_type, CAST(${i + 1} AS BIGINT) AS h,
         |  CAST(round(sum(cnt * CAST($lst[k + 1] AS DECIMAL(28,16))), 9)
         |    AS DOUBLE) AS forecast
         |FROM joined GROUP BY event_type""".stripMargin
    }.mkString(" UNION ALL ")
    s"""WITH ev AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
       |counts AS (
       |  SELECT event_type, day, CAST(count(*) AS DECIMAL(8,0)) AS cnt
       |  FROM ev GROUP BY 1, 2),
       |mx AS (SELECT max(day) AS dmax FROM ev),
       |scaffold AS (
       |  SELECT t.event_type, k.k,
       |    dmax - CAST($HwWindow - 1 - k.k AS INTEGER) AS day
       |  FROM (SELECT DISTINCT event_type FROM ev) t
       |  CROSS JOIN (SELECT unnest(range(0, $HwWindow)) AS k) k
       |  CROSS JOIN mx),
       |joined AS (
       |  SELECT s.event_type, s.k, coalesce(c.cnt, 0) AS cnt
       |  FROM scaffold s LEFT JOIN counts c
       |    ON c.event_type = s.event_type AND c.day = s.day)
       |$rows""".stripMargin
  }

  /** Points emitted by [[lttbDownsample]] (first + last + one per
    * interior bucket).
    */
  val LttbPoints = 12

  def lttbDownsample(s: SparkSession, dir: String): DataFrame =
    lttbFromCounts(hourlyEventCounts(s, dir))

  /** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) of
    * the dense hourly series to [[LttbPoints]] points — the standard
    * telemetry/visualization reduction that keeps the visually salient
    * extrema a uniform stride would miss: first and last points pinned,
    * interior split into m−2 even buckets, and each bucket contributes
    * the point maximizing the triangle area with the PREVIOUS pick and
    * the NEXT bucket's centroid (sequential by construction — each
    * pick conditions the next).
    *
    * Shape: the hourly aggregation is the distributed scan; the series
    * itself is metadata-sized (hours), so the sequential selection runs
    * as ONE single-partition mapPartitions kernel on the coalesced
    * sorted series — the [[Graph]] union-find precedent (one task on a
    * metadata frame beats a 10-stage distributed recursion). All areas
    * are exact double expressions mirrored verbatim by the oracle's
    * unrolled bucket CTEs; ties break on the earlier point. Assumes
    * the series is longer than m (every fixture's span is hundreds of
    * hours).
    */
  private[graft] def lttbFromCounts(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    val m = LttbPoints
    val nb = m - 2
    denseHours(counts).select($"t", $"c").as[(Long, Long)]
      .orderBy($"t")
      .coalesce(1)
      .mapPartitions { it =>
        val pts = it.toArray
        val n = pts.length
        if (n <= m) {
          pts.iterator.zipWithIndex.map { case ((t, c), i) => (i + 1, t, c) }
        } else {
          def edge(k: Int): Int =
            1 + math.floor(k.toLong * (n - 2) / nb.toDouble).toInt
          val out = scala.collection.mutable.ArrayBuffer(
            (1, pts(0)._1, pts(0)._2))
          var prev = 0
          for (k <- 1 to nb) {
            val (xa, ya) =
              if (k == nb) (pts(n - 1)._1.toDouble, pts(n - 1)._2.toDouble)
              else {
                val seg = (edge(k) until edge(k + 1)).map(pts)
                (seg.map(_._1).sum.toDouble / seg.size,
                  seg.map(_._2).sum.toDouble / seg.size)
              }
            val (pt, pc) = pts(prev)
            var best = -1
            var bestArea = -1.0
            for (i <- edge(k - 1) until edge(k)) {
              val (bt, bc) = pts(i)
              val area = math.abs(
                (pt.toDouble - xa) * (bc.toDouble - pc.toDouble)
                  - (pt.toDouble - bt.toDouble) * (ya - pc.toDouble))
              if (area > bestArea) { bestArea = area; best = i }
            }
            prev = best
            out += ((k + 1, pts(best)._1, pts(best)._2))
          }
          out += ((m, pts(n - 1)._1, pts(n - 1)._2))
          out.iterator
        }
      }.toDF("rnk", "t", "c")
  }

  /** DuckDB restatement: the m−2 buckets unrolled as MATERIALIZED
    * pick CTEs, each conditioning on the previous pick's 1-row frame;
    * identical bucket-edge floors, centroid divisions, and area
    * expressions.
    */
  val lttbSql: String = {
    val nb = LttbPoints - 2
    def edgeSql(k: Int) = s"1 + floor($k * (n - 2) / $nb.0)"
    val picks = (1 to nb).map { k =>
      val avg =
        if (k == nb)
          s"""a$k AS (
             |  SELECT CAST(t AS DOUBLE) AS xa, CAST(c AS DOUBLE) AS ya
             |  FROM idx, nn WHERE i = n - 1)""".stripMargin
        else
          s"""a$k AS (
             |  SELECT CAST(sum(t) AS DOUBLE) / count(*) AS xa,
             |    CAST(sum(c) AS DOUBLE) / count(*) AS ya
             |  FROM idx, nn
             |  WHERE i >= ${edgeSql(k)} AND i < ${edgeSql(k + 1)})""".stripMargin
      val prev = if (k == 1) "p0" else s"p${k - 1}"
      s"""$avg,
         |p$k AS MATERIALIZED (
         |  SELECT t, c FROM (
         |    SELECT b.t, b.c,
         |      abs((CAST(p.t AS DOUBLE) - a.xa)
         |            * (CAST(b.c AS DOUBLE) - CAST(p.c AS DOUBLE))
         |        - (CAST(p.t AS DOUBLE) - CAST(b.t AS DOUBLE))
         |            * (a.ya - CAST(p.c AS DOUBLE))) AS area
         |    FROM idx b, $prev p, a$k a, nn
         |    WHERE b.i >= ${edgeSql(k - 1)} AND b.i < ${edgeSql(k)})
         |  ORDER BY area DESC, t LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val rows = (s"SELECT 1 AS rnk, t, c FROM p0" +:
      (1 to nb).map(k => s"SELECT ${k + 1}, t, c FROM p$k") :+
      s"SELECT $LttbPoints, t, c FROM idx, nn WHERE i = n - 1")
      .mkString(" UNION ALL ")
    s"""WITH counts AS (
       |  SELECT epoch_us(ts) // 3600000000 AS t, count(*) AS c
       |  FROM events GROUP BY 1),
       |span AS (SELECT min(t) AS t0, max(t) AS t1 FROM counts),
       |dense AS (
       |  SELECT u.t AS t, coalesce(c.c, 0) AS c
       |  FROM (SELECT unnest(range(t0, t1 + 1)) AS t FROM span) u
       |  LEFT JOIN counts c ON c.t = u.t),
       |idx AS MATERIALIZED (
       |  SELECT t, CAST(c AS BIGINT) AS c,
       |    CAST(row_number() OVER (ORDER BY t) - 1 AS BIGINT) AS i
       |  FROM dense),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM idx),
       |p0 AS (SELECT t, c FROM idx WHERE i = 0),
       |$picks
       |SELECT CAST(rnk AS INT) AS rnk, CAST(t AS BIGINT) AS t,
       |  CAST(c AS BIGINT) AS c
       |FROM ($rows)""".stripMargin
  }

  val pacfSql: String = {
    val ctes = durbinLevinsonDefs.zipWithIndex.map { case ((n, e), i) =>
      val prev = if (i == 0) "pacf_base" else s"dl$i"
      s"dl${i + 1} AS MATERIALIZED (SELECT *, $e AS $n FROM $prev)"
    }
    val last = s"dl${durbinLevinsonDefs.size}"
    val pivot = (1 to PacfMaxLag)
      .map(i => s"max(CASE WHEN k = $i THEN acf END) AS r$i").mkString(", ")
    val rows = (1 to PacfMaxLag)
      .map(k => s"SELECT $k AS k, phi_${k}_$k AS pacf FROM $last")
      .mkString(" UNION ALL ")
    s"""WITH $acfCtes,
       |acf_out AS MATERIALIZED (
       |  SELECT k,
       |    floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6 + 0.5) / 1e6
       |      AS acf
       |  FROM nums CROSS JOIN den WHERE den > 0),
       |pacf_base AS MATERIALIZED (SELECT $pivot FROM acf_out),
       |${ctes.mkString(",\n")}
       |SELECT CAST(k AS BIGINT) AS k, pacf FROM ($rows) u
       |WHERE pacf IS NOT NULL""".stripMargin
  }

  /** Classical additive decomposition of the hourly series — the
    * seasonal profile extracted AFTER detrending with the period-24
    * centered moving average (the even-period 2×24 MA), the Box–Jenkins
    * companion to [[acf]]: [[seasonalityDow]] averages raw day-of-week
    * levels, which conflates trend with season; this entry removes the
    * trend first, so the profile is the pure within-day cycle.
    *
    *   trend_t    = (½c_{t−12} + Σ_{i=−11..11} c_{t+i} + ½c_{t+12}) / 24
    *   seasonal_h = mean over {t ≡ h (mod 24), full window} of
    *                (c_t − trend_t)
    *
    * Cross-engine exactness: 48·trend_t = 2·S25_t − c_{t−12} − c_{t+12}
    * is INTEGER (S25 = the 25-term window sum), so the detrended values
    * ride as dev48 = 48·c_t − 48·trend_t, summed exactly; the single
    * double division by 48·n_h happens per output row. Plan: the dense
    * series is metadata-sized, one ordered window pass (deliberately
    * single-partition — |hours| rows), one 24-key aggregate.
    */
  def decompose(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dense = denseHours(hourlyEventCounts(s, dir))
    val ord = Window.orderBy($"t")
    val frame = ord.rowsBetween(-12, 12)
    dense
      .withColumn("s25", sum($"c").over(frame))
      .withColumn("n25", count(lit(1)).over(frame))
      .withColumn("cm12", lag($"c", 12).over(ord))
      .withColumn("cp12", lead($"c", 12).over(ord))
      .where($"n25" === 25)
      .select(($"t" % 24).as("hod"),
        (lit(48) * $"c" - (lit(2) * $"s25" - $"cm12" - $"cp12")).as("dev48"))
      .groupBy($"hod")
      .agg(count(lit(1)).as("n_terms"), sum($"dev48").as("num"))
      .select($"hod", $"n_terms",
        expr("floor(CAST(num AS DOUBLE) / (48.0 * n_terms) * 1e6 + 0.5) / 1e6")
          .as("seasonal"))
  }

  val decomposeSql: String =
    """WITH counts AS (
      |  SELECT epoch_us(ts) // 3600000000 AS t, count(*) AS c
      |  FROM events GROUP BY 1),
      |span AS (SELECT min(t) AS t0, max(t) AS t1 FROM counts),
      |dense AS (
      |  SELECT u.t AS t, coalesce(c.c, 0) AS c
      |  FROM (SELECT unnest(range(t0, t1 + 1)) AS t FROM span) u
      |  LEFT JOIN counts c ON c.t = u.t),
      |win AS (
      |  SELECT t, c,
      |    sum(c) OVER (ORDER BY t ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
      |      AS s25,
      |    count(*) OVER (ORDER BY t ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
      |      AS n25,
      |    lag(c, 12) OVER (ORDER BY t) AS cm12,
      |    lead(c, 12) OVER (ORDER BY t) AS cp12
      |  FROM dense),
      |dev AS (
      |  SELECT t % 24 AS hod, 48 * c - (2 * s25 - cm12 - cp12) AS dev48
      |  FROM win WHERE n25 = 25)
      |SELECT hod, CAST(count(*) AS BIGINT) AS n_terms,
      |  floor(CAST(sum(dev48) AS DOUBLE) / (48.0 * count(*)) * 1e6 + 0.5)
      |    / 1e6 AS seasonal
      |FROM dev GROUP BY hod""".stripMargin

  /** Burst threshold on the Anscombe z (≈ 3σ under the Poisson null). */
  val PoissonBurstZ = 3.0

  /** Poisson burst detection on the hourly series — the count-correct
    * complement to [[anomalyZscore]]: a plain z-score assumes constant
    * variance, but Poisson variance EQUALS the rate, so raw z
    * over-flags busy hours and under-flags quiet ones. The Anscombe
    * transform 2·√(x + 3/8) stabilizes Poisson variance to ≈1, making
    * one threshold valid across rates:
    *
    *   λ_t = mean of the 24 STRICTLY PRECEDING hours (full window only)
    *   z_t = 2·(√(c_t + 3/8) − √(λ_t + 3/8)),  burst ⇔ z > 3
    *
    * Cross-engine exactness without any iterative math: the trailing
    * sum is integer; λ is one division; √ is IEEE-correctly-rounded on
    * both engines, so z is bit-identical — rounded 6 dp at the edge and
    * the burst flag compared on the ROUNDED value.
    */
  def poissonBurst(s: SparkSession, dir: String): DataFrame =
    poissonBurstFromCounts(hourlyEventCounts(s, dir))

  /** Burst finalize from a sparse (t, c) counts frame — shared verbatim
    * by the batch and streaming forms (same contract as
    * [[acfFromCounts]]).
    */
  private[graft] def poissonBurstFromCounts(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val trailing = Window.orderBy($"t").rowsBetween(-24, -1)
    denseHours(counts)
      .withColumn("s24", sum($"c").over(trailing))
      .withColumn("n24", count(lit(1)).over(trailing))
      .where($"n24" === 24)
      .selectExpr("t", "c",
        "floor(CAST(s24 AS DOUBLE) / 24 * 1e6 + 0.5) / 1e6 AS lambda",
        """floor(2 * (sqrt(CAST(c AS DOUBLE) + 0.375)
          |  - sqrt(CAST(s24 AS DOUBLE) / 24 + 0.375)) * 1e6 + 0.5) / 1e6
          |  AS z""".stripMargin)
      .withColumn("is_burst", $"z" > PoissonBurstZ)
  }

  val poissonBurstSql: String =
    s"""WITH counts AS (
       |  SELECT epoch_us(ts) // 3600000000 AS t, count(*) AS c
       |  FROM events GROUP BY 1),
       |span AS (SELECT min(t) AS t0, max(t) AS t1 FROM counts),
       |dense AS (
       |  SELECT u.t AS t, coalesce(c.c, 0) AS c
       |  FROM (SELECT unnest(range(t0, t1 + 1)) AS t FROM span) u
       |  LEFT JOIN counts c ON c.t = u.t),
       |win AS (
       |  SELECT t, c,
       |    sum(c) OVER (ORDER BY t ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
       |      AS s24,
       |    count(*) OVER (ORDER BY t ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
       |      AS n24
       |  FROM dense)
       |SELECT t, c,
       |  floor(CAST(s24 AS DOUBLE) / 24 * 1e6 + 0.5) / 1e6 AS lambda,
       |  floor(2 * (sqrt(CAST(c AS DOUBLE) + 0.375)
       |    - sqrt(CAST(s24 AS DOUBLE) / 24 + 0.375)) * 1e6 + 0.5) / 1e6 AS z,
       |  floor(2 * (sqrt(CAST(c AS DOUBLE) + 0.375)
       |    - sqrt(CAST(s24 AS DOUBLE) / 24 + 0.375)) * 1e6 + 0.5) / 1e6
       |    > $PoissonBurstZ AS is_burst
       |FROM win WHERE n24 = 24""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_poisson_burst" -> (poissonBurst _),
    "ev_decompose" -> (decompose _),
    "ev_acf" -> (acf _),
    "ev_pacf" -> (pacf _),
    "ev_yule_walker" -> (yuleWalker _),
    "ev_ar_forecast" -> (arForecast _),
    "ev_lttb_downsample" -> (lttbDownsample _),
    "ev_holt_winters" -> (holtWinters _),
    "ev_anomaly_mad" -> (anomalyMad _),
    "ev_ljung_box" -> (ljungBox _),
    "ev_holt_backtest" -> (holtBacktest _),
    "ev_holt_forecast" -> (holtForecast _),
    "ev_did_estimator" -> (didEstimator _),
    "ev_changepoint" -> (changepoint _),
    "ev_gini_users" -> (giniUsers _),
    "ev_ewma" -> (ewmaDaily _),
    "ev_seasonality_dow" -> (seasonalityDow _),
    "ev_ab_cuped" -> (abCuped _),
    "ev_moving_corr" -> (movingCorr _),
    "ev_survival_km" -> (survivalKm _),
    "ev_cumulative_users" -> (cumulativeUsers _),
    "ev_type_map" -> (typeMap _),
    "ev_anomaly_zscore" -> (anomalyZscore _),
    "ev_variant_props" -> (variantProps _),
    "ev_cohort_retention" -> (cohortRetention _),
    "ev_gap_fill" -> (gapFill _),
    "ev_trend_regression" -> (trendRegression _),
    "ev_ab_chisquare" -> (abChisquare _))

  def oracles: Map[String, String] = Map(
    "ev_poisson_burst" -> poissonBurstSql,
    "ev_decompose" -> decomposeSql,
    "ev_acf" -> acfSql,
    "ev_pacf" -> pacfSql,
    "ev_yule_walker" -> yuleWalkerSql,
    "ev_ar_forecast" -> arForecastSql,
    "ev_lttb_downsample" -> lttbSql,
    "ev_holt_winters" -> holtWintersSql,
    "ev_anomaly_mad" -> anomalyMadSql,
    "ev_ljung_box" -> ljungBoxSql,
    "ev_holt_backtest" -> holtBacktestSql,
    "ev_holt_forecast" -> holtForecastSql,
    "ev_did_estimator" -> didEstimatorSql,
    "ev_changepoint" -> changepointSql,
    "ev_gini_users" -> giniUsersSql,
    "ev_ewma" -> ewmaDailySql,
    "ev_seasonality_dow" -> seasonalityDowSql,
    "ev_ab_cuped" -> abCupedSql,
    "ev_moving_corr" -> movingCorrSql,
    "ev_survival_km" -> survivalKmSql,
    "ev_cumulative_users" -> cumulativeUsersSql,
    "ev_type_map" -> typeMapSql,
    "ev_anomaly_zscore" -> anomalyZscoreSql,
    "ev_variant_props" -> variantPropsSql,
    "ev_cohort_retention" -> cohortRetentionSql,
    "ev_gap_fill" -> gapFillSql,
    "ev_trend_regression" -> trendRegressionSql,
    "ev_ab_chisquare" -> abChisquareSql)
}
