package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The fork-README query surface over the `events` stream table.
  *
  * A5 time-interval count query: reference `README.md:57-69` declares
  * `get /home/time/start="1:10:2"&end="1:10:5"` → counts in [start, end];
  * output shape `(timestamp, Int)` per `README.md:29-31`.
  *
  * A6 speed-vs-batch difference (lambda reconciliation): reference
  * `README.md:9` — "Calculates the difference between real time and batch
  * (in case of data loss) and stores the result for querying".
  *
  * Temporal group keys are emitted as formatted strings so the DuckDB
  * oracle compare is precision-independent (parquet ns vs Spark µs).
  *
  * Scale notes: interval predicates push down to the parquet scan
  * (min/max row-group pruning on `ts`); the window aggregations shuffle
  * one row per (bucket, type) per partition after partial aggregation —
  * at 100 TB with a date-partitioned layout the same plan prunes to the
  * interval's partitions only.
  */
object EventOps {

  /** Epoch nanos for a UTC wall-clock literal — used in non-scan
    * predicates (CASE arms, split points) where pushdown is moot.
    */
  private def ns(isoUtc: String): Long = {
    val i = java.time.LocalDateTime.parse(isoUtc)
      .toInstant(java.time.ZoneOffset.UTC)
    i.getEpochSecond * 1000000000L + i.getNano
  }

  /** Timestamp literal for a UTC wall-clock string — SCAN-range
    * predicates are issued against the native `ts` timestamp column so
    * they push down to the parquet scan (row-group min/max pruning) on
    * the micros-native fixture vintage; an epoch-instant literal keeps
    * the comparison session-timezone-independent.
    */
  private def tsLit(isoUtc: String) =
    lit(java.time.LocalDateTime.parse(isoUtc)
      .toInstant(java.time.ZoneOffset.UTC))

  /** A5: counts + value sum per event type within [start, end). */
  def intervalCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .filter($"ts" >= tsLit("2024-01-10T00:00:00") &&
              $"ts" <  tsLit("2024-01-20T00:00:00"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  val intervalCountSql: String =
    """SELECT event_type, count(*) AS cnt,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
      |GROUP BY event_type""".stripMargin

  /** Tumbling 1-hour windows for one day (the batch shape of the
    * streaming windowed count — final state, `window()`-equivalent).
    */
  def hourlyCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .filter($"ts" >= tsLit("2024-01-05T00:00:00") &&
              $"ts" <  tsLit("2024-01-06T00:00:00"))
      .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm").as("hour"),
        $"event_type")
      .agg(count(lit(1)).as("cnt"))
  }

  val hourlyCountsSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
      |  event_type, count(*) AS cnt
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-06 00:00:00'
      |GROUP BY 1, 2""".stripMargin

  /** Sliding-window counts: 2-hour windows sliding by 1 hour (each
    * event lands in exactly two windows). `window(ts, "2 hours",
    * "1 hour")` is Spark's native sliding window — epoch-aligned starts,
    * the same enumeration the oracle restates by unioning the two
    * hour-truncated offsets per event. One shuffle on (window, type).
    */
  def slidingCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .filter($"ts" >= tsLit("2024-01-05T00:00:00") &&
              $"ts" <  tsLit("2024-01-06T00:00:00"))
      .groupBy(window($"ts", "2 hours", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm").as("win_start"),
        $"event_type", $"cnt")
  }

  val slidingCountsSql: String =
    """SELECT strftime(date_trunc('hour', ts) - (b.b * INTERVAL 1 HOUR),
      |    '%Y-%m-%d %H:%M') AS win_start,
      |  event_type, count(*) AS cnt
      |FROM events CROSS JOIN (SELECT unnest(range(0, 2)) AS b) b
      |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-06 00:00:00'
      |GROUP BY 1, 2""".stripMargin

  /** A6: lambda reconciliation. The "speed" table simulates data loss
    * (drops every event_id ≡ 0 mod 97, as a receiver losing messages);
    * the "batch" table sees everything. Per (day, type): both counts and
    * their difference, via full-outer join on the group keys.
    */
  def lambdaDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"),
        $"event_type", $"event_id")
    val batch = ev.groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("batch_cnt"))
    val speed = ev.filter($"event_id" % 97 =!= 0)
      .groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("speed_cnt"))
    batch.join(speed, Seq("day", "event_type"), "full_outer")
      .select($"day", $"event_type",
        coalesce($"batch_cnt", lit(0L)).as("batch_cnt"),
        coalesce($"speed_cnt", lit(0L)).as("speed_cnt"),
        (coalesce($"batch_cnt", lit(0L)) - coalesce($"speed_cnt", lit(0L))).as("lost"))
  }

  val lambdaDiffSql: String =
    """WITH ev AS (
      |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |    event_type, event_id
      |  FROM events),
      |batch AS (
      |  SELECT day, event_type, count(*) AS batch_cnt FROM ev GROUP BY 1, 2),
      |speed AS (
      |  SELECT day, event_type, count(*) AS speed_cnt FROM ev
      |  WHERE event_id % 97 <> 0 GROUP BY 1, 2)
      |SELECT coalesce(batch.day, speed.day) AS day,
      |  coalesce(batch.event_type, speed.event_type) AS event_type,
      |  coalesce(batch_cnt, 0) AS batch_cnt,
      |  coalesce(speed_cnt, 0) AS speed_cnt,
      |  coalesce(batch_cnt, 0) - coalesce(speed_cnt, 0) AS lost
      |FROM batch FULL OUTER JOIN speed
      |  ON batch.day = speed.day AND batch.event_type = speed.event_type""".stripMargin

  /** Per-user session stats via window lag: a new session starts after a
    * >30 min gap. Batch analog of `flatMapGroupsWithState` sessionization —
    * one shuffle on user_id, in-partition sort by ts.
    */
  def sessionStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_ns")
    Tables.events(s, dir)
      .select($"user_id", $"ts_ns")
      .withColumn("prev_ns", lag($"ts_ns", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ns".isNull ||
          $"ts_ns" - $"prev_ns" > 1800L * 1000000000L, 1L)
          .otherwise(0L))
      .groupBy($"user_id")
      .agg(sum($"new_session").as("n_sessions"), count(lit(1)).as("n_events"))
  }

  val sessionStatsSql: String =
    """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
      |FROM (
      |  SELECT user_id,
      |    CASE WHEN lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |           OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts)
      |              > 1800000000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events)
      |GROUP BY user_id""".stripMargin

  /** Same per-user sessionization through Spark's BUILT-IN
    * `session_window` aggregation — the merging-session-window state
    * operator, vs [[sessionStats]]'s lag-gap window formulation. Note
    * the boundary semantics differ: `session_window` windows are
    * half-open `[ts, ts+gap)`, so an event exactly `gap` after its
    * predecessor starts a NEW session (the lag form's `>` keeps it);
    * the oracle restates the `>=` rule at µs precision (the timestamp
    * resolution Spark compares at after the nanos→µs derivation).
    */
  def sessionWindowStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"user_id", $"ts")
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("evts"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum($"evts").cast("long").as("n_events"))
  }

  val sessionWindowStatsSql: String =
    """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events
      |FROM (
      |  SELECT user_id,
      |    CASE WHEN lag(epoch_ns(ts) // 1000)
      |             OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |           OR (epoch_ns(ts) // 1000) - lag(epoch_ns(ts) // 1000)
      |             OVER (PARTITION BY user_id ORDER BY ts) >= 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events)
      |GROUP BY user_id""".stripMargin

  /** Peak session concurrency per day — the sweep-line analytic:
    * sessionize per user (30-min gap rule at µs), explode each session
    * to (+1 at start, −1 at end) boundary events, prefix-sum the
    * boundary stream, and take the per-day max. Concurrency AT a
    * timestamp counts sessions that have started and not yet ended
    * BEFORE it (starts inclusive, ends exclusive via the lagged
    * cumulative), so coincident end+start pairs still register the
    * overlap — the convention is part of the oracle contract.
    *
    * Scale note: the boundary prefix-sum runs as the segmented
    * parallel scan ([[Scans.segmentedCumSum]] — per-shard partial sums
    * + broadcast carry offsets over day buckets), so no stage funnels
    * the ~2·sessions boundary rows into one partition; the
    * sessionize/explode/aggregate stages before it are already
    * shuffle-partitioned.
    */
  def peakConcurrency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_us")
    val sess = Tables.events(s, dir)
      .select(expr("ts_ns div 1000").as("ts_us"), $"user_id")
      .withColumn("prev", lag($"ts_us", 1).over(byUser))
      .withColumn("new_s", when($"prev".isNull ||
        $"ts_us" - $"prev" > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum($"new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(min($"ts_us").as("start_us"), max($"ts_us").as("end_us"))
    val perTs = sess.select($"start_us".as("ts_us"), lit(1L).as("delta"))
      .unionByName(sess.select($"end_us".as("ts_us"), lit(-1L).as("delta")))
      .groupBy($"ts_us")
      .agg(sum(when($"delta" === 1L, 1L).otherwise(0L)).as("starts"),
        sum(when($"delta" === -1L, 1L).otherwise(0L)).as("ends"))
    // segmented sweep: day-bucket shards (monotone in ts_us) scanned in
    // parallel with broadcast carries — the 100 TB form of the global
    // ordered window this scaladoc used to describe in prose
    Scans.segmentedCumSum(
      perTs.withColumn("__shard", expr("ts_us div 86400000000")),
      "__shard", Seq($"ts_us"), Seq(($"starts", "cs"), ($"ends", "ce")))
      .withColumn("conc", $"cs" - ($"ce" - $"ends"))
      .select(date_format(timestamp_micros($"ts_us"), "yyyy-MM-dd").as("day"), $"conc")
      .groupBy($"day").agg(max($"conc").as("peak_concurrency"))
  }

  val peakConcurrencySql: String =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
      |lagd AS (
      |  SELECT user_id, ts_us,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |           OR ts_us - lag(ts_us) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      |sess0 AS (
      |  SELECT user_id, ts_us,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM lagd),
      |sess AS (
      |  SELECT user_id, sid, min(ts_us) AS start_us, max(ts_us) AS end_us
      |  FROM sess0 GROUP BY 1, 2),
      |bounds AS (
      |  SELECT start_us AS ts_us, 1 AS delta FROM sess
      |  UNION ALL SELECT end_us, -1 FROM sess),
      |per_ts AS (
      |  SELECT ts_us,
      |    sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS starts,
      |    sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS ends
      |  FROM bounds GROUP BY 1),
      |scan AS (
      |  SELECT ts_us,
      |    sum(starts) OVER w - (sum(ends) OVER w - ends) AS conc
      |  FROM per_ts WINDOW w AS (ORDER BY ts_us
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT strftime(make_timestamp(ts_us), '%Y-%m-%d') AS day,
      |  CAST(max(conc) AS BIGINT) AS peak_concurrency
      |FROM scan GROUP BY 1""".stripMargin

  /** Event-type transition matrix — the first-order Markov model of
    * user journeys (view→click→purchase probabilities): consecutive
    * event pairs per user (µs order, event_id tie-break), counted and
    * row-normalized. One user_id shuffle for the lag window, one tiny
    * aggregate; the model output is |types|² rows regardless of scale.
    */
  def typeTransitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id")
      .orderBy($"ts_us", $"event_id")
    val pairs = Tables.events(s, dir)
      .select($"user_id", $"event_id", $"event_type",
        expr("ts_ns div 1000").as("ts_us"))
      .withColumn("prev_type", lag($"event_type", 1).over(byUser))
      .where($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type")
      .agg(count(lit(1)).as("cnt"))
    val totals = Window.partitionBy($"prev_type")
    pairs.withColumn("prob",
      round($"cnt".cast("double") / sum($"cnt").over(totals), 6))
  }

  val typeTransitionsSql: String =
    """WITH pairs AS (
      |  SELECT prev_type, event_type, count(*) AS cnt FROM (
      |    SELECT event_type,
      |      lag(event_type) OVER (PARTITION BY user_id
      |        ORDER BY epoch_us(ts), event_id) AS prev_type
      |    FROM events)
      |  WHERE prev_type IS NOT NULL
      |  GROUP BY 1, 2)
      |SELECT prev_type, event_type, cnt,
      |  round(CAST(cnt AS DOUBLE)
      |    / sum(cnt) OVER (PARTITION BY prev_type), 6) AS prob
      |FROM pairs""".stripMargin

  /** Stationary distribution of the event-type Markov chain — the
    * long-run visit mix implied by [[typeTransitions]], the readout a
    * journey model publishes next to the raw matrix. Semantics are
    * DEFINED in integers so both engines agree bit-for-bit: transition
    * probabilities and the distribution live in micro-units
    * (floor(x·1e6 + 0.5)), and each of the [[MarkovIters]] power
    * iterations is π′_j = floor(Σ_i π_i·p_ij / 1e6) — pure BIGINT
    * arithmetic (products ≤ 5·10¹², no float drift, floor leakage
    * ≤ |types| micro-units per round is part of the contract).
    *
    * Scale: the chain state is |types| rows; each iteration is one
    * broadcast-sized join + aggregate. The interesting scaling is in
    * building the matrix (one lag window over user timelines — the
    * [[typeTransitions]] shape); everything after is metadata-sized.
    */
  val MarkovIters = 10

  /** The converged distribution frame is memoized per (session, events
    * fingerprint) — [[markovEntropy]] consumes it too, so the ten
    * checkpointed iterations run once per corpus (the BPE/dedup
    * materialize-once contract).
    */
  private val piCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), DataFrame]

  def markovStationary(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cached(piCache, s, Similarity.dataKey(dir, "events"),
      "ev_markov_pi")(
      markovStationaryUncached(s, dir))

  private def markovStationaryUncached(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val pairs = Tables.events(s, dir)
      .select($"user_id", $"event_id", $"event_type",
        expr("ts_ns div 1000").as("ts_us"))
      .withColumn("prev_type", lag($"event_type", 1).over(byUser))
      .where($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type")
      .agg(count(lit(1)).as("cnt"))
    val trans = pairs
      .withColumn("total", sum($"cnt").over(Window.partitionBy($"prev_type")))
      .selectExpr("prev_type", "event_type",
        "CAST(floor(CAST(cnt AS DOUBLE) / total * 1e6 + 0.5) AS BIGINT) AS p_micro")
      .localCheckpoint()
    val types = trans.select($"prev_type".as("event_type")).distinct()
    val nTypes = types.agg(count(lit(1)).as("n"))
    var pi = types.crossJoin(broadcast(nTypes))
      .selectExpr("event_type", "CAST(floor(1e6 / n) AS BIGINT) AS pi_micro")
      .localCheckpoint()
    for (_ <- 1 to MarkovIters) {
      // `div` (integer floor division on positive longs), NOT `/`
      // (which Spark resolves to double division on Columns)
      pi = pi.join(trans, pi("event_type") === trans("prev_type"))
        .groupBy(trans("event_type").as("event_type"))
        .agg(expr("CAST(sum(pi_micro * p_micro) div 1000000 AS BIGINT)")
          .as("pi_micro"))
        .localCheckpoint()
    }
    pi.selectExpr("event_type", "pi_micro",
      "CAST(pi_micro AS DOUBLE) / 1e6 AS pi")
  }

  val markovStationarySql: String = {
    val iters = (1 to MarkovIters).map { k =>
      s"""pi$k AS (
         |  SELECT t.event_type,
         |    CAST(sum(p.pi_micro * t.p_micro) // 1000000 AS BIGINT) AS pi_micro
         |  FROM pi${k - 1} p JOIN t ON t.prev_type = p.event_type
         |  GROUP BY t.event_type)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT prev_type, event_type, count(*) AS cnt FROM (
       |    SELECT event_type,
       |      lag(event_type) OVER (PARTITION BY user_id
       |        ORDER BY epoch_us(ts), event_id) AS prev_type
       |    FROM events)
       |  WHERE prev_type IS NOT NULL
       |  GROUP BY 1, 2),
       |t AS (
       |  SELECT prev_type, event_type,
       |    CAST(floor(CAST(cnt AS DOUBLE)
       |      / sum(cnt) OVER (PARTITION BY prev_type) * 1e6 + 0.5) AS BIGINT) AS p_micro
       |  FROM pairs),
       |types AS (SELECT DISTINCT prev_type AS event_type FROM t),
       |n AS (SELECT count(*) AS n FROM types),
       |pi0 AS (
       |  SELECT event_type, CAST(floor(1e6 / n) AS BIGINT) AS pi_micro
       |  FROM types CROSS JOIN n),
       |$iters
       |SELECT event_type, pi_micro,
       |  CAST(pi_micro AS DOUBLE) / 1e6 AS pi
       |FROM pi$MarkovIters""".stripMargin
  }

  /** Entropy rate of the event-type chain: H = Σ_i π_i · H(row i) with
    * H(row) = −Σ_j p_ij·ln(p_ij) — "how predictable is the next user
    * action", the journey-model readout that pairs with the stationary
    * distribution it reuses. Per-cell terms are computed in doubles
    * from the SAME micro-probabilities both engines derived (ln over
    * identical doubles — the adamic-adar/zipf-fit precedent), then
    * 6-dp-rounded into DECIMAL(18,9) so the cross-cell sum is
    * aggregation-order-proof. Output: one row (n_states, entropy_rate,
    * max_entropy = ln(n_states), normalized ratio).
    */
  def markovEntropy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val pairs = Tables.events(s, dir)
      .select($"user_id", $"event_id", $"event_type",
        expr("ts_ns div 1000").as("ts_us"))
      .withColumn("prev_type", lag($"event_type", 1).over(byUser))
      .where($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type")
      .agg(count(lit(1)).as("cnt"))
    val trans = pairs
      .withColumn("total", sum($"cnt").over(Window.partitionBy($"prev_type")))
      .selectExpr("prev_type", "event_type",
        "CAST(floor(CAST(cnt AS DOUBLE) / total * 1e6 + 0.5) AS BIGINT) AS p_micro")
    val pi = markovStationary(s, dir).select($"event_type".as("prev_type"),
      $"pi_micro")
    trans.join(pi, "prev_type")
      .where($"p_micro" > 0)
      .selectExpr(
        """CAST(floor(
          |  (CAST(pi_micro AS DOUBLE) / 1e6)
          |    * -((CAST(p_micro AS DOUBLE) / 1e6) * ln(CAST(p_micro AS DOUBLE) / 1e6))
          |  * 1e6 + 0.5) / 1e6 AS DECIMAL(18,9)) AS term""".stripMargin,
        "prev_type")
      .agg(
        countDistinct($"prev_type").as("n_states"),
        sum($"term").cast("double").as("entropy_rate"))
      .selectExpr("n_states", "entropy_rate",
        "ln(CAST(n_states AS DOUBLE)) AS max_entropy",
        "floor(entropy_rate / ln(CAST(n_states AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS normalized")
  }

  val markovEntropySql: String =
    s"""WITH pairs AS (
       |  SELECT prev_type, event_type, count(*) AS cnt FROM (
       |    SELECT event_type,
       |      lag(event_type) OVER (PARTITION BY user_id
       |        ORDER BY epoch_us(ts), event_id) AS prev_type
       |    FROM events)
       |  WHERE prev_type IS NOT NULL
       |  GROUP BY 1, 2),
       |t AS (
       |  SELECT prev_type, event_type,
       |    CAST(floor(CAST(cnt AS DOUBLE)
       |      / sum(cnt) OVER (PARTITION BY prev_type) * 1e6 + 0.5) AS BIGINT) AS p_micro
       |  FROM pairs),
       |pi AS (
       |  SELECT event_type AS prev_type, pi_micro
       |  FROM ($markovStationarySql)),
       |terms AS (
       |  SELECT t.prev_type,
       |    CAST(floor(
       |      (CAST(pi_micro AS DOUBLE) / 1e6)
       |        * -((CAST(p_micro AS DOUBLE) / 1e6) * ln(CAST(p_micro AS DOUBLE) / 1e6))
       |      * 1e6 + 0.5) / 1e6 AS DECIMAL(18,9)) AS term
       |  FROM t JOIN pi ON pi.prev_type = t.prev_type
       |  WHERE p_micro > 0)
       |SELECT CAST(count(DISTINCT prev_type) AS BIGINT) AS n_states,
       |  CAST(sum(term) AS DOUBLE) AS entropy_rate,
       |  ln(CAST(count(DISTINCT prev_type) AS DOUBLE)) AS max_entropy,
       |  floor(CAST(sum(term) AS DOUBLE) / ln(CAST(count(DISTINCT prev_type) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS normalized
       |FROM terms""".stripMargin

  /** Bot-traffic flagging — the abuse filter a pipeline runs before
    * user events feed any training statistic: per user, the peak
    * events-per-minute burst and the overall rate, flagged when either
    * crosses its threshold. Pure integer thresholds (no rate division
    * until the final report, and that one is micro-floored), so the
    * flag decision is engine-exact.
    *
    * Scale: one (user, minute) count — map-side combinable — then one
    * per-user aggregate; both shuffles key on user_id. No windows, no
    * state: this is deliberately the cheapest possible shape because it
    * runs over EVERYTHING before any sampling.
    */
  val BotBurstPerMin = 5L

  def botFlags(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perMin = Tables.events(s, dir)
      .select($"user_id", expr("ts_ns div 60000000000").as("minute"))
      .groupBy($"user_id", $"minute")
      .agg(count(lit(1)).as("n"))
    perMin.groupBy($"user_id")
      .agg(sum($"n").as("n_events"),
        count(lit(1)).as("active_minutes"),
        max($"n").as("max_per_min"))
      .selectExpr("user_id", "n_events", "active_minutes", "max_per_min",
        "floor(CAST(n_events AS DOUBLE) / active_minutes * 1e6 + 0.5) / 1e6 AS mean_per_active_min",
        s"max_per_min >= $BotBurstPerMin AS is_bot")
  }

  val botFlagsSql: String =
    s"""WITH pm AS (
       |  SELECT user_id, epoch_ns(ts) // 60000000000 AS minute,
       |    count(*) AS n
       |  FROM events GROUP BY 1, 2)
       |SELECT user_id,
       |  CAST(sum(n) AS BIGINT) AS n_events,
       |  CAST(count(*) AS BIGINT) AS active_minutes,
       |  CAST(max(n) AS BIGINT) AS max_per_min,
       |  floor(CAST(sum(n) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS mean_per_active_min,
       |  max(n) >= $BotBurstPerMin AS is_bot
       |FROM pm GROUP BY user_id""".stripMargin

  /** Hitting probability of the Markov chain: P[reach `purchase` within
    * [[MarkovIters]] steps | start type] — the absorption readout
    * journey analysis pairs with [[markovStationary]] (how likely does
    * each entry behavior convert, horizon-bounded). Same micro-unit
    * matrix, same pure-BIGINT iteration: v′_i = floor(Σ_j p_ij·t_j/1e6)
    * where t_j is 1e6 for the absorbing type and v_j otherwise
    * (truncated Neumann recursion — the bounded-horizon form that
    * terminates by construction, no inversion).
    */
  def markovHitting(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val pairs = Tables.events(s, dir)
      .select($"user_id", $"event_id", $"event_type",
        expr("ts_ns div 1000").as("ts_us"))
      .withColumn("prev_type", lag($"event_type", 1).over(byUser))
      .where($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type")
      .agg(count(lit(1)).as("cnt"))
    val trans = pairs
      .withColumn("total", sum($"cnt").over(Window.partitionBy($"prev_type")))
      .selectExpr("prev_type", "event_type",
        "CAST(floor(CAST(cnt AS DOUBLE) / total * 1e6 + 0.5) AS BIGINT) AS p_micro")
      .localCheckpoint()
    var v = trans.select($"prev_type".as("event_type")).distinct()
      .selectExpr("event_type", "CAST(0 AS BIGINT) AS h_micro")
      .localCheckpoint()
    for (_ <- 1 to MarkovIters) {
      v = trans.join(v.withColumnRenamed("event_type", "dst"),
          trans("event_type") === col("dst"))
        .selectExpr("prev_type",
          "p_micro * (CASE WHEN dst = 'purchase' THEN 1000000 ELSE h_micro END) AS term")
        .groupBy($"prev_type".as("event_type"))
        .agg(expr("CAST(sum(term) div 1000000 AS BIGINT)").as("h_micro"))
        .localCheckpoint()
    }
    v.selectExpr("event_type", "h_micro",
      "CAST(h_micro AS DOUBLE) / 1e6 AS hit_prob")
  }

  val markovHittingSql: String = {
    val iters = (1 to MarkovIters).map { k =>
      s"""v$k AS (
         |  SELECT t.prev_type AS event_type,
         |    CAST(sum(t.p_micro * (CASE WHEN t.event_type = 'purchase'
         |      THEN 1000000 ELSE v.h_micro END)) // 1000000 AS BIGINT) AS h_micro
         |  FROM t JOIN v${k - 1} v ON v.event_type = t.event_type
         |  GROUP BY t.prev_type)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT prev_type, event_type, count(*) AS cnt FROM (
       |    SELECT event_type,
       |      lag(event_type) OVER (PARTITION BY user_id
       |        ORDER BY epoch_us(ts), event_id) AS prev_type
       |    FROM events)
       |  WHERE prev_type IS NOT NULL
       |  GROUP BY 1, 2),
       |t AS (
       |  SELECT prev_type, event_type,
       |    CAST(floor(CAST(cnt AS DOUBLE)
       |      / sum(cnt) OVER (PARTITION BY prev_type) * 1e6 + 0.5) AS BIGINT) AS p_micro
       |  FROM pairs),
       |v0 AS (
       |  SELECT DISTINCT prev_type AS event_type, CAST(0 AS BIGINT) AS h_micro
       |  FROM t),
       |$iters
       |SELECT event_type, h_micro,
       |  CAST(h_micro AS DOUBLE) / 1e6 AS hit_prob
       |FROM v$MarkovIters""".stripMargin
  }

  /** Time-constrained conversion — the sequential-pattern query the
    * unbounded [[funnel]] can't express: for EVERY click (not just the
    * first), did the same user's next purchase land within one hour?
    * Built on the forward as-of join ([[AsOfJoin.asOfForward]]) — each
    * click matched to its next purchase in one shuffle, then a
    * window-bounded gap predicate; MATCH_RECOGNIZE-style step
    * constraints reduce to as-of joins plus gap filters, which is how
    * this engine expresses them at scale.
    */
  def timedConversion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id".as("key"), expr("ts_ns div 1000").as("t"),
        $"event_id")
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id".as("key"), expr("ts_ns div 1000").as("t"),
        $"event_id".as("p_id"))
    val hit = when($"r_t".isNotNull &&
      $"r_t" - $"t" <= 3600L * 1000000L, 1L).otherwise(0L)
    AsOfJoin.asOfForward(clicks, purchases)
      .agg(count(lit(1)).as("n_clicks"),
        sum(hit).as("converted_1h"),
        round(sum(hit).cast("double") / count(lit(1)), 6).as("conv_rate"))
  }

  val timedConversionSql: String =
    """WITH j AS (
      |  SELECT c.event_id,
      |    epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |  FROM (SELECT user_id, event_id, -epoch_us(ts) AS nt, ts
      |        FROM events WHERE event_type = 'click') c
      |  ASOF LEFT JOIN (SELECT user_id, -epoch_us(ts) AS nt, ts
      |        FROM events WHERE event_type = 'purchase') p
      |    ON c.user_id = p.user_id AND c.nt >= p.nt)
      |SELECT count(*) AS n_clicks,
      |  CAST(sum(CASE WHEN gap_us IS NOT NULL AND gap_us <= 3600000000
      |    THEN 1 ELSE 0 END) AS BIGINT) AS converted_1h,
      |  round(CAST(sum(CASE WHEN gap_us IS NOT NULL AND gap_us <= 3600000000
      |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS conv_rate
      |FROM j""".stripMargin

  /** DAU / WAU / stickiness — the activity analytics every event
    * pipeline serves. WAU is a distinct-count over a SLIDING 7-day
    * window, which does not partial-aggregate directly; the scalable
    * formulation EXPLODES each (day, user) activity row into the 7
    * window-days it contributes to, then distinct-counts per window day
    * — an equi-shuffle (no range join, no per-day re-scan), which is
    * the 100 TB shape. Stickiness = DAU/WAU.
    */
  def dauWau(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val du = Tables.events(s, dir)
      .select(to_date($"ts").as("day"), $"user_id").distinct()
    val dau = du.groupBy($"day").agg(count(lit(1)).as("dau"))
    val wau = du
      .select($"day", $"user_id", explode(sequence(lit(0), lit(6))).as("i"))
      .select(expr("date_add(day, i)").as("wday"), $"user_id").distinct()
      .groupBy($"wday").agg(count(lit(1)).as("wau"))
    dau.join(wau, $"day" === $"wday")
      .select(date_format($"day", "yyyy-MM-dd").as("day"), $"dau", $"wau",
        round($"dau".cast("double") / $"wau", 6).as("stickiness"))
  }

  val dauWauSql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY 1),
      |contrib AS (
      |  SELECT DISTINCT day + CAST(i.i AS INTEGER) AS wday, user_id
      |  FROM du CROSS JOIN (SELECT unnest(range(0, 7)) AS i) i),
      |wau AS (SELECT wday, count(*) AS wau FROM contrib GROUP BY 1)
      |SELECT strftime(d.day, '%Y-%m-%d') AS day,
      |  CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
      |  round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
      |FROM dau d JOIN wau w ON w.wday = d.day""".stripMargin

  /** Rolling 7-day event volume: frame-bounded window aggregation
    * (ROWS BETWEEN 6 PRECEDING), integer-exact on both engines. One
    * shuffle on event_type, sort by day within partition.
    */
  def rolling7d(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .groupBy(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"),
        $"event_type")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(-6, 0)
    daily.withColumn("cnt_7d", sum($"cnt").over(w))
  }

  val rolling7dSql: String =
    """SELECT day, event_type, cnt,
      |  CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day
      |                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS cnt_7d
      |FROM (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |        event_type, count(*) AS cnt
      |      FROM events GROUP BY 1, 2)""".stripMargin

  /** Array-function surface: the distinct event types per user as a
    * deterministic sorted-joined string (array columns don't hash
    * portably in the oracle compare; a canonical string does).
    */
  def userEventTypes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(
        array_join(sort_array(collect_set($"event_type")), ",").as("types"),
        size(collect_set($"event_type")).as("n_types"))
  }

  val userEventTypesSql: String =
    """SELECT user_id,
      |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
      |  count(DISTINCT event_type) AS n_types
      |FROM events GROUP BY user_id""".stripMargin

  /** Funnel analysis: users progressing view → click → purchase in
    * temporal order (first occurrence of each stage must be ordered).
    * One shuffle on user_id with conditional min aggregates — no
    * self-joins, no row explosion.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(
        min(when($"event_type" === "view", $"ts_ns")).as("t_view"),
        min(when($"event_type" === "click", $"ts_ns")).as("t_click"),
        min(when($"event_type" === "purchase", $"ts_ns")).as("t_purchase"))
      .agg(
        count(lit(1)).as("n_users"),
        count(when($"t_view".isNotNull, 1)).as("viewed"),
        count(when($"t_view" < $"t_click", 1)).as("clicked_after_view"),
        count(when($"t_view" < $"t_click" && $"t_click" < $"t_purchase", 1))
          .as("purchased_after_funnel"))
  }

  val funnelSql: String =
    """SELECT count(*) AS n_users,
      |  count(*) FILTER (t_view IS NOT NULL) AS viewed,
      |  count(*) FILTER (t_view < t_click) AS clicked_after_view,
      |  count(*) FILTER (t_view < t_click AND t_click < t_purchase) AS purchased_after_funnel
      |FROM (
      |  SELECT user_id,
      |    min(epoch_ns(ts)) FILTER (event_type = 'view') AS t_view,
      |    min(epoch_ns(ts)) FILTER (event_type = 'click') AS t_click,
      |    min(epoch_ns(ts)) FILTER (event_type = 'purchase') AS t_purchase
      |  FROM events GROUP BY user_id)""".stripMargin

  /** Cohort retention: for each user's first-seen day, how many users
    * were active again N days later. Two aggregations; the day math is
    * integral (epoch days) so both engines agree exactly.
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val days = Tables.events(s, dir)
      .select($"user_id",
        expr("ts_ns div 86400000000000").as("day"))
      .distinct()
    val first = days.groupBy($"user_id").agg(min($"day").as("day0"))
    days.join(first, "user_id")
      .groupBy(($"day" - $"day0").as("day_offset"))
      .agg(countDistinct($"user_id").as("active_users"))
  }

  val retentionSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
      |  FROM events),
      |first AS (SELECT user_id, min(day) AS day0 FROM days GROUP BY user_id)
      |SELECT d.day - f.day0 AS day_offset,
      |  count(DISTINCT d.user_id) AS active_users
      |FROM days d JOIN first f ON d.user_id = f.user_id
      |GROUP BY 1""".stripMargin

  /** Trailing-hour event count per event via a RANGE window frame —
    * the value-based frame Spark plans differently from ROWS (frame
    * bounds resolved against the µs time value, peers included
    * regardless of physical order, so the result is deterministic under
    * ties). Windows at µs because that is the finest granularity both
    * engines read identically from the nanos parquet column.
    */
  def rangeWindowCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"event_type").orderBy($"ts_us")
      .rangeBetween(-3600L * 1000000L, 0)
    Tables.events(s, dir)
      .select($"event_id", $"event_type",
        expr("ts_ns div 1000").as("ts_us"))
      .select($"event_id", $"event_type",
        count(lit(1)).over(w).as("cnt_1h"))
  }

  val rangeWindowCountSql: String =
    """SELECT event_id, event_type,
      |  count(*) OVER (PARTITION BY event_type ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS cnt_1h
      |FROM events""".stripMargin

  /** Top user-journey paths — sequence mining lite: each 30-min-gap
    * session becomes its ordered event-type string (µs order, event_id
    * tie-break — fully deterministic), then the corpus-wide top-20
    * paths by frequency. The per-session list is bounded by session
    * length (the sessionization gap bounds it in practice); the path
    * aggregate is a plain map-side-combinable wordcount over path
    * strings; top-k is TakeOrderedAndProject. The query every product
    * team runs on the funnel the Markov matrix ([[typeTransitions]])
    * models one step at a time.
    */
  def sessionPaths(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    Tables.events(s, dir)
      .select($"user_id", $"event_id", $"event_type",
        expr("ts_ns div 1000").as("ts_us"))
      .withColumn("prev", lag($"ts_us", 1).over(byUser))
      .withColumn("new_s",
        when($"prev".isNull || $"ts_us" - $"prev" > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum($"new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(concat_ws(">",
        transform(array_sort(collect_list(struct($"ts_us", $"event_id",
          $"event_type"))), x => x.getField("event_type"))).as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n_sessions"))
      .orderBy($"n_sessions".desc, $"path")
      .limit(20)
  }

  val sessionPathsSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      |  FROM events),
      |lagd AS (
      |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |      OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sess AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM lagd),
      |paths AS (
      |  SELECT user_id, sid,
      |    string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
      |  FROM sess GROUP BY user_id, sid)
      |SELECT path, count(*) AS n_sessions
      |FROM paths GROUP BY path
      |ORDER BY n_sessions DESC, path
      |LIMIT 20""".stripMargin

  /** Longest consecutive-day activity streak per user — the
    * gaps-and-islands idiom (engagement streaks, SLA uptime runs): a
    * user's active days minus their per-user rank collapse to one
    * constant date per unbroken run, so islands fall out of ONE window
    * and ONE aggregate, entirely in date/integer arithmetic. The
    * window partitions by user_id (the natural shuffle key); streak
    * length and island count are exact bigints.
    */
  def userStreaks(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val days = Tables.events(s, dir)
      .select($"user_id", to_date($"ts").as("day")).distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    days
      .withColumn("rn", row_number().over(w))
      .withColumn("island", expr("date_sub(day, rn)"))
      .groupBy($"user_id", $"island")
      .agg(count(lit(1)).as("streak"))
      .groupBy($"user_id")
      .agg(sum($"streak").as("n_active_days"),
        max($"streak").as("longest_streak"),
        count(lit(1)).as("n_streaks"))
  }

  val userStreaksSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |islands AS (
      |  SELECT user_id,
      |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
      |      AS INTEGER) AS island
      |  FROM days),
      |streaks AS (
      |  SELECT user_id, island, CAST(count(*) AS BIGINT) AS streak
      |  FROM islands GROUP BY 1, 2)
      |SELECT user_id, CAST(sum(streak) AS BIGINT) AS n_active_days,
      |  max(streak) AS longest_streak,
      |  CAST(count(*) AS BIGINT) AS n_streaks
      |FROM streaks GROUP BY user_id""".stripMargin

  /** Multi-touch attribution — the fractional-credit generalization of
    * the as-of LAST-touch family ([[AsOfJoin]] queries give the whole
    * conversion to one click; real marketing mixes need every touch
    * paid). For each purchase, the user's clicks in the strict 7-day
    * lookback window are the touch set, ordered by (ts, event_id);
    * credit is assigned two ways at once: LINEAR (1/n each) and
    * POSITION-BASED / U-shaped (40% first, 40% last, 20% spread over
    * the middle; n=2 splits 50/50, n=1 takes all). Credits are pinned
    * to integer micro-units (floor(1e6·x + 0.5), same IEEE sequence
    * both engines) so the per-channel rollup is an exact long sum.
    * Channel = props.k mod 5, decoded once through the VARIANT path
    * (parse once, extract many).
    * Scale shape: purchases⋈clicks equi-join on user_id (per-user
    * activity is human-bounded, the sessionization-family rationale);
    * ONE exchange on conv_id carries both the position window and the
    * per-conversion count; the channel rollup is a 6-key map-side
    * combinable aggregate with an exact distinct over conversions.
    */
  def attributionMultitouch(s: SparkSession, dir: String): DataFrame =
    attributionMultitouchOf(Tables.events(s, dir)
      .selectExpr("event_id", "user_id", "event_type", "(ts_ns div 1000) AS t_us",
        "CAST(variant_get(try_parse_json(props), '$.k', 'int') AS BIGINT) % 5 AS channel"))

  /** Attribution over any (event_id, user_id, event_type, t_us,
    * channel) frame — factored for planted-fixture specs.
    */
  def attributionMultitouchOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = ev.sparkSession
    import s.implicits._
    val WeekUs = 7L * 86400L * 1000000L
    val purch = ev.where($"event_type" === "purchase")
      .select($"user_id", $"t_us".as("pt"), $"event_id".as("conv_id"))
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id", $"t_us".as("ct"), $"event_id".as("click_id"), $"channel")
    val w = Window.partitionBy($"conv_id")
    purch.join(clicks, Seq("user_id"))
      .where($"ct" < $"pt" && $"ct" >= $"pt" - WeekUs)
      .withColumn("pos", row_number().over(w.orderBy($"ct".asc, $"click_id".asc)))
      .withColumn("n", count(lit(1)).over(w))
      .selectExpr("channel", "conv_id",
        "CAST(floor(1e6 / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS lin_micro",
        """CASE WHEN n = 1 THEN CAST(1000000 AS BIGINT)
          |  WHEN pos = 1 OR pos = n THEN
          |    CASE WHEN n = 2 THEN CAST(500000 AS BIGINT)
          |         ELSE CAST(400000 AS BIGINT) END
          |  ELSE CAST(floor(200000.0 / CAST(n - 2 AS DOUBLE) + 0.5) AS BIGINT)
          |END AS pos_micro""".stripMargin)
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_touches"),
        countDistinct($"conv_id").as("n_conversions"),
        (sum($"lin_micro").cast("double") / lit(1e6)).as("linear_credit"),
        (sum($"pos_micro").cast("double") / lit(1e6)).as("position_credit"))
  }

  val attributionMultitouchSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS channel
      |  FROM events),
      |p AS (SELECT user_id, t_us AS pt, event_id AS conv_id
      |      FROM ev WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, t_us AS ct, event_id AS click_id, channel
      |      FROM ev WHERE event_type = 'click'),
      |t AS (
      |  SELECT p.conv_id, c.channel,
      |    row_number() OVER (PARTITION BY p.conv_id
      |      ORDER BY c.ct, c.click_id) AS pos,
      |    count(*) OVER (PARTITION BY p.conv_id) AS n
      |  FROM p JOIN c ON c.user_id = p.user_id
      |   AND c.ct < p.pt AND c.ct >= p.pt - 604800000000)
      |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
      |  CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions,
      |  CAST(sum(CAST(floor(1e6 / CAST(n AS DOUBLE) + 0.5) AS BIGINT))
      |    AS DOUBLE) / 1e6 AS linear_credit,
      |  CAST(sum(CASE WHEN n = 1 THEN CAST(1000000 AS BIGINT)
      |    WHEN pos = 1 OR pos = n THEN
      |      CASE WHEN n = 2 THEN CAST(500000 AS BIGINT)
      |           ELSE CAST(400000 AS BIGINT) END
      |    ELSE CAST(floor(200000.0 / CAST(n - 2 AS DOUBLE) + 0.5) AS BIGINT)
      |  END) AS DOUBLE) / 1e6 AS position_credit
      |FROM t GROUP BY channel""".stripMargin

  /** Per-event temporal feature assembly — the feature-engineering
    * shape that turns an event log into training rows: for every
    * purchase, the previous purchase value (lag), microseconds since
    * it (inter-arrival gap), the running 3-event mean (trailing ROWS
    * frame), and the per-user sequence number. ONE exchange on user_id
    * carries all four window computations (same partitioning + the
    * same (t_us, event_id) total order — Spark plans a single sort);
    * per-user history is human-bounded, so no partition outgrows an
    * executor at any corpus scale. The trailing mean sums
    * exact-decimal values over the 3-row frame and divides by the
    * frame's actual row count (1 or 2 at the head), floor-pinned.
    */
  def lagFeatures(s: SparkSession, dir: String): DataFrame =
    lagFeaturesOf(Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .selectExpr("event_id", "user_id", "(ts_ns div 1000) AS t_us", "value"))

  /** Lag features over any (event_id, user_id, t_us, value) frame —
    * factored for planted-fixture specs.
    */
  def lagFeaturesOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = ev.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t_us".asc, $"event_id".asc)
    val w3 = w.rowsBetween(-2, 0)
    ev
      .withColumn("seq", row_number().over(w))
      .withColumn("prev_value", lag($"value", 1).over(w))
      .withColumn("gap_us", $"t_us" - lag($"t_us", 1).over(w))
      .withColumn("roll3_sum", sum($"value".cast(Exact.dec)).over(w3))
      .withColumn("roll3_n", count(lit(1)).over(w3))
      .selectExpr("event_id", "user_id", "seq", "value", "prev_value", "gap_us",
        "floor(CAST(roll3_sum AS DOUBLE) / roll3_n * 1e6 + 0.5) / 1e6 AS roll3_mean")
  }

  val lagFeaturesSql: String =
    """SELECT event_id, user_id,
      |  row_number() OVER w AS seq,
      |  value,
      |  lag(value, 1) OVER w AS prev_value,
      |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
      |  floor(CAST(sum(CAST(value AS DECIMAL(18,2)))
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |    * 1e6 + 0.5) / 1e6 AS roll3_mean
      |FROM events
      |WHERE event_type = 'purchase'
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_lag_features" -> (lagFeatures _),
    "ev_attribution_multitouch" -> (attributionMultitouch _),
    "ev_user_streaks" -> (userStreaks _),
    "ev_session_paths" -> (sessionPaths _),
    "ev_range_window" -> (rangeWindowCount _),
    "ev_funnel" -> (funnel _),
    "ev_retention" -> (retention _),
    "ev_user_event_types" -> (userEventTypes _),
    "ev_rolling_7d" -> (rolling7d _),
    "ev_interval_count" -> (intervalCount _),
    "ev_hourly_counts" -> (hourlyCounts _),
    "ev_sliding_counts" -> (slidingCounts _),
    "ev_lambda_diff" -> (lambdaDiff _),
    "ev_session_stats" -> (sessionStats _),
    "ev_session_window" -> (sessionWindowStats _),
    "ev_peak_concurrency" -> (peakConcurrency _),
    "ev_dau_wau" -> (dauWau _),
    "ev_timed_conversion" -> (timedConversion _),
    "ev_type_transitions" -> (typeTransitions _),
    "ev_markov_stationary" -> (markovStationary _),
    "ev_markov_hitting" -> (markovHitting _),
    "ev_bot_flags" -> (botFlags _),
    "ev_markov_entropy" -> (markovEntropy _))

  def oracles: Map[String, String] = Map(
    "ev_lag_features" -> lagFeaturesSql,
    "ev_attribution_multitouch" -> attributionMultitouchSql,
    "ev_user_streaks" -> userStreaksSql,
    "ev_session_paths" -> sessionPathsSql,
    "ev_range_window" -> rangeWindowCountSql,
    "ev_funnel" -> funnelSql,
    "ev_retention" -> retentionSql,
    "ev_user_event_types" -> userEventTypesSql,
    "ev_rolling_7d" -> rolling7dSql,
    "ev_interval_count" -> intervalCountSql,
    "ev_hourly_counts" -> hourlyCountsSql,
    "ev_sliding_counts" -> slidingCountsSql,
    "ev_lambda_diff" -> lambdaDiffSql,
    "ev_session_stats" -> sessionStatsSql,
    "ev_session_window" -> sessionWindowStatsSql,
    "ev_peak_concurrency" -> peakConcurrencySql,
    "ev_dau_wau" -> dauWauSql,
    "ev_timed_conversion" -> timedConversionSql,
    "ev_type_transitions" -> typeTransitionsSql,
    "ev_markov_stationary" -> markovStationarySql,
    "ev_markov_hitting" -> markovHittingSql,
    "ev_bot_flags" -> botFlagsSql,
    "ev_markov_entropy" -> markovEntropySql)
}
