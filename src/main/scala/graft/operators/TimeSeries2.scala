package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Second time-series module: cross-series shape comparison (banded
  * dynamic time warping) and state-space filtering (local-level Kalman)
  * over the event stream's daily counts — the "compare and denoise the
  * series you already chart" layer downstream of [[TimeSeries]]'s
  * gap-filled counts (reference semantics: the rolling-count bolt
  * family of kafka-storm-starter, extended to the aligned-series
  * analytics its consumers run; see
  * reference/storm-starter/src/.../RollingCountBolt.java:35 for the
  * bucketed-counts contract this layer assumes).
  *
  * Scale notes:
  *   - Both operators reduce the corpus ONCE via the map-side-combinable
  *     (type, day) count; everything after is metadata-sized: |types|
  *     series rows of |span| daily values each (a series is bounded by
  *     the calendar span, not the event count — 10× more events is the
  *     same DP size).
  *   - DTW pairs are |types|·(|types|−1)/2 rows — bounded by the type
  *     vocabulary, never by events. The banded DP is O(|span|·w) work
  *     per pair inside ONE codegen'd higher-order expression (no UDF,
  *     no driver collect). At 100 TB the plan shape is: scan → partial
  *     agg → 32-partition final agg → 10-row nested-loop pairing.
  *   - The Sakoe–Chiba band (w = [[DtwBand]]) is the scale control: an
  *     unbanded DP is O(|span|²) per pair and, worse, lets the warp
  *     path drift arbitrarily — banding is both the speedup and the
  *     standard regularization.
  */
object TimeSeries2 {

  /** Sakoe–Chiba band half-width: cells with |i − j| > band are +∞. */
  val DtwBand = 7

  /** Sentinel "infinity" for out-of-band / boundary DP cells. Integer
    * costs keep the whole DP in exact BIGINT arithmetic on both
    * engines, so there is no rounding discipline to match — only the
    * final per-step normalization divides, once, with the micro-floor.
    */
  val DtwInf = "1000000000000000"

  /** Banded DTW distance between every unordered pair of per-type
    * daily count series (gap-filled over the global span so the series
    * are aligned and equal-length). The DP is the classic
    *   dp(i,j) = |xᵢ − yⱼ| + min(dp(i−1,j), dp(i,j−1), dp(i−1,j−1))
    * with dp(0,0) = 0 and +∞ boundaries, evaluated as ONE nested
    * `aggregate` higher-order expression per pair: the outer fold
    * carries the previous DP row, the inner fold builds the new row
    * left-to-right (position 1 holds the j = 0 boundary, so the three
    * neighbor lookups need no edge cases — row 0 alone holds the 0 at
    * position 1).
    *
    * Output: one row per pair with the raw integer DTW cost and the
    * per-step cost (cost / |span|), the series-length-free readout.
    */
  def dtwPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_type", to_date($"ts").as("day"))
    val counts = ev.groupBy($"event_type", $"day").agg(count(lit(1)).as("cnt"))
    val span = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
    val filled = ev.select($"event_type").distinct()
      .crossJoin(broadcast(span))
      .select($"event_type",
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .join(counts, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", coalesce($"cnt", lit(0L)).as("cnt"))
    val ser = filled.groupBy($"event_type")
      .agg(transform(array_sort(collect_list(struct($"day", $"cnt"))),
        c => c("cnt")).as("xs"))
    val pairs = ser.select($"event_type".as("type_a"), $"xs")
      .join(ser.select($"event_type".as("type_b"), $"xs".as("ys")),
        $"type_a" < $"type_b")
      .withColumn("t", size($"xs"))
    val inf = s"CAST($DtwInf AS BIGINT)"
    val dpExpr = expr(
      s"""element_at(
         |  aggregate(
         |    sequence(1, t),
         |    concat(array(CAST(0 AS BIGINT)),
         |           transform(sequence(1, t), z -> $inf)),
         |    (prev, i) -> aggregate(
         |      sequence(1, t),
         |      array($inf),
         |      (row, j) -> array_append(row,
         |        IF(abs(i - j) > $DtwBand, $inf,
         |           abs(element_at(xs, i) - element_at(ys, j))
         |             + least(element_at(prev, j + 1),
         |                     element_at(row, j),
         |                     element_at(prev, j)))))),
         |  t + 1)""".stripMargin)
    pairs.select($"type_a", $"type_b", dpExpr.as("dtw"),
      expr("floor(dtw / t * 1e6 + 0.5) / 1e6").as("dtw_per_step"))
  }

  val dtwPairsSql: String = {
    val inf = s"CAST($DtwInf AS BIGINT)"
    s"""WITH RECURSIVE ev AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
       |counts AS (
       |  SELECT event_type, day, count(*) AS cnt FROM ev GROUP BY 1, 2),
       |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
       |days AS (
       |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM span),
       |scaffold AS (
       |  SELECT t.event_type, d.day
       |  FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN days d),
       |filled AS (
       |  SELECT s.event_type, s.day, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
       |  FROM scaffold s LEFT JOIN counts c
       |    ON s.event_type = c.event_type AND s.day = c.day),
       |ser AS (
       |  SELECT event_type, list(cnt ORDER BY day) AS xs FROM filled GROUP BY 1),
       |pairs AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |         a.xs AS xs, b.xs AS ys, len(a.xs) AS t
       |  FROM ser a JOIN ser b ON a.event_type < b.event_type),
       |dp AS (
       |  SELECT type_a, type_b, xs, ys, t, 0 AS c,
       |    [CAST(0 AS BIGINT)] || list_transform(range(t), z -> $inf) AS win
       |  FROM pairs
       |  UNION ALL
       |  SELECT type_a, type_b, xs, ys, t, c + 1,
       |    win[2:] || [CASE WHEN abs((c // t + 1) - (c % t + 1)) > $DtwBand
       |        THEN $inf
       |        ELSE abs(xs[CAST(c // t + 1 AS INTEGER)]
       |               - ys[CAST(c % t + 1 AS INTEGER)])
       |          + least(win[2],
       |                  CASE WHEN c % t + 1 >= 2
       |                       THEN win[CAST(t + 1 AS INTEGER)] ELSE $inf END,
       |                  CASE WHEN c % t + 1 >= 2 OR c // t + 1 = 1
       |                       THEN win[1] ELSE $inf END)
       |        END]
       |  FROM dp WHERE c < t * t)
       |SELECT type_a, type_b, win[CAST(t + 1 AS INTEGER)] AS dtw,
       |  floor(win[CAST(t + 1 AS INTEGER)] / t * 1e6 + 0.5) / 1e6 AS dtw_per_step
       |FROM dp WHERE c = t * t""".stripMargin
  }

  // ---------------------------------------- local-level Kalman filter

  /** Kalman window (days, anchored at max(day)) — long enough that the
    * gain schedule is effectively steady: it converges geometrically at
    * rate (1 − K∞)² ≈ 0.61 per step, so K₁₆ − K∞ ≈ 2·10⁻⁴ — under a
    * tenth of a percent of the gain, far below the model's own q/r
    * specification uncertainty. (The window is also bounded by the
    * fixture's 30-day span: a longer anchor-back window would pad
    * phantom zero days before the first observation.)
    */
  val KalmanWindow = 16

  /** Process variance q and observation variance r of the local-level
    * model  levelₜ = levelₜ₋₁ + N(0,q),  yₜ = levelₜ + N(0,r).
    * q/r = 1/16 puts the steady-state gain at ≈ 0.22 — a ~4.5-day
    * effective memory, the "smooth but current" dashboard setting.
    */
  val KalmanQ = 4.0
  val KalmanR = 64.0

  /** The local-level Kalman filter's defining property at scale: the
    * gain schedule Kₜ is DATA-INDEPENDENT (the covariance recursion
    *   P⁻ₜ = Pₜ₋₁ + q,  Kₜ = P⁻ₜ/(P⁻ₜ + r),  Pₜ = (1 − Kₜ)·P⁻ₜ
    * never touches an observation), so the filtered level is a fixed
    * linear combination of the window's counts:
    *   l_W = Σₜ wₜ·yₜ,  wₜ = Kₜ·Π_{s>t}(1 − Kₛ)   (K₁ := 1, P₁ := r).
    * The weights are computed once here in BigDecimal and embedded as
    * plain-string literals consumed VERBATIM by both engines (the
    * [[TimeSeries.holtCoeffs]] convention) — the 18-dp quantization of
    * the weight vector IS the model, so cross-engine exactness holds by
    * construction. Returns (filter weights w, one-step-back weights w′
    * i.e. l_{W−1} padded with a trailing 0, last gain K_W, last P_W).
    */
  val kalmanCoeffs: (Seq[String], Seq[String], String, String) = {
    val W = KalmanWindow
    val mc = new java.math.MathContext(40)
    val q = BigDecimal(KalmanQ, mc); val r = BigDecimal(KalmanR, mc)
    val gains = scala.collection.mutable.ArrayBuffer(BigDecimal(1))
    var p = r
    for (_ <- 2 to W) {
      val pPred = p + q
      val k = (pPred / (pPred + r))(mc)
      gains += k
      p = (BigDecimal(1) - k) * pPred
    }
    def weights(upTo: Int): Seq[BigDecimal] = (1 to upTo).map { t =>
      var w = gains(t - 1)
      for (s <- t + 1 to upTo) w *= (BigDecimal(1) - gains(s - 1))
      w
    }
    def s18(x: BigDecimal): String =
      x.setScale(18, BigDecimal.RoundingMode.HALF_UP).underlying.toPlainString
    // the two scalar constants go straight through a DECIMAL→DOUBLE
    // cast on each engine, which double-rounds differently once the
    // numerator passes 2⁵³ (the PLANS_r8 gotcha) — pre-round them to
    // 6 dp so the cast is exact on both sides. The weight vectors stay
    // 18 dp: they are summed as decimals and scale-9-rounded BEFORE
    // their one double cast, which keeps the numerator under 2⁵³.
    def s6(x: BigDecimal): String =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).underlying.toPlainString
    (weights(W).map(s18),
      (weights(W - 1).map(s18)) :+ s18(BigDecimal(0)),
      s6(gains(W - 1)), s6(p))
  }

  /** Filtered level, one-step forecast, and last-day innovation of each
    * event type's daily count series over the last [[KalmanWindow]]
    * days — plus the (data-independent) steady gain and error variance,
    * the model diagnostics a monitoring page shows next to the line.
    *
    * Shape: identical to `ev_holt_forecast` — one map-side-combinable
    * daily count, a |types|·W scaffold off the approved 1-row max(day)
    * broadcast, ONE aggregate with exact-decimal weight products,
    * scale-9 round, then the double cast. 100 TB cost = the count scan.
    */
  def kalmanLevel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (wf, wp, kLast, pLast) = kalmanCoeffs
    val W = KalmanWindow
    def arr(ws: Seq[String]): Column =
      array(ws.map(w => lit(w).cast("decimal(30,18)")): _*)
    val ev = Tables.events(s, dir)
      .select($"event_type", to_date($"ts").as("day"))
    val counts = ev.groupBy($"event_type", $"day")
      .agg(count(lit(1)).cast("decimal(8,0)").as("cnt"))
    val mx = ev.agg(max($"day").as("dmax"))
    val scaffold = ev.select($"event_type").distinct()
      .crossJoin(broadcast(mx))
      .select($"event_type", explode(sequence(lit(0), lit(W - 1))).as("k"),
        $"dmax")
      .select($"event_type", $"k",
        expr(s"date_sub(dmax, $W - 1 - k)").as("day"))
    scaffold.join(counts, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce($"cnt", lit(0).cast("decimal(8,0)")))
      .groupBy($"event_type")
      .agg(
        round(sum($"cnt" * element_at(arr(wf), $"k" + 1)), 9)
          .cast("double").as("level"),
        round(sum($"cnt" * element_at(arr(wf), $"k" + 1)), 9)
          .cast("double").as("forecast_next"),
        round(sum($"cnt" * (when($"k" === W - 1, lit(1).cast("decimal(30,18)"))
            .otherwise(lit(0).cast("decimal(30,18)"))
          - element_at(arr(wp), $"k" + 1))), 9)
          .cast("double").as("innovation_last"))
      .withColumn("steady_gain", expr(s"CAST('$kLast' AS DOUBLE)"))
      .withColumn("level_var", expr(s"CAST('$pLast' AS DOUBLE)"))
  }

  val kalmanLevelSql: String = {
    val (wf, wp, kLast, pLast) = kalmanCoeffs
    val W = KalmanWindow
    def list(ws: Seq[String]): String =
      ws.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH ev AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
       |counts AS (
       |  SELECT event_type, day, CAST(count(*) AS DECIMAL(8,0)) AS cnt
       |  FROM ev GROUP BY 1, 2),
       |mx AS (SELECT max(day) AS dmax FROM ev),
       |scaffold AS (
       |  SELECT t.event_type, k.k, dmax - CAST($W - 1 - k.k AS INTEGER) AS day
       |  FROM (SELECT DISTINCT event_type FROM ev) t
       |  CROSS JOIN (SELECT unnest(range(0, $W)) AS k) k
       |  CROSS JOIN mx),
       |joined AS (
       |  SELECT s.event_type, s.k, coalesce(c.cnt, 0) AS cnt
       |  FROM scaffold s LEFT JOIN counts c
       |    ON c.event_type = s.event_type AND c.day = s.day)
       |SELECT event_type,
       |  CAST(round(sum(cnt * CAST(${list(wf)}[k + 1] AS DECIMAL(30,18))), 9)
       |    AS DOUBLE) AS level,
       |  CAST(round(sum(cnt * CAST(${list(wf)}[k + 1] AS DECIMAL(30,18))), 9)
       |    AS DOUBLE) AS forecast_next,
       |  CAST(round(sum(cnt * (CASE WHEN k = $W - 1
       |        THEN CAST(1 AS DECIMAL(30,18)) ELSE CAST(0 AS DECIMAL(30,18)) END
       |      - CAST(${list(wp)}[k + 1] AS DECIMAL(30,18)))), 9)
       |    AS DOUBLE) AS innovation_last,
       |  CAST('$kLast' AS DOUBLE) AS steady_gain,
       |  CAST('$pLast' AS DOUBLE) AS level_var
       |FROM joined GROUP BY event_type""".stripMargin
  }

  // ------------------------------------------------ Theta forecasting

  /** Theta-method window (days, anchored at max(day)) — matches
    * [[TimeSeries.HoltWindow]] so the two forecasters read the same
    * series slice and their one-step-ahead numbers are comparable.
    */
  val ThetaWindow = 8

  /** Theta-method coefficient vectors (Assimakopoulos & Nikolopoulos
    * 2000, the M3-winning two-line form): the forecast is the mean of
    *   θ=0 line: OLS trend extrapolated one step, and
    *   θ=2 line: SES (α = ½) over zₜ = 2yₜ − trend(t),
    * both LINEAR in the window observations — so, like
    * [[kalmanCoeffs]], the whole method reduces to fixed weight
    * vectors derived once by unit-vector propagation in BigDecimal and
    * embedded as identical 18-dp literals in both engines (the
    * quantized vectors ARE the model; cross-engine exactness is by
    * construction). Returns (trend-forecast weights, SES-line weights,
    * theta = their mean — a third literal vector, so NO engine-side
    * decimal division whose scale rules could differ) over window
    * offsets 0 (oldest) .. W−1.
    */
  val thetaCoeffs: (Seq[String], Seq[String], Seq[String]) = {
    val W = ThetaWindow
    def s18(x: BigDecimal): String =
      x.setScale(18, BigDecimal.RoundingMode.HALF_UP).underlying.toPlainString
    val xbar = BigDecimal(W - 1) / 2
    val sxx = (0 until W).map(t => (BigDecimal(t) - xbar).pow(2)).sum
    val coeffs = (0 until W).map { j =>
      val y = Vector.tabulate(W)(i =>
        if (i == j) BigDecimal(1) else BigDecimal(0))
      val b = (0 until W).map(t => (BigDecimal(t) - xbar) * y(t)).sum / sxx
      val a = y.sum / W - b * xbar
      val fLin = a + b * W
      val z = Vector.tabulate(W)(t => 2 * y(t) - (a + b * t))
      var l = z(0)
      for (t <- 1 until W) l = (z(t) + l) / 2
      (fLin, l, (fLin + l) / 2)
    }
    (coeffs.map(c => s18(c._1)), coeffs.map(c => s18(c._2)),
      coeffs.map(c => s18(c._3)))
  }

  /** Theta-method one-step forecast of each event type's daily counts
    * over the last [[ThetaWindow]] days: the trend and SES components
    * plus their mean (the theta forecast) — the M3-competition
    * benchmark forecaster beside Holt ([[TimeSeries.holtForecast]])
    * and the Kalman level ([[kalmanLevel]]), giving the volume
    * dashboard a family of comparable one-steps.
    *
    * Shape: `ev_holt_forecast`'s exactly — one map-side-combinable
    * daily count, the approved 1-row max(day) scaffold broadcast, ONE
    * aggregate of exact decimal dot products.
    */
  def thetaForecast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (wl, ws, wt) = thetaCoeffs
    val W = ThetaWindow
    val lArr = array(wl.map(x => lit(x).cast("decimal(30,18)")): _*)
    val sArr = array(ws.map(x => lit(x).cast("decimal(30,18)")): _*)
    val tArr = array(wt.map(x => lit(x).cast("decimal(30,18)")): _*)
    val ev = Tables.events(s, dir)
      .select($"event_type", to_date($"ts").as("day"))
    val counts = ev.groupBy($"event_type", $"day")
      .agg(count(lit(1)).cast("decimal(8,0)").as("cnt"))
    val mx = ev.agg(max($"day").as("dmax"))
    val scaffold = ev.select($"event_type").distinct()
      .crossJoin(broadcast(mx))
      .select($"event_type", explode(sequence(lit(0), lit(W - 1))).as("k"),
        $"dmax")
      .select($"event_type", $"k",
        expr(s"date_sub(dmax, $W - 1 - k)").as("day"))
    scaffold.join(counts, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce($"cnt", lit(0).cast("decimal(8,0)")))
      .groupBy($"event_type")
      .agg(
        round(sum($"cnt" * element_at(lArr, $"k" + 1)), 9)
          .cast("double").as("trend_component"),
        round(sum($"cnt" * element_at(sArr, $"k" + 1)), 9)
          .cast("double").as("ses_component"),
        round(sum($"cnt" * element_at(tArr, $"k" + 1)), 9)
          .cast("double").as("theta_forecast"))
  }

  val thetaForecastSql: String = {
    val (wl, ws, wt) = thetaCoeffs
    val W = ThetaWindow
    def list(xs: Seq[String]): String =
      xs.map(x => s"'$x'").mkString("[", ", ", "]")
    s"""WITH ev AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
       |counts AS (
       |  SELECT event_type, day, CAST(count(*) AS DECIMAL(8,0)) AS cnt
       |  FROM ev GROUP BY 1, 2),
       |mx AS (SELECT max(day) AS dmax FROM ev),
       |scaffold AS (
       |  SELECT t.event_type, k.k, dmax - CAST($W - 1 - k.k AS INTEGER) AS day
       |  FROM (SELECT DISTINCT event_type FROM ev) t
       |  CROSS JOIN (SELECT unnest(range(0, $W)) AS k) k
       |  CROSS JOIN mx),
       |joined AS (
       |  SELECT s.event_type, s.k, coalesce(c.cnt, 0) AS cnt
       |  FROM scaffold s LEFT JOIN counts c
       |    ON c.event_type = s.event_type AND c.day = s.day)
       |SELECT event_type,
       |  CAST(round(sum(cnt * CAST(${list(wl)}[k + 1] AS DECIMAL(30,18))), 9)
       |    AS DOUBLE) AS trend_component,
       |  CAST(round(sum(cnt * CAST(${list(ws)}[k + 1] AS DECIMAL(30,18))), 9)
       |    AS DOUBLE) AS ses_component,
       |  CAST(round(sum(cnt * CAST(${list(wt)}[k + 1] AS DECIMAL(30,18))), 9)
       |    AS DOUBLE) AS theta_forecast
       |FROM joined GROUP BY event_type""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_dtw" -> (dtwPairs _),
    "ev_kalman_level" -> (kalmanLevel _),
    "ev_theta_forecast" -> (thetaForecast _))

  def oracles: Map[String, String] = Map(
    "ev_dtw" -> dtwPairsSql,
    "ev_kalman_level" -> kalmanLevelSql,
    "ev_theta_forecast" -> thetaForecastSql)
}
