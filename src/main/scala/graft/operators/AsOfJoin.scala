package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (temporal) join — an operator Spark's DataFrame API lacks.
  *
  * Semantics: for each left row, attach the single right row with the
  * greatest right-time ≤ left-time within the same key (LEFT ASOF JOIN
  * ≥-semantics, exactly DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND
  * l.ts >= r.ts`, which is the oracle for this query).
  *
  * Implementation = preference (a), composition of built-ins
  * (SURVEY.md §2 guidance): union both sides tagged, one hash shuffle
  * on the key, one in-partition sort on (time, side), then
  * `last(right_value, ignoreNulls)` over an unbounded-preceding window
  * carries the most recent right row forward into each left row.
  *
  * Scale: identical movement to a sort-merge join — shuffle both inputs
  * by key once, sort once; state per partition is one row of carried
  * right values. No range explosion, no per-key collect. Skewed keys
  * shard like any SMJ (AQE skew handling applies to the exchange).
  */
object AsOfJoin {

  /** Generic as-of: left(key, t, payloadL) ⨝asof right(key, t, payloadR).
    * `left`/`right` must each expose `key`, `t` plus their payload
    * columns; payload column sets must be disjoint.
    */
  def asOf(left: DataFrame, right: DataFrame): DataFrame = {
    val s = left.sparkSession
    import s.implicits._
    val rightPayload = right.columns.filterNot(c => c == "key" || c == "t")
    val leftPayload = left.columns.filterNot(c => c == "key" || c == "t")
    // validate the column contract up front: a colliding payload name
    // would otherwise surface as an opaque ambiguous-column analysis
    // error (or silently wrong selection) deep inside the union/window
    for (side <- Seq("left" -> left, "right" -> right); c <- Seq("key", "t"))
      require(side._2.columns.contains(c),
        s"asOf: ${side._1} input must have a '$c' column, " +
          s"got [${side._2.columns.mkString(", ")}]")
    val overlap = leftPayload.intersect(rightPayload)
    require(overlap.isEmpty,
      s"asOf: payload column names must be disjoint between sides; " +
        s"both have [${overlap.mkString(", ")}] — rename before joining")
    val reserved = (leftPayload ++ rightPayload).filter(c =>
      c == "is_left" || c == "_r" || c == "_rv" || c == "r_t")
    require(reserved.isEmpty,
      s"asOf: [${reserved.mkString(", ")}] collide with columns the " +
        "operator builds internally (is_left, _r, _rv, r_t) — rename them")
    val lTagged = left.withColumn("is_left", lit(1))
      .select(Seq(col("key"), col("t"), col("is_left")) ++
        leftPayload.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right.withColumn("is_left", lit(0))
      .select(Seq(col("key"), col("t"), col("is_left")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col): _*)
    // right rows sort before left rows at equal t ⇒ `>=` semantics.
    // The right payload is carried as ONE struct (with r_t inside): a
    // per-column last(ignoreNulls) would splice fields from different
    // right rows whenever a payload field is legitimately null — the
    // struct is non-null per right row, so the match is always a single
    // actual right row (or null when no right row precedes).
    //
    // The struct itself is the final sort key: when two right rows share
    // (key, t), `last` deterministically picks the field-wise greatest
    // payload — without it the carried row would depend on partition
    // file order. Callers whose oracle engine makes its own arbitrary
    // pick at ties (DuckDB ASOF) should additionally pre-dedup the
    // right side to one row per (key, t) with the same greatest-payload
    // rule, as purchaseAttribution/nextErrorFollowup do.
    val unioned = lTagged.unionByName(rTagged)
      .withColumn("_rv", when($"is_left" === 0,
        struct(($"t".as("r_t")) +: rightPayload.map(col): _*)))
    val w = Window.partitionBy($"key")
      .orderBy($"t".asc, $"is_left".asc, $"_rv".asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned
      .withColumn("_r", last($"_rv", ignoreNulls = true).over(w))
    carried.where($"is_left" === 1)
      .select(Seq(col("key"), col("t")) ++ leftPayload.map(col) ++
        rightPayload.map(c => col(s"_r.$c").as(c)) :+
        col("_r.r_t").as("r_t"): _*)
  }

  /** Purchase→click attribution: each purchase matched to the same
    * user's most recent click at or before it (classic attribution
    * as-of). Both engines compare at µs (DuckDB truncates parquet nanos
    * to µs on read), and the click side is pre-deduped to one row per
    * (user, µs) keeping the max event_id — the stated tie rule, so a
    * same-µs duplicate click can never make the oracle's arbitrary
    * ASOF pick diverge from ours.
    */
  def purchaseAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id".as("key"), expr("ts_ns div 1000").as("t"),
        $"event_id")
    val clicks = ev.where($"event_type" === "click")
      .groupBy($"user_id".as("key"), expr("ts_ns div 1000").as("t"))
      .agg(max($"event_id").as("click_event_id"))
    asOf(purchases, clicks)
      .selectExpr("event_id", "key AS user_id", "click_event_id",
        "t - r_t AS gap_us")
  }

  val purchaseAttributionSql: String =
    """SELECT p.event_id, p.user_id, c.click_event_id, p.t - c.t AS gap_us
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS t
      |      FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, epoch_us(ts) AS t,
      |        max(event_id) AS click_event_id
      |      FROM events WHERE event_type = 'click' GROUP BY 1, 2) c
      |  ON p.user_id = c.user_id AND p.t >= c.t""".stripMargin

  /** FORWARD as-of: for each left row, the FIRST right row with
    * right-time ≥ left-time (the "next event after" join — lookahead
    * attribution, next-quote pricing). Implemented by time negation
    * over the backward operator: greatest −rt ≤ −lt IS smallest
    * rt ≥ lt, ties inclusive on both directions — one line, same
    * single-shuffle SMJ-shaped movement, no second code path to keep
    * correct.
    */
  def asOfForward(left: DataFrame, right: DataFrame): DataFrame =
    asOf(left.withColumn("t", -col("t")), right.withColumn("t", -col("t")))
      .withColumn("t", -col("t"))
      .withColumn("r_t", -col("r_t"))

  /** Purchase → next error follow-up: each purchase matched to the same
    * user's first error AT OR AFTER it (did the purchase precede a
    * failure?). Times at µs so the DuckDB comparison is exact; the
    * oracle drives DuckDB's native ASOF over negated epochs — the same
    * reduction, asserted cross-engine.
    */
  def nextErrorFollowup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id".as("key"), expr("ts_ns div 1000").as("t"),
        $"event_id")
    // same tie rule as purchaseAttribution: one error per (user, µs),
    // max event_id wins — keeps DuckDB's arbitrary ASOF tie pick moot
    val errors = ev.where($"event_type" === "error")
      .groupBy($"user_id".as("key"), expr("ts_ns div 1000").as("t"))
      .agg(max($"event_id").as("error_event_id"))
    asOfForward(purchases, errors)
      .selectExpr("event_id", "key AS user_id", "error_event_id",
        "r_t - t AS gap_us")
  }

  val nextErrorFollowupSql: String =
    """SELECT p.event_id, p.user_id, e.error_event_id,
      |  (-e.nt) - (-p.nt) AS gap_us
      |FROM (SELECT user_id, event_id, -epoch_us(ts) AS nt
      |      FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, -epoch_us(ts) AS nt,
      |        max(event_id) AS error_event_id
      |      FROM events WHERE event_type = 'error' GROUP BY 1, 2) e
      |  ON p.user_id = e.user_id AND p.nt >= e.nt""".stripMargin

  /** NEAREST as-of — the third direction (backward and forward above):
    * each left row matched to the time-CLOSEST right row in either
    * direction, ties to the backward match. Where the composed form
    * would run two as-of joins plus a re-join, this is ONE shuffled
    * sort with BOTH window directions over the same partition:
    * `last(ignoreNulls)` over the preceding frame carries the most
    * recent right row (≤ t), `first(ignoreNulls)` over the strictly-
    * following frame the next one (> t — same-µs rights sort before the
    * left row, so they are backward matches, never double-counted).
    * Right side pre-dedup'd to one row per (key, µs) (max event_id),
    * the family's tie rule.
    *
    * Query: each click matched to its nearest purchase; gap_us is
    * SIGNED (negative = purchase before the click).
    */
  def nearestPurchase(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id".as("key"), expr("ts_ns div 1000").as("t"),
        $"event_id")
    val purchases = ev.where($"event_type" === "purchase")
      .groupBy($"user_id".as("key"), expr("ts_ns div 1000").as("t"))
      .agg(max($"event_id").as("pid"))
    val lTagged = clicks.withColumn("is_left", lit(1))
      .select($"key", $"t", $"is_left", $"event_id",
        lit(null).cast("struct<r_t:bigint,pid:bigint>").as("_rv"))
    val rTagged = purchases.withColumn("is_left", lit(0))
      .select($"key", $"t", $"is_left", lit(null).cast("long").as("event_id"),
        struct($"t".as("r_t"), $"pid").as("_rv"))
    val sorted = Window.partitionBy($"key").orderBy($"t".asc, $"is_left".asc)
    val prevW = sorted.rowsBetween(Window.unboundedPreceding, 0)
    val nextW = sorted.rowsBetween(1, Window.unboundedFollowing)
    lTagged.unionByName(rTagged)
      .withColumn("prev", last($"_rv", ignoreNulls = true).over(prevW))
      .withColumn("next", first($"_rv", ignoreNulls = true).over(nextW))
      .where($"is_left" === 1)
      .withColumn("pick",
        when($"prev".isNull, $"next")
          .when($"next".isNull, $"prev")
          .when($"t" - $"prev.r_t" <= $"next.r_t" - $"t", $"prev")
          .otherwise($"next"))
      .select($"event_id".as("click_id"), $"pick.pid".as("purchase_id"),
        ($"pick.r_t" - $"t").as("gap_us"))
  }

  val nearestPurchaseSql: String =
    """WITH c AS (
      |  SELECT event_id AS cid, user_id, epoch_us(ts) AS ct
      |  FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, epoch_us(ts) AS pt, max(event_id) AS pid
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |ranked AS (
      |  SELECT c.cid, p.pid, p.pt - c.ct AS gap_us,
      |    row_number() OVER (PARTITION BY c.cid ORDER BY
      |      abs(p.pt - c.ct),
      |      CASE WHEN p.pt <= c.ct THEN 0 ELSE 1 END) AS rn
      |  FROM c JOIN p ON p.user_id = c.user_id)
      |SELECT c.cid AS click_id, r.pid AS purchase_id, r.gap_us
      |FROM c LEFT JOIN ranked r ON r.cid = c.cid AND r.rn = 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_purchase_attribution" -> (purchaseAttribution _),
    "asof_next_error" -> (nextErrorFollowup _),
    "asof_nearest_purchase" -> (nearestPurchase _))

  def oracles: Map[String, String] = Map(
    "asof_purchase_attribution" -> purchaseAttributionSql,
    "asof_next_error" -> nextErrorFollowupSql,
    "asof_nearest_purchase" -> nearestPurchaseSql)
}
