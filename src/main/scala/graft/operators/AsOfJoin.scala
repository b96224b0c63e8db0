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
      c == "is_left" || c == "_r" || c == "r_t")
    require(reserved.isEmpty,
      s"asOf: [${reserved.mkString(", ")}] collide with columns the " +
        "operator builds internally (is_left, _r, r_t) — rename them")
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
    val w = Window.partitionBy($"key")
      .orderBy($"t".asc, $"is_left".asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("_r",
        last(when($"is_left" === 0,
          struct(($"t".as("r_t")) +: rightPayload.map(col): _*)),
          ignoreNulls = true).over(w))
    carried.where($"is_left" === 1)
      .select(Seq(col("key"), col("t")) ++ leftPayload.map(col) ++
        rightPayload.map(c => col(s"_r.$c").as(c)) :+
        col("_r.r_t").as("r_t"): _*)
  }

  /** Purchase→click attribution: each purchase matched to the same
    * user's most recent click at or before it (classic attribution
    * as-of). `gap_ns` stays integral — exact on both engines.
    */
  def purchaseAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id".as("key"), $"ts_ns".as("t"), $"event_id")
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id".as("key"), $"ts_ns".as("t"),
        $"event_id".as("click_event_id"))
    // gap in µs: DuckDB truncates parquet nanos to µs timestamps on
    // read, so µs is the finest exactly-comparable granularity
    asOf(purchases, clicks)
      .selectExpr("event_id", "key AS user_id", "click_event_id",
        "(t div 1000) - (r_t div 1000) AS gap_us")
  }

  val purchaseAttributionSql: String =
    """SELECT p.event_id, p.user_id, c.event_id AS click_event_id,
      |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

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
    val errors = ev.where($"event_type" === "error")
      .select($"user_id".as("key"), expr("ts_ns div 1000").as("t"),
        $"event_id".as("error_event_id"))
    asOfForward(purchases, errors)
      .selectExpr("event_id", "key AS user_id", "error_event_id",
        "r_t - t AS gap_us")
  }

  val nextErrorFollowupSql: String =
    """SELECT p.event_id, p.user_id, e.event_id AS error_event_id,
      |  epoch_us(e.ts) - epoch_us(p.ts) AS gap_us
      |FROM (SELECT user_id, event_id, -epoch_us(ts) AS nt, ts
      |      FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, event_id, -epoch_us(ts) AS nt, ts
      |      FROM events WHERE event_type = 'error') e
      |  ON p.user_id = e.user_id AND p.nt >= e.nt""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_purchase_attribution" -> (purchaseAttribution _),
    "asof_next_error" -> (nextErrorFollowup _))

  def oracles: Map[String, String] = Map(
    "asof_purchase_attribution" -> purchaseAttributionSql,
    "asof_next_error" -> nextErrorFollowupSql)
}
