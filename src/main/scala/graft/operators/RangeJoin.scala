package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Band (range) join via time-bucketing — the scalable form of the
  * theta join `l.t < r.t <= l.t + W`.
  *
  * A naive inequality join is a per-key cross product; bucketing time
  * into W-wide bins turns it into an equi-join: a follower within W of
  * an anchor lives in the anchor's bin or the next one, so each anchor
  * probes exactly two buckets and the residual range predicate runs on
  * the joined pairs only. Shuffle volume: 2× anchors + 1× followers,
  * independent of time span — this is the plan that survives 100 TB,
  * vs. DuckDB's oracle-side IEJoin on the same semantics.
  */
object RangeJoin {

  private val WidthUs = 300000000L // 5 minutes in µs

  /** For each `error` event: how many events the same user produced in
    * the following 5 minutes (µs-exact window, inner-join semantics —
    * errors with no followers don't appear).
    */
  def errorFollowups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .selectExpr("user_id", "(ts_ns div 1000) AS t_us", "event_id", "event_type")
    val anchors = ev.where($"event_type" === "error")
      .select($"user_id", $"t_us".as("et"), $"event_id".as("error_id"))
      .withColumn("bucket",
        explode(array(($"et" / WidthUs).cast("long"),
          ($"et" / WidthUs).cast("long") + 1)))
    val followers = ev
      .select($"user_id", $"t_us".as("ft"), $"event_id".as("fid"))
      .withColumn("bucket", ($"ft" / WidthUs).cast("long"))
    anchors.join(followers, Seq("user_id", "bucket"))
      .where($"ft" > $"et" && $"ft" <= $"et" + WidthUs)
      .groupBy($"error_id")
      .agg(count(lit(1)).as("n_follow"))
  }

  val errorFollowupsSql: String =
    """SELECT e.event_id AS error_id, count(*) AS n_follow
      |FROM events e JOIN events f
      |  ON e.user_id = f.user_id
      | AND epoch_us(f.ts) > epoch_us(e.ts)
      | AND epoch_us(f.ts) <= epoch_us(e.ts) + 300000000
      |WHERE e.event_type = 'error'
      |GROUP BY e.event_id""".stripMargin

  /** Point-in-interval join for VARIABLE-length intervals — the second
    * range-join shape (the 5-minute band above has fixed width; session
    * intervals don't): per 30-min-gap user session, how many error
    * events land inside [start, end] (inclusive, inner-join semantics).
    *
    * Scale form: each session explodes to the W-wide buckets it COVERS
    * (W = the sessionization gap, so a session of length L costs
    * ⌈L/W⌉+1 rows — bounded by duration, not data volume), each point
    * maps to exactly one bucket, and the join is an equi-join on
    * (user, bucket) with the exact containment as a residual. A point
    * matches at most one exploded bucket row of a given session, so no
    * dedup is needed. The oracle runs DuckDB's IEJoin on the literal
    * inequality — same rows, opposite plan strategy.
    */
  def sessionErrors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val GapUs = 1800000000L // 30 min, the sessionization gap AND bucket width
    val ev = Tables.events(s, dir)
      .selectExpr("user_id", "(ts_ns div 1000) AS t_us", "event_type")
    val byUser = Window.partitionBy($"user_id").orderBy($"t_us")
    val sessions = ev
      .withColumn("prev", lag($"t_us", 1).over(byUser))
      .withColumn("new_s",
        when($"prev".isNull || $"t_us" - $"prev" > GapUs, 1L).otherwise(0L))
      .withColumn("sid", sum($"new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(min($"t_us").as("start_us"), max($"t_us").as("end_us"))
      .withColumn("bucket", explode(expr(
        s"sequence(start_us div $GapUs, end_us div $GapUs)")))
    val errors = ev.where($"event_type" === "error")
      .select($"user_id", $"t_us".as("et"))
      .withColumn("bucket", expr(s"et div $GapUs"))
    sessions.join(errors, Seq("user_id", "bucket"))
      .where($"et" >= $"start_us" && $"et" <= $"end_us")
      .groupBy($"user_id", $"start_us")
      .agg(count(lit(1)).as("n_errors"))
  }

  val sessionErrorsSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS t_us, event_type FROM events),
      |lagd AS (
      |  SELECT user_id, t_us, event_type,
      |    CASE WHEN lag(t_us) OVER w IS NULL
      |           OR t_us - lag(t_us) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t_us)),
      |sess0 AS (
      |  SELECT user_id, t_us,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY t_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM lagd),
      |sess AS (
      |  SELECT user_id, sid, min(t_us) AS start_us, max(t_us) AS end_us
      |  FROM sess0 GROUP BY 1, 2)
      |SELECT s.user_id, s.start_us, count(*) AS n_errors
      |FROM sess s JOIN ev e
      |  ON e.user_id = s.user_id
      | AND e.t_us >= s.start_us AND e.t_us <= s.end_us
      |WHERE e.event_type = 'error'
      |GROUP BY s.user_id, s.start_us""".stripMargin

  /** Interval × interval overlap join — the third join geometry
    * (fixed-width band and point-in-interval are above): cross-USER
    * session pairs that overlap in time, with total concurrent
    * duration. Both interval sets explode to their covered W-buckets;
    * a pair overlapping anywhere shares at least one bucket, so the
    * theta join becomes an equi-join on the bucket + an exact residual.
    * A pair can co-occur in SEVERAL shared buckets — the distinct on
    * the pair identity (before aggregation) is load-bearing, and the
    * reason the aggregate can't ride the join directly.
    */
  def concurrentSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val GapUs = 1800000000L
    val byUser = Window.partitionBy($"user_id").orderBy($"t_us")
    val sess = Tables.events(s, dir)
      .selectExpr("user_id", "(ts_ns div 1000) AS t_us")
      .withColumn("prev", lag($"t_us", 1).over(byUser))
      .withColumn("new_s",
        when($"prev".isNull || $"t_us" - $"prev" > GapUs, 1L).otherwise(0L))
      .withColumn("sid", sum($"new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(min($"t_us").as("start_us"), max($"t_us").as("end_us"))
    val bucketed = sess.withColumn("bucket",
      explode(expr(s"sequence(start_us div $GapUs, end_us div $GapUs)")))
    val a = bucketed.select($"bucket", $"user_id".as("ua"), $"sid".as("sa"),
      $"start_us".as("sta"), $"end_us".as("ena"))
    val b = bucketed.select($"bucket", $"user_id".as("ub"), $"sid".as("sb"),
      $"start_us".as("stb"), $"end_us".as("enb"))
    a.join(b, Seq("bucket"))
      .where($"ua" < $"ub" && $"sta" <= $"enb" && $"stb" <= $"ena")
      .select($"ua", $"sa", $"ub", $"sb",
        (least($"ena", $"enb") - greatest($"sta", $"stb")).as("overlap_us"))
      .distinct()
      .agg(count(lit(1)).as("n_pairs"),
        sum($"overlap_us").as("sum_overlap_us"))
  }

  val concurrentSessionsSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS t_us FROM events),
      |lagd AS (
      |  SELECT user_id, t_us,
      |    CASE WHEN lag(t_us) OVER w IS NULL
      |           OR t_us - lag(t_us) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t_us)),
      |sess0 AS (
      |  SELECT user_id, t_us,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY t_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM lagd),
      |sess AS (
      |  SELECT user_id, sid, min(t_us) AS start_us, max(t_us) AS end_us
      |  FROM sess0 GROUP BY 1, 2)
      |SELECT count(*) AS n_pairs,
      |  CAST(sum(least(a.end_us, b.end_us)
      |    - greatest(a.start_us, b.start_us)) AS BIGINT) AS sum_overlap_us
      |FROM sess a JOIN sess b
      |  ON a.user_id < b.user_id
      | AND a.start_us <= b.end_us AND b.start_us <= a.end_us""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "range_error_followups" -> (errorFollowups _),
    "range_session_errors" -> (sessionErrors _),
    "range_concurrent_sessions" -> (concurrentSessions _))

  def oracles: Map[String, String] = Map(
    "range_error_followups" -> errorFollowupsSql,
    "range_session_errors" -> sessionErrorsSql,
    "range_concurrent_sessions" -> concurrentSessionsSql)
}
