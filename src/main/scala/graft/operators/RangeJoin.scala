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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "range_error_followups" -> (errorFollowups _))

  def oracles: Map[String, String] = Map(
    "range_error_followups" -> errorFollowupsSql)
}
