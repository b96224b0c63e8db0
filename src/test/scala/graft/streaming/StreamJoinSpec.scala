package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.TestSpark

/** Stream-stream join + native session windows — the stateful streaming
  * surface beyond aggregations.
  */
class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ckpt() =
    java.nio.file.Files.createTempDirectory("ckpt").toString
  private def ts(h: Int, m: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("stream-stream interval join: purchase joins clicks within the prior hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val purchases = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val c = clicks.toDF().toDF("c_ts", "c_user", "click_id")
      .withWatermark("c_ts", "2 hours")
    val p = purchases.toDF().toDF("p_ts", "p_user", "purchase_id")
      .withWatermark("p_ts", "2 hours")
    val joined = p.join(c,
      expr("""p_user = c_user AND
             |c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 1 HOUR""".stripMargin))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ss_join")
      .option("checkpointLocation", ckpt())
      .start()
    clicks.addData((ts(1, 0), 7L, 100L), (ts(5, 0), 7L, 101L))
    purchases.addData((ts(1, 30), 7L, 900L), (ts(9, 0), 7L, 901L))
    q.processAllAvailable()
    val got = spark.table("ss_join")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    // purchase 900 at 1:30 joins click 100 at 1:00; purchase 901 at 9:00
    // has no click in [8:00, 9:00]
    assert(got == Set((900L, 100L)))
  }

  test("native session_window agg matches the lag-gap sessionization count") {
    import spark.implicits._
    // same 30-minute gap rule as EventOps.sessionStats
    val events = Seq(
      (1L, ts(1, 0)), (1L, ts(1, 10)), (1L, ts(1, 50)),  // gaps 10m, 40m -> 2 sessions
      (2L, ts(2, 0)), (2L, ts(4, 0)),                    // gap 2h -> 2 sessions
      (3L, ts(5, 0)))                                    // 1 session
      .toDF("user_id", "t")
    val sessionCounts = events
      .groupBy($"user_id", session_window($"t", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sessionCounts == Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
  }
}
