package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class EventOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("interval count: bounded by total events, all types present") {
    val rows = EventOps.intervalCount(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("cnt")).sum <= total)
  }

  test("lambda diff: lost = batch - speed, lost >= 0, sums match simulated loss") {
    val df = EventOps.lambdaDiff(spark, sf)
    import org.apache.spark.sql.functions._
    val bad = df.filter(col("lost") =!= col("batch_cnt") - col("speed_cnt") ||
      col("lost") < 0).count()
    assert(bad == 0)
    val totalLost = df.agg(sum("lost")).collect()(0).getLong(0)
    val expectedLost = graft.Tables.events(spark, sf)
      .filter(col("event_id") % 97 === 0).count()
    assert(totalLost == expectedLost)
  }

  test("session stats: sessions <= events per user, at least 1 session") {
    import org.apache.spark.sql.functions._
    val df = EventOps.sessionStats(spark, sf)
    assert(df.filter(col("n_sessions") > col("n_events") ||
      col("n_sessions") < 1).count() == 0)
  }
}
