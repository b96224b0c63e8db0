package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lambda reconciliation for the streaming PSI monitor: the update-mode
  * per-bin period counters, drained latest-per-bin and closed through
  * the SHARED `driftFromBinCounts` finalize, must equal the batch
  * `dq_value_drift` pass exactly.
  */
class ValueDriftStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming PSI drift equals the batch PSI drift") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val stream = StreamQueries.streamValueDrift(spark, sf)
      .collect().map(key).toSet
    val batch = graft.operators.DataQuality.dqValueDrift(spark, sf)
      .collect().map(key).toSet
    assert(stream == batch)
    assert(stream.size == 10)
    // the fixture's timeline genuinely spans the split: some bin holds
    // mass in both periods
    assert(stream.exists { case (_, nr, nc, _) => nr > 0 && nc > 0 })
  }
}
