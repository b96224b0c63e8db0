package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lambda reconciliation for the streaming EWMA: the update-mode
  * per-(type, day) counter state, drained latest-per-key and closed
  * through the SHARED ewmaFromCounts finalize, must equal the batch
  * EWMA exactly — every (type, day, value) cell.
  */
class EwmaStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming EWMA equals the batch EWMA cell-for-cell") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getString(1), r.getDouble(2))
    val stream = StreamQueries.streamEwma(spark, sf).collect().map(key).toSet
    val batch = graft.operators.TimeSeries.ewmaDaily(spark, sf)
      .collect().map(key).toSet
    assert(stream == batch)
    assert(stream.nonEmpty)
  }
}
