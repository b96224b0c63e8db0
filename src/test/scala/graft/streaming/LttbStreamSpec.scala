package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lambda reconciliation for the streaming LTTB: update-mode hourly
  * counts closed through the shared finalize must equal the batch
  * downsample exactly.
  */
class LttbStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming LTTB equals the batch downsample") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getLong(1), r.getLong(2))
    val stream = StreamQueries.streamLttb(spark, sf).collect().map(key).toSet
    val batch = graft.operators.TimeSeries.lttbDownsample(spark, sf)
      .collect().map(key).toSet
    assert(stream == batch)
    assert(stream.size == graft.operators.TimeSeries.LttbPoints)
  }
}
