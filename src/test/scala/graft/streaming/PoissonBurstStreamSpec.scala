package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lambda reconciliation for the streaming burst monitor: the
  * update-mode hourly count state, drained and closed through the
  * shared poissonBurstFromCounts finalize, must equal the batch sweep.
  */
class PoissonBurstStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming Poisson burst equals the batch sweep") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4))
    val stream =
      StreamQueries.streamPoissonBurst(spark, sf).collect().map(key).toSet
    val batch =
      graft.operators.TimeSeries.poissonBurst(spark, sf).collect().map(key).toSet
    assert(stream == batch)
    assert(stream.nonEmpty)
  }
}
