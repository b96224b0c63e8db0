package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lambda reconciliation for the streaming ACF: the update-mode hourly
  * count state, drained latest-per-hour and closed through the SHARED
  * acfFromCounts finalize, must equal the batch ACF exactly.
  */
class AcfStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming ACF equals the batch ACF") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val stream = StreamQueries.streamAcf(spark, sf).collect().map(key).toSet
    val batch = graft.operators.TimeSeries.acf(spark, sf).collect().map(key).toSet
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  test("streaming PACF equals the batch PACF (one derivation deeper)") {
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getDouble(1))
    val stream = StreamQueries.streamPacf(spark, sf).collect().map(key).toSet
    val batch = graft.operators.TimeSeries.pacf(spark, sf).collect().map(key).toSet
    assert(stream == batch)
    assert(stream.size == graft.operators.TimeSeries.PacfMaxLag)
  }
}
