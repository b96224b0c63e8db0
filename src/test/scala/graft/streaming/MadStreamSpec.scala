package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lambda reconciliation for the streaming MAD monitor. */
class MadStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming MAD anomalies equal the batch pass") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4))
    val stream = StreamQueries.streamAnomalyMad(spark, sf)
      .collect().map(key).toSet
    val batch = graft.operators.TimeSeries.anomalyMad(spark, sf)
      .collect().map(key).toSet
    assert(stream == batch)
    assert(stream.nonEmpty)
  }
}
