package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lambda reconciliation for the streaming changepoint: per-(type, day)
  * counters maintained in update mode, drained latest-per-key and
  * closed through the SHARED changepointFromCounts finalize, must
  * equal the batch CUSUM detector row-for-row.
  */
class ChangepointStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming changepoint equals the batch changepoint") {
    def key(r: org.apache.spark.sql.Row) = r.toSeq.toList
    val stream = StreamQueries.streamChangepoint(spark, sf)
      .collect().map(key).toSet
    val batch = graft.operators.TimeSeries.changepoint(spark, sf)
      .collect().map(key).toSet
    assert(stream == batch)
    assert(stream.nonEmpty)
  }
}
