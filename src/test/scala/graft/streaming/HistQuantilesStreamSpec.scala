package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lambda reconciliation for the streaming histogram-quantile sketch:
  * per-bucket counters accumulated across triggers (update mode) and
  * closed through the shared estimate finalize must equal the batch
  * two-phase query's estimate columns exactly — bucket-wise addition
  * IS the histogram merge.
  */
class HistQuantilesStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming histogram quantile estimates equal the batch sketch") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getDouble(0), r.getLong(1), r.getDouble(2))
    val stream = StreamQueries.streamHistQuantiles(spark, sf)
      .collect().map(key).toSet
    val batch = graft.operators.Sketches.histQuantiles(spark, sf)
      .select("q", "bucket", "est").collect().map(key).toSet
    assert(stream == batch)
    assert(stream.size == 3)
  }
}
