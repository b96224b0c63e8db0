package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lambda reconciliation for the streaming temperature mix: update-mode
  * per-language doc/token counters closed through the SHARED
  * `temperatureMixFromCounts` finalize must equal the batch
  * `curate_temperature_mix` pass exactly.
  */
class TemperatureMixStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming temperature mix equals the batch mix") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val stream = StreamQueries.streamTemperatureMix(spark, sf)
      .collect().map(key).toSet
    val batch = graft.operators.Curation.temperatureMix(spark, sf)
      .collect().map(key).toSet
    assert(stream == batch)
    assert(stream.size > 1)
  }
}
