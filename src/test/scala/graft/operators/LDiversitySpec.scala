package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** dq_ldiversity — the homogeneity-attack audit. The planted corpus
  * pins the case k-anonymity cannot see: a LARGE class (k=4, safely
  * k-anonymous) whose sensitive value is constant (l=1) must be
  * flagged, while a smaller but diverse class passes.
  */
class LDiversitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("homogeneous class flags despite k-anonymity; diverse class passes") {
    import spark.implicits._
    val rows = Seq(
      // S1 / nation 1 / band 0: k=4 but every balance identical → l=1
      ("S1", 1L, 100.0), ("S1", 1L, 100.0), ("S1", 1L, 100.0), ("S1", 1L, 100.0),
      // S1 / nation 2 / band 0: k=3, three distinct balances → l=3 (passes)
      ("S1", 2L, 10.0), ("S1", 2L, 20.0), ("S1", 2L, 30.0),
      // S2 / nation 1 / band 1: k=2, l=2 → flagged (l < 3)
      ("S2", 1L, 1100.0), ("S2", 1L, 1200.0))
    val tmp = java.nio.file.Files.createTempDirectory("ldiv").toString
    rows.toDF("c_mktsegment", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val out = DataQuality.dqLDiversity(spark, tmp).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(out("S1") == (2L, 1L, 1L, 4L, 0.571429), s"S1: ${out("S1")}")
    assert(out("S2") == (1L, 2L, 1L, 2L, 1.0), s"S2: ${out("S2")}")
  }
}
