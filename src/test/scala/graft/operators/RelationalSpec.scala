package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("q01 pricing summary: 6 flag/status groups, counts sum to filtered rows") {
    val rows = Relational.q01PricingSummary(spark, sf).collect()
    assert(rows.length == 6)
    val totalCount = rows.map(_.getAs[Long]("count_order")).sum
    import org.apache.spark.sql.functions._
    val expected = graft.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(totalCount == expected)
  }

  test("q06 forecast revenue: single positive row") {
    val rows = Relational.q06ForecastRevenue(spark, sf).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Double]("revenue") > 0.0)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query key") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
