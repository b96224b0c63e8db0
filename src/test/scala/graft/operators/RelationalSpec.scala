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

  test("approximate aggregates: HLL within 5% of exact, approx median near exact") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact_d"),
      approx_count_distinct(col("l_partkey")).as("approx_d"),
      expr("percentile(l_extendedprice, 0.5)").as("exact_med"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_med"))
      .collect()(0)
    val (ed, ad) = (row.getAs[Long]("exact_d"), row.getAs[Long]("approx_d"))
    assert(math.abs(ad - ed).toDouble / ed <= 0.05, s"HLL off: $ad vs $ed")
    val (em, am) = (row.getAs[Double]("exact_med"), row.getAs[Double]("approx_med"))
    assert(math.abs(am - em) / em <= 0.02, s"approx median off: $am vs $em")
  }
}
