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

  test("rfm planted: 5 distinct customers land on the diagonal segments") {
    import spark.implicits._
    // customer i: one order of 100*i on day i (anchor = day 5). All
    // frequencies tie at 1 -> the (value, custkey) total order assigns
    // f_score = i; monetary and recency rank naturally -> every
    // customer sits in segment (i, i, i) alone.
    val orders = (1 to 5).map { i =>
      (100L + i, i.toLong, f"2020-01-0$i 00:00:00", 100.0 * i)
    }.toDF("o_orderkey", "o_custkey", "ts", "o_totalprice")
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(ts AS TIMESTAMP) AS o_orderdate", "o_totalprice")
    val rows = Relational4.qRfmSegmentsOf(orders).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (rs, fs, ms) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(rs == fs && fs == ms, s"off-diagonal segment ($rs,$fs,$ms)")
      assert(r.getLong(3) == 1L)
      assert(r.getDouble(4) == 100.0 * rs)
    }
  }

  test("robust stats planted: 1..100 gives median 50, IQR 50, MAD 25, trimmed mean 50.5") {
    import spark.implicits._
    val orders = (1 to 100).map(i => (i.toLong, "P", i.toDouble))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val r = Relational4.qRobustStatsOf(orders).collect().head
    assert(r.getLong(1) == 100L)
    assert(r.getDouble(2) == 50.0) // lower median at rank (101) div 2
    assert(r.getDouble(3) == 25.0 && r.getDouble(4) == 75.0)
    assert(r.getDouble(5) == 50.0) // IQR
    // devs {0, 1,1, ..., 49,49, 50}: rank-50 value is 25
    assert(r.getDouble(6) == 25.0)
    assert(r.getDouble(7) == 50.5) // mean of ranks 6..95
  }

  test("robust stats real data: ordering invariants hold per priority") {
    val rows = Relational4.qRobustStats(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (q1, med, q3) = (r.getDouble(3), r.getDouble(2), r.getDouble(4))
      assert(q1 <= med && med <= q3)
      assert(r.getDouble(6) >= 0.0) // mad
      assert(r.getDouble(7) >= q1 && r.getDouble(7) <= q3,
        "5% trimmed mean must land inside the IQR on this unimodal data")
    }
  }

  test("bootstrap CI: constant column collapses to a point; real CI brackets the mean") {
    import spark.implicits._
    // weighted mean of a constant is the constant for ANY nonzero
    // weight vector -> every replicate mean is 42 and the CI is a point
    val const = (1 to 100).map(i => (i.toLong, 42.0))
      .toDF("o_orderkey", "o_totalprice")
    val c = Relational4.qBootstrapCiOf(const).collect().head
    assert(c.getDouble(1) == 42.0 && c.getDouble(2) == 42.0 && c.getDouble(3) == 42.0)
    val r = Relational4.qBootstrapCi(spark, sf).collect().head
    val (pm, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo < pm && pm < hi, s"CI [$lo, $hi] must bracket the mean $pm")
    // sanity: a mean over thousands of orders is tight, not degenerate
    assert((hi - lo) / pm < 0.2)
  }

  test("rfm real data: scores in 1..5, quintiles balanced, customers conserved") {
    val segs = Relational4.qRfmSegments(spark, sf).collect()
    val n = segs.map(_.getLong(3)).sum
    val nCust = graft.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(n == nCust, "every ordering customer lands in exactly one segment")
    // per-dimension quintile sizes: exact rank arithmetic keeps each
    // fifth within one customer of n/5
    for (dim <- 0 to 2) {
      val byScore = segs.groupBy(_.getLong(dim)).view.mapValues(_.map(_.getLong(3)).sum)
      assert(byScore.keys.forall(s => s >= 1 && s <= 5))
      byScore.foreach { case (s, c) =>
        assert(math.abs(c - n / 5.0) <= 1.0 + 1e-9, s"dim $dim score $s size $c vs ${n / 5.0}")
      }
    }
  }
}
