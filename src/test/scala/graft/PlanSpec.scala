package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Plan-shape regression tests: the physical plans the 100 TB design
  * depends on, asserted so a refactor can't silently lose pushdown or
  * broadcast (the `.explain` loop, frozen as specs).
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q06: every predicate reaches the parquet scan (PushedFilters)") {
    val p = plan(Relational.q06ForecastRevenue(spark, sf))
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    assert(p.contains("LessThan(l_quantity,24"))
  }

  test("q06: column pruning - scan reads only the 4 needed columns") {
    val p = plan(Relational.q06ForecastRevenue(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_extendedprice") && readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_orderkey"), s"unpruned scan: $readSchema")
  }

  test("q03: dimension joins are broadcast, top-k is TakeOrdered (no global sort)") {
    val p = plan(Relational.q03ShippingPriority(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("events interval predicate pushes down on the native ts scan column") {
    val p = plan(graft.operators.EventOps.intervalCount(spark, sf))
    assert(p.contains("GreaterThanOrEqual(ts,2024-01-10"), p)
  }

  test("partitioned layout: day predicate prunes partitions at the scan") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_prune").toString
    graft.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("dt"))
      .write.mode("overwrite").partitionBy("dt").parquet(out)
    val q = spark.read.parquet(out).where(col("dt") === "2024-01-05")
    val p = plan(q)
    assert(p.contains("PartitionFilters"), p)
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("dt")), p)
  }

  test("q05/q10: AQE still broadcasts the un-hinted scaling dims at this SF") {
    // customer/supplier/part joins carry no broadcast() hint (a forced
    // build side would OOM at 100× data); size-based selection must
    // still pick broadcast while they fit. Assert on the FINAL adaptive
    // plan, after execution.
    // assert STRICTLY MORE broadcasts than the explicit hints each query
    // carries (q05 hints region + nation twice = 3; q10 hints nation = 1),
    // so the count can only be satisfied if AQE broadcast an un-hinted side
    for ((df, hinted) <- Seq(
        (Relational.q05LocalSupplier(spark, sf), 3),
        (Relational.q10ReturnedItems(spark, sf), 1))) {
      df.collect()
      val p = plan(df)
      assert(p.contains("isFinalPlan=true"), p)
      assert("BroadcastHashJoin".r.findAllIn(p).size > hinted, p)
    }
  }

  test("word count aggregation is partial before the shuffle") {
    val p = plan(graft.operators.TextOps.wordCount(spark, sf))
    // two HashAggregates (partial + final) around one Exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("hashpartitioning(word"), p)
  }

  test("q21: EXISTS/NOT EXISTS decorrelate to one semi and one anti join on l_orderkey") {
    val p = plan(graft.operators.Relational4.q21WaitingSupplier(spark, sf))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    // top-k stays a TakeOrdered, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q16: NOT IN exclusion is a broadcast anti join; distinct agg is two-phase") {
    val p = plan(graft.operators.Relational4.q16SupplierCnt(spark, sf))
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // countDistinct expands: >=2 HashAggregate levels
    assert("HashAggregate".r.findAllIn(p).size >= 3, p)
  }

  test("q15: scalar max joins back as a broadcast of the 1-row aggregate") {
    val df = graft.operators.Relational4.q15TopSupplier(spark, sf)
    df.collect()
    val p = plan(df)
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("runtime bloom-filter injection engages on a selective fact-dim shuffle join") {
    // the engine-level 100 TB lever beyond this repo's manual
    // sketch_bloom_prune: with a selective creation side, Spark injects
    // bloom_filter_agg on the dim and might_contain on the FACT scan
    // side, pruning shuffle input at runtime. Thresholds are tuned for
    // the local fixture (the defaults assume a 10 GB application side).
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.Tables.lineitem(spark, sf)
      val ord = graft.Tables.orders(spark, sf)
        .where("o_orderpriority = '1-URGENT'")
      val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        "runtime bloom filter not injected:\n" + p.take(2000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning fires on a partitioned fact x filtered dim join") {
    // the third runtime lever next to AQE-skew and bloom injection: the
    // dim-side filter prunes fact PARTITIONS at runtime via a reused
    // broadcast subquery on the partition column
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    graft.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"value",
        date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("dt"))
      .write.mode("overwrite").partitionBy("dt").parquet(out)
    val fact = spark.read.parquet(out)
    val dim = graft.Tables.events(spark, sf)
      .select(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("dt"),
        $"event_type").distinct()
      .where($"event_type" === "purchase" && $"dt" < "2024-01-03")
    val j = fact.join(dim, Seq("dt")).groupBy("dt").count()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      "dynamic partition pruning subquery missing:\n" + p.take(2000))
  }

  test("LATERAL top-k decorrelates to WindowGroupLimit + hash join, not a nested loop") {
    val p = plan(graft.operators.Relational4.qLateralTopk(spark, sf))
    // the per-row ORDER BY/LIMIT subquery becomes a rank window with a
    // group-limit pushdown: each map task forwards <=2 rows per nation
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}
