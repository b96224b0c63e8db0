package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SkewAndBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted join returns exactly the unsalted join's rows on skewed data") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 7 else 42L, s"l$i")).toDF("k", "lv")
    val right = (0L to 50L).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
    val salted = Skew.saltedJoin(left, right, "k", 8).select("k", "lv", "rv")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt splits a hot key of IDENTICAL rows across all salt values") {
    import spark.implicits._
    // identical duplicate rows — the case a content-derived salt cannot split
    val left = (1 to 1000).map(_ => (42L, "same")).toDF("k", "lv")
    val salts = left.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(8L)))
      .select("_salt").distinct().count()
    assert(salts == 8, s"hot key only spread over $salts salts")
  }

  test("bucketed tables co-locate: join has no shuffle exchange") {
    import spark.implicits._
    val s = spark
    val warehouse = s.conf.get("spark.sql.warehouse.dir")
    assert(warehouse.contains("graft-wh"), s"unexpected warehouse $warehouse")
    val df = (1 to 10000).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    df.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .saveAsTable("bucketed_a")
    df.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .saveAsTable("bucketed_b")
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = s.table("bucketed_a").join(s.table("bucketed_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 10000)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("range join bucketing matches the naive theta join") {
    val bucketed = RangeJoin.errorFollowups(spark, TestSpark.sf)
    // naive reference: plain inequality join, same µs semantics
    import spark.implicits._
    val ev = graft.Tables.events(spark, TestSpark.sf)
      .selectExpr("user_id", "(ts_ns div 1000) AS t_us", "event_id", "event_type")
    val e = ev.where($"event_type" === "error")
      .select($"user_id", $"t_us".as("et"), $"event_id".as("error_id"))
    val f = ev.select($"user_id", $"t_us".as("ft"), $"event_id".as("fid"))
    val naive = e.join(f, Seq("user_id"))
      .where($"ft" > $"et" && $"ft" <= $"et" + 300000000L)
      .groupBy($"error_id").agg(count(lit(1)).as("n_follow"))
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty)
  }
}
