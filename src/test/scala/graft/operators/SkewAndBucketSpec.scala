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

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    // The runtime half of the skew story: salting (above) is the
    // plan-level tool; AQE's skew-join split is what handles a hot key
    // discovered only at execution. Force a sort-merge join over a
    // power-law key with test-scale skew thresholds and assert the
    // FINAL adaptive plan actually marked the join skewed — i.e. the
    // hot partition was split instead of landing on one reducer.
    import spark.implicits._
    val s = spark
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> s.conf.getOption(k)).toMap
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // production defaults (256 MB / 64 MB) scaled to fixture bytes;
    // the 5x-of-median skew factor is left at its default — the hot
    // key must clear it on its own
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // 80% of left rows share key 1; the rest spread over 40k keys.
      // The payload must be INCOMPRESSIBLE (sha2, not a repeated pad
      // string — lz4 crushed a padded hot partition to 60 KB, under the
      // 5x-of-median factor) and must flow THROUGH the join (a
      // projection that drops it before the shuffle leaves only 8-byte
      // keys moving, and the skew disappears with it) — both found
      // empirically; map-stats bytes, not row counts, are what AQE
      // judges skew on.
      val left = s.range(0, 200000)
        .select(when($"id" % 5 =!= 0, lit(1L)).otherwise($"id").as("k"),
          concat(sha2($"id".cast("string"), 256),
            sha2(concat($"id".cast("string"), lit("x")), 256)).as("lv"))
      val right = s.range(0, 2000).select($"id".as("k"), ($"id" * 2).as("rv"))
      // collect() executes THIS QueryExecution (count() would plan a
      // separate one and the final adaptive plan would never form here)
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(length($"lv")).as("b"))
      val row = joined.collect()(0)
      assert(row.getLong(0) == 160000L + 400L)
      val p = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true"),
        s"AQE did not mark the sort-merge join skewed:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _))
    }
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
