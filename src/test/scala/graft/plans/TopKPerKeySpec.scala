package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("custom exec matches the window row_number formulation (distinct values)") {
    import spark.implicits._
    // distinct (key, value) pairs -> no boundary ties -> unique answer
    val df = (1 to 5000).map(i => (i % 37L, i * 1.0, s"p$i")).toDF("k", "v", "payload")
    val custom = TopKPerKey.topKPerKey(df, Seq("k"), "v", 3)
      .select("k", "v", "payload")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"k").orderBy($"v".desc)
    val windowed = df.withColumn("rn", row_number().over(w))
      .where($"rn" <= 3).select("k", "v", "payload")
    assert(custom.count() == windowed.count())
    assert(custom.exceptAll(windowed).isEmpty && windowed.exceptAll(custom).isEmpty)
  }

  test("plan: partial top-k runs map-side below the exchange, final above, no sort") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 5L, i * 1.0)).toDF("k", "v")
    val plan = TopKPerKey.topKPerKey(df, Seq("k"), "v", 2)
      .queryExecution.executedPlan.toString
    // optimizer rule inserts the partial: two TopKPerKey nodes around one exchange
    assert("TopKPerKey".r.findAllIn(plan).size >= 2, plan)
    val lines = plan.linesIterator.toList
    val firstTopK = lines.indexWhere(_.contains("TopKPerKey"))
    val exchange = lines.indexWhere(_.contains("Exchange"))
    val partialTopK = lines.lastIndexWhere(_.contains("TopKPerKey"))
    assert(firstTopK < exchange && exchange < partialTopK,
      s"expected final/Exchange/partial ordering:\n$plan")
    assert(!plan.toLowerCase.contains("sortexec") && !plan.contains("Sort "), plan)
  }

  test("AQE re-optimization: top-k output joins downstream, partial stays below the exchange") {
    import spark.implicits._
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val df = (1 to 5000).map(i => (i % 37L, i * 1.0, s"p$i")).toDF("k", "v", "payload")
    // consume the custom operator's output in a further shuffle stage: an
    // aggregate on the same key joined back — the shape where AQE
    // re-plans around runtime stats and EnsureRequirements must keep the
    // partial heap below the reused exchange
    val topk = TopKPerKey.topKPerKey(df, Seq("k"), "v", 3)
    val stats = df.groupBy($"k").agg(avg($"v").as("avg_v"))
    val joined = topk.join(stats, "k")
      .groupBy($"k").agg(count(lit(1)).as("n"), max($"v").as("best"),
        first($"avg_v").as("avg_v"))
    val got = joined.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: the window formulation through the identical downstream
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"k").orderBy($"v".desc)
    val windowed = df.withColumn("rn", row_number().over(w))
      .where($"rn" <= 3).drop("rn")
    val expected = windowed.join(stats, "k")
      .groupBy($"k").agg(count(lit(1)).as("n"), max($"v").as("best"),
        first($"avg_v").as("avg_v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
    // plan shape AFTER execution (AQE finalizes the plan at runtime):
    // both custom nodes survive, partial below the key exchange
    val plan = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("AdaptiveSparkPlan"), plan)
    assert("TopKPerKey".r.findAllIn(plan).size >= 2, plan)
  }

  test("string order column: heap values don't alias the reused row buffer") {
    import spark.implicits._
    // regression: non-primitive order values must be copied with the row
    val df = (1 to 2000).map(i => (i % 7L, f"s$i%05d")).toDF("k", "v")
    val custom = TopKPerKey.topKPerKey(df, Seq("k"), "v", 2).select("k", "v")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"k").orderBy($"v".desc)
    val expected = df.withColumn("rn", row_number().over(w))
      .where($"rn" <= 2).select("k", "v")
    assert(custom.exceptAll(expected).isEmpty && expected.exceptAll(custom).isEmpty)
  }

  test("null order values are skipped, never crash") {
    import spark.implicits._
    val df = Seq((1L, Some(5.0)), (1L, None), (1L, Some(3.0)), (2L, None))
      .toDF("k", "v")
    val out = TopKPerKey.topKPerKey(df, Seq("k"), "v", 2)
      .select("k", "v").collect()
    assert(out.length == 2) // key 2 has only a null row -> excluded
    assert(out.forall(!_.isNullAt(1)))
  }

  test("k larger than group size returns the whole group") {
    import spark.implicits._
    val df = Seq((1L, 1.0), (1L, 2.0), (2L, 9.0)).toDF("k", "v")
    assert(TopKPerKey.topKPerKey(df, Seq("k"), "v", 10).count() == 3)
  }

  test("works on the real orders table against the q_window_top_orders answer") {
    val orders = graft.Tables.orders(spark, TestSpark.sf)
    val custom = TopKPerKey.topKPerKey(orders, Seq("o_custkey"), "o_totalprice", 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val windowed = graft.operators.Relational.qWindowTopOrders(spark, TestSpark.sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice").as("o_totalprice"))
    assert(custom.count() == windowed.count())
    assert(custom.exceptAll(windowed).isEmpty)
  }
}
