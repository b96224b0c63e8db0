package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfMergeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("native as-of: planted fixture covers match, no-match, tie, and carry-reset") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "l-a"), (1L, 20L, "l-b"), (1L, 5L, "l-early"),
      (2L, 7L, "l-c"),   // key 2 has no right rows at all
      (3L, 30L, "l-d")). // key 3's right rows are all later
      toDF("key", "t", "lp")
    val right = Seq(
      (1L, 10L, "r-tie"),   // t == left t ⇒ inclusive match
      (1L, 15L, "r-mid"),
      (3L, 40L, "r-late")).
      toDF("key", "t", "rp")
    val got = AsOfMergeJoin.asOfNative(left, right)
      .toDF("key", "t", "lp", "rk", "rt", "rp")
      .select("key", "t", "lp", "rt", "rp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) null else r.getString(4))).toSet
    assert(got == Set(
      (1L, 5L, "l-early", -1L, null),  // before any right row
      (1L, 10L, "l-a", 10L, "r-tie"),  // inclusive >= match
      (1L, 20L, "l-b", 15L, "r-mid"),  // latest preceding wins
      (2L, 7L, "l-c", -1L, null),      // key with no right side
      (3L, 30L, "l-d", -1L, null)))    // right rows all in the future
  }

  test("native as-of: exact parity with the composed union+window operator") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sf)
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id".as("key"), expr("ts_ns div 1000").as("t"),
        $"event_id")
    val clicks = ev.where($"event_type" === "click")
      .groupBy($"user_id".as("key"), expr("ts_ns div 1000").as("t"))
      .agg(max($"event_id").as("click_event_id"))
      .select($"key", $"t", $"click_event_id")
    val native = AsOfMergeJoin.asOfNative(purchases, clicks)
      .toDF("key", "t", "event_id", "rk", "r_t", "click_event_id")
      .select("key", "t", "event_id", "r_t", "click_event_id")
      .collect().map(_.toSeq).toSet
    val composed = graft.operators.AsOfJoin.asOf(purchases, clicks)
      .select("key", "t", "event_id", "r_t", "click_event_id")
      .collect().map(_.toSeq).toSet
    assert(native == composed,
      s"native minus composed: ${(native -- composed).take(3)}; " +
        s"composed minus native: ${(composed -- native).take(3)}")
    assert(native.nonEmpty)
  }

  test("native as-of: plan shows the exec with sorted, clustered children and no window") {
    val df = AsOfMergeJoin.nativeAttribution(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), plan)
    assert(plan.contains("Sort"), "EnsureRequirements must insert the (key, t) sorts")
    assert(!plan.contains("Window"),
      "the native path must not fall back to the union+window form")
    // one pass, no unioned frame
    assert(!plan.contains("Union"), plan)
  }
}
