package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Each PlanGuard finding must fire on a planted hazard and stay
  * silent on the clean equivalent — the API contract a user's CI gate
  * relies on.
  */
class PlanGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  import org.apache.spark.sql.functions._

  /** Run body with auto-broadcast disabled (small local frames would
    * otherwise plan as BroadcastNestedLoopJoin, not CartesianProduct).
    */
  private def withoutAutoBroadcast[T](body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prev)
  }

  test("cartesian product is flagged; keyed join of the same frames is clean") {
    import spark.implicits._
    val a = (1 to 10).toDF("x")
    val b = (1 to 10).toDF("y")
    withoutAutoBroadcast {
      val bad = a.crossJoin(b).where($"x" =!= $"y")
      assert(PlanGuard.lint(bad).exists(_.kind == "cartesian-product"))
    }
    // the same hazard below the broadcast threshold is still flagged,
    // as the stray nested loop it plans to
    val small = a.crossJoin(b).where($"x" =!= $"y")
    assert(PlanGuard.lint(small).exists(_.kind == "nested-loop-join"))
    val good = a.join(b, $"x" === $"y")
    assert(PlanGuard.lint(good).isEmpty, PlanGuard.lint(good).mkString(";"))
  }

  test("1-row-aggregate broadcast cross join is allowed; frame-vs-frame nested loop is not") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf).select($"doc_id", $"n_chars")
    val total = docs.agg(sum($"n_chars").as("total"))
    val blessed = docs.crossJoin(broadcast(total))
    assert(PlanGuard.lint(blessed).isEmpty,
      PlanGuard.lint(blessed).mkString(";"))
    val raw = (1 to 5).toDF("y")
    val stray = docs.crossJoin(broadcast(raw)) // broadcast side not an aggregate
    assert(PlanGuard.lint(stray).exists(_.kind == "nested-loop-join"))
    // and the strict mode refuses even the blessed form
    assert(PlanGuard.lint(blessed, allowNestedLoop = false)
      .exists(_.kind == "nested-loop-join"))
  }

  test("wide scan is flagged at the threshold; projected scan is clean") {
    val li = graft.Tables.lineitem(spark, sf)
    val wide = li.where(col("l_quantity") > 0) // all 11 columns survive
    assert(PlanGuard.lint(wide, wideScanCols = 8)
      .exists(_.kind == "unpruned-wide-scan"))
    val narrow = li.select("l_orderkey", "l_quantity")
      .where(col("l_quantity") > 0)
    assert(PlanGuard.lint(narrow, wideScanCols = 8).isEmpty,
      PlanGuard.lint(narrow, wideScanCols = 8).mkString(";"))
  }

  test("global sort over raw rows is flagged; aggregate totals are not") {
    val li = graft.Tables.lineitem(spark, sf)
    val globalSort = li.select("l_orderkey", "l_quantity")
      .orderBy("l_quantity")
    // range partitioning may use >1 partition; force the 1-partition shape
    val one = li.select("l_orderkey").repartition(1)
    assert(PlanGuard.lint(one).exists(_.kind == "single-partition-exchange"),
      PlanGuard.lint(one).mkString(";"))
    val agg = li.groupBy("l_returnflag").count() // partial rows only
    assert(PlanGuard.lint(agg).isEmpty, PlanGuard.lint(agg).mkString(";"))
    globalSort.queryExecution.executedPlan // analyzable, not asserted
  }

  test("assertClean throws with every finding listed") {
    import spark.implicits._
    val a = (1 to 3).toDF("x")
    val b = (1 to 3).toDF("y")
    val e = intercept[IllegalStateException] {
      PlanGuard.assertClean(a.crossJoin(b).where($"x" =!= $"y"))
    }
    assert(e.getMessage.contains("nested-loop-join") ||
      e.getMessage.contains("cartesian-product"))
  }

  test("the whole registry's flagship passes the guard") {
    // the guard must agree with PlanLintSpec on the registry's own
    // flagship (broadcast dims + partial aggs + TakeOrdered)
    val df = graft.operators.Relational.q01PricingSummary(spark, sf)
    assert(PlanGuard.lint(df).isEmpty, PlanGuard.lint(df).mkString(";"))
  }
}
