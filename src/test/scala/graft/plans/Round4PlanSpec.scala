package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Plan-shape pins for the round-4 operators: the shuffle-count and
  * sort-freedom claims made in the scaladocs/PLANS_r4.md, asserted so a
  * refactor that silently adds an exchange fails loudly.
  */
class Round4PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)

  private def shuffles(p: String): Int =
    p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") ||
        l.contains("Exchange rangepartitioning") ||
        l.contains("Exchange SinglePartition"))

  test("SCD2 build rides ONE hash exchange through all windows and the aggregate") {
    val p = plan("q_scd2_customer")
    assert(shuffles(p) == 1, p)
  }

  test("latest-per-key compaction is a single windowed shuffle") {
    val p = plan("q_latest_per_key")
    assert(shuffles(p) == 1, p)
  }

  test("z-order file assignment plans no sort") {
    val p = plan("layout_zorder")
    assert(!p.contains("Sort ["), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("paragraph dedup shuffles only on the chunk window and the doc aggregate") {
    val p = plan("dedup_paragraph")
    assert(shuffles(p) == 2, p)
  }
}
