package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** The mechanical closure of the PlanLintSpec exemption loophole
  * (round-12 item 5): queries on the `constructionRuns` list execute
  * work on construction, so the registry-wide PLANNING gate cannot lint
  * them without re-running them — previously their plan hygiene was a
  * manual promise ("asserted by their own specs"). This spec EXECUTES
  * every exempted query once with a [[QueryExecutionListener]] attached
  * and lints every physical plan the query actually ran — construction
  * loops, memo builds and the final frame included. Adding a name to
  * the exemption list automatically subjects it to this gate; there is
  * no way to exempt a query from both.
  *
  * Checks per executed plan:
  *   - no `CartesianProductExec` anywhere (unconditional, the same rule
  *     the planning gate applies registry-wide);
  *   - any undefined-partition `WindowExec` must be value-bounded in
  *     practice: its input row count (nearest descendant metric) must
  *     stay under [[ConstructionPlanSpec.WindowRowBound]] — a corpus-
  *     sized global window would blow past it even at sf0.001, while
  *     the legitimate top-K / calendar / model frames sit far below.
  */
class ConstructionPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  import ConstructionPlanSpec.WindowRowBound

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** Nearest-descendant numOutputRows — WindowExec itself carries no
    * row metric, so walk down until one is found (Project/Exchange/
    * HashAggregate all carry it). -1 when none is reachable.
    */
  private def inputRows(p: SparkPlan): Long = {
    val q = scala.collection.mutable.Queue(p.children.map(finalPlan): _*)
    while (q.nonEmpty) {
      val n = finalPlan(q.dequeue())
      n.metrics.get("numOutputRows") match {
        case Some(m) => return m.value
        case None => q.enqueueAll(n.children)
      }
    }
    -1L
  }

  private def lint(name: String, qe: QueryExecution,
      out: ConcurrentLinkedQueue[String]): Unit = {
    def walk(p0: SparkPlan): Unit = {
      val p = finalPlan(p0)
      p match {
        case _: CartesianProductExec =>
          out.add(s"$name: executed a CartesianProduct"): Unit
        case w: WindowExec if w.partitionSpec.isEmpty =>
          val rows = inputRows(w)
          if (rows > WindowRowBound)
            out.add(s"$name: undefined-partition WindowExec over $rows " +
              s"rows (bound $WindowRowBound)"): Unit
        case _ => ()
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    // executedPlan is already materialized at onSuccess time — walking
    // it never re-executes anything
    try walk(qe.executedPlan) catch { case _: Throwable => () }
  }

  test("every exemption-listed construction query executes only clean plans") {
    val violations = new ConcurrentLinkedQueue[String]
    val events = new AtomicInteger(0)
    @volatile var current = "(pre)"
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        events.incrementAndGet()
        lint(current, qe, violations)
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = { events.incrementAndGet(): Unit }
    }
    spark.listenerManager.register(listener)
    try {
      PlanLintSpec.constructionRuns.toSeq.sorted.foreach { name =>
        current = name
        val fn = SparkEntry.queries.getOrElse(name,
          fail(s"exempted query $name is not in the registry"))
        // the noop sink evaluates every column of the final frame, so
        // the final plan is linted alongside the construction plans
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        // listener delivery is async: wait for this query's events to
        // drain before moving on, so violations attribute correctly
        val target = events.get()
        val t0 = System.nanoTime()
        var last = -1
        while (last != events.get() && (System.nanoTime() - t0) < 5e9) {
          last = events.get()
          Thread.sleep(50)
        }
        target: Unit
      }
    } finally spark.listenerManager.unregister(listener)
    val vs = violations.asScala.toSeq.distinct.sorted
    assert(vs.isEmpty, vs.mkString("\n"))
    assert(events.get() > PlanLintSpec.constructionRuns.size,
      "listener saw fewer executions than queries — gate not engaged")
  }
}

object ConstructionPlanSpec {
  /** Ceiling for rows flowing into an undefined-partition window during
    * a construction run at sf0.001. Legitimate frames (top-K cuts,
    * calendar scaffolds, ≤|types|² enumerations, fixed-k model frames)
    * are well under 10³; a corpus-sized global rank (the r10 escape
    * this gate exists to catch) is 10⁴–10⁵ even at this SF.
    */
  val WindowRowBound = 8192L
}
