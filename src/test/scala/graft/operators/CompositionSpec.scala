package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.TestSpark

/** Pins the composition contract of `curate_full_pipeline`: the whole
  * quality → exact-dedup → canonical-dedup → decontaminate → chunk →
  * pack chain is ONE plan whose only `documents` file scans are the
  * three justified ones (main flag chain, training-gram side, benchmark-
  * gram side), and whose near-dup cluster labels arrive as the memoized
  * checkpoint table (a LogicalRDD leaf), never as a re-run of the label
  * propagation. A fourth scan appearing here means someone broke the
  * flag-column formulation back into per-stage filter+join-back — the
  * regression that multiplies scans by the number of stages at 100 TB.
  */
class CompositionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("full pipeline: stage counts are monotone and consistent") {
    val rows = Curation.fullPipeline(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(nIn, nQ, nEx, nCanon, nClean, nChunks, nToks, nSeq, fill) =
        (1 to 9).map(i => r.getLong(i)).toSeq
      assert(nIn >= nQ && nQ >= nEx && nEx >= nCanon && nCanon >= nClean,
        s"stage survivor counts must be monotone: $r")
      assert(nChunks >= nClean, s"each clean doc yields >= 1 chunk: $r")
      assert(nToks >= nChunks, s"each chunk has >= 1 token: $r")
      assert(nSeq === (nToks + Curation.PackBudget - 1) / Curation.PackBudget)
      assert(fill >= 0 && fill <= Curation.PackBudget)
    }
  }

  test("full pipeline is one plan: 3 documents scans, labels from the memoized checkpoint") {
    val df = Curation.fullPipeline(spark, sf)
    val lp = df.queryExecution.optimizedPlan
    val docScans = lp.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten.filter(_.contains("documents"))
    assert(docScans.size == 3,
      s"expected exactly 3 documents scans (flag chain, train grams, " +
        s"bench grams), got ${docScans.size}")
    val rddLeaves = lp.collect { case r: LogicalRDD => r }
    assert(rddLeaves.nonEmpty,
      "cluster labels must come from the memoized localCheckpoint " +
        "(LogicalRDD leaf), not a re-run of label propagation")
    val nonDocScans = lp.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten.filterNot(_.contains("documents"))
    assert(nonDocScans.isEmpty,
      s"pipeline must touch only documents: $nonDocScans")
  }
}
