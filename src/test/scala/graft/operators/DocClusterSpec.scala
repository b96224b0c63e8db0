package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DocClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("planted vocabulary groups separate into distinct clusters") {
    import spark.implicits._
    // two disjoint vocabularies, 4+ docs each (seeds 4 smallest ids:
    // two from each group), plus an empty doc that must be excluded
    val va = (0 until 30).map(i => s"alpha$i")
    val vb = (0 until 30).map(i => s"beta$i")
    val docs = Seq(
      1L -> va.mkString(" "),
      2L -> vb.mkString(" "),
      3L -> va.drop(3).mkString(" "),
      4L -> vb.drop(3).mkString(" "),
      5L -> va.take(25).mkString(" "),
      6L -> vb.take(25).mkString(" "),
      7L -> "").toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("doccl").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = DocCluster.clusterKmeans(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L),
      "every tokenized doc assigned exactly once, empty doc excluded")
    assert(out.values.forall(k => k >= 0 && k < DocCluster.DocK))
    // group-pure: with K=4 and two natural groups, Lloyd may keep a
    // group split across its two seed clusters — but no cluster may
    // MIX the vocabularies, and the groups may not share a cluster
    val alphaClusters = Set(1L, 3L, 5L).map(out)
    val betaClusters = Set(2L, 4L, 6L).map(out)
    assert(alphaClusters.intersect(betaClusters).isEmpty,
      s"vocabularies mixed in one cluster: $out")
  }

  test("assignment is deterministic and total on the fixture corpus") {
    val a = DocCluster.clusterKmeans(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = DocCluster.clusterKmeans(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, "re-running the fit must reproduce identical clusters")
    assert(a.values.forall(k => k >= 0 && k < DocCluster.DocK))
    // the fixture corpus is heterogeneous enough that a 4-way fit must
    // not collapse to a single cluster
    assert(a.values.toSet.size >= 2, s"degenerate fit: ${a.values.toSet}")
  }
}
