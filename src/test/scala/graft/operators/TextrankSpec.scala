package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** TextRank: keyword centrality on the symmetrized co-occurrence graph
  * must (1) rank a hub word that touches many distinct neighbors above
  * its spokes, (2) be direction-free (symmetrization makes "x y" and
  * "y x" corpora identical), and (3) emit an engine-stable total order
  * (rank desc, then word) truncated to 20.
  */
class TextrankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeDocs(texts: Seq[String]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("textrank").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "spec") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("hub word outranks its spokes; order is total and capped") {
    // 'hub' co-occurs with 6 distinct spokes; each spoke only with hub
    val dir = writeDocs(Seq(
      "hub alpha", "hub beta", "hub gamma", "hub delta",
      "hub epsilon", "hub zeta"))
    val rows = Graph.textrank(spark, dir).collect()
    assert(rows.length <= 20)
    assert(rows.head.getString(0) == "hub")
    val ranks = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks("hub") > ranks("alpha"))
    // spokes are structurally identical → identical ranks
    assert(ranks("alpha") == ranks("zeta"))
    // sorted by rank desc then word
    val resorted = rows.map(r => (r.getDouble(1), r.getString(0)))
      .sortBy { case (rk, w) => (-rk, w) }
    assert(rows.map(r => (r.getDouble(1), r.getString(0))).toSeq ==
      resorted.toSeq)
  }

  test("symmetrization makes edge direction irrelevant") {
    val fwd = writeDocs(Seq("north south", "north east", "north west"))
    val rev = writeDocs(Seq("south north", "east north", "west north"))
    val a = Graph.textrank(spark, fwd).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = Graph.textrank(spark, rev).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }
}
