package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.Hashing

/** The NN-descent construction is a pure function of the collection
  * (hash seeds, exact folds, deterministic ranks), so an independent
  * single-threaded Scala implementation must reproduce EVERY final
  * edge — and the descent must actually work: final recall@K against
  * the global exact top-K must clear 0.9 and strictly improve on the
  * seed graph.
  */
class NnDescentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("nn-descent replays exactly and converges toward the exact graph") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .sortBy(_._1)
    val ids = emb.map(_._1)
    val idSet = ids.toSet
    val n = emb.length.toLong
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val byId = emb.toMap
    val nrm = emb.map { case (id, e) => id -> math.sqrt(dot(e, e)) }.toMap
    val cosCache = scala.collection.mutable.HashMap.empty[(Long, Long), Double]
    def cos(a: Long, b: Long): Double = cosCache.getOrElseUpdate((a, b),
      dot(byId(a), byId(b)) / (nrm(a) * nrm(b)))

    // seeds: draws j = 1..SeedDraws, dedupe keeping min j, existing
    // ids only, rank (j, id), take KBuild
    def seedsOf(a: Long): Seq[(Long, Long)] =
      (1 to NnDescent.SeedDraws)
        .map(j => Hashing.md5_60(s"nnd:$a:$j") % n -> j.toLong)
        .filter { case (c, _) => c != a && idSet(c) }
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toSeq
        .sortBy { case (c, j) => (j, c) }
        .take(NnDescent.KBuild).map { case (c, _) => (a, c) }

    def topK(pairs: Set[(Long, Long)]): Map[Long, Seq[(Long, Double, Int)]] =
      pairs.groupBy(_._1).map { case (a, ps) =>
        a -> ps.toSeq.map { case (_, b) => (b, cos(a, b)) }
          .sortBy { case (b, c) => (-c, b) }
          .take(NnDescent.KBuild).zipWithIndex
          .map { case ((b, c), i) => (b, c, i + 1) }
      }

    var g = topK(ids.flatMap(seedsOf).toSet)
    val seedGraph = g
    for (_ <- 1 to NnDescent.Rounds) {
      val undir = g.toSeq.flatMap { case (a, ns) =>
        ns.flatMap { case (b, _, _) => Seq(a -> b, b -> a) }
      }.toSet
      val byA = undir.groupBy(_._1)
      val cand = undir.flatMap { case (a, b) =>
        byA.getOrElse(b, Set.empty).map { case (_, c) => (a, c) }
      }.filter { case (a, c) => a != c } ++
        g.toSeq.flatMap { case (a, ns) => ns.map { case (b, _, _) => (a, b) } }
      g = topK(cand)
    }
    val want = g.flatMap { case (a, ns) =>
      ns.filter(_._3 <= NnDescent.K)
        .map { case (b, c, rn) => (a, b, c, rn) }
    }.toSet

    val got = NnDescent.nnDescent(spark, sf)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == want)

    // convergence: recall@K vs the exact global top-K
    val exact = ids.map { a =>
      a -> ids.filter(_ != a).map(b => (b, cos(a, b)))
        .sortBy { case (b, c) => (-c, b) }.take(NnDescent.K).map(_._1).toSet
    }.toMap
    def recall(gr: Map[Long, Seq[(Long, Double, Int)]]): Double = {
      val hit = gr.map { case (a, ns) =>
        ns.filter(_._3 <= NnDescent.K).map(_._1).toSet
          .intersect(exact(a)).size
      }.sum
      hit.toDouble / exact.values.map(_.size).sum
    }
    val r0 = recall(seedGraph)
    val rf = recall(g)
    assert(rf > r0, s"descent must improve recall: seed $r0, final $rf")
    assert(rf >= 0.9, s"descent must reach >= 0.9 recall@5, got $rf")
  }
}
