package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Round-6 additions: SemDeDup (cluster-scoped embedding dedup), DSIR
  * importance log-ratios, and the registered bigram AllPairs join —
  * each checked against an independent in-Spark reference on the real
  * fixture (the DuckDB oracle is the cross-engine gate; these pins are
  * the semantic gate).
  */
class SemDedupDsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("semdedup: keep/drop partitions the collection; drop rule matches brute force") {
    import spark.implicits._
    val out = SemDedup.semDedup(spark, sf).localCheckpoint()
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(out.count() == n)
    assert(out.select("vec_id").distinct().count() == n)

    // independent reference for the drop set: brute-force all-pairs
    // cosine (no clustering), restricted to same-cluster pairs
    val cents = KMeans.trainedCentroids(spark, sf)
    val assigned = KMeans.assign(
      graft.Tables.embeddings(spark, sf).select($"vec_id", $"embedding"), cents)
    val v = assigned.select($"vec_id", $"k", $"embedding",
      sqrt(graft.functions.DotF64.dot_f64($"embedding", $"embedding")).as("nrm"))
    val ref = v.selectExpr("k", "vec_id AS a", "embedding AS ea", "nrm AS na")
      .crossJoin(v.selectExpr("k AS kb", "vec_id AS b", "embedding AS eb", "nrm AS nb"))
      .where($"k" === $"kb" && $"a" < $"b")
      .where(graft.functions.DotF64.dot_f64($"ea", $"eb") / ($"na" * $"nb") > SemDedup.Tau)
      .select($"b").distinct().as[Long].collect().toSet
    val dropped = out.where(!$"is_kept").select($"vec_id").as[Long].collect().toSet
    assert(dropped == ref)
    // the fixture has planted duplicate structure — the operator must
    // actually drop something, and keep the vast majority
    assert(dropped.nonEmpty && dropped.size < n / 2)
  }

  test("semdedup: within every dup pair the smaller id is kept unless itself dominated") {
    import spark.implicits._
    val out = SemDedup.semDedup(spark, sf)
    // a vector with NO smaller-id near neighbor in its cluster is kept:
    // minimum vec_id of each cluster is always kept
    val minPerCluster = out.groupBy($"cluster")
      .agg(min($"vec_id").as("vec_id"))
    val joined = out.join(minPerCluster, Seq("cluster", "vec_id"))
    assert(joined.where(!$"is_kept").count() == 0)
  }

  test("dsir: per-doc weights are the decimal sum of term log-ratios; target scores higher") {
    import spark.implicits._
    val out = Curation.dsirWeights(spark, sf).localCheckpoint()
    val docs = graft.Tables.documents(spark, sf)
    // one row per document that has at least one token
    assert(out.count() > 0 && out.count() <= docs.count())
    assert(out.select("doc_id").distinct().count() == out.count())
    // the target LM must prefer its own documents ON AVERAGE — the core
    // DSIR property (importance weights separate the domains)
    val means = out.groupBy($"is_target")
      .agg(avg($"dsir_logratio" / $"n_toks").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"target mean per-token log-ratio ${means(true)} must exceed non-target ${means(false)}")
  }

  test("registered adaptive allpairs equals the prefix-filtered path on the same vectors") {
    import spark.implicits._
    val got = TextOps.allPairsNgramCosine(spark, sf)
      .select($"doc_a", $"doc_b", $"cosine")
      .as[(Long, Long, Double)].collect().toSet

    // gram-order rule is reproducible from the two corpus stats
    val g = TextOps.allPairsGramOrder(spark, sf)
    val stats = TextOps.tokens(graft.Tables.documents(spark, sf))
      .agg(countDistinct($"word").as("v1"), count(lit(1)).as("tot"))
      .head()
    val (v1, tot) = (stats.getLong(0).toDouble, stats.getLong(1).toDouble)
    assert(math.pow(v1, g) >= tot || g == 6)
    assert(g == 2 || math.pow(v1, g - 1) < tot)

    // independent reference: the PREFIX-FILTERED AllPairs path over the
    // identical weight pipeline — pins that candidate generation is
    // complete on the real fixture (the registered direct join and the
    // filtered join must find exactly the same pair set)
    val docs = graft.Tables.documents(spark, sf)
    val n = docs.count()
    val bg = TextOps.ngramTerms(docs, g)
    val tf = bg.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val wgt = tf.join(dfreq, "term")
      .select($"doc_id", $"term",
        round($"tf" * log(lit(n.toDouble) / $"df"), 6).as("w"))
    val norms = wgt.groupBy($"doc_id")
      .agg(sqrt(sum(round($"w" * $"w", 9).cast("decimal(28,12)"))
        .cast("double")).as("nrm"))
    val nw = wgt.join(norms, "doc_id")
      .select($"doc_id", $"term", ($"w" / $"nrm").as("w"))
      .localCheckpoint()
    val cands = TextOps.allPairsCandidates(nw,
      TextOps.AllPairsThreshold - 1e-6, assumeNormalized = true)
    val ref = cands
      .join(nw.select($"doc_id".as("doc_a"), $"term", $"w".as("wa")), "doc_a")
      .join(nw.select($"doc_id".as("doc_b"), $"term", $"w".as("wb")),
        Seq("doc_b", "term"))
      .groupBy($"doc_a", $"doc_b")
      .agg(sum(round($"wa" * $"wb", 9).cast("decimal(28,12)"))
        .cast("double").as("dot"))
      .where($"dot" >= TextOps.AllPairsThreshold)
      .select($"doc_a", $"doc_b", round($"dot", 6).as("cosine"))
      .as[(Long, Long, Double)].collect().toSet

    assert(got == ref)
    assert(got.nonEmpty, "fixture must contain trigram near-dup pairs")
  }

  test("dsir select: k distinct non-target docs, biased toward high weights, reproducible") {
    import spark.implicits._
    val sel = Curation.dsirSelect(spark, sf).localCheckpoint()
    val w = Curation.dsirWeights(spark, sf)
      .where(!$"is_target").localCheckpoint()
    val pool = w.count()
    assert(sel.count() == math.min(Curation.DsirK.toLong, pool))
    assert(sel.select("doc_id").distinct().count() == sel.count())
    // no target-domain doc may be selected (the pool is the raw side)
    assert(sel.join(
      Curation.dsirWeights(spark, sf).where($"is_target"), "doc_id")
      .count() == 0)
    // importance resampling must bias selection toward high log-ratios:
    // selected mean strictly above the full pool mean
    val selMean = sel.agg(avg($"dsir_logratio")).head.getDouble(0)
    val poolMean = w.agg(avg($"dsir_logratio")).head.getDouble(0)
    assert(selMean > poolMean,
      s"selected mean $selMean must exceed pool mean $poolMean")
    // hash-derived keys: a rerun selects the identical set
    val rerun = Curation.dsirSelect(spark, sf)
    assert(sel.select("doc_id").except(rerun.select("doc_id")).count() == 0)
  }

  test("knn graph: per-node top-k matches brute force within the cluster; plan keeps WindowGroupLimit") {
    import spark.implicits._
    val kq = SemDedup.knnGraph(spark, sf)
    // pre-shuffle per-node state stays bounded at k rows
    val plan = kq.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(500))
    val got = kq.as[(Long, Long, Double, Int)].collect().toSet

    // independent reference: exact cosine over same-cluster pairs,
    // identical (cosine DESC, nbr_id) rank, single-threaded
    val cents = KMeans.trainedCentroids(spark, sf)
    val assigned = KMeans.assign(
      graft.Tables.embeddings(spark, sf).select($"vec_id", $"embedding"), cents)
      .as[(Long, Int, Array[Float])].collect()
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val want = assigned.groupBy(_._2).values.flatMap { vs0 =>
      val vs = vs0.toSeq
      val nrm = vs.map { case (id, _, e) => id -> math.sqrt(dot(e, e)) }.toMap
      vs.flatMap { case (id, _, e) =>
        vs.filter(_._1 != id)
          .map { case (nid, _, en) => (nid, dot(e, en) / (nrm(id) * nrm(nid))) }
          .sortBy { case (nid, c) => (-c, nid) }
          .take(SemDedup.KnnK).zipWithIndex
          .map { case ((nid, c), i) => (id, nid, c, i + 1) }
      }
    }.toSet
    assert(got == want)
    // every vector in a cell of ≥ k+1 members has exactly k neighbors
    assert(got.nonEmpty && got.groupBy(_._1).values.forall(_.size <= SemDedup.KnnK))
  }

  test("ood scores: isolation ordering matches the knn graph's mean cosine") {
    import spark.implicits._
    def rnd9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    def rnd6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val g = SemDedup.knnGraph(spark, sf)
      .as[(Long, Long, Double, Int)].collect()
    val want = g.groupBy(_._1).map { case (id, rows) =>
      val cs = rows.map(r => BigDecimal(rnd9(r._3)).setScale(9))
      (id, rows.length.toLong,
        rnd6(1.0 - (cs.sum / cs.length).toDouble))
    }.toSeq.sortBy { case (id, _, sc) => (-sc, id) }
      .take(SemDedup.OodTopN).zipWithIndex
      .map { case ((id, n, sc), i) => (id, n, sc, i + 1) }.toSet
    val df = SemDedup.oodKnn(spark, sf)
    // plan gate (construction-run query, exempt from PlanLintSpec's
    // registry sweep): the only unpartitioned window must rank the
    // post-limit K-row frame — every undefined-partition WindowExec
    // needs a limit/TakeOrdered below it, never all |V| score rows
    val undefUnbounded = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty && w.find {
            case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
            case _: org.apache.spark.sql.execution.GlobalLimitExec => true
            case _ => false
          }.isEmpty => w
    }
    assert(undefUnbounded.isEmpty,
      "oodKnn plans an unpartitioned window with no limit below it")
    val got = df.as[(Long, Long, Double, Int)].collect().toSet
    assert(got == want)
    // the reported outliers really are the least-similar neighborhoods
    val maxKept = got.map(_._3).min
    val allScores = g.groupBy(_._1).map { case (_, rows) =>
      rnd6(1.0 - rows.map(r => BigDecimal(rnd9(r._3)).setScale(9))
        .sum.toDouble / rows.length)
    }
    assert(allScores.count(_ > maxKept) < SemDedup.OodTopN)
  }
}
