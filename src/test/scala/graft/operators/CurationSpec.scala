package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("stratified sample downsamples en harder and is deterministic") {
    val docs = graft.Tables.documents(spark, sf)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = Curation.stratifiedSample(spark, sf)
    val kept = a.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = kept.getOrElse("en", 0L).toDouble / total("en")
    val otherKept = (kept - "en").values.sum.toDouble
    val otherTotal = (total - "en").values.sum.toDouble
    assert(enRate < otherKept / otherTotal,
      s"en rate $enRate should be below the others'")
    // hash-derived decision ⇒ bit-identical on re-run
    val b = Curation.stratifiedSample(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("quality bins: 10 per lang, balanced within 1, ordered by length") {
    val bins = Curation.qualityBins(spark, sf).cache()
    val perLang = bins.groupBy("lang").agg(
      countDistinct("bin").as("n_bins"),
      (max("n_chars") - min("n_chars")).as("spread")).collect()
    assert(perLang.forall(_.getLong(1) == 10L))
    val sizes = bins.groupBy("lang", "bin").count()
      .groupBy("lang").agg((max("count") - min("count")).as("d")).collect()
    assert(sizes.forall(_.getLong(1) <= 1L), "ntile bins must be balanced")
    // a doc in a higher bin is never shorter than one in a lower bin ± tie
    val v = bins.as("a").join(bins.as("b"),
      col("a.lang") === col("b.lang") && col("a.bin") < col("b.bin") &&
        col("a.n_chars") > col("b.n_chars")).count()
    assert(v == 0, s"$v cross-bin order violations")
  }

  test("chunks: bounded windows, correct count and coverage per doc") {
    val chunks = Curation.chunkOverlap(spark, sf).cache()
    assert(chunks.where(col("chunk_tokens") < 1 ||
      col("chunk_tokens") > Curation.ChunkTokens).count() == 0)
    // every doc's chunk count is 1 + floor((n-1)/stride)
    val toks = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id",
        "size(filter(split(lower(text), '\\\\s+'), t -> t <> '')) AS n")
      .where("n > 0")
    val got = chunks.groupBy("doc_id").count()
    val bad = toks.join(got, "doc_id")
      .where(col("count") =!= (lit(1) +
        floor((col("n") - 1) / Curation.ChunkStride))).count()
    assert(bad == 0)
  }

  test("pack stats: offsets are contiguous within source, sequences ordered") {
    val p = Curation.packStats(spark, sf).cache()
    assert(p.where(col("seq_first") > col("seq_last")).count() == 0)
    // start_tok of each doc equals previous doc's start + its tokens
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
    val bad = p.withColumn("expected",
        coalesce(lag(col("start_tok") + col("n_toks"), 1).over(w), lit(0L)))
      .where(col("start_tok") =!= col("expected")).count()
    assert(bad == 0)
  }

  test("domain quota keeps exactly the 10 longest docs per source") {
    val q = Curation.domainQuota(spark, sf).cache()
    val counts = q.groupBy("source").count().collect()
    assert(counts.nonEmpty && counts.forall(_.getLong(1) == 10L))
    // heap result == window formulation on the same tie-free key
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy((col("n_chars") * 1000000L + col("doc_id")).desc)
    val ref = graft.Tables.documents(spark, sf)
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
      .select("doc_id", "source", "n_chars")
    assert(q.exceptAll(ref).isEmpty && ref.exceptAll(q).isEmpty)
  }

  test("unigram surprisal: rare-vocabulary docs score above common ones") {
    val s = Curation.unigramSurprisal(spark, sf).cache()
    assert(s.where(col("mean_surprisal") <= 0).count() == 0)
    // every doc with ≥1 token is scored
    val nDocs = graft.Tables.documents(spark, sf)
      .selectExpr("size(filter(split(lower(text), '\\\\s+'), t -> t <> '')) AS n")
      .where("n > 0").count()
    assert(s.count() == nDocs)
  }

  test("curriculum: unique interleaved positions, balanced shards, no source floods a span") {
    val rows = Curation.curateCurriculum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // positions are a permutation of 0..N-1 (equal-sized sources here)
    assert(rows.map(_._3).toSet == (0L until rows.length).toSet)
    // shards balanced within 1
    val shardCounts = rows.groupBy(_._4).values.map(_.length)
    assert(shardCounts.max - shardCounts.min <= 1)
    // round-robin: within any window of n_sources consecutive positions,
    // every source appears exactly once
    val nSrc = rows.map(_._2).distinct.length
    rows.sortBy(_._3).grouped(nSrc).foreach { w =>
      assert(w.map(_._2).distinct.length == w.length,
        s"source repeats inside one round: ${w.map(_._2).mkString(",")}")
    }
  }

  test("sample ks: statistic reproduces from an independent ecdf scan") {
    import spark.implicits._
    val r = Curation.sampleKs(spark, sf).collect()(0)
    val (nf, ns, atLen, ks) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val full = graft.Tables.documents(spark, sf)
      .select($"n_chars").as[Long].collect().sorted
    val samp = Curation.stratifiedSample(spark, sf)
      .select($"n_chars").as[Long].collect().sorted
    assert(nf == full.length && ns == samp.length)
    val lens = (full ++ samp).distinct.sorted
    val gaps = lens.map { l =>
      val cf = full.count(_ <= l).toLong
      val cs = samp.count(_ <= l).toLong
      l -> math.abs(cf * ns - cs * nf)
    }
    val best = gaps.maxBy { case (l, g) => (g, -l) }
    assert(atLen == best._1, s"gap location $atLen vs ${best._1}")
    assert(math.abs(ks - math.floor(best._2.toDouble / (nf * ns) * 1e6 + 0.5) / 1e6) < 1e-12)
    assert(ks >= 0 && ks <= 1)
  }

  test("token budget: greedy prefix never overshoots and kept counts are maximal") {
    val rows = Curation.tokenBudget(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nKept, toks, util) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nKept <= nDocs)
      assert(toks <= Curation.TokenBudget, s"budget overshoot: $toks")
      assert(math.abs(util - toks.toDouble / Curation.TokenBudget) < 1e-6)
    }
  }

  test("split leakage: pair totals reconcile and the leak flag is exactly cross-split") {
    import org.apache.spark.sql.functions.col
    val rows = Curation.splitLeakage(spark, sf).collect()
    val totalPairs = rows.map(_.getLong(2)).sum
    assert(totalPairs == Dedup.minhashLsh(spark, sf).count(),
      "every near-dup pair lands in exactly one split cell")
    rows.foreach { r =>
      assert(r.getBoolean(3) == (r.getString(0) != r.getString(1)))
      assert(r.getString(0) <= r.getString(1), "unordered combos normalized")
    }
  }

  test("group reservoir: exactly k per source (or all), deterministic, plan keeps WindowGroupLimit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Curation.groupReservoir(spark, sf).localCheckpoint()
    val sizes = graft.Tables.documents(spark, sf)
      .groupBy($"source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.groupBy($"source").agg(count(lit(1)).as("k")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == sizes.keySet)
    got.foreach { case (src, k) =>
      assert(k == math.min(Curation.ReservoirK.toLong, sizes(src)),
        s"$src: $k of ${sizes(src)}")
    }
    // reruns pick the identical sample (hash-derived permutation)
    val rerun = Curation.groupReservoir(spark, sf)
    assert(out.select("doc_id").except(rerun.select("doc_id")).count() == 0)
    // pre-shuffle state stays bounded: rank filter compiles to WindowGroupLimit
    val plan = Curation.groupReservoir(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(500))
  }
}
