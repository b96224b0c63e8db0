package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.Hashing

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("exact dedup collapses case/whitespace variants, keeps min doc_id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "different text here"))
      .toDF("doc_id", "text")
    // run the same plan shape as the operator, against the inline fixture
    import org.apache.spark.sql.functions._
    val out = docs
      .select($"doc_id", trim(regexp_replace(lower($"text"), "\\s+", " ")).as("norm"))
      .groupBy(xxhash64($"norm")).agg(min($"doc_id").as("kept_doc_id"),
        count(lit(1)).as("n_copies"))
      .select("kept_doc_id", "n_copies")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }

  test("minhash estimate approximates true jaccard on controlled overlap") {
    // two sets sharing 60 of 80 elements: jaccard = 60/100 = 0.6
    val a = (0 until 80).map(i => Hashing.md5_60(s"tok$i"))
    val b = (20 until 100).map(i => Hashing.md5_60(s"tok$i"))
    val sigA = Hashing.minhash60(a.iterator)
    val sigB = Hashing.minhash60(b.iterator)
    val est = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / Hashing.MinhashK
    assert(math.abs(est - 0.6) < 0.2, s"est=$est")
  }

  test("identical sets give identical minhash signatures") {
    val a = (0 until 50).map(i => Hashing.md5_60(s"x$i"))
    assert(Hashing.minhash60(a.iterator).sameElements(Hashing.minhash60(a.iterator)))
  }

  test("simhash: near-identical docs are close, unrelated docs are far") {
    val base = (0 until 100).map(i => (Hashing.md5_60(s"w$i"), 1))
    val near = (0 until 97).map(i => (Hashing.md5_60(s"w$i"), 1)) ++
      (0 until 3).map(i => (Hashing.md5_60(s"z$i"), 1))
    val far = (0 until 100).map(i => (Hashing.md5_60(s"q$i"), 1))
    val hBase = Hashing.simhash60(base.iterator)
    val dNear = Hashing.hamming(hBase, Hashing.simhash60(near.iterator))
    val dFar = Hashing.hamming(hBase, Hashing.simhash60(far.iterator))
    assert(dNear < dFar, s"near=$dNear far=$dFar")
    assert(dNear <= 16 && dFar > 16)
  }

  test("minhash LSH finds planted near-duplicates end-to-end") {
    import spark.implicits._
    val words = (0 until 60).map(i => s"w$i")
    val docA = words.mkString(" ")
    val docB = (words.take(57) ++ Seq("xx", "yy", "zz")).mkString(" ") // ~high overlap
    val docC = (0 until 60).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("dedup").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.minhashLsh(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("incremental admission: corpus dup, batch dup, and novel doc get the right verdicts") {
    import spark.implicits._
    val wa = (0 until 60).map(i => s"a$i")
    val wb = (0 until 60).map(i => s"b$i")
    val docs = Seq(
      // corpus (doc_id % 5 < 4)
      3L -> wa.mkString(" "),
      // incoming (doc_id % 5 == 4)
      4L -> (wa.take(57) ++ Seq("xx", "yy", "zz")).mkString(" "), // ≈ corpus 3
      9L -> wb.mkString(" "),
      14L -> (wb.take(57) ++ Seq("pp", "qq", "rr")).mkString(" "), // ≈ incoming 9
      19L -> (0 until 60).map(i => s"c$i").mkString(" ")) // novel
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("incr").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.dedupIncremental(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out.keySet == Set(4L, 9L, 14L, 19L), "one verdict per incoming doc")
    assert(out(4L) == (true, false, false), s"4: ${out(4L)}")
    // 9 precedes 14 — first-wins: 9 keeps, 14 is the batch dup
    assert(out(9L) == (false, false, true), s"9: ${out(9L)}")
    assert(out(14L) == (false, true, false), s"14: ${out(14L)}")
    assert(out(19L) == (false, false, true), s"19: ${out(19L)}")
  }

  test("cluster resolution: chained near-dups collapse to one cluster") {
    import spark.implicits._
    // doc1≈doc2≈doc3 (chain), doc4 unrelated — clusters {1,2,3} and {4}
    val words = (0 until 60).map(i => s"w$i")
    val d1 = words.mkString(" ")
    val d2 = (words.drop(5) ++ (0 until 5).map(i => s"x$i")).mkString(" ")
    val d3 = (words.drop(10) ++ (0 until 10).map(i => s"x$i")).mkString(" ")
    val d4 = (0 until 60).map(i => s"z$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("cc").toString
    Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val clusters = Dedup.dedupClusters(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L)
    assert(clusters(4L) == 4L)
  }

  test("banded edit-distance verify equals the full-DP formulation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // same candidates, full (unthresholded) Levenshtein + the same
    // keep decision — the banded kernel must reproduce it row-for-row
    val cand = Dedup.ngramJaccard(spark, sf).select($"doc_a", $"doc_b")
    val txt = graft.Tables.documents(spark, sf).select($"doc_id", $"text")
    val full = cand
      .join(txt.select($"doc_id".as("doc_a"), $"text".as("ta")), "doc_a")
      .join(txt.select($"doc_id".as("doc_b"), $"text".as("tb")), "doc_b")
      .select($"doc_a", $"doc_b",
        levenshtein($"ta", $"tb").cast("long").as("edit_dist"),
        greatest(length($"ta"), length($"tb")).cast("long").as("max_len"))
      .where($"edit_dist" * 10 <= $"max_len" * 3)
      .select($"doc_a", $"doc_b", $"edit_dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Dedup.editDistancePairs(spark, sf)
      .select("doc_a", "doc_b", "edit_dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == full)
    assert(banded.nonEmpty, "fixture must exercise the keep branch")
  }

  test("ngram jaccard is bounded (0, 1] and pairs are ordered a < b") {
    import org.apache.spark.sql.functions._
    val df = Dedup.ngramJaccard(spark, sf)
    assert(df.filter(col("jaccard") <= 0 || col("jaccard") > 1 ||
      col("doc_a") >= col("doc_b")).count() == 0)
  }

  test("eval P/R: counts reconcile with the two pipelines and recall meets the LSH design bar") {
    import org.apache.spark.sql.functions.col
    val r = Dedup.evalPr(spark, sf).collect().head
    val (tp, fp, fn) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val nPred = Dedup.minhashLsh(spark, sf).count()
    val nTruth = Dedup.ngramJaccard(spark, sf)
      .filter(col("jaccard") >= 0.5).count()
    assert(tp + fp == nPred, "predicted set must reconcile")
    assert(tp + fn == nTruth, "truth set must reconcile")
    // 16 bands x 4 rows targets >= 0.9 collision probability at J = 0.5
    assert(r.getDouble(4) >= 0.9, s"recall ${r.getDouble(4)} below design bar")
  }

  test("minhash calibration: estimator error stays inside the 64-permutation theory band") {
    val rows = Dedup.minhashCalibration(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (meanEst, meanTrue, meanErr, maxErr) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(meanErr <= maxErr && maxErr <= 0.25,
        s"bucket ${r.getInt(0)}: max err $maxErr beyond any plausible band")
      // σ ≈ √(s(1−s)/64) ≤ 0.0625; mean |err| within 3σ-ish
      assert(meanErr <= 0.19, s"mean calibration error $meanErr")
      assert(math.abs(meanEst - meanTrue) <= meanErr + 1e-6,
        "bias cannot exceed mean absolute error")
    }
  }

  test("simhash s-curve: radius-1 multiprobe catches EVERY pair inside the pigeonhole zone") {
    val (_, nChunks) = Dedup.simhashParams(spark, sf)
    val guarantee = 2L * nChunks - 1 // h bits over c chunks: some chunk has <= 1 flip
    val rows = Dedup.simhashScurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.filter(_._1 <= guarantee).foreach { case (h, n, c, rate) =>
      assert(c == n && rate == 1.0,
        s"hamming $h inside the guarantee zone (<= $guarantee) but caught $c/$n")
    }
    // and the curve is a real curve: something beyond the zone escapes
    assert(rows.exists { case (h, _, _, rate) => h > guarantee && rate < 1.0 })
  }

  test("simhash calibration: hamming falls as true jaccard rises, within 60-bit range") {
    val rows = Dedup.simhashCalibration(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (b, n, minH, maxH, meanH) =>
      assert(b >= 0 && b <= 9 && n > 0)
      assert(minH >= 0 && maxH <= 60 && meanH >= minH && meanH <= maxH,
        s"bucket $b: hamming stats out of the 60-bit range")
    }
    // Charikar: E[hamming] = 60·θ/π is monotone ↓ in similarity — the
    // decile means must not INCREASE from the lowest to the highest
    // populated bucket (interior deciles may be sparse, so pin the
    // endpoints, the contract a dedup threshold actually relies on)
    val lo = rows.head
    val hi = rows.last
    assert(rows.size < 2 || hi._5 < lo._5,
      s"mean hamming did not fall: bucket ${lo._1}=${lo._5} vs ${hi._1}=${hi._5}")
  }

  test("lsh s-curve: catch rate is monotone in jaccard and saturates at the top") {
    val rows = Dedup.lshScurve(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((b1, _, r1), (b2, _, r2)) =>
        assert(r2 >= r1, s"catch rate fell from bucket $b1 ($r1) to $b2 ($r2)")
      case _ =>
    }
    val top = rows.last
    assert(top._1 >= 8 && top._3 == 1.0,
      s"top bucket ${top._1} catch rate ${top._3}: banding misses true dups")
    assert(rows.head._3 <= 0.05,
      s"bottom-bucket catch rate ${rows.head._3}: banding floods candidates")
  }
}
