package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Hashing

/** Deduplication suite over the `documents` table — the operations a
  * training-data pipeline runs before anything else. EVERY query here is
  * oracle-checked, including the sketches: MinHash+LSH and SimHash build
  * on md5-based 60-bit hashes and mod-p integer permutations
  * (graft.functions.Hashing "oracle-reproducible sketch kit"), so the
  * generated DuckDB SQL rebuilds the identical signatures and the
  * approximate pipelines are equality-compared end to end.
  *
  * Scale design:
  *   - Exact dedup is one hash shuffle on the normalized text hash.
  *   - N-gram Jaccard never goes quadratic: the inverted-index join on
  *     shingles only ever pairs documents that share ≥1 shingle.
  *   - MinHash compresses each document to a constant 64-long signature
  *     (shuffle volume O(docs), not O(tokens)); LSH banding makes
  *     candidate generation a hash join on (band, bandHash) buckets.
  *   - Frequent-shingle skew (stopword shingles bucketing everything
  *     together) is the classic hot-key hazard; the band hash of 4
  *     independent minhashes breaks it.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: normalize whitespace + case, keep the smallest doc_id
    * per identical normalized text. Grouping key is (hash, norm), not
    * the hash alone: at billions of documents a 64-bit birthday
    * collision becomes plausible, and hash-only grouping would silently
    * merge two distinct documents. The hash leads the key so shuffle
    * partitioning and map-side combine run on the cheap fixed-width
    * prefix; the norm rides along purely as the collision tiebreaker
    * (distinct texts per partition each ship once — same volume any
    * exact-dedup shuffle fundamentally needs).
    */
  def exactDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        trim(regexp_replace(lower($"text"), "\\s+", " ")).as("norm"))
      .groupBy(graft.functions.FnvHash64.fnv_hash64($"norm").as("text_hash"),
        $"norm")
      .agg(min($"doc_id").as("kept_doc_id"), count(lit(1)).as("n_copies"))
      .select($"kept_doc_id", $"n_copies")
  }

  /** Oracle groups on the normalized text directly (DuckDB has no
    * xxhash64); identical partitioning of rows ⇒ identical output.
    */
  val exactDedupSql: String =
    """SELECT min(doc_id) AS kept_doc_id, count(*) AS n_copies
      |FROM (SELECT doc_id,
      |        trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
      |      FROM documents)
      |GROUP BY norm""".stripMargin

  // ------------------------------------------------------- n-gram jaccard

  /** Word-trigram shingle sets, one row per (doc_id, shingle), distinct.
    * Docs with fewer than 3 tokens have no shingles (guarded — Spark's
    * `sequence` would otherwise count backwards).
    */
  private def shingleExpr: String =
    """array_distinct(transform(
      |  sequence(1, size(toks) - 2),
      |  i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])))""".stripMargin

  private def shingles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .selectExpr("doc_id",
        "filter(split(lower(text), '\\\\s+'), t -> t <> '') AS toks")
      .where("size(toks) >= 3")
      .selectExpr("doc_id", s"explode($shingleExpr) AS shingle")

  /** N-gram Jaccard near-dup pairs via inverted-index join: candidates
    * are generated only for documents sharing a shingle, shared counts
    * come from the join group sizes, set sizes from a per-doc count.
    */
  /** Near-dup pair table memoized per (session, corpus fingerprint) —
    * same materialize-once rationale as [[dedupClusters]]: the pair
    * query, cluster resolution, and canonical selection all consume it,
    * and the inverted-index join is the expensive part of all three.
    */
  private val pairsCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  /** UNthresholded shared-shingle pair table (doc_a, doc_b, shared,
    * n_a, n_b) — ONE inverted-index join memoized per (session, corpus)
    * feeds every set-overlap measure downstream: Jaccard
    * ([[ngramJaccard]], symmetric) and containment
    * ([[containmentPairs]], asymmetric) are just different final
    * expressions over the same counts.
    */
  private def sharedPairs(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cached(pairsCache, s,
      Similarity.dataKey(dir, "documents"), "dedup_pairs") {
        import s.implicits._
        val sh = shingles(s, dir).cache()
        val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
        val pairs = sh.as("a").join(sh.as("b"), $"a.shingle" === $"b.shingle")
          .where($"a.doc_id" < $"b.doc_id")
          .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
          .agg(count(lit(1)).as("shared"))
        val r = pairs
          .join(sizes.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("n_sh", "n_a"), "doc_a")
          .join(sizes.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("n_sh", "n_b"), "doc_b")
          .localCheckpoint()
        sh.unpersist()
        r
      }

  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    sharedPairs(s, dir)
      .selectExpr("doc_a", "doc_b",
        "CAST(shared AS DOUBLE) / (n_a + n_b - shared) AS jaccard")
      .where($"jaccard" >= 0.2)
  }

  /** Shared CTE body producing the thresholded near-dup pairs — single
    * source of truth for tokenization, shingle width, and the 0.2
    * threshold across the pair oracle AND the cluster oracle.
    */
  private[operators] val pairCteSql: String =
    """toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(1, len(t) - 1),
      |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      |    FROM toks WHERE len(t) >= 3)),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |shared_counts AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT doc_a, doc_b,
      |    CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) AS jaccard
      |  FROM shared_counts
      |  JOIN sizes sa ON sa.doc_id = doc_a
      |  JOIN sizes sb ON sb.doc_id = doc_b
      |  WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= 0.2)""".stripMargin

  val ngramJaccardSql: String =
    s"WITH $pairCteSql\nSELECT doc_a, doc_b, jaccard FROM pairs"

  // ---------------------------------------------------- weighted jaccard

  /** Weighted (multiset) trigram rows — one row per (doc_id, shingle,
    * cnt) with cnt the trigram's occurrence count WITHIN the doc: the
    * non-distinct counterpart of [[shingles]]. The (doc_id, shingle)
    * groupBy collapses repeats in the map-side partial aggregate, so a
    * doc that repeats one banner a thousand times ships each gram once
    * (with its count as payload), exactly like the distinct pipeline.
    */
  /** Tokenize + non-distinct trigram explode select-exprs — one source
    * of truth for the batch form and the streaming ingest form.
    */
  private[graft] val WeightedToksExpr: String =
    "filter(split(lower(text), '\\\\s+'), t -> t <> '') AS toks"
  private[graft] val WeightedShingleExplodeExpr: String =
    """explode(transform(sequence(1, size(toks) - 2),
      |  i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))) AS shingle""".stripMargin

  /** The weighted count table memoized per (session, corpus
    * fingerprint) — the tokenize + trigram explode + count is shared
    * by `dedup_weighted_jaccard` and `dedup_wminhash_calibration`
    * (the [[sharedPairs]] rationale; round 13).
    */
  private val wshCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private def weightedShingles(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cached(wshCache, s,
      Similarity.dataKey(dir, "documents"), "dedup_wsh") {
      graft.Tables.spread(Tables.documents(s, dir), "doc_id")
        .selectExpr("doc_id", WeightedToksExpr)
        .where("size(toks) >= 3")
        .selectExpr("doc_id", WeightedShingleExplodeExpr)
        .groupBy("doc_id", "shingle")
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
    }

  /** Weighted-Jaccard pair threshold — mirrored verbatim in the oracle. */
  val WeightedJaccThresh = 0.2

  /** Generalized (weighted / multiset) Jaccard near-dup pairs:
    * J_w(A,B) = Σ_g min(c_A(g), c_B(g)) / Σ_g max(c_A(g), c_B(g)) over
    * per-doc trigram occurrence counts — the overlap measure that SEES
    * repetition, where set Jaccard ([[ngramJaccard]]) is blind to it:
    * a doc holding 10 pasted copies of a banner scores set-J near 1.0
    * against one clean copy (same distinct grams) but J_w ≈ 1/10 (the
    * nine extra copies sit only in the denominator), so spam-repetition
    * inflation and genuine full-text duplication separate cleanly.
    *
    * Exact and distributed in one inverted-index equi-join on the
    * weighted gram rows: Σmin is the join's sum(least(c_a, c_b)) — work
    * is Σ_g df(g)² over DISTINCT (doc, gram) rows, identical to the set
    * pipeline's profile, because in-doc repetition rides as a count
    * payload and adds no join rows. Σmax needs no second pass:
    * Σ max = n_A + n_B − Σ min with n the multiset sizes (total trigram
    * counts). The boundary compare runs on the micro-rounded value so
    * the float division can never disagree with the DuckDB oracle at
    * the threshold.
    */
  def weightedJaccard(s: SparkSession, dir: String): DataFrame =
    weightedJaccardFromCounts(s, weightedShingles(s, dir))

  /** Finalize over any (doc_id, shingle, cnt) count table — shared by
    * the batch form (row-local counting) and the streaming form (the
    * drained per-(doc, shingle) update-mode state), so both close
    * through the SAME pair join and threshold.
    */
  private[graft] def weightedJaccardFromCounts(
      s: SparkSession, sh: DataFrame): DataFrame = {
    import s.implicits._
    weightedSharedPairs(s, sh)
      .selectExpr("doc_a", "doc_b", "shared_min",
        """floor(CAST(shared_min AS DOUBLE) / (n_a + n_b - shared_min)
          |  * 1e6 + 0.5) / 1e6 AS wjaccard""".stripMargin)
      .where($"wjaccard" >= WeightedJaccThresh)
  }

  /** INCREMENTAL weighted-Jaccard step — `stream_weighted_jaccard`'s
    * per-trigger unit, the [[graft.operators.InvertedIndex.ppjoinNewPairs]]
    * move on the MULTISET measure (simpler: no df-order dependence, so
    * no per-trigger re-snapshot subtlety at all): thresholded pairs
    * with at least one side among `newIds`, over the current full
    * count frame. Docs are trigger-complete (occurrence counting is
    * row-local), so a pair's Σmin/Σmax depends only on the two
    * immutable count vectors and each qualifying pair lands exactly
    * once — at the later doc's trigger. A both-new pair is generated
    * once structurally (the `!is_new || a < b` join condition), never
    * deduped after the fact — a double-counted row would corrupt the
    * Σmin sum, unlike ppjoin's idempotent min(ub).
    */
  private[graft] def weightedJaccardNewPairs(s: SparkSession,
      sh: DataFrame, newIds: DataFrame): DataFrame = {
    import s.implicits._
    val sizes = sh.groupBy($"doc_id").agg(sum($"cnt").as("n"))
    val flagged = sh
      .join(newIds.select($"doc_id", lit(true).as("is_new")),
        Seq("doc_id"), "left")
      .select($"doc_id", $"shingle", $"cnt",
        coalesce($"is_new", lit(false)).as("is_new"))
      .localCheckpoint() // probed twice: new side + full index side
    val newSide = flagged.where($"is_new")
      .select($"doc_id", $"shingle", $"cnt")
    val pairs = newSide.as("a")
      .join(flagged.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" =!= $"b.doc_id" &&
          (!$"b.is_new" || $"a.doc_id" < $"b.doc_id"))
      .select(least($"a.doc_id", $"b.doc_id").as("doc_a"),
        greatest($"a.doc_id", $"b.doc_id").as("doc_b"),
        least($"a.cnt", $"b.cnt").as("m"))
      .groupBy($"doc_a", $"doc_b").agg(sum($"m").as("shared_min"))
    pairs
      .join(sizes.toDF("doc_a", "n_a"), "doc_a")
      .join(sizes.toDF("doc_b", "n_b"), "doc_b")
      .selectExpr("doc_a", "doc_b", "shared_min",
        """floor(CAST(shared_min AS DOUBLE) / (n_a + n_b - shared_min)
          |  * 1e6 + 0.5) / 1e6 AS wjaccard""".stripMargin)
      .where($"wjaccard" >= WeightedJaccThresh)
  }

  /** UNthresholded multiset pair table (doc_a, doc_b, shared_min, n_a,
    * n_b) — the weighted counterpart of [[sharedPairs]]; the near-dup
    * query and the sketch calibration are different final expressions
    * over the same counts.
    */
  private[graft] def weightedSharedPairs(
      s: SparkSession, sh: DataFrame): DataFrame = {
    import s.implicits._
    val sizes = sh.groupBy($"doc_id").agg(sum($"cnt").as("n"))
    val pairs = sh.as("a").join(sh.as("b"), $"a.shingle" === $"b.shingle")
      .where($"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(sum(least($"a.cnt", $"b.cnt")).as("shared_min"))
    pairs
      .join(sizes.toDF("doc_a", "n_a"), "doc_a")
      .join(sizes.toDF("doc_b", "n_b"), "doc_b")
  }

  /** Shared weighted-pair CTE chain (toks → multiset gram counts →
    * sizes → Σmin pair table) — composed by the near-dup oracle AND
    * the weighted-MinHash calibration oracle.
    */
  private val weightedPairCtes: String =
    """toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
      |  FROM documents),
      |wsh AS (
      |  SELECT doc_id, shingle, count(*) AS cnt FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(1, len(t) - 1),
      |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      |    FROM toks WHERE len(t) >= 3)
      |  GROUP BY 1, 2),
      |sizes AS (SELECT doc_id, sum(cnt) AS n FROM wsh GROUP BY 1),
      |shared AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(sum(least(a.cnt, b.cnt)) AS BIGINT) AS shared_min
      |  FROM wsh a JOIN wsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  val weightedJaccardSql: String =
    s"""WITH $weightedPairCtes
       |SELECT doc_a, doc_b, shared_min,
       |  floor(CAST(shared_min AS DOUBLE)
       |      / (CAST(sa.n AS DOUBLE) + CAST(sb.n AS DOUBLE) - shared_min)
       |      * 1e6 + 0.5) / 1e6 AS wjaccard
       |FROM shared
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE floor(CAST(shared_min AS DOUBLE)
       |      / (CAST(sa.n AS DOUBLE) + CAST(sb.n AS DOUBLE) - shared_min)
       |      * 1e6 + 0.5) / 1e6 >= $WeightedJaccThresh""".stripMargin

  // ---------------------------------------------------- weighted minhash

  /** Weighted-MinHash signatures by multiset EXPANSION: occurrence #k
    * of gram g becomes the distinct element "g#k", so the expansions'
    * SET Jaccard equals the generalized Jaccard exactly
    * (|E(A)∩E(B)| = Σ min(c_A, c_B), |E(A)∪E(B)| = Σ max) and the plain
    * MinHash over expanded elements is an unbiased estimator of the
    * weighted measure — the integer-exact alternative to ICWS, whose
    * exp/ln draws could disagree cross-engine in the last ulp. Cost is
    * one row per gram OCCURRENCE (≈ token count — the same volume
    * tokenization already touched), folded to [[Hashing.MinhashK]]
    * mins per doc in a map-side-combinable aggregate; signatures then
    * ship as constant-width rows exactly like the set-side kit.
    */
  private def weightedMinhashSigs(s: SparkSession, wsh: DataFrame): DataFrame = {
    import s.implicits._
    val x = conv(substring(md5(concat_ws("#", $"shingle", $"occ")), 1, 15),
      16, 10).cast("long") % Hashing.ModP
    val mins = (0 until Hashing.MinhashK).map(i =>
      min((lit(Hashing.minhashA60(i)) * $"x" + Hashing.minhashB60(i))
        % Hashing.ModP).as(s"m$i"))
    wsh
      .select($"doc_id", $"shingle", explode(sequence(lit(0L), $"cnt" - 1)).as("occ"))
      .select($"doc_id", x.as("x"))
      .groupBy($"doc_id")
      .agg(mins.head, mins.tail: _*)
      .select($"doc_id",
        array((0 until Hashing.MinhashK).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Weighted-MinHash estimator calibration — the [[minhashCalibration]]
    * sibling for the MULTISET measure: per true weighted-Jaccard decile
    * of the unthresholded pair table, the mean/max gap between the
    * K-component signature agreement rate and the exact Σmin/Σmax
    * value. Sums run in micro-units (exact integers) so the
    * cross-engine fold order can't wobble a float.
    */
  def wminhashCalibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one tokenize/explode/count pass feeds BOTH the exact truth pairs
    // and the signature expansion — the memoized table is already
    // checkpoint-pinned, so neither branch recomputes
    val wsh = weightedShingles(s, dir)
    val truth = weightedSharedPairs(s, wsh)
      .selectExpr("doc_a", "doc_b",
        "CAST(shared_min AS DOUBLE) / (n_a + n_b - shared_min) AS wj")
    val sigs = weightedMinhashSigs(s, wsh)
    truth
      .join(sigs.toDF("doc_a", "sig_a"), "doc_a")
      .join(sigs.toDF("doc_b", "sig_b"), "doc_b")
      .selectExpr("doc_a", "doc_b", "wj",
        s"""CAST(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y),
           |  v -> v)) AS DOUBLE) / ${Hashing.MinhashK} AS est""".stripMargin)
      .selectExpr(
        "least(CAST(floor(wj * 10) AS INT), 9) AS bucket",
        "CAST(floor(est * 1e6 + 0.5) AS BIGINT) AS est_micro",
        "CAST(floor(wj * 1e6 + 0.5) AS BIGINT) AS true_micro",
        "CAST(floor(abs(est - wj) * 1e6 + 0.5) AS BIGINT) AS err_micro")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"est_micro").as("se"), sum($"true_micro").as("st"),
        sum($"err_micro").as("serr"), max($"err_micro").as("max_err_micro"))
      .selectExpr("bucket", "n_pairs",
        "floor(CAST(se AS DOUBLE) / n_pairs + 0.5) / 1e6 AS mean_est",
        "floor(CAST(st AS DOUBLE) / n_pairs + 0.5) / 1e6 AS mean_true",
        "floor(CAST(serr AS DOUBLE) / n_pairs + 0.5) / 1e6 AS mean_abs_err",
        "CAST(max_err_micro AS DOUBLE) / 1e6 AS max_abs_err")
  }

  // lazy: composes minhashPermsCte, declared later in this object —
  // eager init would capture it as null
  lazy val wminhashCalibrationSql: String = {
    val k = Hashing.MinhashK
    s"""WITH $weightedPairCtes,
       |$minhashPermsCte,
       |expd AS (
       |  SELECT doc_id, shingle, unnest(range(0, cnt)) AS occ FROM wsh),
       |elems AS (
       |  SELECT doc_id,
       |    CAST('0x' || substr(md5(shingle || '#' || CAST(occ AS VARCHAR)),
       |      1, 15) AS BIGINT) % ${Hashing.ModP} AS x
       |  FROM expd),
       |wsigs AS (
       |  SELECT doc_id, list(m ORDER BY i) AS sig FROM (
       |    SELECT doc_id, i, min((a * x + bb) % ${Hashing.ModP}) AS m
       |    FROM elems CROSS JOIN perms GROUP BY 1, 2)
       |  GROUP BY 1),
       |truth AS (
       |  SELECT doc_a, doc_b,
       |    CAST(shared_min AS DOUBLE)
       |      / (CAST(sa.n AS DOUBLE) + CAST(sb.n AS DOUBLE) - shared_min) AS wj
       |  FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b),
       |cells AS (
       |  SELECT least(CAST(floor(t.wj * 10) AS INTEGER), 9) AS bucket,
       |    CAST(floor(CAST(len(list_filter(range(1, $k + 1),
       |      i -> a.sig[i] = b.sig[i])) AS DOUBLE) / $k * 1e6 + 0.5) AS BIGINT)
       |      AS est_micro,
       |    CAST(floor(t.wj * 1e6 + 0.5) AS BIGINT) AS true_micro,
       |    CAST(floor(abs(CAST(len(list_filter(range(1, $k + 1),
       |      i -> a.sig[i] = b.sig[i])) AS DOUBLE) / $k - t.wj) * 1e6 + 0.5)
       |      AS BIGINT) AS err_micro
       |  FROM truth t
       |  JOIN wsigs a ON a.doc_id = t.doc_a
       |  JOIN wsigs b ON b.doc_id = t.doc_b)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
       |  floor(CAST(sum(est_micro) AS DOUBLE) / count(*) + 0.5) / 1e6 AS mean_est,
       |  floor(CAST(sum(true_micro) AS DOUBLE) / count(*) + 0.5) / 1e6 AS mean_true,
       |  floor(CAST(sum(err_micro) AS DOUBLE) / count(*) + 0.5) / 1e6 AS mean_abs_err,
       |  CAST(max(err_micro) AS DOUBLE) / 1e6 AS max_abs_err
       |FROM cells GROUP BY bucket""".stripMargin
  }

  // --------------------------------------------------------- minhash+lsh

  /** MinHash signatures computed ROW-LOCALLY: a document's shingles are
    * already colocated in its row, so signature building needs no
    * explode and no shuffle at all — the 64-permutation fold runs as the
    * native `minhash_sig` codegen expression (round 3: replaces the
    * typed `.map`, whose object SerDe boundary broke WholeStageCodegen).
    * Docs with <3 tokens have no shingles (null signature) and are
    * excluded, as in the SQL pipeline.
    */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        graft.functions.MinHashSigExpr.minhash_sig($"text").as("sig"))
      .where($"sig".isNotNull)
  }

  /** MinHash+LSH near-dup candidates, verified with the estimated
    * Jaccard (matching signature fraction). Banding: 16 bands × 4 rows ⇒
    * pairs with true Jaccard ≳ 0.5 collide in ≥1 band w.h.p. The band
    * bucket key is the ':'-joined slice of signature components — a
    * plain equi-join key both engines build identically. (Band-key
    * cardinality grows with the number of distinct signatures, so unlike
    * fixed-width bit buckets this needs no size-derived parameter.)
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = minhashSignatures(s, dir).cache()
    val bands = Hashing.Bands
    val rpb = Hashing.RowsPerBand
    val bandKeys = array((0 until bands).map { b =>
      concat_ws(":",
        (1 to rpb).map(r => element_at($"sig", b * rpb + r).cast("string")): _*)
    }: _*)
    val buckets = sigs.select($"doc_id",
      posexplode(bandKeys).as(Seq("band", "bucket")))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    cand
      .join(sigs.toDF("doc_a", "sig_a"), "doc_a")
      .join(sigs.toDF("doc_b", "sig_b"), "doc_b")
      .selectExpr("doc_a", "doc_b",
        """CAST(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))
          | AS DOUBLE) / size(sig_a) AS est_jaccard""".stripMargin)
      .where($"est_jaccard" >= 0.5)
  }

  /** Generated oracle restating the ENTIRE MinHash+LSH pipeline in SQL:
    * md5-60 shingle hashes, the 64 affine mod-p permutations (params
    * embedded as literals), banding, bucket join, and signature-overlap
    * verification. Integer arithmetic end-to-end — products are bounded
    * by (p−1)·(p−1) < 2^62, so DuckDB BIGINT never overflows and the
    * signatures match the Scala kernel bit-for-bit.
    */
  private val minhashPermsCte: String = {
    val permRows = (0 until Hashing.MinhashK).map { i =>
      s"(${i + 1}, ${Hashing.minhashA60(i)}, ${Hashing.minhashB60(i)})"
    }.mkString(",\n    ")
    s"""perms(i, a, bb) AS (VALUES
       |    $permRows)""".stripMargin
  }

  /** MinHash CTE chain from the shared `sh` shingle CTE (the same
    * definition [[pairCteSql]] carries) down to the banded candidate
    * set — factored so the evaluation oracle can compose both
    * pipelines over ONE pair of toks/sh CTEs.
    */
  /** Signature + band-bucket CTE chain (shh → sigs → buckets) shared by
    * the full-corpus pipeline and the incremental-admission oracle.
    */
  private val minhashSigCtesAfterSh: String = {
    val bandKey = (1 to Hashing.RowsPerBand)
      .map(r => s"sig[${Hashing.RowsPerBand} * b + $r]")
      .mkString(" || ':' || ")
    s"""shh AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) % ${Hashing.ModP} AS x
       |  FROM sh),
       |sigs AS (
       |  SELECT doc_id, list(m ORDER BY i) AS sig FROM (
       |    SELECT doc_id, i, min((a * x + bb) % ${Hashing.ModP}) AS m
       |    FROM shh CROSS JOIN perms GROUP BY doc_id, i)
       |  GROUP BY doc_id),
       |buckets AS (
       |  SELECT doc_id, b, $bandKey AS bucket
       |  FROM sigs CROSS JOIN (SELECT unnest(range(0, ${Hashing.Bands})) AS b))""".stripMargin
  }

  private val minhashCtesAfterSh: String =
    s"""$minhashSigCtesAfterSh,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM buckets a JOIN buckets b
       |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id)""".stripMargin

  private val minhashPredSelect: String =
    s"""SELECT c.doc_a, c.doc_b,
       |  CAST(len(list_filter(range(1, ${Hashing.MinhashK} + 1),
       |    i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / ${Hashing.MinhashK} AS est_jaccard
       |FROM cand c
       |JOIN sigs sa ON sa.doc_id = c.doc_a
       |JOIN sigs sb ON sb.doc_id = c.doc_b
       |WHERE CAST(len(list_filter(range(1, ${Hashing.MinhashK} + 1),
       |    i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / ${Hashing.MinhashK} >= 0.5""".stripMargin

  /** Tokenize → word-trigram shingle CTEs over `documents` — the shared
    * prefix of every generated MinHash oracle.
    */
  private val minhashToksShCtes: String =
    s"""toks AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(1, len(t) - 1),
       |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
       |    FROM toks WHERE len(t) >= 3))""".stripMargin

  val minhashLshSql: String =
    s"""WITH $minhashPermsCte,
       |$minhashToksShCtes,
       |$minhashCtesAfterSh
       |$minhashPredSelect""".stripMargin

  // --------------------------------------------------- incremental dedup

  /** Deterministic corpus/batch split for the incremental contract:
    * docs with `doc_id % 5 == 4` are the arriving snapshot, the rest
    * are the already-admitted corpus.
    */
  val IncrModulus = 5
  val IncrIncomingRes = 4

  /** INCREMENTAL near-dup admission — the shape a growing pretraining
    * corpus actually runs: a new crawl snapshot arrives on top of an
    * already-deduplicated corpus, and only the NEW documents do any
    * work. The corpus side is consulted purely through its band-bucket
    * index (at 100 TB that index is a materialized table partitioned by
    * bucket — see `layout_ivfpq_lists` for the same
    * candidates-from-layout idea); the snapshot's signatures equi-join
    * against it, so per-snapshot cost is |batch| × bucket occupancy and
    * NEVER re-pairs the corpus with itself. Each incoming doc gets two
    * verdicts: `dup_corpus` (≥1 corpus doc with estimated Jaccard ≥ 0.5
    * among its band-bucket candidates) and `dup_batch` (same test
    * against smaller-id docs of its own snapshot — the greedy
    * first-wins rule, independent of those docs' own verdicts, so the
    * decision is order-deterministic and embarrassingly parallel);
    * `keep` = neither. Signature building stays row-local
    * ([[minhashSignatures]] — the native codegen kernel), bucket keys
    * and the 0.5 verify threshold are IDENTICAL to [[minhashLsh]], so
    * an admitted corpus and this incremental pass agree on what "near
    * duplicate" means.
    */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = minhashSignatures(s, dir).cache()
    val rpb = Hashing.RowsPerBand
    val bandKeys = array((0 until Hashing.Bands).map { b =>
      concat_ws(":",
        (1 to rpb).map(r => element_at($"sig", b * rpb + r).cast("string")): _*)
    }: _*)
    val buckets = sigs.select($"doc_id",
      posexplode(bandKeys).as(Seq("band", "bucket")))
    val inc = buckets.where($"doc_id" % IncrModulus === IncrIncomingRes)
    val corp = buckets.where($"doc_id" % IncrModulus < IncrIncomingRes)
    def verifiedNew(cand: DataFrame): DataFrame =
      cand.join(sigs.toDF("doc_new", "sig_a"), "doc_new")
        .join(sigs.toDF("doc_old", "sig_b"), "doc_old")
        .where(expr(
          s"""CAST(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y),
             | v -> v)) AS DOUBLE) / ${Hashing.MinhashK} >= 0.5""".stripMargin))
        .select($"doc_new").distinct()
    val candCorpus = inc.as("i").join(corp.as("c"),
        $"i.band" === $"c.band" && $"i.bucket" === $"c.bucket")
      .select($"i.doc_id".as("doc_new"), $"c.doc_id".as("doc_old"))
      .distinct()
    val candBatch = inc.as("a").join(inc.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" &&
          $"b.doc_id" < $"a.doc_id")
      .select($"a.doc_id".as("doc_new"), $"b.doc_id".as("doc_old"))
      .distinct()
    val dupC = verifiedNew(candCorpus).withColumn("dc", lit(true))
    val dupB = verifiedNew(candBatch).withColumn("db", lit(true))
    sigs.where($"doc_id" % IncrModulus === IncrIncomingRes)
      .select($"doc_id".as("doc_new"))
      .join(dupC, Seq("doc_new"), "left")
      .join(dupB, Seq("doc_new"), "left")
      .select($"doc_new",
        coalesce($"dc", lit(false)).as("dup_corpus"),
        coalesce($"db", lit(false)).as("dup_batch"),
        (!coalesce($"dc", lit(false)) && !coalesce($"db", lit(false)))
          .as("keep"))
  }

  /** ≥ 0.5-estimated-Jaccard verification of a (doc_new, doc_old)
    * candidate CTE, distinct on the new side — the oracle's analogue of
    * `verifiedNew`.
    */
  private def minhashDupNewCte(name: String, cand: String): String =
    s"""$name AS (
       |  SELECT DISTINCT c.doc_new
       |  FROM $cand c
       |  JOIN sigs sa ON sa.doc_id = c.doc_new
       |  JOIN sigs sb ON sb.doc_id = c.doc_old
       |  WHERE CAST(len(list_filter(range(1, ${Hashing.MinhashK} + 1),
       |      i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / ${Hashing.MinhashK} >= 0.5)""".stripMargin

  val dedupIncrementalSql: String =
    s"""WITH $minhashPermsCte,
       |$minhashToksShCtes,
       |$minhashSigCtesAfterSh,
       |inc AS (
       |  SELECT doc_id, b, bucket FROM buckets
       |  WHERE doc_id % $IncrModulus = $IncrIncomingRes),
       |corp AS (
       |  SELECT doc_id, b, bucket FROM buckets
       |  WHERE doc_id % $IncrModulus < $IncrIncomingRes),
       |candc AS (
       |  SELECT DISTINCT i.doc_id AS doc_new, c.doc_id AS doc_old
       |  FROM inc i JOIN corp c ON i.b = c.b AND i.bucket = c.bucket),
       |candb AS (
       |  SELECT DISTINCT a.doc_id AS doc_new, b2.doc_id AS doc_old
       |  FROM inc a JOIN inc b2
       |    ON a.b = b2.b AND a.bucket = b2.bucket AND b2.doc_id < a.doc_id),
       |${minhashDupNewCte("dupc", "candc")},
       |${minhashDupNewCte("dupb", "candb")}
       |SELECT s.doc_id AS doc_new,
       |  (dc.doc_new IS NOT NULL) AS dup_corpus,
       |  (db.doc_new IS NOT NULL) AS dup_batch,
       |  (dc.doc_new IS NULL AND db.doc_new IS NULL) AS keep
       |FROM sigs s
       |LEFT JOIN dupc dc ON dc.doc_new = s.doc_id
       |LEFT JOIN dupb db ON db.doc_new = s.doc_id
       |WHERE s.doc_id % $IncrModulus = $IncrIncomingRes""".stripMargin

  // ------------------------------------------------------------- simhash

  /** 60-bit SimHash per document from token-frequency weights — also
    * row-local: term frequencies and the bit fold run as the native
    * `simhash_sig` codegen expression (round 3: replaces the typed
    * `.flatMap`, whose object SerDe boundary broke WholeStageCodegen).
    * Zero-token docs have a null signature and are excluded
    * (simhash(∅) = 0 would make every empty doc a hamming-0 "duplicate"
    * of every other). Token hash is md5-60 so the generated oracle
    * rebuilds the identical signature in SQL.
    */
  def simhashSignatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        graft.functions.SimHashSigExpr.simhash_sig($"text").as("simhash"))
      .where($"simhash".isNotNull)
  }

  /** SimHash chunk width derived from the corpus size (round-3 fix of
    * the round-2 scale gap): a fixed 15-bit chunk means 32,768 buckets
    * forever — bucket population grows linearly with N and candidate
    * pairs ~N²/32k per chunk. Width = log₂(N/target) clamped to
    * [15, 30]; the number of chunks is 60 ÷ width (4 at 15 bits … 2 at
    * 30). Radius-1 multiprobe on the chunk values buys the recall back:
    * exact-chunk matching guarantees candidates within Hamming distance
    * (chunks − 1); with every 1-bit chunk flip probed the guarantee is
    * 2·chunks − 1 — so even the 2-chunk shape at the clamp ceiling
    * guarantees Hamming ≤ 3, the same as the round-2 4-chunk exact form.
    */
  val SimhashTargetBucketRows = 32L

  def simhashChunkBits(n: Long): Int = Hashing.bucketBits(n, SimhashTargetBucketRows, 15, 30)

  private val simhashParamCache =
    scala.collection.concurrent.TrieMap.empty[String, (Int, Int)]

  /** Per-dir memoized (chunkBits, nChunks) — the oracle generator must
    * embed the same derived shape the query used. Keyed on a data
    * fingerprint so a rewritten fixture path re-derives the shape, and
    * read by [[oracles]] for an EXPLICIT dir (no last-dir global).
    */
  def simhashParams(s: SparkSession, dir: String): (Int, Int) =
    graft.Memo.capped(simhashParamCache)(Similarity.dataKey(dir, "documents"), {
      val bits = simhashChunkBits(Tables.documents(s, dir).count())
      (bits, 60 / bits)
    })

  /** SimHash near-dup pairs: LSH on size-derived bit chunks with
    * radius-1 multiprobe (see [[simhashChunkBits]]), then exact Hamming
    * verification ≤ 16 via the codegen xor-popcount expression.
    */
  /** Candidate table memoized per (session, corpus fingerprint) — the
    * [[sharedPairs]] materialize-once rationale: the chunk explode ×
    * radius-1 probe join is the expensive stage of BOTH consumers
    * (`dedup_simhash`, `dedup_simhash_scurve`), and at 10× it was the
    * registry's single largest recomputation (≈40 s rebuilt twice).
    */
  private val simhashCandCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  /** The chunk-LSH candidate stage of [[simhashPairs]], shared with the
    * banding s-curve audit: (doc_a, doc_b) pairs colliding on some
    * chunk under radius-1 multiprobe, BEFORE Hamming verification.
    */
  private def simhashCandidates(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cached(simhashCandCache, s,
      Similarity.dataKey(dir, "documents"), "simhash_cand") {
        import s.implicits._
        val (bits, nChunks) = simhashParams(s, dir)
        val mask = (1L << bits) - 1
        val sigs = simhashSignatures(s, dir).cache()
        val chunkVals = array((0 until nChunks).map(c =>
          shiftrightunsigned($"simhash", c * bits).bitwiseAND(lit(mask))): _*)
        val chunks = sigs.select($"doc_id",
          posexplode(chunkVals).as(Seq("chunk", "val")))
        val probes = chunks.select($"doc_id", $"chunk",
          explode(array((col("val") +:
            (0 until bits).map(b => col("val").bitwiseXOR(lit(1L << b)))): _*)).as("pval"))
        val r = probes.as("a")
          .join(chunks.as("b"),
            $"a.chunk" === $"b.chunk" && $"a.pval" === $"b.val" &&
              $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
          .distinct()
          .localCheckpoint()
        sigs.unpersist()
        r
      }

  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = simhashSignatures(s, dir)
    val withSigs = simhashCandidates(s, dir)
      .join(sigs.toDF("doc_a", "sig_a"), "doc_a")
      .join(sigs.toDF("doc_b", "sig_b"), "doc_b")
    withSigs.select($"doc_a", $"doc_b",
        graft.functions.Hamming64.hamming64($"sig_a", $"sig_b")
          .cast("long").as("hamming"))
      .where($"hamming" <= 16)
  }

  /** Generated oracle restating the SimHash pipeline for the derived
    * chunk shape: md5-60 token hashes, per-bit weighted sign aggregation
    * over 60 bits, `bits`-wide chunk LSH with radius-1 multiprobe,
    * xor-popcount Hamming verification — all in integer/bit SQL that
    * matches the Scala kernel exactly.
    */
  def simhashPairsSql(bits: Int, nChunks: Int): String = {
    val mask = (1L << bits) - 1
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')) AS t
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) AS x,
       |    count(*) AS w
       |  FROM toks GROUP BY doc_id, t),
       |bits AS (
       |  SELECT doc_id, j,
       |    sum(CASE WHEN ((x >> j) & 1) = 1 THEN w ELSE -w END) AS acc
       |  FROM tf CROSS JOIN (SELECT unnest(range(0, 60)) AS j)
       |  GROUP BY doc_id, j),
       |sigs AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN acc > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
       |      AS BIGINT) AS sig
       |  FROM bits GROUP BY doc_id),
       |chunks AS (
       |  SELECT doc_id, c, (sig >> (c * $bits)) & $mask AS v
       |  FROM sigs CROSS JOIN (SELECT unnest(range(0, $nChunks)) AS c)),
       |probes AS (
       |  SELECT doc_id, c, v AS pv FROM chunks
       |  UNION ALL
       |  SELECT doc_id, c, xor(v, (CAST(1 AS BIGINT) << b.b))
       |  FROM chunks CROSS JOIN (SELECT unnest(range(0, $bits)) AS b) b),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM probes a JOIN chunks b
       |    ON a.c = b.c AND a.pv = b.v AND a.doc_id < b.doc_id)
       |SELECT c.doc_a, c.doc_b,
       |  CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming
       |FROM cand c
       |JOIN sigs sa ON sa.doc_id = c.doc_a
       |JOIN sigs sb ON sb.doc_id = c.doc_b
       |WHERE bit_count(xor(sa.sig, sb.sig)) <= 16""".stripMargin
  }

  // ------------------------------------------------- decontamination

  /** Benchmark decontamination: flag training documents sharing any
    * word-5-gram with a held-out benchmark set (doc_id < 10 stands in
    * for the benchmark corpus). Same inverted-index shape as the
    * Jaccard join — candidates only where a shingle collides, with the
    * benchmark side broadcast (it is always tiny relative to training
    * data). Output: contaminated doc + overlap count.
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = Tables.documents(s, dir)
      .selectExpr("doc_id",
        "filter(split(lower(text), '\\\\s+'), t -> t <> '') AS toks")
      .where("size(toks) >= 5")
      .selectExpr("doc_id",
        """explode(array_distinct(transform(
          |  sequence(1, size(toks) - 4),
          |  i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1], toks[i+2], toks[i+3]))))
          | AS gram""".stripMargin)
    val bench = grams.where($"doc_id" < 10)
      .select($"gram").distinct()
    grams.where($"doc_id" >= 10)
      .join(broadcast(bench), "gram")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  val decontaminateSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id, gram FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(1, len(t) - 3),
      |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS gram
      |    FROM toks WHERE len(t) >= 5)),
      |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 10)
      |SELECT g.doc_id, count(*) AS n_shared_grams
      |FROM grams g JOIN bench b ON g.gram = b.gram
      |WHERE g.doc_id >= 10
      |GROUP BY g.doc_id""".stripMargin

  /** Cross-source contamination matrix: for every pair of sources, the
    * number of distinct word-5-grams they share — the corpus-level view
    * of [[decontaminate]] (which flags single documents against one
    * held-out set). Same inverted-index shape: the join key is the gram,
    * so only sources that actually share a gram ever pair, and the
    * per-gram work is |sources(gram)|² with |sources| small and fixed —
    * never documents². One distinct-aggregation shuffle on (source,
    * gram), one gram-keyed join, one count shuffle on the source pair.
    */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = Tables.documents(s, dir)
      .selectExpr("source",
        "filter(split(lower(text), '\\\\s+'), t -> t <> '') AS toks")
      .where("size(toks) >= 5")
      .selectExpr("source",
        """explode(array_distinct(transform(
          |  sequence(1, size(toks) - 4),
          |  i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1], toks[i+2], toks[i+3]))))
          | AS gram""".stripMargin)
      .distinct()
    grams.as("a").join(grams.as("b"),
        $"a.gram" === $"b.gram" && $"a.source" < $"b.source")
      .groupBy($"a.source".as("source_a"), $"b.source".as("source_b"))
      .agg(count(lit(1)).as("shared_grams"))
  }

  val sourceOverlapSql: String =
    """WITH toks AS (
      |  SELECT source,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT DISTINCT source, gram FROM (
      |    SELECT source,
      |      unnest(list_transform(range(1, len(t) - 3),
      |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS gram
      |    FROM toks WHERE len(t) >= 5))
      |SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared_grams
      |FROM grams a JOIN grams b ON a.gram = b.gram AND a.source < b.source
      |GROUP BY 1, 2""".stripMargin

  /** Intra-document repetition ratio: 1 − (distinct trigrams / total
    * trigrams) — high values flag boilerplate/looping text, a standard
    * pre-training quality gate. Pure narrow map.
    */
  def repetitionRatio(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .selectExpr("doc_id",
        "filter(split(lower(text), '\\\\s+'), t -> t <> '') AS toks")
      .where("size(toks) >= 3")
      .selectExpr("doc_id",
        """transform(sequence(1, size(toks) - 2),
          |  i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])) AS tg""".stripMargin)
      .selectExpr("doc_id",
        "size(tg) AS n_trigrams",
        "1.0 - CAST(size(array_distinct(tg)) AS DOUBLE) / size(tg) AS rep_ratio")
  }

  val repetitionRatioSql: String =
    """SELECT doc_id, len(tg) AS n_trigrams,
      |  1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg) AS rep_ratio
      |FROM (
      |  SELECT doc_id,
      |    list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS tg
      |  FROM (
      |    SELECT doc_id,
      |      list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
      |    FROM documents)
      |  WHERE len(t) >= 3)""".stripMargin

  // ------------------------------------------------- cluster resolution

  /** Connected components over the near-duplicate pair graph — the
    * canonicalization step after fuzzy dedup: every document gets the
    * smallest doc_id reachable through near-dup edges as its cluster id
    * (singletons cluster to themselves).
    *
    * Iterative min-label propagation: each round joins labels to the
    * edge list and takes the elementwise min; converges in
    * graph-diameter rounds (near-dup clusters are shallow). Each round
    * is one shuffle; `localCheckpoint` truncates the growing lineage —
    * the standard shape for iterative algorithms on DataFrames. The
    * oracle is a DuckDB recursive CTE computing min-reachable-id.
    */
  /** Min-label connected components over an undirected edge list
    * (symmetric (src, dst) rows), returning (doc_id, label) for every
    * node that touches an edge plus the number of rounds taken.
    *
    * Each round does TWO label moves before the convergence check:
    *   1. edge relaxation — label(v) ← min over neighbors' labels (the
    *      round-2 algorithm's only move: the min id travels ONE hop per
    *      round, so chains converge in diameter rounds);
    *   2. pointer jumping — label(v) ← label(label(v)): the label chain
    *      doubles each round, so the min id reaches everything in
    *      O(log diameter) rounds (both moves only shrink the label and
    *      only to ids reachable through edges, so the fixpoint is still
    *      exactly min-reachable-id).
    * The convergence check rides the SAME job that materializes the
    * round's labels: an `observe` metric counts changed rows during
    * `localCheckpoint`'s materialization, so there is no per-round
    * driver `isEmpty` re-scan on the critical path (round 2 paid one).
    */
  def connectedComponents(edges: DataFrame, nParts: Int,
      maxIters: Long, hardMaxIters: Long = -1L): (DataFrame, Long) = {
    val s = edges.sparkSession
    import s.implicits._
    // maxIters is the EXPECTED bound (2·log₂ for the relax+jump hybrid —
    // empirically ample but not a proven worst case for the hybrid);
    // hardMaxIters is the PROVEN fallback (node count: even one-hop
    // relaxation alone converges within it). Overshooting the soft bound
    // logs and keeps going; only the hard bound is a hard failure.
    val hardCap = if (hardMaxIters > 0) math.max(hardMaxIters, maxIters) else maxIters
    var labels = edges.select($"src".as("doc_id")).distinct()
      .select($"doc_id", $"doc_id".as("label"))
      .repartition(nParts, $"doc_id").localCheckpoint()
    var converged = false
    var i = 0L
    while (!converged && i < hardCap) {
      if (i == maxIters && hardCap > maxIters)
        System.err.println(s"[graft] connectedComponents: past the expected " +
          s"$maxIters-round log bound; continuing to the node-count cap $hardCap")
      val prop = edges.join(labels, $"src" === $"doc_id")
        .groupBy($"dst").agg(min($"label").as("nl"))
      val relaxed = labels.join(prop, $"doc_id" === $"dst", "left_outer")
        .select($"doc_id", $"label".as("old"),
          least($"label", coalesce($"nl", $"label")).as("lbl"))
      val parents = relaxed.select($"doc_id".as("p_id"), $"lbl".as("p_lbl"))
      val obs = new org.apache.spark.sql.Observation(s"cc_round_$i")
      val cp = relaxed.join(parents, relaxed("lbl") === parents("p_id"), "left_outer")
        .select($"doc_id", $"old",
          least($"lbl", coalesce($"p_lbl", $"lbl")).as("label"))
        .observe(obs,
          sum(when($"label" =!= $"old", 1L).otherwise(0L)).as("changed"))
        .select($"doc_id", $"label")
        .localCheckpoint()
      converged = Option(obs.get("changed")).forall(_ == 0L)
      // STATS RESET — load-bearing, not cosmetic. localCheckpoint's
      // LogicalRDD keeps the ORIGIN plan's statistics, and this loop's
      // two label self-joins MULTIPLY sizeInBytes estimates, so the
      // carried stat SQUARES every round: by round ~16 it is a
      // ~10^5-digit BigInteger and every subsequent plan compile
      // grinds minutes inside BigInteger.multiply (observed on the 10×
      // video dup graph, whose chain-y components need ~24 rounds —
      // clique-shaped audio graphs converge in ~5 and never hit it).
      // Rebuilding the frame over the SAME checkpointed RDD drops the
      // inherited stats to the flat default; the loop's joins are
      // shard-partitioned equi-joins that never rely on stats-based
      // broadcast planning.
      labels = org.apache.spark.sql.graft.ColumnBridge.fromInternalRows(
        s, cp.queryExecution.toRdd, cp.schema)
      i += 1
      if (i % 8 == 0 || converged)
        System.err.println(s"[graft] connectedComponents: round $i " +
          s"changed=${obs.get("changed")} converged=$converged")
    }
    if (!converged)
      // FAIL LOUDLY: silently returning partial labels would split
      // duplicate clusters with no error
      throw new IllegalStateException(
        s"label propagation failed to converge in $hardCap iterations")
    (labels, i)
  }

  /** Cluster labels memoized per (session, data fingerprint):
    * `dedup_clusters` and `dedup_canonical` both need the labels, and
    * re-running the iterative propagation for the second consumer is
    * pure recompute — a production engine materializes the label table
    * once per corpus version and every downstream stage reads it. The
    * memoized frame is `localCheckpoint`ed (pinned blocks, no lineage),
    * and the key's fingerprint invalidates on data change; the session
    * identity guards against a stale frame from a stopped session.
    */
  private val clusterCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cached(clusterCache, s,
      Similarity.dataKey(dir, "documents"), "dedup_clusters")(
      dedupClustersUncached(s, dir).localCheckpoint())

  private def dedupClustersUncached(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = ngramJaccard(s, dir).select($"doc_a", $"doc_b")
    // only documents touching an edge need propagation — everything
    // else is a singleton by construction. The iterative loop runs on
    // the near-dup subgraph at a partition count DERIVED FROM ITS SIZE:
    // ~1M edges per partition. A tiny subgraph collapses to one
    // partition (per-iteration job overhead would dwarf the data at 32
    // partitions); a 100 TB corpus's subgraph fans out to as many
    // partitions as its edge count warrants, capped at 4096.
    val staged = pairs.union(pairs.select($"doc_b", $"doc_a"))
      .toDF("src", "dst").localCheckpoint()
    val nEdges = staged.count()
    val edgesPerPartition = 1L << 20
    val nParts = math.min(nEdges / edgesPerPartition + 1, 4096L).toInt
    val edges =
      if (nParts == staged.rdd.getNumPartitions) staged
      else staged.repartition(nParts).localCheckpoint()
    // pointer jumping needs O(log diameter) rounds and nodes ≤ 2·edges,
    // so 2·log₂(nodes) + 8 is a loose EXPECTED bound; the node count
    // itself is the PROVEN cap (one-hop relaxation alone converges in
    // ≤ nodes rounds), so a pathological graph that needs a few extra
    // rounds degrades to more iterations, not a hard failure
    val maxIters = 2L * Hashing.log2ceil(math.max(2L, 2L * nEdges)) + 8L
    val (labels, _) =
      connectedComponents(edges, nParts, maxIters, hardMaxIters = 2L * nEdges + 2L)
    val singletons = Tables.documents(s, dir).select($"doc_id")
      .join(labels.select($"doc_id"), Seq("doc_id"), "left_anti")
      .select($"doc_id", $"doc_id".as("label"))
    labels.unionByName(singletons).withColumnRenamed("label", "cluster_id")
  }

  /** Shared CTE chain up to the per-doc cluster labels — composed by
    * both the cluster oracle and the soft-dedup weight oracle.
    */
  private val clustersCtesSql: String =
    s"""$pairCteSql,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
       |clusters AS (
       |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)""".stripMargin

  val dedupClustersSql: String =
    s"""WITH RECURSIVE $clustersCtesSql
       |SELECT doc_id, cluster_id FROM clusters""".stripMargin

  /** Duplicate-aware SAMPLING WEIGHTS — soft dedup: instead of hard-
    * dropping near-duplicates, every document in an n-member near-dup
    * cluster gets sample weight 1/n, so each duplicated CONTENT unit
    * contributes total mass 1 to the training mix regardless of how
    * many crawls re-captured it (the SlimPajama/RedPajama-style
    * alternative when hard dedup is too lossy — distinct copies may
    * carry distinct surroundings worth keeping at reduced weight).
    * Composes on the memoized [[dedupClusters]] label table; one
    * cluster-size aggregate and a size-based join back. weight = 1/n is
    * a single IEEE division of two exact ints — bit-identical across
    * engines, no rounding idiom needed.
    */
  def softDedupWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val clusters = dedupClusters(s, dir)
    val sizes = clusters.groupBy($"cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    clusters.join(sizes, Seq("cluster_id"))
      .select($"doc_id", $"cluster_id", $"cluster_size",
        (lit(1.0) / $"cluster_size").as("weight"))
  }

  val softDedupWeightsSql: String =
    s"""WITH RECURSIVE $clustersCtesSql,
       |csizes AS (
       |  SELECT cluster_id, count(*) AS n FROM clusters GROUP BY cluster_id)
       |SELECT c.doc_id, c.cluster_id, CAST(s.n AS BIGINT) AS cluster_size,
       |  CAST(1 AS DOUBLE) / s.n AS weight
       |FROM clusters c JOIN csizes s ON s.cluster_id = c.cluster_id""".stripMargin

  // ------------------------------------------------- paragraph dedup

  /** Paragraph-level (sub-document) exact dedup — production pipelines
    * dedup at BOTH granularities: whole documents (exact/fuzzy above)
    * and repeated passages across documents (boilerplate, licenses,
    * navigation chrome). Documents are split into aligned 10-token
    * chunks; a chunk is KEPT only at its first corpus occurrence
    * (smallest (doc_id, chunk_idx)); output is the per-document
    * retention profile a curation run uses to rewrite the corpus.
    *
    * Scale shape: the explode is narrow; the only shuffle keys on the
    * chunk text for the first-occurrence window (equivalently a
    * min-aggregate — no all-pairs anything), then a same-row aggregate
    * back to doc_id. At 100 TB the chunk column would be a 64-bit hash
    * instead of the text; the text keys here keep the oracle exact.
    */
  def paragraphDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val chunks = Tables.documents(s, dir)
      .selectExpr("doc_id", s"${TextOps.tokensExpr} AS toks")
      .where("size(toks) >= 1")
      .selectExpr("doc_id",
        "explode(sequence(0, ((size(toks) + 9) div 10) - 1)) AS chunk_idx",
        "toks")
      .selectExpr("doc_id", "chunk_idx",
        "concat_ws(' ', slice(toks, chunk_idx * 10 + 1, 10)) AS chunk")
    val firstWin = Window.partitionBy($"chunk")
      .orderBy($"doc_id", $"chunk_idx")
    chunks
      .withColumn("rn", row_number().over(firstWin))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"rn" === 1, 1L).otherwise(0L)).as("n_kept"))
      .withColumn("kept_frac",
        $"n_kept".cast("double") / $"n_chunks".cast("double"))
  }

  val paragraphDedupSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${TextOps.duckTokensExpr} AS t FROM documents),
       |idx AS (
       |  SELECT doc_id, t, unnest(range(0, (len(t) + 9) // 10)) AS chunk_idx
       |  FROM toks WHERE len(t) >= 1),
       |chunks AS (
       |  SELECT doc_id, chunk_idx,
       |    array_to_string(list_transform(
       |      range(chunk_idx * 10 + 1, least(chunk_idx * 10 + 11, len(t) + 1)),
       |      i -> t[i]), ' ') AS chunk
       |  FROM idx),
       |ranked AS (
       |  SELECT doc_id, chunk_idx,
       |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx)
       |      AS rn
       |  FROM chunks)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS kept_frac
       |FROM ranked GROUP BY doc_id""".stripMargin

  /** Cross-doc occurrence threshold above which a chunk counts as
    * boilerplate (the C4 rule: discard lines occurring ≥ 3 times in the
    * corpus).
    */
  val BoilerplateMinDocs = 3

  /** Boilerplate ratio per document — the C4-style cleanup statistic
    * that [[paragraphDedup]] does NOT compute: paragraph dedup keeps
    * each chunk's FIRST occurrence, while boilerplate detection flags
    * EVERY occurrence of a chunk appearing in ≥ [[BoilerplateMinDocs]]
    * distinct documents (headers, footers, nav text, license blocks —
    * the first copy is as much boilerplate as the last). Same 10-token
    * chunking as paragraph dedup so the two statistics describe the
    * same units.
    *
    * Plan: one distinct-df aggregate over (chunk → docs) — vocabulary-
    * sized, map-side combinable — joined back to the chunk stream
    * (AQE sizes the join; at 100 TB the df side is the classic
    * stopword-style skew key, bounded because df saturates at the
    * threshold test: any df cap ≥ [[BoilerplateMinDocs]] gives the
    * identical verdict, so the aggregate can clamp).
    */
  def boilerplateRatio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunks = Tables.documents(s, dir)
      .selectExpr("doc_id", s"${TextOps.tokensExpr} AS toks")
      .where("size(toks) >= 1")
      .selectExpr("doc_id",
        "explode(sequence(0, ((size(toks) + 9) div 10) - 1)) AS chunk_idx",
        "toks")
      .selectExpr("doc_id", "chunk_idx",
        "concat_ws(' ', slice(toks, chunk_idx * 10 + 1, 10)) AS chunk")
    val df = chunks.groupBy($"chunk")
      .agg(countDistinct($"doc_id").as("df"))
    chunks.join(df, Seq("chunk"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"df" >= BoilerplateMinDocs, 1L).otherwise(0L))
          .as("n_boiler"))
      .withColumn("boiler_frac",
        $"n_boiler".cast("double") / $"n_chunks".cast("double"))
  }

  val boilerplateRatioSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${TextOps.duckTokensExpr} AS t FROM documents),
       |idx AS (
       |  SELECT doc_id, t, unnest(range(0, (len(t) + 9) // 10)) AS chunk_idx
       |  FROM toks WHERE len(t) >= 1),
       |chunks AS (
       |  SELECT doc_id, chunk_idx,
       |    array_to_string(list_transform(
       |      range(chunk_idx * 10 + 1, least(chunk_idx * 10 + 11, len(t) + 1)),
       |      i -> t[i]), ' ') AS chunk
       |  FROM idx),
       |cdf AS (
       |  SELECT chunk, count(DISTINCT doc_id) AS df FROM chunks GROUP BY chunk)
       |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN d.df >= $BoilerplateMinDocs THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_boiler,
       |  CAST(sum(CASE WHEN d.df >= $BoilerplateMinDocs THEN 1 ELSE 0 END)
       |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS boiler_frac
       |FROM chunks c JOIN cdf d ON d.chunk = c.chunk
       |GROUP BY c.doc_id""".stripMargin

  // ------------------------------------------- canonical representatives

  /** Canonical-representative selection — the step AFTER cluster
    * resolution in a production dedup pipeline: each near-dup cluster
    * keeps its best member (highest [[TextOps.docQuality]] score, ties
    * to the smallest doc_id) and drops the rest. Output is one row per
    * cluster with the kept doc and the member count, i.e. the dedup
    * decision log a 100 TB curation run would persist.
    *
    * Plan shape: the window rank and the per-cluster aggregate both key
    * on cluster_id, so the window's hash partitioning is reused by the
    * aggregate — one shuffle total past the cluster labels. Quality
    * scores are bit-identical doubles on both engines (same arithmetic,
    * see [[TextOps.docQuality]]), so the rank-1 argmax is deterministic.
    */
  def dedupCanonical(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val clusters = dedupClusters(s, dir) // (doc_id, cluster_id)
    val quality = TextOps.docQuality(s, dir).select($"doc_id", $"quality_score")
    val win = Window.partitionBy($"cluster_id")
      .orderBy($"quality_score".desc, $"doc_id".asc)
    clusters.join(quality, Seq("doc_id"))
      .withColumn("rn", row_number().over(win))
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_members"),
        max(when($"rn" === 1, $"doc_id")).as("keep_doc_id"))
  }

  private val canonicalSql: String =
    s"""WITH RECURSIVE $pairCteSql,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
       |clusters AS (
       |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
       |ranked AS (
       |  SELECT c.cluster_id, c.doc_id,
       |    row_number() OVER (PARTITION BY c.cluster_id
       |      ORDER BY q.quality_score DESC, c.doc_id) AS rn
       |  FROM clusters c JOIN (${TextOps.docQualitySql}) q
       |    ON c.doc_id = q.doc_id)
       |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |  max(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc_id
       |FROM ranked GROUP BY cluster_id""".stripMargin

  /** Asymmetric shingle containment — |A∩B| / |A| per direction: the
    * measure that catches SUBSET duplication (a document quoted or
    * wholesale-embedded inside a larger one), which symmetric Jaccard
    * structurally under-scores (a 50-shingle doc inside a 1000-shingle
    * doc has jaccard ≈ 0.05 but containment 1.0 — invisible to the 0.2
    * pair threshold, caught here). Same memoized [[sharedPairs]] counts,
    * different final expression; kept when either direction ≥ 0.5.
    */
  def containmentPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    sharedPairs(s, dir)
      .selectExpr("doc_a", "doc_b",
        "round(CAST(shared AS DOUBLE) / n_a, 6) AS contain_a_in_b",
        "round(CAST(shared AS DOUBLE) / n_b, 6) AS contain_b_in_a")
      .where($"contain_a_in_b" >= 0.5 || $"contain_b_in_a" >= 0.5)
  }

  val containmentSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(1, len(t) - 1),
      |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      |    FROM toks WHERE len(t) >= 3)),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |shared_counts AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  round(CAST(shared AS DOUBLE) / sa.n_sh, 6) AS contain_a_in_b,
      |  round(CAST(shared AS DOUBLE) / sb.n_sh, 6) AS contain_b_in_a
      |FROM shared_counts
      |JOIN sizes sa ON sa.doc_id = doc_a
      |JOIN sizes sb ON sb.doc_id = doc_b
      |WHERE round(CAST(shared AS DOUBLE) / sa.n_sh, 6) >= 0.5
      |   OR round(CAST(shared AS DOUBLE) / sb.n_sh, 6) >= 0.5""".stripMargin

  // --------------------------------------------------- edit distance
  /** Exact Levenshtein verification of the near-dup candidates — the
    * last stage of a production fuzzy-dedup chain (sketches propose,
    * exact distance disposes). The O(|a|·|b|) DP kernel is quadratic in
    * document length, so it must NEVER see all pairs: it runs only on
    * the inverted-index candidate set (the memoized [[ngramJaccard]]
    * table — bucket-bounded at any corpus size, LshScaleSpec), and each
    * pair's texts are joined in via two doc_id-keyed hash joins. Kept
    * when the edit distance is within 30% of the longer text — the
    * decision `dist·10 ≤ max_len·3` is integer-only; the reported
    * similarity is one identical double expression on both engines
    * (both implement unit-cost Levenshtein — same integers).
    */
  def editDistancePairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cand = ngramJaccard(s, dir).select($"doc_a", $"doc_b")
    val txt = Tables.documents(s, dir).select($"doc_id", $"text")
    // Banded DP: any pair kept by the decision has dist ≤ 0.3·max_len ≤
    // 0.3·(corpus max length), so Spark's thresholded levenshtein with
    // that GLOBAL cap computes the exact distance for every survivor
    // and -1 (O(cap·len) instead of O(len²)) for pairs no per-row
    // decision could keep. The threshold argument is literal-only,
    // hence the 1-row corpus-max collect (bounded, the model-moves
    // pattern); the -1 rows must be filtered EXPLICITLY — the keep
    // inequality alone would admit them (-10 ≤ positive). DuckDB has no
    // thresholded form; the oracle's full Levenshtein agrees on every
    // surviving row because the cap only ever removes rows the
    // decision drops anyway.
    val maxLen = txt.agg(max(length($"text"))).collect()(0).getInt(0)
    val cap = maxLen * 3 / 10 + 1
    cand
      .join(txt.select($"doc_id".as("doc_a"), $"text".as("ta")), "doc_a")
      .join(txt.select($"doc_id".as("doc_b"), $"text".as("tb")), "doc_b")
      .select($"doc_a", $"doc_b",
        levenshtein($"ta", $"tb", cap).cast("long").as("edit_dist"),
        greatest(length($"ta"), length($"tb")).cast("long").as("max_len"))
      .where($"edit_dist" >= 0 && $"edit_dist" * 10 <= $"max_len" * 3)
      .select($"doc_a", $"doc_b", $"edit_dist",
        round(lit(1.0) - $"edit_dist".cast("double") / $"max_len", 6)
          .as("edit_sim"))
  }

  val editDistanceSql: String =
    s"""WITH $pairCteSql,
       |scored AS (
       |  SELECT doc_a, doc_b,
       |    CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
       |    CAST(greatest(length(da.text), length(db.text)) AS BIGINT)
       |      AS max_len
       |  FROM pairs
       |  JOIN documents da ON da.doc_id = doc_a
       |  JOIN documents db ON db.doc_id = doc_b)
       |SELECT doc_a, doc_b, edit_dist,
       |  round(1.0 - CAST(edit_dist AS DOUBLE) / max_len, 6) AS edit_sim
       |FROM scored
       |WHERE edit_dist * 10 <= max_len * 3""".stripMargin

  /** Precision/recall of the deployed MinHash+LSH near-dup detector
    * against exact n-gram Jaccard ground truth — the "measure, don't
    * guess" query for the dedup stack: the predicted set is
    * [[minhashLsh]]'s banded, estimate-thresholded pairs; the truth
    * set is the memoized exact shared-shingle table at the same 0.5
    * Jaccard bar. TP/FP/FN come from ONE full-outer join of the two
    * bounded pair tables (both already candidate-pruned — never n²),
    * and precision/recall/F1 are the standard count ratios
    * (F1 = 2tp/(2tp+fp+fn) — computed from counts directly so no
    * intermediate ratio rounding compounds), floor-pinned. At scale
    * this runs EXACTLY as the production recall audit would: on the
    * same inverted-index + LSH machinery, no extra shuffles.
    */
  def evalPr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val truth = sharedPairs(s, dir)
      .where(expr("CAST(shared AS DOUBLE) / (n_a + n_b - shared) >= 0.5"))
      .select($"doc_a", $"doc_b", lit(1L).as("t"))
    val pred = minhashLsh(s, dir)
      .select($"doc_a", $"doc_b", lit(1L).as("p"))
    pred.join(truth, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(when($"p" === 1L && $"t" === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when($"p" === 1L && $"t".isNull, 1L).otherwise(0L)).as("fp"),
        sum(when($"p".isNull && $"t" === 1L, 1L).otherwise(0L)).as("fn"))
      .selectExpr("tp", "fp", "fn",
        """CASE WHEN tp + fp = 0 THEN NULL ELSE
          |  floor(CAST(tp AS DOUBLE) / (tp + fp) * 1e6 + 0.5) / 1e6
          |END AS precision""".stripMargin,
        """CASE WHEN tp + fn = 0 THEN NULL ELSE
          |  floor(CAST(tp AS DOUBLE) / (tp + fn) * 1e6 + 0.5) / 1e6
          |END AS recall""".stripMargin,
        """CASE WHEN 2 * tp + fp + fn = 0 THEN NULL ELSE
          |  floor(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) * 1e6 + 0.5) / 1e6
          |END AS f1""".stripMargin)
  }

  val evalPrSql: String =
    s"""WITH $minhashPermsCte,
       |$pairCteSql,
       |$minhashCtesAfterSh,
       |pred AS (
       |$minhashPredSelect),
       |truth AS (SELECT doc_a, doc_b FROM pairs WHERE jaccard >= 0.5),
       |j AS (
       |  SELECT
       |    CASE WHEN p.doc_a IS NOT NULL AND t.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_tp,
       |    CASE WHEN p.doc_a IS NOT NULL AND t.doc_a IS NULL THEN 1 ELSE 0 END AS is_fp,
       |    CASE WHEN p.doc_a IS NULL AND t.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_fn
       |  FROM pred p FULL OUTER JOIN truth t
       |    ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b),
       |c AS (
       |  SELECT CAST(sum(is_tp) AS BIGINT) AS tp,
       |    CAST(sum(is_fp) AS BIGINT) AS fp,
       |    CAST(sum(is_fn) AS BIGINT) AS fn
       |  FROM j)
       |SELECT tp, fp, fn,
       |  CASE WHEN tp + fp = 0 THEN NULL ELSE
       |    floor(CAST(tp AS DOUBLE) / (tp + fp) * 1e6 + 0.5) / 1e6
       |  END AS precision,
       |  CASE WHEN tp + fn = 0 THEN NULL ELSE
       |    floor(CAST(tp AS DOUBLE) / (tp + fn) * 1e6 + 0.5) / 1e6
       |  END AS recall,
       |  CASE WHEN 2 * tp + fp + fn = 0 THEN NULL ELSE
       |    floor(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) * 1e6 + 0.5) / 1e6
       |  END AS f1
       |FROM c""".stripMargin

  /** LSH calibration s-curve: per exact-Jaccard decile, the fraction of
    * (candidate-measured) pairs the deployed MinHash-LSH banding
    * catches — the empirical probability curve that justifies the
    * band/row parameter choice (theory: P[caught] = 1 − (1 − s^r)^b;
    * a mis-sized banding shows up as a curve whose knee sits away from
    * the dedup threshold). Both sides ride the same memoized
    * inverted-index pair counts and the same banding CTEs as
    * [[evalPr]] — one extra decile group over audit-sized frames.
    */
  def lshScurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val measured = sharedPairs(s, dir)
      .selectExpr("doc_a", "doc_b",
        "CAST(shared AS DOUBLE) / (n_a + n_b - shared) AS jaccard")
    val pred = minhashLsh(s, dir)
      .select($"doc_a", $"doc_b", lit(1L).as("p"))
    measured.join(pred, Seq("doc_a", "doc_b"), "left")
      .selectExpr("least(CAST(floor(jaccard * 10) AS INT), 9) AS bucket",
        "coalesce(p, 0L) AS caught")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_pairs"), sum($"caught").as("n_caught"))
      .selectExpr("bucket", "n_pairs", "n_caught",
        "floor(CAST(n_caught AS DOUBLE) / n_pairs * 1e6 + 0.5) / 1e6 AS catch_rate")
  }

  val lshScurveSql: String =
    s"""WITH $minhashPermsCte,
       |$pairCteSql,
       |$minhashCtesAfterSh,
       |pred AS (
       |$minhashPredSelect),
       |measured AS (
       |  SELECT sc.doc_a, sc.doc_b,
       |    CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) AS jaccard
       |  FROM shared_counts sc
       |  JOIN sizes sa ON sa.doc_id = sc.doc_a
       |  JOIN sizes sb ON sb.doc_id = sc.doc_b),
       |m AS (
       |  SELECT p.doc_a, p.doc_b,
       |    least(CAST(floor(p.jaccard * 10) AS INTEGER), 9) AS bucket,
       |    CASE WHEN pr.doc_a IS NOT NULL THEN 1 ELSE 0 END AS caught
       |  FROM measured p LEFT JOIN pred pr
       |    ON pr.doc_a = p.doc_a AND pr.doc_b = p.doc_b)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(caught) AS BIGINT) AS n_caught,
       |  floor(CAST(sum(caught) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS catch_rate
       |FROM m GROUP BY bucket""".stripMargin

  /** MinHash estimator calibration: for every kept near-dup pair, how
    * far the signature-overlap Jaccard ESTIMATE sits from the exact
    * shingle Jaccard, summarized per true-Jaccard decile — the
    * sketch-accuracy readout that justifies trusting 64 permutations
    * (theory: σ ≈ √(s(1−s)/64) ≈ 0.06 at s=0.5). Estimates are k/64
    * dyadic rationals and true Jaccards exact ratios, so per-pair
    * errors floor into micro-units and every aggregate is an integer
    * sum over the SAME memoized tables the detector and s-curve use.
    */
  def minhashCalibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val est = minhashLsh(s, dir)
    val truth = sharedPairs(s, dir)
      .selectExpr("doc_a", "doc_b",
        "CAST(shared AS DOUBLE) / (n_a + n_b - shared) AS jaccard")
    est.join(truth, Seq("doc_a", "doc_b"))
      .selectExpr(
        "least(CAST(floor(jaccard * 10) AS INT), 9) AS bucket",
        "CAST(floor(est_jaccard * 1e6 + 0.5) AS BIGINT) AS est_micro",
        "CAST(floor(jaccard * 1e6 + 0.5) AS BIGINT) AS true_micro",
        "CAST(floor(abs(est_jaccard - jaccard) * 1e6 + 0.5) AS BIGINT) AS err_micro")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"est_micro").as("se"), sum($"true_micro").as("st"),
        sum($"err_micro").as("serr"), max($"err_micro").as("max_err_micro"))
      .selectExpr("bucket", "n_pairs",
        "floor(CAST(se AS DOUBLE) / n_pairs + 0.5) / 1e6 AS mean_est",
        "floor(CAST(st AS DOUBLE) / n_pairs + 0.5) / 1e6 AS mean_true",
        "floor(CAST(serr AS DOUBLE) / n_pairs + 0.5) / 1e6 AS mean_abs_err",
        "CAST(max_err_micro AS DOUBLE) / 1e6 AS max_abs_err")
  }

  val minhashCalibrationSql: String =
    s"""WITH $minhashPermsCte,
       |$pairCteSql,
       |$minhashCtesAfterSh,
       |pred AS (
       |$minhashPredSelect),
       |truth AS (
       |  SELECT sc.doc_a, sc.doc_b,
       |    CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) AS jaccard
       |  FROM shared_counts sc
       |  JOIN sizes sa ON sa.doc_id = sc.doc_a
       |  JOIN sizes sb ON sb.doc_id = sc.doc_b),
       |cells AS (
       |  SELECT least(CAST(floor(t.jaccard * 10) AS INTEGER), 9) AS bucket,
       |    CAST(floor(p.est_jaccard * 1e6 + 0.5) AS BIGINT) AS est_micro,
       |    CAST(floor(t.jaccard * 1e6 + 0.5) AS BIGINT) AS true_micro,
       |    CAST(floor(abs(p.est_jaccard - t.jaccard) * 1e6 + 0.5) AS BIGINT) AS err_micro
       |  FROM pred p JOIN truth t
       |    ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
       |  floor(CAST(sum(est_micro) AS DOUBLE) / count(*) + 0.5) / 1e6 AS mean_est,
       |  floor(CAST(sum(true_micro) AS DOUBLE) / count(*) + 0.5) / 1e6 AS mean_true,
       |  floor(CAST(sum(err_micro) AS DOUBLE) / count(*) + 0.5) / 1e6 AS mean_abs_err,
       |  CAST(max(err_micro) AS DOUBLE) / 1e6 AS max_abs_err
       |FROM cells GROUP BY bucket""".stripMargin

  /** SimHash estimator calibration — the [[minhashCalibration]] sibling
    * for the OTHER deployed near-dup sketch: per true-Jaccard decile of
    * the measured pair table, the distribution (mean/min/max) of 60-bit
    * signature Hamming distances. Theory (Charikar 2002): P[bit
    * differs] = θ/π for angle θ between weighted term vectors, so
    * E[hamming] = 60·θ/π falls monotonically as similarity rises — the
    * spec pins that monotonicity and the audit query publishes the
    * measured curve. Everything is INTEGER (bit_count of xor; mean
    * floored to micro-units), so both engines hash-match exactly, and
    * the pair/signature inputs are the same memoized tables the
    * detectors use — the audit adds one audit-sized join, no new corpus
    * pass.
    */
  def simhashCalibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = simhashSignatures(s, dir)
    val truth = sharedPairs(s, dir)
      .selectExpr("doc_a", "doc_b",
        "CAST(shared AS DOUBLE) / (n_a + n_b - shared) AS jaccard")
    truth
      .join(sigs.toDF("doc_a", "sig_a"), "doc_a")
      .join(sigs.toDF("doc_b", "sig_b"), "doc_b")
      .select(
        expr("least(CAST(floor(jaccard * 10) AS INT), 9)").as("bucket"),
        graft.functions.Hamming64.hamming64($"sig_a", $"sig_b")
          .cast("long").as("h"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_pairs"), sum($"h").as("sum_hamming"),
        min($"h").as("min_hamming"), max($"h").as("max_hamming"))
      .selectExpr("bucket", "n_pairs", "sum_hamming",
        "min_hamming", "max_hamming",
        "floor(CAST(sum_hamming AS DOUBLE) / n_pairs * 1e6 + 0.5) / 1e6 AS mean_hamming")
  }

  /** Oracle: the shared pair CTEs plus the SimHash signature pipeline
    * (renamed s-prefixed CTEs — [[pairCteSql]] already owns `toks`, an
    * ARRAY-shaped table; the signature build re-derives per-token rows
    * from it, guaranteeing the same tokenization).
    */
  val simhashCalibrationSql: String =
    s"""WITH $pairCteSql,
       |stf AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS x,
       |    count(*) AS w
       |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
       |  GROUP BY doc_id, tok),
       |sbits AS (
       |  SELECT doc_id, j,
       |    sum(CASE WHEN ((x >> j) & 1) = 1 THEN w ELSE -w END) AS acc
       |  FROM stf CROSS JOIN (SELECT unnest(range(0, 60)) AS j)
       |  GROUP BY doc_id, j),
       |ssigs AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN acc > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
       |      AS BIGINT) AS sig
       |  FROM sbits GROUP BY doc_id),
       |truth AS (
       |  SELECT sc.doc_a, sc.doc_b,
       |    CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) AS jaccard
       |  FROM shared_counts sc
       |  JOIN sizes sa ON sa.doc_id = sc.doc_a
       |  JOIN sizes sb ON sb.doc_id = sc.doc_b),
       |cells AS (
       |  SELECT least(CAST(floor(t.jaccard * 10) AS INTEGER), 9) AS bucket,
       |    CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS h
       |  FROM truth t
       |  JOIN ssigs sa ON sa.doc_id = t.doc_a
       |  JOIN ssigs sb ON sb.doc_id = t.doc_b)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(h) AS BIGINT) AS sum_hamming,
       |  CAST(min(h) AS BIGINT) AS min_hamming,
       |  CAST(max(h) AS BIGINT) AS max_hamming,
       |  floor(CAST(sum(h) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS mean_hamming
       |FROM cells GROUP BY bucket""".stripMargin

  /** SimHash banding s-curve — the [[lshScurve]] analog for the chunk
    * index: per HAMMING DISTANCE over the measured pair table, the
    * fraction the radius-1 chunk multiprobe generates as candidates.
    * The pigeonhole guarantee becomes a measured fact: h differing bits
    * across `nChunks` chunks leave some chunk with ≤ 1 flip whenever
    * h ≤ 2·nChunks − 1, so catch_rate MUST be exactly 1.0 in that zone
    * (DedupSpec pins it); beyond it the curve shows the recall the
    * verification threshold actually rides on. Integer counts
    * throughout — one audit-sized join over the memoized pair table
    * plus the shared candidate stage, no new corpus pass.
    */
  def simhashScurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = simhashSignatures(s, dir)
    val truth = sharedPairs(s, dir).select($"doc_a", $"doc_b")
    val withH = truth
      .join(sigs.toDF("doc_a", "sig_a"), "doc_a")
      .join(sigs.toDF("doc_b", "sig_b"), "doc_b")
      .select($"doc_a", $"doc_b",
        graft.functions.Hamming64.hamming64($"sig_a", $"sig_b")
          .cast("long").as("hamming"))
    val cand = simhashCandidates(s, dir).withColumn("caught", lit(1L))
    withH.join(cand, Seq("doc_a", "doc_b"), "left")
      .groupBy($"hamming")
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce($"caught", lit(0L))).as("n_caught"))
      .selectExpr("hamming", "n_pairs", "n_caught",
        "floor(CAST(n_caught AS DOUBLE) / n_pairs * 1e6 + 0.5) / 1e6 AS catch_rate")
  }

  /** Oracle: shared pair CTEs + the s-prefixed signature pipeline (as
    * [[simhashCalibrationSql]]) + the chunk/probe/candidate stage for
    * the derived (bits, nChunks) shape.
    */
  def simhashScurveSql(bits: Int, nChunks: Int): String = {
    val mask = (1L << bits) - 1
    s"""WITH $pairCteSql,
       |stf AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS x,
       |    count(*) AS w
       |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
       |  GROUP BY doc_id, tok),
       |sbits AS (
       |  SELECT doc_id, j,
       |    sum(CASE WHEN ((x >> j) & 1) = 1 THEN w ELSE -w END) AS acc
       |  FROM stf CROSS JOIN (SELECT unnest(range(0, 60)) AS j)
       |  GROUP BY doc_id, j),
       |ssigs AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN acc > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
       |      AS BIGINT) AS sig
       |  FROM sbits GROUP BY doc_id),
       |schunks AS (
       |  SELECT doc_id, c, (sig >> (c * $bits)) & $mask AS v
       |  FROM ssigs CROSS JOIN (SELECT unnest(range(0, $nChunks)) AS c)),
       |sprobes AS (
       |  SELECT doc_id, c, v AS pv FROM schunks
       |  UNION ALL
       |  SELECT doc_id, c, xor(v, (CAST(1 AS BIGINT) << b.b))
       |  FROM schunks CROSS JOIN (SELECT unnest(range(0, $bits)) AS b) b),
       |scand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sprobes a JOIN schunks b
       |    ON a.c = b.c AND a.pv = b.v AND a.doc_id < b.doc_id),
       |cells AS (
       |  SELECT CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming,
       |    CASE WHEN sc.doc_a IS NOT NULL THEN 1 ELSE 0 END AS caught
       |  FROM shared_counts p
       |  JOIN ssigs sa ON sa.doc_id = p.doc_a
       |  JOIN ssigs sb ON sb.doc_id = p.doc_b
       |  LEFT JOIN scand sc ON sc.doc_a = p.doc_a AND sc.doc_b = p.doc_b)
       |SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(caught) AS BIGINT) AS n_caught,
       |  floor(CAST(sum(caught) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS catch_rate
       |FROM cells GROUP BY hamming""".stripMargin
  }

  // ----------------------------------------------------------- winnowing

  /** Window width for robust winnowing — selected-fingerprint density is
    * guaranteed in [1/w, 2/(w+1)] of gram positions, so w is the
    * size/recall knob: any shared run of at least w + k − 1 tokens
    * (k = 3-token grams here) is GUARANTEED to share a fingerprint.
    */
  val WinnowW = 4

  /** Minimum containment overlap for a reported pair. */
  val WinnowOverlap = 0.5

  /** Robust-winnowing fingerprint dedup — Schleimer/Wilkerson/Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting" (SIGMOD
    * 2003), the MOSS scheme: hash every word-trigram AT ITS POSITION,
    * slide a width-[[WinnowW]] window over the hash sequence, and keep
    * each window's minimum — ties broken to the RIGHTMOST position
    * (that is the "robust" variant: adjacent windows re-select the same
    * physical occurrence, so the fingerprint set stays 2/(w+1)-dense
    * instead of re-firing per window). Docs are then paired by shared
    * selected hashes and scored by containment
    * (shared / min(|fp_a|, |fp_b|)).
    *
    * Differs from every other entry in this module: [[minhashLsh]]
    * approximates SET-level Jaccard, [[ngramJaccard]] computes it
    * exactly, while winnowing is POSITIONAL — its guarantee is about
    * contiguous shared substrings (any shared token run of length ≥
    * w + 2 shares a fingerprint), the plagiarism/clone-detection
    * contract.
    *
    * Plan shape: the hash sequence is a narrow projection; selection is
    * ONE window pass per doc (partitioned by doc_id — never a global
    * window); pairing is an equi-join on the selected hash, so the work
    * is Σ_h df(h)² over FINGERPRINT hashes — the winnowed density (≈
    * 2/(w+1) of grams) cuts the join input ~2.5× vs raw grams before
    * any pairing happens. At 100 TB the standard df-cut on ultra-common
    * fingerprints bounds the worst key (the `dedup_source_overlap`
    * note); the min-encode trick (h·2³² + (2³²−1−p), one `min` over the
    * frame) keeps tie-breaking inside a single codegen'd window
    * aggregate instead of a two-pass argmin.
    */
  def winnowPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, dir).select($"doc_id",
        expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')").as("t"))
      .where(size($"t") >= 3)
    val grams = toks.select($"doc_id",
        posexplode(expr(
          """transform(sequence(1, size(t) - 2),
            |  i -> concat_ws(' ', t[i-1], t[i], t[i+1]))""".stripMargin))
          .as(Seq("p0", "gram")))
      .select($"doc_id", ($"p0" + 1).as("p"),
        (conv(substring(md5($"gram"), 1, 15), 16, 10).cast("long") %
          graft.functions.Hashing.ModP).as("h"))
    val frame = Window.partitionBy($"doc_id").orderBy($"p")
      .rowsBetween(Window.currentRow, WinnowW - 1)
    val whole = Window.partitionBy($"doc_id")
    val sel = grams
      .select($"doc_id", $"p",
        ($"h" * lit(4294967296L) + (lit(4294967295L) - $"p")).as("key"))
      .withColumn("wmin", min($"key").over(frame))
      .withColumn("maxp", max($"p").over(whole))
      .where($"p" <= greatest($"maxp" - (WinnowW - 1), lit(1)))
      .select($"doc_id", expr("wmin DIV 4294967296").as("fp"))
      .distinct()
    val counts = sel.groupBy($"doc_id").agg(count(lit(1)).as("nfp"))
    sel.as("a").join(sel.as("b"),
        $"a.fp" === $"b.fp" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(counts.toDF("doc_a", "fp_a"), "doc_a")
      .join(counts.toDF("doc_b", "fp_b"), "doc_b")
      .withColumn("overlap", expr(
        "floor(CAST(shared AS DOUBLE) / least(fp_a, fp_b) * 1e6 + 0.5) / 1e6"))
      .where($"overlap" >= WinnowOverlap)
      .select($"doc_a", $"doc_b", $"shared", $"fp_a", $"fp_b", $"overlap")
  }

  val winnowPairsSql: String =
    s"""WITH toks AS (
       |  SELECT * FROM (
       |    SELECT doc_id,
       |      list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |        t -> t <> '') AS t
       |    FROM documents) WHERE len(t) >= 3),
       |grams AS (
       |  SELECT doc_id, u.p AS p,
       |    CAST(('0x' || substring(md5(u.g), 1, 15)) AS BIGINT)
       |      % ${graft.functions.Hashing.ModP} AS h
       |  FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(1, len(t) - 1),
       |        i -> {'p': i, 'g': t[i] || ' ' || t[i+1] || ' ' || t[i+2]})) AS u
       |    FROM toks)),
       |sel AS (
       |  SELECT DISTINCT doc_id, wmin // 4294967296 AS fp FROM (
       |    SELECT doc_id, p,
       |      min(h * 4294967296 + (4294967295 - p)) OVER (
       |        PARTITION BY doc_id ORDER BY p
       |        ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS wmin,
       |      max(p) OVER (PARTITION BY doc_id) AS maxp
       |    FROM grams)
       |  WHERE p <= greatest(maxp - ${WinnowW - 1}, 1)),
       |counts AS (SELECT doc_id, count(*) AS nfp FROM sel GROUP BY doc_id),
       |shr AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT s.doc_a, s.doc_b, CAST(s.shared AS BIGINT) AS shared,
       |  CAST(ca.nfp AS BIGINT) AS fp_a, CAST(cb.nfp AS BIGINT) AS fp_b,
       |  floor(CAST(s.shared AS DOUBLE) / least(ca.nfp, cb.nfp) * 1e6 + 0.5)
       |    / 1e6 AS overlap
       |FROM shr s
       |JOIN counts ca ON ca.doc_id = s.doc_a
       |JOIN counts cb ON cb.doc_id = s.doc_b
       |WHERE floor(CAST(s.shared AS DOUBLE) / least(ca.nfp, cb.nfp) * 1e6
       |  + 0.5) / 1e6 >= $WinnowOverlap""".stripMargin

  // ------------------------------------------- content-defined chunking

  /** Rolling-window width for the CDC boundary test. */
  val CdcWindow = 8

  /** Boundary divisor — a position ends a chunk when the window hash
    * ≡ 0 (mod 64), so expected chunk length ≈ 64 chars.
    */
  val CdcMask = 64L

  private val CdcP = 1000000007L

  /** 31^j mod p for j = 0..w−1 — shared by the Spark kernel and
    * embedded as literals in the generated oracle.
    */
  private val cdcPow: Array[Long] = {
    var p = 1L
    Array.fill(CdcWindow) { val r = p; p = p * 31 % CdcP; r }
  }

  /** Content-defined chunking dedup (the Rabin/FastCDC family — LBFS,
    * Muthitacharoen et al. SOSP'01): chunk boundaries are placed where
    * a ROLLING window hash ≡ 0 mod [[CdcMask]], so an insertion early
    * in a document shifts only the chunks it touches — the property
    * that makes CDC the storage/transfer dedup standard (fixed-width
    * chunking re-fingerprints everything downstream of an edit). Each
    * chunk is fingerprinted with the [[TextOps.docFingerprint]]
    * recurrence; corpus-level copy counts then classify every chunk,
    * and the query emits the per-document census a storage-dedup stage
    * acts on: chunk count, duplicated-chunk count, duplicated chars.
    *
    * Cross-engine exactness: the window hash is Σ c_{i−j}·31^j mod p
    * re-evaluated per position (w = 8 multiplies — the identical
    * closed form the oracle computes; no incremental-update drift),
    * all in BIGINT. Scale shape: the chunker is a NARROW per-doc
    * kernel (payload never shuffles); only (fp, len) chunk metadata
    * shuffles — one fp-keyed count + one doc-keyed rollup.
    */
  def cdcChunks(s: SparkSession, dir: String): DataFrame =
    cdcCensus(cdcChunkRows(
      Tables.documents(s, dir).select(col("doc_id"), col("text"))))

  /** The narrow chunking kernel: a `(doc_id, text)` frame → one row per
    * chunk `(doc_id, fp, len)` — shared by the batch query and
    * `stream_cdc_chunks` (which runs it per micro-batch at ingest).
    */
  private[graft] def cdcChunkRows(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val pw = cdcPow
    val win = CdcWindow
    val mask = CdcMask
    val p = CdcP
    val chunker = udf { (text: String) =>
      val cs = text.codePoints().toArray
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      var start = 0
      var i = 0
      while (i < cs.length) {
        val boundary = i >= win - 1 && {
          var h = 0L
          var j = 0
          while (j < win) { h = (h + cs(i - j).toLong * pw(j)) % p; j += 1 }
          h % mask == 0
        }
        if (boundary || i == cs.length - 1) {
          var h = 0L
          var k = start
          while (k <= i) { h = (h * 31 + cs(k)) % p; k += 1 }
          out += ((h, i - start + 1))
          start = i + 1
        }
        i += 1
      }
      out
    }
    docs
      .where(length($"text") > 0)
      .select($"doc_id", explode(chunker($"text")).as("c"))
      .select($"doc_id", $"c._1".as("fp"), $"c._2".as("len"))
  }

  /** Census finalize over a chunk-metadata frame `(doc_id, fp, len)` —
    * shared verbatim by the batch query and the streaming ingest form.
    */
  private[graft] def cdcCensus(chunkRows: DataFrame): DataFrame = {
    val s = chunkRows.sparkSession
    import s.implicits._
    val chunks = chunkRows.localCheckpoint()
    val copies = chunks.groupBy($"fp").agg(count(lit(1)).as("n_copies"))
    chunks.join(copies, "fp")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"n_copies" > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when($"n_copies" > 1, $"len".cast("long")).otherwise(0L))
          .as("dup_chars"))
  }

  /** DuckDB restatement: boundary positions by the identical window
    * sum (powers embedded as literals), chunk spans from the boundary
    * list, the same per-chunk fold, same census.
    */
  val cdcChunksSql: String = {
    val winSum = (0 until CdcWindow)
      .map(j => s"CAST(ascii(substring(text, i - $j, 1)) AS BIGINT) * ${cdcPow(j)}")
      .mkString(" + ")
    s"""WITH bs AS (
       |  SELECT doc_id, text,
       |    list_sort(list_distinct(list_append(
       |      list_filter(range($CdcWindow, strlen(text) + 1),
       |        i -> ($winSum) % $CdcP % $CdcMask = 0),
       |      CAST(strlen(text) AS BIGINT)))) AS ends
       |  FROM documents WHERE strlen(text) > 0),
       |chunks AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(st, en + 1),
       |        i -> CAST(ascii(substring(text, CAST(i AS INT), 1)) AS BIGINT))),
       |      (h, c) -> (h * 31 + c) % $CdcP) AS fp,
       |    en - st + 1 AS len
       |  FROM (
       |    SELECT doc_id, text,
       |      CASE WHEN k = 1 THEN 1 ELSE ends[k - 1] + 1 END AS st,
       |      ends[k] AS en
       |    FROM bs, LATERAL (SELECT unnest(range(1, len(ends) + 1)) AS k) ks)),
       |copies AS (SELECT fp, count(*) AS n_copies FROM chunks GROUP BY fp)
       |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN p.n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_chunks,
       |  CAST(sum(CASE WHEN p.n_copies > 1 THEN c.len ELSE 0 END) AS BIGINT)
       |    AS dup_chars
       |FROM chunks c JOIN copies p ON p.fp = c.fp
       |GROUP BY c.doc_id""".stripMargin
  }

  // ------------------------------------------- exact-substring dedup

  /** Gram width for [[exactSubstrSpans]] — also the minimum reportable
    * span length in tokens (a shared span shorter than the gram never
    * produces a posting hit).
    */
  val ExactSubstrK = 8

  /** Posting-list occurrence cap per gram: a gram occurring more than
    * this many times corpus-wide is boilerplate (licence headers, menu
    * chrome — the hot suffix-array intervals real ExactSubstr stacks
    * also skip) and is dropped from the index, bounding the candidate
    * join's per-key fan-out at cut². Sizing: measured organic max
    * occurrence is 4 at sf0.1 (~40 on the 10× replica, whose doc-id
    * shift packs replicas onto identical text); 256 clears that with
    * ~6× headroom. On a real corpus the knob is set off the measured
    * occurrence histogram — one map-side-combinable aggregate. The
    * mirror constant appears verbatim in the oracle.
    */
  val ExactSubstrOccCut = 256

  /** Cross-document EXACT-SUBSTRING dedup — the ExactSubstr family of
    * production LLM dedup stacks (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better"): report every maximal
    * verbatim token span of ≥ [[ExactSubstrK]] tokens shared between
    * two documents, with exact start positions in both.
    *
    * The reference stacks build a corpus suffix array; the
    * Spark-native formulation is a hashed k-gram posting join + a
    * per-diagonal island merge, all defined-partition relational ops:
    *
    *   1. one (doc_id, pos, gram-hash) row per token position — grams
    *      are hashed row-locally to md5-60 (the kit's convention), so
    *      only 3-longs-wide rows ever shuffle, never token text;
    *   2. grams kept iff shared (df ≥ 2) and below the
    *      [[ExactSubstrOccCut]] boilerplate cut;
    *   3. posting equi-join on the hash (work is Σ_gram occ², never
    *      |docs|²) → matching coordinates (doc_a, doc_b, pa, pb);
    *   4. per (pair, diagonal pa−pb) gaps-and-islands merge — runs of
    *      CONSECUTIVE positions on one diagonal are exactly the
    *      maximal shared spans (a run of m consecutive matching
    *      k-grams ⇔ a verbatim span of m+k−1 tokens); the window is
    *      partitioned by (doc_a, doc_b, diag), never global.
    *
    * Output: (doc_a, doc_b, start_a, start_b, span_tokens), positions
    * 1-based in the whitespace token stream, spans maximal over the
    * cut-surviving grams. md5-60 collisions could in principle weld
    * two unequal grams (probability ~2⁻⁶⁰ per pair); a production
    * deployment appends a verify pass re-reading the two spans — the
    * oracle runs the identical hash so the compare is exact either
    * way.
    */
  def exactSubstr(s: SparkSession, dir: String): DataFrame =
    exactSubstrFor(s, dir)

  /** The span table memoized per (session, corpus fingerprint) — the
    * posting join + island merge is shared by `dedup_exact_substr` and
    * `dedup_substr_savings` (the [[sharedPairs]] rationale).
    */
  private val substrCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private def exactSubstrFor(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cached(substrCache, s,
      Similarity.dataKey(dir, "documents"), "dedup_substr_spans") {
      exactSubstrSpans(s, Tables.documents(s, dir)).localCheckpoint()
    }

  /** Core of [[exactSubstr]] over any (doc_id, text) frame — the seam
    * the planted-span specs drive.
    */
  private[graft] def exactSubstrSpans(
      s: SparkSession, docs: DataFrame): DataFrame =
    spansFromOcc(s, exactSubstrOcc(s, docs))

  /** The (doc_id, pos, gram-hash) posting rows — stateless row-local
    * expressions only, so the STREAMING arrival path can run the same
    * code per micro-batch (`stream_exact_substr` accumulates exactly
    * these rows as its cross-trigger state).
    */
  private[graft] def exactSubstrOcc(
      s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val k = ExactSubstrK
    graft.Tables.spread(docs, "doc_id")
      .selectExpr("doc_id",
        "filter(split(lower(text), '\\\\s+'), t -> t <> '') AS toks")
      .where(s"size(toks) >= $k")
      .selectExpr("doc_id",
        s"""posexplode(transform(sequence(1, size(toks) - ${k - 1}),
           |  i -> conv(substring(md5(concat_ws(' ', slice(toks, i, $k))),
           |    1, 15), 16, 10))) AS (pos0, gh)""".stripMargin)
      .select($"doc_id", ($"pos0" + 1).cast("long").as("pos"),
        $"gh".cast("long").as("gh"))
  }

  /** Posting join + island merge over (doc_id, pos, gh) rows — the
    * batch finalize, shared with the streaming drain.
    */
  private[graft] def spansFromOcc(
      s: SparkSession, occ: DataFrame,
      cut: Long = ExactSubstrOccCut): DataFrame = {
    import s.implicits._
    val stats = occ.groupBy($"gh")
      .agg(count(lit(1)).as("occn"), countDistinct($"doc_id").as("df"))
      .where($"df" >= 2 && $"occn" <= cut)
      .select($"gh")
    val idx = occ.join(stats, "gh")
    val hits = idx.select($"gh", $"doc_id".as("doc_a"), $"pos".as("pa"))
      .join(idx.select($"gh", $"doc_id".as("doc_b"), $"pos".as("pb")), "gh")
      .where($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b", $"pa", $"pb")
    spansFromHits(s, hits)
  }

  /** Island merge over matching-coordinate rows (doc_a, doc_b, pa, pb)
    * — the span-forming tail of [[spansFromOcc]], factored so the
    * INCREMENTAL streaming trigger ([[substrTriggerDelta]]) can close
    * its per-trigger hit delta through the identical code. The window
    * is partitioned by (pair, diagonal), never global. Hit rows are
    * unique per (pair, pa) by construction (one gram per position), so
    * the consecutive-run count is exact.
    */
  private[graft] def spansFromHits(
      s: SparkSession, hits0: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val k = ExactSubstrK
    val hits = hits0.withColumn("diag", $"pa" - $"pb")
    val w = Window.partitionBy($"doc_a", $"doc_b", $"diag").orderBy($"pa")
    hits.withColumn("isl", $"pa" - row_number().over(w))
      .groupBy($"doc_a", $"doc_b", $"diag", $"isl")
      .agg(min($"pa").as("start_a"), min($"pb").as("start_b"),
        (count(lit(1)) + lit(k - 1).cast("long")).as("span_tokens"))
      .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens")
  }

  /** ONE incremental ExactSubstr trigger — the per-arrival delta that
    * lets `stream_exact_substr` / `stream_substr_savings` close each
    * micro-batch with work proportional to the batch's arrivals (plus
    * a rare, bounded repair term) instead of re-running the full
    * posting join over all accumulated state (the round-10 verdict's
    * remaining item-4 family member after `stream_ppjoin` and
    * `stream_weighted_jaccard`).
    *
    * Inputs: the accumulated posting rows `oldOcc` (every prior
    * trigger's (doc_id, pos, gh)), this trigger's `newOcc`. Documents
    * are trigger-complete (a doc's postings land wholly in one batch),
    * which makes per-gram df ADDITIVE across the old/new split and is
    * what the whole delta argument rests on.
    *
    * Why the delta is exactly sufficient — eligibility (df ≥ 2 ∧
    * occn ≤ cut) can change per gram in only two monotone ways:
    *
    *   - GAINED (df 1→2+): the 2nd distinct doc arrives — every new
    *     hit via a gained gram involves this trigger's docs, so it is
    *     covered by the new-side probe;
    *   - LOST (occn crosses the cut upward; df never decreases): hits
    *     between two OLD docs via that gram silently vanish from the
    *     batch answer — the only way an old pair's span set can
    *     change. Those pairs are enumerable from the old postings of
    *     the crossing grams (≤ cut² pairs per gram, and a gram crosses
    *     at most ONCE ever, so total repair work over the stream's
    *     lifetime is bounded by the boilerplate mass, not the stream
    *     length).
    *
    * The trigger therefore emits (a) spans for every pair involving a
    * new doc — new-side postings probed against the full eligible
    * index, both-new duplicates collapsed by the orientation
    * normalization + distinct (hit rows are unique per (pair, pa, pb),
    * so distinct is exact); and (b) a FULL recompute of the dirty old
    * pairs over the current eligible index. The returned `touched`
    * pair list includes dirty pairs whose recompute came back EMPTY —
    * the caller's latest-touch-wins ledger turns those into
    * tombstones, which a spans-only log could not express.
    *
    * Per-trigger cost shape: one map-side-combinable stats aggregate
    * over the ARRIVALS plus the accumulated-stats read (see below), and
    * join work ∝ arrivals' posting mass × gram occurrence (bounded by
    * the cut) + the one-shot crossing repair.
    *
    * ACCRETED STATS (the production form): per-gram (occ, df) is
    * exactly maintainable as a running sum because docs are
    * trigger-complete — a doc's postings land wholly in one batch, so
    * this batch's `countDistinct(doc_id)` per gram counts docs no prior
    * batch has counted, making df (and trivially occ) ADDITIVE across
    * batches. The function therefore RETURNS this trigger's per-gram
    * stats delta as its third element; a caller that logs those deltas
    * can hand the summed accumulation back via `oldStats0` and the old
    * posting log is never re-aggregated — the stats read shrinks from
    * O(accumulated postings) rows to O(accumulated distinct grams)
    * pre-aggregated rows. When `oldStats0` is absent the old side is
    * aggregated directly (the batch/spec path); both paths compute the
    * same (o_occ, o_df) by the additivity argument, which
    * `ExactSubstrStreamSpec` pins on the forced-crossing fixture where
    * stats alone decide eligibility and the repair.
    */
  private[graft] def substrTriggerDelta(
      s: SparkSession, oldOcc0: DataFrame, newOcc0: DataFrame,
      cut: Long = ExactSubstrOccCut,
      oldStats0: Option[DataFrame] = None,
      fullOld0: Option[(DataFrame, DataFrame)] = None): (DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    val oldOcc = oldOcc0.select($"doc_id", $"pos", $"gh")
    val newOcc = newOcc0.select($"doc_id", $"pos", $"gh")
    // per-gram stats: accreted (occ, df) sums when the caller keeps a
    // stats log, else one direct scan of the old side; df additive
    // across the split because docs are trigger-complete
    val oldStats = oldStats0.map(_.select($"gh", $"o_occ", $"o_df"))
      .getOrElse(oldOcc.groupBy($"gh")
        .agg(count(lit(1)).as("o_occ"), countDistinct($"doc_id").as("o_df")))
    val newStats = newOcc.groupBy($"gh")
      .agg(count(lit(1)).as("n_occ"), countDistinct($"doc_id").as("n_df"))
    // Restricted to THIS batch's grams (round 12: left join, was
    // full_outer): every per-trigger decision concerns only grams the
    // arrivals touch — a new doc's postings carry only new-batch grams,
    // and a gram can cross the cut only when n_occ ≥ 1 — so old-only
    // grams never contribute to the new-side probe or the crossing
    // test. This is what lets the caller hand in BUCKET-PRUNED old
    // views (oldOcc0/oldStats0 restricted to the arrivals' gram-hash
    // buckets); the one consumer that genuinely needs ALL grams — the
    // dirty-pair recompute — rebuilds full eligibility from `fullOld0`
    // inside the (rare, bounded) repair branch below.
    val stats = newStats.join(oldStats, Seq("gh"), "left_outer")
      .select($"gh",
        coalesce($"o_occ", lit(0L)).as("o_occ"),
        coalesce($"o_df", lit(0L)).as("o_df"),
        (coalesce($"o_occ", lit(0L)) + $"n_occ").as("t_occ"),
        (coalesce($"o_df", lit(0L)) + $"n_df").as("t_df"))
      .localCheckpoint() // small (one row per new-batch gram); read 2–3× below
    val eligNew = stats.where($"t_df" >= 2 && $"t_occ" <= cut).select($"gh")
    // grams LEAVING eligibility this trigger: df is monotone, so the
    // only exit is the occurrence cut crossing upward
    val crossed = stats
      .where($"o_df" >= 2 && $"o_occ" <= cut && $"t_occ" > cut)
      .select($"gh")
    val newIds = newOcc.select($"doc_id").distinct()
    val all = oldOcc.unionByName(newOcc)
    val idxAll = all.join(eligNew, "gh")
    val idxNew = idxAll.join(newIds, Seq("doc_id"), "left_semi")
    val hitsNew = idxNew.select($"gh", $"doc_id".as("da"), $"pos".as("xa"))
      .join(idxAll.select($"gh", $"doc_id".as("db"), $"pos".as("xb")), "gh")
      .where($"da" =!= $"db")
      .select(least($"da", $"db").as("doc_a"),
        greatest($"da", $"db").as("doc_b"),
        when($"da" < $"db", $"xa").otherwise($"xb").as("pa"),
        when($"da" < $"db", $"xb").otherwise($"xa").as("pb"))
      .distinct()
    // the repair branch only exists on triggers where a gram actually
    // crossed (rare by construction — each gram crosses once ever);
    // the count is a filter over the checkpointed stats, and skipping
    // the branch saves two accumulated-log scans on every other trigger
    val anyCrossed = crossed.limit(1).count() > 0
    val (hits, dirtyOld) =
      if (!anyCrossed) (hitsNew, hitsNew.limit(0).select($"doc_a", $"doc_b"))
      else {
        // old-old pairs that HAD hits via a crossing gram (enumerated
        // from the old postings of exactly those grams — ≤ cut² each;
        // crossed ⊆ new-batch grams, so the possibly-pruned oldOcc view
        // is sufficient here)
        val occCross = oldOcc.join(crossed, "gh")
        val dirty = occCross.select($"gh", $"doc_id".as("doc_a"))
          .join(occCross.select($"gh", $"doc_id".as("doc_b")), "gh")
          .where($"doc_a" < $"doc_b")
          .select($"doc_a", $"doc_b").distinct()
          .localCheckpoint() // tiny; read 3× below
        val dirtyDocs = dirty.select($"doc_a".as("doc_id"))
          .unionByName(dirty.select($"doc_b".as("doc_id"))).distinct()
        // FULL index + FULL eligibility for the dirty-pair recompute: a
        // dirty pair's span set must be rebuilt over every currently-
        // eligible gram the two docs share, including grams absent from
        // this batch — the one place a bucket-pruned view is not
        // sufficient. Lazy frames: a non-crossing trigger never reads
        // them. Default = the caller's own (unpruned) old views, which
        // keeps the direct-call/spec path byte-identical.
        val (fullOldOcc0, fullOldStats0) = fullOld0.getOrElse((oldOcc, oldStats))
        val fullOldOcc = fullOldOcc0.select($"doc_id", $"pos", $"gh")
        val fullOldStats = fullOldStats0.select($"gh", $"o_occ", $"o_df")
        val eligAll = fullOldStats.join(newStats, Seq("gh"), "full_outer")
          .where(coalesce($"o_df", lit(0L)) + coalesce($"n_df", lit(0L)) >= 2 &&
            coalesce($"o_occ", lit(0L)) + coalesce($"n_occ", lit(0L)) <= cut)
          .select($"gh")
        val idxAllFull = fullOldOcc.unionByName(newOcc).join(eligAll, "gh")
        val idxDirty = idxAllFull.join(dirtyDocs, Seq("doc_id"), "left_semi")
        val hitsOld = idxDirty
          .select($"gh", $"doc_id".as("doc_a"), $"pos".as("pa"))
          .join(idxDirty.select($"gh", $"doc_id".as("doc_b"), $"pos".as("pb")),
            "gh")
          .where($"doc_a" < $"doc_b")
          .join(dirty, Seq("doc_a", "doc_b"), "left_semi")
          .select($"doc_a", $"doc_b", $"pa", $"pb")
        (hitsNew.unionByName(hitsOld), dirty)
      }
    // one materialization of the hit delta — both returned frames (the
    // span write and the touched-pair ledger write) derive from it
    val hitsCk = hits.localCheckpoint()
    val spans = spansFromHits(s, hitsCk)
    val touched = hitsCk.select($"doc_a", $"doc_b").distinct()
      .unionByName(dirtyOld).distinct()
    // this trigger's additive per-gram stats contribution — the caller's
    // stats log accretes these so the NEXT trigger's oldStats0 is a sum
    // over pre-aggregated gram rows, not a re-scan of all old postings
    val statsDelta = newStats
      .select($"gh", $"n_occ".as("occ_d"), $"n_df".as("df_d"))
    (touched, spans, statsDelta)
  }

  /** Shared oracle CTEs (no WITH prefix) ending in `spans` — single
    * source of truth for tokenization, gram width, the occurrence cut,
    * and the island merge across the span oracle AND the savings
    * oracle.
    */
  private def exactSubstrCtes: String =
    s"""toks AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS t
       |  FROM documents),
       |occ AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |    CAST(('0x' || substring(md5(list_reduce(list_transform(
       |      range(CAST(i AS INTEGER), CAST(i + $ExactSubstrK AS INTEGER)),
       |      j -> t[j]), (a, b) -> a || ' ' || b)), 1, 15)) AS BIGINT) AS gh
       |  FROM toks, LATERAL (
       |    SELECT unnest(range(1, len(t) - ${ExactSubstrK - 2})) AS i) p
       |  WHERE len(t) >= $ExactSubstrK),
       |stats AS (
       |  SELECT gh FROM occ GROUP BY gh
       |  HAVING count(DISTINCT doc_id) >= 2 AND count(*) <= $ExactSubstrOccCut),
       |hits AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
       |  FROM occ a JOIN occ b ON a.gh = b.gh AND a.doc_id < b.doc_id
       |  JOIN stats s ON s.gh = a.gh),
       |isl AS (
       |  SELECT *, pa - row_number() OVER (
       |    PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS g
       |  FROM hits),
       |spans AS (
       |  SELECT doc_a, doc_b, CAST(min(pa) AS BIGINT) AS start_a,
       |    CAST(min(pb) AS BIGINT) AS start_b,
       |    CAST(count(*) + ${ExactSubstrK - 1} AS BIGINT) AS span_tokens
       |  FROM isl GROUP BY doc_a, doc_b, pa - pb, g)""".stripMargin

  val exactSubstrSql: String =
    s"""WITH $exactSubstrCtes
       |SELECT doc_a, doc_b, start_a, start_b, span_tokens FROM spans""".stripMargin

  /** Net duplicate-token measurement over the [[exactSubstr]] span
    * table — the number every production ExactSubstr run reports
    * (Lee et al. strike ~3% of C4 this way): per source, how many
    * token positions sit inside at least one cross-document verbatim
    * span. A doc's spans overlap freely (one span per partner pair,
    * plus multiple diagonals), so the per-doc covered count is the
    * measure of the UNION of its intervals — a second gaps-and-islands
    * pass, this time over (start, end) intervals ordered by start with
    * a running max-end carry, all windows partitioned by doc_id.
    *
    * Output per source: doc counts, affected docs, total tokens,
    * covered (strikeable) tokens, and the duplication fraction as one
    * 6-dp ratio-of-integer-sums.
    */
  def substrSavings(s: SparkSession, dir: String): DataFrame =
    substrSavingsFromSpans(s, dir, exactSubstrFor(s, dir))

  /** The savings finalize over ANY span table (the memoized batch one
    * or a streaming drain's) — intervals both ways, per-doc union,
    * per-source ratio-of-sums against the statically-read corpus.
    */
  private[graft] def substrSavingsFromSpans(
      s: SparkSession, dir: String, spans: DataFrame): DataFrame = {
    import s.implicits._
    val iv = spans
      .selectExpr("doc_a AS doc_id", "start_a AS st",
        "start_a + span_tokens - 1 AS en")
      .unionAll(spans.selectExpr("doc_b AS doc_id", "start_b AS st",
        "start_b + span_tokens - 1 AS en"))
    val cov = intervalUnionLen(iv)
    val docs = Tables.documents(s, dir)
      .selectExpr("doc_id", "source",
        "size(filter(split(lower(text), '\\\\s+'), t -> t <> '')) AS n_toks")
    docs.join(cov, Seq("doc_id"), "left")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"covered".isNotNull, 1L).otherwise(0L)).as("n_docs_affected"),
        sum($"n_toks").as("total_tokens"),
        sum(coalesce($"covered", lit(0L))).as("dup_tokens"))
      .selectExpr("source",
        "CAST(n_docs AS BIGINT) AS n_docs",
        "CAST(n_docs_affected AS BIGINT) AS n_docs_affected",
        "CAST(total_tokens AS BIGINT) AS total_tokens",
        "CAST(dup_tokens AS BIGINT) AS dup_tokens",
        """floor(CAST(dup_tokens AS DOUBLE) / total_tokens * 1e6 + 0.5)
          | / 1e6 AS dup_frac""".stripMargin)
  }

  /** Eval-shard predicate for [[decontaminateSpans]] — a
    * scale-proportional 2% held-out split (the fixed 10-doc benchmark
    * set `dedup_decontaminate` audits is too small to organically
    * intersect the span table at every SF; a real decontamination run
    * audits against eval sets that grow with the benchmark suite).
    */
  val DecontamSpanMod = 50
  val DecontamSpanRes = 7

  /** Position-level contamination audit — [[decontaminate]] upgraded
    * from "this training doc shares ≥1 eval 5-gram" to "these EXACT
    * token ranges of this training doc appear verbatim in that eval
    * doc": the [[exactSubstr]] span table filtered to pairs with
    * exactly one side in the held-out shard, reoriented as
    * (train_doc, eval_doc, train_start, eval_start, span_tokens).
    * This is the artifact a contamination report actually ships —
    * the spans to strike or the rows to drop, with evidence — and it
    * rides the memoized span table, so the audit is a filter, not a
    * recompute.
    */
  def decontaminateSpans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = (c: org.apache.spark.sql.Column) =>
      pmod(c, lit(DecontamSpanMod.toLong)) === DecontamSpanRes.toLong
    exactSubstrFor(s, dir)
      .where(ev($"doc_a") =!= ev($"doc_b"))
      .selectExpr(
        s"CASE WHEN doc_a % $DecontamSpanMod = $DecontamSpanRes THEN doc_b ELSE doc_a END AS train_doc",
        s"CASE WHEN doc_a % $DecontamSpanMod = $DecontamSpanRes THEN doc_a ELSE doc_b END AS eval_doc",
        s"CASE WHEN doc_a % $DecontamSpanMod = $DecontamSpanRes THEN start_b ELSE start_a END AS train_start",
        s"CASE WHEN doc_a % $DecontamSpanMod = $DecontamSpanRes THEN start_a ELSE start_b END AS eval_start",
        "span_tokens")
  }

  val decontaminateSpansSql: String =
    s"""WITH $exactSubstrCtes
       |SELECT
       |  CASE WHEN doc_a % $DecontamSpanMod = $DecontamSpanRes THEN doc_b ELSE doc_a END AS train_doc,
       |  CASE WHEN doc_a % $DecontamSpanMod = $DecontamSpanRes THEN doc_a ELSE doc_b END AS eval_doc,
       |  CASE WHEN doc_a % $DecontamSpanMod = $DecontamSpanRes THEN start_b ELSE start_a END AS train_start,
       |  CASE WHEN doc_a % $DecontamSpanMod = $DecontamSpanRes THEN start_a ELSE start_b END AS eval_start,
       |  span_tokens
       |FROM spans
       |WHERE (doc_a % $DecontamSpanMod = $DecontamSpanRes)
       |  <> (doc_b % $DecontamSpanMod = $DecontamSpanRes)""".stripMargin

  /** Union-of-intervals length per doc over (doc_id, st, en) rows —
    * inclusive integer intervals, overlapping/nested/adjacent all
    * collapse: order by start, carry the running max end, a new island
    * starts where the next start clears every end seen so far. All
    * windows partition by doc_id.
    *
    * Intervals are DISTINCT'd first — load-bearing twice over. Union
    * is a set measure, so duplicates (rampant when replica families
    * share one span against many partners) are pure join-width; and
    * with duplicates present the (st, en) ORDER BY is not a total
    * order, so an engine free to order ties differently in the
    * max-end window and the running-sum window can hand the island
    * OPEN flag and the island id to DIFFERENT copies of a tied row,
    * double-counting that island (observed as dup_frac > 1 in DuckDB
    * at the 10× replica). After the distinct the order is total and
    * both windows agree on every engine. The seam the interval specs
    * drive.
    */
  private[graft] def intervalUnionLen(iv: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("st"), col("en"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("st"), col("en"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv.distinct()
      .withColumn("pm", max(col("en")).over(wPrev))
      .withColumn("nw",
        when(col("pm").isNull || col("st") > col("pm"), 1L).otherwise(0L))
      .withColumn("g", sum(col("nw")).over(wRun))
      .groupBy(col("doc_id"), col("g"))
      .agg((max(col("en")) - min(col("st")) + 1L).as("len"))
      .groupBy(col("doc_id")).agg(sum(col("len")).as("covered"))
  }

  val substrSavingsSql: String =
    s"""WITH $exactSubstrCtes,
       |iv AS (
       |  SELECT DISTINCT doc_id, st, en FROM (
       |    SELECT doc_a AS doc_id, start_a AS st,
       |      start_a + span_tokens - 1 AS en FROM spans
       |    UNION ALL
       |    SELECT doc_b, start_b, start_b + span_tokens - 1 FROM spans)),
       |mk AS (
       |  SELECT doc_id, st, en,
       |    max(en) OVER (PARTITION BY doc_id ORDER BY st, en
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       |  FROM iv),
       |grp AS (
       |  SELECT doc_id, st, en,
       |    sum(CASE WHEN pm IS NULL OR st > pm THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY st, en
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
       |  FROM mk),
       |cov AS (
       |  SELECT doc_id, sum(len) AS covered FROM (
       |    SELECT doc_id, g, max(en) - min(st) + 1 AS len
       |    FROM grp GROUP BY doc_id, g)
       |  GROUP BY doc_id),
       |dt AS (
       |  SELECT d.doc_id, d.source, len(t.t) AS n_toks
       |  FROM documents d JOIN toks t ON t.doc_id = d.doc_id)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN c.covered IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_docs_affected,
       |  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       |  CAST(sum(coalesce(c.covered, 0)) AS BIGINT) AS dup_tokens,
       |  floor(CAST(sum(coalesce(c.covered, 0)) AS DOUBLE)
       |    / sum(n_toks) * 1e6 + 0.5) / 1e6 AS dup_frac
       |FROM dt LEFT JOIN cov c ON c.doc_id = dt.doc_id
       |GROUP BY source""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact_substr" -> (exactSubstr _),
    "dedup_substr_savings" -> (substrSavings _),
    "dedup_decontaminate_spans" -> (decontaminateSpans _),
    "dedup_cdc_chunks" -> (cdcChunks _),
    "dedup_winnow" -> (winnowPairs _),
    "doc_boilerplate_ratio" -> (boilerplateRatio _),
    "curate_soft_dedup" -> (softDedupWeights _),
    "dedup_simhash_scurve" -> (simhashScurve _),
    "dedup_simhash_calibration" -> (simhashCalibration _),
    "dedup_minhash_calibration" -> (minhashCalibration _),
    "dedup_lsh_scurve" -> (lshScurve _),
    "dedup_eval_pr" -> (evalPr _),
    "dedup_containment" -> (containmentPairs _),
    "dedup_edit_distance" -> (editDistancePairs _),
    "dedup_canonical" -> (dedupCanonical _),
    "dedup_paragraph" -> (paragraphDedup _),
    "dedup_decontaminate" -> (decontaminate _),
    "dedup_source_overlap" -> (sourceOverlap _),
    "doc_repetition_ratio" -> (repetitionRatio _),
    "dedup_clusters" -> (dedupClusters _),
    "dedup_exact" -> (exactDedup _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_weighted_jaccard" -> (weightedJaccard _),
    "dedup_wminhash_calibration" -> (wminhashCalibration _),
    "dedup_minhash_lsh" -> (minhashLsh _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_simhash" -> (simhashPairs _))

  /** Oracles for an EXPLICIT dir — the SimHash entry embeds the chunk
    * shape derived from THAT dir's corpus size (memo hit or
    * deterministic recompute), not whichever dir was touched last.
    */
  def oracles(dir: String): Map[String, String] = {
    val s = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException(
        "oracle generation needs an active SparkSession"))
    val (bits, nChunks) = simhashParams(s, dir)
    Map(
      "dedup_exact_substr" -> exactSubstrSql,
      "dedup_substr_savings" -> substrSavingsSql,
      "dedup_decontaminate_spans" -> decontaminateSpansSql,
      "dedup_cdc_chunks" -> cdcChunksSql,
      "dedup_winnow" -> winnowPairsSql,
      "doc_boilerplate_ratio" -> boilerplateRatioSql,
      "curate_soft_dedup" -> softDedupWeightsSql,
      "dedup_simhash_scurve" -> simhashScurveSql(bits, nChunks),
      "dedup_simhash_calibration" -> simhashCalibrationSql,
      "dedup_minhash_calibration" -> minhashCalibrationSql,
      "dedup_lsh_scurve" -> lshScurveSql,
      "dedup_eval_pr" -> evalPrSql,
      "dedup_containment" -> containmentSql,
      "dedup_edit_distance" -> editDistanceSql,
      "dedup_canonical" -> canonicalSql,
      "dedup_paragraph" -> paragraphDedupSql,
      "dedup_decontaminate" -> decontaminateSql,
      "dedup_source_overlap" -> sourceOverlapSql,
      "doc_repetition_ratio" -> repetitionRatioSql,
      "dedup_clusters" -> dedupClustersSql,
      "dedup_exact" -> exactDedupSql,
      "dedup_ngram_jaccard" -> ngramJaccardSql,
      "dedup_weighted_jaccard" -> weightedJaccardSql,
      "dedup_wminhash_calibration" -> wminhashCalibrationSql,
      "dedup_minhash_lsh" -> minhashLshSql,
      "dedup_incremental" -> dedupIncrementalSql,
      "dedup_simhash" -> simhashPairsSql(bits, nChunks))
  }
}
