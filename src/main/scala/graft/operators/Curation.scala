package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-curation operators — the sampling/packing/scoring passes a
  * training-data pipeline runs AFTER dedup and quality gating, over the
  * `documents` table. Everything is deterministic and restated in a
  * DuckDB oracle; randomness is hash-derived (md5 over a salted key),
  * never an RNG, so results are reproducible across engines, retries,
  * and partitionings — the property that makes sampled pipelines
  * auditable at 100 TB.
  *
  * Scale notes:
  *   - Sampling/binning/chunking are narrow maps or per-stratum windows
  *     (strata = lang/source, thousands of groups — never a global
  *     single-partition window).
  *   - Packing cumsums partition by source shard; a 100 TB corpus packs
  *     shard-local, which is exactly how production packers avoid a
  *     global order dependency.
  *   - The unigram model is a word-count join; AQE broadcasts the vocab
  *     while it fits and shuffles when corpus vocabulary outgrows it.
  */
object Curation {

  /** 60-bit md5 prefix as a Spark column — the same value
    * `graft.functions.Hashing.md5_60` computes on the JVM and the
    * oracle computes as CAST('0x' || substring(md5(x),1,15) AS BIGINT).
    */
  private def md560(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private val duckMd560 = (x: String) =>
    s"CAST(('0x' || substring(md5($x), 1, 15)) AS BIGINT)"

  // ------------------------------------------------- stratified sampling

  /** Deterministic stratified sampling: per-language keep rates (en is
    * over-represented in the corpus, so it is downsampled harder — the
    * standard re-balancing move). The keep decision is a salted hash of
    * doc_id mod 100: reproducible, independent of partitioning, and
    * restatable in SQL — no RNG, no sampleBy (whose seed semantics are
    * engine-private).
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rate = when($"lang" === "en", 20).otherwise(60)
    Tables.documents(s, dir)
      .withColumn("h",
        md560(concat(lit("strat:"), $"doc_id".cast("string"))) % 100)
      .where($"h" < rate)
      .select($"doc_id", $"lang", $"source", $"n_chars")
  }

  val stratifiedSampleSql: String =
    s"""SELECT doc_id, lang, source, n_chars
       |FROM documents
       |WHERE ${duckMd560("'strat:' || CAST(doc_id AS VARCHAR)")} % 100
       |      < (CASE WHEN lang = 'en' THEN 20 ELSE 60 END)""".stripMargin

  // ----------------------------------------------------- quality binning

  /** Decile bins per language by document length (the curriculum /
    * quality-mixture bucketing step). ntile over (n_chars, doc_id) —
    * the doc_id tiebreak makes the decile assignment total-order
    * deterministic in both engines.
    */
  def qualityBins(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"lang").orderBy($"n_chars", $"doc_id")
    Tables.documents(s, dir)
      .select($"doc_id", $"lang", $"n_chars",
        ntile(10).over(w).as("bin"))
  }

  val qualityBinsSql: String =
    """SELECT doc_id, lang, n_chars,
      |  ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS bin
      |FROM documents""".stripMargin

  // ------------------------------------------------ chunking with overlap

  val ChunkTokens = 64
  val ChunkStride = 48

  /** Sliding-window chunking: 64-token windows advancing by 48 (16-token
    * overlap carries context across boundaries). One narrow generator
    * per row; chunks are fingerprinted (md5-60 of the joined tokens), so
    * downstream chunk-level dedup needs no re-tokenization.
    */
  def chunkOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .selectExpr("doc_id",
        "filter(split(lower(text), '\\\\s+'), t -> t <> '') AS toks")
      .where(size($"toks") > 0)
      .selectExpr("doc_id", "size(toks) AS n_toks",
        s"""posexplode(transform(
           |  sequence(0, CAST((size(toks) - 1) / $ChunkStride AS INT)),
           |  i -> concat_ws(' ', slice(toks, i * $ChunkStride + 1, $ChunkTokens))))
           | AS (chunk_idx, chunk_text)""".stripMargin)
      .select($"doc_id", $"chunk_idx".cast("long").as("chunk_idx"),
        (least(lit(ChunkTokens),
          $"n_toks" - $"chunk_idx" * ChunkStride)).as("chunk_tokens"),
        md560($"chunk_text").as("chunk_fp"))
  }

  val chunkOverlapSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS t
       |  FROM documents),
       |mx AS (
       |  SELECT 1 + coalesce(max(len(t)), 0) // $ChunkStride AS m FROM toks),
       |chunks AS (
       |  SELECT doc_id, len(t) AS n_toks, i AS chunk_idx,
       |    array_to_string(t[(i * $ChunkStride + 1) : (i * $ChunkStride + $ChunkTokens)], ' ') AS chunk_text
       |  FROM toks
       |  CROSS JOIN (SELECT unnest(range(0, (SELECT m FROM mx))) AS i)
       |  WHERE len(t) > 0 AND i <= (len(t) - 1) // $ChunkStride)
       |SELECT doc_id, chunk_idx,
       |  least($ChunkTokens, n_toks - chunk_idx * $ChunkStride) AS chunk_tokens,
       |  ${duckMd560("chunk_text")} AS chunk_fp
       |FROM chunks""".stripMargin

  // ------------------------------------------------- sequence packing

  val PackBudget = 512L

  /** Concat-then-split packing stats per source shard: documents are
    * laid end-to-end in doc_id order within their source, and split into
    * fixed 512-token training sequences. Emits each document's start
    * offset and the first/last sequence it lands in — the bookkeeping a
    * sample-to-sequence mapper needs. The cumulative sum partitions by
    * source (shard-local packing), never a global single-partition
    * window.
    */
  def packStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .selectExpr("doc_id", "source",
        "size(filter(split(lower(text), '\\\\s+'), t -> t <> '')) AS n_toks")
      .withColumn("start_tok", coalesce(sum($"n_toks").over(w), lit(0L)))
      .where($"n_toks" > 0)
      .select($"doc_id", $"source", $"n_toks", $"start_tok",
        ($"start_tok" / PackBudget).cast("long").as("seq_first"),
        (($"start_tok" + $"n_toks" - 1) / PackBudget).cast("long").as("seq_last"))
  }

  val packStatsSql: String =
    s"""WITH counted AS (
       |  SELECT doc_id, source,
       |    len(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')) AS n_toks
       |  FROM documents),
       |offs AS (
       |  SELECT doc_id, source, n_toks,
       |    CAST(coalesce(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
       |  FROM counted)
       |SELECT doc_id, source, n_toks, start_tok,
       |  start_tok // $PackBudget AS seq_first,
       |  (start_tok + n_toks - 1) // $PackBudget AS seq_last
       |FROM offs WHERE n_toks > 0""".stripMargin

  // ------------------------------------------------- per-domain quota

  /** Per-source quota: keep each source's 10 longest documents — through
    * the custom bounded-heap TopKPerKey operator (second production use
    * beyond the orders query; the window formulation sorts every group
    * in full, the heap streams). The order key is the STRUCT
    * (n_chars, doc_id): lexicographic struct ordering is tie-free on any
    * id range — the round-2 arithmetic fold n_chars·10⁶ + doc_id
    * silently assumed doc_id < 10⁶ and would misrank beyond it.
    */
  def domainQuota(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .where($"n_chars".isNotNull)
      .select($"doc_id", $"source", $"n_chars",
        struct($"n_chars", $"doc_id").as("ord"))
    graft.plans.TopKPerKey.topKPerKey(docs, Seq("source"), "ord", 10)
      .select("doc_id", "source", "n_chars")
  }

  val domainQuotaSql: String =
    """SELECT doc_id, source, n_chars
      |FROM (SELECT doc_id, source, n_chars,
      |        row_number() OVER (PARTITION BY source
      |                           ORDER BY n_chars DESC, doc_id DESC) AS rn
      |      FROM documents
      |      WHERE n_chars IS NOT NULL)
      |WHERE rn <= 10""".stripMargin

  // ------------------------------------------------- mixture re-weighting

  /** Training-mixture weights per source: sqrt-scaled token mass,
    * renormalized — the standard "temper the head, boost the tail"
    * mixture rule (weight ∝ tokens^0.5 instead of raw token share, so a
    * dominant crawl source stops drowning small curated ones). Per-source
    * token counts are one word-count shuffle; the normalizer is a 1-row
    * broadcast. Per-source sqrt masses round to 6 dp and divide as
    * exact decimals so the weights match the oracle bit-for-bit, and a
    * reader can verify they sum to ≈ 1.
    */
  def mixWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bySource = Tables.documents(s, dir)
      .selectExpr("source",
        "size(filter(split(lower(text), '\\\\s+'), t -> t <> '')) AS n_toks")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens"))
      .withColumn("mass",
        round(sqrt($"n_tokens".cast("double")), 6).cast("decimal(18,6)"))
    val total = bySource.agg(sum($"mass").as("total_mass"))
    bySource.crossJoin(broadcast(total))
      .select($"source", $"n_docs", $"n_tokens",
        ($"mass".cast("double") / $"total_mass".cast("double")).as("weight"))
  }

  /** Coreset size selected by [[kcenterCoreset]]. */
  val KCenterK = 8

  /** Greedy k-center coreset over the embedding collection (Gonzalez
    * 1985, the 2-approximation): seed with the smallest vec_id, then
    * repeatedly take the point FARTHEST from everything selected so
    * far — the classic geometric diversity selection data-pruning
    * pipelines use to cover the embedding space with a fixed budget
    * (each pick's distance-to-selected IS the covering radius of the
    * preceding selection, so the emitted trace is the objective
    * curve). Ties break on vec_id; distances are exact index-order
    * squared-euclidean folds, so the argmax — and therefore the whole
    * selection — is engine-exact (raw doubles emitted).
    *
    * Scale shape: the min-distance state is ONE column maintained by
    * k−1 narrow re-projections (each new center's embedding is a
    * collected 65-double literal — the centroid-embedding pattern, one
    * 1-row collect per round, never a data gather), and each pick is a
    * global top-1 (TakeOrdered, not a sort). O(n·k·d) total work, flat
    * plans, no joins at all after the scan.
    */
  def kcenterCoreset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def sqDistExpr(c: Seq[Double]): String = {
      // D suffix: plain decimal literals parse as DECIMAL in Spark SQL
      val lit = c.map(x => s"${x}D").mkString("array(", ", ", ")")
      s"""aggregate(zip_with(embedding, $lit,
         |  (a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)),
         |  CAST(0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin
    }
    val v = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
    val seed = v.orderBy($"vec_id").limit(1)
      .as[(Long, Array[Float])].head()
    var picks = Seq((1, seed._1, 0.0))
    var mind = v.selectExpr("vec_id", "embedding",
      s"${sqDistExpr(seed._2.map(_.toDouble).toSeq)} AS mind")
    for (r <- 2 to KCenterK) {
      val (pid, pemb, pd) = mind
        .orderBy($"mind".desc, $"vec_id")
        .limit(1).as[(Long, Array[Float], Double)].head()
      picks :+= ((r, pid, pd))
      mind = mind.selectExpr("vec_id", "embedding",
        s"least(mind, ${sqDistExpr(pemb.map(_.toDouble).toSeq)}) AS mind")
    }
    picks.toDF("k_round", "vec_id", "radius_sq")
      .select($"k_round".cast("int").as("k_round"), $"vec_id", $"radius_sq")
  }

  /** DuckDB restatement: the k−1 rounds unrolled as MATERIALIZED
    * min-distance ladders; each center's embedding re-derived from the
    * table by the picked id (scalar subquery) rather than embedded —
    * CAST(float AS DOUBLE) is exact, so both forms are the same
    * doubles.
    */
  val kcenterCoresetSql: String = {
    def sqd(c: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |  list_transform(range(1, len(embedding) + 1),
         |    i -> (CAST(embedding[i] AS DOUBLE) - $c[i])
         |       * (CAST(embedding[i] AS DOUBLE) - $c[i]))),
         |  (a, b) -> a + b)""".stripMargin
    val rounds = (2 to KCenterK).map { r =>
      val prev = s"m${r - 1}"
      s"""p$r AS MATERIALIZED (
         |  SELECT vec_id, mind FROM $prev
         |  ORDER BY mind DESC, vec_id LIMIT 1),
         |ce$r AS (
         |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
         |  FROM embeddings WHERE vec_id = (SELECT vec_id FROM p$r)),
         |m$r AS MATERIALIZED (
         |  SELECT m.vec_id, m.embedding, least(m.mind, ${sqd("c.ce")}) AS mind
         |  FROM $prev m CROSS JOIN ce$r c)""".stripMargin
    }.mkString(",\n")
    val seedRow = "SELECT 1 AS k_round, (SELECT vec_id FROM c1) AS vec_id," +
      " CAST(0 AS DOUBLE) AS radius_sq"
    val outRows = (seedRow +: (2 to KCenterK).map(r =>
      s"SELECT $r, vec_id, mind FROM p$r")).mkString(" UNION ALL ")
    s"""WITH c1 AS (SELECT min(vec_id) AS vec_id FROM embeddings),
       |ce1 AS (
       |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
       |  FROM embeddings WHERE vec_id = (SELECT vec_id FROM c1)),
       |m1 AS MATERIALIZED (
       |  SELECT e.vec_id, e.embedding, ${sqd("c.ce")} AS mind
       |  FROM embeddings e CROSS JOIN ce1 c),
       |$rounds
       |SELECT CAST(k_round AS INT) AS k_round, vec_id, radius_sq
       |FROM ($outRows)""".stripMargin
  }

  /** Sampling temperature for [[temperatureMix]] — the mT5 default
    * range (Xue et al., NAACL'21 use α = 0.3; XLM-R uses 0.3 too).
    */
  val MixTau = 0.3

  /** Temperature-scaled LANGUAGE sampling — the multilingual mixing
    * rule (mT5/XLM-R): qᵢ ∝ pᵢ^τ over per-language token mass, τ < 1
    * flattening the head so low-resource languages are up-sampled.
    * [[mixWeights]] is the per-SOURCE τ = 0.5 special case (sqrt
    * mass); this is the general-τ per-language form, emitting the
    * per-language census plus raw share p, tempered share q, and the
    * up/down-sampling boost q/p a sampler applies.
    *
    * Cross-engine discipline: p is an exact double division of BIGINT
    * totals; pow(p, τ) is re-rounded through the floor(x·1e6+0.5)/1e6
    * idiom (the engines' pow may differ in the last ulp — same reason
    * the k-means means use it), then summed as DECIMAL(18,6)
    * (associative) before the final exact divisions, each re-rounded
    * by the same idiom. The two totals frames are the approved 1-row
    * broadcast crosses.
    */
  def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byLang = Tables.documents(s, dir)
      .selectExpr("lang",
        "size(filter(split(lower(text), '\\\\s+'), t -> t <> '')) AS n_toks")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens"))
    temperatureMixFromCounts(byLang)
  }

  /** Temperature finalize from a per-language census `(lang, n_docs,
    * n_tokens)` — shared VERBATIM by the batch query and
    * `stream_temperature_mix` (whose drained update-mode counters ARE
    * such a census).
    */
  private[graft] def temperatureMixFromCounts(byLang: DataFrame): DataFrame = {
    val s = byLang.sparkSession
    import s.implicits._
    val tot = byLang.agg(sum($"n_tokens").as("tot"))
    val scored = byLang.crossJoin(broadcast(tot))
      .withColumn("p", $"n_tokens".cast("double") / $"tot".cast("double"))
      .withColumn("r", expr(
        s"CAST(floor(pow(p, $MixTau) * 1e6 + 0.5) / 1e6 AS DECIMAL(18,6))"))
    val rtot = scored.agg(sum($"r").as("rtot"))
    scored.crossJoin(broadcast(rtot))
      .selectExpr("lang", "n_docs", "n_tokens",
        "floor(p * 1e6 + 0.5) / 1e6 AS p_raw",
        """floor(CAST(r AS DOUBLE) / CAST(rtot AS DOUBLE) * 1e6 + 0.5) / 1e6
          | AS p_temp""".stripMargin,
        """floor(CAST(r AS DOUBLE) / CAST(rtot AS DOUBLE) / p * 1e6 + 0.5)
          | / 1e6 AS boost""".stripMargin)
  }

  val temperatureMixSql: String =
    s"""WITH by_lang AS (
       |  SELECT lang, count(*) AS n_docs,
       |    CAST(sum(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      t -> t <> ''))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY lang),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM by_lang),
       |scored AS (
       |  SELECT lang, n_docs, n_tokens,
       |    CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS p,
       |    CAST(floor(pow(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE),
       |      $MixTau) * 1e6 + 0.5) / 1e6 AS DECIMAL(18,6)) AS r
       |  FROM by_lang CROSS JOIN tot),
       |rtot AS (SELECT sum(r) AS rtot FROM scored)
       |SELECT lang, n_docs, n_tokens,
       |  floor(p * 1e6 + 0.5) / 1e6 AS p_raw,
       |  floor(CAST(r AS DOUBLE) / CAST(rtot AS DOUBLE) * 1e6 + 0.5) / 1e6
       |    AS p_temp,
       |  floor(CAST(r AS DOUBLE) / CAST(rtot AS DOUBLE) / p * 1e6 + 0.5) / 1e6
       |    AS boost
       |FROM scored CROSS JOIN rtot""".stripMargin

  val mixWeightsSql: String =
    """WITH by_source AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      t -> t <> ''))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |massed AS (
      |  SELECT source, n_docs, n_tokens,
      |    CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(18,6)) AS mass
      |  FROM by_source),
      |total AS (SELECT sum(mass) AS total_mass FROM massed)
      |SELECT source, n_docs, n_tokens,
      |  CAST(mass AS DOUBLE) / CAST(total_mass AS DOUBLE) AS weight
      |FROM massed CROSS JOIN total""".stripMargin

  // --------------------------------------------- unigram surprisal score

  /** Unigram-LM surprisal per document: mean over tokens of
    * ln(N / count(word)) — the cheap corpus-statistics stand-in for
    * perplexity filtering. Token surprisals are rounded to 6 dp and
    * summed in DECIMAL (exact, associative — immune to double
    * summation-order drift across engines); only the final mean is cast
    * back to double. The vocabulary join is size-based (AQE): broadcast
    * while the vocab fits, shuffle when it doesn't.
    */
  def unigramSurprisal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .selectExpr("doc_id",
        "explode(filter(split(lower(text), '\\\\s+'), t -> t <> '')) AS word")
    val vocab = toks.groupBy($"word").agg(count(lit(1)).as("cnt"))
    // corpus size N as a 1-row aggregate OVER THE VOCAB (sum of counts),
    // cross-joined in — not a driver-side toks.count(), which would add
    // an extra action and a second full tokenization pass
    val n = vocab.agg(sum($"cnt").as("total"))
    toks.join(vocab, "word")
      .crossJoin(broadcast(n))
      .withColumn("surp",
        round(log($"total".cast("double") / $"cnt".cast("double")), 6)
          .cast("decimal(18,6)"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_toks"),
        (sum($"surp").cast("double") / count(lit(1))).as("mean_surprisal"))
  }

  val unigramSurprisalSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS word
      |  FROM documents),
      |vocab AS (SELECT word, count(*) AS cnt FROM toks GROUP BY word),
      |n AS (SELECT count(*) AS total FROM toks)
      |SELECT t.doc_id, count(*) AS n_toks,
      |  CAST(sum(CAST(round(ln(CAST(n.total AS DOUBLE) / CAST(v.cnt AS DOUBLE)), 6)
      |    AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mean_surprisal
      |FROM toks t JOIN vocab v ON t.word = v.word CROSS JOIN n
      |GROUP BY t.doc_id""".stripMargin

  // ------------------------------------------- DSIR importance weights

  /** Data Selection with Importance Resampling (DSIR, Xie et al.,
    * arXiv:2302.03169): score every document by the log-likelihood
    * ratio of two unigram language models — one fit on the TARGET
    * domain, one on the rest of the corpus — the published recipe for
    * "give me raw-web data that looks like my target domain". Documents
    * with high `dsir_logratio` are what importance resampling keeps.
    *
    * Target selection is data-derived (the corpus's most frequent
    * `source`, ties by name — no fixture-specific constant), restated
    * identically by the oracle. Both LMs are add-one-smoothed unigram
    * models over the shared whitespace tokenizer; the per-token
    * log-ratio is rounded to 6 dp and the per-document score is a
    * DECIMAL sum of those terms ([[unigramSurprisal]]'s convention —
    * exact, associative, immune to double summation-order drift).
    *
    * Scale shape: one token pass builds both LMs (a single groupBy with
    * conditional counts — the two models are columns, not separate
    * jobs), totals are a 1-row aggregate over the vocab, and scoring is
    * the token stream re-joined to the |vocab|-row weight table (AQE
    * broadcasts it while it fits). No driver state beyond the 1-row
    * target name.
    */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val toks = docs.selectExpr("doc_id", "source",
      "explode(filter(split(lower(text), '\\\\s+'), t -> t <> '')) AS word")
    val target = docs.groupBy($"source").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"source").limit(1)
      .select($"source".as("tgt"))
    val flagged = toks.crossJoin(broadcast(target))
      .withColumn("is_target", $"source" === $"tgt")
      .select($"doc_id", $"word", $"is_target")
    val counts = flagged.groupBy($"word")
      .agg(sum(when($"is_target", 1L).otherwise(0L)).as("ct"),
        sum(when($"is_target", 0L).otherwise(1L)).as("cs"))
    val tot = counts.agg(sum($"ct").as("nt"), sum($"cs").as("ns"),
      count(lit(1)).as("v"))
    val termW = counts.crossJoin(broadcast(tot))
      .select($"word", round(
        log(($"ct" + 1).cast("double") / ($"nt" + $"v").cast("double")) -
          log(($"cs" + 1).cast("double") / ($"ns" + $"v").cast("double")), 6)
        .cast("decimal(18,6)").as("tw"))
    flagged.join(termW, "word")
      .groupBy($"doc_id", $"is_target")
      .agg(count(lit(1)).as("n_toks"),
        sum($"tw").cast("double").as("dsir_logratio"))
      .select($"doc_id", $"is_target", $"n_toks", $"dsir_logratio")
  }

  /** DSIR weights restated as a CTE chain (shared verbatim by
    * [[dsirWeightsSql]] and the selection oracle [[dsirSelectSql]]).
    */
  private val dsirCtes: String =
    """toks AS (
      |  SELECT doc_id, source,
      |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS word
      |  FROM documents),
      |tgt AS (
      |  SELECT source AS tgt FROM documents
      |  GROUP BY source ORDER BY count(*) DESC, source LIMIT 1),
      |flagged AS (
      |  SELECT t.doc_id, t.word, (t.source = tgt.tgt) AS is_target
      |  FROM toks t CROSS JOIN tgt),
      |counts AS (
      |  SELECT word,
      |    sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
      |    sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS cs
      |  FROM flagged GROUP BY word),
      |tot AS (SELECT sum(ct) AS nt, sum(cs) AS ns, count(*) AS v FROM counts),
      |termw AS (
      |  SELECT word,
      |    CAST(round(ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + v AS DOUBLE))
      |             - ln(CAST(cs + 1 AS DOUBLE) / CAST(ns + v AS DOUBLE)), 6)
      |      AS DECIMAL(18,6)) AS tw
      |  FROM counts CROSS JOIN tot),
      |dsirw AS (
      |  SELECT f.doc_id, f.is_target, count(*) AS n_toks,
      |    CAST(sum(t.tw) AS DOUBLE) AS dsir_logratio
      |  FROM flagged f JOIN termw t ON f.word = t.word
      |  GROUP BY f.doc_id, f.is_target)""".stripMargin

  val dsirWeightsSql: String =
    s"""WITH $dsirCtes
       |SELECT doc_id, is_target, n_toks, dsir_logratio FROM dsirw""".stripMargin

  /** Documents the resampling step keeps. */
  val DsirK = 150

  /** DSIR SELECTION — the importance-resampling step the weights exist
    * for (DSIR, arXiv:2302.03169 §2: sample k raw-pool documents
    * without replacement with probability ∝ exp(logratio)). Implemented
    * as Gumbel-top-k, the distributed-systems form of that sampler:
    * each NON-target document (the raw pool; target-domain docs are the
    * exemplar, not candidates) draws u ∈ (0,1) deterministically from
    * its salted md5-60 hash ([[aesSample]]'s 53-bit-mantissa idiom),
    * perturbs its score with the Gumbel quantile g = −ln(−ln u), and
    * the k largest (logratio + g) win — exactly k distinct docs,
    * reproducible under retry/speculation, and equal in distribution to
    * sequential weighted sampling without replacement.
    *
    * Plan: the weights computation's one token pass + vocab join, then
    * a NARROW key map and one TakeOrderedAndProject(k) — no extra
    * shuffle; at 100 TB the selection adds nothing to the weighting
    * cost. Both engines evaluate the identical IEEE expression for the
    * key, so the un-rounded ORDER is identical (ties broken by doc_id);
    * only the emitted key column is rounded (6 dp).
    */
  def dsirSelect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    dsirWeights(s, dir)
      .where(!$"is_target")
      .withColumn("h",
        conv(substring(md5(concat(lit("dsir:"), $"doc_id".cast("string"))),
          1, 15), 16, 10).cast("long"))
      .withColumn("u",
        (($"h" % 9007199254740992L) + 1.0) / 9007199254740993.0)
      .withColumn("sel_key", $"dsir_logratio" + (-log(-log($"u"))))
      .orderBy($"sel_key".desc, $"doc_id")
      .limit(DsirK)
      .select($"doc_id", $"n_toks", $"dsir_logratio",
        round($"sel_key", 6).as("sel_key"))
  }

  val dsirSelectSql: String =
    s"""WITH $dsirCtes,
       |keyed AS (
       |  SELECT doc_id, n_toks, dsir_logratio,
       |    dsir_logratio + (-ln(-ln(
       |      ((CAST(('0x' || substring(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 15))
       |        AS BIGINT) % 9007199254740992) + 1.0) / 9007199254740993.0)))
       |      AS sel_key
       |  FROM dsirw WHERE NOT is_target)
       |SELECT doc_id, n_toks, dsir_logratio, round(sel_key, 6) AS sel_key
       |FROM keyed ORDER BY sel_key DESC, doc_id LIMIT $DsirK""".stripMargin

  /** End-to-end curation pipeline as ONE query — the composition proof:
    * quality gate (score ≥ 0.5) → exact dedup among survivors (first
    * doc_id per normalized text) → per-source retention report (docs
    * in, docs kept, surviving token mass). Each stage is an operator
    * verified on its own elsewhere in the registry; this entry pins
    * that they COMPOSE — same plan discipline (narrow maps, one
    * dedup-key shuffle, one source aggregate), same exact oracle
    * through the whole chain. This is the query a user of the engine
    * actually runs nightly.
    */
  def curateE2e(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val q = TextOps.docQuality(s, dir).select($"doc_id", $"quality_score")
    val docs = Tables.documents(s, dir).join(q, "doc_id")
    val gated = docs.where($"quality_score" >= 0.5)
    val kept = gated
      .withColumn("norm", trim(regexp_replace(lower($"text"), "\\s+", " ")))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"norm").orderBy($"doc_id")))
      .where($"rn" === 1)
    kept.selectExpr("source", s"size(${TextOps.tokensExpr}) AS n_toks")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_kept"), sum($"n_toks").as("sum_toks"))
      .join(docs.groupBy($"source").agg(count(lit(1)).as("n_in")), "source")
      .select($"source", $"n_in", $"n_kept", $"sum_toks")
  }

  val curateE2eSql: String =
    s"""WITH q AS (${TextOps.docQualitySql}),
       |docs AS (
       |  SELECT d.*, q.quality_score FROM documents d
       |  JOIN q ON d.doc_id = q.doc_id),
       |gated AS (SELECT * FROM docs WHERE quality_score >= 0.5),
       |kept AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
       |      ORDER BY doc_id) AS rn
       |    FROM gated)
       |  WHERE rn = 1),
       |per_kept AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       |    CAST(sum(len(${TextOps.duckTokensExpr})) AS BIGINT) AS sum_toks
       |  FROM kept GROUP BY source),
       |per_in AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_in
       |  FROM docs GROUP BY source)
       |SELECT source, n_in, n_kept, sum_toks
       |FROM per_kept JOIN per_in USING (source)""".stripMargin

  /** The FULL pretraining-corpus build as ONE composed plan — the chain a
    * production run executes nightly, with every stage an operator already
    * verified on its own elsewhere in the registry:
    *
    *   quality gate (score ≥ 0.5, [[TextOps.docQuality]] formula)
    *   → exact dedup (first doc_id per normalized text, [[curateE2e]])
    *   → near-dup canonical dedup (best-quality member per MinHash/Jaccard
    *     cluster, [[Dedup.dedupCanonical]] rule, labels from the MEMOIZED
    *     [[Dedup.dedupClusters]] table — zero re-computation, zero scans)
    *   → decontamination (drop training docs sharing any word-5-gram with
    *     the doc_id < 10 benchmark set, [[Dedup.decontaminate]] rule)
    *   → chunk (64-token windows, 48 stride — [[chunkOverlap]] geometry)
    *   → pack (512-token sequences per source — [[packStats]] budget).
    *
    * Output is the per-source decision log: how many documents entered,
    * survived each gate, and how many chunks/tokens/training sequences the
    * survivors yield. Stage survival is computed as FLAGS over one scanned
    * frame (window partitions include the previous stage's flag, so each
    * window ranks only among survivors) rather than as chained filters —
    * that is what keeps the whole chain ONE plan with no join back to a
    * re-scanned `documents` per stage.
    *
    * Plan shape (pinned by CompositionSpec): exactly THREE `documents`
    * file scans — the main flag chain, the training-side 5-gram explode
    * (which must re-derive the canonical-survivor set: Spark subtrees
    * referenced twice re-execute unless materialized), and the tiny
    * benchmark-gram side. The expensive stage — near-dup label
    * propagation — contributes NO scan: it arrives as the checkpointed
    * memo table. At 100 TB the production move is to materialize the
    * flagged frame once before the gram stage (the memoization pattern
    * [[Dedup.dedupClusters]] already exhibits); kept lazy here so the
    * registered query stays a pure one-plan composition.
    *
    * Everything is integer arithmetic past the quality gate, so the
    * oracle restates the entire chain exactly (the cluster labels via the
    * same recursive-reachability CTE the dedup oracles use).
    */
  def fullPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val clusters = Dedup.dedupClusters(s, dir) // memoized (doc_id, cluster_id)
    val base = Tables.documents(s, dir)
      .selectExpr("doc_id", "source", "text", s"${TextOps.tokensExpr} AS toks")
      .selectExpr("doc_id", "source", "text", "toks", "size(toks) AS n_toks",
        """CAST(size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
          | / size(toks) AS stop_ratio""".stripMargin,
        """CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '')) AS DOUBLE)
          | / length(text) AS punct_ratio""".stripMargin,
        "CAST(least(length(text), 500) AS DOUBLE) / 500 AS len_norm")
      .withColumn("norm", trim(regexp_replace(lower($"text"), "\\s+", " ")))
      .selectExpr("doc_id", "source", "toks", "n_toks", "norm",
        "0.4 * stop_ratio + 0.3 * (1 - punct_ratio) + 0.3 * len_norm AS quality_score")
      .withColumn("q_keep", $"quality_score" >= 0.5)
    // exact dedup among quality survivors: q_keep in the partition key
    // restricts the rank to survivor rows without a filter+join-back
    val wExact = Window.partitionBy($"norm", $"q_keep").orderBy($"doc_id")
    val wCanon = Window.partitionBy($"cluster_id", $"exact_keep")
      .orderBy($"quality_score".desc, $"doc_id".asc)
    val flagged = base
      .withColumn("exact_keep", $"q_keep" && row_number().over(wExact) === 1)
      .join(clusters, Seq("doc_id"))
      .withColumn("canon_keep", $"exact_keep" && row_number().over(wCanon) === 1)
    def grams5(df: DataFrame): DataFrame = df
      .where("size(toks) >= 5")
      .selectExpr("doc_id",
        """explode(array_distinct(transform(
          |  sequence(1, size(toks) - 4),
          |  i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1], toks[i+2], toks[i+3]))))
          | AS gram""".stripMargin)
    val bench = grams5(base.where($"doc_id" < 10)).select($"gram").distinct()
    val contam = grams5(flagged.where($"canon_keep" && $"doc_id" >= 10))
      .join(broadcast(bench), "gram")
      .select($"doc_id").distinct()
    val chunked = flagged
      .join(contam.withColumn("contam", lit(true)), Seq("doc_id"), "left")
      .withColumn("clean_keep",
        $"canon_keep" && $"doc_id" >= 10 && $"contam".isNull)
      .withColumn("n_chunks", expr(
        s"""CASE WHEN clean_keep AND n_toks > 0
           |  THEN (n_toks - 1) div $ChunkStride + 1 ELSE CAST(0 AS BIGINT) END""".stripMargin))
      .withColumn("chunk_toks", expr(
        s"""CASE WHEN clean_keep AND n_toks > 0
           |  THEN aggregate(
           |    sequence(0, CAST((n_toks - 1) div $ChunkStride AS INT)),
           |    CAST(0 AS BIGINT),
           |    (acc, i) -> acc + least($ChunkTokens, n_toks - i * $ChunkStride))
           |  ELSE CAST(0 AS BIGINT) END""".stripMargin))
    chunked.groupBy($"source").agg(
        count(lit(1)).as("n_in"),
        sum(when($"q_keep", 1L).otherwise(0L)).as("n_quality"),
        sum(when($"exact_keep", 1L).otherwise(0L)).as("n_exact"),
        sum(when($"canon_keep", 1L).otherwise(0L)).as("n_canonical"),
        sum(when($"clean_keep", 1L).otherwise(0L)).as("n_clean"),
        sum($"n_chunks").as("n_chunks"),
        sum($"chunk_toks").as("n_chunk_tokens"))
      .selectExpr("source", "n_in", "n_quality", "n_exact", "n_canonical",
        "n_clean", "n_chunks", "n_chunk_tokens",
        s"(n_chunk_tokens + ${PackBudget - 1}) div $PackBudget AS n_sequences",
        s"""CASE WHEN n_chunk_tokens > 0
           |  THEN n_chunk_tokens
           |    - ((n_chunk_tokens + ${PackBudget - 1}) div $PackBudget - 1) * $PackBudget
           |  ELSE CAST(0 AS BIGINT) END AS last_seq_fill""".stripMargin)
  }

  val fullPipelineSql: String =
    s"""WITH RECURSIVE ${Dedup.pairCteSql},
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
       |clusters AS (
       |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
       |base AS (
       |  SELECT doc_id, source, text,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
       |  FROM documents),
       |feat AS (
       |  SELECT doc_id, source, toks, len(toks) AS n_toks,
       |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm,
       |    0.4 * (CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE) / len(toks))
       |      + 0.3 * (1 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text))
       |      + 0.3 * (CAST(least(length(text), 500) AS DOUBLE) / 500) AS quality_score
       |  FROM base),
       |flags0 AS (SELECT *, quality_score >= 0.5 AS q_keep FROM feat),
       |flags1 AS (
       |  SELECT *, q_keep AND row_number() OVER (
       |    PARTITION BY norm, q_keep ORDER BY doc_id) = 1 AS exact_keep
       |  FROM flags0),
       |flags2 AS (
       |  SELECT f.*, c.cluster_id,
       |    f.exact_keep AND row_number() OVER (
       |      PARTITION BY c.cluster_id, f.exact_keep
       |      ORDER BY f.quality_score DESC, f.doc_id) = 1 AS canon_keep
       |  FROM flags1 f JOIN clusters c ON f.doc_id = c.doc_id),
       |bench AS (
       |  SELECT DISTINCT gram FROM (
       |    SELECT unnest(list_distinct(list_transform(range(1, len(toks) - 3),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS gram
       |    FROM base WHERE doc_id < 10 AND len(toks) >= 5)),
       |contam AS (
       |  SELECT DISTINCT g.doc_id FROM (
       |    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS gram
       |    FROM flags2 WHERE canon_keep AND doc_id >= 10 AND len(toks) >= 5) g
       |  JOIN bench b ON g.gram = b.gram),
       |cleanf AS (
       |  SELECT f.*,
       |    (f.canon_keep AND f.doc_id >= 10 AND co.doc_id IS NULL) AS clean_keep
       |  FROM flags2 f LEFT JOIN contam co ON f.doc_id = co.doc_id),
       |chunked AS (
       |  SELECT *,
       |    CASE WHEN clean_keep AND n_toks > 0
       |      THEN (n_toks - 1) // $ChunkStride + 1 ELSE 0 END AS n_chunks,
       |    CASE WHEN clean_keep AND n_toks > 0
       |      THEN CAST(list_sum(list_transform(
       |        range(0, (n_toks - 1) // $ChunkStride + 1),
       |        i -> least($ChunkTokens, n_toks - i * $ChunkStride))) AS BIGINT)
       |      ELSE 0 END AS chunk_toks
       |  FROM cleanf)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_in,
       |  CAST(sum(CASE WHEN q_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       |  CAST(sum(CASE WHEN exact_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       |  CAST(sum(CASE WHEN canon_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
       |  CAST(sum(CASE WHEN clean_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       |  CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
       |  CAST(sum(chunk_toks) AS BIGINT) AS n_chunk_tokens,
       |  (CAST(sum(chunk_toks) AS BIGINT) + ${PackBudget - 1}) // $PackBudget AS n_sequences,
       |  CASE WHEN CAST(sum(chunk_toks) AS BIGINT) > 0
       |    THEN CAST(sum(chunk_toks) AS BIGINT)
       |      - ((CAST(sum(chunk_toks) AS BIGINT) + ${PackBudget - 1}) // $PackBudget - 1) * $PackBudget
       |    ELSE 0 END AS last_seq_fill
       |FROM chunked GROUP BY source""".stripMargin

  /** Systematic PPS (probability-proportional-to-size) sampling — the
    * deterministic way to subsample a corpus so each document's
    * selection odds are proportional to its token mass: lay documents
    * on the cumulative-size line (ordered by doc_id), drop k evenly
    * spaced marks (stride = total/k, integer), keep every document
    * whose interval contains a mark, with its multiplicity (a document
    * larger than the stride is hit more than once — the PPS weight).
    * All-integer arithmetic ⇒ exact on both engines and reproducible
    * run-to-run, unlike rand()-based weighted sampling.
    *
    * Scale note: the cumulative-size line is a [[Scans.segmentedCumSum]]
    * — doc_id-range shards scanned in parallel with broadcast carries,
    * never a single-partition global window; everything else is narrow.
    */
  val PpsK = 50

  def ppsSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cum = Scans.segmentedCumSum(
      Scans.shardByRange(
        Tables.documents(s, dir).select($"doc_id", $"n_chars"), $"doc_id"),
      "__shard", Seq($"doc_id"), Seq(($"n_chars", "cum")))
      .drop("__shard")
    val tot = cum.agg(max($"cum").as("total"))
    cum.crossJoin(broadcast(tot))
      .selectExpr("doc_id", "n_chars",
        s"total div $PpsK AS stride", "cum", "cum - n_chars AS cum_prev")
      .where(expr("cum div stride > cum_prev div stride"))
      .selectExpr("doc_id", "n_chars",
        "CAST(cum div stride - cum_prev div stride AS BIGINT) AS multiplicity")
  }

  val ppsSampleSql: String =
    s"""WITH cum AS (
       |  SELECT doc_id, n_chars,
       |    sum(n_chars) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM documents),
       |tot AS (SELECT max(cum) AS total FROM cum)
       |SELECT doc_id, n_chars,
       |  CAST(cum // (total // $PpsK)
       |    - (cum - n_chars) // (total // $PpsK) AS BIGINT) AS multiplicity
       |FROM cum CROSS JOIN tot
       |WHERE cum // (total // $PpsK) > (cum - n_chars) // (total // $PpsK)""".stripMargin

  /** Weighted sampling WITHOUT replacement via Efraimidis–Spirakis
    * exponential keys — the named algorithm behind every
    * "sample k documents proportionally to token mass, no duplicates"
    * pipeline stage, and the complement to [[ppsSample]] (systematic
    * PPS samples WITH multiplicity; A-ES guarantees distinct rows and
    * composes with streaming/distributed top-k): each document draws
    * u ∈ (0,1) DETERMINISTICALLY from its md5-60 hash (53-bit mantissa
    * fraction — both engines compute the identical double), and the
    * k largest keys u^(1/w) win. Ranking uses ln(u)/w (monotone in
    * u^(1/w), one ln + one division — cheaper and the identical IEEE
    * expression both engines evaluate); ties (impossible in practice,
    * defined anyway) break by doc_id. Plan: narrow map + one
    * TakeOrderedAndProject — no shuffle beyond the top-k.
    */
  val AesK = 100

  def aesSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"n_chars",
        conv(substring(md5(concat(lit("aes:"), $"doc_id")), 1, 15), 16, 10)
          .cast("long").as("h"))
      // u in (0,1): 53-bit fraction, +1 so u is never 0 (ln(0) = -inf)
      .withColumn("u",
        (($"h" % 9007199254740992L) + 1.0) / 9007199254740993.0)
      .withColumn("es_key", log($"u") / $"n_chars")
      .orderBy($"es_key".desc, $"doc_id")
      .limit(AesK)
      .select($"doc_id", $"n_chars", round($"es_key", 9).as("es_key"))
  }

  val aesSampleSql: String =
    s"""SELECT doc_id, n_chars, round(es_key, 9) AS es_key FROM (
       |  SELECT doc_id, n_chars,
       |    ln(((CAST(('0x' || substring(md5('aes:' || CAST(doc_id AS VARCHAR)), 1, 15))
       |      AS BIGINT) % 9007199254740992) + 1.0) / 9007199254740993.0)
       |      / n_chars AS es_key
       |  FROM documents)
       |ORDER BY es_key DESC, doc_id
       |LIMIT $AesK""".stripMargin

  /** Exact sample size per source for [[groupReservoir]]. */
  val ReservoirK = 25

  /** Per-GROUP exact-k reservoir sample — the balanced-exemplars stage
    * (k docs from EVERY source, however skewed the source sizes) next
    * to [[stratifiedSample]]'s proportional percent and [[aesSample]]'s
    * global weighted top-k. The classic streaming reservoir is
    * order-dependent; the distributed-and-deterministic equivalent
    * ranks each group by the salted md5-60 hash (a random permutation
    * in expectation) and keeps the first k — identical sample under
    * retry, speculation, AND epoch re-runs, which is what makes
    * training-data selection reproducible. Plan: narrow hash map + one
    * per-group window (WindowGroupLimit keeps per-partition state at
    * k before the shuffle) — no group ever materializes fully.
    */
  def groupReservoir(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    Tables.documents(s, dir)
      .select($"doc_id", $"source",
        md560(concat(lit("res:"), $"doc_id".cast("string"))).as("h"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"source").orderBy($"h", $"doc_id")))
      .where($"rk" <= ReservoirK)
      .select($"source", $"rk".cast("long").as("rk"), $"doc_id")
  }

  val groupReservoirSql: String =
    s"""SELECT source, CAST(rk AS BIGINT) AS rk, doc_id FROM (
       |  SELECT source, doc_id,
       |    row_number() OVER (PARTITION BY source ORDER BY
       |      CAST(('0x' || substring(md5('res:' || CAST(doc_id AS VARCHAR)), 1, 15))
       |        AS BIGINT), doc_id) AS rk
       |  FROM documents)
       |WHERE rk <= $ReservoirK""".stripMargin

  /** Per-source dataset card — the one-row-per-source "datasheet" a
    * corpus release ships: volume, token mass, exact-duplicate rate,
    * mean quality score, and dominant language, COMPOSED from the
    * registry's own stage definitions (the quality formula of
    * [[TextOps.docQuality]], the hash-keyed duplicate groups of the
    * exact-dedup family, the lang distribution) in one plan. Mean
    * quality rides the 6-dp-round→decimal-sum convention so the double
    * mean is partition-order-proof; dominant language is a windowed
    * argmax with (count desc, lang) determinism.
    */
  def sourceReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .selectExpr("doc_id", "source", "lang",
        "filter(split(lower(text), '\\\\s+'), t -> t <> '') AS toks",
        "text")
      .selectExpr("doc_id", "source", "lang", "size(toks) AS n_toks",
        """0.4 * (CAST(size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
          |   / size(toks))
          | + 0.3 * (1 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '')) AS DOUBLE)
          |   / length(text))
          | + 0.3 * (CAST(least(length(text), 500) AS DOUBLE) / 500)
          | AS quality_score""".stripMargin,
        "conv(substring(md5(text), 1, 15), 16, 10) AS th")
    val dupSizes = docs.groupBy($"th").agg(count(lit(1)).as("grp"))
    val langTop = docs.groupBy($"source", $"lang").agg(count(lit(1)).as("lc"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"source").orderBy($"lc".desc, $"lang")))
      .where($"rn" === 1)
      .select($"source", $"lang".as("top_lang"))
    docs.join(dupSizes, "th")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_toks").as("sum_tokens"),
        sum(when($"grp" >= 2, 1L).otherwise(0L)).as("n_dup_docs"),
        round(sum(round($"quality_score", 6).cast("decimal(18,9)"))
          .cast("double") / count(lit(1)), 6).as("mean_quality"))
      .join(langTop, "source")
  }

  val sourceReportSql: String =
    """WITH docs AS (
      |  SELECT doc_id, source, lang,
      |    len(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS n_toks,
      |    0.4 * (CAST(len(list_filter(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> ''),
      |        t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |      / len(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')))
      |    + 0.3 * (1 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
      |      / length(text))
      |    + 0.3 * (CAST(least(length(text), 500) AS DOUBLE) / 500) AS quality_score,
      |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS th
      |  FROM documents),
      |grp AS (SELECT th, count(*) AS grp FROM docs GROUP BY th),
      |lt AS (
      |  SELECT source, lang AS top_lang FROM (
      |    SELECT source, lang,
      |      row_number() OVER (PARTITION BY source
      |        ORDER BY count(*) DESC, lang) AS rn
      |    FROM docs GROUP BY source, lang)
      |  WHERE rn = 1)
      |SELECT d.source, count(*) AS n_docs,
      |  CAST(sum(d.n_toks) AS BIGINT) AS sum_tokens,
      |  CAST(sum(CASE WHEN g.grp >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
      |  round(CAST(sum(CAST(round(d.quality_score, 6) AS DECIMAL(18,9)))
      |    AS DOUBLE) / count(*), 6) AS mean_quality,
      |  any_value(lt.top_lang) AS top_lang
      |FROM docs d JOIN grp g ON g.th = d.th
      |JOIN lt ON lt.source = d.source
      |GROUP BY d.source""".stripMargin

  /** Curriculum / epoch ordering: a global training order that
    * round-robins across sources (so no source floods any contiguous
    * span of the epoch) WITHOUT a global sort — each row's position is
    * a pure function: pos = rank_within_source × n_sources + source
    * index. The only shuffle is the per-source rank window (the same
    * key the curation aggregates already use); the source-index dim and
    * the 1-row source count broadcast. Shard = pos mod n_shards gives
    * every worker an interleaved, near-equal slice — at 100 TB this is
    * how an epoch order ships to 1000 readers with zero coordination:
    * any reader reconstructs its slice from (rank, source) alone.
    */
  def curateCurriculum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val srcs = docs.select($"source").distinct()
      .withColumn("sidx",
        row_number().over(Window.orderBy($"source")) - lit(1))
    val n = srcs.agg(count(lit(1)).as("ns"))
    val ranked = docs.select($"doc_id", $"source")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"source").orderBy($"doc_id")) - lit(1))
    ranked
      .join(broadcast(srcs), "source")
      .crossJoin(broadcast(n))
      .select($"doc_id", $"source",
        ($"rn" * $"ns" + $"sidx").as("pos"),
        (($"rn" * $"ns" + $"sidx") % 8).as("shard"))
  }

  val curateCurriculumSql: String =
    """WITH srcs AS (
      |  SELECT source, row_number() OVER (ORDER BY source) - 1 AS sidx
      |  FROM (SELECT DISTINCT source FROM documents)),
      |n AS (SELECT count(*) AS ns FROM srcs),
      |r AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS rn
      |  FROM documents)
      |SELECT r.doc_id, r.source,
      |  rn * ns + sidx AS pos,
      |  (rn * ns + sidx) % 8 AS shard
      |FROM r JOIN srcs ON r.source = srcs.source CROSS JOIN n""".stripMargin

  /** Per-source winsorization of document lengths — the outlier-robust
    * normalization a mixing/weighting stage applies before any
    * mean-based statistic (a single 100 MB crawl artifact would
    * otherwise dominate its source's mean length). Clip bounds are the
    * values at rank ⌈n/20⌉ and ⌈19n/20⌉ within each source — positions
    * computed in INTEGER arithmetic ((n+19) div 20), values picked by a
    * deterministic (n_chars, doc_id) rank, so both engines select the
    * identical bound rows with no percentile-interpolation ambiguity.
    * One window over the source partition + one aggregate — the
    * |sources|-row bounds frame joins back by key (equi join, no
    * broadcast-nested-loop). Means are decimal-exact.
    */
  def winsorize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val d = Tables.documents(s, dir).select($"source", $"doc_id", $"n_chars")
    val ranked = d.withColumn("rn", row_number().over(
      Window.partitionBy($"source").orderBy($"n_chars", $"doc_id")))
    val counts = d.groupBy($"source").agg(count(lit(1)).as("n_docs"))
    val bounds = ranked.join(counts, "source")
      .where($"rn" === expr("(n_docs + 19) div 20") ||
             $"rn" === expr("(n_docs * 19 + 19) div 20"))
      .groupBy($"source")
      .agg(min($"n_chars").as("lo"), max($"n_chars").as("hi"))
    d.join(bounds, "source")
      .select($"source", $"n_chars", $"lo", $"hi",
        greatest(least($"n_chars", $"hi"), $"lo").as("w_chars"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        min($"lo").as("lo"), min($"hi").as("hi"),
        sum(when($"n_chars" < $"lo", 1L).otherwise(0L)).as("n_clip_low"),
        sum(when($"n_chars" > $"hi", 1L).otherwise(0L)).as("n_clip_high"),
        round(Exact.davg($"n_chars"), 6).as("mean_raw"),
        round(Exact.davg($"w_chars"), 6).as("mean_winsorized"))
  }

  val winsorizeSql: String =
    """WITH d AS (SELECT source, doc_id, n_chars FROM documents),
      |ranked AS (
      |  SELECT source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS rn
      |  FROM d),
      |counts AS (SELECT source, count(*) AS n FROM d GROUP BY 1),
      |bounds AS (
      |  SELECT r.source, min(r.n_chars) AS lo, max(r.n_chars) AS hi
      |  FROM ranked r JOIN counts c ON c.source = r.source
      |  WHERE r.rn = (c.n + 19) // 20 OR r.rn = (c.n * 19 + 19) // 20
      |  GROUP BY 1)
      |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
      |  min(b.lo) AS lo, min(b.hi) AS hi,
      |  CAST(sum(CASE WHEN d.n_chars < b.lo THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clip_low,
      |  CAST(sum(CASE WHEN d.n_chars > b.hi THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clip_high,
      |  round(CAST(sum(CAST(d.n_chars AS DECIMAL(18,2))) AS DOUBLE)
      |    / count(*), 6) AS mean_raw,
      |  round(CAST(sum(CAST(greatest(least(d.n_chars, b.hi), b.lo)
      |      AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS mean_winsorized
      |FROM d JOIN bounds b ON b.source = d.source
      |GROUP BY d.source""".stripMargin

  /** Train/val/test split leakage audit — the contamination check every
    * corpus split must pass before a model trains on it: assign each
    * document to a split by salted hash (90/5/5 — reproducible,
    * partition-independent, the same no-RNG rule as every sampler
    * here), then ask whether any NEAR-DUPLICATE pair straddles two
    * splits (a validation doc whose near-copy sits in train leaks the
    * eval). The pair set is the deployed MinHash-LSH detector's output
    * — already candidate-bounded, so the audit costs two broadcast-size
    * joins on top of the memoized signatures. Output: pair counts per
    * unordered split combination with the leak flag; same-split rows
    * ride along as the denominator context.
    */
  def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = md560(concat($"doc_id".cast("string"), lit("_split"))) % 100
    val splits = Tables.documents(s, dir)
      .select($"doc_id",
        when(h < 90, "train").when(h < 95, "val").otherwise("test").as("split"))
    Dedup.minhashLsh(s, dir).select($"doc_a", $"doc_b")
      .join(splits.toDF("doc_a", "sa"), "doc_a")
      .join(splits.toDF("doc_b", "sb"), "doc_b")
      .selectExpr("least(sa, sb) AS split_a", "greatest(sa, sb) AS split_b")
      .groupBy($"split_a", $"split_b")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("is_leak", $"split_a" =!= $"split_b")
  }

  val splitLeakageSql: String =
    s"""WITH nd AS (${Dedup.minhashLshSql}),
       |splits AS (
       |  SELECT doc_id,
       |    CASE WHEN ${duckMd560("CAST(doc_id AS VARCHAR) || '_split'")} % 100 < 90
       |           THEN 'train'
       |         WHEN ${duckMd560("CAST(doc_id AS VARCHAR) || '_split'")} % 100 < 95
       |           THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents)
       |SELECT least(a.split, b.split) AS split_a,
       |  greatest(a.split, b.split) AS split_b,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  least(a.split, b.split) <> greatest(a.split, b.split) AS is_leak
       |FROM nd
       |JOIN splits a ON a.doc_id = nd.doc_a
       |JOIN splits b ON b.doc_id = nd.doc_b
       |GROUP BY 1, 2""".stripMargin

  /** Token-budget selection — the data-mixing move that fills a fixed
    * per-source token budget with the best documents first: order each
    * source's docs by quality (desc, doc_id tiebreak), take the running
    * token cumsum, and keep a doc while the budget has room for ALL of
    * it (strictly: cumsum ≤ budget — the greedy prefix rule, no partial
    * documents). Output is the per-source fill report a mixing run
    * logs: docs/tokens kept, budget utilisation.
    *
    * Scale shape: one narrow token-count map, one window partitioned by
    * source (thousands of groups, never global), one per-source
    * aggregate. Quality is the deployed [[TextOps.docQuality]] score —
    * the same column the gate and curriculum stages key on.
    */
  val TokenBudget = 5000L

  def tokenBudget(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, dir)
      .selectExpr("doc_id", "source", s"size(${TextOps.tokensExpr}) AS n_toks")
    val scored = toks.join(
      TextOps.docQuality(s, dir).select($"doc_id", $"quality_score"), "doc_id")
    val w = Window.partitionBy($"source")
      .orderBy($"quality_score".desc, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.withColumn("cum_toks", sum($"n_toks").over(w))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"cum_toks" <= TokenBudget, 1L).otherwise(0L)).as("n_kept"),
        max(when($"cum_toks" <= TokenBudget, $"cum_toks")).as("tokens_kept"))
      .selectExpr("source", "n_docs", "n_kept",
        "CAST(coalesce(tokens_kept, 0) AS BIGINT) AS tokens_kept",
        s"floor(CAST(coalesce(tokens_kept, 0) AS DOUBLE) / $TokenBudget * 1e6 + 0.5) / 1e6 AS utilisation")
  }

  val tokenBudgetSql: String =
    s"""WITH q AS (${TextOps.docQualitySql}),
       |t AS (
       |  SELECT d.doc_id, d.source,
       |    len(${TextOps.duckTokensExpr}) AS n_toks, q.quality_score
       |  FROM documents d JOIN q ON q.doc_id = d.doc_id),
       |c AS (
       |  SELECT source, n_toks,
       |    sum(n_toks) OVER (PARTITION BY source
       |      ORDER BY quality_score DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum_toks
       |  FROM t)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN cum_toks <= $TokenBudget THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(coalesce(max(CASE WHEN cum_toks <= $TokenBudget THEN cum_toks END), 0) AS BIGINT) AS tokens_kept,
       |  floor(CAST(coalesce(max(CASE WHEN cum_toks <= $TokenBudget THEN cum_toks END), 0) AS DOUBLE) / $TokenBudget * 1e6 + 0.5) / 1e6 AS utilisation
       |FROM c GROUP BY source""".stripMargin

  /** Kolmogorov–Smirnov sampler-bias audit: the exact KS statistic
    * between the deployed stratified sample's length distribution and
    * the full corpus's — the "did my sampler skew the data" gate a
    * pipeline runs before trusting any sampled metric. Computed with
    * NO floats until the final division: at each distinct length,
    * D ∝ max |c_full·n_samp − c_samp·n_full| over the merged ECDFs
    * (integer cross-products), divided by n_full·n_samp once at the
    * end. Also reports the length at which the max gap occurs
    * (smallest such length on ties — a total order).
    *
    * Scale: two count aggregates + one window over DISTINCT lengths
    * (value-bounded, not row-bounded) + a 1-row total broadcast. The
    * sample is hash-derived, so the audit is reproducible across
    * partitionings — the property that makes it a meaningful gate.
    */
  def sampleKs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val full = Tables.documents(s, dir)
      .groupBy($"n_chars".as("len")).agg(count(lit(1)).as("cf"))
    val samp = stratifiedSample(s, dir)
      .groupBy($"n_chars".as("len")).agg(count(lit(1)).as("cs"))
    val merged = full.join(samp, Seq("len"), "full_outer")
      .select($"len",
        coalesce($"cf", lit(0L)).as("cf"), coalesce($"cs", lit(0L)).as("cs"))
    val w = Window.orderBy($"len")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged
      .withColumn("ecf", sum($"cf").over(w))
      .withColumn("ecs", sum($"cs").over(w))
    val totals = merged.agg(sum($"cf").as("nf"), sum($"cs").as("ns"))
    cum.crossJoin(broadcast(totals))
      .withColumn("gap", abs($"ecf" * $"ns" - $"ecs" * $"nf"))
      .orderBy($"gap".desc, $"len")
      .limit(1)
      .selectExpr("nf AS n_full", "ns AS n_sample", "len AS at_len",
        "floor(CAST(gap AS DOUBLE) / (nf * ns) * 1e6 + 0.5) / 1e6 AS ks_stat")
  }

  val sampleKsSql: String =
    s"""WITH samp AS ($stratifiedSampleSql),
       |f AS (SELECT n_chars AS len, count(*) AS cf FROM documents GROUP BY 1),
       |sm AS (SELECT n_chars AS len, count(*) AS cs FROM samp GROUP BY 1),
       |m AS (
       |  SELECT coalesce(f.len, sm.len) AS len,
       |    coalesce(cf, 0) AS cf, coalesce(cs, 0) AS cs
       |  FROM f FULL OUTER JOIN sm ON f.len = sm.len),
       |t AS (SELECT sum(cf) AS nf, sum(cs) AS ns FROM m),
       |c AS (
       |  SELECT len,
       |    sum(cf) OVER (ORDER BY len ROWS UNBOUNDED PRECEDING) AS ecf,
       |    sum(cs) OVER (ORDER BY len ROWS UNBOUNDED PRECEDING) AS ecs
       |  FROM m)
       |SELECT CAST(nf AS BIGINT) AS n_full, CAST(ns AS BIGINT) AS n_sample,
       |  len AS at_len,
       |  floor(CAST(abs(ecf * ns - ecs * nf) AS DOUBLE) / (nf * ns) * 1e6 + 0.5) / 1e6 AS ks_stat
       |FROM c CROSS JOIN t
       |ORDER BY abs(ecf * ns - ecs * nf) DESC, len
       |LIMIT 1""".stripMargin

  /** Minority-language upsampling plan: per language, the integer
    * repeat factor that brings it toward uniform share, capped at 4×
    * (the standard low-resource-language rebalancing move; the cap
    * bounds duplication-induced overfitting). factor =
    * min(4, ceil(total / (|langs|·n_lang))) computed entirely in
    * integer arithmetic — ceil(a/b) = (a + b − 1) div b — so the plan
    * is engine-exact with no rounding convention needed. Reports the
    * before/after composition.
    *
    * Scale: one lang count (map-side combinable), a |langs|-row frame
    * joined to two 1-row totals — metadata-sized after the first
    * aggregate.
    */
  def upsamplePlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.documents(s, dir)
      .groupBy($"lang").agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum($"n").as("total"),
      count(lit(1)).as("n_langs"))
    counts.crossJoin(broadcast(totals))
      .selectExpr("lang", "n",
        "least(CAST(4 AS BIGINT), (total + n_langs * n - 1) div (n_langs * n)) AS factor",
        "total", "n_langs")
      .selectExpr("lang", "n", "factor", "n * factor AS n_after",
        "floor(CAST(n AS DOUBLE) / total * 1e6 + 0.5) / 1e6 AS share_before")
  }

  val upsamplePlanSql: String =
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |t AS (SELECT sum(n) AS total, count(*) AS n_langs FROM c)
       |SELECT lang, CAST(n AS BIGINT) AS n,
       |  least(CAST(4 AS BIGINT),
       |    CAST((total + n_langs * n - 1) // (n_langs * n) AS BIGINT)) AS factor,
       |  CAST(n * least(CAST(4 AS BIGINT),
       |    CAST((total + n_langs * n - 1) // (n_langs * n) AS BIGINT)) AS BIGINT) AS n_after,
       |  floor(CAST(n AS DOUBLE) / total * 1e6 + 0.5) / 1e6 AS share_before
       |FROM c CROSS JOIN t""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curate_upsample_plan" -> (upsamplePlan _),
    "curate_sample_ks" -> (sampleKs _),
    "curate_token_budget" -> (tokenBudget _),
    "curate_split_leakage" -> (splitLeakage _),
    "curate_winsorize" -> (winsorize _),
    "curate_curriculum" -> (curateCurriculum _),
    "curate_pps_sample" -> (ppsSample _),
    "curate_aes_sample" -> (aesSample _),
    "curate_source_report" -> (sourceReport _),
    "curate_e2e_pipeline" -> (curateE2e _),
    "curate_full_pipeline" -> (fullPipeline _),
    "curate_stratified_sample" -> (stratifiedSample _),
    "curate_quality_bins" -> (qualityBins _),
    "curate_chunks" -> (chunkOverlap _),
    "curate_pack_stats" -> (packStats _),
    "curate_domain_quota" -> (domainQuota _),
    "curate_mix_weights" -> (mixWeights _),
    "curate_temperature_mix" -> (temperatureMix _),
    "curate_kcenter_coreset" -> (kcenterCoreset _),
    "curate_unigram_surprisal" -> (unigramSurprisal _),
    "curate_dsir_weights" -> (dsirWeights _),
    "curate_dsir_select" -> (dsirSelect _),
    "curate_group_reservoir" -> (groupReservoir _))

  def oracles: Map[String, String] = Map(
    "curate_upsample_plan" -> upsamplePlanSql,
    "curate_sample_ks" -> sampleKsSql,
    "curate_token_budget" -> tokenBudgetSql,
    "curate_split_leakage" -> splitLeakageSql,
    "curate_winsorize" -> winsorizeSql,
    "curate_curriculum" -> curateCurriculumSql,
    "curate_pps_sample" -> ppsSampleSql,
    "curate_aes_sample" -> aesSampleSql,
    "curate_source_report" -> sourceReportSql,
    "curate_e2e_pipeline" -> curateE2eSql,
    "curate_full_pipeline" -> fullPipelineSql,
    "curate_stratified_sample" -> stratifiedSampleSql,
    "curate_quality_bins" -> qualityBinsSql,
    "curate_chunks" -> chunkOverlapSql,
    "curate_pack_stats" -> packStatsSql,
    "curate_domain_quota" -> domainQuotaSql,
    "curate_mix_weights" -> mixWeightsSql,
    "curate_temperature_mix" -> temperatureMixSql,
    "curate_kcenter_coreset" -> kcenterCoresetSql,
    "curate_unigram_surprisal" -> unigramSurprisalSql,
    "curate_dsir_weights" -> dsirWeightsSql,
    "curate_dsir_select" -> dsirSelectSql,
    "curate_group_reservoir" -> groupReservoirSql)
}
