package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Word-count family and text analysis over the `documents` table.
  *
  * The word count reproduces the reference's Storm test-topology
  * semantics (reference
  * `src/test/scala/com/miguno/kafkastorm/integration/StormSpec.scala:43-109`:
  * per-word counts after `fieldsGrouping("word")`, final state
  * alice→2, bob→1, joe→1). `fieldsGrouping` ≈ the hash shuffle that
  * `groupBy("word")` implies; partial (map-side) aggregation means the
  * shuffle carries one row per distinct word per partition — at 100 TB
  * the shuffle volume is bounded by vocabulary size × partitions, not
  * by corpus size.
  */
object TextOps {

  /** Tokenize: lowercase, split on non-word runs, drop empties.
    * explode() is Spark's built-in Generator — the one generator-shaped
    * op the capability set needs (SURVEY.md §2.7).
    */
  def tokens(df: DataFrame): DataFrame =
    Tables.spread(df, "doc_id").select(col("doc_id"),
      explode(split(lower(col("text")), "\\W+")).as("word"))
      .filter(length(col("word")) > 0)

  /** A1/batch: per-word counts (final state of the running count). */
  def wordCount(s: SparkSession, dir: String): DataFrame =
    tokens(Tables.documents(s, dir))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  val wordCountSql: String =
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(regexp_split_to_array(lower(text), '\W+')) AS word
      |      FROM documents)
      |WHERE word <> ''
      |GROUP BY word""".stripMargin

  /** A2: global record count (Storm `globalGrouping` → single total).
    * In Spark a global agg is a partial count per partition + a 1-row
    * final reduce — the all-to-one shuffle moves #partitions rows.
    */
  def globalCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).agg(count(lit(1)).as("total"))

  val globalCountSql: String = "SELECT count(*) AS total FROM documents"

  /** A3: aggregates-of-aggregates — count of distinct words (an agg over
    * the word-count stream's final state).
    */
  def aggOfAgg(s: SparkSession, dir: String): DataFrame =
    wordCount(s, dir).agg(count(lit(1)).as("distinct_words"))

  val aggOfAggSql: String =
    """SELECT count(*) AS distinct_words FROM (
      |  SELECT word FROM (
      |    SELECT unnest(regexp_split_to_array(lower(text), '\W+')) AS word
      |    FROM documents)
      |  WHERE word <> '' GROUP BY word)""".stripMargin

  // -------------------------------------------------------------------
  // Text-analysis extensions (training-data pipeline ops). All formulas
  // are expressed identically in Spark SQL and DuckDB so the driver's
  // exact hash compare holds: integer counts, then IEEE double division
  // in the same order on both sides.
  // -------------------------------------------------------------------

  /** Whitespace tokens as an array column (shared sub-expression). */
  private[operators] val tokensExpr =
    "filter(split(lower(text), '\\\\s+'), t -> t <> '')"
  private[operators] val duckTokensExpr =
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"

  /** Per-document token statistics: token count, distinct count,
    * type-token ratio, plus a BPE-ish regex token count (letter runs /
    * digit runs / single punctuation, the shape a byte-pair pretokenizer
    * produces). Pure narrow map — no shuffle; scales with input splits.
    */
  def docTokenStats(s: SparkSession, dir: String): DataFrame = {
    // tokenize once; every stat references the materialized array
    Tables.documents(s, dir)
      .selectExpr("doc_id", "text", s"$tokensExpr AS toks")
      .selectExpr("doc_id", "text", "toks", "array_distinct(toks) AS dtoks")
      .selectExpr(
        "doc_id",
        "size(toks) AS n_tokens",
        "size(dtoks) AS n_distinct",
        "CAST(size(dtoks) AS DOUBLE) / size(toks) AS ttr",
        "size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)) AS n_bpe",
        "length(text) AS len_chars")
  }

  val docTokenStatsSql: String =
    s"""SELECT doc_id,
       |  len($duckTokensExpr) AS n_tokens,
       |  len(list_distinct($duckTokensExpr)) AS n_distinct,
       |  CAST(len(list_distinct($duckTokensExpr)) AS DOUBLE) / len($duckTokensExpr) AS ttr,
       |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe,
       |  length(text) AS len_chars
       |FROM documents""".stripMargin

  /** MATTR window width. */
  val MattrW = 50

  /** Moving-average type-token ratio (MATTR, Covington & McFall 2010) —
    * the length-robust lexical-diversity gate: plain TTR (in
    * [[docTokenStats]]) shrinks with document length purely because
    * vocabulary saturates, so a TTR threshold silently becomes a length
    * filter; MATTR averages the TTR of every [[MattrW]]-token sliding
    * window, making scores comparable across lengths — the form a
    * quality-filtering stage can actually threshold. Docs shorter than
    * the window fall back to plain TTR (their single clipped window).
    *
    * Exactness: the window-distinct counts are integers; one double
    * division of Σdistinct by (n_windows · window_len) per doc, floor-
    * rounded 6 dp. Plan: pure narrow per-doc map (the O(n·w) window
    * scan happens inside one row's expression — no explode, no
    * shuffle).
    */
  def docMattr(s: SparkSession, dir: String): DataFrame = {
    val w = MattrW
    Tables.documents(s, dir)
      .selectExpr("doc_id", s"$tokensExpr AS toks")
      .where("size(toks) >= 1")
      .selectExpr("doc_id", "toks",
        s"greatest(size(toks) - $w + 1, 1) AS n_windows",
        s"least($w, size(toks)) AS wlen")
      .selectExpr("doc_id",
        "CAST(size(toks) AS BIGINT) AS n_tokens",
        "CAST(n_windows AS BIGINT) AS n_windows",
        s"""floor(CAST(aggregate(
           |  transform(sequence(1, n_windows),
           |    i -> size(array_distinct(slice(toks, i, $w)))),
           |  0L, (acc, x) -> acc + x) AS DOUBLE)
           |  / (CAST(n_windows AS DOUBLE) * wlen) * 1e6 + 0.5) / 1e6
           |  AS mattr""".stripMargin)
  }

  val docMattrSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, $duckTokensExpr AS t FROM documents),
       |win AS (
       |  SELECT doc_id, t,
       |    greatest(len(t) - ${MattrW - 1}, 1) AS n_windows,
       |    least(${MattrW}, len(t)) AS wlen
       |  FROM toks WHERE len(t) >= 1)
       |SELECT doc_id,
       |  CAST(len(t) AS BIGINT) AS n_tokens,
       |  CAST(n_windows AS BIGINT) AS n_windows,
       |  floor(CAST(list_sum(list_transform(range(1, n_windows + 1),
       |      i -> len(list_distinct(list_slice(t, i, i + ${MattrW - 1})))))
       |    AS DOUBLE) / (CAST(n_windows AS DOUBLE) * wlen) * 1e6 + 0.5) / 1e6
       |    AS mattr
       |FROM win""".stripMargin

  /** Quality scoring: stopword ratio, punctuation ratio, length norm,
    * and a weighted score — the length/punct/stopword-ratio heuristic
    * used to filter web corpora before training.
    */
  def docQuality(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .selectExpr("doc_id", "text", s"$tokensExpr AS toks")
      .selectExpr(
        "doc_id",
        """CAST(size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
          | / size(toks) AS stop_ratio""".stripMargin,
        """CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '')) AS DOUBLE)
          | / length(text) AS punct_ratio""".stripMargin,
        "CAST(least(length(text), 500) AS DOUBLE) / 500 AS len_norm")
      .selectExpr("doc_id", "stop_ratio", "punct_ratio", "len_norm",
        "0.4 * stop_ratio + 0.3 * (1 - punct_ratio) + 0.3 * len_norm AS quality_score")
  }

  val docQualitySql: String =
    s"""SELECT doc_id, stop_ratio, punct_ratio, len_norm,
       |  0.4 * stop_ratio + 0.3 * (1 - punct_ratio) + 0.3 * len_norm AS quality_score
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(list_filter($duckTokensExpr, t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
       |      / len($duckTokensExpr) AS stop_ratio,
       |    CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
       |      / length(text) AS punct_ratio,
       |    CAST(least(length(text), 500) AS DOUBLE) / 500 AS len_norm
       |  FROM documents)""".stripMargin

  /** Language-ID heuristic: per-language stopword hit counts with an
    * ordered-CASE argmax (deterministic tie-break = case order). CJK
    * presence is checked by unicode range for zh.
    */
  def docLangId(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .selectExpr("doc_id", "lang", "text", s"$tokensExpr AS toks")
      .selectExpr(
      "doc_id", "lang",
      "size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'is'))) AS en_n",
      "size(filter(toks, t -> t IN ('der', 'die', 'das', 'und', 'ist'))) AS de_n",
      "size(filter(toks, t -> t IN ('le', 'les', 'et', 'est', 'une'))) AS fr_n",
      "size(filter(toks, t -> t IN ('el', 'los', 'y', 'es', 'una'))) AS es_n",
      "size(regexp_extract_all(text, '[\\\\x{4e00}-\\\\x{9fff}]', 0)) AS zh_n")
      .selectExpr("doc_id", "lang",
        """CASE
          | WHEN zh_n > 0 THEN 'zh'
          | WHEN en_n >= de_n AND en_n >= fr_n AND en_n >= es_n THEN 'en'
          | WHEN de_n >= fr_n AND de_n >= es_n THEN 'de'
          | WHEN fr_n >= es_n THEN 'fr'
          | ELSE 'es' END AS pred_lang""".stripMargin)
  }

  val docLangIdSql: String =
    s"""SELECT doc_id, lang,
       |  CASE
       |   WHEN zh_n > 0 THEN 'zh'
       |   WHEN en_n >= de_n AND en_n >= fr_n AND en_n >= es_n THEN 'en'
       |   WHEN de_n >= fr_n AND de_n >= es_n THEN 'de'
       |   WHEN fr_n >= es_n THEN 'fr'
       |   ELSE 'es' END AS pred_lang
       |FROM (
       |  SELECT doc_id, lang,
       |    len(list_filter($duckTokensExpr, t -> t IN ('the', 'a', 'of', 'and', 'is'))) AS en_n,
       |    len(list_filter($duckTokensExpr, t -> t IN ('der', 'die', 'das', 'und', 'ist'))) AS de_n,
       |    len(list_filter($duckTokensExpr, t -> t IN ('le', 'les', 'et', 'est', 'une'))) AS fr_n,
       |    len(list_filter($duckTokensExpr, t -> t IN ('el', 'los', 'y', 'es', 'una'))) AS es_n,
       |    len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS zh_n
       |  FROM documents)""".stripMargin

  /** Document fingerprint: order-sensitive polynomial rolling hash over
    * characters, mod 1e9+7 (keeps every intermediate below 2^35, so the
    * arithmetic is overflow-free and portable — Java Long wraparound is
    * not reproducible in engines that error on BIGINT overflow).
    * At 100 TB this would graduate to a codegen'd Catalyst Expression;
    * the higher-order-function form stays whole-stage-codegen-friendly
    * and shuffle-free.
    */
  def docFingerprint(s: SparkSession, dir: String): DataFrame = {
    // Same recurrence the oracle's list_reduce computes —
    // h := (h*31 + codepoint) mod 1e9+7 over characters in order — as a
    // primitive loop (the per-char higher-order form boxed every
    // character; ~6× slower at sf0.1).
    val fp = udf { (text: String) =>
      var h = 0L
      val it = text.codePoints().iterator()
      while (it.hasNext) { h = (h * 31 + it.next()) % 1000000007L }
      h
    }
    Tables.documents(s, dir).select(col("doc_id"),
      fp(col("text")).as("fingerprint"))
  }

  val docFingerprintSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(text) + 1),
      |                     i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
      |    (h, c) -> (h * 31 + c) % 1000000007) AS fingerprint
      |FROM documents""".stripMargin

  /** Corpus profile: documents per (lang, source) with length stats. */
  def langSourceDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
  }

  val langSourceDistSql: String =
    """SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY lang, source""".stripMargin

  /** TF-IDF top terms per document: term frequency × ln(N/df), the
    * classic retrieval weighting. One shuffle for document frequencies
    * (joined back size-based by AQE — vocabulary-sized, which stops
    * being broadcastable at corpus scale), one for the per-doc window.
    * Scores are rounded to 6 dp (libm `ln` may differ in the last ulp
    * across engines); ranking is robust because exact score ties imply
    * equal (tf, df) pairs — broken deterministically by term.
    */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val tf = tokens(docs).groupBy($"doc_id", $"word")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id")
      .orderBy(col("tfidf").desc, $"word")
    tf.join(df, "word")
      .withColumn("tfidf", round($"tf" * log(lit(n.toDouble) / $"df"), 6))
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= 3)
      .select($"doc_id", $"word", $"tfidf", $"rn")
  }

  val tfidfSql: String =
    """WITH tf AS (
      |  SELECT doc_id, word, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\W+')) AS word
      |    FROM documents) WHERE word <> '' GROUP BY 1, 2),
      |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT tf.doc_id, tf.word,
      |    round(tf.tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df.df), 6) AS tfidf
      |  FROM tf JOIN df ON tf.word = df.word)
      |SELECT doc_id, word, tfidf, rn FROM (
      |  SELECT doc_id, word, tfidf,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rn
      |  FROM scored)
      |WHERE rn <= 3""".stripMargin

  /** BM25 retrieval scoring (k1 = 1.2, b = 0.75): the 20 best documents
    * for the corpus's 3 most frequent terms (a deterministic,
    * data-derived "query" — both engines derive it identically with a
    * (count, word) tie-break). The retrieval-quality scorer a curation
    * pipeline uses to pull topic-relevant documents at scale: tf/df/len
    * aggregations are the word-count shuffles, the query side is a
    * 3-row broadcast, corpus totals a 1-row broadcast. Per-term scores
    * round to 6 dp and sum as DECIMAL (associative, partition-order-
    * proof); every double constant is precomputed once in Scala and
    * interpolated into the oracle via shortest-round-trip toString, so
    * the formula trees match bit-for-bit (ln's last-ulp wobble is
    * absorbed by the 6 dp round — the tfidf precedent).
    */
  def bm25TopDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val k1p1 = 1.2 + 1.0
    val k1 = 1.2
    val oneMinusB = 1.0 - 0.75
    val b = 0.75
    val toks = tokens(Tables.documents(s, dir))
    val tf = toks.groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    val dlen = toks.groupBy($"doc_id").agg(count(lit(1)).as("dlen"))
    val dfreq = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    val totals = dlen.agg(sum($"dlen").cast("double").as("len_sum"),
      count(lit(1)).cast("double").as("n_docs"))
    val qterms = toks.groupBy($"word").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"word").limit(3).select($"word")
    val w = Window.partitionBy(lit(1)).orderBy($"bm25".desc, $"doc_id")
    tf.join(broadcast(qterms), "word")
      .join(dlen, "doc_id")
      .join(dfreq, "word")
      .crossJoin(broadcast(totals))
      .withColumn("score_t", round(
        log(($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)) + lit(1.0)) *
          ($"tf" * lit(k1p1)) /
          ($"tf" + lit(k1) *
            (lit(oneMinusB) + lit(b) * $"dlen" / ($"len_sum" / $"n_docs"))), 6)
        .cast("decimal(18,6)"))
      .groupBy($"doc_id")
      .agg(sum($"score_t").cast("double").as("bm25"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= 20)
      .select($"doc_id", $"bm25", $"rn")
  }

  val bm25TopDocsSql: String = {
    val k1p1 = 1.2 + 1.0
    val k1 = 1.2
    val oneMinusB = 1.0 - 0.75
    val b = 0.75
    s"""WITH toks AS (
       |  SELECT doc_id, word FROM (
       |    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\W+')) AS word
       |    FROM documents) WHERE word <> ''),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dlen AS (SELECT doc_id, count(*) AS dlen FROM toks GROUP BY 1),
       |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
       |totals AS (
       |  SELECT CAST(sum(dlen) AS DOUBLE) AS len_sum,
       |    CAST(count(*) AS DOUBLE) AS n_docs FROM dlen),
       |qterms AS (
       |  SELECT word FROM (
       |    SELECT word, count(*) AS c FROM toks GROUP BY 1
       |    ORDER BY c DESC, word LIMIT 3)),
       |scored AS (
       |  SELECT tf.doc_id,
       |    CAST(round(
       |      ln((t.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0) *
       |        (tf.tf * $k1p1) /
       |        (tf.tf + $k1 *
       |          ($oneMinusB + $b * dlen.dlen / (t.len_sum / t.n_docs))), 6)
       |      AS DECIMAL(18,6)) AS score_t
       |  FROM tf
       |  JOIN qterms ON qterms.word = tf.word
       |  JOIN dlen ON dlen.doc_id = tf.doc_id
       |  JOIN dfreq ON dfreq.word = tf.word
       |  CROSS JOIN totals t)
       |SELECT doc_id, bm25, rn FROM (
       |  SELECT doc_id, bm25,
       |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn
       |  FROM (SELECT doc_id, CAST(sum(score_t) AS DOUBLE) AS bm25
       |        FROM scored GROUP BY doc_id))
       |WHERE rn <= 20""".stripMargin
  }

  /** Known-item retrieval evaluation: for each of the 10 sample
    * documents (doc_id < 10 — the bounded-query convention), form a
    * query from the document's own top-3 tf-idf terms and measure
    * where BM25 ranks the SOURCE document among all candidates sharing
    * at least one query term. This is the standard synthetic IR eval
    * when no human judgments exist (known-item search): the metrics —
    * reciprocal rank, hit@1, hit@10 — are the MRR/recall@k family.
    * Only the METRIC arithmetic is rational (1/rank, boolean cuts —
    * the reason nDCG's log2 gain is NOT used here); the tf-idf
    * query-term selection and the BM25 scores underneath still use
    * ln(), so cross-engine exactness of the RANKS rests on the same
    * 6-dp rounding convention that absorbs ln's last-ulp differences
    * in [[bm25TopDocs]].
    *
    * Scale shape: query derivation is the tf-idf window (vocabulary +
    * per-doc top-3); scoring touches only the 30 query terms' postings
    * (an equi-join into the tf table — never a corpus scan per query);
    * ranking partitions by query. At 100 TB with q queries this is the
    * q·|postings(term)| retrieval cost every search engine pays, plus
    * one corpus pass for the df/len statistics it shares with
    * [[bm25TopDocs]].
    */
  def knownItemEval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val k1p1 = 1.2 + 1.0
    val k1 = 1.2
    val oneMinusB = 1.0 - 0.75
    val b = 0.75
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val toks = tokens(docs)
    val tf = toks.groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    val dlen = toks.groupBy($"doc_id").agg(count(lit(1)).as("dlen"))
    val dfreq = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    val totals = dlen.agg(sum($"dlen").cast("double").as("len_sum"),
      count(lit(1)).cast("double").as("n_docs"))
    // query formulation: the source doc's top-3 tf-idf terms
    val wq = Window.partitionBy($"q_doc").orderBy($"tfidf".desc, $"word")
    val qterms = tf.where($"doc_id" < 10)
      .join(dfreq, "word")
      .select($"doc_id".as("q_doc"), $"word",
        round($"tf" * log(lit(n.toDouble) / $"df"), 6).as("tfidf"))
      .withColumn("rn", row_number().over(wq))
      .where($"rn" <= 3)
      .select($"q_doc", $"word")
    // score candidates sharing >= 1 query term (postings equi-join)
    val scored = tf.join(broadcast(qterms), "word")
      .join(dlen, "doc_id")
      .join(dfreq, "word")
      .crossJoin(broadcast(totals))
      .withColumn("score_t", round(
        log(($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)) + lit(1.0)) *
          ($"tf" * lit(k1p1)) /
          ($"tf" + lit(k1) *
            (lit(oneMinusB) + lit(b) * $"dlen" / ($"len_sum" / $"n_docs"))), 6)
        .cast("decimal(18,6)"))
      .groupBy($"q_doc", $"doc_id")
      .agg(sum($"score_t").cast("double").as("bm25"))
    val wr = Window.partitionBy($"q_doc").orderBy($"bm25".desc, $"doc_id")
    val ranked = scored.withColumn("rnk", row_number().over(wr))
    val nScored = scored.groupBy($"q_doc")
      .agg(count(lit(1)).as("n_scored"))
    ranked.where($"doc_id" === $"q_doc")
      .join(nScored, "q_doc")
      .select($"q_doc", $"rnk".cast("long").as("rank_src"),
        (lit(1.0) / $"rnk").as("rr"),
        ($"rnk" <= 1).as("hit1"), ($"rnk" <= 10).as("hit10"),
        $"n_scored")
  }

  val knownItemEvalSql: String = {
    val k1p1 = 1.2 + 1.0
    val k1 = 1.2
    val oneMinusB = 1.0 - 0.75
    val b = 0.75
    s"""WITH toks AS (
       |  SELECT doc_id, word FROM (
       |    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\W+')) AS word
       |    FROM documents) WHERE word <> ''),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dlen AS (SELECT doc_id, count(*) AS dlen FROM toks GROUP BY 1),
       |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
       |totals AS (
       |  SELECT CAST(sum(dlen) AS DOUBLE) AS len_sum,
       |    CAST(count(*) AS DOUBLE) AS n_docs FROM dlen),
       |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |qterms AS (
       |  SELECT q_doc, word FROM (
       |    SELECT tf.doc_id AS q_doc, tf.word,
       |      row_number() OVER (PARTITION BY tf.doc_id ORDER BY
       |        round(tf.tf * ln(nd.n / dfreq.df), 6) DESC, tf.word) AS rn
       |    FROM tf JOIN dfreq ON dfreq.word = tf.word CROSS JOIN nd
       |    WHERE tf.doc_id < 10) s
       |  WHERE rn <= 3),
       |scored AS MATERIALIZED (
       |  SELECT q.q_doc, tf.doc_id,
       |    CAST(sum(CAST(round(
       |      ln((t.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0) *
       |        (tf.tf * $k1p1) /
       |        (tf.tf + $k1 *
       |          ($oneMinusB + $b * dlen.dlen / (t.len_sum / t.n_docs))), 6)
       |      AS DECIMAL(18,6))) AS DOUBLE) AS bm25
       |  FROM tf
       |  JOIN qterms q ON q.word = tf.word
       |  JOIN dlen ON dlen.doc_id = tf.doc_id
       |  JOIN dfreq ON dfreq.word = tf.word
       |  CROSS JOIN totals t
       |  GROUP BY q.q_doc, tf.doc_id),
       |ranked AS (
       |  SELECT q_doc, doc_id, row_number() OVER (
       |    PARTITION BY q_doc ORDER BY bm25 DESC, doc_id) AS rnk
       |  FROM scored),
       |nsc AS (SELECT q_doc, count(*) AS n_scored FROM scored GROUP BY q_doc)
       |SELECT r.q_doc, CAST(r.rnk AS BIGINT) AS rank_src,
       |  1.0 / r.rnk AS rr, r.rnk <= 1 AS hit1, r.rnk <= 10 AS hit10,
       |  n.n_scored
       |FROM ranked r JOIN nsc n ON n.q_doc = r.q_doc
       |WHERE r.doc_id = r.q_doc""".stripMargin
  }

  /** Corpus bigram counts: adjacent token pairs, top 20 with
    * deterministic tie-break — the n-gram statistics step of corpus
    * analysis. Bigrams are built row-locally (zip of the token array
    * with its tail) before the counting shuffle.
    */
  def bigramCounts(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .selectExpr(s"$tokensExpr AS toks")
      .where("size(toks) >= 2")
      .selectExpr(
        """explode(transform(sequence(1, size(toks) - 1),
          |  i -> concat(toks[i-1], ' ', toks[i]))) AS bigram""".stripMargin)
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(20)
  }

  val bigramCountsSql: String =
    s"""SELECT bigram, count(*) AS cnt FROM (
       |  SELECT unnest(list_transform(range(1, len(t)),
       |    i -> t[i] || ' ' || t[i+1])) AS bigram
       |  FROM (SELECT $duckTokensExpr AS t FROM documents)
       |  WHERE len(t) >= 2)
       |GROUP BY bigram
       |ORDER BY cnt DESC, bigram
       |LIMIT 20""".stripMargin

  /** Collocation mining via pointwise mutual information — the
    * phrase-discovery pass a tokenizer-training / n-gram-merge pipeline
    * runs over the corpus: PMI(x,y) = ln( p(x,y) / (p(x)·p(y)) ) with
    * p(x,y) from bigram counts and p(·) from unigram counts, min
    * support 5, top collocations by (PMI, bigram).
    *
    * All counts are exact integer aggregates (map-side combinable
    * wordcount shapes); the two corpus totals ride the approved 1-row
    * broadcast cross join; the single ln() is evaluated on an
    * identically-structured double expression in both engines and
    * rounded to 6 dp (same determinism contract as
    * [[Curation.unigramSurprisal]]). Top-k is orderBy+limit →
    * TakeOrderedAndProject, never a global sort.
    */
  def pmiBigrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val uni = Tables.documents(s, dir)
      .selectExpr(s"explode($tokensExpr) AS w")
      .groupBy($"w").agg(count(lit(1)).as("ucnt"))
    val tu = uni.agg(sum($"ucnt").as("tu"))
    val bi = Tables.documents(s, dir)
      .selectExpr(s"$tokensExpr AS toks")
      .where("size(toks) >= 2")
      .selectExpr(
        """explode(transform(sequence(1, size(toks) - 1),
          |  i -> struct(toks[i-1] AS w1, toks[i] AS w2))) AS b""".stripMargin)
      .select($"b.w1", $"b.w2")
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("cnt"))
    val tb = bi.agg(sum($"cnt").as("tb"))
    bi.where($"cnt" >= 5)
      .join(uni.select($"w".as("w1"), $"ucnt".as("cx")), "w1")
      .join(uni.select($"w".as("w2"), $"ucnt".as("cy")), "w2")
      .crossJoin(broadcast(tu)).crossJoin(broadcast(tb))
      .select(concat($"w1", lit(" "), $"w2").as("bigram"), $"cnt",
        round(log(($"cnt".cast("double") * $"tu" * $"tu")
          / ($"tb".cast("double") * $"cx" * $"cy")), 6).as("pmi"))
      .orderBy($"pmi".desc, $"bigram")
      .limit(40)
  }

  val pmiBigramsSql: String =
    s"""WITH toks AS (SELECT $duckTokensExpr AS t FROM documents),
       |uni AS (
       |  SELECT w, count(*) AS ucnt FROM (SELECT unnest(t) AS w FROM toks)
       |  GROUP BY w),
       |tu AS (SELECT CAST(sum(ucnt) AS BIGINT) AS tu FROM uni),
       |bi AS (
       |  SELECT w1, w2, count(*) AS cnt FROM (
       |    SELECT
       |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
       |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
       |    FROM toks WHERE len(t) >= 2)
       |  GROUP BY w1, w2),
       |tb AS (SELECT CAST(sum(cnt) AS BIGINT) AS tb FROM bi)
       |SELECT b.w1 || ' ' || b.w2 AS bigram, CAST(b.cnt AS BIGINT) AS cnt,
       |  round(ln((CAST(b.cnt AS DOUBLE) * tu.tu * tu.tu)
       |    / (CAST(tb.tb AS DOUBLE) * u1.ucnt * u2.ucnt)), 6) AS pmi
       |FROM bi b
       |JOIN uni u1 ON b.w1 = u1.w
       |JOIN uni u2 ON b.w2 = u2.w
       |CROSS JOIN tu CROSS JOIN tb
       |WHERE b.cnt >= 5
       |ORDER BY pmi DESC, bigram
       |LIMIT 40""".stripMargin

  /** Corpus-level duplicated-substring mass — the signal behind exact
    * substring deduplication (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better"), in its scalable token-n-gram form:
    * for every document, what fraction of its 8-token windows also
    * appears in at least one OTHER document. High-mass docs are
    * boilerplate/templates that pairwise near-dup (which needs a
    * whole-doc similarity bar) never flags.
    *
    * Plan: one narrow rolling-window explode per doc, one
    * map-side-combinable gram aggregate (distinct-doc count per gram),
    * one gram-keyed join back — wordcount-shaped end to end; no pair
    * enumeration anywhere, so cost is O(total tokens), not O(docs²).
    * The 8-gram strings themselves are the keys on both engines (no
    * hashing to go wrong).
    */
  def dupNgramMass(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // grams ride as md5-60 longs, not strings: the gram aggregate and
    // join-back shuffle 8-byte keys instead of ~50-byte text (the same
    // signature convention as the MinHash shingles); the hash is
    // identical in both engines, so any 60-bit collision affects both
    // sides equally and the oracle still matches exactly
    val grams = Tables.documents(s, dir)
      .selectExpr("doc_id", s"$tokensExpr AS toks")
      .where("size(toks) >= 8")
      .selectExpr("doc_id",
        """explode(transform(sequence(0, size(toks) - 8),
          |  i -> array_join(slice(toks, i + 1, 8), ' '))) AS gram""".stripMargin)
      .select($"doc_id",
        conv(substring(md5($"gram"), 1, 15), 16, 10).cast("long").as("h"))
    val gramDocs = grams.groupBy($"h")
      .agg(countDistinct($"doc_id").as("n_docs"))
    grams.join(gramDocs, "h")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"n_docs" >= 2, 1L).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_mass",
        round($"n_dup_grams".cast("double") / $"n_grams", 6))
  }

  val dupNgramMassSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, $duckTokensExpr AS t FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substring(md5(gram), 1, 15)) AS BIGINT) AS h
       |  FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(0, len(t) - 7),
       |        i -> array_to_string(t[i+1:i+8], ' '))) AS gram
       |    FROM toks WHERE len(t) >= 8)),
       |gd AS (
       |  SELECT h, count(DISTINCT doc_id) AS n_docs FROM grams
       |  GROUP BY h)
       |SELECT g.doc_id, count(*) AS n_grams,
       |  CAST(sum(CASE WHEN gd.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_grams,
       |  round(CAST(sum(CASE WHEN gd.n_docs >= 2 THEN 1 ELSE 0 END)
       |    AS DOUBLE) / count(*), 6) AS dup_mass
       |FROM grams g JOIN gd ON g.h = gd.h
       |GROUP BY g.doc_id""".stripMargin

  /** Spell-variant mining over the corpus vocabulary — the fuzzy
    * SELF-join none of the other dedup operators exhibit (they compare
    * documents; this compares the VOCABULARY to itself): word pairs at
    * edit distance ≤ 2, found by BLOCKED candidate generation. The
    * blocking predicate — shared first OR last character, AND length
    * within ±1 — is part of the operator's declared contract (restated
    * identically by the oracle), which is how fuzzy joins ship at
    * scale: an exact all-pairs edit-distance pass is O(|V|²) and dies
    * at a 100M-word vocabulary, while multi-pass blocking (the classic
    * record-linkage technique: one pass per block key, union, dedup)
    * bounds each equi-join bucket to a character-partition of one
    * length band. The ±1 length band rides the same explode-two-buckets
    * trick as the 5-minute band join ([[RangeJoin]]); levenshtein runs
    * only on in-block candidates. Pairs are canonical (a < b), counted
    * with their corpus frequencies so a downstream normalizer can pick
    * the canonical spelling by weight.
    */
  def spellVariants(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vocab = tokens(Tables.documents(s, dir))
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
      .where(length($"word") >= 3)
    // two block passes (first char / last char), each over the word's
    // own length and the next (covers ±1 after a<b canonicalization); a
    // pair caught by both passes dedups below
    def keyed(w: Column, c: Column, side: String) = {
      val blocks = array(
        concat(lit("F"), substring(w, 1, 1)),
        concat(lit("L"), substring(w, -1, 1)))
      vocab.select(w.as(side), c.as(s"cnt_$side"),
        explode(blocks).as("blk"), length(w).as("len"))
    }
    val anchors = keyed($"word", $"cnt", "a")
      .withColumn("lb", explode(array($"len", $"len" + 1))).drop("len")
    val probes = keyed($"word", $"cnt", "b")
      .withColumnRenamed("len", "lb")
    anchors.join(probes, Seq("blk", "lb"))
      .where($"a" < $"b" &&
        abs(length($"a") - length($"b")) <= 1 &&
        levenshtein($"a", $"b") <= 2)
      .select($"a", $"b", $"cnt_a", $"cnt_b",
        levenshtein($"a", $"b").as("edit_dist"))
      .distinct()
  }

  val spellVariantsSql: String =
    """WITH vocab AS (
      |  SELECT word, count(*) AS cnt FROM (
      |    SELECT unnest(regexp_split_to_array(lower(text), '\W+')) AS word
      |    FROM documents)
      |  WHERE word <> '' GROUP BY word),
      |v AS (SELECT word, cnt FROM vocab WHERE length(word) >= 3)
      |SELECT va.word AS a, vb.word AS b,
      |  va.cnt AS cnt_a, vb.cnt AS cnt_b,
      |  CAST(levenshtein(va.word, vb.word) AS INT) AS edit_dist
      |FROM v va JOIN v vb
      |  ON va.word < vb.word
      | AND (substring(va.word, 1, 1) = substring(vb.word, 1, 1)
      |      OR substring(va.word, -1, 1) = substring(vb.word, -1, 1))
      | AND abs(length(va.word) - length(vb.word)) <= 1
      | AND levenshtein(va.word, vb.word) <= 2""".stripMargin

  /** Entity masking / anonymization — the PII-scrub shape: every match
    * of a sensitive-term pattern is replaced with a fixed mask token and
    * counted, and the rewritten text is fingerprinted so the rewrite
    * itself is oracle-checked (not just the counts). The synthetic
    * corpus has no real PII, so the "sensitive" vocabulary here is the
    * entity-like tokens (`customer`, `user`, `spark`); a production run
    * swaps the pattern for email/phone/SSN regexes — same plan, which is
    * a pure narrow map (regex match + replace + md5), zero shuffles,
    * trivially parallel at 100 TB. The pattern sticks to RE2-safe
    * syntax (`\b`, alternation) so Java and DuckDB agree byte-for-byte.
    */
  def docAnonymize(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .selectExpr("doc_id",
        """CAST(size(regexp_extract_all(text,
          |  '\\b(customer|user|spark)\\b', 0)) AS BIGINT) AS n_masked""".stripMargin,
        """md5(regexp_replace(text,
          |  '\\b(customer|user|spark)\\b', '[ENT]')) AS masked_md5""".stripMargin)
  }

  val docAnonymizeSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\b(customer|user|spark)\b'))
      |    AS BIGINT) AS n_masked,
      |  md5(regexp_replace(text, '\b(customer|user|spark)\b', '[ENT]', 'g'))
      |    AS masked_md5
      |FROM documents""".stripMargin

  /** Bigram-LM document scoring — the perplexity-filter shape: train an
    * add-one-smoothed bigram model ON the corpus itself, score every
    * document by its average per-bigram negative log-likelihood. High
    * avg-NLL = improbable token transitions = the filtering signal a
    * real pipeline gets from a small reference LM.
    *
    * Scale shape: the model is the (u,v)→p table — O(observed bigrams),
    * small next to the corpus and broadcastable; the expensive side is
    * the doc-bigram explode, which is narrow, and the per-doc aggregate
    * (one shuffle on doc_id). Per-bigram NLLs are rounded to 6 dp and
    * summed as DECIMAL so the fold is partition-order-proof and the ln
    * arithmetic cross-engine-stable (the surprisal trick).
    */
  def docLmNll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .selectExpr("doc_id", s"$tokensExpr AS toks")
      .where("size(toks) >= 2")
    val bi = toks.selectExpr("doc_id",
        """explode(transform(sequence(1, size(toks) - 1),
          |  i -> struct(toks[i-1] AS u, toks[i] AS v))) AS e""".stripMargin)
      .select($"doc_id", $"e.u".as("u"), $"e.v".as("v"))
    val biCnt = bi.groupBy($"u", $"v").agg(count(lit(1)).as("cnt_uv"))
    val uniCnt = bi.groupBy($"u").agg(count(lit(1)).as("cnt_u"))
    val vocab = toks.selectExpr("explode(toks) AS w")
      .agg(countDistinct($"w").as("vsz"))
    val probs = biCnt.join(uniCnt, "u").crossJoin(broadcast(vocab))
      .select($"u", $"v",
        (($"cnt_uv" + 1).cast("double") / ($"cnt_u" + $"vsz").cast("double"))
          .as("p"))
    bi.join(probs, Seq("u", "v"))
      .select($"doc_id", round(-log($"p"), 6).cast("decimal(18,9)").as("nll"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum($"nll").cast("double") / count(lit(1)), 6).as("avg_nll"))
  }

  /** The bigram-LM NLL oracle's CTE chain up to the per-doc `nll`
    * table — shared verbatim by [[docLmNllSql]] and the CCNet-style
    * perplexity-bucket oracle built on it ([[docPplBucketsSql]]).
    */
  private[graft] val lmNllCtes: String =
    s"""toks AS (
       |  SELECT doc_id, $duckTokensExpr AS t FROM documents),
       |ftoks AS (SELECT doc_id, t FROM toks WHERE len(t) >= 2),
       |bi AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(t)), i -> t[i])) AS u,
       |    unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS v
       |  FROM ftoks),
       |bic AS (SELECT u, v, count(*) AS cnt_uv FROM bi GROUP BY 1, 2),
       |unic AS (SELECT u, count(*) AS cnt_u FROM bi GROUP BY 1),
       |vocab AS (
       |  SELECT count(DISTINCT w) AS vsz
       |  FROM (SELECT unnest(t) AS w FROM ftoks)),
       |probs AS (
       |  SELECT u, v,
       |    CAST(cnt_uv + 1 AS DOUBLE) / CAST(cnt_u + vsz AS DOUBLE) AS p
       |  FROM bic JOIN unic USING (u) CROSS JOIN vocab),
       |nll AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    round(CAST(sum(CAST(round(-ln(p), 6) AS DECIMAL(18,9))) AS DOUBLE)
       |      / count(*), 6) AS avg_nll
       |  FROM bi JOIN probs USING (u, v)
       |  GROUP BY doc_id)""".stripMargin

  val docLmNllSql: String =
    s"""WITH $lmNllCtes
       |SELECT doc_id, n_bigrams, avg_nll FROM nll""".stripMargin

  /** Interpolated Kneser–Ney probability — ONE expression text over
    * columns (cnt_uv, n1_fwd, n1_back, tt, cnt_u), evaluated verbatim
    * by both engines so every IEEE op and its order match:
    * max(c(uv)−d, 0)/c(u) + d·N₁₊(u·)/c(u) · N₁₊(·v)/T with d = 3/4
    * (exact in binary). Train = eval corpus ⇒ every scored bigram has
    * c(uv) ≥ 1, so no zero-probability path exists.
    */
  private val knProbExpr: String =
    """(greatest(CAST(cnt_uv AS DOUBLE) - 0.75, CAST(0 AS DOUBLE))
      |  + 0.75 * n1_fwd * (CAST(n1_back AS DOUBLE) / tt))
      |  / CAST(cnt_u AS DOUBLE)""".stripMargin

  /** Kneser–Ney smoothed bigram LM NLL — the production n-gram
    * smoothing (Kneser & Ney '95; Chen & Goodman '99 found interpolated
    * KN the consistent winner) beside [[docLmNll]]'s add-one baseline:
    * absolute discount d = 0.75 off every bigram count, the freed mass
    * re-allocated via the CONTINUATION distribution N₁₊(·v)/T ("how
    * many contexts does v complete" — the reason 'Francisco' scores
    * low despite high frequency). Same scan shape as the baseline: one
    * explode, three bigram-keyed aggregates, a 1-row type-count
    * broadcast, and the identical 6-dp decimal NLL finalize.
    */
  def docLmKnNll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .selectExpr("doc_id", s"$tokensExpr AS toks")
      .where("size(toks) >= 2")
    val bi = toks.selectExpr("doc_id",
        """explode(transform(sequence(1, size(toks) - 1),
          |  i -> struct(toks[i-1] AS u, toks[i] AS v))) AS e""".stripMargin)
      .select($"doc_id", $"e.u".as("u"), $"e.v".as("v"))
    val biCnt = bi.groupBy($"u", $"v").agg(count(lit(1)).as("cnt_uv"))
    val uniCnt = bi.groupBy($"u")
      .agg(count(lit(1)).as("cnt_u"), countDistinct($"v").as("n1_fwd"))
    val back = biCnt.groupBy($"v").agg(count(lit(1)).as("n1_back"))
    val types = biCnt.agg(count(lit(1)).as("tt"))
    val probs = biCnt.join(uniCnt, "u").join(back, "v")
      .crossJoin(broadcast(types))
      .select($"u", $"v", expr(knProbExpr).as("p"))
    // floor-idiom re-rounds (NOT native round): at the 10x replica one
    // bigram's -ln(p) landed on a .5 ulp boundary where the engines'
    // round(double, 6) implementations disagree - the KMeans.update
    // lesson, reproduced empirically here
    bi.join(probs, Seq("u", "v"))
      .select($"doc_id",
        expr("CAST(floor(-ln(p) * 1e6 + 0.5) / 1e6 AS DECIMAL(18,9))")
          .as("nll"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum($"nll").cast("double").as("nsum"), count(lit(1)).as("nc"))
      .selectExpr("doc_id", "n_bigrams",
        "floor(nsum / nc * 1e6 + 0.5) / 1e6 AS avg_nll")
  }

  val docLmKnNllSql: String =
    s"""WITH $lmNllCtes,
       |knuni AS (
       |  SELECT u, count(*) AS cnt_u, count(DISTINCT v) AS n1_fwd
       |  FROM bi GROUP BY 1),
       |knback AS (SELECT v, count(*) AS n1_back FROM bic GROUP BY 1),
       |kntypes AS (SELECT count(*) AS tt FROM bic),
       |knprobs AS (
       |  SELECT u, v, $knProbExpr AS p
       |  FROM bic JOIN knuni USING (u) JOIN knback USING (v)
       |  CROSS JOIN kntypes)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  floor(CAST(sum(CAST(floor(-ln(p) * 1e6 + 0.5) / 1e6
       |      AS DECIMAL(18,9))) AS DOUBLE)
       |    / count(*) * 1e6 + 0.5) / 1e6 AS avg_nll
       |FROM bi JOIN knprobs USING (u, v)
       |GROUP BY doc_id""".stripMargin

  /** CCNet-style perplexity bucketing — the curation step the LM score
    * exists for: per LANGUAGE, split documents into head/middle/tail
    * by the 33rd/67th percentiles of their [[docLmNll]] score (CCNet
    * trains on head+middle, drops or down-weights tail). Emits the
    * per-(lang, bucket) census a mixture-weighting stage consumes:
    * doc count, total bigrams (the token-budget denominator), and the
    * bucket's decimal-summed mean NLL.
    *
    * Scale shape: the cut points are a per-lang EXACT percentile — a
    * |langs|-row frame broadcast back as an equi-join (never a BNL);
    * at 100 TB the same plan swaps the exact builtin for the
    * fixed-memory histogram sketch (`sketch_group_quantiles` is that
    * operator) without touching the bucketing join. The doc-side work
    * rides on `doc_lm_nll`'s one explode + one doc-key shuffle.
    */
  def docPplBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wl = docLmNll(s, dir)
      .join(Tables.documents(s, dir).select($"doc_id", $"lang"), "doc_id")
    val cuts = wl.groupBy($"lang").agg(
      expr("percentile(avg_nll, 0.33)").as("c1"),
      expr("percentile(avg_nll, 0.67)").as("c2"))
    wl.join(broadcast(cuts), "lang")
      .withColumn("bucket",
        when($"avg_nll" <= $"c1", "head")
          .when($"avg_nll" <= $"c2", "middle").otherwise("tail"))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_bigrams").as("tok_bigrams"),
        round(sum($"avg_nll".cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("bucket_avg_nll"))
  }

  val docPplBucketsSql: String =
    s"""WITH $lmNllCtes,
       |wl AS (
       |  SELECT n.doc_id, n.n_bigrams, n.avg_nll, d.lang
       |  FROM nll n JOIN documents d USING (doc_id)),
       |cuts AS (
       |  SELECT lang, quantile_cont(avg_nll, 0.33) AS c1,
       |    quantile_cont(avg_nll, 0.67) AS c2
       |  FROM wl GROUP BY lang)
       |SELECT lang,
       |  CASE WHEN avg_nll <= c1 THEN 'head'
       |       WHEN avg_nll <= c2 THEN 'middle' ELSE 'tail' END AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_bigrams) AS BIGINT) AS tok_bigrams,
       |  round(CAST(sum(CAST(avg_nll AS DECIMAL(18,6))) AS DOUBLE)
       |    / count(*), 6) AS bucket_avg_nll
       |FROM wl JOIN cuts USING (lang)
       |GROUP BY 1, 2""".stripMargin

  /** Sparse similarity join: top-20 most similar document pairs by
    * TF-IDF cosine — the SPARSE counterpart to the dense embedding
    * near-dup path, i.e. lexical near-duplicate / related-document
    * retrieval without any embedding model.
    *
    * Candidate generation is PREFIX-FILTERED (only each document's
    * top-10 TF-IDF terms enter the inverted index, so candidates must
    * share a highly-weighted term) AND QUERY-BOUNDED: the left side is
    * a fixed 20-document query set (doc_id < 20). On a real Zipf
    * vocabulary the prefix filter alone keeps the pair count near-linear;
    * this synthetic corpus has a ~40-word flat vocabulary, where EVERY
    * pair shares a top term and pairwise mode degenerates to all-pairs
    * (measured: 360 s at sf0.1) — the bounded-query retrieval shape is
    * what a pipeline runs at scale anyway (find documents related to a
    * query set), and it is O(|queries|·docs) worst case. Weights are
    * 6-dp-rounded, products decimal-summed, norms IEEE-sqrt'd — dot,
    * norm, and cosine bit-identical cross-engine.
    */
  val CosineQueryDocs = 20

  def tfidfCosineTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val tf = tokens(docs).groupBy($"doc_id", $"word")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    // four consumers (norms, prefix index, both dot sides) — materialize
    // the weight table once instead of re-running tokenize+explode+agg
    val wgt = tf.join(dfreq, "word")
      .select($"doc_id", $"word",
        round($"tf" * log(lit(n.toDouble) / $"df"), 6).as("w"))
      .localCheckpoint()
    val norms = wgt.groupBy($"doc_id")
      .agg(sqrt(sum(round($"w" * $"w", 9).cast("decimal(28,12)"))
        .cast("double")).as("nrm"))
    val topIdx = wgt.withColumn("rn", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"w".desc, $"word")))
      .where($"rn" <= 10).select($"doc_id", $"word")
    val queryIdx = topIdx.where($"doc_id" < CosineQueryDocs)
    val cands = queryIdx.as("a").join(topIdx.as("b"),
        $"a.word" === $"b.word" && $"a.doc_id" =!= $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
    val wa = wgt.select($"doc_id".as("doc_a"), $"word", $"w".as("w_a"))
    val wb = wgt.select($"doc_id".as("doc_b"), $"word", $"w".as("w_b"))
    val dots = cands.join(wa, "doc_a").join(wb, Seq("doc_b", "word"))
      .groupBy($"doc_a", $"doc_b")
      .agg(sum(round($"w_a" * $"w_b", 9).cast("decimal(28,12)"))
        .cast("double").as("dot"))
    dots
      .join(norms.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("nrm", "na"), "doc_a")
      .join(norms.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("nrm", "nb"), "doc_b")
      .select($"doc_a", $"doc_b", round($"dot" / ($"na" * $"nb"), 6).as("cosine"))
      .orderBy($"cosine".desc, $"doc_a", $"doc_b").limit(20)
  }

  val tfidfCosineTopkSql: String =
    """WITH tf AS (
      |  SELECT doc_id, word, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\W+')) AS word
      |    FROM documents) WHERE word <> '' GROUP BY 1, 2),
      |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      |wgt AS (
      |  SELECT tf.doc_id, tf.word,
      |    round(tf.tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE)
      |      / dfreq.df), 6) AS w
      |  FROM tf JOIN dfreq ON tf.word = dfreq.word),
      |norms AS (
      |  SELECT doc_id,
      |    sqrt(CAST(sum(CAST(round(w * w, 9) AS DECIMAL(28,12))) AS DOUBLE))
      |      AS nrm
      |  FROM wgt GROUP BY doc_id),
      |top_idx AS (
      |  SELECT doc_id, word FROM (
      |    SELECT doc_id, word,
      |      row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, word) AS rn
      |    FROM wgt)
      |  WHERE rn <= 10),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM (SELECT * FROM top_idx WHERE doc_id < 20) a JOIN top_idx b
      |    ON a.word = b.word AND a.doc_id <> b.doc_id),
      |dots AS (
      |  SELECT c.doc_a, c.doc_b,
      |    CAST(sum(CAST(round(wa.w * wb.w, 9) AS DECIMAL(28,12))) AS DOUBLE)
      |      AS dot
      |  FROM cands c
      |  JOIN wgt wa ON wa.doc_id = c.doc_a
      |  JOIN wgt wb ON wb.doc_id = c.doc_b AND wb.word = wa.word
      |  GROUP BY 1, 2)
      |SELECT d.doc_a, d.doc_b,
      |  round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
      |FROM dots d
      |JOIN norms na ON na.doc_id = d.doc_a
      |JOIN norms nb ON nb.doc_id = d.doc_b
      |ORDER BY cosine DESC, d.doc_a, d.doc_b LIMIT 20""".stripMargin

  // ----------------------------------- unbounded all-pairs cosine (AllPairs)

  /** L2-normalize sparse vectors (doc_id, term, w) to unit norm. */
  private def l2normalize(vectors: DataFrame): DataFrame = {
    val s = vectors.sparkSession
    import s.implicits._
    val norms = vectors.groupBy($"doc_id")
      .agg(sqrt(sum($"w" * $"w")).as("nrm"))
      // zero-norm docs (every term weighted 0) carry no signal and
      // would normalize to NaN — drop them, matching the registered
      // direct-join path
      .where($"nrm" > 0)
    vectors.join(norms, "doc_id")
      .select($"doc_id", $"term", ($"w" / $"nrm").as("w"))
  }

  /** AllPairs / positional prefix-filter candidate generation (Bayardo,
    * Ma & Srikant, "Scaling Up All Pairs Similarity Search", WWW'07;
    * maxweight suffix bound) — the HONEST unbounded form of the sparse
    * similarity join, for corpora whose vocabulary actually prunes
    * (Zipfian df): [[tfidfCosineTopk]] documents why the registered
    * contract query is the QUERY-BOUNDED crossover instead (this
    * corpus's ~40-word flat vocabulary defeats any prefix filter — every
    * pair shares every high-weight term, so the candidate set IS n²
    * and no algorithm avoids it; on a Zipf vocabulary this operator's
    * candidate count is near-linear, which AllPairsCosineSpec pins).
    *
    * Soundness: unit-norm vectors, canonical term order = (df ASC,
    * term) — rare terms first, so prefixes hold rare terms. With
    * suffix bound S_i = Σ_{j≥i} w_j·maxw(t_j) (positions in canonical
    * order within the doc), position i is INDEXED iff S_i ≥ t. If a
    * pair's shared terms all fall outside doc a's prefix, then
    * cos(a,b) ≤ Σ_shared w_a·maxw ≤ S_{p_a+1} < t — so every pair at
    * or above threshold shares at least one term indexed by each side;
    * joining prefix(a) × full(b) is therefore a complete candidate set.
    *
    * Scale shape: df/maxweight is one vocab aggregate; suffix bounds
    * are per-doc windows (doc-sized partitions); candidates come from
    * ONE inverted-index equi-join on the term whose left side only
    * carries prefix entries. No driver state, no n² stage — the
    * candidate count is data-adaptive.
    */
  def allPairsCandidates(vectors: DataFrame, threshold: Double,
      assumeNormalized: Boolean = false): DataFrame = {
    val s = vectors.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // callers that already hold unit-norm, materialized vectors skip the
    // redundant norm aggregate + join over the full posting list
    val vecs =
      if (assumeNormalized) vectors
      else l2normalize(vectors).localCheckpoint()
    val stats = vecs.groupBy($"term")
      .agg(count(lit(1)).as("df"), max($"w").as("mw"))
    val win = Window.partitionBy($"doc_id").orderBy($"df".asc, $"term".asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prefixIdx = vecs.join(stats, "term")
      .withColumn("sfx", sum($"w" * $"mw").over(win))
      .where($"sfx" >= threshold)
      .select($"doc_id".as("p_doc"), $"term")
    prefixIdx
      .join(vecs.select($"doc_id".as("f_doc"), $"term"), "term")
      .where($"p_doc" =!= $"f_doc")
      .select(least($"p_doc", $"f_doc").as("doc_a"),
        greatest($"p_doc", $"f_doc").as("doc_b"))
      .distinct()
  }

  /** Exact all-pairs cosine ≥ threshold: prefix-filtered candidates
    * verified with the full dot product (each doc's vector carried once
    * as a map column — candidate verification is two map lookups, never
    * a re-join through the inverted index).
    */
  def allPairsCosine(vectors: DataFrame, threshold: Double): DataFrame = {
    val s = vectors.sparkSession
    import s.implicits._
    val maps = l2normalize(vectors).groupBy($"doc_id")
      .agg(map_from_entries(collect_list(struct($"term", $"w"))).as("vec"))
    allPairsCandidates(vectors, threshold)
      .join(maps.select($"doc_id".as("doc_a"), $"vec".as("va")), "doc_a")
      .join(maps.select($"doc_id".as("doc_b"), $"vec".as("vb")), "doc_b")
      .withColumn("cosine", expr(
        """aggregate(map_entries(va), CAST(0 AS DOUBLE),
          |  (acc, e) -> acc + e.value * coalesce(vb[e.key], CAST(0 AS DOUBLE)))""".stripMargin))
      .where($"cosine" >= threshold)
      .select($"doc_a", $"doc_b", $"cosine")
  }

  /** Registered AllPairs contract query: the UNBOUNDED exact similarity
    * self-join over n-gram tf-idf vectors with a DATA-ADAPTIVE gram
    * order. The design problem: unigram df on this corpus is flat (31
    * words — every pair shares every top term, the degenerate case
    * [[tfidfCosineTopk]] documents), and ANY fixed gram order saturates
    * once the corpus outgrows its V₁^g term space (measured: bigrams
    * are already degenerate at sf0.1 — median df 285/5000 docs, 10.3M
    * sharing pairs = 82% of n²/2; trigrams degenerate at the 10×
    * replica — Σdf² grew 100× and runtime 12×). So the gram order is
    * DERIVED from the collection, exactly like the LSH plane count
    * ([[graft.functions.Hashing.bucketBits]]): the smallest g with
    * V₁^g ≥ total tokens, i.e. the first order whose term space is big
    * enough that random n-gram collisions stop driving df, and posting
    * lists reflect true duplication only. Then Σdf² — the join work —
    * grows linearly with corpus duplication rather than quadratically
    * with corpus size (measured at sf0.1: g escalates 3→4, Σdf² drops
    * 2.79M→361k, the identical 256-pair answer). The oracle re-derives
    * g from the same two corpus statistics and restates the identical
    * n-gram pipeline ([[allPairsCosineSql]] takes g, the dir-threaded
    * oracle map computes it — the [[Similarity.ndParams]] pattern).
    *
    * Engine-exactness: weights 6-dp-rounded, norms via 9-dp decimal
    * square sums, normalized weights exact IEEE divisions, dot products
    * decimal sums of 9-dp-rounded term products — bit-identical in
    * DuckDB.
    *
    * Scale shape: one vocab aggregate, one posting-list self-join on
    * term (emitting only shared-term rows, Σ df² work), one pair-keyed
    * aggregate — no n² stage, no driver state beyond two corpus
    * statistics; see the plan-choice measurement note in the method
    * body.
    */
  val AllPairsThreshold = 0.3

  private val gramCache =
    scala.collection.concurrent.TrieMap.empty[String, Int]

  /** Smallest g ∈ [2, 6] with (distinct unigrams)^g ≥ total tokens —
    * memoized per corpus fingerprint; one aggregate over the token
    * stream (at production scale: two table statistics).
    */
  def allPairsGramOrder(s: SparkSession, dir: String): Int =
    graft.Memo.capped(gramCache)(Similarity.dataKey(dir, "documents"), {
      val row = Tables.documents(s, dir)
        .selectExpr(s"explode($tokensExpr) AS w")
        .agg(countDistinct(col("w")).as("v1"), count(lit(1)).as("tot"))
        .head()
      val v1 = row.getLong(0).toDouble
      val tot = row.getLong(1).toDouble
      var g = 2
      while (math.pow(v1, g) < tot && g < 6) g += 1
      g
    })

  /** (doc_id, term) n-gram rows for gram order g — shared by the
    * registered query and its spec reference.
    */
  private[operators] def ngramTerms(docs: DataFrame, g: Int): DataFrame =
    Tables.spread(docs, "doc_id").selectExpr("doc_id", s"$tokensExpr AS toks")
      .where(s"size(toks) >= $g")
      .selectExpr("doc_id",
        s"""explode(transform(sequence(1, size(toks) - ${g - 1}),
           |  i -> concat_ws(' ', slice(toks, i, $g)))) AS term""".stripMargin)

  def allPairsNgramCosine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val g = allPairsGramOrder(s, dir)
    val bg = ngramTerms(docs, g)
    val tf = bg.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val wgt = tf.join(dfreq, "term")
      .select($"doc_id", $"term",
        round($"tf" * log(lit(n.toDouble) / $"df"), 6).as("w"))
      .localCheckpoint()
    val norms = wgt.groupBy($"doc_id")
      .agg(sqrt(sum(round($"w" * $"w", 9).cast("decimal(28,12)"))
        .cast("double")).as("nrm"))
      // a doc whose EVERY term has df = n weighs 0 everywhere → nrm 0
      // → w/nrm NaN; NaN then CASTs to NULL in Spark but ERRORS in
      // DuckDB's decimal cast. Zero-norm docs have no similarity
      // signal — drop them identically on both engines.
      .where($"nrm" > 0)
    val nw = wgt.join(norms, "doc_id")
      .select($"doc_id", $"term", ($"w" / $"nrm").as("w"))
      .localCheckpoint()
    // Direct sparse dot: ONE posting-list self-join on term emits only
    // (pair, SHARED term) rows — Σ_t df(t)²/2 ≈ 1.27M rows at sf0.1 —
    // then one pair-keyed decimal aggregate. Measured against the
    // prefix-filtered alternative on THIS corpus: the filter kept 878k
    // of the 1.13M sharing pairs (22% pruned — flat weights decay too
    // slowly for the suffix bound) and its verification join exploded
    // candidates×terms to 45M rows (8 s); the map-carry fold variant
    // ran interpreted decimal rounding per element (34 s). The direct
    // join is the plan that wins whenever the filter can't prune an
    // order of magnitude; [[allPairsCosine]] + AllPairsCosineSpec keep
    // the prefix-filtered path honest for true Zipf vocabularies where
    // it does. Per-term work is df(t)² with max df 25 at sf0.1 — no
    // skewed key; the term join shuffles both sides by term, the
    // aggregate by pair, and nothing touches the driver.
    nw.select($"doc_id".as("doc_a"), $"term", $"w".as("wa"))
      .join(nw.select($"doc_id".as("doc_b"), $"term", $"w".as("wb")), "term")
      .where($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(sum(round($"wa" * $"wb", 9).cast("decimal(28,12)"))
        .cast("double").as("dot"))
      .where($"dot" >= AllPairsThreshold)
      .select($"doc_a", $"doc_b", round($"dot", 6).as("cosine"))
  }

  /** Oracle for gram order g: identical n-gram, weight, norm, and
    * decimal-dot pipeline. The dir-threaded oracle map passes the g
    * [[allPairsGramOrder]] derived for that collection.
    */
  def allPairsCosineSql(g: Int): String = {
    val gram = (0 until g).map(j => if (j == 0) "t[i]" else s"t[i+$j]")
      .mkString(" || ' ' || ")
    s"""WITH toks AS (
       |  SELECT doc_id, $duckTokensExpr AS t FROM documents),
       |bg AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t) - ${g - 2}),
       |    i -> $gram)) AS term
       |  FROM toks WHERE len(t) >= $g),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM bg GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |wgt AS (
       |  SELECT tf.doc_id, tf.term,
       |    round(tf.tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE)
       |      / dfreq.df), 6) AS w
       |  FROM tf JOIN dfreq ON tf.term = dfreq.term),
       |norms AS (
       |  SELECT doc_id,
       |    sqrt(CAST(sum(CAST(round(w * w, 9) AS DECIMAL(28,12))) AS DOUBLE))
       |      AS nrm
       |  FROM wgt GROUP BY doc_id),
       |nw AS (
       |  SELECT w.doc_id, w.term, w.w / n.nrm AS w
       |  FROM wgt w JOIN norms n ON w.doc_id = n.doc_id
       |  WHERE n.nrm > 0),
       |dots AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(sum(CAST(round(a.w * b.w, 9) AS DECIMAL(28,12))) AS DOUBLE)
       |      AS dot
       |  FROM nw a JOIN nw b ON a.term = b.term AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, round(dot, 6) AS cosine
       |FROM dots WHERE dot >= $AllPairsThreshold""".stripMargin
  }

  /** Reciprocal-rank fusion (k = 60) of two retrieval systems over the
    * same derived 3-term query: the BM25 top-20 ([[bm25TopDocs]]) and a
    * plain TF-IDF term-match top-20 — the hybrid-search merge step
    * every production retrieval stack runs (lexical + second scorer,
    * fused by rank, scores never compared across systems). Rank lists
    * are top-k-bounded frames, so the fusion join is k-row work
    * regardless of corpus size; RRF arithmetic is two double divisions
    * by integer ranks and ONE two-term addition stated in the same
    * order on both engines (two-operand IEEE addition has no
    * order-of-summation ambiguity).
    */
  def rrfFusion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val a = bm25TopDocs(s, dir).select($"doc_id", $"rn".as("rank_bm25"))
    val toks = tokens(Tables.documents(s, dir))
    val tf = toks.groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    val nDocs = toks.select($"doc_id").distinct()
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val qterms = toks.groupBy($"word").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"word").limit(3).select($"word")
    val wb = Window.partitionBy(lit(1)).orderBy($"tscore".desc, $"doc_id")
    val b = tf.join(broadcast(qterms), "word")
      .join(dfreq, "word")
      .crossJoin(broadcast(nDocs))
      .withColumn("st",
        round($"tf" * log($"n_docs" / $"df"), 6).cast("decimal(18,6)"))
      .groupBy($"doc_id").agg(sum($"st").cast("double").as("tscore"))
      .withColumn("rank_tfidf", row_number().over(wb))
      .where($"rank_tfidf" <= 20)
      .select($"doc_id", $"rank_tfidf")
    a.join(b, Seq("doc_id"), "full_outer")
      .select($"doc_id",
        $"rank_bm25".cast("long").as("rank_bm25"),
        $"rank_tfidf".cast("long").as("rank_tfidf"),
        round(
          coalesce(lit(1.0) / (lit(60) + $"rank_bm25"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + $"rank_tfidf"), lit(0.0)), 6)
          .as("rrf"))
  }

  val rrfFusionSql: String =
    s"""WITH a AS (SELECT doc_id, rn AS rank_bm25 FROM ($bm25TopDocsSql)),
       |toks AS (
       |  SELECT doc_id, word FROM (
       |    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\W+')) AS word
       |    FROM documents) WHERE word <> ''),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
       |nd AS (
       |  SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM toks),
       |qterms AS (
       |  SELECT word FROM (
       |    SELECT word, count(*) AS c FROM toks GROUP BY 1
       |    ORDER BY c DESC, word LIMIT 3)),
       |b AS (
       |  SELECT doc_id, rank_tfidf FROM (
       |    SELECT doc_id,
       |      row_number() OVER (ORDER BY tscore DESC, doc_id) AS rank_tfidf
       |    FROM (
       |      SELECT tf.doc_id, CAST(sum(st) AS DOUBLE) AS tscore FROM (
       |        SELECT tf.doc_id,
       |          CAST(round(tf.tf * ln(nd.n_docs / dfreq.df), 6)
       |            AS DECIMAL(18,6)) AS st
       |        FROM tf
       |        JOIN qterms ON qterms.word = tf.word
       |        JOIN dfreq ON dfreq.word = tf.word
       |        CROSS JOIN nd) tf
       |      GROUP BY doc_id))
       |  WHERE rank_tfidf <= 20)
       |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       |  CAST(rank_bm25 AS BIGINT) AS rank_bm25,
       |  CAST(rank_tfidf AS BIGINT) AS rank_tfidf,
       |  round(
       |    coalesce(CAST(1.0 AS DOUBLE) / (60 + rank_bm25), 0.0) +
       |    coalesce(CAST(1.0 AS DOUBLE) / (60 + rank_tfidf), 0.0), 6) AS rrf
       |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id""".stripMargin

  /** Maximal duplicated-substring SPANS per document — the exact
    * substring-level dedup decision (which character ranges to CUT, not
    * just how duplicated a doc is): `doc_dup_ngram_mass` scores grams
    * individually; this operator merges the duplicated 8-gram start
    * positions into maximal contiguous regions, which is what a
    * suffix-array pass produces and what an excision step consumes.
    *
    * Pipeline: positional 8-grams (narrow explode) → gram→distinct-doc
    * counts (one map-side-combinable aggregate on 8-byte md5-60 keys)
    * → join back → keep positions whose gram repeats across docs →
    * gaps-and-islands per doc (lag + running break-count windows, both
    * on the SAME doc_id-keyed exchange) → one span row per island →
    * per-doc rollup. Two kept starts belong to one span iff they are
    * ≤ 8 apart (their 8-token windows overlap or touch), so a span of
    * starts [i_first..i_last] covers i_last − i_first + 8 tokens.
    * Per-doc window state is bounded by the doc's own gram count and
    * every shuffle key is either an 8-byte hash or doc_id — the same
    * O(total tokens) shape as the gram-mass scorer, nothing pairwise.
    * Docs with no duplicated span surface with zeros via the left join
    * (the excision step must see "keep whole doc" rows too).
    */
  def dupSpans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, dir)
      .selectExpr("doc_id", s"$tokensExpr AS toks")
    val grams = toks.where("size(toks) >= 8")
      .selectExpr("doc_id", "size(toks) AS n_tokens",
        """posexplode(transform(sequence(0, size(toks) - 8),
          |  i -> array_join(slice(toks, i + 1, 8), ' ')))
          |  AS (i, gram)""".stripMargin)
      .select($"doc_id", $"n_tokens", $"i",
        conv(substring(md5($"gram"), 1, 15), 16, 10).cast("long").as("h"))
    val gramDocs = grams.groupBy($"h")
      .agg(countDistinct($"doc_id").as("n_docs"))
    val byPos = Window.partitionBy($"doc_id").orderBy($"i")
    val spans = grams.join(gramDocs.where($"n_docs" >= 2), "h")
      .withColumn("brk",
        when(lag($"i", 1).over(byPos).isNull ||
          $"i" - lag($"i", 1).over(byPos) > 8, 1L).otherwise(0L))
      .withColumn("island", sum($"brk").over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"doc_id", $"n_tokens", $"island")
      .agg((max($"i") - min($"i") + 8).as("span_len"))
      .groupBy($"doc_id", $"n_tokens")
      .agg(count(lit(1)).as("n_spans"), sum($"span_len").as("dup_tokens"))
    toks.select($"doc_id", size($"toks").as("n_tokens"))
      .join(spans.drop("n_tokens"), Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        coalesce($"n_spans", lit(0L)).as("n_spans"),
        coalesce($"dup_tokens", lit(0L)).as("dup_tokens"))
      .withColumn("dup_frac", round(
        $"dup_tokens".cast("double") / greatest($"n_tokens", lit(1L)), 6))
  }

  val dupSpansSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, $duckTokensExpr AS t FROM documents),
       |grams AS (
       |  SELECT doc_id, len(t) AS n_tokens, i,
       |    CAST(('0x' || substring(md5(gram), 1, 15)) AS BIGINT) AS h
       |  FROM (
       |    SELECT doc_id, t, unnest(range(0, len(t) - 7)) AS i
       |    FROM toks WHERE len(t) >= 8) p
       |  CROSS JOIN LATERAL
       |    (SELECT array_to_string(t[i+1:i+8], ' ') AS gram) g),
       |gd AS (
       |  SELECT h FROM grams GROUP BY h
       |  HAVING count(DISTINCT doc_id) >= 2),
       |kept AS (
       |  SELECT g.doc_id, g.n_tokens, g.i,
       |    CASE WHEN lag(g.i) OVER w IS NULL
       |      OR g.i - lag(g.i) OVER w > 8 THEN 1 ELSE 0 END AS brk
       |  FROM grams g JOIN gd USING (h)
       |  WINDOW w AS (PARTITION BY g.doc_id ORDER BY g.i)),
       |islands AS (
       |  SELECT doc_id, n_tokens,
       |    sum(brk) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS UNBOUNDED PRECEDING) AS island, i
       |  FROM kept),
       |spans AS (
       |  SELECT doc_id, n_tokens, island,
       |    max(i) - min(i) + 8 AS span_len
       |  FROM islands GROUP BY 1, 2, 3),
       |per_doc AS (
       |  SELECT doc_id, count(*) AS n_spans, sum(span_len) AS dup_tokens
       |  FROM spans GROUP BY 1)
       |SELECT tk.doc_id, len(tk.t) AS n_tokens,
       |  coalesce(p.n_spans, 0) AS n_spans,
       |  CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |  round(CAST(coalesce(p.dup_tokens, 0) AS DOUBLE)
       |    / greatest(len(tk.t), 1), 6) AS dup_frac
       |FROM toks tk LEFT JOIN per_doc p USING (doc_id)""".stripMargin

  /** Per-document unigram (Shannon) entropy in nats — the vocabulary-
    * concentration quality signal that separates natural prose from
    * keyword stuffing / boilerplate loops, complementing
    * [[docTokenStats]]'s type-token ratio (TTR says HOW MANY distinct
    * tokens; entropy says how evenly mass spreads over them). Computed
    * as H = ln(n) − (Σ c·ln c)/n so the data-dependent part is one sum
    * over per-(doc, token) counts; each c·ln c term is 6-dp-rounded
    * into DECIMAL(18,9) before summing (the [[docLmNll]] convention —
    * partition-order-proof, which raw double summation is not), and the
    * closing expression is the same IEEE op sequence on both engines.
    * Shape: one explode + one (doc, word) count aggregate + one doc
    * aggregate — everything map-side-combinable, nothing pairwise.
    */
  def docEntropy(s: SparkSession, dir: String): DataFrame =
    entropyOf(Tables.documents(s, dir))

  /** Entropy over any (doc_id, text) frame — factored for
    * planted-fixture specs.
    */
  def entropyOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .selectExpr("doc_id", s"$tokensExpr AS toks")
      .where("size(toks) > 0")
      .selectExpr("doc_id", "CAST(size(toks) AS BIGINT) AS n", "explode(toks) AS w")
      .groupBy($"doc_id", $"n", $"w").agg(count(lit(1)).as("c"))
      .select($"doc_id", $"n",
        round($"c".cast("double") * log($"c".cast("double")), 6)
          .cast("decimal(18,9)").as("clc"))
      .groupBy($"doc_id", $"n")
      .agg(count(lit(1)).as("n_distinct"), sum($"clc").as("s"))
      .selectExpr("doc_id", "n AS n_tokens", "n_distinct",
        """floor((ln(CAST(n AS DOUBLE)) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          |  * 1e6 + 0.5) / 1e6 AS entropy""".stripMargin)
  }

  val docEntropySql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, $duckTokensExpr AS t FROM documents),
       |f AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n, unnest(t) AS w
       |  FROM toks WHERE len(t) > 0),
       |c AS (
       |  SELECT doc_id, n, w, count(*) AS c FROM f GROUP BY 1, 2, 3),
       |s AS (
       |  SELECT doc_id, n, CAST(count(*) AS BIGINT) AS n_distinct,
       |    sum(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 6)
       |      AS DECIMAL(18,9))) AS s
       |  FROM c GROUP BY 1, 2)
       |SELECT doc_id, n AS n_tokens, n_distinct,
       |  floor((ln(CAST(n AS DOUBLE)) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       |    * 1e6 + 0.5) / 1e6 AS entropy
       |FROM s""".stripMargin

  /** Zipf rank-frequency fit over the corpus vocabulary: least-squares
    * slope/intercept of ln(freq) on ln(rank) for the top [[ZipfK]]
    * terms — the corpus-health scalar (natural text ≈ −1; a flat or
    * cliff-shaped curve flags templated/synthetic sources). The
    * wordcount is the map-side-combinable aggregate; only the
    * [[ZipfK]]-row head (deterministic (freq desc, word) order) enters
    * the regression, so the rank window and the five regression sums
    * run on a bounded frame. Each ln-space term is 6-dp-rounded into
    * DECIMAL(18,9) before summing (partition-order-proof); the
    * closed-form slope/intercept are stated with the same IEEE op
    * sequence on both engines.
    */
  val ZipfK = 100

  def zipfFit(s: SparkSession, dir: String): DataFrame =
    zipfFitOf(Tables.documents(s, dir))

  /** Zipf fit over any frame with a `text` column — factored for
    * planted-fixture specs.
    */
  def zipfFitOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val freq = docs
      .selectExpr(s"explode($tokensExpr) AS w")
      .groupBy($"w").agg(count(lit(1)).as("f"))
      .orderBy($"f".desc, $"w".asc).limit(ZipfK)
    val terms = freq
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"f".desc, $"w".asc)))
      .selectExpr(
        "CAST(round(ln(CAST(r AS DOUBLE)), 6) AS DECIMAL(18,9)) AS x",
        "CAST(round(ln(CAST(f AS DOUBLE)), 6) AS DECIMAL(18,9)) AS y")
      .selectExpr("x", "y",
        "CAST(round(CAST(x * y AS DOUBLE), 6) AS DECIMAL(18,9)) AS xy",
        "CAST(round(CAST(x * x AS DOUBLE), 6) AS DECIMAL(18,9)) AS xx")
    terms.agg(count(lit(1)).as("k"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"xy").as("sxy"), sum($"xx").as("sxx"))
      .selectExpr("k",
        """floor((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
          |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |  / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
          |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |  * 1e6 + 0.5) / 1e6 AS slope""".stripMargin,
        """floor((CAST(sy AS DOUBLE)
          |    - (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
          |       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |      / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
          |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |      * CAST(sx AS DOUBLE))
          |  / CAST(k AS DOUBLE) * 1e6 + 0.5) / 1e6 AS intercept""".stripMargin)
  }

  val zipfFitSql: String =
    s"""WITH wc AS (
       |  SELECT w, count(*) AS f
       |  FROM (SELECT unnest($duckTokensExpr) AS w FROM documents)
       |  GROUP BY 1),
       |head AS (
       |  SELECT w, f, row_number() OVER (ORDER BY f DESC, w ASC) AS r
       |  FROM wc ORDER BY f DESC, w ASC LIMIT $ZipfK),
       |t0 AS (
       |  SELECT CAST(round(ln(CAST(r AS DOUBLE)), 6) AS DECIMAL(18,9)) AS x,
       |    CAST(round(ln(CAST(f AS DOUBLE)), 6) AS DECIMAL(18,9)) AS y
       |  FROM head),
       |t AS (
       |  SELECT x, y,
       |    CAST(round(CAST(x * y AS DOUBLE), 6) AS DECIMAL(18,9)) AS xy,
       |    CAST(round(CAST(x * x AS DOUBLE), 6) AS DECIMAL(18,9)) AS xx
       |  FROM t0),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k,
       |    sum(x) AS sx, sum(y) AS sy, sum(xy) AS sxy, sum(xx) AS sxx
       |  FROM t)
       |SELECT k,
       |  floor((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |    / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |    * 1e6 + 0.5) / 1e6 AS slope,
       |  floor((CAST(sy AS DOUBLE)
       |      - (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
       |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |        / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
       |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |        * CAST(sx AS DOUBLE))
       |    / CAST(k AS DOUBLE) * 1e6 + 0.5) / 1e6 AS intercept
       |FROM g""".stripMargin

  /** Per-source discriminative terms by chi-square — the "what makes
    * this source different" report (and the classical feature-selection
    * statistic for text classifiers). For each (term, source) cell with
    * the term PRESENT in the source (the report form — absent cells
    * measure anti-association, not what characterizes the source) the
    * 2×2 contingency table over DOCUMENT frequencies is
    * a = df(term, source), b = df(term) − a, c = docs(source) − a,
    * d = N − df(term) − docs(source) + a, and
    * χ² = N·(ad − bc)² / (df·(N−df)·docs·(N−docs)).
    * Scale shape: one distinct (doc, term) explode → one vocab-bounded
    * (term, source) count (map-side combinable) → joins against three
    * SMALL frames (per-term totals: |vocab| rows; per-source totals and
    * the 1-row N: broadcast). Terms present in every document are
    * excluded (zero discrimination, and the d/N−df factors vanish).
    * The statistic is evaluated in DOUBLE with the identical IEEE op
    * sequence in both engines and pinned to integer micro-units for
    * ordering; top-5 per source rides the custom bounded-heap
    * TopKPerKey operator (third production use) with the struct
    * (χ²-micros, term) order key — heap-streamed, never a full
    * per-source sort.
    */
  def chi2Terms(s: SparkSession, dir: String): DataFrame =
    chi2TermsOf(Tables.documents(s, dir))

  /** Chi-square terms over any (doc_id, source, text) frame — factored
    * for planted-fixture specs.
    */
  def chi2TermsOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val docTerm = docs
      .selectExpr("doc_id", "source", s"explode($tokensExpr) AS term")
      .distinct()
    val dfts = docTerm.groupBy($"term", $"source")
      .agg(count(lit(1)).as("a"))
    val dft = docTerm.groupBy($"term").agg(count(lit(1)).as("df_total"))
    val docsPerSource = docs.groupBy($"source").agg(count(lit(1)).as("docs_s"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = dfts
      .join(dft, "term")
      .join(docsPerSource, "source")
      .crossJoin(broadcast(n))
      .where($"df_total" < $"n_docs")
      .selectExpr("source", "term", "a", "df_total",
        """CAST(floor(
          |  CAST(n_docs AS DOUBLE)
          |    * (CAST(a AS DOUBLE) * CAST(n_docs - df_total - docs_s + a AS DOUBLE)
          |       - CAST(df_total - a AS DOUBLE) * CAST(docs_s - a AS DOUBLE))
          |    * (CAST(a AS DOUBLE) * CAST(n_docs - df_total - docs_s + a AS DOUBLE)
          |       - CAST(df_total - a AS DOUBLE) * CAST(docs_s - a AS DOUBLE))
          |    / (CAST(df_total AS DOUBLE) * CAST(n_docs - df_total AS DOUBLE)
          |       * CAST(docs_s AS DOUBLE) * CAST(n_docs - docs_s AS DOUBLE))
          |  * 1e6 + 0.5) AS BIGINT) AS chi2_micro""".stripMargin)
      .withColumn("ord", struct($"chi2_micro", $"term"))
    graft.plans.TopKPerKey.topKPerKey(scored, Seq("source"), "ord", 5)
      .selectExpr("source", "term", "a AS df_in_source", "df_total",
        "CAST(chi2_micro AS DOUBLE) / 1e6 AS chi2")
  }

  val chi2TermsSql: String =
    s"""WITH dt AS (
       |  SELECT DISTINCT doc_id, source, unnest($duckTokensExpr) AS term
       |  FROM documents),
       |dfts AS (
       |  SELECT term, source, CAST(count(*) AS BIGINT) AS a
       |  FROM dt GROUP BY 1, 2),
       |dft AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df_total
       |  FROM dt GROUP BY 1),
       |ds AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS docs_s
       |  FROM documents GROUP BY 1),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |scored AS (
       |  SELECT f.source, f.term, f.a, t.df_total,
       |    CAST(floor(
       |      CAST(n.n_docs AS DOUBLE)
       |        * (CAST(f.a AS DOUBLE)
       |             * CAST(n.n_docs - t.df_total - s.docs_s + f.a AS DOUBLE)
       |           - CAST(t.df_total - f.a AS DOUBLE)
       |             * CAST(s.docs_s - f.a AS DOUBLE))
       |        * (CAST(f.a AS DOUBLE)
       |             * CAST(n.n_docs - t.df_total - s.docs_s + f.a AS DOUBLE)
       |           - CAST(t.df_total - f.a AS DOUBLE)
       |             * CAST(s.docs_s - f.a AS DOUBLE))
       |        / (CAST(t.df_total AS DOUBLE)
       |             * CAST(n.n_docs - t.df_total AS DOUBLE)
       |           * CAST(s.docs_s AS DOUBLE)
       |             * CAST(n.n_docs - s.docs_s AS DOUBLE))
       |      * 1e6 + 0.5) AS BIGINT) AS chi2_micro
       |  FROM dfts f
       |  JOIN dft t ON t.term = f.term
       |  JOIN ds s ON s.source = f.source
       |  CROSS JOIN nn n
       |  WHERE t.df_total < n.n_docs)
       |SELECT source, term, a AS df_in_source, df_total,
       |  CAST(chi2_micro AS DOUBLE) / 1e6 AS chi2
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY source
       |    ORDER BY chi2_micro DESC, term DESC) AS rn
       |  FROM scored)
       |WHERE rn <= 5""".stripMargin

  /** Flesch readability — reading ease + Flesch–Kincaid grade from
    * three regex counts (words, sentence terminators, vowel groups as
    * the classic syllable heuristic). Pure per-row map over codegen'd
    * regexp functions — zero shuffles, the cheapest quality signal in
    * the family. Both engines count with the same patterns ([.!?]+
    * terminator runs, [aeiouy]+ vowel groups — greedy runs, identical
    * under Java regex and RE2), take the two ratios in DOUBLE with the
    * identical op sequence, and pin 6 dp via the floor convention.
    * Sentence count floors at 1 so terminator-free text (all of the
    * synthetic corpus) degrades to words-per-doc rather than dividing
    * by zero; the planted-prose spec exercises real multi-sentence
    * arithmetic.
    */
  def readability(s: SparkSession, dir: String): DataFrame =
    readabilityOf(Tables.documents(s, dir))

  def readabilityOf(docs: DataFrame): DataFrame =
    docs
      .selectExpr("doc_id",
        s"CAST(size($tokensExpr) AS BIGINT) AS n_words",
        """CAST(greatest(1, size(regexp_extract_all(text, '[.!?]+', 0)))
          |  AS BIGINT) AS n_sentences""".stripMargin,
        """CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0))
          |  AS BIGINT) AS n_syllables""".stripMargin)
      .where("n_words > 0")
      .selectExpr("doc_id", "n_words", "n_sentences", "n_syllables",
        """floor((CAST(206.835 AS DOUBLE)
          |  - CAST(1.015 AS DOUBLE)
          |    * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
          |  - CAST(84.6 AS DOUBLE)
          |    * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
          |  * 1e6 + 0.5) / 1e6 AS flesch_ease""".stripMargin,
        """floor((CAST(0.39 AS DOUBLE)
          |    * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
          |  + CAST(11.8 AS DOUBLE)
          |    * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
          |  - CAST(15.59 AS DOUBLE))
          |  * 1e6 + 0.5) / 1e6 AS fk_grade""".stripMargin)

  val readabilitySql: String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |    CAST(len($duckTokensExpr) AS BIGINT) AS n_words,
       |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
       |      AS BIGINT) AS n_sentences,
       |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
       |      AS BIGINT) AS n_syllables
       |  FROM documents)
       |SELECT doc_id, n_words, n_sentences, n_syllables,
       |  floor((CAST(206.835 AS DOUBLE)
       |    - CAST(1.015 AS DOUBLE)
       |      * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
       |    - CAST(84.6 AS DOUBLE)
       |      * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
       |    * 1e6 + 0.5) / 1e6 AS flesch_ease,
       |  floor((CAST(0.39 AS DOUBLE)
       |      * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
       |    + CAST(11.8 AS DOUBLE)
       |      * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
       |    - CAST(15.59 AS DOUBLE))
       |    * 1e6 + 0.5) / 1e6 AS fk_grade
       |FROM base WHERE n_words > 0""".stripMargin

  /** Per-document 8-gram novelty — what fraction of a document's
    * distinct shingles appear in NO earlier document (doc_id order =
    * ingestion order). The corpus-freshness signal dual to
    * [[dupNgramMass]]: dup-mass asks "is this text repeated anywhere",
    * novelty asks "did this document add anything new" — the curve of
    * per-source novelty over ingestion is how corpus builders detect a
    * crawl going stale. First-seer = min(doc_id) per gram: one
    * map-side-combinable MIN over the same md5-60 gram keys the dup
    * family ships (8-byte shuffle rows), one join back, one per-doc
    * count — O(total grams), nothing pairwise, no ordering dependence
    * (MIN is associative; "earlier" never needs a sort).
    */
  def docNovelty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = Tables.documents(s, dir)
      .selectExpr("doc_id", s"$tokensExpr AS toks")
      .where("size(toks) >= 8")
      .selectExpr("doc_id",
        """explode(transform(sequence(0, size(toks) - 8),
          |  i -> array_join(slice(toks, i + 1, 8), ' '))) AS gram""".stripMargin)
      .select($"doc_id",
        conv(substring(md5($"gram"), 1, 15), 16, 10).cast("long").as("h"))
      .distinct()
    val firstSeen = grams.groupBy($"h").agg(min($"doc_id").as("first_doc"))
    grams.join(firstSeen, "h")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_distinct_grams"),
        sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", expr(
        "floor(CAST(n_novel AS DOUBLE) / n_distinct_grams * 1e6 + 0.5) / 1e6"))
  }

  val docNoveltySql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, $duckTokensExpr AS t FROM documents),
       |grams AS (
       |  SELECT DISTINCT doc_id,
       |    CAST(('0x' || substring(md5(gram), 1, 15)) AS BIGINT) AS h
       |  FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(0, len(t) - 7),
       |        i -> array_to_string(t[i+1:i+8], ' '))) AS gram
       |    FROM toks WHERE len(t) >= 8)),
       |fs AS (SELECT h, min(doc_id) AS first_doc FROM grams GROUP BY h)
       |SELECT g.doc_id, count(*) AS n_distinct_grams,
       |  CAST(sum(CASE WHEN fs.first_doc = g.doc_id THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_novel,
       |  floor(CAST(sum(CASE WHEN fs.first_doc = g.doc_id THEN 1 ELSE 0 END)
       |    AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS novelty
       |FROM grams g JOIN fs ON fs.h = g.h
       |GROUP BY g.doc_id""".stripMargin

  // --------------------------------------------- RAKE keyphrase mining

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    * are maximal stopword-free token runs; each member word accrues
    * freq += 1 and degree += phrase_length per occurrence; word score =
    * degree/freq; phrase score = Σ member word scores (with
    * multiplicity). Corpus-level top 20 phrases by (score DESC, phrase)
    * — a total order.
    *
    * Cross-engine exactness: the only division happens per WORD and is
    * immediately floor-rounded into integer micro-units
    * (floor(degree/freq·1e6 + 0.5) as BIGINT), so every downstream
    * aggregate — phrase scores, occurrence counts — is an exact integer
    * sum in both engines; the double reappears only in the final
    * /1e6 display division.
    *
    * Scale shape: phrase segmentation is a per-doc window (partition =
    * doc_id — million-way parallel, never global); word stats shuffle
    * on the word key (vocabulary-bounded); phrase rollup shuffles on
    * the phrase text (output-bounded); the global top-20 is a
    * TakeOrderedAndProject, not a sort.
    */
  val RakeStops = Seq("the", "a", "of", "and", "to")

  def rakePhrases(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val stopList = RakeStops.map(w => s"'$w'").mkString(", ")
    val toks = Tables.documents(s, dir)
      .selectExpr("doc_id", s"posexplode(${tokensExpr}) AS (pos, word)")
      .selectExpr("doc_id", "pos", "word",
        s"CAST(word IN ($stopList) AS INT) AS is_stop")
    val runs = toks
      .withColumn("run", sum($"is_stop").over(
        Window.partitionBy($"doc_id").orderBy($"pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where($"is_stop" === 0)
      .select($"doc_id", $"run", $"pos", $"word")
    val phraseLen = runs.groupBy($"doc_id", $"run")
      .agg(count(lit(1)).as("n_words"))
    val wordScores = runs.join(phraseLen, Seq("doc_id", "run"))
      .groupBy($"word")
      .agg(sum($"n_words").as("degree"), count(lit(1)).as("freq"))
      .selectExpr("word",
        "CAST(floor(CAST(degree AS DOUBLE) / freq * 1e6 + 0.5) AS BIGINT) AS w_micro")
    runs.join(wordScores, "word")
      .groupBy($"doc_id", $"run")
      .agg(
        concat_ws(" ", expr("transform(sort_array(collect_list(struct(pos, word))), x -> x.word)"))
          .as("phrase"),
        count(lit(1)).as("n_words"),
        sum($"w_micro").as("score_micro"))
      .groupBy($"phrase")
      .agg(max($"n_words").as("n_words"),
        count(lit(1)).as("n_occurrences"),
        max($"score_micro").as("score_micro"))
      .selectExpr("phrase", "n_words", "n_occurrences",
        "CAST(score_micro AS DOUBLE) / 1e6 AS score")
      .orderBy($"score".desc, $"phrase")
      .limit(20)
  }

  val rakePhrasesSql: String = {
    val stopList = RakeStops.map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, p.i - 1 AS pos, p.w AS word,
       |    CAST(p.w IN ($stopList) AS INTEGER) AS is_stop
       |  FROM (
       |    SELECT doc_id,
       |      unnest(list_transform($duckTokensExpr,
       |        (w, i) -> {'w': w, 'i': i})) AS p
       |    FROM documents)),
       |runs AS (
       |  SELECT doc_id, pos, word,
       |    sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS run
       |  FROM toks QUALIFY is_stop = 0),
       |plen AS (
       |  SELECT doc_id, run, count(*) AS n_words
       |  FROM runs GROUP BY doc_id, run),
       |ws AS (
       |  SELECT word,
       |    CAST(floor(CAST(sum(n_words) AS DOUBLE) / count(*) * 1e6 + 0.5) AS BIGINT) AS w_micro
       |  FROM runs JOIN plen USING (doc_id, run)
       |  GROUP BY word),
       |phrases AS (
       |  SELECT r.doc_id, r.run,
       |    string_agg(r.word, ' ' ORDER BY r.pos) AS phrase,
       |    count(*) AS n_words,
       |    sum(ws.w_micro) AS score_micro
       |  FROM runs r JOIN ws ON ws.word = r.word
       |  GROUP BY r.doc_id, r.run)
       |SELECT phrase,
       |  CAST(max(n_words) AS BIGINT) AS n_words,
       |  CAST(count(*) AS BIGINT) AS n_occurrences,
       |  CAST(max(score_micro) AS DOUBLE) / 1e6 AS score
       |FROM phrases
       |GROUP BY phrase
       |ORDER BY score DESC, phrase
       |LIMIT 20""".stripMargin
  }

  // ------------------------------------------------ Gopher rule battery

  /** The MassiveText/Gopher quality-rule battery (Rae et al. 2021,
    * "Scaling Language Models", table A1), adapted to this corpus's
    * single-line word-soup fixture: the line/paragraph rules are
    * degenerate on newline-free text (covered separately by
    * `doc_repetition_ratio` / `dedup_paragraph`), so the battery keeps
    * the six word-level rules, each emitted as its measured value plus
    * a pass flag, and an overall `keep`:
    *
    *   1. word count within [20, 100000]   (Gopher: [50, 100000]; the
    *      floor is lowered so the fixture's 8–100-word docs exercise
    *      both outcomes)
    *   2. mean word length within [3, 10]
    *   3. ≥ 2 hits from the Gopher stop-word list
    *      {the, be, to, of, and, that, have, with}
    *   4. ≥ 80% of words contain an alphabetic character
    *   5. duplicate-unigram token fraction ≤ 0.6
    *   6. top-bigram token share ≤ 0.20
    *
    * Scale shape: ONE narrow pass — every rule, including the
    * top-bigram share, is computed with array HOFs inside the row
    * (the per-doc O(n²) bigram self-count is bounded by max document
    * tokens, a constant the corpus schema fixes; nothing per-doc ever
    * shuffles). Cross-engine exactness: counts are integers; every
    * ratio is one CAST-to-DOUBLE division performed in the same order
    * in both engines; flag thresholds compare the identical doubles.
    */
  def gopherRules(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .selectExpr("doc_id", "text", s"$tokensExpr AS toks")
      .selectExpr("doc_id", "text", "toks",
        """transform(sequence(1, size(toks) - 1),
          |  i -> concat(toks[i-1], ' ', toks[i])) AS bis""".stripMargin)
      .selectExpr(
        "doc_id",
        "size(toks) AS n_words",
        """CAST(length(regexp_replace(text, '\\s', '')) AS DOUBLE)
          |  / size(toks) AS mean_word_len""".stripMargin,
        """size(filter(array('the','be','to','of','and','that','have','with'),
          |  w -> array_contains(toks, w))) AS stop_hits""".stripMargin,
        """CAST(size(filter(toks, t -> t RLIKE '[a-z]')) AS DOUBLE)
          |  / size(toks) AS alpha_frac""".stripMargin,
        """CAST(size(toks) - size(array_distinct(toks)) AS DOUBLE)
          |  / size(toks) AS dup_unigram_frac""".stripMargin,
        """CAST(array_max(transform(bis,
          |    b -> size(filter(bis, x -> x = b)))) AS DOUBLE)
          |  / size(bis) AS top_bigram_share""".stripMargin)
      .selectExpr("doc_id", "n_words", "mean_word_len", "stop_hits",
        "alpha_frac", "dup_unigram_frac", "top_bigram_share",
        "n_words >= 20 AND n_words <= 100000 AS ok_words",
        "mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS ok_word_len",
        "stop_hits >= 2 AS ok_stops",
        "alpha_frac >= 0.8 AS ok_alpha",
        "dup_unigram_frac <= 0.6 AS ok_dup_unigram",
        "top_bigram_share <= 0.2 AS ok_top_bigram")
      .selectExpr("doc_id", "n_words", "mean_word_len", "stop_hits",
        "alpha_frac", "dup_unigram_frac", "top_bigram_share",
        "ok_words", "ok_word_len", "ok_stops", "ok_alpha",
        "ok_dup_unigram", "ok_top_bigram",
        """ok_words AND ok_word_len AND ok_stops AND ok_alpha
          |  AND ok_dup_unigram AND ok_top_bigram AS keep""".stripMargin)
  }

  val gopherRulesSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, text, $duckTokensExpr AS toks
       |  FROM documents),
       |b2 AS (
       |  SELECT doc_id, text, toks,
       |    list_transform(range(1, len(toks)),
       |      i -> concat(toks[i], ' ', toks[i + 1])) AS bis
       |  FROM base),
       |m AS (
       |  SELECT doc_id,
       |    len(toks) AS n_words,
       |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
       |      / len(toks) AS mean_word_len,
       |    len(list_filter(['the','be','to','of','and','that','have','with'],
       |      w -> list_contains(toks, w))) AS stop_hits,
       |    CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
       |      / len(toks) AS alpha_frac,
       |    CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)
       |      / len(toks) AS dup_unigram_frac,
       |    CAST(list_max(list_transform(bis,
       |        b -> len(list_filter(bis, x -> x = b)))) AS DOUBLE)
       |      / len(bis) AS top_bigram_share
       |  FROM b2)
       |SELECT doc_id, n_words, mean_word_len, stop_hits, alpha_frac,
       |  dup_unigram_frac, top_bigram_share,
       |  n_words >= 20 AND n_words <= 100000 AS ok_words,
       |  mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS ok_word_len,
       |  stop_hits >= 2 AS ok_stops,
       |  alpha_frac >= 0.8 AS ok_alpha,
       |  dup_unigram_frac <= 0.6 AS ok_dup_unigram,
       |  top_bigram_share <= 0.2 AS ok_top_bigram,
       |  ok_words AND ok_word_len AND ok_stops AND ok_alpha
       |    AND ok_dup_unigram AND ok_top_bigram AS keep
       |FROM m""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_gopher_rules" -> (gopherRules _),
    "doc_rake_phrases" -> (rakePhrases _),
    "doc_entropy" -> (docEntropy _),
    "doc_zipf_fit" -> (zipfFit _),
    "doc_chi2_terms" -> (chi2Terms _),
    "doc_readability" -> (readability _),
    "doc_novelty" -> (docNovelty _),
    "doc_dup_spans" -> (dupSpans _),
    "doc_rrf_fusion" -> (rrfFusion _),
    "doc_tfidf_cosine_topk" -> (tfidfCosineTopk _),
    "doc_allpairs_cosine" -> (allPairsNgramCosine _),
    "doc_lm_nll" -> (docLmNll _),
    "doc_lm_kn_nll" -> (docLmKnNll _),
    "doc_ppl_buckets" -> (docPplBuckets _),
    "doc_anonymize" -> (docAnonymize _),
    "doc_tfidf_top_terms" -> (tfidfTopTerms _),
    "doc_bigram_counts" -> (bigramCounts _),
    "doc_pmi_bigrams" -> (pmiBigrams _),
    "doc_dup_ngram_mass" -> (dupNgramMass _),
    "doc_spell_variants" -> (spellVariants _),
    "wordcount" -> (wordCount _),
    "global_count" -> (globalCount _),
    "agg_of_agg" -> (aggOfAgg _),
    "doc_token_stats" -> (docTokenStats _),
    "doc_mattr" -> (docMattr _),
    "doc_quality" -> (docQuality _),
    "doc_langid" -> (docLangId _),
    "doc_fingerprint" -> (docFingerprint _),
    "doc_bm25_topk" -> (bm25TopDocs _),
    "doc_known_item_eval" -> (knownItemEval _),
    "lang_source_dist" -> (langSourceDist _))

  /** Dir-threaded: the AllPairs oracle embeds the gram order derived
    * for that collection ([[Similarity.oracles]] pattern).
    */
  def oracles(dir: String): Map[String, String] = Map(
    "doc_gopher_rules" -> gopherRulesSql,
    "doc_rake_phrases" -> rakePhrasesSql,
    "doc_entropy" -> docEntropySql,
    "doc_zipf_fit" -> zipfFitSql,
    "doc_chi2_terms" -> chi2TermsSql,
    "doc_readability" -> readabilitySql,
    "doc_novelty" -> docNoveltySql,
    "doc_dup_spans" -> dupSpansSql,
    "doc_rrf_fusion" -> rrfFusionSql,
    "doc_known_item_eval" -> knownItemEvalSql,
    "doc_tfidf_cosine_topk" -> tfidfCosineTopkSql,
    "doc_allpairs_cosine" ->
      allPairsCosineSql(allPairsGramOrder(Similarity.activeSession, dir)),
    "doc_lm_nll" -> docLmNllSql,
    "doc_lm_kn_nll" -> docLmKnNllSql,
    "doc_ppl_buckets" -> docPplBucketsSql,
    "doc_anonymize" -> docAnonymizeSql,
    "doc_tfidf_top_terms" -> tfidfSql,
    "doc_bigram_counts" -> bigramCountsSql,
    "doc_pmi_bigrams" -> pmiBigramsSql,
    "doc_dup_ngram_mass" -> dupNgramMassSql,
    "doc_spell_variants" -> spellVariantsSql,
    "wordcount" -> wordCountSql,
    "global_count" -> globalCountSql,
    "agg_of_agg" -> aggOfAggSql,
    "doc_token_stats" -> docTokenStatsSql,
    "doc_mattr" -> docMattrSql,
    "doc_quality" -> docQualitySql,
    "doc_langid" -> docLangIdSql,
    "doc_fingerprint" -> docFingerprintSql,
    "doc_bm25_topk" -> bm25TopDocsSql,
    "lang_source_dist" -> langSourceDistSql)
}
