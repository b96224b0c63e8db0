package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Unigram-language-model tokenizer training (Kudo 2018 — the
  * SentencePiece unigram algorithm), expressed Spark-first. Completes
  * the tokenizer family beside the BPE trainer ([[Bpe]]): BPE grows a
  * vocabulary bottom-up by merging; unigram EM starts from every
  * substring and prunes top-down by usefulness under the model — the
  * algorithm the major open models' tokenizers use.
  *
  * Shape and scale story (same discipline as [[Bpe]]):
  *
  *   - ONE corpus-scale pass folds the corpus to the distinct-word
  *     table (word, freq); the EM loop runs on |V| rows (the fixture's
  *     31; ~10⁸ at web scale), never corpus rows.
  *   - The E-step Viterbi segmentation is a fixed-depth DP over word
  *     positions (maxLen derived from the data, memoized per corpus
  *     fingerprint — the adaptive-gram-order precedent), realized as
  *     ONE narrow projection per iteration: the piece log-probs ride a
  *     broadcast literal map (the model artifact — exactly what
  *     SentencePiece broadcasts to workers), and every b_i / l_i /
  *     backtrace column is a deterministic expression over it.
  *   - The M-step is one explode + integer-sum aggregate (piece counts
  *     are exact BIGINTs); probabilities re-derive as
  *     floor(ln(cnt/total)·1e6+0.5)/1e6 — the ln wobble absorbed the
  *     same way as tf-idf/BM25.
  *
  * Exactness contract: piece counts are integers; log-probs are
  * 6-dp-floored doubles; the DP adds them in the identical order on
  * both engines (candidates enumerated by piece length 1..MaxP, ties
  * at equal score broken toward the SHORTEST final piece); greatest()
  * ignores NULLs identically in Spark and DuckDB (missing piece = NULL
  * candidate = pruned). Single-character pieces are floored at count 1
  * in every M-step so segmentation stays total (the SentencePiece
  * character-coverage rule); multi-character pieces with no Viterbi
  * usage prune to zero and leave the vocabulary — the top-down prune
  * that distinguishes unigram from BPE.
  */
object Unigram {

  /** Maximum piece length seeded from word substrings. */
  val MaxP = 4

  /** E/M cycles after the substring-count seed. */
  val EmIters = 2

  private val lenCache = scala.collection.concurrent.TrieMap
    .empty[String, Int]

  /** Data-derived DP depth: the longest word in the corpus (memoized
    * per corpus fingerprint; the oracle unrolls to the same depth).
    */
  private def maxLen(s: SparkSession, dir: String): Int =
    graft.Memo.capped(lenCache)(Similarity.dataKey(dir, "documents"), {
      import s.implicits._
      Tables.documents(s, dir)
        .selectExpr(s"explode(${TextOps.tokensExpr}) AS word")
        .agg(max(length($"word"))).as[Int].head()
    })

  private def words(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .selectExpr(s"explode(${TextOps.tokensExpr}) AS word")
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .withColumn("wl", length($"word"))
  }

  /** Substring seed counts: every (position, length ≤ MaxP) substring
    * of every word, weighted by word frequency — the standard unigram
    * seed vocabulary.
    */
  private def seed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    words(s, dir)
      .selectExpr("freq",
        s"""explode(flatten(transform(sequence(1, wl), i ->
           |  transform(sequence(1, least($MaxP, wl - i + 1)), l ->
           |    substring(word, i, l))))) AS piece""".stripMargin)
      .groupBy($"piece").agg(sum($"freq").as("cnt"))
  }

  /** 6-dp-floored ln(cnt/total) per piece, collected as the broadcast
    * model artifact (piece-vocabulary-sized, the SentencePiece model).
    */
  private def lpMap(pc: DataFrame): Map[String, Double] = {
    val s = pc.sparkSession
    import s.implicits._
    val total = pc.agg(sum($"cnt").cast("double").as("total"))
    pc.crossJoin(broadcast(total))
      .select($"piece",
        (floor(log($"cnt".cast("double") / $"total") * 1e6 + 0.5) / 1e6)
          .as("lp"))
      .as[(String, Double)].collect().toMap
  }

  /** Viterbi DP + backtrace under the broadcast model: adds columns
    * piece_1..piece_L (the best segmentation's pieces, last-first).
    */
  private def viterbi(w: DataFrame, lp: Map[String, Double], L: Int)
      : DataFrame = {
    val m = typedLit(lp)
    var df = w.withColumn("b_0", lit(0.0))
    for (i <- 1 to L) {
      def cand(l: Int): Column =
        when(lit(i) <= col("wl"),
          col(s"b_${i - l}") +
            try_element_at(m, substring(col("word"), i - l + 1, l)))
      val ls = 1 to math.min(MaxP, i)
      val b = if (ls.size == 1) cand(1) else greatest(ls.map(cand): _*)
      df = df.withColumn(s"b_$i", b)
      var sel: Column = lit(null).cast("int")
      for (l <- ls.reverse)
        sel = when(cand(l) === col(s"b_$i"), lit(l)).otherwise(sel)
      df = df.withColumn(s"l_$i", sel)
    }
    df = df.withColumn("p_1", col("wl"))
    for (k <- 1 to L) {
      var ls: Column = lit(null).cast("int")
      for (j <- 1 to L)
        ls = when(col(s"p_$k") === j, col(s"l_$j")).otherwise(ls)
      df = df.withColumn(s"ls_$k", ls)
        .withColumn(s"piece_$k",
          when(col(s"p_$k") > 0,
            col("word").substr(
              col(s"p_$k") - col(s"ls_$k") + 1, col(s"ls_$k"))))
        .withColumn(s"p_${k + 1}",
          when(col(s"p_$k") > 0, col(s"p_$k") - col(s"ls_$k"))
            .otherwise(lit(0)))
    }
    df
  }

  /** E-step usage counts under the model. */
  private def eCounts(w: DataFrame, lp: Map[String, Double], L: Int)
      : DataFrame = {
    val s = w.sparkSession
    import s.implicits._
    viterbi(w, lp, L)
      .selectExpr("freq",
        s"explode(array(${(1 to L).map(k => s"piece_$k").mkString(", ")})) AS piece")
      .where($"piece".isNotNull)
      .groupBy($"piece").agg(sum($"freq").as("ecnt"))
  }

  /** M-step: re-count against the seed universe; single characters stay
    * alive at count ≥ 1 (coverage rule), unused longer pieces prune.
    */
  private def mStep(seedPc: DataFrame, ec: DataFrame): DataFrame = {
    val s = seedPc.sparkSession
    import s.implicits._
    seedPc.select($"piece")
      .join(ec, Seq("piece"), "left_outer")
      .select($"piece",
        when(length($"piece") === 1,
          greatest(coalesce($"ecnt", lit(0L)), lit(1L)))
          .otherwise(coalesce($"ecnt", lit(0L))).as("cnt"))
      .where($"cnt" > 0)
  }

  private val trainCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), (DataFrame, Map[String, Double], Int)]

  /** Final piece table + model map after [[EmIters]] E/M cycles,
    * memoized per (session, corpus fingerprint).
    */
  private def train(s: SparkSession, dir: String)
      : (DataFrame, Map[String, Double], Int) =
    graft.Memo.cached(trainCache, s,
      Similarity.dataKey(dir, "documents"), "tok_unigram_train") {
      val L = maxLen(s, dir)
      val w = words(s, dir).localCheckpoint()
      val seedPc = seed(s, dir).localCheckpoint()
      var pc = seedPc
      for (_ <- 1 to EmIters)
        pc = mStep(seedPc, eCounts(w, lpMap(pc), L)).localCheckpoint()
      (pc, lpMap(pc), L)
    }

  /** Final unigram vocabulary: (piece, cnt, lp, rn). */
  def unigramEm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val (pc, _, _) = train(s, dir)
    val total = pc.agg(sum($"cnt").cast("double").as("total"))
    val wr = Window.partitionBy(lit(1)).orderBy($"cnt".desc, $"piece")
    pc.crossJoin(broadcast(total))
      .select($"piece", $"cnt",
        (floor(log($"cnt".cast("double") / $"total") * 1e6 + 0.5) / 1e6)
          .as("lp"))
      .withColumn("rn", row_number().over(wr).cast("long"))
  }

  /** Per-word segmentation under the trained model: the tokenizer's
    * actual output table (word, freq, segmentation, n_pieces).
    */
  def unigramSegment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (_, lp, lMax) = train(s, dir)
    val w = words(s, dir)
    viterbi(w, lp, lMax)
      .selectExpr("word", "freq",
        s"""array_join(reverse(filter(
           |  array(${(1 to lMax).map(k => s"piece_$k").mkString(", ")}),
           |  x -> x IS NOT NULL)), ' ') AS segmentation""".stripMargin,
        s"""CAST(size(filter(
           |  array(${(1 to lMax).map(k => s"piece_$k").mkString(", ")}),
           |  x -> x IS NOT NULL)) AS BIGINT) AS n_pieces""".stripMargin)
  }

  // ------------------------------------------------------------- oracle

  private def candSql(i: Int, l: Int, lpCte: String): String =
    s"(CASE WHEN $i <= wl THEN b_${i - l} + (SELECT lp FROM $lpCte " +
      s"WHERE piece = substr(word, ${i - l + 1}, $l)) END)"

  /** The Viterbi layers as nested SELECTs over a word CTE, mirroring
    * [[viterbi]] expression-for-expression.
    */
  private def viterbiSql(fromCte: String, lpCte: String, L: Int): String = {
    var q = s"SELECT word, freq, wl, CAST(0.0 AS DOUBLE) AS b_0 FROM $fromCte"
    for (i <- 1 to L) {
      val ls = 1 to math.min(MaxP, i)
      val cands = ls.map(l => candSql(i, l, lpCte))
      val b = if (ls.size == 1) cands.head
        else s"greatest(${cands.mkString(", ")})"
      q = s"SELECT *, $b AS b_$i FROM ($q)"
      val sel = ls.map(l => s"WHEN ${candSql(i, l, lpCte)} = b_$i THEN $l")
        .mkString(" ")
      q = s"SELECT *, CASE $sel END AS l_$i FROM ($q)"
    }
    q = s"SELECT *, wl AS p_1 FROM ($q)"
    for (k <- 1 to L) {
      val sel = (1 to L).map(j => s"WHEN p_$k = $j THEN l_$j").mkString(" ")
      q = s"SELECT *, CASE $sel END AS ls_$k FROM ($q)"
      q = s"""SELECT *,
         |  CASE WHEN p_$k > 0
         |    THEN substr(word, p_$k - ls_$k + 1, ls_$k) END AS piece_$k,
         |  CASE WHEN p_$k > 0 THEN p_$k - ls_$k ELSE 0 END AS p_${k + 1}
         |FROM ($q)""".stripMargin
    }
    q
  }

  private def lpSql(pcCte: String): String =
    s"""SELECT piece,
       |  floor(ln(CAST(cnt AS DOUBLE) / t.total) * 1e6 + 0.5) / 1e6 AS lp
       |FROM $pcCte, (SELECT CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE)
       |  AS total FROM $pcCte) t""".stripMargin

  /** Shared CTE chain: words, seed, EmIters × (lp, viterbi, counts,
    * m-step). `L` is threaded from the data-derived DP depth.
    */
  private def baseSql(L: Int): String = {
    val chain = new StringBuilder
    chain.append(
      s"""w AS MATERIALIZED (
         |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         |    length(word) AS wl
         |  FROM (SELECT unnest(${TextOps.duckTokensExpr}) AS word
         |        FROM documents)
         |  GROUP BY word),
         |seed AS MATERIALIZED (
         |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece,
         |      freq
         |    FROM (
         |      SELECT word, freq, i, unnest(range(1,
         |        CAST(least($MaxP, wl - i + 1) AS BIGINT) + 1)) AS l
         |      FROM (
         |        SELECT word, freq, wl, unnest(range(1, wl + 1)) AS i
         |        FROM w) a) b) s
         |  GROUP BY piece),
         |pc0 AS (SELECT piece, cnt FROM seed)""".stripMargin)
    for (k <- 0 until EmIters) {
      chain.append(s",\nlp$k AS MATERIALIZED (${lpSql(s"pc$k")})")
      chain.append(
        s""",
           |e$k AS MATERIALIZED (
           |  SELECT word, freq,
           |    ${(1 to L).map(j => s"piece_$j").mkString(", ")}
           |  FROM (${viterbiSql("w", s"lp$k", L)}) v),
           |ec$k AS (
           |  SELECT piece, CAST(sum(freq) AS BIGINT) AS ecnt FROM (
           |    SELECT unnest([${(1 to L).map(j => s"piece_$j").mkString(", ")}]) AS piece,
           |      freq FROM e$k) u
           |  WHERE piece IS NOT NULL GROUP BY piece),
           |pc${k + 1} AS MATERIALIZED (
           |  SELECT piece, cnt FROM (
           |    SELECT s.piece,
           |      CASE WHEN length(s.piece) = 1
           |        THEN greatest(coalesce(e.ecnt, 0), 1)
           |        ELSE coalesce(e.ecnt, 0) END AS cnt
           |    FROM seed s LEFT JOIN ec$k e ON e.piece = s.piece) m
           |  WHERE cnt > 0)""".stripMargin)
    }
    chain.toString
  }

  def unigramEmSql(dir: String): String = {
    // via maxLen (not a raw lenCache apply): a caller asking for the
    // oracle SQL before the Spark side has run in-session gets the
    // depth computed on demand instead of a NoSuchElementException
    val L = maxLen(Similarity.activeSession, dir)
    s"""WITH ${baseSql(L)}
       |SELECT piece, cnt,
       |  floor(ln(CAST(cnt AS DOUBLE) / t.total) * 1e6 + 0.5) / 1e6 AS lp,
       |  CAST(row_number() OVER (ORDER BY cnt DESC, piece) AS BIGINT) AS rn
       |FROM pc$EmIters, (SELECT CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE)
       |  AS total FROM pc$EmIters) t""".stripMargin
  }

  def unigramSegmentSql(dir: String): String = {
    val L = maxLen(Similarity.activeSession, dir)
    s"""WITH ${baseSql(L)},
       |lpf AS MATERIALIZED (${lpSql(s"pc$EmIters")})
       |SELECT word, freq,
       |  array_to_string(list_reverse(list_filter(
       |    [${(1 to L).map(j => s"piece_$j").mkString(", ")}],
       |    x -> x IS NOT NULL)), ' ') AS segmentation,
       |  CAST(len(list_filter(
       |    [${(1 to L).map(j => s"piece_$j").mkString(", ")}],
       |    x -> x IS NOT NULL)) AS BIGINT) AS n_pieces
       |FROM (${viterbiSql("w", "lpf", L)}) v""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tok_unigram_em" -> (unigramEm _),
    "tok_unigram_segment" -> (unigramSegment _))

  /** Dir-threaded: the oracle unrolls to the DP depth derived for that
    * collection (requires the Spark side to have run first in-session,
    * which Verify's query-then-oracle order guarantees).
    */
  def oracles(dir: String): Map[String, String] = {
    val s = Similarity.activeSession
    maxLen(s, dir)
    Map(
      "tok_unigram_em" -> unigramEmSql(dir),
      "tok_unigram_segment" -> unigramSegmentSql(dir))
  }
}
