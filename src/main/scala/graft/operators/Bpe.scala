package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed byte-pair-encoding merge training — the tokenizer-build
  * step of an LLM data pipeline (Sennrich et al. 2016, word-frequency
  * variant), expressed Spark-first.
  *
  * Shape and scale story:
  *
  *   - ONE corpus-scale pass: tokenize + `groupBy(word)` fold the 100 TB
  *     corpus down to the vocabulary table (word, freq). Everything
  *     after runs on |V| rows (~10⁸ at web scale), not corpus rows —
  *     exactly how production BPE trainers stay tractable.
  *   - Each merge iteration is (a) a pair-count aggregate shuffling on
  *     the symbol-pair key, (b) a 1-row argmax broadcast (total order:
  *     count DESC, pair ASC — no arbitrary pick), (c) a narrow
  *     fold-merge map over the vocab. No driver-side loop over data:
  *     the best pair never round-trips through the driver as a value,
  *     it rides a broadcast join.
  *   - The vocab frame is `localCheckpoint`ed each iteration (the HITS
  *     lesson: the chain is consumed twice per level — by the next
  *     pair count and by the reported merge row — so lazy re-execution
  *     would square the work as K grows).
  *
  * Merge application is the greedy left-to-right scan, realized as a
  * left fold that merges `x` into the accumulator's LAST symbol when
  * (last, x) equals the chosen pair. The fold is equivalent to the
  * index scan because a merged symbol `a||b` can never equal `a` (b is
  * non-empty), so a fresh merge can't immediately re-merge. Both
  * engines run the IDENTICAL fold: Spark `aggregate` over the symbol
  * array, DuckDB `list_reduce` over the space-joined symbol string
  * (words are whitespace-split, so ' ' can't occur inside a symbol).
  *
  * Pair counting is position-based (a length-n word yields n-1 pairs,
  * overlapping repeats like "aaa" count (a,a) twice), the reference
  * BPE convention.
  */
object Bpe {

  /** Number of merge iterations both engines unroll. */
  val K = 5

  private def vocab(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .selectExpr(s"explode(${TextOps.tokensExpr}) AS word")
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .selectExpr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1)) AS syms",
        "freq")
  }

  /** All three readouts share one training run: the merge table (one
    * row per iteration) and the final vocab state after all K merges.
    * Memoized per (session, corpus fingerprint) — the localCheckpoint'ed
    * frames are the materialize-once production artifact, same contract
    * as the dedup label memo (stale-proof via the data fingerprint,
    * session-scoped via sessionUUID so a stopped context's pinned
    * blocks are never handed to a new session).
    */
  private val trainCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), (Seq[DataFrame], DataFrame)]

  private def train(s: SparkSession, dir: String): (Seq[DataFrame], DataFrame) =
    graft.Memo.cached(trainCache, s,
      Similarity.dataKey(dir, "documents"), "tok_bpe_train")(trainUncached(s, dir))

  private def trainUncached(s: SparkSession, dir: String): (Seq[DataFrame], DataFrame) = {
    import s.implicits._
    var words = vocab(s, dir).localCheckpoint()
    val merges = (1 to K).map { k =>
      val pairs = words.selectExpr("freq",
        """explode(if(size(syms) < 2, array(),
          |  transform(sequence(1, size(syms) - 1),
          |    i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b)))) AS p"""
          .stripMargin)
        .groupBy($"p.a".as("a"), $"p.b".as("b"))
        .agg(sum($"freq").as("cnt"))
      val best = pairs.orderBy($"cnt".desc, $"a", $"b").limit(1)
        .localCheckpoint()
      words = words.crossJoin(broadcast(best))
        .selectExpr("freq",
          """aggregate(syms, CAST(array() AS ARRAY<STRING>),
            |  (acc, x) -> CASE
            |    WHEN size(acc) > 0 AND element_at(acc, -1) = a AND x = b
            |    THEN concat(slice(acc, 1, size(acc) - 1), array(concat(a, b)))
            |    ELSE concat(acc, array(x)) END) AS syms""".stripMargin)
        .localCheckpoint()
      best.selectExpr(s"$k AS merge_rank", "a AS sym_a", "b AS sym_b",
        "concat(a, b) AS merged", "cnt AS pair_count")
    }
    (merges, words)
  }

  /** Top-K BPE merges: (merge_rank, sym_a, sym_b, merged, pair_count). */
  def bpeMerges(s: SparkSession, dir: String): DataFrame =
    train(s, dir)._1.reduce(_ unionByName _)

  /** Corpus compression readout of the SAME training run: token count
    * under the learned merges vs raw character count, frequency-
    * weighted over the vocabulary (one narrow map + one 1-row
    * aggregate — the "how much did K merges buy" gauge a tokenizer
    * build reports per corpus snapshot).
    */
  def bpeCompression(s: SparkSession, dir: String): DataFrame = {
    val (_, finalVocab) = train(s, dir)
    finalVocab.selectExpr(
      "freq",
      "size(syms) AS n_syms",
      "aggregate(syms, 0, (acc, x) -> acc + length(x)) AS n_chars")
      .selectExpr(
        "CAST(count(*) AS BIGINT) AS n_words",
        "CAST(sum(freq) AS BIGINT) AS n_occurrences",
        "CAST(sum(freq * n_chars) AS BIGINT) AS chars_total",
        "CAST(sum(freq * n_syms) AS BIGINT) AS tokens_total",
        "floor(CAST(sum(freq * n_syms) AS DOUBLE) / sum(freq * n_chars) * 1e6 + 0.5) / 1e6 AS tokens_per_char")
  }

  /** Oracle: the same K iterations unrolled as chained CTEs; the fold
    * runs in `list_reduce` over the space-joined symbol string.
    */
  val bpeMergesSql: String = {
    val base =
      s"""s0 AS (
         |  SELECT list_transform(range(1, length(word) + 1),
         |           i -> substr(word, i, 1)) AS syms,
         |         CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest(${TextOps.duckTokensExpr}) AS word FROM documents)
         |  GROUP BY word)""".stripMargin
    val iters = (1 to K).map { k =>
      val prev = s"s${k - 1}"
      s"""p$k AS (
         |  SELECT p.a AS a, p.b AS b, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq,
         |          unnest(list_transform(range(1, len(syms)),
         |            i -> {'a': syms[i], 'b': syms[i + 1]})) AS p
         |        FROM $prev)
         |  GROUP BY 1, 2),
         |b$k AS (SELECT a, b, cnt FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),
         |s$k AS (
         |  SELECT string_split(list_reduce(syms, (acc, x) -> CASE
         |      WHEN acc = bb.a AND x = bb.b THEN bb.a || bb.b
         |      WHEN right(acc, length(bb.a) + 1) = ' ' || bb.a AND x = bb.b
         |        THEN substr(acc, 1, length(acc) - length(bb.a)) || bb.a || bb.b
         |      ELSE acc || ' ' || x END), ' ') AS syms, freq
         |  FROM $prev, b$k bb)""".stripMargin
    }
    val out = (1 to K).map { k =>
      s"""SELECT $k AS merge_rank, a AS sym_a, b AS sym_b,
         |  a || b AS merged, cnt AS pair_count FROM b$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH ${(base +: iters).mkString(",\n")}\n$out"
  }

  /** Oracle: the same chain, read out at the final vocab state sK. */
  val bpeCompressionSql: String = {
    val base = bpeMergesSql.substring(0, bpeMergesSql.lastIndexOf("\nSELECT 1 AS merge_rank"))
    s"""$base
       |SELECT CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(freq) AS BIGINT) AS n_occurrences,
       |  CAST(sum(freq * n_chars) AS BIGINT) AS chars_total,
       |  CAST(sum(freq * n_syms) AS BIGINT) AS tokens_total,
       |  floor(CAST(sum(freq * n_syms) AS DOUBLE) / sum(freq * n_chars) * 1e6 + 0.5) / 1e6 AS tokens_per_char
       |FROM (
       |  SELECT freq, len(syms) AS n_syms,
       |    list_reduce(list_prepend(0, list_transform(syms, x -> length(x))),
       |      (acc, v) -> acc + v) AS n_chars
       |  FROM s$K)""".stripMargin
  }

  /** Tokenizer fertility by language — symbols emitted per word under
    * the learned merges, the per-language cost metric a multilingual
    * tokenizer eval reports (a language the merges never learned pays
    * more symbols per word). The final vocab state maps back to its
    * source word by concatenating symbols (merging only ever
    * concatenates adjacent symbols, so the round-trip is exact); the
    * per-(lang, word) occurrence counts then join on that word —
    * vocabulary-bounded shuffle, corpus touched once.
    */
  def bpeFertility(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (_, finalVocab) = train(s, dir)
    val vocab = finalVocab.selectExpr(
      "array_join(syms, '') AS word", "size(syms) AS n_syms")
    val langWords = Tables.documents(s, dir)
      .selectExpr("lang", s"explode(${TextOps.tokensExpr}) AS word")
      .groupBy($"lang", $"word").agg(count(lit(1)).as("cnt"))
    langWords.join(vocab, "word")
      .groupBy($"lang")
      .agg(sum($"cnt").as("n_tokens"),
        sum($"cnt" * $"n_syms").as("n_symbols"))
      .selectExpr("lang", "n_tokens", "n_symbols",
        "floor(CAST(n_symbols AS DOUBLE) / n_tokens * 1e6 + 0.5) / 1e6 AS fertility")
  }

  val bpeFertilitySql: String = {
    val base = bpeMergesSql.substring(0, bpeMergesSql.lastIndexOf("\nSELECT 1 AS merge_rank"))
    s"""$base,
       |vocab AS (
       |  SELECT array_to_string(syms, '') AS word, len(syms) AS n_syms
       |  FROM s$K),
       |lw AS (
       |  SELECT lang, word, count(*) AS cnt FROM (
       |    SELECT lang, unnest(${TextOps.duckTokensExpr}) AS word
       |    FROM documents)
       |  GROUP BY 1, 2)
       |SELECT lang,
       |  CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |  CAST(sum(cnt * n_syms) AS BIGINT) AS n_symbols,
       |  floor(CAST(sum(cnt * n_syms) AS DOUBLE) / sum(cnt) * 1e6 + 0.5) / 1e6 AS fertility
       |FROM lw JOIN vocab USING (word)
       |GROUP BY lang""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tok_bpe_merges" -> (bpeMerges _),
    "tok_bpe_compression" -> (bpeCompression _),
    "tok_bpe_fertility" -> (bpeFertility _))

  def oracles: Map[String, String] = Map(
    "tok_bpe_merges" -> bpeMergesSql,
    "tok_bpe_compression" -> bpeCompressionSql,
    "tok_bpe_fertility" -> bpeFertilitySql)
}
