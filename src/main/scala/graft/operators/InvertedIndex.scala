package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Inverted-index algorithms over the `documents` table that the
  * LSH-sketch dedup family deliberately does NOT cover:
  *
  *   - [[ppjoin]] — EXACT set-similarity self-join via prefix
  *     filtering (the AllPairs / PPJoin family: Bayardo et al. WWW'07,
  *     Xiao et al. WWW'08). MinHash/SimHash trade recall for speed;
  *     this is the lossless counterpart: every shingle-set pair with
  *     Jaccard ≥ τ, no misses, no verification-threshold fuzz — the
  *     algorithm class a pipeline runs when near-dup removal must be
  *     provably complete (compliance strikes, eval decontamination).
  *     The WEIGHTED-cosine member of the same family already lives in
  *     [[TextOps.allPairsCosine]] (suffix-norm bound over tf-idf
  *     vectors); this is the unweighted JACCARD member, whose integer
  *     thresholds make it the one that oracle-compares exactly and
  *     closes a streaming arrival form (`stream_ppjoin`).
  *   - [[phraseSearch]] — positional-inverted-index phrase matching:
  *     the adjacency-join formulation every search engine runs, here
  *     for the corpus's top trigram.
  *
  * Scale design (the reason these are not naive inverted-index joins):
  * a plain posting join explodes on its hottest terms — a boilerplate
  * shingle (licence header, menu chrome) appearing in k documents
  * contributes k² candidate pairs on one catastrophically hot shuffle
  * key. Prefix filtering kills both problems STRUCTURALLY: set
  * elements are globally ordered by ascending document frequency, each
  * document only indexes its p = n − ⌈τ·n⌉ + 1 RAREST elements (its
  * "prefix"), and the candidate join runs prefix-against-prefix. Hot
  * boilerplate terms land in every document's suffix and are never
  * joined on; the hot keys simply do not exist in the join input —
  * unlike [[Dedup.ngramJaccard]]'s plain inverted index, which joins
  * on EVERY shared shingle. The prefix-filtering principle
  * guarantees zero recall loss: if the prefixes of x and y are
  * disjoint, every common token sits in one of the suffixes, so
  * |x∩y| ≤ max(⌈τ|x|⌉, ⌈τ|y|⌉) − 1 < required overlap — i.e. J < τ.
  * Candidates are then verified with one candidate-scoped exact
  * intersection count (integer threshold, no floats until the output
  * column).
  */
object InvertedIndex {

  /** Jaccard threshold as an exact rational (3/5 = 0.6) — every
    * filter below is an integer inequality in these terms, so both
    * engines cut identically with no float epsilon.
    */
  val TauNum = 3
  val TauDen = 5

  /** Row-local tokenize + DISTINCT word-trigram shingle expressions —
    * the dedup family's shingle convention ([[Dedup.ngramJaccard]]'s
    * width and joining), single source of truth shared with the
    * streaming arrival path, which runs them per micro-batch.
    *
    * Shingles, not unigrams, deliberately: this corpus's unigram
    * vocabulary is flat (~31 words — the degenerate case
    * [[TextOps.allPairsNgramCosine]] documents), so unigram token SETS
    * overlap for most document pairs and any set-similarity join's
    * OUTPUT would grow quadratically with corpus size. Trigram sets
    * reflect true duplication: the pair mass tracks the corpus's
    * replica families, not its vocabulary coverage.
    */
  private[graft] val ToksExpr: String =
    """filter(split(lower(text), '\\s+'), t -> t <> '') AS toks"""

  private[graft] val ShingleSetExpr: String =
    """explode(array_distinct(transform(
      |  sequence(1, size(toks) - 2),
      |  i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])))) AS token""".stripMargin

  private def shingleSets(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir), "doc_id")
      .selectExpr("doc_id", ToksExpr)
      .where("size(toks) >= 3")
      .selectExpr("doc_id", ShingleSetExpr)

  /** Exact set-similarity self-join at Jaccard ≥ 3/5 over word-TRIGRAM
    * shingle sets, prefix-filter candidate generation (see object doc):
    *
    *   1. token document frequencies — one hash aggregation;
    *   2. per-document token ranking by (df ASC, token ASC) — a window
    *     partitioned by doc_id, never global;
    *   3. prefix = first n − ⌈τn⌉ + 1 ranked tokens (⌈3n/5⌉ computed
    *     as (3n+4) div 5 — integer, engine-identical);
    *   4. candidates = prefix ⋈ prefix on token, with the size filter
    *     3·max(n_a,n_b) ≤ 5·min(n_a,n_b) applied IN the join (J ≥ τ
    *     forces τ|y| ≤ |x| ≤ |y|/τ, so wildly mismatched sizes never
    *     leave the join);
    *   5. verification = candidate-scoped intersection count, kept iff
    *     8·shared ≥ 3·(n_a + n_b) ⟺ shared/(n_a+n_b−shared) ≥ 3/5.
    *
    * Output (doc_a, doc_b, shared, n_a, n_b, jaccard) — provably equal
    * to the brute-force all-shared-token join the oracle runs, which
    * is exactly the property the correctness gate checks: the prefix
    * filter must lose nothing.
    *
    * At 100 TB: the df table is vocabulary-sized (broadcastable when
    * it fits, an ordinary shuffle join otherwise); the only windows are
    * per-document; the candidate join's keys are by construction the
    * corpus's RAREST tokens, so per-key fan-out is small and cold —
    * the df-ascending order is the skew defense, not a tuning knob.
    */
  def ppjoin(s: SparkSession, dir: String): DataFrame =
    ppjoinFromTokens(s, shingleSets(s, dir))

  /** Core of [[ppjoin]] over ANY (doc_id, token) set frame — the seam
    * the streaming arrival form closes its drained cross-trigger state
    * through (`stream_ppjoin`), so ingest-time dedup provably equals
    * the batch pass. The df ordering, prefix cut, and both integer
    * thresholds all derive from the frame itself.
    */
  private[graft] def ppjoinFromTokens(
      s: SparkSession, tok0: DataFrame): DataFrame = {
    import s.implicits._
    // The shingle expansion feeds FIVE consumers (sizes, dfs, the
    // ranked prefix build, and both sides of the verification join);
    // without a checkpoint each re-runs the documents scan + trigram
    // explode — the single most expensive subtree of the query (guide
    // §1.2: don't recompute what you already have). One materialization,
    // same rows, same algebra.
    val tok = tok0.select($"doc_id", $"token").localCheckpoint()
    val sizes = tok.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val cand = candidatesFromTokens(s, tok, sizes)
    val shared = cand
      .join(tok.toDF("doc_a", "token"), "doc_a")
      .join(tok.toDF("doc_b", "token"), Seq("doc_b", "token"))
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.toDF("doc_a", "n_a"), "doc_a")
      .join(sizes.toDF("doc_b", "n_b"), "doc_b")
      .where($"shared" * (TauNum + TauDen) >= ($"n_a" + $"n_b") * TauNum)
      .selectExpr("doc_a", "doc_b", "shared", "n_a", "n_b",
        "CAST(shared AS DOUBLE) / (n_a + n_b - shared) AS jaccard")
  }

  /** INCREMENTAL PPJoin step — the streaming finalize's per-trigger
    * unit (`stream_ppjoin`): exact thresholded pairs with at least one
    * side among `newIds`, over the CURRENT full token frame
    * (accumulated ∪ this trigger's arrivals).
    *
    * Correctness: a document's shingle set is trigger-complete (the
    * shingling is row-local), so sets never mutate after arrival and a
    * pair's qualification depends only on the two immutable sets —
    * never on when the df order was snapshotted. Both sides' prefixes
    * here derive from THIS frame's df order (one consistent total
    * order per trigger), so the prefix pigeonhole stays lossless; a
    * pair of two OLD docs was generated losslessly at the later doc's
    * own trigger. Each qualifying pair is therefore emitted EXACTLY
    * once — at max(trigger_a, trigger_b) — and the union of per-trigger
    * outputs equals the batch [[ppjoinFromTokens]] under any split
    * (the `ExactSubstrStreamSpec` contract).
    *
    * Scale: the candidate join probes only NEW docs' prefixes against
    * the full prefix index, so per-trigger PAIR work tracks arrivals
    * (new-prefix posting mass), not accumulated pair volume — the
    * difference from re-running the full finalize per close. The df /
    * rank / verify passes remain one linear scan of accumulated state
    * (shuffle-light aggregations), the honest floor for an exact
    * global-df algorithm; a production variant would accrete df counts
    * in the state store instead of rescanning.
    */
  private[graft] def ppjoinNewPairs(s: SparkSession, tok0: DataFrame,
      newIds: DataFrame): DataFrame = {
    import s.implicits._
    val tok = tok0.select($"doc_id", $"token")
    val sizes = tok.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val dfs = tok.groupBy($"token").agg(count(lit(1)).as("df"))
    val ranked = tok.join(dfs, "token").join(sizes, "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"df", $"token")))
      .where($"rn" <= $"n" - expr(s"($TauNum * n + ${TauDen - 1}) div $TauDen") + 1)
      .select($"doc_id", $"token", $"n", $"rn")
      .localCheckpoint() // probed twice: new side + full index side
    val newPre = ranked.join(newIds.select($"doc_id"), "doc_id")
    // ub is symmetric under side swap, so the both-new duplicate rows
    // (each such pair arrives as (a,b) AND (b,a)) agree on every ub and
    // collapse in the min-aggregate
    val cand = newPre.as("a")
      .join(ranked.as("b"),
        $"a.token" === $"b.token" && $"a.doc_id" =!= $"b.doc_id" &&
          $"a.n" * TauNum <= $"b.n" * TauDen &&
          $"b.n" * TauNum <= $"a.n" * TauDen)
      .select(
        least($"a.doc_id", $"b.doc_id").as("doc_a"),
        greatest($"a.doc_id", $"b.doc_id").as("doc_b"),
        when($"a.doc_id" < $"b.doc_id", $"a.n").otherwise($"b.n").as("n_a"),
        when($"a.doc_id" < $"b.doc_id", $"b.n").otherwise($"a.n").as("n_b"),
        (least($"a.rn", $"b.rn") +
          least($"a.n" - $"a.rn", $"b.n" - $"b.rn")).as("ub"))
      .groupBy($"doc_a", $"doc_b", $"n_a", $"n_b")
      .agg(min($"ub").as("ub"))
      .where(expr(s"ub >= ($TauNum * (n_a + n_b) + ${TauNum + TauDen - 1}) " +
        s"div ${TauNum + TauDen}"))
      .select($"doc_a", $"doc_b")
    val shared = cand
      .join(tok.toDF("doc_a", "token"), "doc_a")
      .join(tok.toDF("doc_b", "token"), Seq("doc_b", "token"))
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.toDF("doc_a", "n_a"), "doc_a")
      .join(sizes.toDF("doc_b", "n_b"), "doc_b")
      .where($"shared" * (TauNum + TauDen) >= ($"n_a" + $"n_b") * TauNum)
      .selectExpr("doc_a", "doc_b", "shared", "n_a", "n_b",
        "CAST(shared AS DOUBLE) / (n_a + n_b - shared) AS jaccard")
  }

  /** Prefix-filtered candidate stage with PPJoin's POSITIONAL filter
    * (post size-filter, pre verification) — shared by the full join
    * and the spec, which uses it to assert the filter's completeness
    * AND that it generates strictly fewer candidates than the naive
    * all-shared-token join on a stopword-heavy fixture.
    *
    * Positional filter (the refinement that makes PPJoin more than
    * AllPairs): a shared prefix token at df-order ranks (i, j) bounds
    * the overlap — common tokens before it number ≤ min(i,j) − 1,
    * common tokens from it on number ≤ 1 + min(n_a−i, n_b−j), so
    * o ≤ min(i,j) + min(n_a−i, n_b−j). Every shared prefix token gives
    * a valid bound, so the pair survives only if the MINIMUM bound
    * still reaches the required overlap α = ⌈τ/(1+τ)·(n_a+n_b)⌉ —
    * computed as (3·(n_a+n_b)+7) div 8, integer-exact. The prune is an
    * upper-bound argument, so it can never drop a true pair — which is
    * exactly what the brute-force oracle compare proves corpus-wide.
    */
  private def candidatesFromTokens(
      s: SparkSession, tok: DataFrame, sizes: DataFrame): DataFrame = {
    import s.implicits._
    val dfs = tok.groupBy($"token").agg(count(lit(1)).as("df"))
    val ranked = tok.join(dfs, "token").join(sizes, "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"df", $"token")))
      .where($"rn" <= $"n" - expr(s"($TauNum * n + ${TauDen - 1}) div $TauDen") + 1)
      .select($"doc_id", $"token", $"n", $"rn")
    ranked.as("a")
      .join(ranked.as("b"),
        $"a.token" === $"b.token" && $"a.doc_id" < $"b.doc_id" &&
          $"a.n" * TauNum <= $"b.n" * TauDen &&
          $"b.n" * TauNum <= $"a.n" * TauDen)
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        $"a.n".as("n_a"), $"b.n".as("n_b"),
        (least($"a.rn", $"b.rn") +
          least($"a.n" - $"a.rn", $"b.n" - $"b.rn")).as("ub"))
      .groupBy($"doc_a", $"doc_b", $"n_a", $"n_b")
      .agg(min($"ub").as("ub"))
      .where(expr(s"ub >= ($TauNum * (n_a + n_b) + ${TauNum + TauDen - 1}) " +
        s"div ${TauNum + TauDen}"))
      .select($"doc_a", $"doc_b")
  }

  /** Candidate seam over ANY (doc_id, token) set frame — the spec
    * drives this directly with hand-built frames to pin the filter
    * algebra (df ranks, prefix cut, positional bound) without the
    * shingle step in the way.
    */
  private[operators] def ppjoinCandidates(
      s: SparkSession, tok: DataFrame): DataFrame = {
    import s.implicits._
    candidatesFromTokens(s, tok.select($"doc_id", $"token"),
      tok.groupBy($"doc_id").agg(count(lit(1)).as("n")))
  }

  /** Oracle: the BRUTE-FORCE all-shared-token join with the same
    * integer threshold — deliberately not the prefix-filtered plan, so
    * a green row proves the filter is lossless.
    */
  val ppjoinSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS t
       |  FROM documents),
       |tok AS (
       |  SELECT DISTINCT doc_id, token FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(1, len(t) - 1),
       |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS token
       |    FROM toks WHERE len(t) >= 3)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
       |shared_counts AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, shared, sa.n AS n_a, sb.n AS n_b,
       |  CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
       |FROM shared_counts
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE shared * ${TauNum + TauDen} >= (sa.n + sb.n) * $TauNum""".stripMargin

  // ------------------------------------------------------ phrase search

  /** Positional-inverted-index phrase search: all occurrences of the
    * corpus's most frequent word trigram (ties broken lexicographically
    * — deterministic in both engines), located by the classic
    * adjacency join over (doc_id, pos, token) postings:
    * postings(w₁) ⋈ postings(w₂) on pos+1 ⋈ postings(w₃) on pos+2.
    *
    * The phrase itself is ONE driver-side row (the bounded-collect
    * pattern every model-parameter query here uses); the match join
    * filters the posting table to the three phrase tokens FIRST, so
    * only those postings ever shuffle — at 100 TB the three filtered
    * posting lists are the only moving data, each pushed down to the
    * scan as a token predicate, and the adjacency joins are
    * (doc_id, pos) equi-joins over them. Positions are 1-based (the
    * ExactSubstr convention).
    */
  def phraseSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toksExpr =
      "filter(split(lower(text), '\\\\s+'), t -> t <> '') AS toks"
    val docs = Tables.documents(s, dir).selectExpr("doc_id", toksExpr)
    val top = docs.where("size(toks) >= 3")
      .selectExpr(
        """explode(transform(sequence(1, size(toks) - 2),
          |  i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))) AS g""".stripMargin)
      .groupBy($"g").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"g").limit(1)
      .head().getString(0)
    val Array(w1, w2, w3) = top.split(' ')
    val post = docs
      .selectExpr("doc_id", "posexplode(toks) AS (pos0, token)")
      .select($"doc_id", ($"pos0" + 1).cast("long").as("pos"), $"token")
    val p1 = post.where($"token" === w1).select($"doc_id", $"pos")
    val p2 = post.where($"token" === w2)
      .select($"doc_id", ($"pos" - 1).as("pos"))
    val p3 = post.where($"token" === w3)
      .select($"doc_id", ($"pos" - 2).as("pos"))
    p1.join(p2, Seq("doc_id", "pos")).join(p3, Seq("doc_id", "pos"))
      .select($"doc_id", $"pos".as("match_pos"), lit(top).as("phrase"))
  }

  /** Oracle: same top-trigram selection (count DESC, trigram ASC) and
    * the same three-way positional adjacency join, 1-based positions.
    */
  val phraseSearchSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
      |  FROM documents),
      |tri AS (
      |  SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g, count(*) AS c
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) p
      |  WHERE len(t) >= 3
      |  GROUP BY 1),
      |top AS (
      |  SELECT g, string_split(g, ' ') AS w FROM tri
      |  ORDER BY c DESC, g LIMIT 1),
      |post AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i] AS token
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) p)
      |SELECT p1.doc_id, p1.pos AS match_pos, (SELECT g FROM top) AS phrase
      |FROM post p1
      |JOIN post p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
      |JOIN post p3 ON p3.doc_id = p1.doc_id AND p3.pos = p1.pos + 2
      |WHERE p1.token = (SELECT w[1] FROM top)
      |  AND p2.token = (SELECT w[2] FROM top)
      |  AND p3.token = (SELECT w[3] FROM top)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_ppjoin" -> (ppjoin _),
    "doc_phrase_search" -> (phraseSearch _))

  def oracles: Map[String, String] = Map(
    "dedup_ppjoin" -> ppjoinSql,
    "doc_phrase_search" -> phraseSearchSql)
}
