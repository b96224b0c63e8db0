package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Non-negative matrix factorization topic model over the document
  * corpus — the unsupervised "what is this corpus about" readout
  * (topics as additive combinations of terms) beside the hard
  * assignments of `doc_cluster_kmeans`: factor the docs×terms weight
  * matrix V ≈ W·H (W ≥ 0 docs×k, H ≥ 0 k×terms) by Lee–Seung
  * multiplicative updates and report each topic's top terms.
  *
  * Engine-exactness contract (the KMeans/LogReg discipline, hardened):
  *   - V uses a RATIONAL idf — v = tf·(N − df + ½)/(df + ½), 6-dp
  *     floor — so the whole pipeline contains NO transcendental: ln()
  *     is the one primitive whose last ulp is allowed to differ
  *     between engines (the doc_lm_kn_nll 10× incident), and an
  *     iterative factorization would hand any boundary hit 4 rounds of
  *     amplification. Rational ops are correctly-rounded IEEE on both
  *     engines, so V is bit-identical by construction.
  *   - Every update cell is re-quantized with floor(x·1e9+0.5)/1e9;
  *     cross-doc/cross-term sums are 9-dp-rounded products summed as
  *     DECIMAL(18,9) (associative ⇒ partition-order-free and
  *     engine-free); the k-term denominators are written ONCE as
  *     expression strings evaluated verbatim by both engines, so the
  *     double fold is literally the same expression tree.
  *   - Init: W₀ = 1, H₀ = 1 + (md5-hash mod 1000)/1000 per (topic,
  *     term) — symmetry breaking with the conv/md5 idiom both engines
  *     share (graph_node2vec's walk-select precedent).
  *
  * Scale shape: W stays distributed (docs×k, re-keyed by doc_id); H,
  * the grams WᵀW and HHᵀ are k×|vocab| / k² METADATA-sized frames
  * (1-row broadcast crosses — the approved pattern). Per iteration:
  * one join+partial-agg shuffle keyed by word (numerator for H), one
  * keyed by doc_id (numerator for W) — the alternating-least-squares
  * communication shape; localCheckpoint pins per half-step stop the
  * reused-frame plan doubling (the DuckDB-inlining cousin measured on
  * graph_mst). At 100 TB nothing but the two keyed aggregates touches
  * the corpus-sized frames.
  *
  * Reference frame: kafka-storm-starter (reference/) stops at counting
  * words; this is the corpus-semantics layer its wordcount feeds.
  */
object Nmf {

  val Topics = 3
  val VocabSize = 24
  val NmfIters = 4

  private def ts: Seq[Int] = 1 to Topics

  /** 9-dp floor product, decimal-cast for associative summation. */
  private def p9(a: String, b: String): String =
    s"CAST(floor($a * $b * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9))"

  /** H half-step for topic t over columns (h1..hk, nh1..nhk, g{t}{u}):
    * h'ₜ = hₜ · (WᵀV)ₜ / (WᵀW·H)ₜ, 9-dp floor, 0-denominator → 0.
    */
  private def hUpd(t: Int): String = {
    val den = ts.map(u => s"g$t$u * h$u").mkString(" + ")
    s"CASE WHEN ($den) = 0 THEN CAST(0 AS DOUBLE) " +
      s"ELSE floor(h$t * nh$t / ($den) * 1e9 + 0.5) / 1e9 END"
  }

  /** W half-step for topic t over (w1..wk, nw1..nwk, q{t}{u}). */
  private def wUpd(t: Int): String = {
    val den = ts.map(u => s"q$t$u * w$u").mkString(" + ")
    s"CASE WHEN ($den) = 0 THEN CAST(0 AS DOUBLE) " +
      s"ELSE floor(w$t * nw$t / ($den) * 1e9 + 0.5) / 1e9 END"
  }

  /** H₀ cell for topic t: 1 + (md5-derived mod 1000)/1000. */
  private def hInit(t: Int): String =
    s"1 + (CAST(conv(substring(md5(concat('nmf:$t:', word)), 1, 15), 16, 10) " +
      s"AS BIGINT) % 1000) / 1000.0"

  private def hInitDuck(t: Int): String =
    s"1 + (CAST(('0x' || substring(md5('nmf:$t:' || word), 1, 15)) " +
      s"AS BIGINT) % 1000) / 1000.0"

  /** Spark execution shape: W (docs×k) stays DISTRIBUTED; H (k×24) is
    * a driver-side MODEL ARTIFACT updated between engine rounds — the
    * KMeans/LogReg "model-only driver round-trip" pattern. Per
    * iteration the engine runs exactly two keyed aggregates (the
    * H-numerator + gram over W, and the W-numerator with H shipped as
    * a 24-entry literal map — no join), one localCheckpoint pin on W;
    * the H half-step, HHᵀ gram, and final top-terms readout are k×24
    * driver arithmetic replicating the update strings' IEEE ops
    * verbatim (proven equal to the oracle's engine evaluation by the
    * NmfSpec replay and the DuckDB compare).
    */
  def nmfTopics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = Topics
    val n = Tables.documents(s, dir).count()
    val tf = TextOps.tokens(Tables.documents(s, dir))
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    val vocab = dfreq.orderBy(desc("df"), $"word").limit(VocabSize)
    val v = tf.join(vocab, "word")
      .select($"doc_id", $"word",
        expr(s"floor(tf * (CAST($n AS DOUBLE) - df + 0.5) / (df + 0.5) " +
          "* 1e6 + 0.5) / 1e6").as("v"))
      .localCheckpoint()
    def r9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val vocabWords = vocab.select($"word").as[String].collect().toSeq
    // H model: h(t-1)(word); init replicates hInit's conv/md5 text
    var h: Array[Map[String, Double]] = Array.tabulate(k)(ti =>
      vocabWords.map(wd => wd -> (1 + (java.lang.Long.parseLong(
        md5hex(s"nmf:${ti + 1}:$wd").take(15), 16) % 1000) / 1000.0)).toMap)
    var w = v.select($"doc_id").distinct()
      .select(($"doc_id" +: ts.map(t => lit(1.0).as(s"w$t"))): _*)
      .localCheckpoint()
    def dsum(xs: Iterable[Double]): Double =
      xs.map(BigDecimal(_)).foldLeft(BigDecimal(0))(_ + _).toDouble
    for (_ <- 1 to NmfIters) {
      // ONE engine pass: per-word H numerators + the k² W gram
      val nhRows = v.join(w, "doc_id").groupBy($"word")
        .agg(ts.map(t => sum(expr(p9(s"w$t", "v"))).cast("double")
          .as(s"nh$t")).head,
          ts.tail.map(t => sum(expr(p9(s"w$t", "v"))).cast("double")
            .as(s"nh$t")): _*)
        .collect()
      val gRow = w.agg(
        (for { t <- ts; u <- ts } yield
          sum(expr(p9(s"w$t", s"w$u"))).cast("double").as(s"g$t$u")).head,
        (for { t <- ts; u <- ts } yield
          sum(expr(p9(s"w$t", s"w$u"))).cast("double").as(s"g$t$u")).tail: _*)
        .collect()(0)
      val g = Array.tabulate(k, k)((t, u) => gRow.getDouble(t * k + u))
      val nh = nhRows.map(r =>
        r.getString(0) -> Array.tabulate(k)(t => r.getDouble(t + 1))).toMap
      // driver H half-step — the hUpd ops verbatim (inner-join
      // semantics: words absent from the numerator drop, as in the CTE)
      h = Array.tabulate(k) { ti =>
        nh.keys.flatMap { wd =>
          if (!h(ti).contains(wd)) None
          else {
            val den = (0 until k)
              .map(u => g(ti)(u) * h(u).getOrElse(wd, 0.0)).sum
            Some(wd -> (if (den == 0) 0.0
            else r9(h(ti)(wd) * nh(wd)(ti) / den)))
          }
        }.toMap
      }
      // W half-step: H ships as a literal 24-entry map — no join
      val hWords = h(0).keys.toSeq.sorted
      val hMapCols = Array.tabulate(k)(ti =>
        map(hWords.flatMap(wd => Seq(lit(wd), lit(h(ti)(wd)))): _*))
      val numW = v.where($"word".isin(hWords: _*))
        .groupBy($"doc_id")
        .agg(ts.map(t => sum((floor(($"v" * element_at(hMapCols(t - 1),
            $"word")) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)"))
          .cast("double").as(s"nw$t")).head,
          ts.tail.map(t => sum((floor(($"v" * element_at(hMapCols(t - 1),
              $"word")) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)"))
            .cast("double").as(s"nw$t")): _*)
      val q = Array.tabulate(k, k)((t, u) =>
        dsum(hWords.map(wd => r9(h(t)(wd) * h(u)(wd)))))
      val wCols = ts.map { t =>
        val den = (1 to Topics).map(u => lit(q(t - 1)(u - 1)) * col(s"w$u"))
          .reduceLeft(_ + _)
        when(den === 0, lit(0.0)).otherwise(
          floor(col(s"w$t") * col(s"nw$t") / den * 1e9 + 0.5) / 1e9)
          .as(s"w$t")
      }
      w = w.join(numW, "doc_id")
        .select(($"doc_id" +: wCols): _*)
        .localCheckpoint()
    }
    // top-terms readout straight from the driver model
    val out = (1 to k).flatMap { t =>
      h(t - 1).toSeq.collect { case (wd, x) if x > 0 => (wd, x) }
        .sortBy { case (wd, x) => (-x, wd) }.take(6).zipWithIndex
        .map { case ((wd, x), i) => (t.toLong, wd, x, (i + 1).toLong) }
    }
    s.createDataFrame(out).toDF("topic", "word", "weight", "rn")
  }

  /** DuckDB restatement: the identical update expression strings over
    * MATERIALIZED per-half-step CTEs (materialization pins each matrix
    * to one evaluation — DuckDB's projection inlining would otherwise
    * re-expand the recursion exponentially, the ev_pacf lesson).
    */
  val nmfTopicsSql: String = {
    val gramCols = (pref: String, src: String) =>
      (for { t <- ts; u <- ts } yield
        s"CAST(sum(${p9(s"$src$t", s"$src$u")}) AS DOUBLE) AS $pref$t$u")
        .mkString(", ")
    val iters = (1 to NmfIters).map { i =>
      val numH = ts.map(t =>
        s"CAST(sum(${p9(s"w$t", "v")}) AS DOUBLE) AS nh$t").mkString(", ")
      val numW = ts.map(t =>
        s"CAST(sum(${p9("v", s"h$t")}) AS DOUBLE) AS nw$t").mkString(", ")
      s"""nh$i AS MATERIALIZED (
         |  SELECT v.word, $numH
         |  FROM v JOIN w${i - 1} w ON w.doc_id = v.doc_id GROUP BY v.word),
         |g$i AS MATERIALIZED (
         |  SELECT ${gramCols("g", "w")} FROM w${i - 1} w),
         |h$i AS MATERIALIZED (
         |  SELECT h.word, ${ts.map(t => s"${hUpd(t)} AS h$t").mkString(", ")}
         |  FROM h${i - 1} h JOIN nh$i n ON n.word = h.word CROSS JOIN g$i),
         |nw$i AS MATERIALIZED (
         |  SELECT v.doc_id, $numW
         |  FROM v JOIN h$i h ON h.word = v.word GROUP BY v.doc_id),
         |q$i AS MATERIALIZED (
         |  SELECT ${gramCols("q", "h")} FROM h$i h),
         |w$i AS MATERIALIZED (
         |  SELECT w.doc_id, ${ts.map(t => s"${wUpd(t)} AS w$t").mkString(", ")}
         |  FROM w${i - 1} w JOIN nw$i n ON n.doc_id = w.doc_id
         |  CROSS JOIN q$i)""".stripMargin
    }.mkString(",\n")
    val cellUnion = ts.map(t =>
      s"SELECT CAST($t AS BIGINT) AS topic, word, h$t AS weight " +
        s"FROM h$NmfIters").mkString(" UNION ALL ")
    s"""WITH tf AS (
       |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id,
       |      unnest(regexp_split_to_array(lower(text), '\\W+')) AS word
       |    FROM documents)
       |  WHERE word <> '' GROUP BY doc_id, word),
       |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
       |nn AS (SELECT count(*) AS n FROM documents),
       |vocab AS (
       |  SELECT word, df FROM dfreq ORDER BY df DESC, word LIMIT $VocabSize),
       |v AS MATERIALIZED (
       |  SELECT tf.doc_id, tf.word,
       |    floor(tf * (CAST((SELECT n FROM nn) AS DOUBLE) - vc.df + 0.5)
       |      / (vc.df + 0.5) * 1e6 + 0.5) / 1e6 AS v
       |  FROM tf JOIN vocab vc ON vc.word = tf.word),
       |h0 AS MATERIALIZED (
       |  SELECT word,
       |    ${ts.map(t => s"${hInitDuck(t)} AS h$t").mkString(", ")}
       |  FROM vocab),
       |w0 AS MATERIALIZED (
       |  SELECT DISTINCT doc_id,
       |    ${ts.map(t => s"CAST(1 AS DOUBLE) AS w$t").mkString(", ")}
       |  FROM v),
       |$iters
       |SELECT topic, word, weight, rn FROM (
       |  SELECT topic, word, weight,
       |    CAST(row_number() OVER (PARTITION BY topic
       |      ORDER BY weight DESC, word) AS BIGINT) AS rn
       |  FROM ($cellUnion) c WHERE weight > 0) r
       |WHERE rn <= 6""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_nmf_topics" -> (nmfTopics _))

  def oracles: Map[String, String] = Map(
    "doc_nmf_topics" -> nmfTopicsSql)
}
