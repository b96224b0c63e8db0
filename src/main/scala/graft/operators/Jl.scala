package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Johnson–Lindenstrauss random-projection distortion audit — the check
  * a pipeline runs before swapping full embeddings for a cheaper
  * projected index: project each vector through a FIXED ±1 sign matrix
  * (Achlioptas 2003) to k=16 dims and measure, on a deterministic pair
  * sample, how far the projected squared distance drifts from the
  * original (`ratio` ≈ 1 ± ε is the JL guarantee, E[‖Rv‖²] = k·‖v‖²).
  *
  * Scale shape: the sign matrix is sixteen 64-bit COMPILE-TIME literals
  * (one mask per output dim, bit i = sign of input dim i) — no
  * broadcast, no driver state, nothing to ship but the plan itself.
  * Projection + distances are a narrow map over the pair frame; the
  * only join is the consecutive-id equi-join that builds the audit
  * sample (at 100 TB you'd hash-sample pairs instead — same shape, one
  * line changed). Linearity lets us project the DIFFERENCE vector once
  * (P·a − P·b = P·(a−b)): 16 folds instead of 32.
  *
  * Cross-engine exactness: floats are cast to double BEFORE
  * subtraction; every sum is the same left-to-right fold on both
  * engines (Spark `aggregate`, DuckDB `list_reduce` with a prepended
  * 0.0); outputs go through the shared floor(x·1e6+0.5)/1e6 rounding.
  */
object Jl {

  /** Output dims; input dims are the fixture's 64. */
  val OutDims = 16

  /** Deterministic sign masks: bit i of mask j = sign of cell (j, i). */
  val masks: Seq[Long] = (0 until OutDims).map { j =>
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"jl:$j".getBytes("UTF-8"))
    md.take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
  }

  /** ±1.0 from bit i of mask m — template instantiated per engine
    * (`>>` spelled `shiftright` on Spark, `>>` on DuckDB).
    */
  private def signT(shift: (String, String) => String)(j: Int, i: String) =
    s"CAST(CASE WHEN (${shift(s"CAST(${masks(j)} AS BIGINT)", i)}) & 1 = 1 " +
      "THEN 1 ELSE -1 END AS DOUBLE)"

  def jlDistortion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sign = signT((m, i) => s"shiftright($m, $i)") _
    val e = Tables.embeddings(s, dir)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
    val pairs = e.toDF("vec_a", "va")
      .join(e.toDF("vec_b", "vb"), expr("vec_b = vec_a + 1"))
      .selectExpr("vec_a", "vec_b", "zip_with(va, vb, (x, y) -> x - y) AS d")
    val projSq = (0 until OutDims).map { j =>
      val dot =
        s"""aggregate(transform(d, (x, i) -> x * ${sign(j, "i")}),
           |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin
      s"($dot) * ($dot)"
    }.mkString(" + ")
    pairs.selectExpr("vec_a", "vec_b",
      "aggregate(transform(d, x -> x * x), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS sq_orig",
      s"($projSq) AS sq_proj")
      .where($"sq_orig" > 0)
      .selectExpr("vec_a", "vec_b",
        "floor(sq_orig * 1e6 + 0.5) / 1e6 AS sq_orig",
        "floor(sq_proj * 1e6 + 0.5) / 1e6 AS sq_proj",
        s"floor(sq_proj / ($OutDims * sq_orig) * 1e6 + 0.5) / 1e6 AS ratio")
  }

  val jlDistortionSql: String = {
    val sign = signT((m, i) => s"$m >> ($i)") _
    // DuckDB fold: d[i] is 1-based, the mask bit is 0-based ⇒ i - 1
    val projSq = (0 until OutDims).map { j =>
      val dot =
        s"""list_reduce(list_prepend(0.0, list_transform(range(1, 65),
           |  i -> d[i] * ${sign(j, "i - 1")})), (acc, v) -> acc + v)""".stripMargin
      s"($dot) * ($dot)"
    }.mkString(" + ")
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    list_transform(range(1, 65), i -> a.v[i] - b.v[i]) AS d
       |  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1),
       |m AS (
       |  SELECT vec_a, vec_b,
       |    list_reduce(list_prepend(0.0, list_transform(d, x -> x * x)),
       |      (acc, v) -> acc + v) AS sq_orig,
       |    ($projSq) AS sq_proj
       |  FROM pairs)
       |SELECT vec_a, vec_b,
       |  floor(sq_orig * 1e6 + 0.5) / 1e6 AS sq_orig,
       |  floor(sq_proj * 1e6 + 0.5) / 1e6 AS sq_proj,
       |  floor(sq_proj / ($OutDims * sq_orig) * 1e6 + 0.5) / 1e6 AS ratio
       |FROM m WHERE sq_orig > 0""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_jl_distortion" -> (jlDistortion _))

  def oracles: Map[String, String] = Map(
    "sim_jl_distortion" -> jlDistortionSql)
}
