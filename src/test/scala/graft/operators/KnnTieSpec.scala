package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.DotF64

/** Degenerate-tie contract for the dedup-canonical k-NN reconstruction
  * ([[SemDedup.canonicalKnnEdges]]): when distinct canonical groups tie
  * BIT-EXACTLY at the K-th cosine, the reconstruction must still equal
  * the naive member-level join with its (cosine DESC, nbr_id)
  * tiebreak. The fixture's float cosines never actually tie, so this
  * constructs the ties directly: (0.9, 0.3) and (0.9, −0.3) have
  * bit-equal cosine against (1, 0) (the fold adds ±0.0 to the same
  * partial), and (0.45, 0.15) is an exact scaled copy of (0.9, 0.3)
  * (norm scales by an exact power of two), giving THREE distinct
  * groups tied at the cut. The `rank()`-over-cosine cut keeps every
  * tied group in play; a `row_number()` cut with no deterministic
  * tiebreak would keep an arbitrary subset and, whenever the final
  * member slots at the tie span more than one group, reproduce the
  * oracle only by luck of partition order.
  */
class KnnTieSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // groups: (canonical embedding, member ids); canonical id = min member
  // (the searchGraph invariant). Cell 0: tie straddles the K-th slot
  // (one member slot at the tied cosine, four tied members across three
  // groups — the member-id tiebreak must pick 41). Cell 1: two higher
  // groups only, so THREE member slots land on the tied groups and the
  // edge set needs members of ALL THREE — any single-group choice at
  // the canonical cut loses.
  private val groups: Seq[(Int, Seq[Float], Seq[Long])] = Seq(
    (0, Seq(1.0f, 0.0f), Seq(0L, 7L)),
    (0, Seq(0.99f, 0.1f), Seq(10L)),
    (0, Seq(0.98f, 0.15f), Seq(20L)),
    (0, Seq(0.97f, 0.2f), Seq(30L)),
    (0, Seq(0.9f, 0.3f), Seq(41L, 44L)),
    (0, Seq(0.9f, -0.3f), Seq(42L)),
    (0, Seq(0.45f, 0.15f), Seq(43L)),
    (1, Seq(1.0f, 0.0f), Seq(100L)),
    (1, Seq(0.99f, 0.1f), Seq(110L)),
    (1, Seq(0.98f, 0.15f), Seq(120L)),
    (1, Seq(0.9f, 0.3f), Seq(141L, 144L)),
    (1, Seq(0.9f, -0.3f), Seq(142L)),
    (1, Seq(0.45f, 0.15f), Seq(143L)))

  private def withNrm(df: DataFrame): DataFrame =
    df.withColumn("nrm",
      sqrt(DotF64.dot_f64(col("embedding"), col("embedding"))))

  test("bit-equal cross-group ties at the K-th cosine reproduce the naive member oracle") {
    import spark.implicits._
    val v = withNrm(groups
      .map { case (k, e, ms) => (ms.min, k, e) }
      .toDF("vec_id", "k", "embedding"))
    val alias = groups
      .flatMap { case (_, _, ms) => ms.map(m => (ms.min, m)) }
      .toDF("c_id", "vec_id")
    val got = SemDedup.canonicalKnnEdges(spark, v, alias)
      .select($"vec_id", $"nbr_id", $"cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // naive member-level oracle: every member carries its group's
    // embedding; all pairs within the cell; top-K by (cosine, nbr_id)
    val members = withNrm(groups
      .flatMap { case (k, e, ms) => ms.map(m => (m, k, e)) }
      .toDF("vec_id", "k", "embedding"))
    val a = members.selectExpr("k", "vec_id", "embedding AS ea", "nrm AS na")
    val b = members.selectExpr("k", "vec_id AS nbr_id", "embedding AS eb",
      "nrm AS nb")
    val w = Window.partitionBy($"vec_id").orderBy($"cosine".desc, $"nbr_id")
    val want = a.join(b, "k")
      .where($"vec_id" =!= $"nbr_id")
      .select($"vec_id", $"nbr_id",
        (DotF64.dot_f64($"ea", $"eb") / ($"na" * $"nb")).as("cosine"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= SemDedup.KnnK)
      .select($"vec_id", $"nbr_id", $"cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(got == want,
      s"missing=${(want -- got).toSeq.sorted} extra=${(got -- want).toSeq.sorted}")

    // the ties really are bit-equal and really straddle the cut:
    // member 0's 5th slot goes to 41 by the id tiebreak (44, 42, 43
    // tied at the same double), and member 100's edge set spans all
    // THREE tied groups
    val tied = got.filter(_._1 == 0L).map(_._3).min
    assert(got.count(e => e._1 == 0L && e._3 == tied) == 1)
    assert(got.contains((0L, 41L, tied)))
    assert(!got.exists(e => e._1 == 0L && Set(42L, 43L, 44L)(e._2)))
    val from100 = got.filter(_._1 == 100L).map(_._2)
    assert(Set(141L, 142L, 143L).subsetOf(from100))
  }
}
