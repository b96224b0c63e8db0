package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class VecMeanAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("one-pass mean equals the explode+avg formulation exactly") {
    val a = graft.operators.Similarity.langCentroidsAgg(spark, TestSpark.sf)
      .select("lang", "dim", "mean_v")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // independent reference: explode then micro-unit-decimal mean
    val docs = graft.Tables.documents(spark, TestSpark.sf).select($"doc_id", $"lang")
    val emb = graft.Tables.embeddings(spark, TestSpark.sf).select($"vec_id", $"embedding")
    val ref = docs.join(emb, $"doc_id" === $"vec_id")
      .select($"lang", posexplode($"embedding").as(Seq("dim", "ev")))
      .groupBy($"lang", $"dim")
      .agg((sum(round($"ev".cast("double"), 6).cast("decimal(18,6)"))
        .cast("double") / count(lit(1))).as("mean_v"))
    assert(a.exceptAll(ref).isEmpty && ref.exceptAll(a).isEmpty)
  }

  test("reduce/merge handle empty buffers and count correctly") {
    val z = VecMeanAgg.zero
    val b1 = VecMeanAgg.reduce(VecMeanAgg.zero, Array(1.5f, -2.25f))
    val b2 = VecMeanAgg.reduce(VecMeanAgg.zero, Array(0.5f, 0.25f))
    val m = VecMeanAgg.merge(VecMeanAgg.merge(z, b1), b2)
    assert(m.n == 2L)
    val out = VecMeanAgg.finish(m)
    assert(out.sameElements(Array(1.0, -1.0)))
    assert(VecMeanAgg.finish(VecMeanAgg.zero).isEmpty)
  }

  test("mixed vector lengths fail loudly") {
    val b = VecMeanAgg.reduce(VecMeanAgg.zero, Array(1f, 2f))
    intercept[IllegalArgumentException] {
      VecMeanAgg.reduce(b, Array(1f, 2f, 3f))
    }
    val c = VecMeanAgg.reduce(VecMeanAgg.zero, Array(1f, 2f, 3f))
    intercept[IllegalArgumentException] { VecMeanAgg.merge(b, c) }
  }

  test("micro-unit rounding matches Spark's round(x, 6) semantics") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vals = Seq(0.1234565f, -0.9999995f, 1.0000004f, 0.0f, -3.25f)
    val sparkSide = vals.toDF("v")
      .select(round($"v".cast("double"), 6).as("r"))
      .collect().map(_.getDouble(0))
    val aggSide = vals.map(f => VecMeanAgg.finish(
      VecMeanAgg.reduce(VecMeanAgg.zero, Array(f)))(0))
    assert(sparkSide.sameElements(aggSide))
  }
}
