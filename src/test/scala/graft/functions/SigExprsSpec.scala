package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Codegen/interpreted/kernel parity for the native signature and
  * encoding expressions (the oracle gate already proves cross-engine
  * bit-parity end to end; this pins the three in-JVM paths directly).
  */
class SigExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("minhash_sig == Hashing kernel; <3 tokens is null") {
    import spark.implicits._
    val texts = Seq("alpha beta gamma delta", "one two", "", "x y z x y z")
    val got = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
      .select($"id", MinHashSigExpr.minhash_sig($"t").as("sig"))
      .orderBy($"id").collect()
      .map(r => if (r.isNullAt(1)) null else r.getSeq[Long](1).toArray)
    texts.zip(got).foreach { case (t, sig) =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < 3) assert(sig == null, s"'$t'")
      else {
        val shingles = toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
        val expected = Hashing.minhash60(shingles.iterator.map(Hashing.md5_60))
        assert(sig.sameElements(expected), s"'$t'")
      }
    }
  }

  test("simhash_sig == Hashing kernel; empty text is null") {
    import spark.implicits._
    val texts = Seq("alpha beta alpha", "   ", "unique words here now")
    val got = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
      .select($"id", SimHashSigExpr.simhash_sig($"t").as("sig"))
      .orderBy($"id").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getLong(1)))
    texts.zip(got).foreach { case (t, sig) =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) assert(sig.isEmpty)
      else {
        val freq = toks.groupBy(Hashing.md5_60).view.mapValues(_.length)
        assert(sig.contains(Hashing.simhash60(freq.iterator)))
      }
    }
  }

  test("pq_encode picks the nearest centroid per block, ties to lowest id") {
    import spark.implicits._
    // 2 blocks x 2 dims, 3 centroids per block; vectors placed exactly on
    // or between centroids
    val cbs = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0), Array(2.0, 2.0)),
      Array(Array(0.0, 5.0), Array(5.0, 0.0), Array(5.0, 5.0)))
    val vs = Seq(
      (0L, Array(0.9f, 0.9f, 0.0f, 5.0f)), // block0 -> c1, block1 -> c0
      (1L, Array(2.0f, 2.0f, 5.0f, 4.9f)), // block0 -> c2, block1 -> c2
      (2L, Array(0.5f, 0.5f, 2.5f, 2.5f))) // exact midpoints: ties -> c0
    val got = vs.toDF("id", "emb")
      .select($"id", PqEncode.pq_encode($"emb", cbs).as("codes"))
      .orderBy($"id").collect()
      .map(_.getSeq[Int](1).toList)
    assert(got(0) == List(1, 0))
    assert(got(1) == List(2, 2))
    assert(got(2) == List(0, 0))
  }

  test("structurally identical sig expressions are semanticEqual") {
    // constants are Seq-typed, not Array-typed: Array fields fall back to
    // reference equality, so two identical expressions would never
    // canonicalize — defeating subexpression elimination
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val col = AttributeReference("emb", ArrayType(FloatType))()
    def planes = Array.tabulate(8)(i => i * 0.25 - 1.0).toSeq
    val h1 = HyperplaneSigs(col, planes, 2, 2, 2)
    val h2 = HyperplaneSigs(col, planes, 2, 2, 2)
    assert(h1 == h2)
    assert(h1.semanticEquals(h2))
    val p1 = PqEncode(col, planes, 2, 2, 2)
    val p2 = PqEncode(col, planes, 2, 2, 2)
    assert(p1 == p2)
    assert(p1.semanticEquals(p2))
  }

  test("pq_encode interpreted eval agrees with codegen") {
    val cbs = Array.tabulate(4, 4, 2)((b, c, i) => (b + c * 0.7 + i * 0.3))
    val v = Array.tabulate(8)(i => (math.cos(i.toDouble) * 2).toFloat)
    val flat = cbs.flatten.flatten
    val expr = PqEncode(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      flat, 4, 4, 2)
    val interp = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
    import spark.implicits._
    val viaPlan = Seq((0L, v)).toDF("id", "emb")
      .select(PqEncode.pq_encode($"emb", cbs).as("codes"))
      .collect()(0).getSeq[Int](0).toArray
    assert(interp.sameElements(viaPlan))
  }
}
