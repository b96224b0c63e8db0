package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Round-7 continuation 4: ADC retrieval through the int8 index and
  * temperature-scaled language mixing — semantic gates independent of
  * the DuckDB oracle.
  */
class Sq8TempMixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("sq8 ADC: rank list well-formed, scores near exact, recall against brute force") {
    import spark.implicits._
    val out = Similarity.sq8TopK(spark, sf)
      .as[(Long, Long, Double, Int)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
      assert(rows.length <= Similarity.Sq8K)
    }

    // exact reference on the collected collection
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val nrm = emb.map { case (id, e) => id -> math.sqrt(dot(e, e)) }.toMap
    val exact = emb.filter(_._1 < 10).map { case (qid, qe) =>
      qid -> emb.filter(_._1 != qid)
        .map { case (nid, ne) => (nid, dot(qe, ne) / (nrm(qid) * nrm(nid))) }
        .sortBy { case (nid, c) => (-c, nid) }.take(Similarity.Sq8K)
    }.toMap

    // per-dim reconstruction error ≤ scale/2 ⇒ ADC cosine lands near
    // the exact cosine for every emitted pair
    val exactCos = exact.map { case (q, ns) => ns.map { case (n, c) => ((q, n), c) } }
      .flatten.toMap
    val allCos = emb.filter(_._1 < 10).flatMap { case (qid, qe) =>
      emb.filter(_._1 != qid).map { case (nid, ne) =>
        ((qid, nid), dot(qe, ne) / (nrm(qid) * nrm(nid)))
      }
    }.toMap
    out.foreach { case (q, n, c, _) =>
      assert(math.abs(c - allCos((q, n))) < 0.05,
        s"($q,$n): adc $c vs exact ${allCos((q, n))}")
    }
    // retrieval quality: the quantized index recovers most of the
    // exact top-k (64-dim, 255-level grid — distortion is small)
    val hits = byQ.map { case (q, rows) =>
      rows.map(_._2).toSet
        .intersect(exact(q).map(_._1).toSet).size
    }.sum
    val total = exact.values.map(_.length).sum
    assert(hits.toDouble / total >= 0.8, s"recall ${hits.toDouble / total}")
  }

  test("temperature mix: tempered shares renormalize and flatten the head") {
    import spark.implicits._
    val rows = Curation.temperatureMix(spark, sf)
      .select($"lang", $"n_tokens", $"p_raw", $"p_temp", $"boost")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.length > 1)
    // shares renormalize (6-dp rounding slack)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3)
    // τ < 1 flattens: the largest language is down-weighted, the
    // smallest up-weighted, and tempered shares preserve the ordering
    val byMass = rows.sortBy(_._2)
    assert(byMass.head._5 > 1.0, s"smallest lang boost ${byMass.head._5}")
    assert(byMass.last._5 < 1.0, s"largest lang boost ${byMass.last._5}")
    assert(byMass.map(_._4).toSeq == byMass.map(_._4).sorted.toSeq)
  }
}
