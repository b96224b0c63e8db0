package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** CDC chunking and frame sampling — semantic gates independent of the
  * DuckDB oracle.
  */
class CdcFrameSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private val P = BigInt(1000000007L)
  private val Pow = {
    var p = BigInt(1)
    Array.fill(Dedup.CdcWindow) { val r = p; p = p * 31 % P; r }
  }

  /** Independent chunker: BigInt arithmetic (no Long-overflow paths),
    * string splitting instead of index bookkeeping.
    */
  private def refChunks(text: String): Seq[(Long, Int)] = {
    val cs = text.codePoints().toArray
    if (cs.isEmpty) return Nil
    val bounds = (Dedup.CdcWindow - 1 until cs.length).filter { i =>
      val h = (0 until Dedup.CdcWindow)
        .map(j => BigInt(cs(i - j)) * Pow(j)).sum % P
      h % Dedup.CdcMask == 0
    }
    val ends = (bounds :+ (cs.length - 1)).distinct.sorted
    ends.foldLeft((0, Seq.empty[(Long, Int)])) { case ((st, acc), en) =>
      val fp = cs.slice(st, en + 1)
        .foldLeft(BigInt(0))((h, c) => (h * 31 + c) % P)
      (en + 1, acc :+ ((fp.toLong, en - st + 1)))
    }._2
  }

  test("CDC census replays against an independent BigInt chunker") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .filter(_._2.nonEmpty)
    val all = docs.flatMap { case (id, t) => refChunks(t).map(c => (id, c)) }
    val copies = all.groupBy(_._2._1).view.mapValues(_.size).toMap
    val want = all.groupBy(_._1).map { case (id, cs) =>
      val dups = cs.filter { case (_, (fp, _)) => copies(fp) > 1 }
      (id, cs.length.toLong, dups.length.toLong,
        dups.map(_._2._2.toLong).sum)
    }.toSet
    val got = Dedup.cdcChunks(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    // chunk coverage: total chunk chars == total doc chars (from the
    // reference; the query's census is consistent with it by equality)
    docs.foreach { case (_, t) =>
      assert(refChunks(t).map(_._2).sum == t.codePoints().count())
    }
    // the fixture's planted duplicates must surface as shared chunks
    assert(got.exists(_._3 > 0))
  }

  test("CDC boundaries resynchronize after an edit (the property fixed-width lacks)") {
    val base = "the quick brown fox jumps over the lazy dog and then " * 8
    val edited = "INSERTED-PREFIX " + base
    val a = refChunks(base).map(_._1)
    val b = refChunks(edited).map(_._1)
    // some suffix of the chunk stream survives the edit untouched
    val shared = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }
    assert(shared.nonEmpty,
      "an early insertion must leave later chunk fingerprints intact")
    // ... while fixed-width chunking at the same granularity loses all
    def fixed(t: String) = t.grouped(Dedup.CdcMask.toInt).toSeq
      .map(_.codePoints().toArray
        .foldLeft(BigInt(0))((h, c) => (h * 31 + c) % P).toLong)
    val fa = fixed(base)
    val fb = fixed(edited)
    val fshared = fa.reverse.zip(fb.reverse).takeWhile { case (x, y) => x == y }
    assert(shared.length > fshared.length)
  }

  test("frame sample: uniform grid per asset, rows drawn from the frame index") {
    import spark.implicits._
    val fr = Multimodal.aviFrames(spark, sf)
      .as[(Long, Int, Long, Int, Long)].collect()
    val nf = fr.groupBy(_._1).view.mapValues(_.length).toMap
    val want = nf.flatMap { case (a, n) =>
      (0 until Multimodal.FrameSlots)
        .map(s => s -> math.floor(s.toDouble * n / Multimodal.FrameSlots).toInt)
        .groupBy(_._2).map { case (idx, ss) => (a, ss.map(_._1).min, idx) }
    }.toSet
    val got = Multimodal.frameSample(spark, sf)
      .select($"asset_id", $"slot", $"frame_idx")
      .as[(Long, Int, Int)].collect().toSet
    assert(got == want)
    // sampled rows carry the index's metadata verbatim
    val frSet = fr.map(r => (r._1, r._2, r._3, r._5)).toSet
    val full = Multimodal.frameSample(spark, sf)
      .as[(Long, Int, Int, Long, Long)].collect()
    full.foreach { case (a, _, fi, off, px) =>
      assert(frSet((a, fi, off, px)))
    }
  }
}
