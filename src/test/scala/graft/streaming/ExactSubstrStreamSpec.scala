package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The round-10 streaming arrivals must equal their batch queries
  * exactly under the multi-trigger split: ExactSubstr's cross-trigger
  * posting state, and the cross-modal image↔frame signature state.
  */
class ExactSubstrStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming ExactSubstr spans equal the batch span table") {
    val streamed = StreamQueries.streamExactSubstr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val batch = graft.operators.Dedup.exactSubstr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture must contain at least one shared span")
    // incremental finalize ledger: one entry per trigger, and arrivals
    // across triggers sum to the final accumulated posting index —
    // each trigger processed only its own arrivals' delta against the
    // accumulated state, never a full re-finalize
    import scala.jdk.CollectionConverters._
    val ledger = StreamQueries.substrTriggerLog.asScala.toSeq.sortBy(_._1)
    assert(ledger.size >= 2, "multi-trigger drain expected")
    val last = ledger.last
    assert(ledger.map(_._2).sum == last._2 + last._3,
      "per-trigger arrivals must sum to the accumulated posting index")
    // no gram crosses the occurrence cut on the organic corpus (max
    // occ ~4 at sf0.01 vs cut 256), so every touched pair involves a
    // new doc and the span log needs no tombstones: touched pairs
    // accumulated == final distinct pair count
    val finalPairs = streamed.map(t => (t._1, t._2)).size.toLong
    assert(ledger.map(_._4).sum == finalPairs,
      "per-trigger touched pairs must sum to the final pair table")
  }

  /** Forced occurrence-cut crossing at cut=3, driven batch-by-batch
    * through the trigger delta: a boilerplate gram shared by docs
    * 1–2 crosses the cut when docs 3–4 arrive, so the pair (1,2) must
    * be RECOMPUTED — its boilerplate span retracted, its organic span
    * retained — and the latest-touch-wins reconstruction must equal
    * the batch pass over the full corpus at the same cut.
    */
  test("incremental delta retracts spans when a gram crosses the occurrence cut") {
    import spark.implicits._
    val c = "c1 c2 c3 c4 c5 c6 c7 c8"           // the gram that will cross
    val d = "d1 d2 d3 d4 d5 d6 d7 d8"           // the organic span that survives
    val t1 = Seq(
      (1L, s"a1 a2 $c a3 a4 $d"),
      (2L, s"b1 $c b2 b3 b4 b5 $d")).toDF("doc_id", "text")
    val t2 = Seq(
      (3L, s"e1 e2 e3 $c e4 e5 e6 e7"),
      (4L, s"f1 f2 $c f3 f4 f5 f6 f7")).toDF("doc_id", "text")
    val D = graft.operators.Dedup
    val occ1 = D.exactSubstrOcc(spark, t1).localCheckpoint()
    val occ2 = D.exactSubstrOcc(spark, t2).localCheckpoint()
    val empty = occ1.limit(0)
    val key5 = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val pairOf = (t: (Long, Long, Long, Long, Long)) => (t._1, t._2)

    val (touch1, spans1, stats1) = D.substrTriggerDelta(spark, empty, occ1, cut = 3)
    val s1 = spans1.collect().map(key5).toSet
    // trigger 1: both the boilerplate span and the organic span exist
    assert(s1 == D.spansFromOcc(spark, occ1, cut = 3).collect().map(key5).toSet)
    assert(s1.size == 2 && s1.forall(t => pairOf(t) == (1L, 2L)))

    val (touch2, spans2, _) = D.substrTriggerDelta(spark, occ1, occ2, cut = 3)
    val s2 = spans2.collect().map(key5).toSet
    val touched2 = touch2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the crossing dirtied the OLD pair: recomputed with only the
    // organic span left; no new-doc pair shares an eligible gram
    assert(touched2 == Set((1L, 2L)), "crossing must dirty exactly the old pair")
    assert(s2.size == 1 && s2.forall(_._5 == 8L))

    // ACCRETED-STATS path: feeding trigger 1's returned per-gram stats
    // delta back as the accumulated (o_occ, o_df) must produce the
    // identical trigger-2 delta — including the crossing detection and
    // the repair, which are decided from stats ALONE. This is the
    // additivity contract the streaming engine's stats log rides.
    val acc1 = stats1.selectExpr("gh", "occ_d AS o_occ", "df_d AS o_df")
    val (touch2b, spans2b, _) =
      D.substrTriggerDelta(spark, occ1, occ2, cut = 3, oldStats0 = Some(acc1))
    assert(spans2b.collect().map(key5).toSet == s2,
      "accreted-stats spans must equal the direct-aggregate spans")
    assert(touch2b.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == touched2,
      "accreted-stats touched pairs must equal the direct-aggregate ones")

    // latest-touch-wins reconstruction equals the batch pass at cut=3
    val latest = (Map.empty[(Long, Long), Set[(Long, Long, Long, Long, Long)]]
      ++ touch1.collect().map(r => ((r.getLong(0), r.getLong(1)),
        s1.filter(t => pairOf(t) == (r.getLong(0), r.getLong(1)))))
      ++ touch2.collect().map(r => ((r.getLong(0), r.getLong(1)),
        s2.filter(t => pairOf(t) == (r.getLong(0), r.getLong(1))))))
      .values.flatten.toSet
    val batch = D.spansFromOcc(spark, occ1.unionByName(occ2), cut = 3)
      .collect().map(key5).toSet
    assert(latest == batch)
    assert(batch.size == 1, "boilerplate span must be gone from the batch answer")
  }

  /** The bucketed-log engine end-to-end (round-12 item 3), on a crafted
    * corpus that (a) keeps gram-hash buckets SPARSE so partition
    * pruning is demonstrable, and (b) forces an occurrence-cut crossing
    * at the LAST trigger through the real streaming caller (not the
    * direct delta call above): 300 docs = "u{i} c1..c8" — one unique
    * gram per doc (df=1, never eligible) plus one shared gram whose
    * occurrence count passes the 256 cut when the 4th trigger lands,
    * dirtying every old pair and retracting every emitted span. The
    * final reconstruction must equal the batch pass (empty), and the
    * bytes ledger must show per-trigger pruned reads strictly below the
    * full accumulated posting log.
    */
  test("bucketed posting log: pruned reads, crossing repair and tombstones through the real engine") {
    import spark.implicits._
    val dir = graft.TempDirs.scoped("graft_substr_bucket_fixture")
    (1 to 300).map(i => (i.toLong,
        s"u$i c1 c2 c3 c4 c5 c6 c7 c8", "fix"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val prev = StreamQueries.substrLogBucketsOverride
    StreamQueries.substrLogBucketsOverride = Some(4096)
    val streamed =
      try StreamQueries.streamExactSubstr(spark, dir).collect()
      finally StreamQueries.substrLogBucketsOverride = prev
    // batch ground truth: the shared gram's 300 occurrences exceed the
    // cut and the per-doc grams have df=1 — the span table is EMPTY
    val D = graft.operators.Dedup
    val batch = D.spansFromOcc(spark,
      D.exactSubstrOcc(spark,
        spark.read.parquet(s"$dir/documents.parquet")
          .select($"doc_id", $"text"))).collect()
    assert(batch.isEmpty, "fixture must cut the shared gram in batch")
    assert(streamed.isEmpty,
      "crossing repair must retract every previously-emitted span")
    import scala.jdk.CollectionConverters._
    val ledger = StreamQueries.substrTriggerLog.asScala.toSeq.sortBy(_._1)
    assert(ledger.size >= 4, "multi-trigger drain expected")
    // spans were emitted while the gram was still under the cut, and
    // the crossing trigger touched (tombstoned) old pairs without
    // emitting spans
    assert(ledger.init.exists(_._5 > 0), "pre-crossing spans expected")
    val crossingTrigger = ledger.last
    assert(crossingTrigger._5 == 0 && crossingTrigger._4 > 0,
      "crossing trigger must tombstone old pairs with no surviving spans")
    // bucket pruning: each trigger after the first reads strictly fewer
    // posting-log bytes than the full accumulated log (sparse buckets)
    val bytes = StreamQueries.substrBytesLog.asScala.toSeq.sortBy(_._1)
    assert(bytes.size == ledger.size)
    assert(bytes.forall { case (_, pruned, total) => pruned <= total })
    assert(bytes.tail.forall { case (_, pruned, total) => pruned < total },
      s"pruned reads must stay below the accumulated log: $bytes")
  }

  test("streaming savings equal the batch per-source duplication report") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))
    val streamed = StreamQueries.streamSubstrSavings(spark, sf)
      .collect().map(key).toSet
    val batch = graft.operators.Dedup.substrSavings(spark, sf)
      .collect().map(key).toSet
    assert(streamed == batch)
    assert(batch.exists(_._4 > 0L), "fixture must contain duplicate tokens")
  }

  test("streaming ppjoin equals the batch prefix-filtered exact join") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))
    val streamed = StreamQueries.streamPpjoin(spark, sf)
      .collect().map(key).toSet
    val batch = graft.operators.InvertedIndex.ppjoin(spark, sf)
      .collect().map(key).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture must contain at least one exact near-dup pair")
    // incremental finalize ledger: one entry per trigger, and the
    // arrivals across triggers sum to the final accumulated index —
    // i.e. each trigger processed only its own arrivals against the
    // accumulated state, never a full re-finalize of a stale union
    import scala.jdk.CollectionConverters._
    val ledger = StreamQueries.ppjoinTriggerLog.asScala.toSeq.sortBy(_._1)
    assert(ledger.size >= 2, "multi-trigger drain expected")
    val last = ledger.last
    assert(ledger.map(_._2).sum == last._2 + last._3,
      "per-trigger arrivals must sum to the accumulated token index")
    assert(ledger.map(_._4).sum == streamed.size.toLong,
      "per-trigger emitted pairs must sum to the final pair table")
  }

  test("streaming image-in-video pairs equal the batch cross-modal join") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val streamed = StreamQueries.streamImageInVideo(spark, sf)
      .collect().map(key).toSet
    val batch = graft.operators.Multimodal.imageInVideo(spark, sf)
      .collect().map(key).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture must contain at least one sig match")
  }
}
