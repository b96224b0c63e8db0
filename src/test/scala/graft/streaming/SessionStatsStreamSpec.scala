package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the round-3 redesign of streaming sessionization: the per-user
  * state is gap-separated session INTERVALS merged incrementally (an
  * order-independent formulation — sessionization is connected
  * components on the time line), so the streamed answer equals the batch
  * lag-gap fold under ANY split of events across triggers, including
  * fully shuffled file order. The round-2 version sorted timestamps only
  * within a micro-batch and was correct only for single-trigger replays.
  */
class SessionStatsStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def batchAnswer(): Set[(Long, Long, Long)] =
    graft.operators.EventOps.sessionStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def streamed(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("delta-log batch write is replay-idempotent (retry replaces, never duplicates)") {
    import spark.implicits._
    val log = graft.TempDirs.scoped("delta_replay")
    val b0 = Seq(("a", 1L), ("b", 2L)).toDF("k", "cnt")
    StreamQueries.appendDeltaBatch(b0, 0L, log)
    StreamQueries.appendDeltaBatch(Seq(("a", 3L)).toDF("k", "cnt"), 1L, log)
    // batch 1 replays after a failure between sink write and checkpoint
    // commit — the partition must be REPLACED, not appended to
    StreamQueries.appendDeltaBatch(Seq(("a", 3L)).toDF("k", "cnt"), 1L, log)
    val rows = spark.read.parquet(log)
      .select($"k", $"cnt", $"batch_id".cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("a", 1L, 0L), ("b", 2L, 0L), ("a", 3L, 1L)))
  }

  test("mergeIntervals is order-independent and equals the sorted gap fold") {
    val gap = 10L
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 20) {
      val ts = Array.fill(50)(rnd.nextLong(500))
      // reference: sorted fold, new session when gap exceeded
      val sorted = ts.sorted
      var sessions = 0
      var last = Long.MinValue
      sorted.foreach { t =>
        if (last == Long.MinValue || t - last > gap) sessions += 1
        last = t
      }
      // interval merge fed in 3 shuffled chunks, arbitrary order
      val shuffled = rnd.shuffle(ts.toList).toArray
      val chunks = shuffled.grouped(shuffled.length / 3 + 1).toList
      var open = List.empty[(Long, Long, Long)]
      chunks.foreach { c => open = StreamQueries.mergeIntervals(open, c, gap) }
      assert(open.size == sessions, s"trial $trial")
      assert(open.map(_._3).sum == ts.length.toLong, s"trial $trial")
    }
  }

  test("multi-trigger shuffled file order converges to the batch sessionization") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // 4 hash-shuffled files drained one per trigger: events arrive in
    // arbitrary cross-batch time order
    val src = graft.TempDirs.scoped("sess_shuffled")
    graft.Tables.eventsRawNanos(spark, s"$sf/events.parquet")
      .repartition(4).write.mode("overwrite").parquet(src)
    val out = StreamQueries.sessionStatsStream(spark, src,
      maxFilesPerTrigger = Some(1))
    assert(streamed(out) == batchAnswer())
  }

  test("watermark-gated closing fires on time-ordered replay and stays exact") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.Tables.eventsRawNanos(spark, s"$sf/events.parquet")
    // stage 4 time-sliced files with ascending mtimes so the file source
    // replays them in event-time order — the watermark then advances
    // between triggers and old intervals really do close into counters
    val bounds = ev.stat.approxQuantile("ts", Array(0.25, 0.5, 0.75), 0.0)
    val cuts = (Long.MinValue +: bounds.map(_.toLong)) :+ Long.MaxValue
    val src = java.nio.file.Paths.get(graft.TempDirs.scoped("sess_sliced"))
    (0 until 4).foreach { i =>
      val tmp = graft.TempDirs.scoped(s"sess_slice$i")
      ev.filter(col("ts") >= cuts(i) && col("ts") < cuts(i + 1))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      val dst = src.resolve(s"slice$i.parquet")
      java.nio.file.Files.copy(part, dst)
      dst.toFile.setLastModified(1000L * (i + 1)): Unit
    }
    val closed = spark.sparkContext.longAccumulator("closedSessions")
    val out = StreamQueries.sessionStatsStream(spark, src.toString,
      maxFilesPerTrigger = Some(1),
      disorderBound = "30 minutes", // tight bound — safe because replay
      // order respects event time, so nothing arrives behind the watermark
      closedCounter = Some(closed))
    assert(streamed(out) == batchAnswer())
    // the scale claim: state really is evicted as the watermark advances,
    // not accumulated until the end
    assert(closed.value > 0, "no session was ever closed by the watermark")
  }
}
