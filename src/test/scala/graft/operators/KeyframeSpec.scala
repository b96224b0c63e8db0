package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Keyframe selection: exactly one keyframe per (asset, scene), scene
  * ids contiguous from 0, every keyframe inside its scene's frame
  * range, and the medoid property — no frame in the scene sits closer
  * to the scene's mean pixel sum (recomputed independently from the
  * frame index).
  */
class KeyframeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("one medoid keyframe per adaptively segmented scene") {
    val frames = Multimodal.aviFrames(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4)))
      .groupBy(_._1).map { case (a, fs) => a -> fs.sortBy(_._2) }
    val rows = Multimodal.keyframeSelect(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getInt(4), r.getLong(5), r.getInt(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (a, scs) =>
      val fs = frames(a)
      // independent segmentation: cut at |delta| > 2 * mean |delta|
      val deltas = fs.sliding(2).map { case Array(p, c) =>
        math.abs(c._5 - p._5) }.toArray
      val thr = if (deltas.isEmpty) 0.0
        else 2.0 * (deltas.sum.toDouble / deltas.length)
      var scene = 0L
      val sceneOf = fs.zipWithIndex.map { case (_, i) =>
        if (i > 0 && deltas(i - 1) > thr) scene += 1
        scene
      }
      val expectScenes = sceneOf.distinct.sorted
      assert(scs.map(_._2).sorted.toSeq == expectScenes.toSeq,
        s"asset $a scene ids")
      for ((_, sid, start, len, kf, koff, ksz) <- scs) {
        val members = fs.zip(sceneOf).filter(_._2 == sid).map(_._1)
        assert(members.head._2 == start && members.length.toLong == len,
          s"asset $a scene $sid bounds")
        val mean = members.map(_._5).sum.toDouble / members.length
        val kfRow = members.find(_._2 == kf).get
        assert(kfRow._3 == koff && kfRow._4 == ksz)
        val kd = math.abs(kfRow._5 - mean)
        for (m <- members)
          assert(math.abs(m._5 - mean) > kd ||
            (math.abs(m._5 - mean) == kd && m._2 >= kf),
            s"asset $a scene $sid: frame ${m._2} beats keyframe $kf")
      }
    }
  }
}
