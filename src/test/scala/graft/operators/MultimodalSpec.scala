package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("asset schema: opaque binary payload + typed columns") {
    val ds = Multimodal.assets(spark, sf)
    val schema = ds.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("media_type").dataType.typeName == "string")
    assert(ds.count() == graft.Tables.documents(spark, sf).count())
  }

  test("bmp round-trip: hand-computed 2x2 image decodes exactly") {
    // w=2 → row bytes 6, stride 8 (2 pad bytes per row); h=2, seed=10.
    // Logical channel bytes j=0..11: (10+31j)%256 =
    //   10,41,72,103,134,165 (top row)  196,227,2,33,64,95 (bottom row)
    val bytes = Multimodal.encodeBmp(2, 2, 10)
    assert(bytes.length == 54 + 8 * 2)
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    // file stores bottom-up: first stored row is the logical BOTTOM row
    assert((bytes(54) & 0xff) == 196)
    assert((bytes(54 + 8) & 0xff) == 10) // second stored row = top row
    assert(bytes(54 + 6) == 0 && bytes(54 + 7) == 0) // row padding
    val Some((w, h, luma, top)) = Multimodal.decodeBmp(bytes)
    assert(w == 2 && h == 2)
    assert(luma == 10 + 41 + 72 + 103 + 134 + 165 + 196 + 227 + 2 + 33 + 64 + 95)
    assert(top == 10 + 41 + 72 + 103 + 134 + 165) // un-flipped top row
  }

  test("audio neardup: only time-shifted generator copies match, jaccard sane") {
    val out = Multimodal.audioNeardup(spark, sf)
      .selectExpr("asset_a", "asset_b", "shared", "jaccard").collect()
    assert(out.nonEmpty)
    // the generator's audio is a step-31 ramp on seed = doc_id % 9973,
    // so value-based shingling can only match assets whose SEEDS differ
    // by a multiple of 31 (the Δid % 93 form of this assertion breaks
    // once doc_ids wrap the 9973 modulus)
    assert(out.forall { r =>
      Math.floorMod(r.getLong(1) % 9973 - r.getLong(0) % 9973, 31) == 0
    })
    assert(out.forall(r => r.getDouble(3) >= Multimodal.AudioJaccThresh &&
      r.getDouble(3) <= 1.0))
    // shared DISTINCT windows can never exceed either side's window count
    val nW = Multimodal.assets(spark, sf).filter(_.media_type == "audio")
      .collect().flatMap(a => Multimodal.decodeWav(a.payload))
      .map { case (n, _) => n - (Multimodal.AudioShingle - 1) }
    val maxW = nW.max.toLong
    assert(out.forall(r => r.getLong(2) <= maxW))
  }

  test("speech-caption alignment: totals recompute from independently decoded audio") {
    val out = Multimodal.speechCaptionAlign(spark, sf).collect()
    assert(out.nonEmpty)
    // every decodable audio asset pairs with exactly one caption
    val decodable = Multimodal.assets(spark, sf)
      .filter(_.media_type == "audio")
      .collect().flatMap(a => Multimodal.decodeWav(a.payload))
    assert(out.map(_.getLong(1)).sum == decodable.length.toLong)
    out.foreach { r =>
      // a silent pair can never be rate-aligned
      assert(r.getLong(2) + r.getLong(3) <= r.getLong(1))
      // the corpus rate is exactly the emitted ratio-of-sums
      if (!r.isNullAt(6)) {
        assert(r.getLong(5) > 0)
        val want = math.floor(
          r.getLong(4).toDouble / r.getLong(5) * 1e6 + 0.5) / 1e6
        assert(r.getDouble(6) == want)
      } else assert(r.getLong(5) == 0)
    }
  }

  test("image-in-video: planted frame match found through the 16-bit lane mask") {
    import spark.implicits._
    // image luma 65536+42 and frame sum 42 share a 16-bit signature
    // (the lane contract); the 65536+43 image matches nothing
    val imgs = Seq((100L, 65536L + 42L), (200L, 65536L + 43L))
      .toDF("image_id", "luma_sum")
    val frames = Seq((7L, 42L), (7L, 9L), (7L, 11L), (8L, 5L))
      .toDF("video_id", "px_sum")
    val out = Multimodal.imageInVideoPairs(imgs, frames).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 100L && r.getLong(1) == 7L)
    assert(r.getLong(2) == 1L && r.getLong(3) == 3L)
    assert(r.getDouble(4) == math.round(1.0 / 3.0 * 1e6) / 1e6)
  }

  test("image-in-video: corpus pairs recompute from independent decodes") {
    val byType = Multimodal.assets(spark, sf).collect()
      .groupBy(_.media_type)
    val imgSigs = byType.getOrElse("image", Array.empty)
      .flatMap(a => Multimodal.decodeBmp(a.payload)
        .map { case (_, _, luma, _) => a.asset_id -> (luma % 65536L) })
    val frameSigs = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .flatMap { r =>
        val id = r.getLong(0)
        val avi = Multimodal.videoAssetPayload(id, r.getString(1))
        Multimodal.decodeAviFrames(avi).toSeq.flatMap(_._4.map {
          case (_, _, _, px) => id -> (px % 65536L)
        })
      }
    val nf = frameSigs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val expected = (for {
      (iid, isig) <- imgSigs
      (vid, vsig) <- frameSigs if vsig == isig
    } yield (iid, vid)).groupBy(identity).map { case ((iid, vid), hits) =>
      (iid, vid, hits.length.toLong, nf(vid),
        math.round(hits.length.toDouble / nf(vid) * 1e6) / 1e6)
    }.toSet
    val got = Multimodal.imageInVideo(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expected)
  }

  test("a/v sync: totals recompute from independent decodes of both modalities") {
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // independent audio side: decodable WAVs' VAD active counts
    val aActive = docs.filter(_._1 % 3 == 1).flatMap { case (id, text, _) =>
      val wav = Multimodal.audioAssetPayload(id, text)
      Multimodal.decodeWav(wav).map { case (n, _) =>
        val buf = java.nio.ByteBuffer.wrap(wav)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val k = Multimodal.VadFrameSamples
        val act = (0 until (n + k - 1) / k).count { f =>
          val end = math.min(f * k + k, n)
          (f * k until end).map(i =>
            math.abs(buf.getShort(44 + 2 * i).toLong)).sum >
            Multimodal.VadThreshold
        }
        id -> act.toLong
      }
    }.toMap
    // independent video side: bright-frame counts over the AVI walk
    val vActive = docs.flatMap { case (id, text, _) =>
      Multimodal.decodeAviFrames(Multimodal.videoAssetPayload(id, text))
        .map { case (_, _, _, fr) =>
          id -> fr.count { case (_, _, fsz, px) => 2 * px > 255L * fsz }.toLong
        }
    }.toMap
    val srcOf = docs.map(d => d._1 -> d._3).toMap
    val pairs = aActive.keySet intersect vActive.keySet
    val expected = pairs.groupBy(srcOf).map { case (src, ids) =>
      val a = ids.toSeq.map(aActive).sum
      val v = ids.toSeq.map(vActive).sum
      (src, ids.size.toLong,
        ids.count(id => (aActive(id) == 0L) != (vActive(id) == 0L)).toLong,
        ids.count { id =>
          val (x, y) = (aActive(id), vActive(id))
          x > 0 && y > 0 && x <= Multimodal.AvSyncBand * y &&
            y <= Multimodal.AvSyncBand * x
        }.toLong,
        a, v,
        if (v > 0) Some(math.floor(a.toDouble / v * 1e6 + 0.5) / 1e6)
        else None)
    }.toSet
    val got = Multimodal.avSync(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("audio neardup: repeated windows count once — exact dup scores 1.0") {
    import spark.implicits._
    // two identical clips, each a 4-window loop repeated 25× (100
    // shingle rows, 4 distinct). Without the per-asset distinct the
    // join yields shared = 4·25² = 2500 and "jaccard" far above 1.
    val loop = Seq(1L, 2L, 3L, 4L)
    val rows = for {
      id <- Seq(10L, 20L); _ <- 0 until 25; sh <- loop
    } yield (id, sh)
    val out = Multimodal
      .audioNeardupPairs(spark, rows.toDF("asset_id", "shingle")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 10L && r.getLong(1) == 20L)
    assert(r.getLong(2) == 4L) // shared = |distinct windows|, not join rows
    assert(r.getDouble(3) == 1.0) // an exact duplicate scores exactly 1.0
  }

  test("audio containment: sub-clip caught even where symmetric jaccard misses") {
    import spark.implicits._
    // clip 1 = 10 windows, all inside clip 2's 100: jaccard = 10/100 =
    // 0.1 (under the 0.5 near-dup bar) but containment of 1 in 2 = 1.0
    val rows = (0L until 10L).map(sh => (1L, sh)) ++
      (0L until 100L).map(sh => (2L, sh))
    val shingles = rows.toDF("asset_id", "shingle")
    assert(Multimodal.audioNeardupPairs(spark, shingles).collect().isEmpty)
    val out = Multimodal
      .containmentFinalize(Multimodal.sharedWindowPairs(spark, shingles,
        Multimodal.AudioDfCut))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 0.1)
  }

  test("audio containment on the fixture: superset of near-dup pairs, bounds sane") {
    val nd = Multimodal.audioNeardup(spark, sf)
      .select("asset_a", "asset_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ct = Multimodal.audioContainment(spark, sf).collect()
    val ctPairs = ct.map(r => (r.getLong(0), r.getLong(1))).toSet
    // containment >= jaccard per pair, so every near-dup pair appears
    assert(nd.subsetOf(ctPairs))
    assert(ct.forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1.0 &&
      r.getDouble(3) > 0 && r.getDouble(3) <= 1.0))
  }

  test("video neardup: re-cut clip matches its source via frame-trigram signatures") {
    import spark.implicits._
    def shingles(id: Long, bytes: Array[Byte]): Seq[(Long, Long)] = {
      val Some((_, _, _, fr)) = Multimodal.decodeAviFrames(bytes)
      val sums = fr.sortBy(_._1).map(_._4)
      (0 until sums.length - 2).map(i =>
        (id, (sums(i) * 65536L + sums(i + 1)) * 65536L + sums(i + 2)))
    }
    // clip 2 is clip 1 re-cut to 5 frames (same seed/dims ⇒ identical
    // leading frames); clip 3 is different content at the same shape
    val rows = shingles(1L, Multimodal.encodeAvi(6, 8, 6, 42)) ++
      shingles(2L, Multimodal.encodeAvi(5, 8, 6, 42)) ++
      shingles(3L, Multimodal.encodeAvi(6, 8, 6, 43))
    val out = Multimodal
      .audioNeardupPairs(spark, rows.toDF("asset_id", "shingle")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 3L) // shared trigrams = min(nf) − 2
    assert(r.getDouble(3) == 0.75) // 3 / (4 + 3 − 3)
  }

  test("audio clusters: partition covers decodable assets, near-dup pairs co-clustered") {
    val clusters = Multimodal.audioClusters(spark, sf).collect()
    val decodable = Multimodal.assets(spark, sf)
      .filter(_.media_type == "audio")
      .collect().filter(a => Multimodal.decodeWav(a.payload).isDefined)
    // every decodable asset lands in exactly one cluster
    assert(clusters.map(_.getLong(1)).sum == decodable.length.toLong)
    assert(clusters.map(_.getLong(0)).distinct.length == clusters.length)
    // clusters merge at least the direct near-dup pairs
    val pairs = Multimodal.audioNeardup(spark, sf)
      .select("asset_a", "asset_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val multi = clusters.filter(_.getLong(1) > 1)
    assert(multi.nonEmpty)
    // the keeper is the longest clip of its family: its sample count
    // is maximal among members reachable via emitted pairs
    val nByAsset = decodable
      .map(a => a.asset_id -> Multimodal.decodeWav(a.payload).get._1).toMap
    val adj = pairs.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    clusters.foreach { c =>
      val keep = c.getLong(2)
      adj.getOrElse(keep, Set.empty).foreach { nbr =>
        assert(nByAsset(keep) >= nByAsset(nbr) ||
          (nByAsset(keep) == nByAsset(nbr) && keep <= nbr))
      }
    }
  }

  test("audio neardup: stop-shingle df-cut drops degenerate constant tones") {
    import spark.implicits._
    // one constant-tone shingle living in AudioDfCut+2 assets — without
    // the cut the silence-family alone would emit (df choose 2) pairs
    // at jaccard 1.0, and its join fan-out would be df² rows
    val hot = (0 until Multimodal.AudioDfCut + 2).map(i => (1000L + i, 7L))
    // one genuine near-dup pair on cold keys that ALSO shares the hot key
    val cold = Seq(1L, 2L).flatMap(id =>
      Seq((id, 100L), (id, 101L), (id, 102L), (id, 7L)))
    val out = Multimodal.audioNeardupPairs(spark,
      (hot ++ cold).toDF("asset_id", "shingle")).collect()
    // the constant-tone family produced NO pairs; the genuine pair
    // survives, scored over its cold keys only (3 of 4 distinct windows)
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.6) // 3 / (4 + 4 − 3)
  }

  test("decoder rejects corrupt payloads: bad magic, truncation, wrong bpp") {
    val good = Multimodal.encodeBmp(5, 3, 77)
    assert(Multimodal.decodeBmp(good).isDefined)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(Multimodal.decodeBmp(badMagic).isEmpty)
    assert(Multimodal.decodeBmp(good.take(40)).isEmpty)
    assert(Multimodal.decodeBmp(good.take(good.length - 1)).isEmpty)
    val badBpp = good.clone(); badBpp(28) = 8.toByte
    assert(Multimodal.decodeBmp(badBpp).isEmpty)
    val d = Multimodal.decode(Multimodal.Asset(1L, "image", badMagic))
    assert(!d.ok && d.luma_sum == 0L)
  }

  test("wav round-trip: hand-computed 3-sample file decodes exactly") {
    // n=3, seed=65500: samples (65500+31i)%65536-32768 = 32732, 32763, -32742
    val bytes = Multimodal.encodeWav(3, 65500)
    assert(bytes.length == 44 + 6)
    assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(bytes, 36, 4, "US-ASCII") == "data")
    val Some((n, amp)) = Multimodal.decodeWav(bytes)
    assert(n == 3)
    assert(amp == 32732L + 32763L + 32742L)
  }

  test("wav decoder rejects corrupt payloads") {
    val good = Multimodal.encodeWav(10, 7)
    assert(Multimodal.decodeWav(good).isDefined)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(Multimodal.decodeWav(badMagic).isEmpty)
    assert(Multimodal.decodeWav(good.take(43)).isEmpty)
    assert(Multimodal.decodeWav(good.take(good.length - 2)).isEmpty)
    val badBits = good.clone(); badBits(34) = 8.toByte
    assert(Multimodal.decodeWav(badBits).isEmpty)
    val d = Multimodal.decode(Multimodal.Asset(1L, "audio", badMagic))
    assert(!d.ok && d.amp_sum == 0L)
  }

  test("batched extraction preserves every row and respects batch bound") {
    import spark.implicits._
    val n = 200
    val in = spark.createDataset((1 to n).map(i =>
      Multimodal.Asset(i.toLong, "video", s"payload$i".getBytes("UTF-8"))))
    val maxBatch = in.mapPartitions(_.grouped(64).map(_.size))
      .collect().max
    assert(maxBatch <= 64)
    val out = Multimodal.extractFeatures(in, 64)
    assert(out.count() == n)
    assert(out.collect().forall(_.features.length == 8))
  }

  test("corpus decode: corrupt images dropped-and-counted, dims real") {
    import spark.implicits._
    val decoded = Multimodal.extractFeatures(Multimodal.assets(spark, sf))
    val imgs = decoded.filter(d => d.media_type == "image").collect()
    val (ok, bad) = imgs.partition(_.ok)
    assert(bad.nonEmpty && bad.forall(_.asset_id % Multimodal.CorruptEvery == 0))
    assert(ok.forall(d => d.width >= 4 && d.width <= 32 &&
      d.height >= 4 && d.height <= 16))
    assert(ok.forall(_.luma_sum > 0))
    // audio decodes through the WAV parse: corrupt fraction dropped,
    // survivors carry real sample stats
    val auds = decoded.filter(d => d.media_type == "audio").collect()
    val (aok, abad) = auds.partition(_.ok)
    assert(abad.nonEmpty &&
      abad.forall(_.asset_id % Multimodal.CorruptEveryAudio == 0))
    assert(aok.forall(d => d.n_samples >= 50 && d.amp_sum > 0))
    // video decodes to metadata-only rows, never corrupt
    assert(decoded.filter(d => d.media_type == "video").collect()
      .forall(d => d.ok && d.width == 0 && d.n_samples == 0))
  }

  test("resize: aspect ratio preserved, never upscales, bounded by target box") {
    val d = Multimodal.Decoded(1L, "image", true, 100L, 200, 100, 0L, 0L,
      0, 0L, Array.fill(8)(0f))
    val r = Multimodal.resizeDims(d, 64, 64)
    assert(r.width == 64 && r.height == 32) // 200x100 -> 64x32 (ratio kept)
    val small = Multimodal.Decoded(2L, "image", true, 10L, 30, 20, 0L, 0L,
      0, 0L, Array.fill(8)(0f))
    assert(Multimodal.resizeDims(small, 64, 64) == small) // no upscale
    import spark.implicits._
    val ds = spark.createDataset(Seq(d, small))
    assert(Multimodal.resizeAll(ds, 64, 64).count() == 2)
  }

  test("frame sampling never carries the payload through the explode") {
    val df = Multimodal.sampleFrames(spark, sf)
    assert(!df.columns.contains("payload"))
    assert(df.count() > 0)
    val vids = Multimodal.assets(spark, sf).filter(_.media_type == "video").count()
    assert(df.select("asset_id").distinct().count() == vids)
  }

  test("png round-trip: all five scanline filters reconstruct the exact pixel fill") {
    // h >= 5 exercises None/Sub/Up/Average/Paeth; w=1 hits the no-left
    // edge of Sub/Average/Paeth on every row
    for ((w, h, seed) <- Seq((4, 7, 13), (1, 6, 200), (33, 5, 0), (3, 11, 240))) {
      val bytes = Multimodal.encodePng(w, h, seed)
      val Some((dw, dh, luma, top)) = Multimodal.decodePng(bytes)
      assert((dw, dh) == (w, h))
      val expLuma = (0 until 3 * w * h).map(j => (seed + 31 * j) % 256).sum.toLong
      val expTop = (0 until 3 * w).map(j => (seed + 31 * j) % 256).sum.toLong
      assert(luma == expLuma, s"($w,$h,$seed): luma $luma != $expLuma")
      assert(top == expTop, s"($w,$h,$seed): top $top != $expTop")
    }
  }

  test("png decoder rejects corruption: flipped IDAT byte (CRC), truncation, bad signature") {
    val good = Multimodal.encodePng(5, 5, 42)
    assert(Multimodal.decodePng(good).isDefined)
    val crcFlip = good.clone()
    crcFlip(45) = (crcFlip(45) ^ 0x5a).toByte
    assert(Multimodal.decodePng(crcFlip).isEmpty, "CRC check must catch a flipped IDAT byte")
    assert(Multimodal.decodePng(good.take(good.length - 13)).isEmpty, "truncated file")
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    assert(Multimodal.decodePng(badSig).isEmpty, "bad signature")
    assert(Multimodal.decodePng(Array.empty[Byte]).isEmpty)
  }

  test("png corpus stats: corrupt-every-19th dropped and counted") {
    val rows = Multimodal.pngStats(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val total = r.getLong(0) + r.getLong(1)
    assert(r.getLong(1) == (0L until total).count(_ % Multimodal.CorruptEveryPng == 0))
    assert(r.getLong(2) > 0 && r.getLong(3) > 0)
  }

  test("jpeg structure parse: dims via marker walk at varying SOF offsets, progressive flag") {
    // COM filler length varies with docId, so the SOF offset moves —
    // each case only passes if the walk skips segments by length field
    for (docId <- Seq(1L, 2L, 5L, 36L, 37L, 73L)) {
      val (w, h) = (16 + 123 % 500, 16 + 123 % 300)
      val jpg = Multimodal.encodeJpeg(w, h, docId)
      val Some((dw, dh, nc, prog, nseg)) = Multimodal.decodeJpeg(jpg)
      assert((dw, dh, nc) == (w, h, 3), s"docId=$docId")
      assert(prog == (docId % 5 == 0), s"progressive flag docId=$docId")
      assert(nseg == 6, s"SOI-less segment count docId=$docId") // APP0 COM DQT SOF SOS EOI
    }
    // 16-bit dims: both bytes of each field must be read big-endian
    val wide = Multimodal.encodeJpeg(515, 315, 3L)
    assert(Multimodal.decodeJpeg(wide).map(t => (t._1, t._2)).contains((515, 315)))
  }

  test("jpeg decoder rejects each failure mode distinctly") {
    val good = Multimodal.encodeJpeg(100, 50, 7L)
    assert(Multimodal.decodeJpeg(good).isDefined)
    val badMagic = good.clone(); badMagic(1) = 'X'.toByte
    assert(Multimodal.decodeJpeg(badMagic).isEmpty, "bad SOI")
    assert(Multimodal.decodeJpeg(good.dropRight(4)).isEmpty, "missing EOI (truncated entropy)")
    // a length field running past the buffer: truncate inside the DQT
    assert(Multimodal.decodeJpeg(good.take(30)).isEmpty, "segment length past buffer")
    // SOS before SOF: strip the SOF segment (19 bytes: marker+len+15)
    val sofAt = {
      var p = 2; var found = -1
      while (found < 0) {
        val m = good(p + 1) & 0xff
        val len = ((good(p + 2) & 0xff) << 8) | (good(p + 3) & 0xff)
        if (m == 0xc0 || m == 0xc2) found = p else p += 2 + len
      }
      found
    }
    val noSof = good.take(sofAt) ++ good.drop(sofAt + 19)
    assert(Multimodal.decodeJpeg(noSof).isEmpty, "SOS with no frame header")
    assert(Multimodal.decodeJpeg(Array.empty[Byte]).isEmpty)
  }

  test("lzw round-trips the adversarial patterns: KwKwK, width growth, dict reset") {
    def rt(px: Array[Byte]): Unit = {
      val dec = Multimodal.lzwDecode(Multimodal.lzwEncode(px), px.length)
      assert(dec.isDefined, s"decode failed for ${px.length} pixels")
      assert(java.util.Arrays.equals(dec.get, px), s"mismatch for ${px.length} pixels")
    }
    rt(Array[Byte](7)) // single pixel
    rt("abababababababab".getBytes("US-ASCII")) // classic KwKwK trigger
    rt(Array.fill(500)(42.toByte)) // runs: deep dictionary chains
    // crosses the 9->10->11 width boundaries (needs >766 dict adds)
    rt(Array.tabulate(6000)(j => ((j * j + 3 * j) % 251).toByte))
    // forces the 4096 dictionary reset (>3838 adds): varied long input
    rt(Array.tabulate(60000)(j => ((j * 7919 + (j >> 3)) % 256).toByte))
  }

  test("gif round-trip recovers dims and pixel sums; decoder rejects stream damage") {
    val good = Multimodal.encodeGif(40, 16, 99)
    val Some((w, h, idx, top)) = Multimodal.decodeGif(good)
    assert((w, h) == (40, 16))
    val expIdx = (0 until 40 * 16).map(j => (99 + 31 * j) % 256).sum.toLong
    val expTop = (0 until 40).map(j => (99 + 31 * j) % 256).sum.toLong
    assert((idx, top) == (expIdx, expTop))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(Multimodal.decodeGif(badMagic).isEmpty, "bad magic")
    assert(Multimodal.decodeGif(good.dropRight(2)).isEmpty, "lost trailer")
    assert(Multimodal.decodeGif(good.take(800)).isEmpty, "truncated sub-blocks")
    // frontier violation: a 12-bit max code injected where the table is
    // still small must be rejected, not indexed out of bounds
    val smallPx = Array.tabulate(30)(_.toByte)
    val enc = Multimodal.lzwEncode(smallPx)
    assert(Multimodal.lzwDecode(enc, 31).isEmpty, "pixel-count mismatch must reject")
    assert(Multimodal.decodeGif(Array.empty[Byte]).isEmpty)
  }

  test("gif corpus stats: corrupt-every-23rd dropped and counted") {
    val r = Multimodal.gifStats(spark, sf).collect().head
    val total = r.getLong(0) + r.getLong(1)
    assert(r.getLong(1) == (0L until total).count(_ % Multimodal.CorruptEveryGif == 0))
    assert(r.getLong(2) > 0 && r.getLong(3) > 0)
  }

  test("jpeg corpus dims: two corruption cadences dropped and counted") {
    val r = Multimodal.jpegDims(spark, sf).collect().head
    val total = r.getLong(0) + r.getLong(1)
    val expCorrupt = (0L until total).count(id =>
      id % Multimodal.CorruptEveryJpeg == 0 || id % Multimodal.TruncateEveryJpeg == 0)
    assert(r.getLong(1) == expCorrupt)
    assert(r.getLong(2) > 0, "progressive frames present")
    assert(r.getLong(5) >= r.getLong(3), "sum_px >= sum_w for h >= 1")
  }

  test("audio vad: counts and longest run recompute from independently decoded samples") {
    val rows = Multimodal.audioVad(spark, sf).collect()
    assert(rows.nonEmpty)
    val byId = Multimodal.assets(spark, sf).filter(_.media_type == "audio")
      .collect().map(a => a.asset_id -> a.payload).toMap
    rows.foreach { r =>
      val (id, nf, na, lr, ratio) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))
      val p = byId(id)
      val buf = java.nio.ByteBuffer.wrap(p)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = (p.length - 44) / 2
      val active = (0 until n).grouped(Multimodal.VadFrameSamples).map { idxs =>
        idxs.map(i => math.abs(buf.getShort(44 + 2 * i).toLong)).sum >
          Multimodal.VadThreshold
      }.toSeq
      assert(nf == active.length && na == active.count(identity))
      var run = 0; var best = 0
      active.foreach(a => { if (a) { run += 1; best = math.max(best, run) } else run = 0 })
      assert(lr == best, s"asset $id longest run")
      assert(math.abs(ratio - math.floor(na.toDouble / nf * 1e6 + 0.5) / 1e6) < 1e-12)
    }
  }

  test("scene cuts: frame count covers the payload, deltas recompute from raw bytes") {
    val byId = Multimodal.assets(spark, sf).filter(_.media_type == "video")
      .collect().map(a => a.asset_id -> a.payload).toMap
    val rows = Multimodal.sceneCuts(spark, sf).collect()
    assert(rows.length == byId.count(_._2.nonEmpty))
    rows.foreach { r =>
      val (id, nf, nc, fc, md) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val p = byId(id)
      assert(nf == (p.length + 99) / 100, s"asset $id frame count")
      val sums = p.grouped(100).map(_.map(_ & 0xff).sum.toLong).toArray
      val deltas = (1 until sums.length).map(i => math.abs(sums(i) - sums(i - 1)))
      assert(nc == deltas.count(_ > Multimodal.SceneCutThreshold))
      assert(md == (if (deltas.isEmpty) 0L else deltas.max))
      assert(fc == deltas.zipWithIndex
        .find(_._1 > Multimodal.SceneCutThreshold).map(_._2 + 1L).getOrElse(-1L))
    }
  }

  test("ahash: deterministic on real bytes, rejects corrupt, pairs recompute exactly") {
    val bmp = Multimodal.encodeBmp(16, 8, 42)
    val c1 = Multimodal.ahashChunks(bmp).get
    val c2 = Multimodal.ahashChunks(Multimodal.encodeBmp(16, 8, 42)).get
    assert(c1.toSeq == c2.toSeq && c1.length == 4)
    assert(c1.forall(c => c >= 0 && c <= 0xffff))
    val bad = bmp.clone(); bad(0) = 'X'.toByte
    assert(Multimodal.ahashChunks(bad).isEmpty)
    // every reported pair must reproduce its hamming from an
    // independent re-decode of the two payloads
    val hashes = Multimodal.assets(spark, sf).filter(_.media_type == "image")
      .collect()
      .flatMap(a => Multimodal.ahashChunks(a.payload).map(a.asset_id -> _))
      .toMap
    val pairs = Multimodal.phashPairs(spark, sf).collect()
    assert(pairs.nonEmpty, "the synthetic corpus contains near-dup images")
    pairs.foreach { r =>
      val (a, b, hm) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b)
      val d = (0 until 4).map(i =>
        Integer.bitCount(hashes(a)(i) ^ hashes(b)(i))).sum
      assert(d == hm && d <= 3, s"pair ($a,$b): reported $hm, recomputed $d")
    }
  }

  test("avi round-trip: hand-computed 2-frame container decodes exactly") {
    val avi = Multimodal.encodeAvi(nf = 2, w = 3, h = 2, seed = 5)
    val Some((nf, w, h, px)) = Multimodal.decodeAvi(avi)
    assert((nf, w, h) == ((2, 3, 2)))
    // frame f byte j = (5 + 31j + 7f) % 256, j < 6
    val expect = (for (f <- 0 until 2; j <- 0 until 6)
      yield (5 + 31 * j + 7 * f) % 256).sum.toLong
    assert(px == expect)
  }

  test("avi frame walk: per-frame offsets/sizes/sums, idx1 cross-checked") {
    // 3 frames, 3x2 = 6 bytes each (even, pad 0): movi-relative offsets
    // 4, 18, 32 (fourcc 'movi' at 0, each chunk 8 + 6)
    val avi = Multimodal.encodeAvi(nf = 3, w = 3, h = 2, seed = 11)
    val Some((nf, w, h, fr)) = Multimodal.decodeAviFrames(avi)
    assert((nf, w, h) == ((3, 3, 2)))
    assert(fr.map(_._1) == IndexedSeq(0, 1, 2))
    assert(fr.map(_._2) == IndexedSeq(4L, 18L, 32L))
    assert(fr.forall(_._3 == 6))
    assert(fr.map(_._4) == (0 until 3).map(f =>
      (0 until 6).map(j => ((11 + 31 * j + 7 * f) % 256).toLong).sum))
    // ODD frame size exercises the pad rule: 3x3 = 9 bytes, padded to 10
    // per RIFF; offsets stride 8 + 9 + 1 = 18
    val odd = Multimodal.encodeAvi(nf = 2, w = 3, h = 3, seed = 7)
    val Some((_, _, _, fo)) = Multimodal.decodeAviFrames(odd)
    assert(fo.map(_._2) == IndexedSeq(4L, 22L) && fo.forall(_._3 == 9))
    // an idx1 entry whose OFFSET disagrees with the movi walk must fail
    // the per-entry cross-check (count still matches)
    val idxAt = {
      var p = 12; var found = -1
      def tag(o: Int) = new String(avi, o, 4, "US-ASCII")
      def u32(o: Int) = (avi(o) & 0xff) | ((avi(o + 1) & 0xff) << 8) |
        ((avi(o + 2) & 0xff) << 16) | ((avi(o + 3) & 0xff) << 24)
      while (found < 0 && p + 8 <= avi.length) {
        if (tag(p) == "idx1") found = p
        else p += 8 + u32(p + 4) + (u32(p + 4) & 1)
      }
      found
    }
    assert(idxAt > 0)
    val badOff = avi.clone()
    badOff(idxAt + 8 + 8) = 5 // first entry dwOffset := 5, walk says 4
    assert(Multimodal.decodeAviFrames(badOff).isEmpty)
    assert(Multimodal.decodeAvi(badOff).isEmpty)
  }

  test("avi walker rejects structural violations, not just bad magic") {
    val good = Multimodal.encodeAvi(3, 4, 3, 9)
    assert(Multimodal.decodeAvi(good).isDefined)
    // bad magic
    val m = good.clone(); m(0) = 'X'.toByte
    assert(Multimodal.decodeAvi(m).isEmpty)
    // truncated inside movi
    assert(Multimodal.decodeAvi(good.take(good.length - 20)).isEmpty)
    // idx1 entry count no longer matches the frame count (declared size
    // shrunk by one entry) — the cross-check must fire
    val idxAt = {
      var p = 12; var found = -1
      def tag(o: Int) = new String(good, o, 4, "US-ASCII")
      def u32(o: Int) = (good(o) & 0xff) | ((good(o + 1) & 0xff) << 8) |
        ((good(o + 2) & 0xff) << 16) | ((good(o + 3) & 0xff) << 24)
      while (found < 0 && p + 8 <= good.length) {
        if (tag(p) == "idx1") found = p
        else p += 8 + u32(p + 4) + (u32(p + 4) & 1)
      }
      found
    }
    assert(idxAt > 0)
    val bad = good.clone()
    val newSz = 16 * 2 // claims 2 entries for a 3-frame file
    bad(idxAt + 4) = (newSz & 0xff).toByte
    bad(idxAt + 5) = ((newSz >> 8) & 0xff).toByte
    bad(idxAt + 6) = 0; bad(idxAt + 7) = 0
    // shrink the trailing chunk so the walk still ends inside the buffer
    assert(Multimodal.decodeAvi(bad.take(idxAt + 8 + newSz)).isEmpty)
    // frame chunk size disagreeing with avih dims
    val movi = {
      var p = 12
      def tag(o: Int) = new String(bad, o, 4, "US-ASCII")
      def u32(o: Int) = (good(o) & 0xff) | ((good(o + 1) & 0xff) << 8) |
        ((good(o + 2) & 0xff) << 16) | ((good(o + 3) & 0xff) << 24)
      var found = -1
      while (found < 0 && p + 12 <= good.length) {
        if (tag(p) == "LIST" && tag(p + 8) == "movi") found = p
        else p += 8 + u32(p + 4) + (u32(p + 4) & 1)
      }
      found
    }
    assert(movi > 0)
    val wrongFsz = good.clone()
    wrongFsz(movi + 12 + 4) = 5 // first '00db' size := 5 != w*h = 12
    assert(Multimodal.decodeAvi(wrongFsz).isEmpty)
  }
}
