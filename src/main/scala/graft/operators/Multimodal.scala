package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with a typed metadata struct, and batch-shaped decode /
  * feature-extract / frame-sample operators.
  *
  * The decode step is a clearly-marked deterministic STUB (no image or
  * audio libraries exist in this container); everything around it — the
  * schema, the binary column handling, the `mapPartitions` batch shape
  * (the Scala analog of a vectorized/arrow UDF: process fixed-size
  * batches, amortize per-batch model setup), the partitioning — is real
  * and tested. Swapping the stub for a JNI/ONNX decoder changes one
  * function.
  *
  * Scale notes: payloads never enter a shuffle (all ops are narrow maps
  * before aggregation); frame sampling explodes rows but projects the
  * payload away first.
  */
object Multimodal {

  /** A decoded media record: fixed metadata + a small feature vector. */
  case class Decoded(asset_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, features: Array[Float])

  case class Asset(asset_id: Long, media_type: String, payload: Array[Byte])

  /** Deterministic synthetic asset table derived from `documents`:
    * payload = UTF-8 bytes of the text (standing in for encoded media),
    * media_type cycles image/audio/video by doc_id.
    */
  def assets(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    Tables.documents(s, dir)
      .selectExpr("doc_id AS asset_id",
        "element_at(array('image', 'audio', 'video'), CAST(doc_id % 3 AS INT) + 1) AS media_type",
        "CAST(text AS BINARY) AS payload")
      .as[Asset]
  }

  /** ======== STUB ========
    * Deterministic fake decode: derives metadata + an 8-dim "feature
    * vector" from the payload bytes. A real implementation decodes the
    * image/audio here (e.g. via JNI); the signature and batch contract
    * are what the pipeline depends on.
    */
  def decodeStub(a: Asset): Decoded = {
    val n = a.payload.length
    val head = a.payload.take(16).map(_ & 0xff)
    val feats = Array.tabulate(8)(i =>
      (head.lift(i * 2).getOrElse(0) * 31 + head.lift(i * 2 + 1).getOrElse(0)).toFloat / 255f)
    Decoded(a.asset_id, a.media_type, n.toLong,
      width = 16 + (n % 240), height = 16 + (n % 135), feats)
  }

  /** Batched feature extraction: mapPartitions over fixed-size batches —
    * the Spark-side shape of a vectorized decode UDF. `batchSize` bounds
    * peak memory per task (batch of payloads, not the whole partition).
    */
  def extractFeatures(in: Dataset[Asset], batchSize: Int = 64): Dataset[Decoded] = {
    import in.sparkSession.implicits._
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would happen here (model session, decoder ctx)
        batch.map(decodeStub)
      }
    }
  }

  /** ======== STUB ========
    * Resize: recompute metadata for a target bounding box preserving
    * aspect ratio; the pixel work is the stubbed part (a real decoder
    * resamples payload bytes here), the metadata/contract is real.
    */
  def resizeStub(d: Decoded, maxW: Int, maxH: Int): Decoded = {
    val scale = math.min(maxW.toDouble / d.width, maxH.toDouble / d.height)
    if (scale >= 1.0) d
    else d.copy(
      width = math.max(1, (d.width * scale).toInt),
      height = math.max(1, (d.height * scale).toInt))
  }

  /** Batched resize over decoded assets — same mapPartitions batch shape
    * as extraction; composes after [[extractFeatures]].
    */
  def resizeAll(in: Dataset[Decoded], maxW: Int = 64, maxH: Int = 64,
      batchSize: Int = 64): Dataset[Decoded] = {
    import in.sparkSession.implicits._
    in.mapPartitions(_.grouped(batchSize).flatMap(_.map(resizeStub(_, maxW, maxH))))
  }

  /** Frame sampling for video assets: one row per sampled frame index.
    * The payload is projected away BEFORE the explode so the row
    * multiplication never copies megabyte blobs.
    */
  def sampleFrames(s: SparkSession, dir: String, everyNth: Int = 10): DataFrame = {
    import s.implicits._
    val vids = assets(s, dir).filter(_.media_type == "video")
      .map(a => (a.asset_id, a.payload.length))
      .toDF("asset_id", "n_bytes")
    vids.selectExpr("asset_id", "n_bytes",
      s"explode(sequence(0, CAST(n_bytes / 100 AS INT), $everyNth)) AS frame_idx")
  }

  /** Driver-contract query: per-media-type stats AFTER the binary
    * round-trip + batched decode. n_bytes comes out of the decoded
    * payload, so the oracle (strlen on the source text) only matches if
    * the binary plumbing is lossless.
    */
  def assetStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(assets(s, dir)).toDF()
      .groupBy($"media_type")
      .agg(count(lit(1)).as("n_assets"), sum($"n_bytes").as("sum_bytes"))
  }

  val assetStatsSql: String =
    """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |            WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  count(*) AS n_assets, CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes
      |FROM documents
      |GROUP BY 1""".stripMargin

  /** Driver-contract query through decode → resize: per-media-type sums
    * of the resized dimensions. The dimension formulas are integer/
    * double arithmetic on byte counts, so the oracle restates them in
    * SQL — a mismatch would mean the batched resize plumbing altered
    * rows or dropped the aspect-ratio contract.
    */
  def resizedDims(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    resizeAll(extractFeatures(assets(s, dir))).toDF()
      .groupBy($"media_type")
      .agg(count(lit(1)).as("n_assets"),
        sum($"width").as("sum_w"), sum($"height").as("sum_h"))
  }

  val resizedDimsSql: String =
    """WITH decoded AS (
      |  SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |              WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |    16 + (strlen(text) % 240) AS w, 16 + (strlen(text) % 135) AS h
      |  FROM documents),
      |resized AS (
      |  SELECT media_type,
      |    CASE WHEN least(64.0 / w, 64.0 / h) >= 1.0 THEN w
      |         ELSE greatest(1, CAST(trunc(w * least(64.0 / w, 64.0 / h)) AS INT)) END AS w,
      |    CASE WHEN least(64.0 / w, 64.0 / h) >= 1.0 THEN h
      |         ELSE greatest(1, CAST(trunc(h * least(64.0 / w, 64.0 / h)) AS INT)) END AS h
      |  FROM decoded)
      |SELECT media_type, count(*) AS n_assets,
      |  CAST(sum(w) AS BIGINT) AS sum_w, CAST(sum(h) AS BIGINT) AS sum_h
      |FROM resized GROUP BY media_type""".stripMargin

  /** Image–caption pair mining — the multimodal training-pair
    * construction step: image assets joined to quality-gated captions
    * (English, ≥20 tokens), summarized per source. The payload never
    * enters the join (only its byte length is projected), which is the
    * rule for any multimodal join at 100 TB: metadata moves, blobs
    * stay put until the final pair materialization.
    */
  def captionPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val imgs = assets(s, dir).toDF()
      .where($"media_type" === "image")
      .select($"asset_id", length($"payload").as("n_bytes"))
    val caps = Tables.documents(s, dir)
      .where($"lang" === "en")
      .selectExpr("doc_id", "source", s"size(${TextOps.tokensExpr}) AS n_toks")
      .where($"n_toks" >= 20)
    imgs.join(caps, $"asset_id" === $"doc_id")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"n_bytes").as("sum_bytes"),
        sum($"n_toks").as("sum_caption_toks"))
  }

  val captionPairsSql: String =
    s"""SELECT source, count(*) AS n_pairs,
       |  CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes,
       |  CAST(sum(n_toks) AS BIGINT) AS sum_caption_toks
       |FROM (
       |  SELECT doc_id, source, text, len(${TextOps.duckTokensExpr}) AS n_toks
       |  FROM documents
       |  WHERE lang = 'en' AND doc_id % 3 = 0)
       |WHERE n_toks >= 20
       |GROUP BY source""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_asset_stats" -> (assetStats _),
    "mm_resized_dims" -> (resizedDims _),
    "mm_caption_pairs" -> (captionPairs _))

  def oracles: Map[String, String] = Map(
    "mm_asset_stats" -> assetStatsSql,
    "mm_resized_dims" -> resizedDimsSql,
    "mm_caption_pairs" -> captionPairsSql)
}
