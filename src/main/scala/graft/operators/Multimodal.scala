package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with a typed metadata struct, and batch-shaped decode /
  * feature-extract / frame-sample operators.
  *
  * Image assets are REAL BMP binaries (24-bit uncompressed BI_RGB,
  * little-endian headers, 4-byte-aligned bottom-up rows) built
  * deterministically from the documents table, and [[decode]] is a
  * genuine byte-level decoder: it parses the BITMAPFILEHEADER /
  * BITMAPINFOHEADER fields, validates magic/bpp/compression/bounds, and
  * walks the padded bottom-up pixel array to produce dimension and pixel
  * statistics. Audio assets are REAL RIFF/WAVE PCM16 binaries and their
  * decode is a genuine chunk parse + sample walk. A corrupt payload
  * (bad magic, truncated array, wrong header) is dropped-and-counted,
  * the same contract as the Avro drop-malformed path (reference
  * semantics: kafka-storm-starter AvroDecoderBolt ignoring undecodable
  * tuples). Video payloads stay opaque (no container format in scope)
  * — their decode is the byte-length metadata pass.
  *
  * Because the BMP bytes are a closed-form function of (doc_id, text
  * byte-length), every decoded statistic — dimensions, file size, pixel
  * sums including row padding and the bottom-up flip — is restated
  * exactly in the DuckDB oracles; a decoder that mis-handled stride
  * alignment or row order would hash-mismatch.
  *
  * Scale notes: payloads never enter a shuffle (all ops are narrow maps
  * before aggregation); decode runs in fixed-size batches inside
  * `mapPartitions` (the Scala analog of a vectorized/arrow UDF —
  * per-batch decoder setup amortized, peak memory bounded by the batch,
  * not the partition); frame sampling explodes rows but projects the
  * payload away first.
  */
object Multimodal {

  /** A decoded media record: `ok=false` marks a corrupt payload (kept as
    * a counted tombstone through the batch so drop-and-count is one
    * pass; downstream consumers filter on `ok`). Pixel fields are zero
    * for non-image media and for corrupt rows.
    */
  case class Decoded(asset_id: Long, media_type: String, ok: Boolean,
      n_bytes: Long, width: Int, height: Int,
      luma_sum: Long, top_row_sum: Long,
      n_samples: Int, amp_sum: Long, features: Array[Float])

  case class Asset(asset_id: Long, media_type: String, payload: Array[Byte])

  // ------------------------------------------------------- BMP codec

  /** Channel byte value at LOGICAL byte index j (row-major top-down,
    * BGR interleaved): the deterministic pixel fill both the encoder
    * and the oracle restate.
    */
  @inline private def channelByte(seed: Int, j: Int): Int = (seed + 31 * j) % 256

  /** Row stride: 24-bit rows padded to a 4-byte boundary. */
  @inline def bmpStride(w: Int): Int = ((3 * w + 3) / 4) * 4

  /** Build a real 24-bit BI_RGB BMP: 54-byte header, positive height
    * (= bottom-up row order), padded rows. Logical pixels are laid
    * top-down by [[channelByte]]; the encoder writes file rows
    * bottom-up, so decoding must un-flip to recover them.
    */
  def encodeBmp(w: Int, h: Int, seed: Int): Array[Byte] = {
    val stride = bmpStride(w)
    val imageSize = stride * h
    val fileSize = 54 + imageSize
    val buf = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(fileSize).putShort(0).putShort(0).putInt(54) // offset
    buf.putInt(40).putInt(w).putInt(h)                      // BITMAPINFOHEADER
    buf.putShort(1).putShort(24).putInt(0).putInt(imageSize)
    buf.putInt(0).putInt(0).putInt(0).putInt(0)
    var fileRow = 0
    while (fileRow < h) {
      val y = h - 1 - fileRow // bottom-up: first stored row is the last logical one
      var xb = 0
      while (xb < 3 * w) {
        buf.put(channelByte(seed, y * 3 * w + xb).toByte)
        xb += 1
      }
      var pad = 3 * w
      while (pad < stride) { buf.put(0.toByte); pad += 1 }
      fileRow += 1
    }
    buf.array()
  }

  /** Genuine BMP parse: header fields, validation, padded bottom-up
    * pixel walk. Returns (width, height, luma_sum over every channel
    * byte, channel sum of the logical TOP row — an order-sensitive stat
    * that fails if the bottom-up flip is skipped), or None when the
    * payload is not a well-formed 24-bit BI_RGB BMP.
    */
  def decodeBmp(bytes: Array[Byte]): Option[(Int, Int, Long, Long)] = {
    if (bytes.length < 54 || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte)
      return None
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val fileSize = buf.getInt(2)
    val pixelOffset = buf.getInt(10)
    val dibSize = buf.getInt(14)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    val planes = buf.getShort(26)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    if (fileSize != bytes.length || dibSize != 40 || planes != 1 ||
      bpp != 24 || compression != 0 || w <= 0 || h <= 0) return None
    val stride = bmpStride(w)
    if (pixelOffset < 54 || pixelOffset + stride.toLong * h > bytes.length)
      return None
    var luma = 0L
    var topRow = 0L
    var fileRow = 0
    while (fileRow < h) {
      val y = h - 1 - fileRow
      val rowStart = pixelOffset + fileRow * stride
      var xb = 0
      while (xb < 3 * w) { // padding bytes excluded from the stats
        val v = bytes(rowStart + xb) & 0xff
        luma += v
        if (y == 0) topRow += v
        xb += 1
      }
      fileRow += 1
    }
    Some((w, h, luma, topRow))
  }

  /** Image geometry derived from the document: text BYTE length drives
    * the dimensions (mirrors real corpora where asset size varies with
    * the record), doc_id seeds the pixel fill. Every term is restated in
    * the oracles.
    */
  @inline private def imgW(nTextBytes: Int): Int = 4 + nTextBytes % 29
  @inline private def imgH(nTextBytes: Int): Int = 4 + nTextBytes % 13
  @inline private def imgSeed(docId: Long): Int = (docId % 251).toInt

  /** Every 17th image / 23rd audio asset is corrupted (magic
    * overwritten) — the drop-malformed fixture, like the flipped-bit
    * Avro blobs in codec_corrupt_drop.
    */
  val CorruptEvery = 17
  val CorruptEveryAudio = 23

  // ------------------------------------------------------- WAV codec

  /** PCM16 sample value at index i — the deterministic fill both the
    * encoder and the oracle restate.
    */
  @inline private def sampleVal(seed: Int, i: Int): Int =
    (seed + 31 * i) % 65536 - 32768

  @inline private def audN(nTextBytes: Int): Int = 50 + nTextBytes % 211
  @inline private def audSeed(docId: Long): Int = (docId % 9973).toInt

  /** Build a real canonical 44-byte-header RIFF/WAVE file: PCM (format
    * 1), mono, 8 kHz, 16-bit little-endian samples.
    */
  def encodeWav(n: Int, seed: Int): Array[Byte] = {
    val dataSize = 2 * n
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(1).putInt(8000).putInt(16000)
    buf.putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) { buf.putShort(sampleVal(seed, i).toShort); i += 1 }
    buf.array()
  }

  /** Genuine WAV parse: RIFF/WAVE magics, fmt chunk validation (PCM,
    * mono, 16-bit), data chunk bounds, then the sample walk. Returns
    * (n_samples, sum of |amplitude|) or None for malformed payloads.
    */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Long)] = {
    if (bytes.length < 44) return None
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE" || tag(12) != "fmt " ||
      tag(36) != "data") return None
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val chunkSize = buf.getInt(4)
    val fmtSize = buf.getInt(16)
    val fmt = buf.getShort(20)
    val channels = buf.getShort(22)
    val bits = buf.getShort(34)
    val dataSize = buf.getInt(40)
    if (chunkSize != bytes.length - 8 || fmtSize != 16 || fmt != 1 ||
      channels != 1 || bits != 16 || dataSize < 0 ||
      44L + dataSize != bytes.length || dataSize % 2 != 0) return None
    val n = dataSize / 2
    var amp = 0L
    var i = 0
    while (i < n) { amp += math.abs(buf.getShort(44 + 2 * i).toLong); i += 1 }
    Some((n, amp))
  }

  /** Deterministic asset table derived from `documents`: media_type
    * cycles image/audio/video by doc_id; image payloads are real encoded
    * BMPs, audio payloads real encoded PCM16 WAVs (each with its
    * deterministic corrupt fraction); video stays opaque UTF-8 bytes
    * (no container format in scope — its decode is the byte-length
    * metadata pass).
    */
  def assets(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    Tables.spread(Tables.documents(s, dir), "doc_id")
      .selectExpr("doc_id",
        "element_at(array('image', 'audio', 'video'), CAST(doc_id % 3 AS INT) + 1) AS media_type",
        "text")
      .as[(Long, String, String)]
      .map { case (id, mt, text) =>
        val tb = text.getBytes("UTF-8")
        mt match {
          case "image" =>
            val bmp = encodeBmp(imgW(tb.length), imgH(tb.length), imgSeed(id))
            if (id % CorruptEvery == 0) bmp(0) = 'X'.toByte
            Asset(id, mt, bmp)
          case "audio" =>
            val wav = encodeWav(audN(tb.length), audSeed(id))
            if (id % CorruptEveryAudio == 0) wav(0) = 'X'.toByte
            Asset(id, mt, wav)
          case _ => Asset(id, mt, tb)
        }
      }
  }

  /** Full decode of one asset: BMP parse for images, WAV parse for
    * audio (corrupt → counted tombstone either way), byte-length
    * metadata for opaque video.
    */
  def decode(a: Asset): Decoded = a.media_type match {
    case "image" => decodeBmp(a.payload) match {
      case Some((w, h, luma, topRow)) =>
        val feats = Array.tabulate(8)(i =>
          (a.payload.lift(54 + i).map(_ & 0xff).getOrElse(0)).toFloat / 255f)
        Decoded(a.asset_id, a.media_type, ok = true, a.payload.length.toLong,
          w, h, luma, topRow, 0, 0L, feats)
      case None => corrupt(a)
    }
    case "audio" => decodeWav(a.payload) match {
      case Some((n, amp)) =>
        val feats = Array.tabulate(8)(i =>
          (a.payload.lift(44 + i).map(_ & 0xff).getOrElse(0)).toFloat / 255f)
        Decoded(a.asset_id, a.media_type, ok = true, a.payload.length.toLong,
          0, 0, 0L, 0L, n, amp, feats)
      case None => corrupt(a)
    }
    case _ =>
      val head = a.payload.take(16).map(_ & 0xff)
      val feats = Array.tabulate(8)(i =>
        (head.lift(i * 2).getOrElse(0) * 31 + head.lift(i * 2 + 1).getOrElse(0)).toFloat / 255f)
      Decoded(a.asset_id, a.media_type, ok = true, a.payload.length.toLong,
        0, 0, 0L, 0L, 0, 0L, feats)
  }

  private def corrupt(a: Asset): Decoded =
    Decoded(a.asset_id, a.media_type, ok = false, 0L, 0, 0, 0L, 0L, 0, 0L,
      Array.empty[Float])

  /** Batched decode: mapPartitions over fixed-size batches — the Spark
    * shape of a vectorized decode UDF. `batchSize` bounds peak memory
    * per task (a batch of payloads, not the whole partition); per-batch
    * decoder setup would amortize here.
    */
  def extractFeatures(in: Dataset[Asset], batchSize: Int = 64): Dataset[Decoded] = {
    import in.sparkSession.implicits._
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would happen here (decoder ctx, model session)
        batch.map(decode)
      }
    }
  }

  /** Resize metadata for a target bounding box preserving aspect ratio,
    * from the REAL decoded dimensions; never upscales. (Pixel resampling
    * is out of scope — dims are what the packing/indexing stages
    * consume.)
    */
  def resizeDims(d: Decoded, maxW: Int, maxH: Int): Decoded = {
    val scale = math.min(maxW.toDouble / d.width, maxH.toDouble / d.height)
    if (scale >= 1.0) d
    else d.copy(
      width = math.max(1, (d.width * scale).toInt),
      height = math.max(1, (d.height * scale).toInt))
  }

  /** Batched resize over decoded assets — same mapPartitions batch shape
    * as extraction; composes after [[extractFeatures]].
    */
  def resizeAll(in: Dataset[Decoded], maxW: Int = 16, maxH: Int = 16,
      batchSize: Int = 64): Dataset[Decoded] = {
    import in.sparkSession.implicits._
    in.mapPartitions(_.grouped(batchSize).flatMap(_.map(resizeDims(_, maxW, maxH))))
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

  // ------------------------------------------------------- PNG codec

  /** PNG geometry/seed derivation — a separate population from the BMP
    * images (own cadence, own fill seed) so the existing image oracles
    * stay byte-stable.
    */
  @inline private def pngW(nTextBytes: Int): Int = 3 + nTextBytes % 31
  @inline private def pngH(nTextBytes: Int): Int = 3 + nTextBytes % 11
  @inline private def pngSeed(docId: Long): Int = (docId % 241).toInt
  val CorruptEveryPng = 19

  private val PngSig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
    .map(_.toByte)

  /** Paeth predictor (PNG spec §9.4) — shared by encode and decode. */
  @inline private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val t = tpe.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    java.nio.ByteBuffer.allocate(12 + data.length)
      .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt)
      .array()
  }

  /** Build a real 8-bit RGB PNG: signature, IHDR, one zlib-deflated
    * IDAT, IEND — each chunk CRC32-stamped. Scanline y uses filter type
    * y % 5, FORWARD-filtered per the spec (Sub/Up/Average/Paeth against
    * the raw previous row), so a decoder that mis-implements any filter
    * or skips CRC/inflate cannot reproduce the pixel fill. Logical
    * pixels are the same closed-form channel fill convention as BMP:
    * byte j of row-major RGB = (seed + 31·j) mod 256.
    */
  def encodePng(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rowLen = 3 * w
    val raw = Array.tabulate(h, rowLen)((y, x) =>
      ((seed + 31 * (y * rowLen + x)) % 256).toByte)
    val filtered = new Array[Byte](h * (rowLen + 1))
    var y = 0
    while (y < h) {
      val ft = y % 5
      filtered(y * (rowLen + 1)) = ft.toByte
      var x = 0
      while (x < rowLen) {
        val cur = raw(y)(x) & 0xff
        val left = if (x >= 3) raw(y)(x - 3) & 0xff else 0
        val up = if (y > 0) raw(y - 1)(x) & 0xff else 0
        val ul = if (y > 0 && x >= 3) raw(y - 1)(x - 3) & 0xff else 0
        val out = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        filtered(y * (rowLen + 1) + 1 + x) = (out & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Genuine PNG decode: signature check, chunk walk with per-chunk
    * CRC32 verification, IHDR parse (8-bit RGB non-interlaced only),
    * zlib inflate of the concatenated IDAT stream, and full scanline
    * UNfiltering (None/Sub/Up/Average/Paeth against the reconstructed
    * previous row). Returns (width, height, luma_sum over every
    * unfiltered channel byte, top-row channel sum); None on any
    * malformed byte — a flipped IDAT byte fails the CRC, a truncated
    * stream fails the inflate or the row count.
    */
  def decodePng(bytes: Array[Byte]): Option[(Int, Int, Long, Long)] = {
    if (bytes.length < 8 + 12 * 3 + 13) return None
    var i = 0
    while (i < 8) { if (bytes(i) != PngSig(i)) return None; i += 1 }
    var pos = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd) {
      if (pos + 12 > bytes.length) return None
      val bb = java.nio.ByteBuffer.wrap(bytes, pos, 8)
      val len = bb.getInt
      if (len < 0 || pos + 12 + len > bytes.length) return None
      val tpe = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      val stored = java.nio.ByteBuffer.wrap(bytes, pos + 8 + len, 4).getInt
      if (crc.getValue.toInt != stored) return None
      tpe match {
        case "IHDR" =>
          if (len != 13) return None
          val ib = java.nio.ByteBuffer.wrap(bytes, pos + 8, 13)
          w = ib.getInt; h = ib.getInt
          val bitDepth = ib.get(); val colorType = ib.get()
          val compression = ib.get(); val filterM = ib.get(); val interlace = ib.get()
          if (w <= 0 || h <= 0 || bitDepth != 8 || colorType != 2 ||
            compression != 0 || filterM != 0 || interlace != 0) return None
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      pos += 12 + len
    }
    if (w < 0) return None
    val rowLen = 3 * w
    val expected = h * (rowLen + 1)
    val inflated = new Array[Byte](expected)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < expected && !inf.finished()) {
        val k = inf.inflate(inflated, off, expected - off)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary()))
          return None // truncated or dictionary-requiring stream
        off += k
      }
      // exact size: short stream and over-long stream are both malformed.
      // The trailer (adler32) may need one more inflate call to consume —
      // a real extra output byte means the stream is over-long.
      if (off != expected) return None
      if (!inf.finished()) {
        val scratch = new Array[Byte](1)
        if (inf.inflate(scratch) > 0 || !inf.finished()) return None
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    val prev = new Array[Int](rowLen)
    val cur = new Array[Int](rowLen)
    var luma = 0L; var topRow = 0L
    var y = 0
    while (y < h) {
      val ft = inflated(y * (rowLen + 1)) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < rowLen) {
        val f = inflated(y * (rowLen + 1) + 1 + x) & 0xff
        val left = if (x >= 3) cur(x - 3) else 0
        val up = if (y > 0) prev(x) else 0
        val ul = if (y > 0 && x >= 3) prev(x - 3) else 0
        cur(x) = ft match {
          case 0 => f
          case 1 => (f + left) & 0xff
          case 2 => (f + up) & 0xff
          case 3 => (f + (left + up) / 2) & 0xff
          case 4 => (f + paeth(left, up, ul)) & 0xff
        }
        luma += cur(x)
        if (y == 0) topRow += cur(x)
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, rowLen)
      y += 1
    }
    Some((w, h, luma, topRow))
  }

  /** PNG asset population: one per document, corrupt every 19th by
    * XOR-ing a byte INSIDE the IDAT payload — the CRC check (not a
    * magic-byte test) must catch it.
    */
  def pngAssets(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    Tables.spread(Tables.documents(s, dir), "doc_id")
      .selectExpr("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val tb = text.getBytes("UTF-8")
        val png = encodePng(pngW(tb.length), pngH(tb.length), pngSeed(id))
        if (id % CorruptEveryPng == 0) {
          val mid = 8 + 12 + 13 + 8 + 4 // a byte inside the IDAT data
          png(mid) = (png(mid) ^ 0x5a).toByte
        }
        Asset(id, "png", png)
      }
  }

  /** PNG proof query: decode every asset through the batched shape,
    * drop-and-count corrupt payloads, and sum the unfiltered pixel
    * stats. The oracle recomputes luma/top-row from the closed-form
    * fill — a decoder that mis-handles any of the five scanline filters,
    * the zlib stream, or the chunk CRCs cannot hash-match.
    */
  def pngStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val decoded = pngAssets(s, dir).mapPartitions {
      _.grouped(64).flatMap(_.map { a =>
        decodePng(a.payload) match {
          case Some((w, h, luma, top)) =>
            Decoded(a.asset_id, a.media_type, ok = true, a.payload.length.toLong,
              w, h, luma, top, 0, 0L, Array.empty[Float])
          case None => corrupt(a)
        }
      })
    }.toDF()
    decoded.agg(
      count(when($"ok", 1)).as("n_png"),
      count(when(!$"ok", 1)).as("n_corrupt"),
      sum(when($"ok", $"luma_sum")).as("sum_luma"),
      sum(when($"ok", $"top_row_sum")).as("sum_top_row"))
  }

  val pngStatsSql: String =
    s"""WITH png AS (
       |  SELECT doc_id, 3 + strlen(text) % 31 AS w, 3 + strlen(text) % 11 AS h,
       |    CAST(doc_id % 241 AS INTEGER) AS seed,
       |    doc_id % $CorruptEveryPng = 0 AS corrupt
       |  FROM documents)
       |SELECT count(CASE WHEN NOT corrupt THEN 1 END) AS n_png,
       |  count(CASE WHEN corrupt THEN 1 END) AS n_corrupt,
       |  CAST(sum(CASE WHEN NOT corrupt THEN list_sum(list_transform(
       |    range(0, 3 * w * h), j -> (seed + 31 * j) % 256)) END) AS BIGINT)
       |    AS sum_luma,
       |  CAST(sum(CASE WHEN NOT corrupt THEN list_sum(list_transform(
       |    range(0, 3 * w), j -> (seed + 31 * j) % 256)) END) AS BIGINT)
       |    AS sum_top_row
       |FROM png""".stripMargin

  // ------------------------------------------------------- GIF codec

  @inline private def gifW(nTextBytes: Int): Int = 3 + nTextBytes % 41
  @inline private def gifH(nTextBytes: Int): Int = 3 + nTextBytes % 17
  @inline private def gifSeed(docId: Long): Int = (docId % 239).toInt
  val CorruptEveryGif = 23

  /** GIF-variant LZW encoder over 8-bit pixel indices — a REAL
    * dictionary coder (PNG above delegates to zlib; this is the
    * in-house one): variable-width codes starting at 9 bits, CLEAR=256
    * / EOI=257, width grows when the next free code fills the current
    * width, dictionary reset via CLEAR at 4096. LSB-first bit packing,
    * payload chopped into ≤255-byte sub-blocks per the GIF spec.
    */
  def lzwEncode(pixels: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    def putCode(code: Int, width: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += width
      while (bitCnt >= 8) { out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8 }
    }
    val Clear = 256; val Eoi = 257
    var dict = new java.util.HashMap[Int, Integer]() // (prefix<<8|byte) -> code
    var next = 258; var width = 9
    putCode(Clear, width)
    var cur = -1
    var i = 0
    while (i < pixels.length) {
      val c = pixels(i) & 0xff
      if (cur < 0) cur = c
      else {
        val key = (cur << 8) | c
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          putCode(cur, width)
          dict.put(key, next); next += 1
          if (next == (1 << width) && width < 12) width += 1
          else if (next == 4096) {
            putCode(Clear, width)
            dict = new java.util.HashMap[Int, Integer](); next = 258; width = 9
          }
          cur = c
        }
      }
      i += 1
    }
    if (cur >= 0) putCode(cur, width)
    putCode(Eoi, width)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    // sub-block the stream
    val raw = out.toByteArray
    val blocked = new java.io.ByteArrayOutputStream()
    var p = 0
    while (p < raw.length) {
      val n = math.min(255, raw.length - p)
      blocked.write(n); blocked.write(raw, p, n)
      p += n
    }
    blocked.write(0)
    blocked.toByteArray
  }

  /** GIF-variant LZW decoder with full table reconstruction, the KwKwK
    * (code == next free code) case, CLEAR resets, width growth in sync
    * with the encoder, and hard validation: any code beyond the table's
    * frontier, a stream without EOI, or a pixel count that misses
    * `expected` rejects the payload.
    */
  def lzwDecode(blocked: Array[Byte], expected: Int): Option[Array[Byte]] = {
    // un-sub-block
    val raw = new java.io.ByteArrayOutputStream()
    var p = 0
    var terminated = false
    while (!terminated) {
      if (p >= blocked.length) return None
      val n = blocked(p) & 0xff; p += 1
      if (n == 0) terminated = true
      else {
        if (p + n > blocked.length) return None
        raw.write(blocked, p, n); p += n
      }
    }
    val data = raw.toByteArray
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    def nextCode(width: Int): Int = {
      while (bitCnt < width) {
        if (pos >= data.length) return -1
        bitBuf |= (data(pos) & 0xffL) << bitCnt; bitCnt += 8; pos += 1
      }
      val c = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width; bitCnt -= width
      c
    }
    val Clear = 256; val Eoi = 257
    val prefix = new Array[Int](4096); val suffix = new Array[Byte](4096)
    var next = 258; var width = 9
    val out = new java.io.ByteArrayOutputStream()
    var prev = -1
    def emit(code: Int): Byte = {
      // walk the chain; roots are codes < 256
      val stack = new Array[Byte](4096); var sp = 0
      var c = code
      while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = c.toByte
      out.write(first & 0xff)
      while (sp > 0) { sp -= 1; out.write(stack(sp) & 0xff) }
      first
    }
    // width growth: the decoder learns of each encoder dictionary add
    // one code LATER than the encoder made it, so it must widen one add
    // EARLIER — when its counter reaches (1<<width)-1, not (1<<width).
    // (The classic GIF "early change" off-by-one.)
    def maybeWiden(): Unit =
      if (next == (1 << width) - 1 && width < 12) width += 1
    var done = false
    while (!done) {
      val code = nextCode(width)
      if (code < 0) return None // ran out of bits before EOI
      if (code == Clear) { next = 258; width = 9; prev = -1 }
      else if (code == Eoi) done = true
      else if (code < 256 || (code >= 258 && code < next)) {
        val first = emit(code)
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; suffix(next) = first; next += 1
          maybeWiden()
        }
        prev = code
      } else if (code == next && prev >= 0 && next < 4096) {
        // KwKwK: string = prev-string + first(prev-string)
        val firstOfPrev: Byte = {
          var c = prev
          while (c >= 258) c = prefix(c)
          c.toByte
        }
        prefix(next) = prev; suffix(next) = firstOfPrev; next += 1
        emit(next - 1)
        maybeWiden()
        prev = next - 1
      } else return None // code beyond the table frontier
    }
    val px = out.toByteArray
    if (px.length != expected) None else Some(px)
  }

  /** Build a real 89a-structured GIF: header, logical screen
    * descriptor, 256-entry global color table (deterministic RGB fill),
    * image descriptor, and the LZW-compressed 8-bit pixel index stream.
    * Pixel index at (row-major) j = (seed + 31·j) mod 256 — the same
    * closed-form convention as BMP/PNG, restated by the oracle.
    */
  def encodeGif(w: Int, h: Int, seed: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(w); u16(h)
    out.write(0xf7) // global table, 8-bit color resolution, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { // deterministic palette
      out.write(i); out.write((i * 3) & 0xff); out.write((i * 7) & 0xff)
      i += 1
    }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(w); u16(h); out.write(0)
    out.write(8) // LZW min code size
    val px = Array.tabulate(w * h)(j => ((seed + 31 * j) % 256).toByte)
    out.write(lzwEncode(px))
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Genuine GIF parse: magic, screen descriptor, color-table skip,
    * extension-block walk, image descriptor, full LZW decode (with the
    * pixel-count check), trailer. Returns (width, height, index_sum,
    * top_row_index_sum); None on any malformed byte.
    */
  def decodeGif(bytes: Array[Byte]): Option[(Int, Int, Long, Long)] = {
    if (bytes.length < 14) return None
    val magic = new String(bytes, 0, 6, "US-ASCII")
    if (magic != "GIF89a" && magic != "GIF87a") return None
    def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    var pos = 6
    pos += 4 // screen w/h (image descriptor dims are authoritative)
    val packed = bytes(pos) & 0xff; pos += 3
    if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 7) + 1))
    // block walk: extensions until the image descriptor
    while (pos < bytes.length && (bytes(pos) & 0xff) == 0x21) {
      pos += 2 // introducer + label
      var blockLen = if (pos < bytes.length) bytes(pos) & 0xff else -1
      while (blockLen > 0) {
        pos += 1 + blockLen
        blockLen = if (pos < bytes.length) bytes(pos) & 0xff else -1
      }
      if (blockLen < 0) return None
      pos += 1 // terminator
    }
    if (pos + 10 > bytes.length || (bytes(pos) & 0xff) != 0x2c) return None
    val w = u16(pos + 5); val h = u16(pos + 7)
    val ipacked = bytes(pos + 9) & 0xff
    pos += 10
    if ((ipacked & 0x80) != 0) pos += 3 * (1 << ((ipacked & 7) + 1))
    if (w <= 0 || h <= 0 || pos + 1 >= bytes.length) return None
    val minCode = bytes(pos) & 0xff; pos += 1
    if (minCode != 8) return None
    // the trailer must follow the data sub-blocks
    var q = pos
    var bl = if (q < bytes.length) bytes(q) & 0xff else -1
    while (bl > 0) {
      q += 1 + bl
      bl = if (q < bytes.length) bytes(q) & 0xff else -1
    }
    if (bl < 0) return None
    q += 1
    if (q >= bytes.length || (bytes(q) & 0xff) != 0x3b) return None
    lzwDecode(bytes.drop(pos), w * h).map { px =>
      var idxSum = 0L; var top = 0L
      var j = 0
      while (j < px.length) {
        val v = px(j) & 0xff
        idxSum += v
        if (j < w) top += v
        j += 1
      }
      (w, h, idxSum, top)
    }
  }

  def gifAssets(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    Tables.spread(Tables.documents(s, dir), "doc_id")
      .selectExpr("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val tb = text.getBytes("UTF-8")
        val gif = encodeGif(gifW(tb.length), gifH(tb.length), gifSeed(id))
        // magic corrupt — GUARANTEED-detectable (an LZW data-byte flip
        // can decode to a different-but-valid pixel stream, which would
        // make the drop count fixture-dependent; the stream-level
        // rejections are exercised deterministically in the spec)
        if (id % CorruptEveryGif == 0) gif(0) = 'X'.toByte
        Asset(id, "gif", gif)
      }
  }

  /** GIF proof query: full LZW decode per asset in the batched shape;
    * corrupt streams (bad code frontier / pixel-count miss / lost
    * trailer) dropped-and-counted; index sums restated closed-form by
    * the oracle — a decoder that mishandles width growth, CLEAR resets,
    * or the KwKwK case cannot reproduce them.
    */
  def gifStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val decoded = gifAssets(s, dir).mapPartitions {
      _.grouped(64).flatMap(_.map { a =>
        decodeGif(a.payload) match {
          case Some((w, h, idx, top)) => (a.asset_id, true, w, h, idx, top)
          case None => (a.asset_id, false, 0, 0, 0L, 0L)
        }
      })
    }.toDF("asset_id", "ok", "w", "h", "idx_sum", "top_sum")
    decoded.agg(
      count(when($"ok", 1)).as("n_gif"),
      count(when(!$"ok", 1)).as("n_corrupt"),
      sum(when($"ok", $"idx_sum")).as("sum_idx"),
      sum(when($"ok", $"top_sum")).as("sum_top_row"))
  }

  val gifStatsSql: String =
    s"""WITH gif AS (
       |  SELECT doc_id, 3 + strlen(text) % 41 AS w, 3 + strlen(text) % 17 AS h,
       |    CAST(doc_id % 239 AS INTEGER) AS seed,
       |    doc_id % $CorruptEveryGif = 0 AS corrupt
       |  FROM documents)
       |SELECT count(CASE WHEN NOT corrupt THEN 1 END) AS n_gif,
       |  count(CASE WHEN corrupt THEN 1 END) AS n_corrupt,
       |  CAST(sum(CASE WHEN NOT corrupt THEN list_sum(list_transform(
       |    range(0, w * h), j -> (seed + 31 * j) % 256)) END) AS BIGINT)
       |    AS sum_idx,
       |  CAST(sum(CASE WHEN NOT corrupt THEN list_sum(list_transform(
       |    range(0, w), j -> (seed + 31 * j) % 256)) END) AS BIGINT)
       |    AS sum_top_row
       |FROM gif""".stripMargin

  // ------------------------------------------------------ JPEG codec

  /** JPEG geometry — own population (all docs), own cadences. Dims are
    * 16-bit big-endian fields in the frame header, so they get a range
    * that exercises both bytes.
    */
  @inline private def jpgW(nTextBytes: Int): Int = 16 + nTextBytes % 500
  @inline private def jpgH(nTextBytes: Int): Int = 16 + nTextBytes % 300
  /** COM-segment filler length — varies the SOF offset per record so a
    * "decoder" reading dims from a fixed offset cannot match the oracle;
    * only a real marker walk (skip segments by their length fields)
    * finds the frame header.
    */
  @inline private def jpgComLen(docId: Long): Int = (docId % 37).toInt
  val CorruptEveryJpeg = 21
  val TruncateEveryJpeg = 33

  /** Build a structurally-real JFIF byte stream: SOI, APP0, a
    * variable-length COM, DQT, SOF0 (baseline) or SOF2 (progressive,
    * every 5th doc), SOS, entropy filler with spec-correct 0xFF 0x00
    * byte stuffing, EOI. (Entropy bytes are deterministic filler, not a
    * Huffman stream — dimension/structure extraction is the operator;
    * full IDCT decode is out of scope, per the brief's stub rule, but
    * every HEADER byte here is spec-shaped and the parser is genuine.)
    */
  def encodeJpeg(w: Int, h: Int, docId: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Byte]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload, 0, payload.length)
    }
    marker(0xd8) // SOI
    seg(0xe0, "JFIF ".getBytes("US-ASCII") ++
      Array[Byte](1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xfe, Array.tabulate(jpgComLen(docId))(i => ((docId + 7 * i) % 256).toByte))
    seg(0xdb, Array[Byte](0) ++ Array.tabulate(64)(i => ((3 + i) % 256).toByte))
    val sof = java.nio.ByteBuffer.allocate(15)
      .put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
      .put(1.toByte).put(0x22.toByte).put(0.toByte)
      .put(2.toByte).put(0x11.toByte).put(0.toByte)
      .put(3.toByte).put(0x11.toByte).put(0.toByte).array()
    seg(if (docId % 5 == 0) 0xc2 else 0xc0, sof)
    seg(0xda, Array[Byte](3, 1, 0, 2, 0x11, 3, 0x11, 0, 63, 0))
    // entropy filler with byte stuffing: raw 0xFF becomes 0xFF 0x00
    val n = 20 + (docId % 50).toInt
    var i = 0
    while (i < n) {
      val b = ((docId * 31 + i * 97) % 256).toInt
      out.write(b)
      if (b == 0xff) out.write(0x00)
      i += 1
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Genuine JPEG structure parse: SOI check, marker walk (fill-byte
    * tolerant, 16-bit BE segment lengths, bounds-checked), SOF0/SOF2
    * frame-header extraction (dims, component count, progressive flag),
    * then an entropy-scan honoring 0xFF00 byte stuffing and RST markers
    * that must terminate at EOI inside the buffer. Returns
    * (width, height, n_components, progressive, n_segments); None on
    * bad magic, a length field running past the buffer, SOS before any
    * SOF, or a missing EOI — each a distinct real-world failure mode.
    */
  def decodeJpeg(bytes: Array[Byte]): Option[(Int, Int, Int, Boolean, Int)] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
      (bytes(1) & 0xff) != 0xd8) return None
    var pos = 2
    var w = -1; var h = -1; var ncomp = -1
    var progressive = false
    var nSegments = 0
    var sawSos = false
    while (!sawSos) {
      // marker prefix: one or more 0xFF fill bytes, then the code
      if (pos >= bytes.length) return None
      if ((bytes(pos) & 0xff) != 0xff) return None
      while (pos < bytes.length && (bytes(pos) & 0xff) == 0xff) pos += 1
      if (pos >= bytes.length) return None
      val m = bytes(pos) & 0xff; pos += 1
      if (m == 0xd9) return None // EOI before SOS: no image data
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { nSegments += 1 }
      else {
        if (pos + 2 > bytes.length) return None
        val len = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff)
        if (len < 2 || pos + len > bytes.length) return None
        if (m == 0xc0 || m == 0xc1 || m == 0xc2) {
          if (len < 8) return None
          h = ((bytes(pos + 3) & 0xff) << 8) | (bytes(pos + 4) & 0xff)
          w = ((bytes(pos + 5) & 0xff) << 8) | (bytes(pos + 6) & 0xff)
          ncomp = bytes(pos + 7) & 0xff
          progressive = m == 0xc2
          if (w <= 0 || h <= 0 || ncomp <= 0) return None
        }
        if (m == 0xda) sawSos = true
        pos += len
        nSegments += 1
      }
    }
    if (w < 0) return None // SOS with no preceding frame header
    // entropy scan: data bytes until a real marker; 0xFF00 is a stuffed
    // data byte, RST0-7 continue the scan, EOI ends the stream
    while (pos < bytes.length) {
      if ((bytes(pos) & 0xff) == 0xff && pos + 1 < bytes.length) {
        val m = bytes(pos + 1) & 0xff
        if (m == 0xd9)
          return Some((w, h, ncomp, progressive, nSegments + 1))
        if (m != 0x00 && !(m >= 0xd0 && m <= 0xd7)) return None
        pos += 2
      } else pos += 1
    }
    None // ran off the end without EOI (truncation)
  }

  def jpegAssets(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    Tables.spread(Tables.documents(s, dir), "doc_id")
      .selectExpr("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val tb = text.getBytes("UTF-8")
        val jpg = encodeJpeg(jpgW(tb.length), jpgH(tb.length), id)
        if (id % CorruptEveryJpeg == 0) { jpg(1) = 'X'.toByte; Asset(id, "jpeg", jpg) }
        else if (id % TruncateEveryJpeg == 0)
          Asset(id, "jpeg", jpg.dropRight(4)) // kills the EOI
        else Asset(id, "jpeg", jpg)
      }
  }

  /** JPEG proof query: structure-parse every asset through the batched
    * shape; corrupt magic and truncated streams are dropped-and-counted
    * separately from the closed-form dimension sums the oracle
    * restates. The variable-offset COM segment means only a real marker
    * walk reproduces these numbers.
    */
  def jpegDims(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val decoded = jpegAssets(s, dir).mapPartitions {
      _.grouped(64).flatMap(_.map { a =>
        decodeJpeg(a.payload) match {
          case Some((w, h, nc, prog, _)) =>
            (a.asset_id, true, w, h, nc, prog)
          case None => (a.asset_id, false, 0, 0, 0, false)
        }
      })
    }.toDF("asset_id", "ok", "w", "h", "ncomp", "progressive")
    decoded.agg(
      count(when($"ok", 1)).as("n_jpeg"),
      count(when(!$"ok", 1)).as("n_corrupt"),
      count(when($"ok" && $"progressive", 1)).as("n_progressive"),
      sum(when($"ok", $"w".cast("long"))).as("sum_w"),
      sum(when($"ok", $"h".cast("long"))).as("sum_h"),
      sum(when($"ok", $"w".cast("long") * $"h")).as("sum_px"),
      max(when($"ok", $"w")).as("max_w"),
      max(when($"ok", $"h")).as("max_h"))
  }

  val jpegDimsSql: String =
    s"""WITH jpg AS (
       |  SELECT doc_id,
       |    16 + strlen(text) % 500 AS w, 16 + strlen(text) % 300 AS h,
       |    doc_id % 5 = 0 AS progressive,
       |    doc_id % $CorruptEveryJpeg = 0 OR doc_id % $TruncateEveryJpeg = 0
       |      AS corrupt
       |  FROM documents)
       |SELECT count(CASE WHEN NOT corrupt THEN 1 END) AS n_jpeg,
       |  count(CASE WHEN corrupt THEN 1 END) AS n_corrupt,
       |  count(CASE WHEN NOT corrupt AND progressive THEN 1 END)
       |    AS n_progressive,
       |  CAST(sum(CASE WHEN NOT corrupt THEN w END) AS BIGINT) AS sum_w,
       |  CAST(sum(CASE WHEN NOT corrupt THEN h END) AS BIGINT) AS sum_h,
       |  CAST(sum(CASE WHEN NOT corrupt THEN w * h END) AS BIGINT) AS sum_px,
       |  CAST(max(CASE WHEN NOT corrupt THEN w END) AS INTEGER) AS max_w,
       |  CAST(max(CASE WHEN NOT corrupt THEN h END) AS INTEGER) AS max_h
       |FROM jpg""".stripMargin

  // -------------------------------------------- oracle helper fragments

  /** DuckDB restatement of the image geometry (w/h/stride/file size from
    * the text byte length; strlen = BYTES in DuckDB).
    */
  private val duckGeom =
    """SELECT doc_id,
      |    4 + strlen(text) % 29 AS w, 4 + strlen(text) % 13 AS h,
      |    CAST(doc_id % 251 AS INTEGER) AS seed,
      |    doc_id % 17 = 0 AS corrupt
      |  FROM documents WHERE doc_id % 3 = 0""".stripMargin

  /** Driver-contract query: per-media-type stats AFTER the binary
    * round-trip + batched decode, with corrupt images dropped-and-
    * counted. For images, sum_bytes is the DECODED file size (header +
    * padded rows), so the oracle only matches if the encoder, the
    * stride/padding arithmetic, and the validation all agree byte-for-
    * byte; audio/video sum_bytes is the opaque byte length.
    */
  def assetStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(assets(s, dir)).toDF()
      .groupBy($"media_type")
      .agg(sum(when($"ok", 1L).otherwise(0L)).as("n_assets"),
        sum(when(!$"ok", 1L).otherwise(0L)).as("n_corrupt"),
        sum(when($"ok", $"n_bytes").otherwise(0L)).as("sum_bytes"))
  }

  val assetStatsSql: String =
    s"""WITH geom AS (
       |  $duckGeom),
       |img AS (
       |  SELECT CAST(sum(CASE WHEN NOT corrupt THEN 1 ELSE 0 END) AS BIGINT) AS n_assets,
       |    CAST(sum(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
       |    CAST(sum(CASE WHEN NOT corrupt
       |      THEN 54 + ((3 * w + 3) // 4 * 4) * h ELSE 0 END) AS BIGINT) AS sum_bytes
       |  FROM geom),
       |aud AS (
       |  SELECT CAST(sum(CASE WHEN doc_id % $CorruptEveryAudio <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_assets,
       |    CAST(sum(CASE WHEN doc_id % $CorruptEveryAudio = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
       |    CAST(sum(CASE WHEN doc_id % $CorruptEveryAudio <> 0
       |      THEN 44 + 2 * (50 + strlen(text) % 211) ELSE 0 END) AS BIGINT) AS sum_bytes
       |  FROM documents WHERE doc_id % 3 = 1),
       |vid AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_assets, CAST(0 AS BIGINT) AS n_corrupt,
       |    CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes
       |  FROM documents WHERE doc_id % 3 = 2)
       |SELECT 'image' AS media_type, n_assets, n_corrupt, sum_bytes FROM img
       |UNION ALL SELECT 'audio', n_assets, n_corrupt, sum_bytes FROM aud
       |UNION ALL SELECT 'video', n_assets, n_corrupt, sum_bytes FROM vid""".stripMargin

  /** Driver-contract query through decode → resize: sums of the resized
    * dimensions over decodable images, target box 16×16. Real decoded
    * dims feed the aspect-ratio arithmetic; the oracle restates both.
    */
  def resizedDims(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    resizeAll(extractFeatures(assets(s, dir)).filter(d => d.ok && d.media_type == "image"))
      .toDF()
      .groupBy($"media_type")
      .agg(count(lit(1)).as("n_assets"),
        sum($"width").as("sum_w"), sum($"height").as("sum_h"))
  }

  val resizedDimsSql: String =
    s"""WITH geom AS (
       |  $duckGeom),
       |resized AS (
       |  SELECT
       |    CASE WHEN least(16.0 / w, 16.0 / h) >= 1.0 THEN w
       |         ELSE greatest(1, CAST(trunc(w * least(16.0 / w, 16.0 / h)) AS INT)) END AS w,
       |    CASE WHEN least(16.0 / w, 16.0 / h) >= 1.0 THEN h
       |         ELSE greatest(1, CAST(trunc(h * least(16.0 / w, 16.0 / h)) AS INT)) END AS h
       |  FROM geom WHERE NOT corrupt)
       |SELECT 'image' AS media_type, count(*) AS n_assets,
       |  CAST(sum(w) AS BIGINT) AS sum_w, CAST(sum(h) AS BIGINT) AS sum_h
       |FROM resized""".stripMargin

  /** Pixel-level proof query: corpus-wide sums of the decoded pixel
    * statistics. `sum_luma` is every channel byte of every decodable
    * image; `sum_top_row` is the channel sum of each image's logical TOP
    * row — the stored BOTTOM row of the file, so this hash-matches only
    * if the decoder honors BMP's bottom-up row order and skips the
    * per-row padding. The oracle recomputes both from the closed-form
    * pixel fill.
    */
  def pixelStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(assets(s, dir)).toDF()
      .where($"ok" && $"media_type" === "image")
      .agg(count(lit(1)).as("n_images"),
        sum($"luma_sum").as("sum_luma"),
        sum($"top_row_sum").as("sum_top_row"))
  }

  val pixelStatsSql: String =
    s"""WITH geom AS (
       |  $duckGeom)
       |SELECT CAST(count(*) AS BIGINT) AS n_images,
       |  CAST(sum(list_sum(list_transform(range(0, 3 * w * h),
       |    j -> (seed + 31 * j) % 256))) AS BIGINT) AS sum_luma,
       |  CAST(sum(list_sum(list_transform(range(0, 3 * w),
       |    j -> (seed + 31 * j) % 256))) AS BIGINT) AS sum_top_row
       |FROM geom WHERE NOT corrupt""".stripMargin

  /** Audio proof query: corpus-wide sums over decodable WAV assets —
    * sample counts from the parsed data chunk and the |amplitude| sum
    * from the genuine PCM16 little-endian sample walk; both restated
    * closed-form by the oracle. Corrupt WAVs (every
    * [[CorruptEveryAudio]]th) are dropped here and counted in
    * `mm_asset_stats`.
    */
  def audioStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(assets(s, dir)).toDF()
      .where($"ok" && $"media_type" === "audio")
      .agg(count(lit(1)).as("n_audio"),
        sum($"n_samples").as("sum_samples"),
        sum($"amp_sum").as("sum_abs_amp"))
  }

  val audioStatsSql: String =
    s"""WITH aud AS (
       |  SELECT 50 + strlen(text) % 211 AS n,
       |    CAST(doc_id % 9973 AS INTEGER) AS seed
       |  FROM documents
       |  WHERE doc_id % 3 = 1 AND doc_id % $CorruptEveryAudio <> 0)
       |SELECT CAST(count(*) AS BIGINT) AS n_audio,
       |  CAST(sum(n) AS BIGINT) AS sum_samples,
       |  CAST(sum(list_sum(list_transform(range(0, n),
       |    i -> abs((seed + 31 * i) % 65536 - 32768)))) AS BIGINT) AS sum_abs_amp
       |FROM aud""".stripMargin

  /** Image–caption pair mining — the multimodal training-pair
    * construction step: decodable image assets joined to quality-gated
    * captions (English, ≥20 tokens), summarized per source. The payload
    * never enters the join (only its decoded byte length is projected),
    * which is the rule for any multimodal join at 100 TB: metadata
    * moves, blobs stay put until the final pair materialization.
    * Corrupt images drop out of the pairing, as they would in
    * production.
    */
  def captionPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val imgs = extractFeatures(assets(s, dir)).toDF()
      .where($"ok" && $"media_type" === "image")
      .select($"asset_id", $"n_bytes")
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
       |  CAST(sum(54 + ((3 * (4 + strlen(text) % 29) + 3) // 4 * 4)
       |    * (4 + strlen(text) % 13)) AS BIGINT) AS sum_bytes,
       |  CAST(sum(n_toks) AS BIGINT) AS sum_caption_toks
       |FROM (
       |  SELECT doc_id, source, text, len(${TextOps.duckTokensExpr}) AS n_toks
       |  FROM documents
       |  WHERE lang = 'en' AND doc_id % 3 = 0 AND doc_id % 17 <> 0)
       |WHERE n_toks >= 20
       |GROUP BY source""".stripMargin

  // ------------------------------------------------- perceptual hash

  /** aHash over a GENUINELY decoded BMP: 8×8 nearest-neighbor luma
    * samples from the actual file bytes (bottom-up row un-flip +
    * stride/padding arithmetic — a decoder bug changes the bits),
    * thresholded at the integer mean (bit = 64·L ≥ ΣL, no division),
    * packed into four 16-bit chunks for the banded hamming join.
    * Returns None for non-BMP payloads.
    */
  def ahashChunks(bytes: Array[Byte]): Option[Array[Int]] =
    ahashChunksDims(bytes).map(_._1)

  /** [[ahashChunks]] plus the header's (width, height) — the cluster
    * consumers rank keepers on pixel count, and reading the dims from
    * the already-parsed header avoids a second full decodeBmp pixel
    * walk per asset just for two header fields.
    */
  def ahashChunksDims(bytes: Array[Byte]): Option[(Array[Int], Int, Int)] = {
    if (bytes.length < 54 || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte)
      return None
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val fileSize = buf.getInt(2)
    val pixelOffset = buf.getInt(10)
    val dibSize = buf.getInt(14)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    if (fileSize != bytes.length || dibSize != 40 || buf.getShort(26) != 1 ||
      buf.getShort(28) != 24 || buf.getInt(30) != 0 || w <= 0 || h <= 0)
      return None
    val stride = bmpStride(w)
    if (pixelOffset < 54 || pixelOffset + stride.toLong * h > bytes.length)
      return None
    val lum = new Array[Int](64)
    var i = 0
    while (i < 64) {
      val y = (i / 8) * h / 8
      val x = (i % 8) * w / 8
      // logical row y sits at stored row (h-1-y)
      val off = pixelOffset + (h - 1 - y) * stride + 3 * x
      lum(i) = (bytes(off) & 0xff) + (bytes(off + 1) & 0xff) + (bytes(off + 2) & 0xff)
      i += 1
    }
    val tot = lum.sum
    val chunks = new Array[Int](4)
    i = 0
    while (i < 64) {
      if (lum(i) * 64 >= tot) chunks(i / 16) |= 1 << (i % 16)
      i += 1
    }
    Some((chunks, w, h))
  }

  /** Image near-duplicate pairs by perceptual hash — the DEDUP move
    * applied to the multimodal column: aHash bits from truly decoded
    * pixels, then the multi-index hamming join (split the 64 bits into
    * 4 chunks; any pair at distance ≤ 3 shares an exact chunk by
    * pigeonhole, so candidates come from FOUR equi-joins on 16-bit
    * keys — never an all-pairs pass) verified with the exact popcount
    * distance. The oracle rebuilds the identical bits closed-form from
    * the pixel-fill convention and runs the same banded join, so a
    * single flipped luma sample anywhere breaks the hash compare.
    */
  def phashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val imgs = assets(s, dir).filter(_.media_type == "image")
      .flatMap(a => ahashChunks(a.payload).map(c =>
        (a.asset_id, c(0), c(1), c(2), c(3))))
      .toDF("asset_id", "c0", "c1", "c2", "c3")
      .localCheckpoint()
    phashPairsFromChunks(s, imgs)
  }

  /** Finalize over any (asset_id, c0..c3) chunk table — shared by the
    * batch form and the streaming ingest form, so both close through
    * the SAME multi-index candidate join and exact popcount verify.
    */
  private[graft] def phashPairsFromChunks(
      s: SparkSession, imgs: DataFrame): DataFrame = {
    import s.implicits._
    val chunks = imgs.selectExpr("asset_id",
      "posexplode(array(c0, c1, c2, c3)) AS (ci, cv)")
    val cand = chunks.as("a")
      .join(chunks.as("b"),
        $"a.ci" === $"b.ci" && $"a.cv" === $"b.cv" &&
          $"a.asset_id" < $"b.asset_id")
      .select($"a.asset_id".as("doc_a"), $"b.asset_id".as("doc_b"))
      .distinct()
    cand
      .join(imgs.toDF("doc_a", "a0", "a1", "a2", "a3"), "doc_a")
      .join(imgs.toDF("doc_b", "b0", "b1", "b2", "b3"), "doc_b")
      .selectExpr("doc_a", "doc_b",
        """CAST(bit_count(a0 ^ b0) + bit_count(a1 ^ b1)
          | + bit_count(a2 ^ b2) + bit_count(a3 ^ b3) AS BIGINT) AS hamming""".stripMargin)
      .where($"hamming" <= 3)
  }

  /** Shared oracle CTE chain for the pHash modality (no WITH prefix —
    * callers prepend plain or RECURSIVE): closed-form geometry → 64
    * luma samples → aHash chunk bits → multi-index candidates → exact
    * hamming pairs at the ≤3 bar (`hp`).
    */
  private val phashPairCtes: String =
    s"""geom AS (
       |  $duckGeom),
       |lum AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 64), i ->
       |      (seed + 31 * ((CAST(i // 8 AS INTEGER) * h // 8) * 3 * w
       |         + 3 * (CAST(i % 8 AS INTEGER) * w // 8))) % 256
       |      + (seed + 31 * ((CAST(i // 8 AS INTEGER) * h // 8) * 3 * w
       |         + 3 * (CAST(i % 8 AS INTEGER) * w // 8) + 1)) % 256
       |      + (seed + 31 * ((CAST(i // 8 AS INTEGER) * h // 8) * 3 * w
       |         + 3 * (CAST(i % 8 AS INTEGER) * w // 8) + 2)) % 256) AS lm
       |  FROM geom WHERE NOT corrupt),
       |bits AS (
       |  SELECT doc_id, list_sum(lm) AS tot, lm FROM lum),
       |chunks AS (
       |  SELECT doc_id,
       |    ${(0 until 4).map(c =>
      s"""CAST(list_sum(list_transform(range(0, 16), p ->
         |      CASE WHEN lm[${16 * c} + p + 1] * 64 >= tot
         |           THEN (1 << p) ELSE 0 END)) AS INTEGER) AS c$c""".stripMargin)
      .mkString(",\n    ")}
       |  FROM bits),
       |ch AS (
       |  SELECT doc_id, ci, cv FROM (
       |    SELECT doc_id, unnest(range(0, 4)) AS ci,
       |      unnest([c0, c1, c2, c3]) AS cv
       |    FROM chunks)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ch a JOIN ch b
       |    ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id),
       |hp AS (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST(bit_count(xor(ca.c0, cb.c0)) + bit_count(xor(ca.c1, cb.c1))
       |    + bit_count(xor(ca.c2, cb.c2)) + bit_count(xor(ca.c3, cb.c3)) AS BIGINT) AS hamming
       |  FROM cand c
       |  JOIN chunks ca ON ca.doc_id = c.doc_a
       |  JOIN chunks cb ON cb.doc_id = c.doc_b
       |  WHERE bit_count(xor(ca.c0, cb.c0)) + bit_count(xor(ca.c1, cb.c1))
       |    + bit_count(xor(ca.c2, cb.c2)) + bit_count(xor(ca.c3, cb.c3)) <= 3)""".stripMargin

  val phashPairsSql: String =
    s"""WITH $phashPairCtes
       |SELECT doc_a, doc_b, hamming FROM hp""".stripMargin

  // ------------------------------------------------- video scene cuts

  /** Scene-cut detection over the opaque video payloads: the payload is
    * windowed into fixed 100-byte "frames", each frame reduced to its
    * integer byte sum (the luma-histogram proxy), and a cut is declared
    * between consecutive frames when the absolute sum delta exceeds
    * [[SceneCutThreshold]] — the classic keyframe-extraction primitive
    * a video training pipeline runs before sampling frames for caption
    * alignment.
    *
    * Shape: batched `mapPartitions` decode (blobs never leave the map —
    * only four scalars per asset survive), zero shuffles before the
    * final write. The oracle recomputes every frame sum from the
    * character codes of the source text, so a single off-by-one in the
    * windowing or a partial-frame mishandling breaks the hash compare.
    */
  val SceneCutThreshold = 500L

  def sceneCuts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir).filter(_.media_type == "video")
      .mapPartitions(_.grouped(64).flatMap(_.flatMap { a =>
        val sums = a.payload.grouped(100)
          .map(_.foldLeft(0L)((acc, b) => acc + (b & 0xff))).toArray
        if (sums.isEmpty) None
        else {
          val deltas = (1 until sums.length)
            .map(i => (i.toLong, math.abs(sums(i) - sums(i - 1))))
          val cuts = deltas.filter(_._2 > SceneCutThreshold)
          Some((a.asset_id, sums.length.toLong, cuts.length.toLong,
            cuts.headOption.map(_._1).getOrElse(-1L),
            if (deltas.isEmpty) 0L else deltas.map(_._2).max))
        }
      }))
      .toDF("asset_id", "n_frames", "n_cuts", "first_cut", "max_delta")
  }

  val sceneCutsSql: String =
    s"""WITH v AS (
       |  SELECT doc_id, text, strlen(text) AS nb FROM documents
       |  WHERE doc_id % 3 = 2 AND strlen(text) > 0),
       |f AS (
       |  SELECT doc_id, text, nb,
       |    unnest(range(0, CAST(ceil(nb / 100.0) AS BIGINT))) AS fi
       |  FROM v),
       |sums AS (
       |  SELECT doc_id, fi,
       |    list_reduce(list_prepend(0, list_transform(
       |      range(CAST(fi * 100 + 1 AS INTEGER),
       |            CAST(least(fi * 100 + 100, nb) + 1 AS INTEGER)),
       |      i -> ascii(substr(text, i, 1)))), (acc, x) -> acc + x) AS fsum
       |  FROM f),
       |d AS (
       |  SELECT doc_id, fi, fsum,
       |    abs(fsum - lag(fsum) OVER (PARTITION BY doc_id ORDER BY fi)) AS delta
       |  FROM sums)
       |SELECT doc_id AS asset_id,
       |  CAST(count(*) AS BIGINT) AS n_frames,
       |  CAST(count(*) FILTER (WHERE delta > $SceneCutThreshold) AS BIGINT) AS n_cuts,
       |  CAST(coalesce(min(fi) FILTER (WHERE delta > $SceneCutThreshold), -1) AS BIGINT) AS first_cut,
       |  CAST(coalesce(max(delta), 0) AS BIGINT) AS max_delta
       |FROM d GROUP BY doc_id""".stripMargin

  // -------------------------------------------------- audio activity

  /** Voice-activity-style framing over the REAL decoded PCM16 samples:
    * 40-sample frames (5 ms at 8 kHz), frame "energy" = Σ|amplitude|
    * (integer — no float drift), a frame is active when its energy
    * exceeds [[VadFrameSamples]]·16384 (the uniform-amplitude mean), and
    * the per-asset readout is the speech-detector summary: frame count,
    * active count, active ratio, and the LONGEST active run
    * (gaps-and-islands over frames). Corrupt WAVs drop out exactly as
    * in `mm_audio_stats` — the parse is the genuine RIFF walk, so a
    * header bug would shift every sample and break the oracle's
    * closed-form amplitude reconstruction.
    *
    * Shape: batched mapPartitions decode, four scalars out per asset,
    * zero shuffles before the write.
    */
  val VadFrameSamples = 40
  val VadThreshold: Long = VadFrameSamples.toLong * 16384L

  def audioVad(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir).filter(_.media_type == "audio")
      .mapPartitions(_.grouped(64).flatMap(_.flatMap { a =>
        decodeWav(a.payload).map { case (n, _) =>
          val buf = java.nio.ByteBuffer.wrap(a.payload)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val active = Array.tabulate((n + VadFrameSamples - 1) / VadFrameSamples) { f =>
            var e = 0L
            var i = f * VadFrameSamples
            val end = math.min(i + VadFrameSamples, n)
            while (i < end) { e += math.abs(buf.getShort(44 + 2 * i).toLong); i += 1 }
            e > VadThreshold
          }
          var run = 0; var best = 0
          active.foreach { act =>
            if (act) { run += 1; best = math.max(best, run) } else run = 0
          }
          (a.asset_id, active.length.toLong, active.count(identity).toLong,
            best.toLong)
        }
      }))
      .toDF("asset_id", "n_frames", "n_active", "longest_run")
      .selectExpr("asset_id", "n_frames", "n_active", "longest_run",
        "floor(CAST(n_active AS DOUBLE) / n_frames * 1e6 + 0.5) / 1e6 AS active_ratio")
  }

  val audioVadSql: String =
    s"""WITH aud AS (
       |  SELECT doc_id, 50 + strlen(text) % 211 AS n,
       |    CAST(doc_id % 9973 AS INTEGER) AS seed
       |  FROM documents
       |  WHERE doc_id % 3 = 1 AND doc_id % $CorruptEveryAudio <> 0),
       |frames AS (
       |  SELECT doc_id, n, seed,
       |    unnest(range(0, (n + $VadFrameSamples - 1) // $VadFrameSamples)) AS fi
       |  FROM aud),
       |fe AS (
       |  SELECT doc_id, fi,
       |    list_sum(list_transform(
       |      range(CAST(fi * $VadFrameSamples AS INTEGER),
       |            CAST(least(fi * $VadFrameSamples + $VadFrameSamples, n) AS INTEGER)),
       |      i -> abs((seed + 31 * i) % 65536 - 32768))) > $VadThreshold AS active
       |  FROM frames),
       |runs AS (
       |  SELECT doc_id, fi - row_number() OVER (PARTITION BY doc_id ORDER BY fi) AS grp
       |  FROM fe WHERE active),
       |longest AS (
       |  SELECT doc_id, max(rl) AS longest_run FROM (
       |    SELECT doc_id, count(*) AS rl FROM runs GROUP BY doc_id, grp)
       |  GROUP BY doc_id)
       |SELECT f.doc_id AS asset_id,
       |  CAST(count(*) AS BIGINT) AS n_frames,
       |  CAST(sum(CASE WHEN f.active THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
       |  CAST(coalesce(any_value(l.longest_run), 0) AS BIGINT) AS longest_run,
       |  floor(CAST(sum(CASE WHEN f.active THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*) * 1e6 + 0.5) / 1e6 AS active_ratio
       |FROM fe f LEFT JOIN longest l ON l.doc_id = f.doc_id
       |GROUP BY f.doc_id""".stripMargin

  // ------------------------------------------------- image entropy

  /** Per-image luma-histogram entropy — the flat/blank-image gate an
    * image-curation pass runs (a near-uniform image carries no
    * training signal): each decodable BMP's pixels walk through the
    * REAL stride/bottom-up layout into a 16-bin luma histogram, and
    * the Shannon entropy comes out in integer micro-units (per-bin
    * terms floor-rounded, summed in ascending bin order — both engines
    * run the identical term arithmetic, so the sum is exact integer).
    */
  val FlatEntropyMicro = 500000L

  def imageEntropy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir).filter(_.media_type == "image")
      .mapPartitions(_.grouped(64).flatMap(_.flatMap { a =>
        decodeBmp(a.payload).map { case (w, h, _, _) =>
          val stride = bmpStride(w)
          val pixelOffset = java.nio.ByteBuffer.wrap(a.payload)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(10)
          val bins = new Array[Long](16)
          var y = 0
          while (y < h) {
            var x = 0
            val rowOff = pixelOffset + (h - 1 - y) * stride
            while (x < w) {
              val o = rowOff + 3 * x
              val luma = (a.payload(o) & 0xff) + (a.payload(o + 1) & 0xff) +
                (a.payload(o + 2) & 0xff)
              bins(luma / 48) += 1L
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          var micro = 0L
          var b = 0
          while (b < 16) {
            if (bins(b) > 0) {
              val p = bins(b).toDouble / n
              micro += math.floor(-p * math.log(p) * 1e6 + 0.5).toLong
            }
            b += 1
          }
          (a.asset_id, n, micro / 1e6, micro < FlatEntropyMicro)
        }
      }))
      .toDF("asset_id", "n_px", "entropy", "is_flat")
  }

  val imageEntropySql: String =
    s"""WITH geom AS (
       |  $duckGeom),
       |px AS (
       |  SELECT doc_id, w, h,
       |    unnest(range(0, w * h)) AS p, seed
       |  FROM geom WHERE NOT corrupt),
       |lum AS (
       |  SELECT doc_id, w, h,
       |    ((seed + 31 * ((p // w) * 3 * w + 3 * (p % w))) % 256
       |     + (seed + 31 * ((p // w) * 3 * w + 3 * (p % w) + 1)) % 256
       |     + (seed + 31 * ((p // w) * 3 * w + 3 * (p % w) + 2)) % 256) // 48 AS bin
       |  FROM px),
       |binc AS (
       |  SELECT doc_id, max(w * h) AS n, bin, count(*) AS c
       |  FROM lum GROUP BY doc_id, bin),
       |terms AS (
       |  SELECT doc_id, max(n) AS n,
       |    CAST(sum(CAST(floor(
       |      -(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n) * 1e6 + 0.5)
       |      AS BIGINT)) AS BIGINT) AS micro
       |  FROM binc GROUP BY doc_id)
       |SELECT doc_id AS asset_id, CAST(n AS BIGINT) AS n_px,
       |  micro / 1e6 AS entropy,
       |  micro < $FlatEntropyMicro AS is_flat
       |FROM terms""".stripMargin

  // ------------------------------------------------------ AVI container

  /** AVI geometry/cadences — de-stubbing the last opaque modality:
    * video payloads become REAL RIFF/AVI containers (the same RIFF
    * chunk grammar the WAV codec walks), with uncompressed 8-bit DIB
    * frames whose bytes follow a closed form the oracle restates.
    */
  @inline private def aviNf(nTextBytes: Int): Int = 2 + nTextBytes % 5
  @inline private def aviW(nTextBytes: Int): Int = 8 + nTextBytes % 9
  @inline private def aviH(nTextBytes: Int): Int = 6 + nTextBytes % 7
  @inline private def aviSeed(docId: Long): Int = (docId % 233).toInt
  val CorruptEveryAvi = 29
  val AviUsPerFrame = 40000 // 25 fps

  @inline private def aviPx(seed: Int, f: Int, j: Int): Int =
    (seed + 31 * j + 7 * f) % 256

  /** Build a genuine minimal AVI: RIFF('AVI ') → LIST(hdrl){avih,
    * LIST(strl){strh,strf}} → LIST(movi){nf × '00db' frames} → idx1.
    * Frames are w×h single-byte pixels, chunk-padded to even sizes per
    * the RIFF rule.
    */
  def encodeAvi(nf: Int, w: Int, h: Int, seed: Int): Array[Byte] = {
    val fsz = w * h
    val pad = fsz & 1
    val moviContent = 4 + nf * (8 + fsz + pad)
    val idx1Total = 8 + 16 * nf
    val hdrlTotal = 8 + 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffSize = 4 + hdrlTotal + (8 + moviContent) + idx1Total
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII")): Unit
    fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
    // hdrl
    fourcc("LIST"); buf.putInt(4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)))
    fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(AviUsPerFrame).putInt(fsz * 25).putInt(0).putInt(0)
    buf.putInt(nf).putInt(0).putInt(1).putInt(fsz)
    buf.putInt(w).putInt(h)
    (0 until 4).foreach(_ => buf.putInt(0))
    // strl
    fourcc("LIST"); buf.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0).putInt(0).putInt(0)
    buf.putInt(1).putInt(25) // dwScale / dwRate = 25 fps
    buf.putInt(0).putInt(nf).putInt(fsz).putInt(-1).putInt(0)
    buf.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(8)
    buf.putInt(0).putInt(fsz).putInt(0).putInt(0).putInt(256).putInt(0)
    // movi
    fourcc("LIST"); buf.putInt(moviContent); fourcc("movi")
    var f = 0
    while (f < nf) {
      fourcc("00db"); buf.putInt(fsz)
      var j = 0
      while (j < fsz) { buf.put(aviPx(seed, f, j).toByte); j += 1 }
      if (pad == 1) buf.put(0.toByte)
      f += 1
    }
    // idx1
    fourcc("idx1"); buf.putInt(16 * nf)
    var off = 4
    f = 0
    while (f < nf) {
      fourcc("00db"); buf.putInt(0x10).putInt(off).putInt(fsz)
      off += 8 + fsz + pad
      f += 1
    }
    buf.array()
  }

  /** Genuine AVI walk: RIFF/AVI magics, hdrl sub-chunk iteration to the
    * avih header (frame count, dims, frame cadence), movi '00db' chunk
    * walk (size must equal w·h, count must equal avih.dwTotalFrames),
    * idx1 entry-count cross-check. Returns (frames, w, h, pixel sum) or
    * None on any structural violation — corrupt containers are dropped
    * and counted, never propagated (P1 semantics).
    */
  def decodeAvi(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] =
    decodeAviFrames(bytes).map { case (nf, w, h, fr) =>
      (nf, w, h, fr.iterator.map(_._4).sum)
    }

  /** Frame-LEVEL AVI walk — the movi chunk index AS DATA: per frame
    * (frame_idx, movi-relative offset, chunk size, pixel sum), with
    * every idx1 entry cross-checked against the movi walk itself
    * (offset AND size per entry, strictly stronger than the old
    * count-only check — a writer that pads chunks wrong or an index
    * that points past a frame boundary is a structural violation, not
    * a wrong answer). [[decodeAvi]] is the aggregate view of this.
    */
  def decodeAviFrames(bytes: Array[Byte])
      : Option[(Int, Int, Int, IndexedSeq[(Int, Long, Int, Long)])] = {
    if (bytes.length < 24) return None
    def tag(off: Int): String =
      if (off + 4 <= bytes.length) new String(bytes, off, 4, "US-ASCII") else ""
    def u32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    if (8 + u32(4) > bytes.length) return None
    var nf = -1; var w = -1; var h = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Int, Long)]
    val idx = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val t = tag(pos); val sz = u32(pos + 4)
      if (sz < 0 || pos + 8 + sz > bytes.length) return None
      t match {
        case "LIST" =>
          tag(pos + 8) match {
            case "hdrl" =>
              // iterate hdrl sub-chunks for avih
              var p = pos + 12
              val end = pos + 8 + sz
              while (p + 8 <= end) {
                if (tag(p) == "avih") {
                  if (u32(p + 4) < 40) return None
                  nf = u32(p + 8 + 16); w = u32(p + 8 + 32); h = u32(p + 8 + 36)
                }
                val ssz = u32(p + 4)
                if (ssz < 0) return None
                p += 8 + ssz + (ssz & 1)
              }
            case "movi" =>
              if (w <= 0 || h <= 0) return None
              var p = pos + 12
              val end = pos + 8 + sz
              while (p + 8 <= end) {
                if (tag(p) == "00db") {
                  val fsz = u32(p + 4)
                  if (fsz != w * h) return None
                  var pxSum = 0L; var j = 0
                  while (j < fsz) { pxSum += (bytes(p + 8 + j) & 0xff); j += 1 }
                  // idx1 offsets are relative to the start of the movi
                  // LIST data area (the 'movi' fourcc at offset 0)
                  frames += ((frames.length, (p - (pos + 8)).toLong, fsz, pxSum))
                }
                val ssz = u32(p + 4)
                if (ssz < 0) return None
                p += 8 + ssz + (ssz & 1)
              }
            case _ => ()
          }
        case "idx1" =>
          var p = pos + 8
          val end = pos + 8 + sz
          while (p + 16 <= end) {
            idx += ((u32(p + 8).toLong & 0xffffffffL, u32(p + 12)))
            p += 16
          }
        case _ => ()
      }
      pos += 8 + sz + (sz & 1)
    }
    if (nf <= 0 || frames.length != nf || idx.length != nf) None
    else if (frames.indices.exists(i =>
      idx(i)._1 != frames(i)._2 || idx(i)._2 != frames(i)._3)) None
    else Some((nf, w, h, frames.toIndexedSeq))
  }

  def aviAssets(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    Tables.spread(Tables.documents(s, dir), "doc_id")
      .selectExpr("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val tb = text.getBytes("UTF-8")
        val avi = encodeAvi(aviNf(tb.length), aviW(tb.length),
          aviH(tb.length), aviSeed(id))
        if (id % CorruptEveryAvi == 0) avi(0) = 'X'.toByte
        Asset(id, "video", avi)
      }
  }

  /** AVI proof query: full container walk per asset in the batched
    * shape; corrupt containers dropped-and-counted; frame counts and
    * the all-frames pixel sum restated closed-form by the oracle — a
    * walker that misreads chunk padding, the avih layout, or the idx1
    * cross-check cannot reproduce them.
    */
  def aviStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val decoded = aviAssets(s, dir).mapPartitions {
      _.grouped(64).flatMap(_.map { a =>
        decodeAvi(a.payload) match {
          case Some((nf, w, h, px)) => (a.asset_id, true, nf.toLong, w, h, px)
          case None => (a.asset_id, false, 0L, 0, 0, 0L)
        }
      })
    }.toDF("asset_id", "ok", "nf", "w", "h", "px_sum")
    decoded.agg(
      count(when($"ok", 1)).as("n_avi"),
      count(when(!$"ok", 1)).as("n_corrupt"),
      sum(when($"ok", $"nf")).as("sum_frames"),
      sum(when($"ok", $"px_sum")).as("sum_px"))
  }

  /** Frame-level proof query: one row per decoded frame with its idx1
    * offset, chunk size, and pixel sum — the movi index exposed as a
    * table (what a downstream frame-sampling or scene-cut stage reads).
    * Pure narrow flatMap: the payload is decoded where it lies and only
    * the ~nf metadata rows per asset shuffle, never the frame bytes;
    * corrupt containers contribute no rows (mm_avi_stats counts them).
    * The oracle restates offsets and pixel sums in closed form — a
    * walker that misreads chunk padding or idx1 layout cannot match.
    */
  def aviFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    aviAssets(s, dir).mapPartitions {
      _.grouped(64).flatMap(_.flatMap { a =>
        decodeAviFrames(a.payload) match {
          case Some((_, _, _, fr)) =>
            fr.map { case (fi, off, fsz, px) => (a.asset_id, fi, off, fsz, px) }
          case None => Nil
        }
      })
    }.toDF("asset_id", "frame_idx", "frame_off", "frame_size", "px_sum")
  }

  val aviFramesSql: String =
    s"""WITH avi AS (
       |  SELECT doc_id,
       |    2 + strlen(text) % 5 AS nf,
       |    8 + strlen(text) % 9 AS w,
       |    6 + strlen(text) % 7 AS h,
       |    CAST(doc_id % 233 AS INTEGER) AS seed
       |  FROM documents
       |  WHERE doc_id % $CorruptEveryAvi <> 0),
       |fr AS (
       |  SELECT doc_id, CAST(fv.f AS INT) AS frame_idx,
       |    w * h AS fsz, (w * h) % 2 AS pad, seed
       |  FROM avi, LATERAL (SELECT unnest(range(0, nf)) AS f) fv)
       |SELECT doc_id AS asset_id, frame_idx,
       |  CAST(4 + frame_idx * (8 + fsz + pad) AS BIGINT) AS frame_off,
       |  CAST(fsz AS INT) AS frame_size,
       |  CAST(list_sum(list_transform(range(0, fsz),
       |    j -> (seed + 31 * j + 7 * frame_idx) % 256)) AS BIGINT) AS px_sum
       |FROM fr""".stripMargin

  val aviStatsSql: String =
    s"""WITH avi AS (
       |  SELECT doc_id,
       |    2 + strlen(text) % 5 AS nf,
       |    8 + strlen(text) % 9 AS w,
       |    6 + strlen(text) % 7 AS h,
       |    CAST(doc_id % 233 AS INTEGER) AS seed,
       |    doc_id % $CorruptEveryAvi = 0 AS corrupt
       |  FROM documents)
       |SELECT count(CASE WHEN NOT corrupt THEN 1 END) AS n_avi,
       |  count(CASE WHEN corrupt THEN 1 END) AS n_corrupt,
       |  CAST(sum(CASE WHEN NOT corrupt THEN nf END) AS BIGINT) AS sum_frames,
       |  CAST(sum(CASE WHEN NOT corrupt THEN list_sum(list_transform(
       |    range(0, nf * w * h),
       |    j -> (seed + 31 * (j % (w * h)) + 7 * (j // (w * h))) % 256))
       |    END) AS BIGINT) AS sum_px
       |FROM avi""".stripMargin

  /** Temporal sample slots per asset for [[frameSample]]. */
  val FrameSlots = 3

  /** Uniform temporal frame sampling — the video-to-vision-training
    * stage the frame index ([[aviFrames]]) exists for: per asset, pick
    * [[FrameSlots]] frames at indices floor(slot·nf/slots) (slot =
    * 0..slots−1 — the uniform grid every frame-sampling recipe uses;
    * short clips collapse duplicate picks, keeping the earliest slot).
    * Pure composition over the frame-index TABLE: the per-asset frame
    * count and the picks are metadata-sized; the join back to the
    * index is an equi-join on (asset, frame) — no payload ever
    * re-decoded, no frame bytes shuffled. At 100 TB this is the
    * "sample 3 frames from every video" metadata query.
    */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fr = aviFrames(s, dir).localCheckpoint()
    val nf = fr.groupBy($"asset_id").agg(count(lit(1)).as("nf"))
    val picks = nf
      .withColumn("slot", explode(expr(s"sequence(0, ${FrameSlots - 1})")))
      .withColumn("frame_idx", floor($"slot" * $"nf" / FrameSlots).cast("int"))
      .groupBy($"asset_id", $"frame_idx").agg(min($"slot").as("slot"))
    picks.join(fr, Seq("asset_id", "frame_idx"))
      .select($"asset_id", $"slot", $"frame_idx", $"frame_off", $"px_sum")
  }

  /** Oracle: the full [[aviFramesSql]] statement as a nested-WITH CTE,
    * then the identical slot grid and earliest-slot dedupe.
    */
  val frameSampleSql: String =
    s"""WITH frames AS ($aviFramesSql),
       |nf AS (SELECT asset_id, count(*) AS nf FROM frames GROUP BY asset_id),
       |picks AS (
       |  SELECT asset_id, frame_idx, CAST(min(slot) AS INT) AS slot FROM (
       |    SELECT asset_id,
       |      CAST(floor(slot * nf / $FrameSlots) AS INT) AS frame_idx, slot
       |    FROM nf CROSS JOIN (SELECT unnest(range(0, $FrameSlots)) AS slot))
       |  GROUP BY asset_id, frame_idx)
       |SELECT f.asset_id, p.slot, f.frame_idx, f.frame_off, f.px_sum
       |FROM picks p
       |JOIN frames f ON f.asset_id = p.asset_id AND f.frame_idx = p.frame_idx""".stripMargin


  /** Keyframe selection over the frame index: segment each video at
    * data-adaptive scene cuts (a frame is a cut when its pixel-sum
    * delta exceeds 2× the asset's mean |delta| — scale-free, no fixture
    * constant), then pick one representative frame per scene — the
    * frame whose pixel sum is closest to the scene mean (the medoid
    * rule under the 1-D metadata proxy; with real decode the same
    * query runs over per-frame feature norms). This is the stage that
    * turns "video bytes" into the per-scene sample a captioning or
    * training-frame pipeline actually reads: downstream fetches
    * scene-count rows per asset, never frame payloads.
    *
    * Pure window arithmetic over [[aviFrames]]'s columnar index — the
    * payloads were already left where they lie by the frame parse; at
    * 100 TB this query never touches them.
    */
  def keyframeSelect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val wA = Window.partitionBy($"asset_id").orderBy($"frame_idx")
    val d = aviFrames(s, dir)
      .withColumn("delta", abs($"px_sum" - lag($"px_sum", 1).over(wA)))
    val stats = d.groupBy($"asset_id")
      .agg(sum($"delta").cast("double").as("sd"),
        count($"delta").as("nd"))
    val scenes = d.join(stats, "asset_id")
      .withColumn("is_cut",
        when($"delta".isNotNull && $"nd" > 0 &&
          $"delta" > lit(2.0) * ($"sd" / $"nd"), 1L).otherwise(0L))
      .withColumn("scene_id", sum($"is_cut").over(wA))
    val sw = Window.partitionBy($"asset_id", $"scene_id")
    scenes
      .withColumn("smean",
        sum($"px_sum").over(sw).cast("double") / count(lit(1)).over(sw))
      .withColumn("dist", abs($"px_sum".cast("double") - $"smean"))
      .withColumn("scene_start", min($"frame_idx").over(sw))
      .withColumn("scene_len", count(lit(1)).over(sw))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"asset_id", $"scene_id")
          .orderBy($"dist", $"frame_idx")))
      .where($"rn" === 1)
      .select($"asset_id", $"scene_id", $"scene_start".cast("int").as("scene_start"),
        $"scene_len", $"frame_idx".as("key_frame_idx"),
        $"frame_off".as("key_off"), $"frame_size".as("key_size"))
  }

  /** Oracle: the frame-index CTE (offsets/pixel sums closed-form) plus
    * the identical cut/segment/medoid window arithmetic.
    */
  val keyframeSelectSql: String =
    s"""WITH frames AS MATERIALIZED ($aviFramesSql),
       |d AS (
       |  SELECT *, abs(px_sum - lag(px_sum, 1) OVER (
       |    PARTITION BY asset_id ORDER BY frame_idx)) AS delta
       |  FROM frames),
       |stats AS (
       |  SELECT asset_id, CAST(CAST(sum(delta) AS BIGINT) AS DOUBLE) AS sd,
       |    count(delta) AS nd
       |  FROM d GROUP BY asset_id),
       |scenes AS (
       |  SELECT d.*, sum(CASE WHEN d.delta IS NOT NULL AND s.nd > 0
       |      AND d.delta > 2.0 * (s.sd / s.nd) THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY d.asset_id ORDER BY d.frame_idx) AS scene_id
       |  FROM d JOIN stats s ON s.asset_id = d.asset_id),
       |sc AS (
       |  SELECT *,
       |    CAST(CAST(sum(px_sum) OVER w AS BIGINT) AS DOUBLE)
       |      / count(*) OVER w AS smean,
       |    min(frame_idx) OVER w AS scene_start,
       |    count(*) OVER w AS scene_len
       |  FROM scenes
       |  WINDOW w AS (PARTITION BY asset_id, scene_id))
       |SELECT asset_id, CAST(scene_id AS BIGINT) AS scene_id,
       |  CAST(scene_start AS INT) AS scene_start,
       |  CAST(scene_len AS BIGINT) AS scene_len,
       |  frame_idx AS key_frame_idx, frame_off AS key_off,
       |  frame_size AS key_size
       |FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY asset_id, scene_id
       |    ORDER BY abs(CAST(px_sum AS DOUBLE) - smean), frame_idx) AS rn
       |  FROM sc) r
       |WHERE rn = 1""".stripMargin

  // -------------------------------------------------- audio near-dup

  /** PCM sample-trigram shingle size — 3 consecutive samples packed
    * into one BIGINT key (16 bits each, 48 bits total).
    */
  val AudioShingle = 3

  /** Pairs are reported at rounded Jaccard ≥ this. */
  val AudioJaccThresh = 0.5

  /** Stop-shingle document-frequency cut: a window value living in
    * more than this many assets is degenerate content (silence runs,
    * constant tones — audio's stop-words) and is dropped from the
    * inverted index. This bounds the equi-join's per-key fan-out at
    * [[AudioDfCut]]² rows — the 100 TB knob that keeps Σ_shingle
    * |assets(shingle)|² from degenerating on hot keys — at the cost of
    * under-counting `shared` for pairs whose only overlap is
    * degenerate content (which is the point: silence-heavy clips must
    * NOT all pair up). Sizing: measured organic max df is 47 at sf0.1
    * and 261 at the 10× replica (the doc_id % 9973 seed wrap packs
    * replicas into the same value space — a generator artifact real
    * audio fingerprints don't share, but one the cut must clear for
    * the 10× scale point to exercise the full join); 512 clears it
    * with ~2× headroom. On a real corpus the knob is set off the
    * measured df distribution exactly as done here — a df histogram is
    * one map-side-combinable aggregate. The mirror constant appears
    * verbatim in the oracle.
    */
  val AudioDfCut = 512

  /** Audio near-duplicate detection over the DECODED PCM stream —
    * dedup generalized to the audio modality (text shingles →
    * [[Dedup]]; image perceptual hash → `mm_phash_pairs`; this
    * completes the set). Fingerprint = the SET of distinct consecutive
    * [[AudioShingle]]-sample windows (value-based, so it is invariant
    * to TIME SHIFT — a clip re-cut at a different offset shares every
    * interior window with its source, which is exactly what byte-hash
    * dedup misses and the reason audio pipelines fingerprint content,
    * not containers). The decode is the genuine RIFF/WAV parse +
    * little-endian PCM16 sample walk ([[decodeWav]] validation);
    * corrupt payloads drop as in every other audio query. Pair
    * semantics live in [[audioNeardupPairs]]; the oracle reconstructs
    * the samples closed-form from the generator recurrence and runs
    * the same distinct + df-cut + join.
    */
  def audioNeardup(s: SparkSession, dir: String): DataFrame =
    neardupFinalize(audioSharedPairsFor(s, dir))

  private def neardupFinalize(pairs: DataFrame): DataFrame =
    pairs
      .selectExpr("asset_a", "asset_b", "CAST(shared AS BIGINT) AS shared",
        """floor(CAST(shared AS DOUBLE) / (wa + wb - shared) * 1e6 + 0.5)
          | / 1e6 AS jaccard""".stripMargin)
      .where(col("jaccard") >= AudioJaccThresh)

  /** The generator's image payload for one document row — the same BMP
    * + deterministic corruption [[assets]] builds, exposed for the
    * streaming arrival path.
    */
  private[graft] def imageAssetPayload(id: Long, text: String): Array[Byte] = {
    val tb = text.getBytes("UTF-8")
    val bmp = encodeBmp(imgW(tb.length), imgH(tb.length), imgSeed(id))
    if (id % CorruptEvery == 0) bmp(0) = 'X'.toByte
    bmp
  }

  /** The generator's audio payload for one document row — the same WAV
    * + deterministic corruption [[assets]] builds, exposed for the
    * streaming arrival path (which synthesizes assets per micro-batch
    * instead of through the batch Dataset).
    */
  private[graft] def audioAssetPayload(id: Long, text: String): Array[Byte] = {
    val wav = encodeWav(audN(text.getBytes("UTF-8").length), audSeed(id))
    if (id % CorruptEveryAudio == 0) wav(0) = 'X'.toByte
    wav
  }

  /** Packed sample-trigram windows of one audio payload via the
    * genuine RIFF/WAV decode — empty for corrupt or too-short clips.
    */
  private[graft] def audioShingleRows(
      id: Long, payload: Array[Byte]): Iterator[(Long, Long)] =
    decodeWav(payload) match {
      case Some((n, _)) if n >= AudioShingle =>
        val buf = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def u(j: Int): Long = buf.getShort(44 + 2 * j).toLong + 32768L
        (0 until n - (AudioShingle - 1)).iterator.map { i =>
          (id, (u(i) * 65536L + u(i + 1)) * 65536L + u(i + 2))
        }
      case _ => Iterator.empty
    }

  /** The near-dup pair join over raw (asset_id, shingle) rows,
    * factored out so specs can drive it with adversarial shingle
    * streams (repeated windows, constant tones) independent of the
    * fixture generator.
    *
    * Exactness: per-asset windows are DEDUPLICATED first — real audio
    * repeats sample trigrams constantly (silence runs, constant tones,
    * loops), and without the distinct every repeated key multiplies
    * the join rows, so `shared` over-counts quadratically and the
    * reported "jaccard" can exceed 1. After the distinct, Jaccard =
    * shared / (wA + wB − shared) over the distinct-window SETS (wX =
    * |distinct windows of X|) is exact set Jaccard, 6-dp-rounded
    * before the ≥ [[AudioJaccThresh]] cut so the threshold can't
    * wobble cross-engine. Candidates come from an inverted-index
    * equi-join on the packed shingle key — identical plan shape to
    * [[Dedup.ngramJaccard]]'s text join (work is Σ_shingle df², never
    * |assets|²), with keys above [[AudioDfCut]] dropped from the
    * index so degenerate content can't blow the per-key fan-out.
    */
  /** UNthresholded distinct-window pair counts (asset_a, asset_b,
    * shared, wa, wb) — ONE inverted-index join feeds every set-overlap
    * measure over content fingerprints of ANY modality (symmetric
    * Jaccard in [[audioNeardupPairs]]/[[videoNeardupPairs]],
    * asymmetric containment in [[audioContainment]]/
    * [[videoContainment]]) — the [[Dedup.sharedPairs]] pattern carried
    * to (asset, window-key) streams. `dfCut` is the per-modality
    * stop-shingle document-frequency bound ([[AudioDfCut]] /
    * [[VideoDfCut]] — each sized off its OWN measured df
    * distribution).
    */
  private[graft] def sharedWindowPairs(
      s: SparkSession, shingles: DataFrame, dfCut: Int): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val keys = shingles.select($"asset_id", $"shingle").distinct()
      .withColumn("nw", count(lit(1)).over(Window.partitionBy($"asset_id")))
    val idx = keys
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"shingle")))
      .where($"df" <= dfCut)
    val ka = idx.select($"asset_id".as("asset_a"), $"nw".as("wa"), $"shingle")
    val kb = idx.select($"asset_id".as("asset_b"), $"nw".as("wb"), $"shingle")
    ka.join(kb, "shingle")
      .where($"asset_a" < $"asset_b")
      .groupBy($"asset_a", $"asset_b")
      .agg(count(lit(1)).as("shared"),
        max($"wa").as("wa"), max($"wb").as("wb"))
  }

  private[graft] def audioNeardupPairs(
      s: SparkSession, shingles: DataFrame): DataFrame =
    neardupFinalize(sharedWindowPairs(s, shingles, AudioDfCut))

  private[graft] def videoNeardupPairs(
      s: SparkSession, shingles: DataFrame): DataFrame =
    neardupFinalize(sharedWindowPairs(s, shingles, VideoDfCut))

  /** Containment finalize over raw (asset_id, shingle) rows — the
    * streaming arrival path's batch-equivalent closer, proving the
    * cross-trigger window state generalizes past Jaccard: same state,
    * different final expression.
    */
  private[graft] def audioContainmentPairs(
      s: SparkSession, shingles: DataFrame): DataFrame =
    containmentFinalize(sharedWindowPairs(s, shingles, AudioDfCut))

  private[graft] def videoContainmentPairs(
      s: SparkSession, shingles: DataFrame): DataFrame =
    containmentFinalize(sharedWindowPairs(s, shingles, VideoDfCut))

  /** The batch pair table memoized per (session, corpus fingerprint) —
    * the expensive inverted-index join is shared by `mm_audio_neardup`
    * and `mm_audio_containment` (the [[Dedup.sharedPairs]] rationale).
    */
  private val audioPairsCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private def audioShingles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir).filter(_.media_type == "audio")
      .mapPartitions(_.grouped(64).flatMap(
        _.flatMap(a => audioShingleRows(a.asset_id, a.payload))))
      .toDF("asset_id", "shingle")
  }

  private def audioSharedPairsFor(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cached(audioPairsCache, s,
      Similarity.dataKey(dir, "documents"), "mm_audio_pairs") {
      sharedWindowPairs(s, audioShingles(s, dir), AudioDfCut).localCheckpoint()
    }

  /** Either-direction containment bar for [[audioContainment]]. */
  val AudioContainThresh = 0.5

  /** Asymmetric audio containment — |A∩B| / |A| per direction over the
    * distinct-window sets: the measure that catches SUB-CLIP
    * duplication (a short clip cut out of a longer recording), which
    * symmetric Jaccard structurally under-scores — a 50-window clip
    * inside a 250-window recording has jaccard ≈ 0.2 (invisible to the
    * [[AudioJaccThresh]] cut) but containment 1.0. Same memoized
    * [[audioSharedPairsFor]] counts, different final expression; kept
    * when either direction ≥ [[AudioContainThresh]] — the audio twin
    * of [[Dedup.containmentPairs]].
    */
  def audioContainment(s: SparkSession, dir: String): DataFrame =
    containmentFinalize(audioSharedPairsFor(s, dir))

  private[graft] def containmentFinalize(pairs: DataFrame): DataFrame =
    pairs
      .selectExpr("asset_a", "asset_b",
        "round(CAST(shared AS DOUBLE) / wa, 6) AS contain_a_in_b",
        "round(CAST(shared AS DOUBLE) / wb, 6) AS contain_b_in_a")
      .where(col("contain_a_in_b") >= AudioContainThresh ||
        col("contain_b_in_a") >= AudioContainThresh)

  /** Video content near-dup — frame-SIGNATURE trigram shingles through
    * the SAME inverted-index pair kit as the audio path
    * ([[sharedWindowPairs]] + the Jaccard finalize): per-frame pixel
    * sums from the genuine AVI walk ([[decodeAviFrames]] — container
    * grammar, chunk padding, idx1 cross-check) are packed three
    * consecutive frames to a 48-bit key, so the fingerprint is
    * invariant to TIME SHIFT in frames exactly as the audio
    * fingerprint is in samples — a re-cut clip shares every interior
    * frame trigram with its source. Frame signatures (not raw pixels)
    * are the standard video dedup unit: the payload never shuffles,
    * only ~nf 16-bit signatures per asset. Completes content-based
    * near-dup across all three modalities: image (`mm_phash_pairs`),
    * audio (`mm_audio_neardup`), video (this).
    */
  def videoNeardup(s: SparkSession, dir: String): DataFrame =
    neardupFinalize(videoSharedPairsFor(s, dir))

  /** The video pair table memoized per (session, corpus fingerprint) —
    * shared by `mm_video_neardup` and `mm_video_containment` exactly
    * as [[audioPairsCache]] serves the audio measures.
    */
  private val videoPairsCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  /** Video's stop-shingle df cut, sized off VIDEO's own measured df
    * distribution (not audio's): organic max frame-trigram df is 26 at
    * sf0.1 (4 at sf0.01), and the 10× replica packs replicas onto the
    * same trigram values exactly as the audio corpus does (audio grew
    * 47 → 261 there), so a few hundred is the expected 10× ceiling —
    * 512 clears it with ~2× headroom while still dropping genuinely
    * degenerate content (constant-signature slates, black frames). On
    * a real corpus the knob is set off the measured df histogram — one
    * map-side-combinable aggregate. The mirror constant appears
    * verbatim in the video oracles.
    */
  val VideoDfCut = 512

  private def videoSharedPairsFor(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cached(videoPairsCache, s,
      Similarity.dataKey(dir, "documents"), "mm_video_pairs") {
      sharedWindowPairs(s, videoShingles(s, dir), VideoDfCut).localCheckpoint()
    }

  private def videoShingles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    aviAssets(s, dir)
      .mapPartitions(_.grouped(64).flatMap(
        _.flatMap(a => videoShingleRows(a.asset_id, a.payload))))
      .toDF("asset_id", "shingle")
  }

  /** Asymmetric video containment — the sub-clip catcher on the video
    * modality, where it is the CLASSIC case: a short clip lifted from
    * a longer recording shares every one of its frame trigrams with
    * the source (containment 1.0) while symmetric Jaccard reads
    * min/(max) and misses the near-dup bar. Same
    * frame-signature shingles as [[videoNeardup]], the
    * [[containmentFinalize]] expression over the same pair counts.
    */
  def videoContainment(s: SparkSession, dir: String): DataFrame =
    containmentFinalize(videoSharedPairsFor(s, dir))

  /** The generator's AVI payload for one document row — the same
    * container + deterministic corruption [[aviAssets]] builds,
    * exposed for the streaming arrival path.
    */
  private[graft] def videoAssetPayload(id: Long, text: String): Array[Byte] = {
    val tb = text.getBytes("UTF-8")
    val avi = encodeAvi(aviNf(tb.length), aviW(tb.length), aviH(tb.length),
      aviSeed(id))
    if (id % CorruptEveryAvi == 0) avi(0) = 'X'.toByte
    avi
  }

  /** Packed frame-signature trigrams of one AVI payload via the
    * genuine container walk — empty for corrupt or <3-frame clips.
    * Each per-frame pixel sum is masked to 16 bits BEFORE packing
    * (the documented 16-bit-signature contract): [[decodeAviFrames]]
    * accepts arbitrary w×h, and an unmasked sum ≥ 65536 (any frame
    * over 257 max-brightness pixels) would silently alias across the
    * 16-bit lanes, manufacturing spurious shared trigrams. A no-op on
    * the generator corpus (w ≤ 16, h ≤ 12 → sums ≤ 48 960), so the
    * closed-form oracles are unchanged.
    */
  private[graft] def videoShingleRows(
      id: Long, payload: Array[Byte]): Iterator[(Long, Long)] =
    decodeAviFrames(payload) match {
      case Some((_, _, _, fr)) if fr.length >= 3 =>
        val sums = fr.sortBy(_._1).map(_._4 & 0xFFFFL)
        (0 until sums.length - 2).iterator.map { i =>
          (id, (sums(i) * 65536L + sums(i + 1)) * 65536L + sums(i + 2))
        }
      case _ => Iterator.empty
    }

  /** Shared video oracle CTEs (no WITH prefix): closed-form frame
    * sums → packed trigram keys → per-asset/per-key counts → df-cut
    * pair join.
    */
  private def videoPairCtes: String =
    s"""avi AS (
       |  SELECT doc_id, 2 + strlen(text) % 5 AS nf,
       |    8 + strlen(text) % 9 AS w, 6 + strlen(text) % 7 AS h,
       |    CAST(doc_id % 233 AS BIGINT) AS seed
       |  FROM documents WHERE doc_id % $CorruptEveryAvi <> 0),
       |fr AS (
       |  SELECT doc_id, CAST(fv.f AS BIGINT) AS f, w * h AS fsz, seed
       |  FROM avi, LATERAL (SELECT unnest(range(0, nf)) AS f) fv
       |  WHERE nf >= 3),
       |sums AS (
       |  SELECT doc_id, f,
       |    CAST(list_sum(list_transform(range(0, fsz),
       |      j -> (seed + 31 * j + 7 * f) % 256)) AS BIGINT) AS s
       |  FROM fr),
       |sh AS (
       |  SELECT a.doc_id, (a.s * 65536 + b.s) * 65536 + c.s AS shingle
       |  FROM sums a
       |  JOIN sums b ON b.doc_id = a.doc_id AND b.f = a.f + 1
       |  JOIN sums c ON c.doc_id = a.doc_id AND c.f = a.f + 2),
       |keys0 AS (SELECT DISTINCT doc_id, shingle FROM sh),
       |keys AS (
       |  SELECT doc_id, shingle,
       |    count(*) OVER (PARTITION BY doc_id) AS nw,
       |    count(*) OVER (PARTITION BY shingle) AS df
       |  FROM keys0),
       |p AS (
       |  SELECT a.doc_id AS asset_a, b.doc_id AS asset_b,
       |    CAST(count(*) AS BIGINT) AS shared,
       |    max(a.nw) AS wa, max(b.nw) AS wb
       |  FROM keys a JOIN keys b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  WHERE a.df <= $VideoDfCut AND b.df <= $VideoDfCut
       |  GROUP BY 1, 2)""".stripMargin

  val videoNeardupSql: String =
    s"""WITH $videoPairCtes
       |SELECT asset_a, asset_b, shared,
       |  floor(CAST(shared AS DOUBLE) / (wa + wb - shared) * 1e6 + 0.5)
       |    / 1e6 AS jaccard
       |FROM p
       |WHERE floor(CAST(shared AS DOUBLE) / (wa + wb - shared) * 1e6 + 0.5)
       |    / 1e6 >= $AudioJaccThresh""".stripMargin

  val videoContainmentSql: String =
    s"""WITH $videoPairCtes
       |SELECT asset_a, asset_b,
       |  round(CAST(shared AS DOUBLE) / wa, 6) AS contain_a_in_b,
       |  round(CAST(shared AS DOUBLE) / wb, 6) AS contain_b_in_a
       |FROM p
       |WHERE round(CAST(shared AS DOUBLE) / wa, 6) >= $AudioContainThresh
       |   OR round(CAST(shared AS DOUBLE) / wb, 6) >= $AudioContainThresh""".stripMargin

  /** Audio near-dup cluster resolution — the keep/drop decision over
    * whole dup FAMILIES: connected components over the
    * [[audioNeardup]] pair graph (the same level-synchronous
    * [[Dedup.connectedComponents]] propagation `dedup_clusters` runs,
    * sized off the subgraph's edge count), then one canonical keeper
    * per cluster = the clip with the LARGEST distinct-window
    * fingerprint (the master recording; shorter re-cuts drop),
    * asset-id tie-break. Output: cluster_id, n_members,
    * keep_asset_id per family, singletons included — the last step of
    * the audio dedup pipeline (pairs → families → keep set).
    */
  /** Cluster tables memoized per (session, corpus fingerprint) — the
    * `dedup_clusters` materialize-once contract: a production engine
    * writes the label table once per corpus version; every bench rep
    * and downstream consumer reads it. The iterative CC is the
    * expensive part (rounds grow with the dup graph's diameter).
    */
  private val audioClustersCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
  private val videoClustersCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  def audioClusters(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cached(audioClustersCache, s,
      Similarity.dataKey(dir, "documents"), "mm_audio_clusters") {
      contentClusters(s, audioNeardup(s, dir),
        distinctCountWeights(audioShingles(s, dir))).localCheckpoint()
    }

  /** Video near-dup cluster resolution — [[audioClusters]]' pairs →
    * families → keep-set pipeline on the frame-trigram modality:
    * connected components over the [[videoNeardup]] pair graph, one
    * canonical keeper per family = the clip with the LARGEST
    * distinct-trigram fingerprint (the master recording; shorter
    * re-cuts drop), asset-id tie-break, singletons included (every
    * shingled asset, i.e. every decodable ≥3-frame clip).
    */
  def videoClusters(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cached(videoClustersCache, s,
      Similarity.dataKey(dir, "documents"), "mm_video_clusters") {
      contentClusters(s, videoNeardup(s, dir),
        distinctCountWeights(videoShingles(s, dir))).localCheckpoint()
    }

  private val imageClustersCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  /** Image near-dup cluster resolution — completes the cluster matrix
    * across all three modalities: connected components over the
    * [[phashPairs]] hamming-≤3 graph (same level-synchronous
    * [[Dedup.connectedComponents]] propagation as audio/video), one
    * canonical keeper per family = the HIGHEST-RESOLUTION member
    * (pixel count w·h — the master copy; thumbnails and re-encodes
    * drop), asset-id tie-break, singletons included (every decodable
    * image). The keep weight differs from audio/video on purpose:
    * images have no per-asset fingerprint SIZE to rank on (every hash
    * is 64 bits), so the master-copy signal is resolution.
    */
  def imageClusters(s: SparkSession, dir: String): DataFrame =
    graft.Memo.cached(imageClustersCache, s,
      Similarity.dataKey(dir, "documents"), "mm_image_clusters") {
      import s.implicits._
      val st = assets(s, dir).filter(_.media_type == "image")
        .flatMap(a => ahashChunksDims(a.payload).map { case (c, w, h) =>
          (a.asset_id, c(0), c(1), c(2), c(3), w.toLong * h)
        })
        .toDF("asset_id", "c0", "c1", "c2", "c3", "nw")
        .localCheckpoint()
      imageClustersFromChunks(s, st)
    }

  /** Finalize over any (asset_id, c0..c3, nw) table — shared by the
    * batch form (one decode pass) and the streaming ingest form (the
    * drained per-asset state): hamming pair join, then the shared
    * cluster resolution with the resolution keep-weight.
    */
  private[graft] def imageClustersFromChunks(
      s: SparkSession, st: DataFrame): DataFrame = {
    import s.implicits._
    val pairs = phashPairsFromChunks(s,
        st.select("asset_id", "c0", "c1", "c2", "c3"))
      .select($"doc_a".as("asset_a"), $"doc_b".as("asset_b"))
    contentClusters(s, pairs, st.select($"asset_id", $"nw")).localCheckpoint()
  }

  /** Distinct-fingerprint sizes from raw (asset_id, shingle) rows —
    * the keep weight the audio/video families rank on.
    */
  private def distinctCountWeights(shingles: DataFrame): DataFrame =
    shingles.distinct()
      .groupBy(col("asset_id")).agg(count(lit(1)).as("nw"))

  /** Shared cluster resolution over any modality's thresholded pair
    * graph + per-asset keep weights (asset_id, nw): the
    * `dedup_clusters` level-synchronous propagation sized off the
    * subgraph's edge count, then the largest-weight keep rule
    * (asset-id tie-break). Membership = every asset in the weight
    * table; assets off the pair graph come out as singletons.
    */
  private[operators] def contentClusters(s: SparkSession,
      pairsThresholded: DataFrame, weights: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val pairs = pairsThresholded.select($"asset_a", $"asset_b")
    val staged = pairs.union(pairs.select($"asset_b", $"asset_a"))
      .toDF("src", "dst").localCheckpoint()
    val nEdges = staged.count()
    val nParts = math.min(nEdges / (1L << 20) + 1, 4096L).toInt
    val edges =
      if (nParts == staged.rdd.getNumPartitions) staged
      else staged.repartition(nParts).localCheckpoint()
    val maxIters =
      2L * graft.functions.Hashing.log2ceil(math.max(2L, 2L * nEdges)) + 8L
    val (labels, _) =
      Dedup.connectedComponents(edges, nParts, maxIters, 2L * nEdges + 2L)
    val lbl = weights
      .join(labels.withColumnRenamed("doc_id", "asset_id"),
        Seq("asset_id"), "left")
      .select($"asset_id", $"nw",
        coalesce($"label", $"asset_id").as("cluster_id"))
    val w = Window.partitionBy($"cluster_id").orderBy($"nw".desc, $"asset_id")
    lbl.withColumn("rn", row_number().over(w))
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_members"),
        max(when($"rn" === 1, $"asset_id")).as("keep_asset_id"))
  }

  /** Shared oracle CTEs (no WITH prefix — callers prepend plain or
    * RECURSIVE): closed-form sample reconstruction → distinct window
    * keys → per-asset/per-key counts → df-cut pair join.
    */
  private def audioPairCtes: String =
    s"""aud AS (
       |  SELECT doc_id, 50 + strlen(text) % 211 AS n,
       |    CAST(doc_id % 9973 AS BIGINT) AS seed
       |  FROM documents
       |  WHERE doc_id % 3 = 1 AND doc_id % $CorruptEveryAudio <> 0),
       |sh AS (
       |  SELECT doc_id, n, seed,
       |    unnest(range(0, n - ${AudioShingle - 1})) AS i FROM aud),
       |keys0 AS (
       |  SELECT DISTINCT doc_id,
       |    (CAST((seed + 31 * i) % 65536 AS BIGINT) * 65536
       |      + CAST((seed + 31 * (i + 1)) % 65536 AS BIGINT)) * 65536
       |      + CAST((seed + 31 * (i + 2)) % 65536 AS BIGINT) AS shingle
       |  FROM sh),
       |keys AS (
       |  SELECT doc_id, shingle,
       |    count(*) OVER (PARTITION BY doc_id) AS nw,
       |    count(*) OVER (PARTITION BY shingle) AS df
       |  FROM keys0),
       |p AS (
       |  SELECT a.doc_id AS asset_a, b.doc_id AS asset_b,
       |    CAST(count(*) AS BIGINT) AS shared,
       |    max(a.nw) AS wa, max(b.nw) AS wb
       |  FROM keys a JOIN keys b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  WHERE a.df <= $AudioDfCut AND b.df <= $AudioDfCut
       |  GROUP BY 1, 2)""".stripMargin

  val audioNeardupSql: String =
    s"""WITH $audioPairCtes
       |SELECT asset_a, asset_b, shared,
       |  floor(CAST(shared AS DOUBLE) / (wa + wb - shared) * 1e6 + 0.5)
       |    / 1e6 AS jaccard
       |FROM p
       |WHERE floor(CAST(shared AS DOUBLE) / (wa + wb - shared) * 1e6 + 0.5)
       |    / 1e6 >= $AudioJaccThresh""".stripMargin

  val audioContainmentSql: String =
    s"""WITH $audioPairCtes
       |SELECT asset_a, asset_b,
       |  round(CAST(shared AS DOUBLE) / wa, 6) AS contain_a_in_b,
       |  round(CAST(shared AS DOUBLE) / wb, 6) AS contain_b_in_a
       |FROM p
       |WHERE round(CAST(shared AS DOUBLE) / wa, 6) >= $AudioContainThresh
       |   OR round(CAST(shared AS DOUBLE) / wb, 6) >= $AudioContainThresh""".stripMargin

  val videoClustersSql: String =
    s"""WITH RECURSIVE $videoPairCtes,
       |nd AS (
       |  SELECT asset_a, asset_b FROM p
       |  WHERE floor(CAST(shared AS DOUBLE) / (wa + wb - shared) * 1e6 + 0.5)
       |      / 1e6 >= $AudioJaccThresh),
       |anw AS (SELECT DISTINCT doc_id, nw FROM keys),
       |edges AS (
       |  SELECT asset_a AS src, asset_b AS dst FROM nd
       |  UNION ALL SELECT asset_b, asset_a FROM nd),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM anw
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
       |clusters AS (
       |  SELECT a AS asset_id, min(b) AS cluster_id FROM reach GROUP BY a),
       |ranked AS (
       |  SELECT c.cluster_id, c.asset_id,
       |    row_number() OVER (PARTITION BY c.cluster_id
       |      ORDER BY w.nw DESC, c.asset_id) AS rn
       |  FROM clusters c JOIN anw w ON w.doc_id = c.asset_id)
       |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |  max(CASE WHEN rn = 1 THEN asset_id END) AS keep_asset_id
       |FROM ranked GROUP BY cluster_id""".stripMargin

  val audioClustersSql: String =
    s"""WITH RECURSIVE $audioPairCtes,
       |nd AS (
       |  SELECT asset_a, asset_b FROM p
       |  WHERE floor(CAST(shared AS DOUBLE) / (wa + wb - shared) * 1e6 + 0.5)
       |      / 1e6 >= $AudioJaccThresh),
       |anw AS (SELECT DISTINCT doc_id, nw FROM keys),
       |edges AS (
       |  SELECT asset_a AS src, asset_b AS dst FROM nd
       |  UNION ALL SELECT asset_b, asset_a FROM nd),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM aud
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
       |clusters AS (
       |  SELECT a AS asset_id, min(b) AS cluster_id FROM reach GROUP BY a),
       |ranked AS (
       |  SELECT c.cluster_id, c.asset_id,
       |    row_number() OVER (PARTITION BY c.cluster_id
       |      ORDER BY w.nw DESC, c.asset_id) AS rn
       |  FROM clusters c JOIN anw w ON w.doc_id = c.asset_id)
       |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |  max(CASE WHEN rn = 1 THEN asset_id END) AS keep_asset_id
       |FROM ranked GROUP BY cluster_id""".stripMargin

  val imageClustersSql: String =
    s"""WITH RECURSIVE $phashPairCtes,
       |anw AS (
       |  SELECT doc_id, CAST(w AS BIGINT) * h AS nw
       |  FROM geom WHERE NOT corrupt),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM hp
       |  UNION ALL SELECT doc_b, doc_a FROM hp),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM anw
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
       |clusters AS (
       |  SELECT a AS asset_id, min(b) AS cluster_id FROM reach GROUP BY a),
       |ranked AS (
       |  SELECT c.cluster_id, c.asset_id,
       |    row_number() OVER (PARTITION BY c.cluster_id
       |      ORDER BY w.nw DESC, c.asset_id) AS rn
       |  FROM clusters c JOIN anw w ON w.doc_id = c.asset_id)
       |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |  max(CASE WHEN rn = 1 THEN asset_id END) AS keep_asset_id
       |FROM ranked GROUP BY cluster_id""".stripMargin

  // ------------------------------------------- speech-caption alignment

  /** Plausible speaking-rate band for [[speechCaptionAlign]]: tokens
    * per active VAD frame. Integer bounds so the per-pair test is
    * exact rational arithmetic (lo·active ≤ toks ≤ hi·active) — no
    * float division reaches a threshold on either engine.
    */
  val SpeechRateLo = 5L
  val SpeechRateHi = 50L

  /** Speech–caption alignment — the cross-modal QA gate an audio-text
    * training pipeline runs before pairing clips with transcripts:
    * join each decodable audio asset's VAD activity ([[audioVad]]'s
    * frame energies) with the SAME document's text (the transcript
    * stand-in) and judge the speaking rate. Per source: pair count,
    * silent clips (captioned but zero active frames — mislabeled
    * audio), pairs inside the [[SpeechRateLo]]–[[SpeechRateHi]]
    * tokens-per-active-frame band, and the corpus rate as a
    * ratio-of-integer-sums (one exact division, 6-dp-rounded — never
    * an average of per-pair floats, whose summation order would wobble
    * cross-engine).
    *
    * Scale shape: the VAD side is the batched mapPartitions decode
    * (payloads never shuffle — only three scalars per asset), the join
    * is a doc_id equi-join, and the output is |sources| rows.
    */
  def speechCaptionAlign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vad = audioVad(s, dir).select($"asset_id", $"n_active")
    val caps = Tables.documents(s, dir)
      .selectExpr("doc_id", "source",
        s"size(${graft.operators.TextOps.tokensExpr}) AS n_toks")
    vad.join(caps, $"asset_id" === $"doc_id")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"n_active" === 0L, 1L).otherwise(0L)).as("n_silent"),
        sum(when($"n_active" > 0L &&
          $"n_toks" >= lit(SpeechRateLo) * $"n_active" &&
          $"n_toks" <= lit(SpeechRateHi) * $"n_active", 1L)
          .otherwise(0L)).as("n_aligned"),
        sum(when($"n_active" > 0L, $"n_toks").otherwise(0L)).as("spoken_toks"),
        sum($"n_active").as("active_frames"))
      .selectExpr("source", "n_pairs",
        "CAST(n_silent AS BIGINT) AS n_silent",
        "CAST(n_aligned AS BIGINT) AS n_aligned",
        "CAST(spoken_toks AS BIGINT) AS spoken_toks",
        "CAST(active_frames AS BIGINT) AS active_frames",
        """CASE WHEN active_frames > 0 THEN
          |  floor(CAST(spoken_toks AS DOUBLE) / active_frames * 1e6 + 0.5)
          |    / 1e6 END AS toks_per_active_frame""".stripMargin)
  }

  val speechCaptionAlignSql: String =
    s"""WITH aud AS (
       |  SELECT doc_id, 50 + strlen(text) % 211 AS n,
       |    CAST(doc_id % 9973 AS INTEGER) AS seed
       |  FROM documents
       |  WHERE doc_id % 3 = 1 AND doc_id % $CorruptEveryAudio <> 0),
       |frames AS (
       |  SELECT doc_id, n, seed,
       |    unnest(range(0, (n + $VadFrameSamples - 1) // $VadFrameSamples)) AS fi
       |  FROM aud),
       |fe AS (
       |  SELECT doc_id,
       |    list_sum(list_transform(
       |      range(CAST(fi * $VadFrameSamples AS INTEGER),
       |            CAST(least(fi * $VadFrameSamples + $VadFrameSamples, n) AS INTEGER)),
       |      i -> abs((seed + 31 * i) % 65536 - 32768))) > $VadThreshold AS active
       |  FROM frames),
       |vad AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN active THEN 1 ELSE 0 END) AS n_active
       |  FROM fe GROUP BY doc_id),
       |caps AS (
       |  SELECT doc_id, source,
       |    len(${graft.operators.TextOps.duckTokensExpr}) AS n_toks
       |  FROM documents)
       |SELECT c.source, count(*) AS n_pairs,
       |  CAST(sum(CASE WHEN v.n_active = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_silent,
       |  CAST(sum(CASE WHEN v.n_active > 0
       |    AND c.n_toks >= $SpeechRateLo * v.n_active
       |    AND c.n_toks <= $SpeechRateHi * v.n_active
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_aligned,
       |  CAST(sum(CASE WHEN v.n_active > 0 THEN c.n_toks ELSE 0 END)
       |    AS BIGINT) AS spoken_toks,
       |  CAST(sum(v.n_active) AS BIGINT) AS active_frames,
       |  CASE WHEN sum(v.n_active) > 0 THEN
       |    floor(CAST(sum(CASE WHEN v.n_active > 0 THEN c.n_toks ELSE 0 END)
       |      AS DOUBLE) / sum(v.n_active) * 1e6 + 0.5) / 1e6
       |  END AS toks_per_active_frame
       |FROM vad v JOIN caps c ON v.doc_id = c.doc_id
       |GROUP BY c.source""".stripMargin

  // --------------------------------------------------- A/V sync QA gate

  /** Symmetric activity band for [[avSync]]: an audio/video pair is
    * "in sync" when each side's active-frame count is within this
    * factor of the other (integer comparisons only — no float reaches
    * the threshold on either engine). Audio VAD frames (5 ms) and
    * video frames (2–6/clip) land in comparable single-digit counts on
    * this corpus, so a 4× band separates organic pairs from
    * silent-vs-busy mismatches.
    */
  val AvSyncBand = 4L

  /** A/V sync QA gate — [[speechCaptionAlign]]'s pattern applied to
    * the audio↔video pair of the SAME document (audio docs are
    * doc_id % 3 == 1 and every doc carries an AVI, so the equi-join is
    * organically populated): audio activity = the genuine VAD framing
    * over decoded PCM ([[audioVad]]), video activity = bright-frame
    * count over the genuine AVI walk ([[aviFrames]] — a frame is
    * active when its pixel sum exceeds the mid-gray mean, the integer
    * test 2·px_sum > 255·frame_size). Per source: pair count,
    * silent-side mismatches (one modality active, the other dead —
    * the mislabeled-pair signal an A/V training pipeline gates on),
    * pairs inside the symmetric [[AvSyncBand]] activity band, and the
    * corpus activity rate as ONE exact ratio-of-integer-sums
    * (6-dp-rounded — never an average of per-pair floats). Completes
    * the cross-modal QA triangle: text↔audio
    * (`mm_speech_caption_align`), audio↔video (this).
    *
    * Scale shape: both decodes are batched mapPartitions (payloads
    * never shuffle — a handful of scalars per asset), the join is a
    * doc_id equi-join, output is |sources| rows.
    */
  def avSync(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val aud = audioVad(s, dir).select($"asset_id", $"n_active".as("a_active"))
    val vid = aviFrames(s, dir)
      .groupBy($"asset_id")
      .agg(sum(when(lit(2L) * $"px_sum" > lit(255L) * $"frame_size", 1L)
        .otherwise(0L)).as("v_active"))
    val src = Tables.documents(s, dir).select($"doc_id", $"source")
    aud.join(vid, "asset_id")
      .join(src, $"asset_id" === $"doc_id")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(($"a_active" === 0L) =!= ($"v_active" === 0L), 1L)
          .otherwise(0L)).as("n_silent_mismatch"),
        sum(when($"a_active" > 0L && $"v_active" > 0L &&
          $"a_active" <= lit(AvSyncBand) * $"v_active" &&
          $"v_active" <= lit(AvSyncBand) * $"a_active", 1L)
          .otherwise(0L)).as("n_synced"),
        sum($"a_active").as("audio_active"),
        sum($"v_active").as("video_active"))
      .selectExpr("source", "n_pairs",
        "CAST(n_silent_mismatch AS BIGINT) AS n_silent_mismatch",
        "CAST(n_synced AS BIGINT) AS n_synced",
        "CAST(audio_active AS BIGINT) AS audio_active",
        "CAST(video_active AS BIGINT) AS video_active",
        """CASE WHEN video_active > 0 THEN
          |  floor(CAST(audio_active AS DOUBLE) / video_active * 1e6 + 0.5)
          |    / 1e6 END AS av_rate""".stripMargin)
  }

  val avSyncSql: String =
    s"""WITH aud AS (
       |  SELECT doc_id, 50 + strlen(text) % 211 AS n,
       |    CAST(doc_id % 9973 AS INTEGER) AS seed
       |  FROM documents
       |  WHERE doc_id % 3 = 1 AND doc_id % $CorruptEveryAudio <> 0),
       |frames AS (
       |  SELECT doc_id, n, seed,
       |    unnest(range(0, (n + $VadFrameSamples - 1) // $VadFrameSamples)) AS fi
       |  FROM aud),
       |fe AS (
       |  SELECT doc_id,
       |    list_sum(list_transform(
       |      range(CAST(fi * $VadFrameSamples AS INTEGER),
       |            CAST(least(fi * $VadFrameSamples + $VadFrameSamples, n) AS INTEGER)),
       |      i -> abs((seed + 31 * i) % 65536 - 32768))) > $VadThreshold AS active
       |  FROM frames),
       |vad AS (
       |  SELECT doc_id, sum(CASE WHEN active THEN 1 ELSE 0 END) AS a_active
       |  FROM fe GROUP BY doc_id),
       |vavi AS (
       |  SELECT doc_id, 2 + strlen(text) % 5 AS nf, 8 + strlen(text) % 9 AS w,
       |    6 + strlen(text) % 7 AS h, CAST(doc_id % 233 AS BIGINT) AS seed
       |  FROM documents WHERE doc_id % $CorruptEveryAvi <> 0),
       |vfr AS (
       |  SELECT doc_id, CAST(fv.f AS BIGINT) AS f, w * h AS fsz, seed
       |  FROM vavi, LATERAL (SELECT unnest(range(0, nf)) AS f) fv),
       |vsum AS (
       |  SELECT doc_id, fsz,
       |    CAST(list_sum(list_transform(range(0, fsz),
       |      j -> (seed + 31 * j + 7 * f) % 256)) AS BIGINT) AS s
       |  FROM vfr),
       |vact AS (
       |  SELECT doc_id, sum(CASE WHEN 2 * s > 255 * fsz THEN 1 ELSE 0 END)
       |    AS v_active
       |  FROM vsum GROUP BY doc_id)
       |SELECT d.source, count(*) AS n_pairs,
       |  CAST(sum(CASE WHEN (a.a_active = 0) <> (v.v_active = 0)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_silent_mismatch,
       |  CAST(sum(CASE WHEN a.a_active > 0 AND v.v_active > 0
       |    AND a.a_active <= $AvSyncBand * v.v_active
       |    AND v.v_active <= $AvSyncBand * a.a_active
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_synced,
       |  CAST(sum(a.a_active) AS BIGINT) AS audio_active,
       |  CAST(sum(v.v_active) AS BIGINT) AS video_active,
       |  CASE WHEN sum(v.v_active) > 0 THEN
       |    floor(CAST(sum(a.a_active) AS DOUBLE) / sum(v.v_active) * 1e6 + 0.5)
       |      / 1e6 END AS av_rate
       |FROM vad a
       |JOIN vact v ON v.doc_id = a.doc_id
       |JOIN documents d ON d.doc_id = a.doc_id
       |GROUP BY d.source""".stripMargin

  // ------------------------------------------- image-in-video containment

  /** Image-in-video containment — the cross-modal containment case the
    * modality matrix stops short of: match each decodable still
    * image's 16-bit pixel-sum signature against every video's
    * per-frame signatures (the SAME masked 16-bit lane contract
    * [[videoShingleRows]] packs — px_sum mod 2¹⁶ on both sides).
    * Output: one row per (image, video) pair sharing ≥ 1 frame
    * signature, with the matched-frame count and the fraction of the
    * video's frames matched (a lifted still covers 100% of a slate
    * clip, ~1/nf of a normal one).
    *
    * Scale shape: both signature streams come off batched
    * mapPartitions decodes (payloads never shuffle — one long per
    * image, ~nf longs per video); the match is a signature equi-join.
    * The 16-bit sum is the generator's decodable stand-in for a real
    * perceptual hash — at production scale the signature is the
    * 64-bit pHash ([[ahashChunks]], as `mm_phash_pairs` uses), where
    * the same equi-join is selective and the kit's hot-key df-cut
    * applies; the cross-modal join plumbing proven here is identical.
    */
  def imageInVideo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val imgs = extractFeatures(assets(s, dir)).toDF()
      .where($"ok" && $"media_type" === "image")
      .select($"asset_id".as("image_id"), $"luma_sum")
    val vf = aviFrames(s, dir)
      .select($"asset_id".as("video_id"), $"px_sum")
    imageInVideoPairs(imgs, vf)
  }

  /** Core of [[imageInVideo]] over raw (image_id, luma_sum) and
    * (video_id, px_sum) frames — the seam the planted-frame specs
    * drive. Masks both sums to the 16-bit signature lane before the
    * join.
    */
  private[graft] def imageInVideoPairs(
      imgs: DataFrame, frames: DataFrame): DataFrame = {
    val i = imgs.select(col("image_id"),
      pmod(col("luma_sum"), lit(65536L)).as("sig"))
    val vf = frames.select(col("video_id"),
      pmod(col("px_sum"), lit(65536L)).as("sig"))
    val nf = vf.groupBy(col("video_id"))
      .agg(count(lit(1)).as("n_video_frames"))
    i.join(vf, "sig")
      .groupBy(col("image_id"), col("video_id"))
      .agg(count(lit(1)).as("n_frames_matched"))
      .join(nf, "video_id")
      .selectExpr("image_id", "video_id",
        "CAST(n_frames_matched AS BIGINT) AS n_frames_matched",
        "CAST(n_video_frames AS BIGINT) AS n_video_frames",
        """round(CAST(n_frames_matched AS DOUBLE) / n_video_frames, 6)
          | AS frame_coverage""".stripMargin)
  }

  val imageInVideoSql: String =
    s"""WITH geom AS (
       |  SELECT doc_id, 4 + strlen(text) % 29 AS w, 4 + strlen(text) % 13 AS h,
       |    CAST(doc_id % 251 AS INTEGER) AS seed
       |  FROM documents WHERE doc_id % 3 = 0 AND doc_id % $CorruptEvery <> 0),
       |img AS (
       |  SELECT doc_id AS image_id,
       |    CAST(list_sum(list_transform(range(0, 3 * w * h),
       |      j -> (seed + 31 * j) % 256)) AS BIGINT) % 65536 AS sig
       |  FROM geom),
       |avi AS (
       |  SELECT doc_id, 2 + strlen(text) % 5 AS nf, 8 + strlen(text) % 9 AS w,
       |    6 + strlen(text) % 7 AS h, CAST(doc_id % 233 AS BIGINT) AS seed
       |  FROM documents WHERE doc_id % $CorruptEveryAvi <> 0),
       |vfr AS (
       |  SELECT doc_id, CAST(fv.f AS BIGINT) AS f, w * h AS fsz, seed
       |  FROM avi, LATERAL (SELECT unnest(range(0, nf)) AS f) fv),
       |vf AS (
       |  SELECT doc_id AS video_id,
       |    CAST(list_sum(list_transform(range(0, fsz),
       |      j -> (seed + 31 * j + 7 * f) % 256)) AS BIGINT) % 65536 AS sig
       |  FROM vfr),
       |nfr AS (SELECT video_id, count(*) AS n_video_frames FROM vf
       |  GROUP BY video_id),
       |m AS (
       |  SELECT i.image_id, v.video_id, count(*) AS n_frames_matched
       |  FROM img i JOIN vf v ON v.sig = i.sig GROUP BY 1, 2)
       |SELECT m.image_id, m.video_id,
       |  CAST(m.n_frames_matched AS BIGINT) AS n_frames_matched,
       |  CAST(nfr.n_video_frames AS BIGINT) AS n_video_frames,
       |  round(CAST(m.n_frames_matched AS DOUBLE) / nfr.n_video_frames, 6)
       |    AS frame_coverage
       |FROM m JOIN nfr ON nfr.video_id = m.video_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_av_sync" -> (avSync _),
    "mm_image_in_video" -> (imageInVideo _),
    "mm_speech_caption_align" -> (speechCaptionAlign _),
    "mm_audio_containment" -> (audioContainment _),
    "mm_audio_clusters" -> (audioClusters _),
    "mm_video_clusters" -> (videoClusters _),
    "mm_image_clusters" -> (imageClusters _),
    "mm_video_neardup" -> (videoNeardup _),
    "mm_video_containment" -> (videoContainment _),
    "mm_audio_neardup" -> (audioNeardup _),
    "mm_frame_sample" -> (frameSample _),
    "mm_image_entropy" -> (imageEntropy _),
    "mm_audio_vad" -> (audioVad _),
    "mm_scene_cuts" -> (sceneCuts _),
    "mm_phash_pairs" -> (phashPairs _),
    "mm_asset_stats" -> (assetStats _),
    "mm_resized_dims" -> (resizedDims _),
    "mm_pixel_stats" -> (pixelStats _),
    "mm_png_stats" -> (pngStats _),
    "mm_jpeg_dims" -> (jpegDims _),
    "mm_gif_stats" -> (gifStats _),
    "mm_avi_stats" -> (aviStats _),
    "mm_avi_frames" -> (aviFrames _),
    "mm_keyframe_select" -> (keyframeSelect _),
    "mm_audio_stats" -> (audioStats _),
    "mm_caption_pairs" -> (captionPairs _))

  def oracles: Map[String, String] = Map(
    "mm_av_sync" -> avSyncSql,
    "mm_image_in_video" -> imageInVideoSql,
    "mm_speech_caption_align" -> speechCaptionAlignSql,
    "mm_audio_containment" -> audioContainmentSql,
    "mm_audio_clusters" -> audioClustersSql,
    "mm_video_clusters" -> videoClustersSql,
    "mm_image_clusters" -> imageClustersSql,
    "mm_video_neardup" -> videoNeardupSql,
    "mm_video_containment" -> videoContainmentSql,
    "mm_audio_neardup" -> audioNeardupSql,
    "mm_image_entropy" -> imageEntropySql,
    "mm_audio_vad" -> audioVadSql,
    "mm_scene_cuts" -> sceneCutsSql,
    "mm_phash_pairs" -> phashPairsSql,
    "mm_asset_stats" -> assetStatsSql,
    "mm_resized_dims" -> resizedDimsSql,
    "mm_pixel_stats" -> pixelStatsSql,
    "mm_png_stats" -> pngStatsSql,
    "mm_jpeg_dims" -> jpegDimsSql,
    "mm_gif_stats" -> gifStatsSql,
    "mm_avi_stats" -> aviStatsSql,
    "mm_avi_frames" -> aviFramesSql,
    "mm_keyframe_select" -> keyframeSelectSql,
    "mm_frame_sample" -> frameSampleSql,
    "mm_audio_stats" -> audioStatsSql,
    "mm_caption_pairs" -> captionPairsSql)
}
