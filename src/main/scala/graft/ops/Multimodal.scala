package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: media carried as opaque `binary` payloads with
  * typed metadata, decoded in batched per-partition passes.
  *
  * The decode boundary is REAL: payloads are multi-frame binary PPM
  * (P6) streams and [[decodeFeatures]] parses the actual bytes —
  * header grammar, dimensions, and a full pixel scan — with no
  * external codec dependency (PPM is the trivial open format that
  * needs none). A production pipeline swaps the parser body for
  * Pillow/ffmpeg behind the same typed Dataset boundary; everything
  * around it — `mapPartitions` batching (the JVM twin of mapInPandas'
  * batch iterator), row-local compute, no shuffle, schema declared up
  * front — is unchanged by that swap.
  *
  * Scale: decode is embarrassingly parallel; partition count (not row
  * count) bounds codec parallelism. Payload bytes never shuffle — the
  * features projection drops them before any wide operator.
  */
object Multimodal {
  /** A media row: id + opaque payload + declared mime. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)

  /** Typed decode output. `pixel_sum` is the sum of every pixel byte
    * across all frames — content evidence that the decoder actually
    * read the raster, not just the header. */
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, n_frames: Int,
      pixel_sum: Long)

  val PpmMime = "image/x-portable-pixmap"

  /** Deterministic media fixture: each document becomes a multi-frame
    * P6 stream whose dimensions derive from the utf-8 text length n
    * (w = 1 + n % 64, h = 1 + n % 48, frames = 1 + n % 7) and whose
    * frame f is filled with the constant byte (doc_id + f) % 256 —
    * closed forms a SQL oracle can recompute without touching bytes.
    * Dimension caps keep the largest payload ~64 KB so the fixture
    * scales linearly with document count. */
  def packPpm(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) => MediaRow(id, buildPpmBytes(id, text), PpmMime) }
  }

  /** The deterministic P6 byte builder behind [[packPpm]], exposed so
    * callers can key the CONTENT independently of the row id (the
    * binary-dedup query synthesizes shared images across documents —
    * content id = doc_id mod k — while keeping per-doc rows). */
  def buildPpmBytes(id: Long, text: String): Array[Byte] = {
    val n = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    val w = 1 + n % 64
    val h = 1 + n % 48
    val frames = 1 + n % 7
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < frames) {
      out.write(s"P6\n$w $h\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val px = ((id + f) % 256).toInt
      val raster = new Array[Byte](w * h * 3)
      java.util.Arrays.fill(raster, px.toByte)
      out.write(raster)
      f += 1
    }
    out.toByteArray
  }

  /** Batched decode boundary: parses every payload as a concatenated
    * P6 stream. Malformed bytes fail loudly (a real pipeline would
    * route them to a quarantine sink instead of guessing). */
  def decodeFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    // per-partition batch iterator: a real codec swap would open its
    // native context once here, before the map
    ds.mapPartitions(_.map(decodePpm))
  }

  /** P6 parser: magic, ASCII dims, maxval 255, then a full raster
    * scan per frame. Frames must agree on dimensions (the fixture
    * guarantees it; a mixed-dims stream is malformed here). */
  private def decodePpm(r: MediaRow): MediaFeatures = {
    val b = r.payload
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"doc ${r.doc_id}: $msg")
    var off = 0
    var frames = 0
    var w = -1
    var h = -1
    var pixelSum = 0L
    while (off < b.length) {
      if (off + 3 > b.length || b(off) != 'P' || b(off + 1) != '6' || b(off + 2) != '\n')
        fail(s"bad PPM magic at offset $off")
      off += 3
      def readInt(term: Char): Int = {
        var v = 0
        var digits = 0
        while (off < b.length && b(off) >= '0' && b(off) <= '9') {
          v = v * 10 + (b(off) - '0'); digits += 1; off += 1
        }
        if (digits == 0 || off >= b.length || b(off) != term)
          fail(s"bad PPM header near offset $off")
        off += 1
        v
      }
      val fw = readInt(' ')
      val fh = readInt('\n')
      val maxval = readInt('\n')
      if (maxval != 255) fail(s"unsupported maxval $maxval")
      if (frames > 0 && (fw != w || fh != h))
        fail(s"frame $frames dims ${fw}x$fh != ${w}x$h")
      w = fw; h = fh
      val npix = fw * fh * 3
      if (off + npix > b.length) fail(s"truncated raster at offset $off")
      var i = 0
      while (i < npix) { pixelSum += b(off + i) & 0xff; i += 1 }
      off += npix
      frames += 1
    }
    if (frames == 0) fail("empty payload")
    MediaFeatures(r.doc_id, r.mime, b.length.toLong, w, h, 3, frames, pixelSum)
  }

  val WavMime = "audio/wav"

  /** An audio row: id + opaque payload + declared mime. */
  final case class AudioRow(doc_id: Long, payload: Array[Byte], mime: String)

  /** Typed WAV decode output. `sample_sum` sums every decoded PCM
    * sample value across channels — content evidence the decoder read
    * the whole data chunk, the audio twin of pixel_sum. */
  final case class AudioFeatures(
      doc_id: Long, mime: String, n_bytes: Long,
      channels: Int, sample_rate: Int, bits: Int, n_samples: Int,
      sample_sum: Long)

  /** Deterministic audio fixture: each document becomes a canonical
    * 44-byte-header RIFF/WAVE PCM file whose parameters derive from
    * the utf-8 text length n and doc id — closed forms a SQL oracle
    * recomputes without touching bytes:
    *   sample_rate = 8000 + (n % 3) * 4000, channels = 1 + id % 2,
    *   16-bit, n_samples = 64 + n % 256 per channel, and interleaved
    *   value j (over n_samples*channels values) =
    *   (id*31 + j*7) % 65536 − 32768. Payloads stay ≈ 1 KB. */
  def packWav(df: DataFrame, idCol: String, textCol: String): Dataset[AudioRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val n = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
        val sampleRate = 8000 + (n % 3) * 4000
        val channels = (1 + id % 2).toInt
        val nSamples = 64 + n % 256
        val m = nSamples * channels
        val dataBytes = m * 2
        val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        bb.putInt(36 + dataBytes) // RIFF payload size
        bb.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        bb.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        bb.putInt(16)             // PCM fmt chunk size
        bb.putShort(1)            // audio format: PCM
        bb.putShort(channels.toShort)
        bb.putInt(sampleRate)
        bb.putInt(sampleRate * channels * 2) // byte rate
        bb.putShort((channels * 2).toShort)  // block align
        bb.putShort(16)           // bits per sample
        bb.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        bb.putInt(dataBytes)
        var j = 0
        while (j < m) {
          bb.putShort((((id * 31 + j * 7) % 65536) - 32768).toShort)
          j += 1
        }
        AudioRow(id, bb.array(), WavMime)
      }
  }

  /** Batched WAV decode boundary — same mapPartitions shape as
    * [[decodeFeatures]]; proves the typed decode boundary generalizes
    * beyond one codec. Malformed bytes fail loudly. */
  def decodeAudio(ds: Dataset[AudioRow]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decodeWav))
  }

  /** One fixed-width analysis frame of decoded PCM: `n_vals`
    * interleaved sample values (≤ frame width), `frame_sum` their
    * integer sum — the windowed-feature shape (energy/RMS per frame)
    * every audio pipeline computes after decode. */
  final case class AudioFrame(
      doc_id: Long, frame_idx: Int, n_vals: Int, frame_sum: Long)

  /** Per-frame sample sums over `frameVals` interleaved values:
    * decode + window in ONE pass over the bytes (payloads never
    * materialize a samples array per row), rows multiply only AFTER
    * the payload is dropped — the frame table is integers. */
  def frameEnergies(ds: Dataset[AudioRow],
      frameVals: Int = 256): Dataset[AudioFrame] = {
    import ds.sparkSession.implicits._
    require(frameVals > 0, s"frameVals must be positive, got $frameVals")
    ds.mapPartitions(_.flatMap { r =>
      val sums = scala.collection.mutable.ArrayBuffer.empty[Long]
      var nVals = 0
      walkWav(r) { (j, v) =>
        val f = j / frameVals
        while (sums.size <= f) sums += 0L
        sums(f) += v
        nVals += 1
      }
      sums.iterator.zipWithIndex.map { case (s, i) =>
        AudioFrame(r.doc_id, i,
          math.min(frameVals, nVals - i * frameVals), s)
      }
    })
  }

  private def decodeWav(r: AudioRow): AudioFeatures =
    walkWav(r)((_, _) => ())

  /** RIFF/WAVE PCM parser: RIFF grammar, fmt chunk fields, then a
    * full sample scan of the data chunk. Unknown chunks before data
    * are skipped per the RIFF spec; PCM 16-bit only. `onSample` sees
    * every interleaved value (index, value) in stream order. */
  private def walkWav(r: AudioRow)(onSample: (Int, Int) => Unit): AudioFeatures = {
    val b = r.payload
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"doc ${r.doc_id}: $msg")
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, len: Int): String =
      new String(b, off, len, java.nio.charset.StandardCharsets.US_ASCII)
    if (b.length < 44) fail(s"short WAV: ${b.length} bytes")
    if (ascii(0, 4) != "RIFF") fail("bad RIFF magic")
    val riffSize = bb.getInt(4)
    if (riffSize != b.length - 8) fail(s"RIFF size $riffSize != ${b.length - 8}")
    if (ascii(8, 4) != "WAVE") fail("bad WAVE tag")
    var off = 12
    var channels = -1
    var sampleRate = -1
    var bits = -1
    var nSamples = -1
    var sampleSum = 0L
    var sawData = false
    while (off + 8 <= b.length) {
      val tag = ascii(off, 4)
      val size = bb.getInt(off + 4)
      if (size < 0 || off + 8 + size > b.length)
        fail(s"chunk $tag overruns payload at offset $off")
      tag match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too small: $size")
          val fmt = bb.getShort(off + 8)
          if (fmt != 1) fail(s"unsupported audio format $fmt (PCM only)")
          channels = bb.getShort(off + 10)
          sampleRate = bb.getInt(off + 12)
          bits = bb.getShort(off + 22)
          if (bits != 16) fail(s"unsupported bit depth $bits")
          if (channels < 1) fail(s"bad channel count $channels")
        case "data" =>
          if (channels < 0) fail("data chunk before fmt chunk")
          if (size % (channels * 2) != 0)
            fail(s"data size $size not a frame multiple")
          var p = off + 8
          val end = off + 8 + size
          var j = 0
          while (p < end) {
            val v: Int = bb.getShort(p)
            sampleSum += v
            onSample(j, v)
            p += 2; j += 1
          }
          nSamples = size / (channels * 2)
          sawData = true
        case _ => () // RIFF allows unknown chunks; skip
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (!sawData) fail("no data chunk")
    AudioFeatures(r.doc_id, r.mime, b.length.toLong, channels, sampleRate,
      bits, nSamples, sampleSum)
  }

  /** Aspect-preserving fit of (widthCol, heightCol) into a square
    * target box — the standard pre-processing resize. Pure integer
    * letterbox arithmetic, row-local and codegen'd; a real pipeline
    * feeds these dims to the codec's resampler.
    * out_dim = max(1, dim * target div max(w, h)). */
  def fitSquare(df: DataFrame, target: Int): DataFrame =
    df.withColumn("__m", greatest(col("width"), col("height")))
      .withColumn("out_w",
        greatest(lit(1), expr(s"CAST((width * $target) DIV __m AS INT)")))
      .withColumn("out_h",
        greatest(lit(1), expr(s"CAST((height * $target) DIV __m AS INT)")))
      .drop("__m")

  /** Uniform frame sampling: up to k frames at indices
    * i*(n_frames-1) div (k-1) (all frames when n_frames ≤ k; frame 0
    * when k = 1). The stride arithmetic is what a video pipeline hands
    * the demuxer; indices are strictly increasing, so no dedup needed.
    * Rows with n_frames ≤ 0 (a corrupt/empty asset) produce no frames
    * — the `when` guard matters because `sequence(0, -1)` would
    * otherwise count DOWNWARD and emit two garbage indices. Row-local
    * explode — frames multiply rows, payloads stay behind. */
  def sampleFrames(df: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"sampleFrames needs k >= 1, got $k")
    val stride = math.max(k - 1, 1) // k=1: i is only ever 0 → frame 0
    df.withColumn("__i",
        explode(when(col("n_frames") >= 1,
            sequence(lit(0), least(col("n_frames"), lit(k)) - 1))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame_idx",
        when(col("n_frames") <= k, col("__i"))
          .otherwise(expr(s"CAST((__i * (n_frames - 1)) DIV $stride AS INT)")))
      .drop("__i")
  }
}
