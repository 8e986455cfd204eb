package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: media carried as opaque `binary` payloads with
  * typed metadata, decoded in batched per-partition passes.
  *
  * In a production pipeline the decode stage is vectorized Python
  * (`mapInPandas` + Pillow/ffmpeg) or a JNI codec; this environment
  * ships no codecs, so [[decodeFeatures]] is a clearly-marked
  * deterministic STUB — but the Spark-side plumbing is the real
  * pattern: a typed Dataset boundary, `mapPartitions` batching (the
  * JVM twin of mapInPandas' batch iterator), row-local compute, no
  * shuffle, schema declared up front.
  *
  * Scale: decode is embarrassingly parallel; partition count (not row
  * count) bounds codec parallelism. Payload bytes never shuffle — the
  * features projection drops them before any wide operator.
  */
object Multimodal {
  /** A media row: id + opaque payload + declared mime. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)

  /** Typed decode output; real decoders would fill genuine
    * width/height/frames. */
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long, content_md5: String,
      width: Int, height: Int, channels: Int, n_frames: Int)

  /** Columnar pack: text documents → utf-8 binary payloads (stands in
    * for image/audio bytes; the engine treats payloads as opaque). */
  def packText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("text/plain").as("mime"))

  /** Batched decode boundary. STUB: features are a deterministic
    * function of the payload bytes (size-derived dims + md5) so tests
    * and the DuckDB oracle can verify the plumbing end-to-end; a real
    * deployment replaces only the body of `fakeDecode`. */
  def decodeFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { batch =>
      // per-partition setup (a real decoder opens codecs once here)
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { r => fakeDecode(md, r) }
    }
  }

  /** STUB decode — deterministic fake in place of a codec call. */
  private def fakeDecode(md: java.security.MessageDigest, r: MediaRow): MediaFeatures = {
    val n = r.payload.length
    md.reset()
    val hex = md.digest(r.payload).map("%02x".format(_)).mkString
    MediaFeatures(r.doc_id, r.mime, n.toLong, hex,
      width = 1 + n % 509, height = 1 + n % 251,
      channels = 3, n_frames = 1 + n % 7)
  }

  /** Aspect-preserving fit of (widthCol, heightCol) into a square
    * target box — the standard pre-processing resize. REAL logic (not
    * stub): pure integer letterbox arithmetic, row-local and
    * codegen'd; a real pipeline feeds these dims to the codec's
    * resampler. out_dim = max(1, dim * target div max(w, h)). */
  def fitSquare(df: DataFrame, target: Int): DataFrame =
    df.withColumn("__m", greatest(col("width"), col("height")))
      .withColumn("out_w",
        greatest(lit(1), expr(s"CAST((width * $target) DIV __m AS INT)")))
      .withColumn("out_h",
        greatest(lit(1), expr(s"CAST((height * $target) DIV __m AS INT)")))
      .drop("__m")

  /** Uniform frame sampling: up to k frames at indices
    * i*(n_frames-1) div (k-1) (all frames when n_frames ≤ k; frame 0
    * when k = 1). REAL logic: the stride arithmetic is what a video
    * pipeline hands the demuxer; indices are strictly increasing, so
    * no dedup needed. Rows with n_frames ≤ 0 (a corrupt/empty asset
    * from a real decoder) produce no frames — the `when` guard matters
    * because `sequence(0, -1)` would otherwise count DOWNWARD and emit
    * two garbage indices. Row-local explode — frames multiply rows,
    * payloads stay behind. */
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
