package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batched partition passes.
  *
  * The Spark-side shape — schema, batching, partitioning, the
  * decode→feature→pool pipeline — is real and tested. The actual media
  * DECODE KERNELS ARE STUBS (this container ships no image/audio codecs):
  * each `decodeXxx` below derives deterministic fake metadata/features
  * from the bytes so pipelines are end-to-end testable and reproducible.
  * Swapping in a real decoder (javacv, a JNI codec, or an external
  * inference service) only replaces the marked kernel functions; every
  * plan stays identical.
  *
  * Scale notes: media rows are large (MBs) — batch size is rows-bounded
  * AND the operators never shuffle raw bytes; features/metadata are
  * extracted in the same narrow stage that scans the binary column, and
  * only the small derived columns flow downstream.
  */
object Multimodal {

  final case class MediaMeta(
      format: String, width: Int, height: Int, n_frames: Int, valid: Boolean)

  final case class AudioMeta(
      codec: String, sample_rate: Int, n_samples: Int, valid: Boolean)

  import graft.util.Hashing.{mix64, fnvBytes => bytesHash}

  // ---- STUB KERNELS (deterministic fakes — see object Scaladoc) ----

  /** STUB image decode: metadata derived from a stable byte hash. A real
    * implementation would parse the container header (PNG/JPEG).
    */
  def decodeImageMeta(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.isEmpty)
      return MediaMeta("empty", 0, 0, 0, valid = false)
    val h = bytesHash(bytes)
    MediaMeta(
      format = if ((h & 1) == 0) "png" else "jpeg",
      width = 64 + (mix64(h) & 0x3ff).toInt,
      height = 64 + (mix64(h + 1) & 0x3ff).toInt,
      n_frames = 1,
      valid = true)
  }

  /** STUB feature extraction: a deterministic `dim`-float vector from the
    * bytes (stands in for a CNN/CLIP-style encoder).
    */
  def extractFeatures(bytes: Array[Byte], dim: Int = 64): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null || bytes.isEmpty) return out
    var h = bytesHash(bytes)
    var i = 0
    while (i < dim) { h = mix64(h); out(i) = (h >>> 40).toInt / 16777216.0f; i += 1 }
    out
  }

  /** STUB frame sampling: `n` deterministic pseudo-frames for video bytes
    * (a real kernel would seek the container at n evenly spaced PTS).
    */
  def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (bytes == null || bytes.isEmpty) return Seq.empty
    (0 until n).map { i =>
      val h = mix64(bytesHash(bytes) + i)
      Array.tabulate[Byte](16)(j => ((h >>> (j % 8 * 8)) & 0xff).toByte)
    }
  }

  /** STUB resize: deterministic re-encode of the bytes at a target size
    * (a real kernel decodes, scales, re-encodes). Output length is
    * proportional to the target area so size-dependent downstream logic
    * is exercisable.
    */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (bytes == null || bytes.isEmpty) return Array.empty
    val n = math.max(16, math.min(4096, (w * h) / 64))
    val out = new Array[Byte](n)
    var acc = bytesHash(bytes) ^ mix64(w.toLong << 32 | h.toLong)
    var i = 0
    while (i < n) { acc = mix64(acc); out(i) = (acc & 0xff).toByte; i += 1 }
    out
  }

  /** STUB audio decode: codec/rate/length metadata from a stable byte
    * hash (a real kernel parses the WAV/FLAC/OGG header).
    */
  def decodeAudioMeta(bytes: Array[Byte]): AudioMeta = {
    if (bytes == null || bytes.isEmpty)
      return AudioMeta("empty", 0, 0, valid = false)
    val h = bytesHash(bytes)
    AudioMeta(
      codec = if ((h & 1) == 0) "wav" else "flac",
      sample_rate = if ((mix64(h) & 1) == 0) 16000 else 44100,
      n_samples = 1024 + (mix64(h + 2) & 0xfff).toInt,
      valid = true)
  }

  /** STUB PCM decode: `n` deterministic pseudo-samples in [-1, 1]
    * (stands in for the codec's sample output).
    */
  def decodeSamples(bytes: Array[Byte], n: Int): Array[Float] = {
    val out = new Array[Float](n)
    if (bytes == null || bytes.isEmpty) return out
    var h = bytesHash(bytes)
    var i = 0
    while (i < n) {
      h = mix64(h)
      out(i) = ((h >>> 40).toInt / 8388608.0f) - 1.0f
      i += 1
    }
    out
  }

  // ---- Spark plumbing (real) ----

  private val metaUdf = udf((b: Array[Byte]) => decodeImageMeta(b))
  private val featUdf = udf((b: Array[Byte]) => extractFeatures(b))
  private val framesUdf =
    udf((b: Array[Byte], n: Int) => sampleFrames(b, n))

  private val resizeUdf =
    udf((b: Array[Byte], w: Int, h: Int) => resizeImage(b, w, h))

  /** Attach decoded metadata + pooled features to a binary column —
    * one narrow pass over the media bytes.
    */
  def describeMedia(df: DataFrame, binCol: String = "media"): DataFrame =
    df.withColumn("meta", metaUdf(col(binCol)))
      .withColumn("features", featUdf(col(binCol)))

  /** Resize the media column to target dims (narrow pass; replaces the
    * binary in place — at scale, write the result partitioned rather
    * than carrying both generations of bytes).
    */
  def resizeMedia(
      df: DataFrame, binCol: String, w: Int, h: Int): DataFrame =
    df.withColumn(binCol, resizeUdf(col(binCol), lit(w), lit(h)))

  /** Batched variant of [[describeMedia]] — the Scala analog of the
    * `mapInPandas` batch shape: the partition iterator is consumed in
    * `batchSize`-row groups, so a vectorized/multi-image decode kernel
    * (GPU batch inference, JNI codec with amortized setup) drops in at
    * the marked call without touching the plan. Row-identical to the
    * per-row variant (spec-checked).
    */
  def describeMediaBatched(
      df: Dataset[(Long, Array[Byte])],
      batchSize: Int = 32
  ): Dataset[(Long, MediaMeta, Array[Float])] = {
    import df.sparkSession.implicits._
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // BATCH KERNEL CALL SITE: one invocation per batch, not per row
        batch.map { case (id, bytes) =>
          (id, decodeImageMeta(bytes), extractFeatures(bytes))
        }
      }
    }
  }

  private val audioWindowsUdf = udf { (b: Array[Byte], win: Int) =>
    // decode once, window in the same stage: only (window_no, rms) pairs
    // leave the scan — the PCM samples never enter the plan
    val meta = decodeAudioMeta(b)
    if (!meta.valid) Seq.empty[(Int, Double)]
    else {
      val samples = decodeSamples(b, meta.n_samples)
      samples.grouped(win).zipWithIndex.map { case (w, i) =>
        var acc = 0.0
        var j = 0
        while (j < w.length) { acc += w(j).toDouble * w(j); j += 1 }
        (i + 1, math.sqrt(acc / w.length))
      }.toSeq
    }
  }

  /** Fixed-window RMS energy over an audio binary column: decode +
    * window + pool in one narrow pass, explode only the per-window
    * scalars. The audio twin of [[sampleVideoFrames]] — raw bytes and
    * raw samples never shuffle.
    */
  def audioEnergy(
      df: DataFrame,
      idCol: String,
      binCol: String,
      windowSize: Int = 1024
  ): DataFrame =
    df.select(
        col(idCol).cast("long").as("media_id"),
        explode(audioWindowsUdf(col(binCol), lit(windowSize))).as("w"))
      .select(
        col("media_id"),
        col("w._1").as("window_no"),
        col("w._2").as("rms"))

  /** Explode a video binary into sampled frames with per-frame features:
    * (id, frame_number, frame_features). Frame bytes never leave the
    * stage — only features survive the explode.
    */
  def sampleVideoFrames(
      df: DataFrame,
      idCol: String,
      binCol: String,
      framesPerVideo: Int
  ): DataFrame =
    df.select(
        col(idCol).cast("long").as("media_id"),
        posexplode(framesUdf(col(binCol), lit(framesPerVideo)))
          .as(Seq("frame_number", "frame_bytes")))
      .select(
        col("media_id"),
        (col("frame_number") + 1).as("frame_number"),
        featUdf(col("frame_bytes")).as("frame_features"))
}
