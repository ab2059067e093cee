package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: media payloads ride as opaque `BINARY`
  * columns with a typed metadata struct, and decode/feature-extraction is
  * a batched per-partition operation so a real codec (image/audio lib)
  * could be dropped in without touching the plan shape.
  *
  * The container has no media codecs, so `decodeStub` is a STUB — a
  * clearly-marked deterministic fake (byte-histogram features). The
  * Spark-side plumbing is real: binary schema, struct metadata, typed
  * Encoders, partition-batched decode, frame sampling, and every
  * SQL-expressible derivation (sizes, hashes, frame offsets) is
  * oracle-checked from `LlmEntry`.
  *
  * Scale notes: payload bytes never shuffle — metadata extraction and
  * decode are narrow maps; frame sampling explodes only (offset, length)
  * index structs, not the bytes themselves, until the final slice.
  */
object MultimodalOps {
  val FrameSize = 64 // bytes per sampled "frame" of a payload

  final case class MediaMeta(format: String, width: Int, height: Int,
                             durationMs: Long)
  final case class MediaItem(docId: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(docId: Long, nBytes: Long,
                                 features: Array[Float])

  /** Synthesize the media table from `documents`: payload = UTF-8 bytes of
    * the text, metadata derived deterministically from doc fields. This is
    * the schema a real ingest would produce (binary + struct), minus the
    * codec.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        col("source").as("format"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") * 25L).as("duration_ms")).as("meta"))

  /** STUB decode — deterministic fake standing in for an image/audio
    * decoder. Real plumbing, fake math: consumes the payload bytes in one
    * partition-local batch pass and emits a fixed-width feature vector
    * (normalized 16-bin byte histogram). A real implementation would swap
    * the body for a codec call with the SAME signature and batch shape
    * (Iterator[MediaItem] → Iterator[MediaFeatures], one batch per
    * partition, no per-row JNI/process setup).
    */
  def decodeStub(items: Iterator[MediaItem]): Iterator[MediaFeatures] =
    items.map { m =>
      val hist = new Array[Float](16)
      var i = 0
      while (i < m.payload.length) { hist((m.payload(i) & 0xff) >> 4) += 1f; i += 1 }
      val n = math.max(1, m.payload.length).toFloat
      var b = 0
      while (b < 16) { hist(b) /= n; b += 1 }
      MediaFeatures(m.docId, m.payload.length.toLong, hist)
    }

  /** Batched decode over the media table: typed Dataset → mapPartitions,
    * preserving partitioning (no shuffle).
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id").as("docId"), col("payload"),
        col("meta.format").as("format"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.duration_ms").as("durationMs"))
      .as[(Long, Array[Byte], String, Int, Int, Long)]
      .mapPartitions(_.map { case (id, p, f, w, h, d) =>
        MediaItem(id, p, MediaMeta(f, w, h, d))
      }).mapPartitions(decodeStub)
  }

  /** Resize STUB — deterministic byte downsample (every factor-th byte),
    * standing in for an image resize the way [[decodeStub]] stands in for
    * a decoder. HOF-only, so it runs inside the scan projection; a real
    * resize would swap into the [[decodeStub]] batch path instead.
    */
  def resizeSpark(text: String, factor: Int): String =
    s"array_join(transform(sequence(0, CAST(floor((length($text) - 1) / $factor) AS INT)), " +
      s"i -> substr($text, i * $factor + 1, 1)), '')"
  def resizeDuck(text: String, factor: Int): String =
    s"array_to_string(list_transform(range(0, CAST(floor((length($text) - 1) / $factor) AS INT) + 1), " +
      s"i -> substr($text, i * $factor + 1, 1)), '')"

  /** Frame sampling: every payload is cut into ceil(n/FrameSize) frames;
    * emitted as an array of (frame_id, off, len) structs that is exploded
    * downstream. Bytes are sliced only after the explode, per frame.
    */
  def frameIndexSpark(payloadLen: String): String = {
    // An empty payload must yield ZERO frames. sequence(0, n-1) with
    // n = 0 infers step -1 and returns [0, -1] (two phantom frames,
    // diverging from DuckDB's empty range(0, 0)) — so build one slot
    // too many from a never-negative bound and slice to the true count.
    val n = s"CAST(ceil($payloadLen / ${FrameSize}.0) AS INT)"
    s"slice(transform(sequence(0, greatest($n - 1, 0)), " +
      s"f -> named_struct('frame_id', CAST(f AS BIGINT), " +
      s"'off', CAST(f * $FrameSize + 1 AS BIGINT), " +
      s"'len', CAST(least($FrameSize, $payloadLen - f * $FrameSize) AS BIGINT))), " +
      s"1, $n)"
  }
  def frameIndexDuck(payloadLen: String): String =
    s"list_transform(range(0, CAST(ceil($payloadLen / ${FrameSize}.0) AS INT)), " +
      s"f -> {frame_id: CAST(f AS BIGINT), " +
      s"off: CAST(f * $FrameSize + 1 AS BIGINT), " +
      s"len: CAST(least($FrameSize, $payloadLen - f * $FrameSize) AS BIGINT)})"
}
