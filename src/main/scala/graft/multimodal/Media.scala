package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition.
  *
  * The Spark-side mechanics are real and tested — schema, partition
  * sizing, batch iteration shape, deterministic feature output. Real
  * pure-JVM codecs (24-bit BMP, PCM16 WAV, binary PPM) live in
  * [[Codec]] and drive the oracle-checked q44 decode path;
  * `decodeStub` below remains as the cheap byte-level feature
  * extractor (oracle-checked via q71) for payloads with no known
  * container format.
  *
  * Scale notes: media blobs are large — the pipeline repartitions by
  * blob id so decode parallelism is independent of upstream file
  * layout, and `mapPartitions` amortizes per-partition codec
  * initialization (the reason NOT to use a per-row UDF for decoding).
  */
object Media {

  /** One media object: opaque bytes + typed metadata. */
  case class MediaRow(
      media_id: Long,
      kind: String,              // image | audio | video
      bytes: Array[Byte],
      width: Int, height: Int,   // images/video
      sample_rate: Int,          // audio
      duration_ms: Long)         // audio/video

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      // STUB output: 16-bin byte histogram where a real decoder would
      // emit embeddings / spectrograms / frame features.
      histogram: Array[Double],
      mean_byte: Double)

  /** STUB — stands in for image decode / audio feature extraction.
    * Deterministic byte histogram so tests can pin exact values. A
    * real deployment replaces this body with the codec call; the
    * signature (bytes per row, iterator per partition) is the real
    * contract. */
  def decodeStub(bytes: Array[Byte]): (Array[Double], Double) = {
    val hist = new Array[Double](16)
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      hist(b >> 4) += 1.0
      sum += b
      i += 1
    }
    val n = math.max(bytes.length, 1)
    (hist.map(_ / n), sum.toDouble / n)
  }

  /** Decode/feature-extract pipeline: repartition by id (decode
    * parallelism decoupled from input layout), then per-partition
    * iteration — codec init happens once per partition, not per row. */
  def extractFeatures(media: Dataset[MediaRow],
                      partitions: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.repartition(partitions, col("media_id"))
      .mapPartitions { rows =>
        // real codecs would initialize here, once per partition
        rows.map { m =>
          val (hist, mean) = decodeStub(m.bytes)
          MediaFeatures(m.media_id, m.kind, m.bytes.length, hist, mean)
        }
      }
  }

  /** Frame sampling for video-like payloads: split the blob into
    * `frames` contiguous chunks and fingerprint each — the real
    * pipeline shape for frame-level features (chunk boundaries stand
    * in for decoded frames). Chunk f covers bytes
    * [floor(f·n/frames), floor((f+1)·n/frames)) — the standard integer
    * chunking, so every byte lands in exactly one chunk (no mid-blob
    * gaps, no tail drop). The double division inside floor is exact:
    * f·n ≤ frames·2^31 stays far under 2^53. Pure Column expression,
    * codegen-friendly. */
  def frameSample(bytesCol: org.apache.spark.sql.Column,
                  frames: Int): org.apache.spark.sql.Column = {
    val n = length(bytesCol).cast("long")
    transform(sequence(lit(0), lit(frames - 1)), f => {
      val start = floor(f.cast("long") * n / frames).cast("int")
      val end = floor((f + 1).cast("long") * n / frames).cast("int")
      md5(substr(bytesCol, start + 1, end - start))
    })
  }

  /** Typed-metadata projection + per-kind accounting — the catalog
    * query a curation pipeline runs before deciding what to decode. */
  def mediaStats(media: DataFrame): DataFrame =
    media.groupBy(col("kind")).agg(
      count(lit(1)).as("n_items"),
      sum(length(col("bytes"))).as("total_bytes"),
      round(avg(length(col("bytes"))), 2).as("avg_bytes"),
      max(col("width")).as("max_width"),
      max(col("duration_ms")).as("max_duration_ms"))
      .orderBy("kind")
}
