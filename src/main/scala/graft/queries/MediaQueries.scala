package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Media

/** Registry surface for the multimodal pipeline (SURVEY extensions —
  * binary media columns). The testdata ships no real media blobs, so
  * the blobs are DERIVED (document text bytes as the opaque payload,
  * kind assigned round-robin) — which exercises every real piece of
  * the pipeline: binary column handling, typed metadata, repartitioned
  * per-partition decode, frame sampling — with only the codec stub
  * standing in for a real decoder (`Media.decodeStub` note).
  */
object MediaQueries {

  /** q44 — end-to-end media feature extraction: derive (media_id,
    * kind, bytes, metadata) from documents, run the per-partition
    * decode pipeline, emit features + a 4-frame fingerprint for the
    * video-kind rows. Rows-only check (the codec stub isn't
    * SQL-reproducible); determinism within Spark is pinned by the
    * stub + unique-key order. */
  val q44 = QueryDef.noOracle("q44_media_features") { (s, d) =>
    import s.implicits._
    val media = Tables.documents(s, d)
      .filter(col("doc_id") < 200)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("bytes"),
        lit(640).as("width"), lit(480).as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10L).as("duration_ms"))
    val features = Media.extractFeatures(
      media.as[Media.MediaRow], partitions = 32)
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        round(col("mean_byte"), 4).as("mean_byte"),
        round(element_at(col("histogram"), 7), 6).as("hist_bin6"))
    val frames = media.filter(col("kind") === "video")
      .select(col("media_id"),
        Media.frameSample(col("bytes"), 4).as("frame_fps"))
    features.join(frames, Seq("media_id"), "left")
      .withColumn("frame_fp0", element_at(col("frame_fps"), 1))
      .drop("frame_fps")
      .orderBy("media_id")
  }

  val all: Seq[QueryDef] = Seq(q44)
}
