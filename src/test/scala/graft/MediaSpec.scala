package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Media
import graft.multimodal.Media.MediaRow

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    MediaRow(1L, "image", Array.tabulate(256)(_.toByte), 16, 16, 0, 0L),
    MediaRow(2L, "audio", Array.fill(100)(0x10.toByte), 0, 0, 44100, 2000L),
    MediaRow(3L, "video", Array.tabulate(64)(i => (i * 4).toByte), 8, 8, 0,
      1000L))

  test("decodeStub: deterministic byte histogram + mean") {
    val (hist, mean) = Media.decodeStub(Array.tabulate(256)(_.toByte))
    assert(math.abs(hist.sum - 1.0) < 1e-9)
    assert(hist.forall(_ == 1.0 / 16)) // uniform bytes -> uniform bins
    assert(mean == 127.5)
  }

  test("extractFeatures runs per-partition over typed rows") {
    val feats = Media.extractFeatures(rows.toDS(), partitions = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.keySet == Set(1L, 2L, 3L))
    assert(feats(1L).n_bytes == 256)
    assert(feats(2L).histogram(1) == 1.0) // all bytes 0x10 -> bin 1
    assert(feats(2L).mean_byte == 16.0)
  }

  test("mediaStats per-kind accounting") {
    val st = Media.mediaStats(rows.toDF()).collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[Long]("total_bytes"))
      .toMap
    assert(st == Map("image" -> 256L, "audio" -> 100L, "video" -> 64L))
  }

  test("frameSample fingerprints fixed chunk count") {
    val df = rows.toDF().select(col("media_id"),
      Media.frameSample(col("bytes"), 4).as("frames"))
    val got = df.filter(col("media_id") === 1L)
      .select(size(col("frames"))).head().getInt(0)
    assert(got == 4)
    // determinism: same input -> same fingerprints
    val a = df.collect().map(_.getSeq[String](1)).toSeq
    val b = df.collect().map(_.getSeq[String](1)).toSeq
    assert(a == b)
  }

  test("frameSample chunks are contiguous and cover every byte") {
    // 10 bytes, 4 frames: floor boundaries 0,2,5,7,10 -> chunk
    // lengths 2,3,2,3 (the old double-truncation formula skipped
    // interior bytes; this pins the contiguous integer chunking)
    val payload = "abcdefghij".getBytes("US-ASCII")
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(bs: Array[Byte]): String = {
      md.reset()
      md.digest(bs).map("%02x".format(_)).mkString
    }
    val expect = Seq((0, 2), (2, 5), (5, 7), (7, 10)).map {
      case (s, e) => hex(payload.slice(s, e))
    }
    val got = Seq(payload).toDF("bytes")
      .select(Media.frameSample(col("bytes"), 4).as("frames"))
      .head().getSeq[String](0)
    assert(got == expect)
  }
}
