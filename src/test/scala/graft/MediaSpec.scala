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

  // ---- pure-JVM codecs (Codec.scala) ------------------------------

  test("decodeBmp golden bytes: hand-written 2x2 BMP, independent of encoder") {
    // Built by hand from the public BITMAPINFOHEADER spec — NOT via
    // encodeBmp — so an encode/decode bug pair can't cancel out.
    // 2x2 gray pixels top-down: 10,20 / 30,40. Stored bottom-up,
    // BGR, rows padded to 4 bytes (6 data + 2 pad).
    val b = java.nio.ByteBuffer.allocate(70)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(70).putShort(0).putShort(0)
      .putInt(54)
    b.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(16).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom row first: pixels 30,40 then pad
    Seq(30, 30, 30, 40, 40, 40, 0, 0, 10, 10, 10, 20, 20, 20, 0, 0)
      .foreach(v => b.put(v.toByte))
    val (w, h, gray) = graft.multimodal.Codec.decodeBmp(b.array())
    assert((w, h) == (2, 2))
    assert(gray.map(_ & 0xff).toSeq == Seq(10, 20, 30, 40)) // top-down
  }

  test("BMP encode/decode round-trips odd widths (row padding)") {
    for (w <- Seq(1, 2, 3, 5); h <- Seq(1, 3)) {
      val gray = Array.tabulate(w * h)(i => ((i * 37 + 5) % 256).toByte)
      val (w2, h2, out) = graft.multimodal.Codec.decodeBmp(
        graft.multimodal.Codec.encodeBmp(w, h, gray))
      assert((w2, h2) == (w, h) && out.sameElements(gray), s"w=$w h=$h")
    }
  }

  test("WAV encode/decode round-trips PCM16 incl. negatives; skips extra chunks") {
    val samples = Array.tabulate(300)(i => ((i * 173) % 4096 - 2048).toShort)
    val enc = graft.multimodal.Codec.encodeWav(16000, samples)
    val (rate, dec) = graft.multimodal.Codec.decodeWav(enc)
    assert(rate == 16000 && dec.sameElements(samples))
    // splice a LIST chunk between fmt and data: chunk walker must skip it
    val listChunk = "LIST".getBytes ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val spliced = enc.slice(0, 36) ++ listChunk ++ enc.drop(36)
    // fix RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val (rate2, dec2) = graft.multimodal.Codec.decodeWav(spliced)
    assert(rate2 == 16000 && dec2.sameElements(samples))
  }

  test("PPM encode/decode round-trips; header comments tolerated") {
    val gray = Array.tabulate(12)(i => (i * 20).toByte)
    val enc = graft.multimodal.Codec.encodePpm(4, 3, gray)
    val (w, h, dec) = graft.multimodal.Codec.decodePpm(enc)
    assert((w, h) == (4, 3) && dec.sameElements(gray))
    val withComment = ("P6\n# a netpbm comment\n4 3\n255\n").getBytes("US-ASCII") ++
      enc.drop("P6\n4 3\n255\n".length)
    val (w2, h2, dec2) = graft.multimodal.Codec.decodePpm(withComment)
    assert((w2, h2) == (4, 3) && dec2.sameElements(gray))
  }

  test("stats checksum is order-sensitive (catches row-order decode bugs)") {
    val xs = Array(1, 2, 3, 4, 5)
    val fwd = graft.multimodal.Codec.stats(xs.iterator)
    val rev = graft.multimodal.Codec.stats(xs.reverse.iterator)
    assert(fwd._1 == rev._1 && fwd._2 == rev._2) // same n, sum
    assert(fwd._5 != rev._5)                     // different checksum
    // negative values normalize into [0, 1000003)
    val neg = graft.multimodal.Codec.stats(Array(-2048, -1).iterator)
    assert(neg._5 >= 0 && neg._5 < 1000003)
  }

  test("codec parsers reject unsupported variants loudly") {
    intercept[IllegalArgumentException] {
      graft.multimodal.Codec.decodeBmp("notabmp".getBytes ++ new Array[Byte](64))
    }
    intercept[IllegalArgumentException] {
      graft.multimodal.Codec.decodeWav(new Array[Byte](64))
    }
    intercept[IllegalArgumentException] {
      graft.multimodal.Codec.decodePpm("P5 1 1 255 x".getBytes)
    }
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

  test("decodePpmSeq walks concatenated frames by parsed headers") {
    val f1 = Array.tabulate(6)(i => (i * 10).toByte)   // 3x2
    val f2 = Array.tabulate(4)(i => (100 + i).toByte)  // 2x2
    val blob = graft.multimodal.Codec.encodePpm(3, 2, f1) ++
      graft.multimodal.Codec.encodePpm(2, 2, f2)
    val frames = graft.multimodal.Codec.decodePpmSeq(blob)
    assert(frames.size == 2)
    assert(frames(0)._1 == 3 && frames(0)._2 == 2 &&
      frames(0)._3.sameElements(f1))
    assert(frames(1)._1 == 2 && frames(1)._2 == 2 &&
      frames(1)._3.sameElements(f2))
    // trailing garbage that isn't a P6 header fails loudly, not silently
    intercept[IllegalArgumentException] {
      graft.multimodal.Codec.decodePpmSeq(blob ++ "xxx".getBytes)
    }
  }

  test("Dhash.bands: brightness-invariant, content-sensitive, 4x16-bit") {
    // one 8x8 image and its +5-brightness twin -> identical band
    // values; a content change flips at least one band.
    def pxRows(id: Long, f: Int => Int) =
      (0 until 64).map(i => (id, i % 8, i / 8, 8, 8, f(i)))
    val px = (pxRows(1L, i => (i * 37) % 200) ++
      pxRows(2L, i => (i * 37) % 200 + 5) ++
      pxRows(3L, i => (i * 53 + 11) % 200))
      .toDF("id", "x", "y", "w", "h", "v")
    val hs = graft.multimodal.Dhash.bands(px, Seq("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(hs.size == 12) // 3 images x 4 bands
    hs.values.foreach(v => assert(v >= 0 && v < (1L << 16)))
    (0L until 4L).foreach(b => assert(hs((1L, b)) == hs((2L, b))))
    assert((0L until 4L).exists(b => hs((1L, b)) != hs((3L, b))))
  }

  // ---- PNG codec (Png.scala, round-12) -----------------------------

  test("PNG encode/decode round-trips RGB and RGBA across all filters") {
    import graft.multimodal.Png
    // h >= 6 so the row % 5 filter cycle exercises every filter type,
    // including a wrapped repeat of filter 0.
    for (ch <- Seq(3, 4)) {
      val (w, h) = (11, 7) // odd width: sub/average/paeth cross pixels
      val px = Array.tabulate(w * h * ch)(i =>
        ((i.toLong * 9973 + 17) % 256).toByte)
      val (dw, dh, dch, dpx) = Png.decode(Png.encode(w, h, ch, px))
      assert((dw, dh, dch) == (w, h, ch))
      assert(java.util.Arrays.equals(dpx, px), s"pixels differ at ch=$ch")
    }
  }

  test("PNG decode matches the q349 generating formula (oracle twin)") {
    import graft.queries.MediaQueries
    for (id <- Seq(0L, 1L, 7L, 42L)) {
      val (w, h, ch, px) = graft.multimodal.Png.decode(
        MediaQueries.pngBlobFor(id))
      assert(w == 8 + id % 9 && h == 8 + id % 7 && ch == 3 + id % 2)
      px.zipWithIndex.foreach { case (b: Byte, i: Int) =>
        assert((b & 0xff) == ((id * 6007 + i.toLong * 9973) % 256),
          s"pixel $i of blob $id")
      }
    }
  }

  test("q351 spectral census recovers every planted tone (dominant bin = k0)") {
    // End-to-end through the real WAV round-trip: every clip carries a
    // pure tone at bin k0 = 1 + id mod 8 plus small deterministic
    // noise, so the quantized DFT must (a) mark k0 dominant in EVERY
    // frame and (b) put overwhelmingly more energy there than in any
    // other bin — the census demonstrably recovers the planted
    // frequency, not just a checksum.
    val out = graft.queries.MediaQueries.q351
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ids = out.keySet.map(_._1)
    assert(ids.nonEmpty)
    for (id <- ids) {
      val k0 = 1 + id % 8
      val nf = (256 + (id % 4) * 64) / 64
      for (k <- 1L to 8L) {
        val (nFrames, _, nDom) = out((id, k))
        assert(nFrames == nf, s"clip $id bin $k frame count")
        assert(nDom == (if (k == k0) nf else 0L), s"clip $id bin $k dom")
      }
      val pk0 = out((id, k0))._2
      for (k <- 1L to 8L if k != k0)
        assert(pk0 > 20L * out((id, k))._2, s"clip $id margin at bin $k")
    }
  }

  test("q355 Haar ladder: exact energy conservation between adjacent levels") {
    // Parseval for the unnormalized lifting step: E_a(l) + E_d(l) =
    // 2 * E_a(l-1), with E_a(0) = raw input energy — checked from the
    // OUTPUT rows alone (levels 2..6 against level l-1) plus the
    // level-1 anchor recomputed from the generating sample formula.
    val out = graft.queries.MediaQueries.q355
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ids = out.keySet.map(_._1)
    assert(ids.nonEmpty)
    for (id <- ids) {
      val nf = (256 + id % 101) / 64
      var e0 = 0L // raw energy over the framed samples
      for (i <- 0 until (nf * 64).toInt) {
        val s = (id * 31 + i.toLong * 17) % 4096 - 2048
        e0 += s * s
      }
      for (l <- 1L to 6L) {
        val (nc, ea, ed) = out((id, l))
        assert(nc == nf * (64 >> l.toInt), s"clip $id level $l coeffs")
        val prev = if (l == 1) e0 else out((id, l - 1))._2
        assert(ea + ed == 2 * prev, s"clip $id level $l conservation")
      }
    }
  }

  test("q356/q357 image ops match the formula twins (third implementation)") {
    // Engine decodes real BMP bytes; DuckDB replays the pixel
    // formula; this recomputes both resamples and the Sobel census
    // in plain Scala FROM THE FORMULA — a third path that catches a
    // shared coordinate-convention blind spot.
    def p(id: Long, w: Int)(x: Int, y: Int): Long =
      (id * 7919 + (y.toLong * w + x) * 104729) % 256
    val rz = graft.queries.MediaQueries.q356
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r).toMap
    val sb = graft.queries.MediaQueries.q357
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rz.keySet == sb.keySet && rz.nonEmpty)
    for (id <- rz.keySet) {
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val px = p(id, w) _
      // nearest-neighbor 16x16
      val nn = for (y <- 0 until 16; x <- 0 until 16)
        yield px(x * w / 16, y * h / 16)
      val nnCk = nn.zipWithIndex.map { case (v, i) => (i + 1) * v }
        .sum % 1000003
      val r = rz(id)
      assert(r.getLong(1) == w && r.getLong(2) == h, s"dims $id")
      assert(r.getLong(3) == nn.sum && r.getLong(4) == nn.min &&
        r.getLong(5) == nn.max && r.getLong(6) == nnCk, s"nn $id")
      // 2x box
      val bw = w / 2; val bh = h / 2
      val box = for (y <- 0 until bh; x <- 0 until bw)
        yield (px(2 * x, 2 * y) + px(2 * x + 1, 2 * y) +
          px(2 * x, 2 * y + 1) + px(2 * x + 1, 2 * y + 1)) / 4
      val boxCk = box.zipWithIndex.map { case (v, i) => (i + 1) * v }
        .sum % 1000003
      assert(r.getLong(7) == bw && r.getLong(8) == bh &&
        r.getLong(9) == box.sum && r.getLong(10) == box.min &&
        r.getLong(11) == box.max && r.getLong(12) == boxCk, s"box $id")
      // sobel census
      var n = 0L; var sm = 0L; var mx = 0L; var ne = 0L; var ck = 0L
      for (y <- 1 until h - 1; x <- 1 until w - 1) {
        val gx = px(x + 1, y - 1) + 2 * px(x + 1, y) + px(x + 1, y + 1) -
          px(x - 1, y - 1) - 2 * px(x - 1, y) - px(x - 1, y + 1)
        val gy = px(x - 1, y + 1) + 2 * px(x, y + 1) + px(x + 1, y + 1) -
          px(x - 1, y - 1) - 2 * px(x, y - 1) - px(x + 1, y - 1)
        val mag = math.abs(gx) + math.abs(gy)
        n += 1; sm += mag; mx = math.max(mx, mag)
        if (mag >= 300) ne += 1
        ck = (ck + n * mag) % 1000003
      }
      val s0 = sb(id)
      assert(s0.getLong(1) == n && s0.getLong(2) == sm &&
        s0.getLong(3) == mx && s0.getLong(4) == ne &&
        s0.getLong(5) == ck, s"sobel $id")
    }
  }

  test("poisoned PNG blobs fail loudly, not silently") {
    import graft.multimodal.Png
    val good = Png.encode(4, 4, 3, Array.tabulate(48)(_.toByte))
    // bad signature
    intercept[IllegalArgumentException] {
      Png.decode("notapng!".getBytes ++ good.drop(8))
    }
    // flipped payload byte -> CRC mismatch (decoder checks every chunk)
    val flipped = good.clone()
    flipped(good.length / 2) = (flipped(good.length / 2) ^ 0x5a).toByte
    intercept[IllegalArgumentException] { Png.decode(flipped) }
    // truncated file -> truncated chunk / missing IEND
    intercept[IllegalArgumentException] {
      Png.decode(good.take(good.length - 16))
    }
    // unsupported color type (grayscale, ct=0) with repaired CRCs
    val gray = good.clone()
    gray(8 + 4 + 4 + 9) = 0.toByte // IHDR color type byte
    val crc = new java.util.zip.CRC32()
    crc.update(gray, 12, 17) // tag + 13 data bytes
    java.nio.ByteBuffer.wrap(gray).putInt(29, crc.getValue.toInt)
    intercept[IllegalArgumentException] { Png.decode(gray) }
  }
}
