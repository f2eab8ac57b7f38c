package graft.multimodal

/** Pure-JVM PNG codec (round-11 verdict item 3): 8-bit RGB (color
  * type 2) and RGBA (color type 6), non-interlaced — the subset a
  * training-data pipeline's first image blob actually is. PNG is the
  * one mainstream image format that is LOSSLESSLY decodable with
  * JDK-only parts: DEFLATE via `java.util.zip.Inflater`/`Deflater`,
  * CRC-32 via `java.util.zip.CRC32`, plus the five scanline filters
  * (None/Sub/Up/Average/Paeth — RFC 2083 §6) implemented here. That
  * makes a decode oracle-checkable exactly like the BMP/WAV/PPM paths
  * in [[Codec]]: pixel values follow an integer generating formula,
  * so an independent engine recomputes the expected statistics
  * without parsing the container. (JPEG stays out by design — IDCT
  * rounding is not bit-pinnable across engines.)
  *
  * The encoder cycles the filter type per scanline (row % 5), so a
  * single encoded fixture drives ALL FIVE unfilter paths in the
  * decoder — a decoder bug in any one filter shifts the decoded
  * bytes and the position-weighted checksum catches it.
  *
  * Poisoned blobs fail LOUDLY: signature, IHDR layout, bit depth,
  * color type, interlace flag, filter-type bytes, chunk CRCs, and
  * decompressed length are all validated with `require`/IOException —
  * a 100-TB run wants one task to fail, not statistics to skew.
  */
object Png {

  private val SIGNATURE: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def chunk(out: java.io.ByteArrayOutputStream, tag: String,
                    data: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len, 0, 4)
    val tagB = tag.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tagB)
    crc.update(data)
    out.write(tagB, 0, 4)
    out.write(data, 0, data.length)
    out.write(java.nio.ByteBuffer.allocate(4)
      .putInt(crc.getValue.toInt).array(), 0, 4)
  }

  /** Paeth predictor (RFC 2083 §6.6) — shared by encode and decode. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode 8-bit interleaved pixels (RGB when channels = 3, RGBA
    * when 4; row-major top-down) as a non-interlaced PNG. Each
    * scanline uses filter type (row % 5), exercising every filter. */
  def encode(w: Int, h: Int, channels: Int,
             pixels: Array[Byte]): Array[Byte] = {
    require(channels == 3 || channels == 4, s"channels $channels")
    require(pixels.length == w * h * channels,
      s"need ${w * h * channels} bytes, got ${pixels.length}")
    val colorType = if (channels == 3) 2 else 6
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val stride = w * channels
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val ft = y % 5
      raw(y * (1 + stride)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = pixels(y * stride + x) & 0xff
        val left = if (x >= channels) pixels(y * stride + x - channels) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= channels)
          pixels((y - 1) * stride + x - channels) & 0xff else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case _ => cur - paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw)
    deflater.finish()
    val zipped = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      zipped.write(buf, 0, n)
    }
    deflater.end()
    val out = new java.io.ByteArrayOutputStream(zipped.size() + 64)
    out.write(SIGNATURE, 0, SIGNATURE.length)
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zipped.toByteArray)
    chunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  /** Decode a non-interlaced 8-bit RGB/RGBA PNG to (width, height,
    * channels, interleaved pixels top-down). Walks the chunk list
    * (ancillary chunks like tEXt/pHYs between IDAT-less positions are
    * skipped), validates every chunk's CRC, concatenates multi-IDAT
    * streams, inflates, and inverts the five scanline filters. */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(bytes.length > 8 &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, 0, 8), SIGNATURE),
      "not a PNG")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    var off = 8
    var w = -1; var h = -1; var channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (off + 12 <= bytes.length && !sawEnd) {
      val len = buf.getInt(off)
      require(len >= 0 && off + 12 + len <= bytes.length,
        s"truncated chunk at $off")
      val tag = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, off + 4, 4 + len)
      val stored = buf.getInt(off + 8 + len).toLong & 0xffffffffL
      require(crc.getValue == stored, s"CRC mismatch in $tag chunk")
      tag match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          w = buf.getInt(off + 8)
          h = buf.getInt(off + 12)
          require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
          require(bytes(off + 16) == 8, "only bit depth 8 supported")
          channels = bytes(off + 17) match {
            case 2 => 3
            case 6 => 4
            case ct => throw new IllegalArgumentException(
              s"only color types 2 (RGB) / 6 (RGBA) supported, got $ct")
          }
          require(bytes(off + 18) == 0, "unsupported compression method")
          require(bytes(off + 19) == 0, "unsupported filter method")
          require(bytes(off + 20) == 0, "interlaced PNG unsupported")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunk — skip (CRC already verified)
      }
      off += 12 + len
    }
    require(w > 0 && sawEnd && idat.size() > 0, "missing IHDR/IDAT/IEND")
    val stride = w * channels
    val raw = new Array[Byte](h * (1 + stride))
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, got, raw.length - got)
      require(n > 0 || inflater.finished() || !inflater.needsInput(),
        "truncated IDAT stream")
      if (n == 0 && inflater.needsInput()) {
        throw new IllegalArgumentException("truncated IDAT stream")
      }
      got += n
    }
    inflater.end()
    require(got == raw.length,
      s"decompressed ${got} bytes, expected ${raw.length}")
    val pixels = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      require(ft <= 4, s"bad filter type $ft on row $y")
      var x = 0
      while (x < stride) {
        val f = raw(y * (1 + stride) + 1 + x) & 0xff
        val left = if (x >= channels) pixels(y * stride + x - channels) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= channels)
          pixels((y - 1) * stride + x - channels) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case _ => f + paeth(left, up, ul)
        }
        pixels(y * stride + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, channels, pixels)
  }
}
