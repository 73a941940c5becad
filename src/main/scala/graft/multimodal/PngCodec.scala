package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal REAL PNG codec for 8-bit grayscale images — genuine
  * public-format bytes (signature, IHDR, zlib IDAT, CRC-checked
  * chunks, RFC 2083), not a stand-in: the decoder accepts any
  * conforming 8-bit grayscale PNG with filter-0 scanlines (what our
  * encoder and most tooling emit for synthetic data) and validates
  * every chunk CRC. JVM-only dependencies (`java.util.zip`), so the
  * executor-side codec needs no native image libraries.
  *
  * Scope (documented, enforced with clear errors): bit depth 8, color
  * type 0 (grayscale), no interlace, per-row filter type 0. That is
  * exactly the encoding a training-data pipeline controls end-to-end;
  * RGB/Adam7/other filters belong to a full codec dependency a real
  * deployment would add behind the same [[Multimodal.decodeFeatures]]
  * signature.
  */
object PngCodec {

  private val SIG: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def putInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }

  private def getInt(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) |
      ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)

  private def writeChunk(out: ByteArrayOutputStream, typ: String,
                         data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putInt(len, 0, data.length)
    out.write(len)
    val t = typ.getBytes("US-ASCII")
    out.write(t); out.write(data)
    val crc = new CRC32(); crc.update(t); crc.update(data)
    val c = new Array[Byte](4); putInt(c, 0, crc.getValue.toInt)
    out.write(c)
  }

  /** Encode row-major 8-bit grayscale pixels as a PNG. */
  def encode(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"pixels.length=${pixels.length} != $width x $height")
    val out = new ByteArrayOutputStream()
    out.write(SIG)
    val ihdr = new Array[Byte](13)
    putInt(ihdr, 0, width); putInt(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: grayscale (10..12: compression/filter/interlace 0)
    writeChunk(out, "IHDR", ihdr)
    val raw = new Array[Byte](height * (width + 1)) // filter byte 0 per row
    var y = 0
    while (y < height) {
      System.arraycopy(pixels, y * width, raw, y * (width + 1) + 1, width)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf); bos.write(buf, 0, n)
    }
    deflater.end()
    writeChunk(out, "IDAT", bos.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a conforming 8-bit grayscale PNG → (width, height,
    * row-major pixels). CRC-validates every chunk; skips ancillary
    * chunks; concatenates multiple IDATs per spec. */
  def decode(png: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(png.length > 8 && SIG.indices.forall(i => png(i) == SIG(i)),
      "not a PNG (bad signature)")
    var pos = 8
    var width = -1
    var height = -1
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done && pos + 12 <= png.length) {
      val len = getInt(png, pos)
      require(len >= 0 && pos + 12 + len <= png.length, "truncated chunk")
      val typ = new String(png, pos + 4, 4, "US-ASCII")
      val crc = new CRC32(); crc.update(png, pos + 4, 4 + len)
      require(getInt(png, pos + 8 + len) == crc.getValue.toInt,
        s"CRC mismatch in $typ chunk")
      typ match {
        case "IHDR" =>
          width = getInt(png, pos + 8); height = getInt(png, pos + 12)
          require(png(pos + 16) == 8 && png(pos + 17) == 0,
            "only 8-bit grayscale PNGs supported")
          require(png(pos + 20) == 0, "interlaced PNGs not supported")
        case "IDAT" => idat.write(png, pos + 8, len)
        case "IEND" => done = true
        case _      => () // ancillary (tEXt, pHYs, ...): skip
      }
      pos += 12 + len
    }
    require(done, "missing IEND")
    require(width > 0 && height > 0, "missing IHDR")
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte](height * (width + 1))
    var off = 0
    while (!inf.finished() && off < raw.length)
      off += inf.inflate(raw, off, raw.length - off)
    inf.end()
    require(off == raw.length, s"short IDAT: $off of ${raw.length} bytes")
    val px = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      require(raw(y * (width + 1)) == 0,
        "only filter type 0 scanlines supported")
      System.arraycopy(raw, y * (width + 1) + 1, px, y * width, width)
      y += 1
    }
    (width, height, px)
  }
}
