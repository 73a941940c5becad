package graft.sources

/** Decoder for the Blosc-1 chunk container — the DEFAULT compressor
  * numcodecs applies to `to_zarr` exports, so most real-world xarray
  * zarr stores are blosc-framed. Pure-JVM: the container walk
  * (header, block starts, split streams, byte-unshuffle) is
  * implemented here from the public c-blosc 1.x format; the inner
  * codecs ride libraries already on Spark's classpath (lz4-java,
  * java.util.zip, zstd-jni).
  *
  * Format (c-blosc README_HEADER / blosc.c, BLOSC_VERSION_FORMAT 2):
  * 16-byte little-endian header
  *   [0] format version  [1] codec version  [2] flags  [3] typesize
  *   [4:8] nbytes  [8:12] blocksize  [12:16] cbytes
  * flags: bit0 byte-shuffle, bit1 memcpy (raw payload follows), bit2
  * bit-shuffle, bits 5-7 codec id (0 blosclz, 1 lz4/lz4hc, 2 snappy,
  * 3 zlib, 4 zstd). Non-memcpy chunks: int32 bstarts[nblocks]
  * (absolute offsets), then per block its streams, each
  * `[int32 cbytes][payload]` — stored raw when cbytes == stream size.
  * Blocks are independently (shuffled then) compressed; a block is
  * SPLIT into `typesize` per-byte-plane streams only for
  * blosclz/lz4 with typesize ≤ 16 and blocksize/typesize ≥ 128 and
  * never for the leftover block (c-blosc `split_block`, the
  * forward-compat policy numcodecs ships).
  *
  * Scope: lz4/lz4hc, zlib, zstd, memcpy; byte-shuffle. blosclz and
  * snappy streams and bit-shuffle raise with the migration hint
  * (scripts/migrate_xyzpy.py re-encodes with zlib).
  */
object BloscCodec {

  private val migrate = "re-encode with zlib: scripts/migrate_xyzpy.py"

  def decode(chunk: Array[Byte], expectedBytes: Int): Array[Byte] = {
    require(chunk.length >= 16, s"blosc chunk too short (${chunk.length} B)")
    def le32(off: Int): Int =
      (chunk(off) & 0xff) | ((chunk(off + 1) & 0xff) << 8) |
        ((chunk(off + 2) & 0xff) << 16) | ((chunk(off + 3) & 0xff) << 24)
    val flags = chunk(2) & 0xff
    val typesize = chunk(3) & 0xff
    val nbytes = le32(4)
    val blocksize = le32(8)
    val cbytes = le32(12)
    require(nbytes == expectedBytes,
      s"blosc chunk holds $nbytes B, chunk grid expects $expectedBytes B")
    require(cbytes <= chunk.length,
      s"blosc header cbytes $cbytes exceeds payload ${chunk.length}")
    require((flags & 4) == 0, s"blosc bit-shuffle not supported ($migrate)")
    if ((flags & 2) != 0) // memcpy chunk: raw, unshuffled payload
      return java.util.Arrays.copyOfRange(chunk, 16, 16 + nbytes)
    val codec = (flags >> 5) & 7
    require(codec == 1 || codec == 3 || codec == 4, {
      val name = codec match {
        case 0 => "blosclz"; case 2 => "snappy"; case c => s"#$c"
      }
      s"blosc inner codec '$name' not supported ($migrate)"
    })
    val doShuffle = (flags & 1) != 0 && typesize > 1
    val out = new Array[Byte](nbytes)
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val leftover = nbytes % blocksize
    val lz4 = if (codec == 1) net.jpountz.lz4.LZ4Factory.fastestInstance()
      .safeDecompressor() else null
    val block = new Array[Byte](blocksize)
    var j = 0
    while (j < nblocks) {
      val isLeftover = j == nblocks - 1 && leftover > 0
      val neblock = if (isLeftover) leftover else blocksize
      // c-blosc split_block: byte-plane streams for blosclz/lz4 only,
      // full blocks only, typesize <= MAX_SPLITS(16),
      // blocksize/typesize >= MIN_BUFFERSIZE(128)
      val nsplits =
        if (codec == 1 && !isLeftover && typesize > 1 && typesize <= 16 &&
          blocksize / typesize >= 128 && neblock % typesize == 0) typesize
        else 1
      val streamLen = neblock / nsplits
      var pos = le32(16 + 4 * j) // bstart: absolute offset of stream 0
      var s = 0
      while (s < nsplits) {
        val cb = le32(pos); pos += 4
        require(cb >= 0 && pos + cb <= chunk.length,
          s"blosc stream overruns chunk (block $j stream $s cbytes $cb)")
        val dstOff = s * streamLen
        if (cb == streamLen) { // stored raw
          System.arraycopy(chunk, pos, block, dstOff, streamLen)
        } else codec match {
          case 1 =>
            val n = lz4.decompress(chunk, pos, cb, block, dstOff)
            require(n == streamLen, s"lz4 stream decoded $n of $streamLen B")
          case 3 =>
            val inf = new java.util.zip.Inflater()
            inf.setInput(chunk, pos, cb)
            var off = dstOff
            val end = dstOff + streamLen
            while (!inf.finished() && off < end)
              off += inf.inflate(block, off, end - off)
            inf.end()
            require(off == end, s"zlib stream inflated ${off - dstOff} of $streamLen B")
          case 4 =>
            val n = com.github.luben.zstd.Zstd.decompressByteArray(
              block, dstOff, streamLen, chunk, pos, cb)
            require(n == streamLen, s"zstd stream decoded $n of $streamLen B")
        }
        pos += cb
        s += 1
      }
      val outOff = j * blocksize
      if (doShuffle && neblock % typesize == 0) {
        // invert the per-block byte shuffle: plane-major -> row-major
        val n = neblock / typesize
        var b = 0
        while (b < typesize) {
          var i = 0
          while (i < n) { out(outOff + i * typesize + b) = block(b * n + i); i += 1 }
          b += 1
        }
      } else {
        System.arraycopy(block, 0, out, outOff, neblock)
      }
      j += 1
    }
    out
  }
}
