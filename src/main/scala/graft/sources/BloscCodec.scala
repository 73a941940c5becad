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
  * Scope: ALL c-blosc-1 inner codecs — blosclz (pure-JVM decoder
  * below, fastlz-derived public format), lz4/lz4hc, snappy (xerial
  * snappy-java, an independent implementation of the raw snappy
  * block format), zlib, zstd, memcpy — with byte-shuffle AND
  * bit-shuffle (bitshuffle-library layout: per block,
  * `[byte-of-elem][bit][elem/8]` planes over the 8-aligned element
  * prefix, tail verbatim). Every numcodecs `Blosc(...)` configuration
  * is accepted for both Zarr v2 and v3 stores.
  *
  * VALIDATION CAVEAT (honest provenance, see FIXTURES.md): the
  * lz4/snappy/zlib/zstd inner streams and the container layout are
  * validated against implementations we did not write (lz4-java,
  * xerial snappy, java.util.zip, zstd-jni decode fixture bytes an
  * independent stdlib encoder produced). The BLOSCLZ decoder and the
  * BIT-SHUFFLE layout, however, are only checked against in-repo
  * spec-written fixtures plus property fuzz — this container ships no
  * c-blosc/numcodecs to generate a truly independent golden, so a
  * shared misreading of the public spec (e.g. bit-plane order) would
  * pass every test here yet mis-decode a real store. Before trusting
  * a production blosclz- or bitshuffle-framed corpus, verify one real
  * chunk out-of-band (`python -c "import numcodecs, ..."` on any
  * machine with numcodecs, or eyeball a known array) — the decode is
  * deterministic, so one verified chunk validates the path.
  */
object BloscCodec {

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
    if ((flags & 2) != 0) // memcpy chunk: raw, unshuffled payload
      return java.util.Arrays.copyOfRange(chunk, 16, 16 + nbytes)
    val codec = (flags >> 5) & 7
    require(codec >= 0 && codec <= 4, s"unknown blosc inner codec id #$codec")
    val doShuffle = (flags & 1) != 0 && typesize > 1
    val doBitShuffle = (flags & 4) != 0
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
      // blocksize/typesize >= MIN_BUFFERSIZE(128); the shuffle mode
      // does not enter the decision
      val nsplits =
        if (codec <= 1 && !isLeftover && typesize > 1 && typesize <= 16 &&
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
          case 0 =>
            val n = BloscLz.decompress(chunk, pos, cb, block, dstOff, streamLen)
            require(n == streamLen, s"blosclz stream decoded $n of $streamLen B")
          case 1 =>
            val n = lz4.decompress(chunk, pos, cb, block, dstOff)
            require(n == streamLen, s"lz4 stream decoded $n of $streamLen B")
          case 2 =>
            val n = org.xerial.snappy.Snappy.uncompress(
              chunk, pos, cb, block, dstOff)
            require(n == streamLen, s"snappy stream decoded $n of $streamLen B")
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
      } else if (doBitShuffle && neblock >= 8) {
        bitUnshuffle(block, out, outOff, neblock, math.max(typesize, 1))
      } else {
        System.arraycopy(block, 0, out, outOff, neblock)
      }
      j += 1
    }
    out
  }

  /** Invert the per-block bit shuffle (bitshuffle-library layout, the
    * c-blosc `bitunshuffle` wrapper semantics): the 8-aligned element
    * prefix (n8 = nelem − nelem%8 elements) is stored as
    * `[byte-of-element b][bit k][element-octet]` planes — plane
    * (b, k) at offset (b·8+k)·(n8/8), where plane byte i/8 carries
    * bit k of element (i/8·8 + e)'s byte b at bit position e
    * (LSB-first). Bytes past the prefix are stored verbatim.
    */
  private def bitUnshuffle(block: Array[Byte], out: Array[Byte],
                           outOff: Int, neblock: Int, typesize: Int): Unit = {
    val nelem = neblock / typesize
    val n8 = nelem - (nelem % 8)
    val planeBytes = n8 / 8
    var b = 0
    while (b < typesize) {
      var k = 0
      while (k < 8) {
        val planeOff = (b * 8 + k) * planeBytes
        var g = 0
        while (g < planeBytes) {
          val v = block(planeOff + g) & 0xff
          if (v != 0) { // sparse fast path
            var e = 0
            while (e < 8) {
              if (((v >> e) & 1) != 0) {
                val i = g * 8 + e
                out(outOff + i * typesize + b) =
                  (out(outOff + i * typesize + b) | (1 << k)).toByte
              }
              e += 1
            }
          }
          g += 1
        }
        k += 1
      }
      b += 1
    }
    val prefix = n8 * typesize
    if (neblock > prefix)
      System.arraycopy(block, prefix, out, outOff + prefix, neblock - prefix)
  }
}

/** Pure-JVM decoder for the blosclz stream format (c-blosc 1.x
  * `blosclz.c`, a FastLZ-derived LZ77: 3-bit match length + 13-bit
  * short distance tokens, length extension bytes, 16-bit far-distance
  * escape at code=255/ofs=31·256, MAX_DISTANCE 8191). Overlapping
  * matches copy byte-by-byte (forward), which reproduces the RLE
  * case. The first control byte is masked to a literal run, as in the
  * reference decoder.
  */
object BloscLz {

  /** Decompress `inLen` bytes at `in(inOff)` into `out(outOff, outLen)`;
    * returns the number of bytes produced.
    */
  def decompress(in: Array[Byte], inOff: Int, inLen: Int,
                 out: Array[Byte], outOff: Int, outLen: Int): Int = {
    val ipEnd = inOff + inLen
    val opEnd = outOff + outLen
    var ip = inOff
    var op = outOff
    require(inLen > 0, "empty blosclz stream")
    var ctrl = in(ip) & 31; ip += 1
    var done = false
    while (!done) {
      if (ctrl >= 32) {
        var len = (ctrl >> 5) - 1
        val ofs = (ctrl & 31) << 8
        var ref = op - ofs - 1
        if (len == 7 - 1) {
          var code = 0
          do {
            require(ip < ipEnd, "blosclz: truncated length extension")
            code = in(ip) & 0xff; ip += 1; len += code
          } while (code == 255)
        }
        require(ip < ipEnd, "blosclz: truncated offset byte")
        val code = in(ip) & 0xff; ip += 1
        len += 3
        ref -= code
        if (code == 255 && ofs == (31 << 8)) {
          require(ip + 1 < ipEnd, "blosclz: truncated far offset")
          val o16 = ((in(ip) & 0xff) << 8) | (in(ip + 1) & 0xff); ip += 2
          ref = op - o16 - 8191 // MAX_DISTANCE
        }
        require(ref >= outOff && ref < op, s"blosclz: match ref out of range")
        require(op + len <= opEnd, "blosclz: match overruns output")
        var i = 0
        while (i < len) { out(op + i) = out(ref + i); i += 1 }
        op += len
      } else {
        val len = ctrl + 1
        require(ip + len <= ipEnd, "blosclz: literal overruns input")
        require(op + len <= opEnd, "blosclz: literal overruns output")
        System.arraycopy(in, ip, out, op, len)
        ip += len; op += len
      }
      if (ip < ipEnd) { ctrl = in(ip) & 0xff; ip += 1 } else done = true
    }
    op - outOff
  }
}
