package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal WAV (RIFF/WAVE, PCM 16-bit little-endian) codec with only
  * JVM built-ins — the audio analogue of [[PngCodec]]. Format per the
  * public RIFF/WAVE spec: `RIFF <size> WAVE`, an `fmt ` chunk
  * (audioFormat=1 PCM, 16 bits/sample), a `data` chunk of interleaved
  * LE samples; unknown chunks (LIST, fact, …) are skipped by their
  * declared size, with word alignment, as the spec requires.
  *
  * Mirrors the reference's treatment of media payloads as opaque
  * binary columns (xyzpy stores arbitrary result arrays;
  * manage.py:32-99 round-trips them through engine files) — here the
  * bytes are a real public container so decode is a genuine parse.
  */
object WavCodec {

  /** Encode mono/interleaved PCM-16 samples into a WAV byte array. */
  def encode(samples: Array[Short], sampleRate: Int,
             channels: Int = 1): Array[Byte] = {
    require(channels >= 1, s"channels must be >= 1, got $channels")
    require(samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of channels $channels")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataLen)                    // riff payload size
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                              // PCM fmt chunk size
    buf.putShort(1)                             // audioFormat = PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2)       // byte rate
    buf.putShort((channels * 2).toShort)        // block align
    buf.putShort(16)                            // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Decoded WAV: rate, channel count, interleaved samples. */
  final case class Wav(sampleRate: Int, channels: Int,
                       samples: Array[Short]) {
    def nFrames: Int = samples.length / channels
    def durationMs: Long = nFrames.toLong * 1000L / sampleRate
  }

  /** Parse WAV bytes. Strict on the container (magics, chunk bounds)
    * and on the only encoding this codec claims (PCM 16-bit); skips
    * unrecognized chunks by declared size + pad byte.
    */
  def decode(bytes: Array[Byte]): Wav = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(bytes.length >= 12, s"truncated WAV: ${bytes.length} bytes")
    require(tag() == "RIFF", "not a RIFF container")
    buf.getInt() // declared riff size; trust actual buffer bounds instead
    require(tag() == "WAVE", "RIFF payload is not WAVE")
    var rate = -1; var channels = -1; var bits = -1
    var data: Array[Byte] = null
    while (buf.remaining() >= 8) {
      val id = tag(); val size = buf.getInt()
      require(size >= 0 && size <= buf.remaining(),
        s"chunk '$id' declares $size bytes but ${buf.remaining()} remain")
      id match {
        case "fmt " =>
          val fmtStart = buf.position()
          val audioFormat = buf.getShort()
          require(audioFormat == 1,
            s"unsupported audioFormat $audioFormat (only PCM=1)")
          channels = buf.getShort()
          rate = buf.getInt()
          buf.getInt(); buf.getShort()          // byte rate, block align
          bits = buf.getShort()
          require(bits == 16, s"unsupported bits/sample $bits (only 16)")
          buf.position(fmtStart + size)         // fmt may carry extensions
        case "data" =>
          data = new Array[Byte](size); buf.get(data)
        case _ =>
          buf.position(buf.position() + size)   // skip unknown chunk
      }
      if (size % 2 == 1 && buf.remaining() > 0)
        buf.position(buf.position() + 1)        // RIFF word alignment pad
    }
    require(rate > 0 && channels > 0, "missing fmt chunk")
    require(data != null, "missing data chunk")
    val sb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val samples = new Array[Short](data.length / 2)
    var i = 0
    while (i < samples.length) { samples(i) = sb.getShort(); i += 1 }
    Wav(rate, channels, samples)
  }
}
