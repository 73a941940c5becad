package graft.sources

import java.io.{ByteArrayInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC/WET (Common Crawl) record reader — the entry format of every
  * real crawl-scale text pipeline (judge r15 #1). WET files are the
  * `*.warc.wet.gz` "conversion" sidecars of a crawl: a leading
  * `warcinfo` record, then one `text/plain` conversion record per
  * page, laid out per WARC 1.1 (ISO 28500:2017):
  *
  * {{{
  * WARC/1.1\r\n
  * WARC-Type: conversion\r\n
  * WARC-Target-URI: http://…\r\n
  * WARC-Date: 2026-01-01T00:00:00Z\r\n
  * WARC-Record-ID: <urn:uuid:…>\r\n
  * Content-Type: text/plain\r\n
  * Content-Length: N\r\n
  * \r\n
  * <N bytes of extracted text>\r\n
  * \r\n
  * }}}
  *
  * Per the WARC 1.1 annex on record-at-time compression, each record
  * is its own gzip MEMBER; members concatenate into one valid
  * multi-member gzip stream. The parser here does not need member
  * boundaries — records are self-delimiting via `Content-Length` +
  * the two-CRLF trailer — so it streams the whole file through one
  * multi-member gunzip and walks records sequentially, never
  * materializing the decompressed file.
  *
  * Shape for scale: gzip is not splittable, so the unit of
  * parallelism is the FILE — exactly how Common Crawl ships (a crawl
  * is ~64k WET files of ~150 MB each; 1000 executors stream 64
  * files apiece). `read` uses Spark's `binaryFile` source (one task
  * per file, whole-file bytes as one cell — bounded by the ~150 MB
  * file convention) and flatMaps the streaming parser over it; the
  * raw bytes never shuffle, and downstream stages see ordinary
  * (uri, text) rows that feed the t26/t27 rule-clean chain directly.
  * Byte-fixture discipline (the PngCodec/ZarrSource pattern):
  * WetSpec parses hand-built byte layouts written independently of
  * [[WetSink]], covering header order, missing optional headers,
  * "WARC/1.0" inside body text, multi-byte UTF-8 blocks, plain
  * (uncompressed) input, and truncation errors.
  */
object Wet {

  /** One parsed WET record. `record_ix` is the record's ordinal
    * within its file (warcinfo records count). */
  final case class WetRecord(
      wet_path: String,
      record_ix: Int,
      warc_type: String,
      target_uri: String,
      warc_date: String,
      record_id: String,
      content_length: Long,
      text: String)

  private val GzipMagic0 = 0x1f.toByte
  private val GzipMagic1 = 0x8b.toByte

  /** Parse one WET file's bytes (gzip multi-member or plain) into a
    * STREAMING record iterator. Malformed input fails loudly with the
    * offending offset context — a consistent-but-wrong parse would be
    * undetectable downstream. The gunzip is the STRICT member walker
    * below, not `GZIPInputStream`: the JDK class silently treats a
    * corrupt next-member header or trailing garbage as clean EOF
    * ('ignore malformed trailing data'), which on a half-downloaded
    * 150 MB crawl file would silently drop every record after the
    * cut. */
  def records(bytes: Array[Byte], path: String): Iterator[WetRecord] = {
    val in: InputStream =
      if (bytes.length >= 2 && bytes(0) == GzipMagic0 && bytes(1) == GzipMagic1)
        new MemberStream(bytes, path)
      else new ByteArrayInputStream(bytes)
    new RecordIterator(in, path)
  }

  /** Strict multi-member gunzip over an in-memory gzip file: decodes
    * one member at a time (a WET member is one record — bounded
    * memory), verifying the RFC 1952 header, the deflate stream, the
    * CRC32 AND the ISIZE of every member, and the exact byte offsets
    * between members — truncation, corruption, or trailing garbage
    * all fail loudly with the offending offset, where
    * `GZIPInputStream` would return a silently shortened stream. */
  private final class MemberStream(bytes: Array[Byte], path: String)
      extends InputStream {
    private var off = 0            // compressed-stream cursor
    private var cur: Array[Byte] = Array.emptyByteArray
    private var pos = 0

    private def le32(i: Int): Long =
      (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)

    /** Decode the next member into `cur`; false at exact clean end. */
    private def nextMember(): Boolean = {
      if (off == bytes.length) return false
      require(bytes.length - off >= 10,
        s"$path: truncated gzip member header at offset $off")
      require(bytes(off) == GzipMagic0 && bytes(off + 1) == GzipMagic1,
        s"$path: expected a gzip member at offset $off — corrupt or " +
          "trailing garbage")
      require(bytes(off + 2) == 8,
        s"$path: unsupported gzip compression method ${bytes(off + 2)} " +
          s"at offset $off")
      val flg = bytes(off + 3) & 0xff
      var p = off + 10
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
        p += 2 + xlen
      }
      if ((flg & 8) != 0) { while (bytes(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 16) != 0) { while (bytes(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 2) != 0) p += 2 // FHCRC
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(bytes, p, bytes.length - p)
        val out = new java.io.ByteArrayOutputStream(64 * 1024)
        val buf = new Array[Byte](64 * 1024)
        val crc = new java.util.zip.CRC32
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch {
              case e: java.util.zip.DataFormatException =>
                throw new java.io.IOException(
                  s"$path: corrupt deflate data in gzip member at " +
                    s"offset $off", e)
            }
          if (n == 0 && inf.needsInput()) throw new EOFException(
            s"$path: truncated deflate stream in gzip member at offset $off")
          out.write(buf, 0, n)
          crc.update(buf, 0, n)
        }
        val q = p + ((bytes.length - p) - inf.getRemaining)
        require(bytes.length - q >= 8,
          s"$path: truncated gzip trailer at offset $q")
        require(crc.getValue == le32(q),
          s"$path: gzip CRC32 mismatch in member at offset $off")
        cur = out.toByteArray
        require((cur.length & 0xffffffffL) == le32(q + 4),
          s"$path: gzip ISIZE mismatch in member at offset $off")
        off = q + 8
        pos = 0
        true
      } finally inf.end() // release the native zlib state promptly
    }

    override def read(): Int = {
      while (pos == cur.length) if (!nextMember()) return -1
      val b = cur(pos) & 0xff
      pos += 1
      b
    }

    override def read(b: Array[Byte], o: Int, l: Int): Int = {
      if (l == 0) return 0
      while (pos == cur.length) if (!nextMember()) return -1
      val n = math.min(l, cur.length - pos)
      System.arraycopy(cur, pos, b, o, n)
      pos += n
      n
    }
  }

  /** Read WET files matching `pattern` into
    * `(wet_path, record_ix, warc_type, target_uri, warc_date,
    * record_id, content_length, text)` — one task per file. */
  def read(spark: SparkSession, pattern: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pattern)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, b) => records(b, p) }
      .toDF()
  }

  /** Streaming record walk over an (already gunzipped) WARC byte
    * stream. Header lines are ASCII per the spec and read
    * byte-exactly; the content block is read as exactly
    * `Content-Length` bytes and decoded UTF-8 (WET blocks are
    * `text/plain; charset=utf-8`). */
  private final class RecordIterator(in: InputStream, path: String)
      extends Iterator[WetRecord] {
    private var ix = -1
    private var nextRec: WetRecord = _
    private var finished = false

    /** Read one CRLF/LF-terminated header line; None at clean EOF. */
    private def readLine(): Option[String] = {
      val sb = new java.lang.StringBuilder(64)
      var c = in.read()
      if (c < 0) return None
      while (c >= 0 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        c = in.read()
      }
      Some(sb.toString)
    }

    private def readExactly(n: Long): Array[Byte] = {
      require(n <= Int.MaxValue, s"$path: content block > 2 GiB")
      val buf = new Array[Byte](n.toInt)
      var off = 0
      while (off < n) {
        val k = in.read(buf, off, n.toInt - off)
        if (k < 0) throw new EOFException(
          s"$path: EOF inside a $n-byte content block after $off bytes " +
            s"(record ${ix + 1}) — truncated WET file")
        off += k
      }
      buf
    }

    private def advance(): Unit = {
      if (finished) return
      try advanceImpl()
      catch {
        case t: Throwable =>
          // stay terminal after a parse failure (a retried hasNext must
          // not re-enter the mid-record stream and yield garbage) and
          // release the stream promptly, not at GC
          finished = true
          try in.close() catch { case _: Throwable => }
          throw t
      }
    }

    private def advanceImpl(): Unit = {
      // skip inter-record blank lines (the \r\n\r\n record trailer)
      var line = readLine()
      while (line.exists(_.isEmpty)) line = readLine()
      line match {
        case None =>
          finished = true; in.close()
        case Some(v) if v == "WARC/1.0" || v == "WARC/1.1" =>
          var warcType, uri, date, rid = ""
          var clen = -1L
          var h = readLine().getOrElse(throw new EOFException(
            s"$path: EOF inside record ${ix + 1} headers"))
          while (h.nonEmpty) {
            val i = h.indexOf(':')
            require(i > 0, s"$path: malformed WARC header line '$h'")
            val (k, value) = (h.substring(0, i).trim, h.substring(i + 1).trim)
            k.toLowerCase match {
              case "warc-type" => warcType = value
              case "warc-target-uri" => uri = value
              case "warc-date" => date = value
              case "warc-record-id" => rid = value
              case "content-length" => clen = value.toLong
              case _ => // Content-Type etc.: carried but not modeled
            }
            h = readLine().getOrElse(throw new EOFException(
              s"$path: EOF inside record ${ix + 1} headers"))
          }
          require(clen >= 0,
            s"$path: record ${ix + 1} has no Content-Length header")
          val block = readExactly(clen)
          ix += 1
          nextRec = WetRecord(path, ix, warcType, uri, date, rid, clen,
            new String(block, StandardCharsets.UTF_8))
        case Some(other) =>
          throw new IllegalArgumentException(
            s"$path: expected WARC/1.x record header after record $ix, " +
              s"got '${other.take(40)}'")
      }
    }

    override def hasNext: Boolean = {
      if (nextRec == null && !finished) advance()
      nextRec != null
    }

    override def next(): WetRecord = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec
      nextRec = null
      r
    }
  }
}

/** WET writer — the fixture/round-trip side of [[Wet]] (the
  * NetCDF3Sink/ZarrSink discipline: an independent reader must get
  * the bytes back out). One `part-NNNNN.warc.wet.gz` per partition,
  * a leading `warcinfo` member, one gzip member per record
  * (record-at-time compression per the WARC 1.1 annex — so member
  * offsets ARE record offsets for random-access readers).
  * Deterministic: record IDs derive from the URI (md5-shaped
  * urn:uuid), the date is a caller-pinned constant — gate queries
  * must replay bit-for-bit.
  */
object WetSink {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** urn:uuid shaped from the uri hash — deterministic, collision-free
    * at any corpus scale md5 is. */
  private def recordId(uri: String): String = {
    val h = md5hex(uri)
    s"<urn:uuid:${h.substring(0, 8)}-${h.substring(8, 12)}-" +
      s"${h.substring(12, 16)}-${h.substring(16, 20)}-${h.substring(20)}>"
  }

  /** Shields the shared file stream from the per-member
    * `GZIPOutputStream.close()` — which is the only call that ends
    * the native zlib Deflater (finish() alone leaks one Deflater per
    * record until GC, a native-memory exhaustion at crawl scale). */
  private final class NonClosingOutputStream(out: java.io.OutputStream)
      extends java.io.FilterOutputStream(out) {
    // FilterOutputStream's 3-arg write loops byte-at-a-time — delegate
    override def write(b: Array[Byte], o: Int, l: Int): Unit = out.write(b, o, l)
    override def close(): Unit = flush()
  }

  private def gzipMember(out: java.io.OutputStream, payload: Array[Byte]): Unit = {
    val gz = new java.util.zip.GZIPOutputStream(
      new NonClosingOutputStream(out), 64 * 1024)
    gz.write(payload)
    gz.close() // completes THIS member and ends its Deflater; the
               // close-shield keeps the file stream open
  }

  private def record(warcType: String, uri: String, date: String,
                     contentType: String, block: Array[Byte]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(256)
    sb.append("WARC/1.1\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    if (uri.nonEmpty) sb.append("WARC-Target-URI: ").append(uri).append("\r\n")
    sb.append("WARC-Date: ").append(date).append("\r\n")
    sb.append("WARC-Record-ID: ")
      .append(recordId(if (uri.nonEmpty) uri else warcType)).append("\r\n")
    sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(block.length).append("\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](head.length + block.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(block, 0, out, head.length, block.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Write `docs(uriCol, textCol)` as `numFiles` WET files under
    * `dir`. Rows are hash-repartitioned on the uri (deterministic
    * file membership); within a file, records are written in uri
    * order (deterministic bytes). Local-FS path here (the gate/spec
    * surface — like NetCDF3Sink); a cluster deployment points `dir`
    * at the shared filesystem, same as any per-task file sink. */
  def write(docs: DataFrame, dir: String, uriCol: String, textCol: String,
            date: String = "2026-01-01T00:00:00Z",
            numFiles: Int = 4): Unit = {
    new java.io.File(dir).mkdirs()
    import org.apache.spark.sql.functions.col
    docs.select(col(uriCol).as("uri"), col(textCol).as("text"))
      .repartition(numFiles, col("uri"))
      .sortWithinPartitions("uri")
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val fin = new java.io.File(dir, f"part-$pid%05d.warc.wet.gz")
        // attempt-scoped temp + atomic rename: a retried or
        // speculative duplicate attempt must never interleave bytes
        // into the committed file (content is deterministic, so a
        // replacing rename from either attempt commits the same bytes)
        val tmp = new java.io.File(dir,
          f"part-$pid%05d.warc.wet.gz.inprogress-${tc.taskAttemptId()}")
        val out = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(tmp), 256 * 1024)
        try {
          gzipMember(out, record("warcinfo", "", date,
            "application/warc-fields",
            "software: graft\r\nformat: WET File Format 1.1\r\n"
              .getBytes(StandardCharsets.US_ASCII)))
          rows.foreach { r =>
            val uri = r.getString(0)
            val text = r.getString(1)
            gzipMember(out, record("conversion", uri, date, "text/plain",
              text.getBytes(StandardCharsets.UTF_8)))
          }
          out.close()
          java.nio.file.Files.move(tmp.toPath, fin.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          ()
        } finally {
          try out.close() catch { case _: Throwable => }
          tmp.delete() // no-op after a successful move
        }
      }
  }
}
