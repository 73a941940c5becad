package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import graft.sources.{Wet, WetSink}
import org.apache.spark.sql.functions._

/** [[Wet]] — WARC/WET parsing against HAND-BUILT byte layouts written
  * independently of [[WetSink]] (the PngCodec/ZarrSource fixture
  * discipline: the reader must decode bytes it did not produce),
  * plus the sink round-trip and its determinism contract.
  */
class WetSpec extends SparkSpec {

  /** Build one raw WARC record from explicit header lines (the test's
    * OWN layout — not WetSink's writer). */
  private def rawRecord(headers: Seq[String], block: Array[Byte]): Array[Byte] = {
    val head = (headers :+ s"Content-Length: ${block.length}")
      .mkString("", "\r\n", "\r\n\r\n")
      .getBytes(StandardCharsets.US_ASCII)
    head ++ block ++ "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)
  }

  private def gzMembers(recs: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    recs.foreach { r =>
      val gz = new GZIPOutputStream(out)
      gz.write(r); gz.finish()
    }
    out.toByteArray
  }

  test("hand-built multi-record gzip fixture: headers in any order, extras ignored") {
    val block1 = "extracted page text\nsecond line".getBytes(StandardCharsets.UTF_8)
    val fixture = gzMembers(Seq(
      rawRecord(Seq(
        "WARC/1.0",                        // 1.0 accepted too
        "WARC-Type: warcinfo",
        "WARC-Date: 2020-05-06T07:08:09Z",
        "WARC-Record-ID: <urn:uuid:aaa>",
        "Content-Type: application/warc-fields"),
        "software: handmade\r\n".getBytes(StandardCharsets.US_ASCII)),
      rawRecord(Seq(
        "WARC/1.1",
        "WARC-Record-ID: <urn:uuid:bbb>",  // order ≠ WetSink's
        "WARC-Block-Digest: sha1:ignored", // extra header tolerated
        "WARC-Target-URI: http://x.test/p1",
        "Content-Type: text/plain",
        "WARC-Date: 2021-01-02T03:04:05Z",
        "WARC-Type: conversion"),
        block1)))
    val recs = Wet.records(fixture, "fix1").toSeq
    assert(recs.map(_.warc_type) == Seq("warcinfo", "conversion"))
    assert(recs.map(_.record_ix) == Seq(0, 1))
    val c = recs(1)
    assert(c.target_uri == "http://x.test/p1")
    assert(c.warc_date == "2021-01-02T03:04:05Z")
    assert(c.record_id == "<urn:uuid:bbb>")
    assert(c.content_length == block1.length)
    assert(c.text == "extracted page text\nsecond line")
    assert(recs.head.target_uri == "") // warcinfo has no URI
  }

  test("Content-Length framing: a block containing 'WARC/1.0' does not resync") {
    val tricky = "fake header ahead\r\n\r\nWARC/1.0\r\nWARC-Type: conversion\r\n\r\nbody"
      .getBytes(StandardCharsets.UTF_8)
    val fixture = gzMembers(Seq(
      rawRecord(Seq("WARC/1.1", "WARC-Type: conversion",
        "WARC-Target-URI: http://x.test/a"), tricky),
      rawRecord(Seq("WARC/1.1", "WARC-Type: conversion",
        "WARC-Target-URI: http://x.test/b"), "after".getBytes)))
    val recs = Wet.records(fixture, "fix2").toSeq
    assert(recs.size == 2)
    assert(recs(0).text == new String(tricky, StandardCharsets.UTF_8))
    assert(recs(1).target_uri == "http://x.test/b")
    assert(recs(1).text == "after")
  }

  test("Content-Length counts BYTES: multi-byte UTF-8 block") {
    val s = "héllo 😀 世界"
    val block = s.getBytes(StandardCharsets.UTF_8)
    assert(block.length > s.length) // the point of the test
    val fixture = gzMembers(Seq(rawRecord(
      Seq("WARC/1.1", "WARC-Type: conversion",
        "WARC-Target-URI: http://x.test/u"), block)))
    val r = Wet.records(fixture, "fix3").toSeq.head
    assert(r.content_length == block.length)
    assert(r.text == s)
  }

  test("plain (uncompressed) input and bare-LF line endings accepted") {
    val raw = ("WARC/1.1\nWARC-Type: conversion\n" +
      "WARC-Target-URI: http://x.test/lf\nContent-Length: 4\n\nbody\n\n")
      .getBytes(StandardCharsets.US_ASCII)
    val r = Wet.records(raw, "fix4").toSeq
    assert(r.size == 1 && r.head.text == "body" &&
      r.head.target_uri == "http://x.test/lf")
  }

  test("malformed inputs fail loudly") {
    // truncated content block
    val trunc = {
      val full = gzMembers(Seq(rawRecord(
        Seq("WARC/1.1", "WARC-Type: conversion"),
        ("x" * 500).getBytes)))
      full // gzip of full record, but lie about the length inside:
    }
    val lying = gzMembers(Seq(
      ("WARC/1.1\r\nWARC-Type: conversion\r\nContent-Length: 99\r\n\r\nshort"
        ).getBytes(StandardCharsets.US_ASCII)))
    val e1 = intercept[java.io.EOFException] {
      Wet.records(lying, "fixT").toSeq
    }
    assert(e1.getMessage.contains("fixT") &&
      e1.getMessage.contains("truncated"))
    assert(trunc.nonEmpty)
    // missing Content-Length
    val noLen = gzMembers(Seq(
      "WARC/1.1\r\nWARC-Type: conversion\r\n\r\n".getBytes(StandardCharsets.US_ASCII)))
    val e2 = intercept[IllegalArgumentException] {
      Wet.records(noLen, "fixN").toSeq
    }
    assert(e2.getMessage.contains("Content-Length"))
    // garbage where a record header should be
    val garbage = gzMembers(Seq("HTTP/1.1 200 OK\r\n\r\n".getBytes))
    val e3 = intercept[IllegalArgumentException] {
      Wet.records(garbage, "fixG").toSeq
    }
    assert(e3.getMessage.contains("expected WARC/1.x"))
  }

  test("strict gunzip: truncation/garbage/corruption between members fails loudly") {
    // GZIPInputStream would silently treat ALL of these as clean EOF
    // after the first member — the strict member walker must not
    val good = rawRecord(Seq("WARC/1.1", "WARC-Type: conversion",
      "WARC-Target-URI: http://x.test/ok"), "fine".getBytes)
    val twoMembers = gzMembers(Seq(good, good))
    // (a) trailing garbage after a valid member
    val garbageTail = gzMembers(Seq(good)) ++ "not gzip at all".getBytes
    val e1 = intercept[IllegalArgumentException] {
      Wet.records(garbageTail, "fixTG").toSeq
    }
    assert(e1.getMessage.contains("offset") &&
      e1.getMessage.contains("fixTG"))
    // (b) second member cut mid-stream (a half-downloaded crawl file)
    val cut = twoMembers.take(twoMembers.length - 15)
    val e2 = intercept[Exception] { Wet.records(cut, "fixCut").toSeq }
    assert(e2.getMessage.contains("fixCut") &&
      (e2.getMessage.contains("truncated") || e2.getMessage.contains("offset")))
    // (c) a flipped byte inside the second member's deflate data
    val flipped = twoMembers.clone()
    flipped(twoMembers.length - 30) = (flipped(twoMembers.length - 30) ^ 0x5a).toByte
    val e3 = intercept[Exception] { Wet.records(flipped, "fixFlip").toSeq }
    assert(e3.getMessage.contains("fixFlip"))
    // (d) a flipped CRC byte (deflate intact, checksum wrong)
    val badCrc = twoMembers.clone()
    badCrc(twoMembers.length - 7) = (badCrc(twoMembers.length - 7) ^ 0x01).toByte
    val e4 = intercept[Exception] { Wet.records(badCrc, "fixCrc").toSeq }
    assert(e4.getMessage.contains("fixCrc"))
    // control: the untouched two-member file parses both records
    assert(Wet.records(twoMembers, "fixOk").size == 2)
    // after a parse failure the iterator stays terminal (no garbage
    // records from a re-entered mid-record stream)
    val it = Wet.records(garbageTail, "fixTerm")
    intercept[Exception] { while (it.hasNext) it.next() }
    assert(!it.hasNext)
  }

  test("sink round-trip: member-per-record, warcinfo lead, deterministic bytes") {
    import spark.implicits._
    val docs = (0L until 37L)
      .map(i => (s"http://x.test/doc/$i", s"text body $i with € and 😀"))
      .toDF("uri", "text")
    val dir = java.nio.file.Files.createTempDirectory("wetspec").toString
    WetSink.write(docs, dir + "/w", "uri", "text", numFiles = 3)
    val files = new java.io.File(dir + "/w").listFiles().sortBy(_.getName)
    assert(files.map(_.getName).toSeq ==
      Seq("part-00000.warc.wet.gz", "part-00001.warc.wet.gz",
        "part-00002.warc.wet.gz"))
    // member-per-record: Java gzip's fixed 10-byte header once per record+warcinfo
    val header = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0,
      0xff.toByte)
    val allRecs = files.flatMap { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val recs = Wet.records(bytes, f.getName).toSeq
      val members = bytes.sliding(header.length).count(_.sameElements(header))
      assert(members == recs.size,
        s"${f.getName}: ${recs.size} records but $members gzip members")
      // warcinfo leads, conversions sorted by uri
      assert(recs.head.warc_type == "warcinfo" && recs.head.record_ix == 0)
      val uris = recs.tail.map(_.target_uri)
      assert(recs.tail.forall(_.warc_type == "conversion"))
      assert(uris == uris.sorted)
      recs
    }
    assert(allRecs.count(_.warc_type == "conversion") == 37)
    // round-trip through the DataFrame reader: text + byte lengths exact
    val back = Wet.read(spark, dir + "/w")
      .filter(col("warc_type") === "conversion")
      .select("target_uri", "text", "content_length")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    (0L until 37L).foreach { i =>
      val (t, cl) = back(s"http://x.test/doc/$i")
      assert(t == s"text body $i with € and 😀")
      assert(cl == t.getBytes(StandardCharsets.UTF_8).length)
    }
    // determinism: a second write produces byte-identical files
    WetSink.write(docs, dir + "/w2", "uri", "text", numFiles = 3)
    files.zipWithIndex.foreach { case (f, i) =>
      val again = java.nio.file.Files.readAllBytes(
        new java.io.File(dir + s"/w2/${f.getName}").toPath)
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(f.toPath), again),
        s"file ${f.getName} not byte-deterministic")
    }
  }

  // ------------------------------------------- WARC response records

  /** One HTTP message block from explicit parts — the test's OWN
    * layout, independent of [[WetSink.httpBlock]]. */
  private def httpMsg(status: String, headers: Seq[String],
                      body: Array[Byte]): Array[Byte] =
    (status +: headers).mkString("", "\r\n", "\r\n\r\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++ body

  test("hand-built response records: envelope split, statuses, binary/empty bodies") {
    val binBody = Array.tabulate[Byte](256)(_.toByte) // every octet once
    val crlfBody = "first\r\n\r\nsecond".getBytes(StandardCharsets.US_ASCII)
    val fixture = gzMembers(Seq(
      rawRecord(Seq("WARC/1.0", "WARC-Type: warcinfo"),
        "software: handmade\r\n".getBytes(StandardCharsets.US_ASCII)),
      // a real WARC interleaves request records — skipped by TYPE, not
      // by failing to parse (their block is an HTTP message too)
      rawRecord(Seq("WARC/1.1", "WARC-Type: request",
        "WARC-Target-URI: http://x.test/p"),
        "GET /p HTTP/1.1\r\nHost: x.test\r\n\r\n".getBytes),
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/p",
        "WARC-Date: 2021-01-02T03:04:05Z"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Server: handmade", "content-type: text/html; charset=utf-8"),
          "<html>ok</html>".getBytes(StandardCharsets.UTF_8))),
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/redir"),
        httpMsg("HTTP/1.1 301 Moved Permanently",
          Seq("Location: http://y.test/"), Array.emptyByteArray)),
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/bin"),
        httpMsg("HTTP/1.1 304 Not Modified",
          Seq("Content-Type: application/octet-stream"), binBody)),
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/crlf"),
        httpMsg("HTTP/1.1 200 OK", Seq("Content-Type: text/plain"),
          crlfBody))))
    val rs = Wet.responses(fixture, "fixR").toSeq
    // warcinfo + request walked and skipped; record_ix still counts them
    assert(rs.map(_.http_status) == Seq(200, 301, 304, 200))
    assert(rs.map(_.record_ix) == Seq(2, 3, 4, 5))
    val ok = rs(0)
    assert(ok.target_uri == "http://x.test/p")
    assert(ok.warc_date == "2021-01-02T03:04:05Z")
    assert(ok.http_content_type == "text/html; charset=utf-8") // case-insensitive name
    assert(new String(ok.body, StandardCharsets.UTF_8) == "<html>ok</html>")
    assert(ok.header_bytes + ok.body.length == ok.content_length)
    val redir = rs(1)
    assert(redir.body.isEmpty && redir.http_content_type == "")
    assert(redir.header_bytes == redir.content_length)
    assert(rs(2).body.toSeq == binBody.toSeq) // binary-safe payload
    // the split is at the FIRST CRLFCRLF: one inside the body survives
    assert(rs(3).body.toSeq == crlfBody.toSeq)
  }

  test("TE lists, obs-fold headers, and declared charsets handled per spec") {
    // 'gzip, chunked' is legal (chunked LAST): the framing de-chunks,
    // the gzip transfer coding stays on the payload bytes
    val wire = "5\r\nhello\r\n0\r\n\r\n"
    val latin = "café ole".getBytes(StandardCharsets.ISO_8859_1)
    val fixture = gzMembers(Seq(
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/te"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Content-Type: text/plain", "Transfer-Encoding: gzip, chunked"),
          wire.getBytes(StandardCharsets.ISO_8859_1))),
      // obs-fold: the folded continuation joins its header with a space
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/fold"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Content-Type: multipart/mixed;", "\tboundary=xyz"),
          "irrelevant".getBytes)),
      // declared non-UTF-8 charset decodes correctly into `text`
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/latin"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Content-Type: text/html; charset=ISO-8859-1"), latin)),
      // non-text Content-Type: text stays empty, body raw
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/bin"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Content-Type: application/octet-stream"),
          Array[Byte](0, 1, 2)))))
    val rs = Wet.responses(fixture, "fixTE").toSeq
    assert(new String(rs(0).body, StandardCharsets.UTF_8) == "hello")
    assert(rs(1).http_content_type == "multipart/mixed; boundary=xyz")
    assert(rs(2).text == "café ole") // latin-1 decoded, not mojibake
    assert(rs(3).text == "" && rs(3).body.toSeq == Seq[Byte](0, 1, 2))
    // chunked NOT final ('chunked, gzip') is an illegal message: loud
    val bad = gzMembers(Seq(rawRecord(
      Seq("WARC/1.1", "WARC-Type: response"),
      httpMsg("HTTP/1.1 200 OK",
        Seq("Transfer-Encoding: chunked, gzip"), wire.getBytes))))
    val e = intercept[IllegalArgumentException] {
      Wet.responses(bad, "fixTEbad").toSeq
    }
    assert(e.getMessage.contains("not the final transfer coding"))
  }

  test("a glob matching no files fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("wetempty").toString
    val e = intercept[IllegalArgumentException] { Wet.read(spark, dir) }
    assert(e.getMessage.contains("no files match"))
  }

  test("malformed response blocks fail loudly") {
    // truncation inside the HTTP head: no CRLFCRLF boundary at all
    val noBoundary = gzMembers(Seq(rawRecord(
      Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/t"),
      "HTTP/1.1 200 OK\r\nContent-Type: text/h".getBytes)))
    val e1 = intercept[IllegalArgumentException] {
      Wet.responses(noBoundary, "fixH").toSeq
    }
    assert(e1.getMessage.contains("fixH") &&
      e1.getMessage.contains("truncated inside the HTTP head"))
    // not an HTTP message at all
    val notHttp = gzMembers(Seq(rawRecord(
      Seq("WARC/1.1", "WARC-Type: response"),
      "<html>no envelope</html>\r\n\r\n".getBytes)))
    val e2 = intercept[IllegalArgumentException] {
      Wet.responses(notHttp, "fixNH").toSeq
    }
    assert(e2.getMessage.contains("expected an HTTP status line"))
    // non-numeric status code
    val badCode = gzMembers(Seq(rawRecord(
      Seq("WARC/1.1", "WARC-Type: response"),
      "HTTP/1.1 abc OK\r\n\r\nbody".getBytes)))
    val e3 = intercept[IllegalArgumentException] {
      Wet.responses(badCode, "fixBC").toSeq
    }
    assert(e3.getMessage.contains("malformed HTTP status code"))
  }

  test("response sink round-trip: statuses, missing Content-Type, empty bodies, determinism") {
    import spark.implicits._
    val docs = (0L until 23L).map { i =>
      val status = if (i % 5 == 0) 301 else if (i % 7 == 3) 404 else 200
      val ctype = if (status == 301) "" else "text/html; charset=UTF-8"
      val body = if (status == 301) "" else s"<html>page $i with €</html>"
      (s"http://x.test/doc/$i", status, ctype, body)
    }.toDF("uri", "status", "ctype", "body")
    val dir = java.nio.file.Files.createTempDirectory("warcspec").toString
    WetSink.writeResponses(docs, dir + "/w", "uri", "status", "ctype", "body",
      numFiles = 2)
    val back = graft.sources.Wet.readResponses(spark, dir + "/w")
      .collect().map { r =>
        r.getAs[String]("target_uri") ->
          ((r.getAs[Int]("http_status"), r.getAs[String]("http_content_type"),
            new String(r.getAs[Array[Byte]]("body"), StandardCharsets.UTF_8)))
      }.toMap
    assert(back.size == 23)
    (0L until 23L).foreach { i =>
      val (st, ct, bd) = back(s"http://x.test/doc/$i")
      val wantSt = if (i % 5 == 0) 301 else if (i % 7 == 3) 404 else 200
      assert(st == wantSt)
      if (wantSt == 301) assert(ct == "" && bd == "")
      else assert(ct == "text/html; charset=UTF-8" &&
        bd == s"<html>page $i with €</html>")
    }
    // determinism: a second write produces byte-identical files
    WetSink.writeResponses(docs, dir + "/w2", "uri", "status", "ctype", "body",
      numFiles = 2)
    new java.io.File(dir + "/w").listFiles().sortBy(_.getName).foreach { f =>
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.file.Files.readAllBytes(
          new java.io.File(dir + s"/w2/${f.getName}").toPath)),
        s"${f.getName} not byte-deterministic")
    }
  }

  test("chunked response bodies decode per RFC 9112 §7.1") {
    // hand-built chunked framing, independent of httpChunkedBlock: two
    // chunks (one with a size extension), a trailer field after the
    // last chunk (tolerated, ignored), and uppercase hex
    val wire = "7;ext=a\r\nhello c\r\n12\r\nhunked crawl world\r\n" +
      "0\r\nX-Trailer: ok\r\n\r\n"
    def resp(body: Array[Byte], uri: String) = rawRecord(
      Seq("WARC/1.1", "WARC-Type: response", s"WARC-Target-URI: $uri"),
      httpMsg("HTTP/1.1 200 OK",
        Seq("Content-Type: text/plain", "transfer-encoding: Chunked"),
        body))
    val fixture = gzMembers(Seq(
      resp(wire.getBytes(StandardCharsets.ISO_8859_1), "http://x.test/c"),
      resp("0\r\n\r\n".getBytes, "http://x.test/empty")))
    val rs = Wet.responses(fixture, "fixC").toSeq
    assert(new String(rs(0).body, StandardCharsets.UTF_8) ==
      "hello chunked crawl world")
    assert(rs(1).body.isEmpty)
    // malformed chunked bodies fail loudly
    def bad(body: String) = intercept[IllegalArgumentException] {
      Wet.responses(gzMembers(Seq(resp(body.getBytes, "http://x.test/b"))),
        "fixBad").toSeq
    }
    assert(bad("zz\r\ndata\r\n0\r\n\r\n").getMessage
      .contains("malformed chunk size"))
    assert(bad("10\r\nshort\r\n0\r\n\r\n").getMessage
      .contains("truncated")) // 0x10=16 bytes promised, 5 present
    assert(bad("5\r\nhelloXX0\r\n\r\n").getMessage
      .contains("missing CRLF after"))
  }

  test("WARC-Truncated: declared cuts decode best-effort, flag surfaced") {
    // Common Crawl cuts payloads at ~1 MiB and DECLARES it; the cut
    // lands mid-chunk, so the chunk walk must keep the stored prefix
    // instead of failing the file (only UNDECLARED truncation is loud)
    val cutWire = "1a\r\n<html><body>page not fo" // 23 of 26 promised bytes
    val fixture = gzMembers(Seq(
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/cut", "WARC-Truncated: length"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Content-Type: text/html", "Transfer-Encoding: chunked"),
          cutWire.getBytes(StandardCharsets.ISO_8859_1))),
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/ok"),
        httpMsg("HTTP/1.1 200 OK", Seq("Content-Type: text/html"),
          "<html>fine</html>".getBytes))))
    val rs = Wet.responses(fixture, "fixTr").toSeq
    assert(rs(0).warc_truncated == "length")
    assert(new String(rs(0).body, StandardCharsets.UTF_8) ==
      "<html><body>page not fo")
    assert(rs(1).warc_truncated == "")
  }

  test("chunked sink round-trip: httpChunkedBlock framing decodes back") {
    import spark.implicits._
    val body = ("x" * 30) + "€😀" + ("y" * 20) // multi-byte across chunks
    val docs = Seq(("http://x.test/ck", 200, "text/html; charset=UTF-8",
      body, true)).toDF("uri", "status", "ctype", "body", "chunked")
    val dir = java.nio.file.Files.createTempDirectory("warcck").toString
    WetSink.writeResponses(docs, dir, "uri", "status", "ctype", "body",
      numFiles = 1, chunkedCol = "chunked", chunkSize = 26)
    val r = graft.sources.Wet.readResponses(spark, dir).collect().head
    assert(new String(r.getAs[Array[Byte]]("body"),
      StandardCharsets.UTF_8) == body)
    // wire framing is larger than the payload: the envelope split plus
    // chunk walk accounted for every block byte (strict readExactly
    // would have failed otherwise)
    assert(r.getAs[Long]("content_length") >
      r.getAs[Long]("header_bytes") +
        body.getBytes(StandardCharsets.UTF_8).length)
  }

  test("member index: offsets cover the file and round-trip to random-access reads") {
    import spark.implicits._
    val docs = (0L until 12L)
      .map(i => (s"http://x.test/doc/$i", s"indexed body $i with € text"))
      .toDF("uri", "text")
    val dir = java.nio.file.Files.createTempDirectory("wetidx").toString
    WetSink.write(docs, dir, "uri", "text", numFiles = 1)
    val bytes = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "part-00000.warc.wet.gz").toPath)
    val idx = Wet.index(bytes, "f")
    val full = Wet.records(bytes, "f").toSeq
    assert(idx.size == full.size && idx.size == 13) // warcinfo + 12
    assert(idx.head.offset == 0 && idx.head.warc_type == "warcinfo")
    // members tile the file exactly: end(i) == start(i+1), last == EOF
    assert(idx.map(e => e.offset + e.length) ==
      idx.tail.map(_.offset) :+ bytes.length.toLong)
    idx.zip(full).foreach { case (e, r) =>
      assert(e.record_ix == r.record_ix && e.target_uri == r.target_uri)
      val one = Wet.readAt(bytes, "f", e.offset, e.length)
      assert(one.record_ix == 0) // slice-local ordinal
      assert(one.target_uri == r.target_uri && one.text == r.text)
    }
    // the DataFrame form carries the same rows
    val dfIdx = Wet.indexFiles(spark, dir).collect()
    assert(dfIdx.length == 13)
    // a COALESCED member (two records in one member) must fail loudly —
    // a per-record index over it would lie
    val rec = rawRecord(Seq("WARC/1.1", "WARC-Type: conversion",
      "WARC-Target-URI: http://x.test/a"), "aa".getBytes)
    val coalesced = gzMembers(Seq(rec ++ rec))
    val e1 = intercept[IllegalArgumentException] { Wet.index(coalesced, "fx") }
    assert(e1.getMessage.contains("holds 2 records"))
    // plain (uncompressed) input rejected with the actionable message
    val e2 = intercept[IllegalArgumentException] {
      Wet.index("WARC/1.1\r\n".getBytes, "fp")
    }
    assert(e2.getMessage.contains("record-at-time"))
  }

  test("oversized-file guard names the file and the fix") {
    val dir = java.nio.file.Files.createTempDirectory("wetbig").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "ok.warc.wet.gz"),
      gzMembers(Seq(rawRecord(
        Seq("WARC/1.1", "WARC-Type: conversion"), "fine".getBytes))))
    // the guard is a metadata (length) pre-check — simulate the
    // pathological file cheaply with a sparse file, no 2 GiB of I/O
    val big = java.nio.file.Paths.get(dir, "huge.warc.wet.gz")
    val ch = java.nio.channels.FileChannel.open(big,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      ch.position(Wet.MaxFileBytes) // one byte past the cell cap
      ch.write(java.nio.ByteBuffer.wrap(Array[Byte](0)))
    } finally ch.close()
    val e = intercept[IllegalArgumentException] {
      Wet.read(spark, dir)
    }
    assert(e.getMessage.contains("huge.warc.wet.gz") &&
      e.getMessage.contains("2 GiB") && e.getMessage.contains("split"))
  }

  // ------------------------------------- Content-Encoding (round 18)

  private def deflateZlib(payload: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(payload); d.finish()
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  private def deflateRaw(payload: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(payload); d.finish()
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** RFC 9112 chunk framing over already-coded bytes (chunked is
    * OUTERMOST — the stacking order the reader must invert). */
  private def chunkWire(coded: Array[Byte], size: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var off = 0
    while (off < coded.length) {
      val n = math.min(size, coded.length - off)
      out.write(Integer.toHexString(n).getBytes(StandardCharsets.US_ASCII))
      out.write('\r'); out.write('\n')
      out.write(coded, off, n)
      out.write('\r'); out.write('\n')
      off += n
    }
    out.write("0\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
    out.toByteArray
  }

  test("Content-Encoding: gzip/deflate bodies decode into text; body keeps the as-stored bytes") {
    val page = "<html><body>coded page</body></html>"
    val pageBytes = page.getBytes(StandardCharsets.UTF_8)
    val gz = graft.sources.WetSink.gzipBytes(pageBytes)
    val fixture = gzMembers(Seq(
      // plain gzip under Content-Length framing
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/gz"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Content-Type: text/html; charset=UTF-8",
            "Content-Encoding: gzip"), gz)),
      // gzip UNDER chunked framing: chunked is message framing
      // (outermost); the de-chunked bytes are the gzip stream
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/gzch"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Content-Type: text/html; charset=UTF-8",
            "Content-Encoding: gzip", "Transfer-Encoding: chunked"),
          chunkWire(gz, 7))),
      // zlib-wrapped deflate (the RFC 9110 meaning)
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/zl"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Content-Type: text/plain", "Content-Encoding: deflate"),
          deflateZlib(pageBytes))),
      // raw deflate (what many real servers actually send)
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/raw"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Content-Type: text/plain", "Content-Encoding: deflate"),
          deflateRaw(pageBytes))),
      // identity coding: a no-op, surfaced in the column
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/id"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Content-Type: text/plain", "Content-Encoding: identity"),
          pageBytes)),
      // multi-member gzip coding (RFC 9110 permits concatenation)
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/mm"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Content-Type: text/plain", "Content-Encoding: gzip"),
          graft.sources.WetSink.gzipBytes("first ".getBytes) ++
            graft.sources.WetSink.gzipBytes("second".getBytes)))))
    val rs = Wet.responses(fixture, "fixCE").toSeq
    assert(rs.map(_.text) ==
      Seq(page, page, page, page, page, "first second"))
    assert(rs.map(_.http_content_encoding) ==
      Seq("gzip", "gzip", "deflate", "deflate", "identity", "gzip"))
    // body is the AS-STORED payload: still coded (post-de-chunk)
    assert(rs(0).body.toSeq == gz.toSeq)
    assert(rs(1).body.toSeq == gz.toSeq)
  }

  test("unknown content codings fail loudly on the text path, pass through non-text") {
    val br = Array[Byte](1, 2, 3)
    val loud = gzMembers(Seq(rawRecord(
      Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/br"),
      httpMsg("HTTP/1.1 200 OK",
        Seq("Content-Type: text/html", "Content-Encoding: br"), br))))
    val e = intercept[IllegalArgumentException] {
      Wet.responses(loud, "fixBR").toSeq
    }
    assert(e.getMessage.contains("no decoder for content coding 'br'"))
    // a NON-textual type never decodes, so an unknown coding rides
    // the body column untouched — one undecodable image must not
    // kill a 150 MB file the pipeline only reads HTML from
    val quiet = gzMembers(Seq(rawRecord(
      Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/brbin"),
      httpMsg("HTTP/1.1 200 OK",
        Seq("Content-Type: application/octet-stream",
          "Content-Encoding: br"), br))))
    val r = Wet.responses(quiet, "fixBRbin").toSeq.head
    assert(r.text == "" && r.body.toSeq == br.toSeq &&
      r.http_content_encoding == "br")
  }

  test("truncated gzip coding: loud undeclared, best-effort prefix under WARC-Truncated") {
    val page = ("words " * 200).trim
    val gz = graft.sources.WetSink.gzipBytes(
      page.getBytes(StandardCharsets.UTF_8))
    val cut = gz.take(gz.length / 2) // mid-deflate cut
    val undeclared = gzMembers(Seq(rawRecord(
      Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/cut"),
      httpMsg("HTTP/1.1 200 OK",
        Seq("Content-Type: text/html", "Content-Encoding: gzip"), cut))))
    val e = intercept[Exception] { Wet.responses(undeclared, "fixCut").toSeq }
    assert(e.getMessage.contains("fixCut"))
    val declared = gzMembers(Seq(rawRecord(
      Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/cut2",
        "WARC-Truncated: length"),
      httpMsg("HTTP/1.1 200 OK",
        Seq("Content-Type: text/html", "Content-Encoding: gzip"), cut))))
    val r = Wet.responses(declared, "fixCut2").toSeq.head
    assert(r.warc_truncated == "length")
    // best-effort: a PREFIX of the page, not mojibake, not a crash
    assert(r.text.nonEmpty && page.startsWith(r.text.take(32)))
  }

  test("coded-payload edges: empty coded body, truncation before the gzip magic") {
    val fixture = gzMembers(Seq(
      // a 304-style record still declaring its coding over an EMPTY
      // body — real crawl shape, must parse to empty text, not crash
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/empty"),
        httpMsg("HTTP/1.1 304 Not Modified",
          Seq("Content-Type: text/html", "Content-Encoding: gzip"),
          Array.emptyByteArray)),
      // declared truncation cut the payload to ONE byte — before the
      // gzip magic completes: best-effort empty, not loud
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/stub",
        "WARC-Truncated: length"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Content-Type: text/html", "Content-Encoding: gzip"),
          Array[Byte](0x1f)))))
    val rs = Wet.responses(fixture, "fixEdge").toSeq
    assert(rs(0).text == "" && rs(0).http_status == 304)
    assert(rs(1).text == "" && rs(1).warc_truncated == "length")
  }

  test("deflate edge: FDICT zlib payload fails loudly (terminal, never spins)") {
    // CMF=0x78, FLG=0x20: FDICT bit set and (0x7820 % 31 == 0) — the
    // header check passes, then inflate() stalls on needsDictionary
    // (returns 0 with needsInput()==false). Nothing on the web ships
    // the dictionary out of band, so this must be terminal-loud, not
    // an infinite loop in the task.
    val fdict = Array[Byte](0x78, 0x20, 0xde.toByte, 0xad.toByte,
      0xbe.toByte, 0xef.toByte, 1, 2, 3, 4)
    val loud = gzMembers(Seq(rawRecord(
      Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/fdict"),
      httpMsg("HTTP/1.1 200 OK",
        Seq("Content-Type: text/plain", "Content-Encoding: deflate"),
        fdict))))
    val e = intercept[IllegalArgumentException] {
      Wet.responses(loud, "fixFdict").toSeq
    }
    assert(e.getMessage.contains("corrupt deflate content coding"))
    // declared truncation → best-effort path: same stall must yield
    // the empty prefix, not a spin
    val declared = gzMembers(Seq(rawRecord(
      Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/fdict2",
        "WARC-Truncated: length"),
      httpMsg("HTTP/1.1 200 OK",
        Seq("Content-Type: text/plain", "Content-Encoding: deflate"),
        fdict))))
    val r = Wet.responses(declared, "fixFdict2").toSeq.head
    assert(r.text == "" && r.warc_truncated == "length")
  }

  test("deflate edge: raw stream whose leading bytes pass the zlib check retries raw") {
    // Hand-built RAW deflate: a non-final stored block whose first
    // byte is 0x78 (BFINAL=0, BTYPE=00 — the remaining bits are
    // padding the format ignores) followed by LEN=1. The leading pair
    // (0x78, 0x01) passes the zlib header check (30721 % 31 == 0), so
    // zlib-mode inflate runs first and rejects the stream; the
    // tolerant read must then retry raw and decode "A".
    val lookalike = Array[Byte](
      0x78, 0x01, 0x00, 0xfe.toByte, 0xff.toByte, 'A', // stored "A"
      0x01, 0x00, 0x00, 0xff.toByte, 0xff.toByte)      // final empty block
    val fixture = gzMembers(Seq(rawRecord(
      Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/lookalike"),
      httpMsg("HTTP/1.1 200 OK",
        Seq("Content-Type: text/plain", "Content-Encoding: deflate"),
        lookalike))))
    val r = Wet.responses(fixture, "fixLookalike").toSeq.head
    assert(r.text == "A", s"expected raw retry to decode, got '${r.text}'")
  }

  test("meta-charset sniff and textual application types") {
    val latinPage = "<html><head><meta charset=\"ISO-8859-1\"></head>" +
      "<body>café</body></html>"
    val fixture = gzMembers(Seq(
      // header declares NO charset; the page's own meta tag does —
      // the HTML5 fallback real servers rely on
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/meta"),
        httpMsg("HTTP/1.1 200 OK", Seq("Content-Type: text/html"),
          latinPage.getBytes(StandardCharsets.ISO_8859_1))),
      // http-equiv spelling of the same declaration
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/equiv"),
        httpMsg("HTTP/1.1 200 OK", Seq("Content-Type: text/html"),
          ("<html><head><meta http-equiv=\"Content-Type\" " +
            "content=\"text/html; charset=iso-8859-1\"></head>" +
            "<body>olé</body></html>")
            .getBytes(StandardCharsets.ISO_8859_1))),
      // application/xhtml+xml IS crawl HTML — must decode to text
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/xhtml"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Content-Type: application/xhtml+xml; charset=UTF-8"),
          "<html>xhtml page</html>".getBytes(StandardCharsets.UTF_8))),
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/json"),
        httpMsg("HTTP/1.1 200 OK", Seq("Content-Type: application/json"),
          "{\"k\":1}".getBytes(StandardCharsets.UTF_8)))))
    val rs = Wet.responses(fixture, "fixMeta").toSeq
    assert(rs(0).text.contains("café"))   // sniffed latin-1, not mojibake
    assert(rs(1).text.contains("olé"))
    assert(rs(2).text == "<html>xhtml page</html>")
    assert(rs(3).text == "{\"k\":1}")
  }

  test("WARC-Payload-Digest verifies the as-stored payload; mismatch flagged not loud") {
    val body = "payload bytes".getBytes(StandardCharsets.US_ASCII)
    val sha = java.security.MessageDigest.getInstance("SHA-1").digest(body)
    val good = "sha1:" + Wet.base32(sha)
    val fixture = gzMembers(Seq(
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/ok",
        s"WARC-Payload-Digest: $good"),
        httpMsg("HTTP/1.1 200 OK", Seq("Content-Type: text/plain"), body)),
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/bad",
        "WARC-Payload-Digest: sha1:AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"),
        httpMsg("HTTP/1.1 200 OK", Seq("Content-Type: text/plain"), body)),
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/absent"),
        httpMsg("HTTP/1.1 200 OK", Seq("Content-Type: text/plain"), body)),
      // digest covers the DE-CHUNKED payload (post-transfer-decode,
      // pre-content-decode): chunk framing must not enter the sha1
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/chunked",
        s"WARC-Payload-Digest: $good"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Content-Type: text/plain", "Transfer-Encoding: chunked"),
          chunkWire(body, 5)))))
    val rs = Wet.responses(fixture, "fixDig").toSeq
    assert(rs.map(_.digest_ok) == Seq(true, false, true, true))
    assert(rs(1).text == "payload bytes") // flagged, still parsed
  }

  test("malformed status codes and colonless headers keep record context") {
    // an 11-digit all-numeric 'status' must fail with the record
    // context, not a bare NumberFormatException
    val overflow = gzMembers(Seq(rawRecord(
      Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/of"),
      httpMsg("HTTP/1.1 99999999999 Weird", Seq("Content-Type: text/plain"),
        "x".getBytes))))
    val e1 = intercept[IllegalArgumentException] {
      Wet.responses(overflow, "fixOF").toSeq
    }
    assert(e1.getMessage.contains("fixOF") &&
      e1.getMessage.contains("malformed HTTP status code"))
    // colonless garbage header: loud when the record claims integrity
    val garbage = gzMembers(Seq(rawRecord(
      Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/g"),
      httpMsg("HTTP/1.1 200 OK",
        Seq("Content-Type text/plain missing colon"), "x".getBytes))))
    val e2 = intercept[IllegalArgumentException] {
      Wet.responses(garbage, "fixG").toSeq
    }
    assert(e2.getMessage.contains("malformed HTTP header line"))
    // …but SKIPPED when the record declares truncation (the head may
    // be cut mid-line — same tolerance as the chunk walk)
    val tolerated = gzMembers(Seq(rawRecord(
      Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://x.test/g2",
        "WARC-Truncated: length"),
      httpMsg("HTTP/1.1 200 OK",
        Seq("Content-Type: text/plain", "X-Cut-Mid-Header-No-Colon"),
        "salvaged".getBytes))))
    val r = Wet.responses(tolerated, "fixG2").toSeq.head
    assert(r.text == "salvaged" && r.http_content_type == "text/plain")
  }

  test("surtKey: the CDX searchable-key transform, golden cases") {
    assert(Wet.surtKey("https://www.Example.COM/Path/X?b=2") ==
      "com,example,www)/path/x?b=2")
    assert(Wet.surtKey("http://u:p@Host.Test:80/") == "test,host)/")
    assert(Wet.surtKey("https://a.b.c:8443/p") == "c,b,a:8443)/p")
    assert(Wet.surtKey("http://x.test") == "test,x)/")       // bare host
    assert(Wet.surtKey("http://x.test?q=1") == "test,x)/?q=1")
    assert(Wet.surtKey("https://x.test:443/p#frag") == "test,x)/p")
  }

  test("cdxj: sorted searchable lines whose offset/length seek back to the record") {
    val bodyA = "<html>aaa</html>".getBytes(StandardCharsets.UTF_8)
    val bodyB = "<html>bbb</html>".getBytes(StandardCharsets.UTF_8)
    val shaB = "sha1:" + Wet.base32(
      java.security.MessageDigest.getInstance("SHA-1").digest(bodyB))
    val fixture = gzMembers(Seq(
      rawRecord(Seq("WARC/1.1", "WARC-Type: warcinfo"),
        "software: handmade\r\n".getBytes(StandardCharsets.US_ASCII)),
      // b.test FIRST in the file — output must sort a.test first
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://b.test/p2",
        "WARC-Date: 2021-01-02T03:04:05Z",
        s"WARC-Payload-Digest: $shaB"),
        httpMsg("HTTP/1.1 200 OK",
          Seq("Content-Type: text/html; charset=utf-8"), bodyB)),
      rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://a.test/p1",
        "WARC-Date: 2021-01-02T03:04:05Z"),
        httpMsg("HTTP/1.1 404 Not Found", Seq("Content-Type: text/html"),
          bodyA))))
    val lines = Wet.cdxj(fixture, "/crawl/seg/file-00001.warc.gz")
    assert(lines.size == 2) // warcinfo skipped
    assert(lines == lines.sorted)
    assert(lines(0).startsWith("test,a)/p1 20210102030405 {\"url\": " +
      "\"http://a.test/p1\", \"mime\": \"text/html\", \"status\": \"404\", "))
    assert(lines(1).startsWith("test,b)/p2 20210102030405 {"))
    // declared digest surfaces verbatim (uppercased); absent one is
    // computed over the stored payload
    assert(lines(1).contains("\"digest\": \"" + shaB.substring(5) + "\""))
    val shaA = Wet.base32(
      java.security.MessageDigest.getInstance("SHA-1").digest(bodyA))
    assert(lines(0).contains("\"digest\": \"" + shaA + "\""))
    assert(lines.forall(_.endsWith("\"filename\": \"file-00001.warc.gz\"}")))
    // the length/offset pair IS a seekable member slice
    val Re = """"length": "(\d+)", "offset": "(\d+)"""".r.unanchored
    lines.foreach { l =>
      val Re(len, off) = l
      val r = Wet.responseAt(fixture, "seek", off.toLong, len.toLong)
      assert(l.startsWith(Wet.surtKey(r.target_uri) + " "))
    }
    // deterministic bytes: a second pass is identical
    assert(Wet.cdxj(fixture, "/crawl/seg/file-00001.warc.gz") == lines)
  }

  test("robots noindex: header and meta forms, agent prefixes, malformed never loud") {
    def resp(headers: Seq[String], ctype: String, body: String): Array[Byte] =
      gzMembers(Seq(rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://r.test/p"),
        httpMsg("HTTP/1.1 200 OK",
          s"Content-Type: $ctype" +: headers,
          body.getBytes(StandardCharsets.UTF_8)))))
    def one(headers: Seq[String], ctype: String, body: String) =
      Wet.responses(resp(headers, ctype, body), "fixRob").toSeq.head
    // header forms
    assert(one(Seq("X-Robots-Tag: noindex"), "text/html", "<html/>").robots_noindex)
    assert(one(Seq("X-Robots-Tag: noindex, nofollow"), "text/html", "<html/>").robots_noindex)
    assert(one(Seq("X-Robots-Tag: googlebot: noindex"), "text/html", "<html/>").robots_noindex)
    assert(!one(Seq("X-Robots-Tag: nofollow"), "text/html", "<html/>").robots_noindex)
    assert(!one(Seq("X-Robots-Tag: noindexx"), "text/html", "<html/>").robots_noindex) // not a token
    assert(!one(Seq("X-Robots-Tag: unavailable_after: 25 Jun 2030"), "text/html", "<html/>").robots_noindex)
    assert(!one(Nil, "text/html", "<html/>").robots_noindex)
    // meta forms: quoting variants, directive list, wrong-name meta
    assert(one(Nil, "text/html",
      "<html><head><meta name=\"robots\" content=\"noindex\"></head></html>").robots_noindex)
    assert(one(Nil, "text/html",
      "<html><head><META NAME=ROBOTS CONTENT='noindex, follow'></head></html>").robots_noindex)
    assert(!one(Nil, "text/html",
      "<html><head><meta name=\"viewport\" content=\"noindex\"></head></html>").robots_noindex)
    assert(!one(Nil, "text/html",
      "<html><head><meta name=\"robots\" content=\"nofollow\"></head></html>").robots_noindex)
    // a non-textual type never sniffs HTML (header still applies)
    assert(!one(Nil, "application/octet-stream",
      "<meta name=robots content=noindex>").robots_noindex)
    assert(one(Seq("X-Robots-Tag: noindex"), "application/octet-stream",
      "x").robots_noindex)
  }

  test("canonical link: quoting/rel variants, first wins, resolution against the record URI") {
    def page(head: String): Array[Byte] =
      gzMembers(Seq(rawRecord(Seq("WARC/1.1", "WARC-Type: response",
        "WARC-Target-URI: http://c.test/a/b/page.html"),
        httpMsg("HTTP/1.1 200 OK", Seq("Content-Type: text/html"),
          s"<html><head>$head</head><body>x</body></html>"
            .getBytes(StandardCharsets.UTF_8)))))
    def canon(head: String): String =
      Wet.responses(page(head), "fixCanon").toSeq.head.canonical_url
    assert(canon("<link rel=\"canonical\" href=\"https://x.test/c\">")
      == "https://x.test/c")
    assert(canon("<link rel=canonical href=/root>") == "http://c.test/root")
    assert(canon("<link rel='canonical' href='sib.html'>")
      == "http://c.test/a/b/sib.html")
    assert(canon("<link rel=\"canonical\" href=\"//cdn.test/z\">")
      == "http://cdn.test/z")
    assert(canon("<link rel=\"alternate canonical\" href=\"/ac\">")
      == "http://c.test/ac")
    // first canonical wins; stylesheet links skipped; hrefless skipped
    assert(canon("<link rel=\"stylesheet\" href=\"s.css\">" +
      "<link rel=\"canonical\">" +
      "<link rel=\"canonical\" href=\"/one\">" +
      "<link rel=\"canonical\" href=\"/two\">") == "http://c.test/one")
    assert(canon("") == "")
    // resolveRef unit shapes (incl. the unparseable-base fallback)
    assert(Wet.resolveRef("http://h.test/p/q", "?k=1") == "http://h.test/p/q?k=1")
    assert(Wet.resolveRef("http://h.test", "r") == "http://h.test/r")
    assert(Wet.resolveRef("garbage", "/x") == "/x")
    assert(Wet.resolveRef("http://h.test/p/", "") == "")
  }

  test("cdxjCluster: two-level ZipNum artifact — cluster.idx seek to block to responseAt") {
    // 3 WARC files × 4 responses = 12 lines; blockLines=2, shards=2
    // → multi-file, multi-block, multi-shard on a hand-checkable size
    val dir = java.nio.file.Files.createTempDirectory("wetclu").toString
    val fileBytes = scala.collection.mutable.Map[String, Array[Byte]]()
    (0 until 3).foreach { f =>
      val recs = (0 until 4).map { j =>
        val host = s"h${(f * 4 + j) % 7}.test" // interleave hosts across files
        rawRecord(Seq("WARC/1.1", "WARC-Type: response",
          s"WARC-Target-URI: http://$host/f$f/p$j",
          "WARC-Date: 2021-03-04T05:06:07Z"),
          httpMsg("HTTP/1.1 200 OK", Seq("Content-Type: text/html"),
            s"<html>doc $f-$j</html>".getBytes(StandardCharsets.UTF_8)))
      }
      val bytes = gzMembers(recs)
      val name = f"crawl-$f%05d.warc.gz"
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
      fileBytes(name) = bytes
    }
    val out = java.nio.file.Files.createTempDirectory("wetcluOut").toString
    Wet.cdxjCluster(spark, dir, out, shards = 2, blockLines = 2)
    val expected = fileBytes.toSeq.flatMap { case (n, b) =>
      Wet.cdxj(b, s"$dir/$n")
    }.sorted
    // the two-level artifact: every block's key/offset/length is
    // honest — reassembling all blocks yields the global sorted lines
    val refs = Wet.clusterIndex(spark, out)
    assert(refs.map(_.seq) == (1L to refs.size).toVector)
    assert(refs.map(_.key) == refs.map(_.key).sorted)
    assert(refs.forall(r => r.file == "cdx-00000.gz" || r.file == "cdx-00001.gz"))
    val reassembled = refs.flatMap { r =>
      val raw = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out, r.file))
      val slice = java.util.Arrays.copyOfRange(raw, r.offset.toInt,
        (r.offset + r.length).toInt)
      val gz = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(slice))
      new String(gz.readAllBytes(), StandardCharsets.UTF_8)
        .split("\n").filter(_.nonEmpty).toSeq
    }
    assert(reassembled == expected,
      "concatenated blocks must reproduce the global sorted line set")
    assert(refs.map(_.key) == expected.grouped(2).map(g =>
      g.head.substring(0, g.head.indexOf(" {"))).toVector,
      "each cluster.idx key is its block's first searchable key")
    // seek path: a mid-block key (never a block's first key) resolves
    // through cluster.idx -> one block -> its line -> responseAt
    val target = expected(3) // 4th line: mid-block by construction
    val key = target.substring(0, target.indexOf(" {"))
    val hits = Wet.cdxjLookup(spark, out, key)
    assert(hits == Seq(target))
    val Re = """"length": "(\d+)", "offset": "(\d+)", "filename": "([^"]+)"""".r.unanchored
    val Re(len, off, fname) = target
    val rec = Wet.responseAt(fileBytes(fname), fname, off.toLong, len.toLong)
    assert(key.startsWith(Wet.surtKey(rec.target_uri) + " "))
    // host-prefix scan returns every record of that host, in order
    val h0 = Wet.cdxjLookup(spark, out, "test,h0)")
    assert(h0.nonEmpty && h0 == expected.filter(_.startsWith("test,h0)")))
    // absent prefix: empty, not an error
    assert(Wet.cdxjLookup(spark, out, "zz,absent)").isEmpty)
  }

  test("coded response sink round-trip: gzip and gzip+chunked decode back, digests verify") {
    import spark.implicits._
    val docs = Seq(
      ("http://t.test/a", 200, "text/html; charset=UTF-8",
        "<html>plain</html>", false, ""),
      ("http://t.test/b", 200, "text/html; charset=UTF-8",
        "<html>gzip body</html>", false, "gzip"),
      ("http://t.test/c", 200, "text/html; charset=UTF-8",
        "<html>gzip under chunked</html>", true, "gzip"),
      ("http://t.test/d", 404, "text/html; charset=UTF-8",
        "<html>gone</html>", true, ""))
      .toDF("uri", "status", "ctype", "bodyText", "chunked", "enc")
      .withColumn("body", org.apache.spark.sql.functions.encode(
        org.apache.spark.sql.functions.col("bodyText"), "UTF-8"))
    val dir = java.nio.file.Files.createTempDirectory("wetcoded").toString
    graft.sources.WetSink.writeResponses(docs, dir, "uri", "status",
      "ctype", "body", numFiles = 2, chunkedCol = "chunked",
      chunkSize = 9, encodingCol = "enc")
    val back = Wet.readResponses(spark, dir)
      .select("target_uri", "http_status", "http_content_encoding",
        "digest_ok", "text")
      .as[(String, Int, String, Boolean, String)]
      .collect().sortBy(_._1)
    assert(back.map(_._1).toSeq == Seq("http://t.test/a", "http://t.test/b",
      "http://t.test/c", "http://t.test/d"))
    assert(back.map(_._5).toSeq == Seq("<html>plain</html>",
      "<html>gzip body</html>", "<html>gzip under chunked</html>",
      "<html>gone</html>"))
    assert(back.map(_._3).toSeq == Seq("", "gzip", "gzip", ""))
    assert(back.forall(_._4)) // every written digest verifies
  }
}
