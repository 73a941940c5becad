package graft

import graft.collect.Collect
import graft.functions.ComplexFns
import graft.multimodal.{Multimodal, PngCodec, WavCodec}
import graft.store.IO
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ComplexSpec extends SparkSpec {
  import spark.implicits._

  test("complex algebra: (1+2i)(3-i) = 5+5i; division inverts") {
    val df = Seq(1).toDF("d")
      .withColumn("a", ComplexFns.complexLit(1, 2))
      .withColumn("b", ComplexFns.complexLit(3, -1))
    val r = df.select(
      ComplexFns.re(ComplexFns.mul(col("a"), col("b"))),
      ComplexFns.im(ComplexFns.mul(col("a"), col("b"))),
      ComplexFns.re(ComplexFns.div(ComplexFns.mul(col("a"), col("b")), col("b"))),
      ComplexFns.im(ComplexFns.div(ComplexFns.mul(col("a"), col("b")), col("b"))))
      .head()
    assert(r.getDouble(0) == 5.0 && r.getDouble(1) == 5.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12 && math.abs(r.getDouble(3) - 2.0) < 1e-12)
  }

  test("|e^{i t}| = 1, arg(e^{i t}) = t; conj flips arg") {
    val df = Seq(0.3, 1.2, -2.0).toDF("t")
      .withColumn("z", ComplexFns.expi(col("t")))
    df.select(col("t"), ComplexFns.modulus(col("z")), ComplexFns.arg(col("z")),
      ComplexFns.arg(ComplexFns.conj(col("z")))).collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(2) - r.getDouble(0)) < 1e-12)
      assert(math.abs(r.getDouble(3) + r.getDouble(0)) < 1e-12)
    }
  }

  test("complex aggregation: sum of e^{2πik/n} over k vanishes") {
    val n = 8
    val df = spark.range(n)
      .withColumn("z", ComplexFns.expi(col("id") * (2 * math.Pi / n)))
    val s = df.agg(ComplexFns.sumComplex(col("z")).as("s"))
      .select("s.re", "s.im").head()
    assert(math.abs(s.getDouble(0)) < 1e-12 && math.abs(s.getDouble(1)) < 1e-12)
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(50)
    Multimodal.asMedia(
      docs.withColumn("payload", encode(col("text"), "utf-8")),
      "doc_id", "payload", kind = "image", mime = "application/fake")
  }

  test("asMedia produces the canonical media schema (names + types)") {
    assert(media.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(media.count() == 50)
  }

  test("PNG codec: encode/decode round-trip recovers exact pixels") {
    val rnd = new scala.util.Random(3)
    for ((w, h) <- Seq((1, 1), (64, 10), (7, 3))) {
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val (dw, dh, dpx) = PngCodec.decode(PngCodec.encode(px, w, h))
      assert((dw, dh) == (w, h) && dpx.toSeq == px.toSeq)
    }
  }

  test("PNG codec: decodes externally-generated PNGs (python zlib goldens)") {
    // 3x2 grayscale [10,20,30,40,50,60] written by python struct+zlib —
    // proves the decoder reads real foreign format bytes, not just its
    // own encoder's output; second golden carries an ancillary tEXt
    // chunk that must be CRC-checked and skipped
    def unhex(s: String) = s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val plain = unhex("89504e470d0a1a0a0000000d4948445200000003000000020800000000b81f39c60000001049444154789c63e0129163d030b20100027400d37e4c631a0000000049454e44ae426082")
    val withText = unhex("89504e470d0a1a0a0000000d4948445200000003000000020800000000b81f39c60000000a74455874436f6d6d656e74006869a2a258660000001049444154789c63e0129163d030b20100027400d37e4c631a0000000049454e44ae426082")
    for (png <- Seq(plain, withText)) {
      val (w, h, px) = PngCodec.decode(png)
      assert((w, h) == (3, 2) && px.toSeq == Seq[Byte](10, 20, 30, 40, 50, 60))
    }
    // corrupt one IDAT payload byte -> CRC check must reject
    val bad = plain.clone(); bad(50) = (bad(50) ^ 0x01).toByte
    assertThrows[IllegalArgumentException](PngCodec.decode(bad))
  }

  test("decodeFeatures: real PNG decode, stripe means match direct computation") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(50)
    val enc = Multimodal.encodeAsPng(docs, "doc_id", "text", width = 64)
      .localCheckpoint()
    val f1 = Multimodal.decodeFeatures(enc.drop("width", "height"), featDim = 8)
    assert(f1.columns.toSeq == Seq("media_id", "width", "height", "embedding"))
    val rows = f1.collect()
    assert(rows.length == 50)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val bytes = texts(r.getLong(0)).getBytes("UTF-8")
      val h = math.max((bytes.length + 63) / 64, 1)
      assert(r.getInt(1) == 64 && r.getInt(2) == h)
      val np = 64 * h
      val px = java.util.Arrays.copyOf(bytes, np)
      val feats = r.getSeq[Double](3)
      assert(feats.length == 8)
      for (d <- 0 until 8) {
        val lo = d * np / 8; val hi = (d + 1) * np / 8
        val want = (lo until hi).map(i => px(i) & 0xff).sum.toDouble / (hi - lo)
        assert(feats(d) == want, s"stripe $d of doc ${r.getLong(0)}")
      }
    }
  }

  test("WAV codec: encode/decode round-trip recovers exact samples") {
    val rnd = new scala.util.Random(7)
    for ((n, ch) <- Seq((1, 1), (300, 1), (64, 2))) {
      val s = Array.fill(n * ch)((rnd.nextInt(65536) - 32768).toShort)
      val w = WavCodec.decode(WavCodec.encode(s, 8000, ch))
      assert(w.sampleRate == 8000 && w.channels == ch)
      assert(w.samples.toSeq == s.toSeq)
    }
  }

  test("WAV codec: decodes + byte-matches python-stdlib wave golden") {
    // fixture.wav written by python's wave module (see FIXTURES.md):
    // 300 mono PCM-16 samples s_i = ((i*i*31 + i*7) % 65536) - 32768
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "src/test/resources/audio_store/fixture.wav"))
    val w = WavCodec.decode(bytes)
    assert(w.sampleRate == 8000 && w.channels == 1 && w.samples.length == 300)
    val want = Array.tabulate(300)(i =>
      (((i.toLong * i * 31 + i * 7) % 65536) - 32768).toShort)
    assert(w.samples.toSeq == want.toSeq)
    // and our encoder emits the exact same canonical container bytes
    assert(WavCodec.encode(want, 8000).toSeq == bytes.toSeq)
    // malformed inputs are rejected, not mis-parsed
    val notRiff = bytes.clone(); notRiff(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](WavCodec.decode(notRiff))
    val badFmt = bytes.clone(); badFmt(20) = 3 // audioFormat=3 (float)
    assertThrows[IllegalArgumentException](WavCodec.decode(badFmt))
    val overrun = bytes.clone()
    // data chunk declares more bytes than remain
    val bb = java.nio.ByteBuffer.wrap(overrun)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, 100000)
    assertThrows[IllegalArgumentException](WavCodec.decode(overrun))
  }

  test("decodeAudioFeatures: real WAV parse, window means + peak match") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(50)
    val enc = Multimodal.encodeAsWav(docs, "doc_id", "text", sampleRate = 8000)
      .localCheckpoint()
    val f = Multimodal.decodeAudioFeatures(enc, featDim = 8)
    assert(f.columns.toSeq == Seq("media_id", "sample_rate", "n_samples",
      "duration_ms", "peak", "embedding"))
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = f.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val s = texts(r.getLong(0)).getBytes("UTF-8")
        .map(b => (b & 0xff) * 256 - 32768)
      assert(r.getInt(1) == 8000 && r.getInt(2) == s.length)
      assert(r.getLong(3) == s.length.toLong * 1000 / 8000)
      assert(r.getInt(4) == s.map(math.abs).max)
      val feats = r.getSeq[Double](5)
      for (d <- 0 until 8) {
        val lo = d * s.length / 8; val hi = (d + 1) * s.length / 8
        val want = (lo until hi).map(s(_).toLong).sum.toDouble / (hi - lo)
        assert(feats(d) == want, s"window $d of doc ${r.getLong(0)}")
      }
    }
  }

  test("sampleFrames: every stride-th fixed-size frame, exact bytes") {
    val one = media.filter(col("media_id") === 0)
    val content = one.select("content").head().getAs[Array[Byte]](0)
    val frames = Multimodal.sampleFrames(one, frameSize = 32, stride = 2)
      .orderBy("frame_idx").collect()
    val expected = content.grouped(32).filter(_.length == 32).toSeq
      .zipWithIndex.filter(_._2 % 2 == 0).map(_._1)
    assert(frames.length == expected.length)
    frames.zip(expected).foreach { case (r, want) =>
      assert(r.getAs[Array[Byte]](2).toSeq == want.toSeq)
    }
  }
}

class IOFacetSpec extends SparkSpec {
  import spark.implicits._

  test("IO: orc, csv and json round-trip the long table") {
    val dir = Files.createTempDirectory("graft-io").toString
    val df = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("a", "k", "v")
    for (fmt <- Seq("parquet", "orc", "csv", "json")) {
      IO.save(df, s"$dir/$fmt", fmt)
      val back = IO.load(spark, s"$dir/$fmt", fmt)
        .select("a", "k", "v")
      assert(collectSorted(back.selectExpr("CAST(a AS LONG) a", "k",
        "CAST(v AS DOUBLE) v")) == collectSorted(df), s"format $fmt")
    }
    assertThrows[IllegalArgumentException](IO.save(df, s"$dir/x", "hdf"))
  }

  test("C2 attrs: schema metadata survives a parquet round-trip") {
    val dir = Files.createTempDirectory("graft-attrs").toString
    val df = Collect.withAttrs(Seq((1L, 2.0)).toDF("a", "v"),
      Map("c" -> "100", "fruit" -> "apples"))
    assert(Collect.attrsOf(df) == Map("c" -> "100", "fruit" -> "apples"))
    df.write.parquet(s"$dir/t")
    assert(Collect.attrsOf(spark.read.parquet(s"$dir/t"))
      == Map("c" -> "100", "fruit" -> "apples"))
  }

  test("P1: facets split by row/col dims, panels partition the rows") {
    val df = Seq((1L, "a", 1.0), (1L, "b", 2.0), (2L, "a", 3.0))
      .toDF("r", "c", "v")
    val panels = Collect.facets(df, "r", "c")
    assert(panels.map(_._1) == Seq((1L, "a"), (1L, "b"), (2L, "a")))
    assert(panels.map(_._2.count()).sum == 3)
  }
}

/** Event-time encoding dispatch ([[graft.functions.TimeFns]]): the
  * events table now ships native parquet TIMESTAMP (micros), but the
  * engine also reads older exports whose `ts` is nanos-since-epoch as
  * a plain Long (and TIMESTAMP(NANOS) files, which the pinned
  * `nanosAsLong` session flag surfaces as Long too). Both branches of
  * the schema-adaptive accessors must agree on the same instants.
  */
class TimeFnsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.functions.TimeFns

  test("asTimestamp/asMicros: native TIMESTAMP and legacy Long-nanos " +
       "columns resolve to the same instants") {
    import spark.implicits._
    val us = Seq(0L, 1_700_000_000_123_456L, 86_400_000_000L)
    val tsDf = us.toDF("n")
      .select(timestamp_micros(col("n")).as("ts"))
    val nanosDf = us.map(_ * 1000L).toDF("ts") // Long nanos column
    val a = tsDf.select(TimeFns.asMicros(tsDf, "ts").as("us"))
      .as[Long].collect().sorted.toSeq
    val b = nanosDf.select(TimeFns.asMicros(nanosDf, "ts").as("us"))
      .as[Long].collect().sorted.toSeq
    assert(a == us.sorted && b == us.sorted)
    val ta = tsDf.select(TimeFns.asTimestamp(tsDf, "ts").cast("string"))
      .as[String].collect().sorted.toSeq
    val tb = nanosDf.select(TimeFns.asTimestamp(nanosDf, "ts").cast("string"))
      .as[String].collect().sorted.toSeq
    assert(ta == tb, s"$ta != $tb")
  }

  test("ev2's session-gap arithmetic is encoding-independent") {
    import spark.implicits._
    // two users; user 1 has a 31-minute gap -> 2 sessions
    val base = 1_700_000_000_000_000L
    val rows = Seq(
      (1L, base), (1L, base + 60L * 1000000L),
      (1L, base + (60L + 31 * 60) * 1000000L),
      (2L, base))
    def sessions(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts")
      df.withColumn("__us", TimeFns.asMicros(df, "ts"))
        .withColumn("prev_us", lag(col("__us"), 1).over(w))
        .withColumn("ns", when(col("prev_us").isNull ||
          (col("__us") - col("prev_us")) > 1800L * 1000000L, 1L).otherwise(0L))
        .groupBy("user_id").agg(sum("ns").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val tsDf = rows.toDF("user_id", "n")
      .select(col("user_id"), timestamp_micros(col("n")).as("ts"))
    val nanosDf = rows.map { case (u, t) => (u, t * 1000L) }
      .toDF("user_id", "ts")
    assert(sessions(tsDf) == Map(1L -> 2L, 2L -> 1L))
    assert(sessions(nanosDf) == Map(1L -> 2L, 2L -> 1L))
  }
}
