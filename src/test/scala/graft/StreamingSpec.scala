package graft

import graft.streaming.{RunningRow, Streaming}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  test("tumblingStats: windowed count/mean per key over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = Streaming.tumblingStats(
      input.toDF().toDF("ts", "k", "v"), "ts", "k", "v", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData((ts(1), "a", 1.0), (ts(2), "a", 3.0), (ts(11), "a", 10.0),
        (ts(3), "b", 5.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select(col("window.start"), col("k"), col("n"), col("mean"))
        .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(rows == Set((0L, "a", 2L, 2.0), (10L, "a", 1L, 10.0),
        (0L, "b", 1L, 5.0)))
    } finally q.stop()
  }

  test("hoppingStats: each event lands in duration/slide windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = Streaming.hoppingStats(
      input.toDF().toDF("ts", "k", "v"), "ts", "k", "v",
      window = "10 minutes", slide = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("hopping")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData((ts(7), "a", 2.0), (ts(8), "a", 6.0), (ts(12), "a", 4.0))
      q.processAllAvailable()
      val rows = spark.table("hopping")
        .select(col("window.start"), col("k"), col("n"),
          col("min_value"), col("max_value"))
        .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSet
      // events at 7,8 -> windows [0,10) and [5,15); event at 12 ->
      // [5,15) and [10,20): the hop doubles membership, exactly
      assert(rows == Set(
        (0L, 2L, 2.0, 6.0),   // [0,10): 7,8
        (5L, 3L, 2.0, 6.0),   // [5,15): 7,8,12
        (10L, 1L, 4.0, 4.0))) // [10,20): 12
    } finally q.stop()
  }

  test("runningStats: Welford state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val out = Streaming.runningStats(input.toDS())
    val q = out.writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(("a", 1.0), ("a", 2.0))
      q.processAllAvailable()
      input.addData(("a", 3.0), ("a", 4.0))
      q.processAllAvailable()
      val last = spark.table("running").as[RunningRow].collect()
        .filter(_.key == "a").maxBy(_.n)
      assert(last.n == 4L && math.abs(last.mean - 2.5) < 1e-12)
      // matches the batch Welford state over the union of both batches
      val whole = graft.stats.WelfordState.of(Seq(1.0, 2.0, 3.0, 4.0))
      assert(math.abs(last.std - whole.std) < 1e-12)
    } finally q.stop()
  }

  test("sessionCounts: gap-separated sessions per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = Streaming.sessionCounts(
      input.toDF().toDF("ts", "k"), "ts", "k", gap = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete()).start()
    try {
      // two bursts 60 min apart → two sessions for key a
      input.addData((ts(1), "a"), (ts(2), "a"), (ts(61), "a"))
      q.processAllAvailable()
      val rows = spark.table("sessions").select("k", "n_events").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows.sorted == Seq(("a", 1L), ("a", 2L)))
    } finally q.stop()
  }

  test("dedupStream: watermark-horizon exact dedup drops re-arrivals") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = Streaming.dedupStream(
      input.toDF().toDF("ts", "text"), "ts", "text", watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // same normalized text arrives three times within the horizon;
      // "Hello  WORLD" normalizes to the same fingerprint as "hello world"
      input.addData((ts(1), "hello world"), (ts(2), "Hello  WORLD"),
        (ts(3), "other doc"), (ts(4), "hello world"))
      q.processAllAvailable()
      val texts = spark.table("dedup_stream").select("text").collect()
        .map(_.getString(0)).toSeq.sorted
      assert(texts == Seq("hello world", "other doc"))
    } finally q.stop()
  }

  test("urlDedupStream: canonical-URL aliases dedup within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = Streaming.urlDedupStream(
      input.toDF().toDF("ts", "url"), "ts", "url", watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("url_dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // four aliases of one canonical URL (case, default port,
      // tracking param, fragment + www) + one genuinely distinct URL
      input.addData(
        (ts(1), "HTTP://Example.COM/a?b=2&a=1"),
        (ts(2), "http://example.com:80/a?a=1&b=2&utm_source=x"),
        (ts(3), "http://www.example.com/a/?b=2&a=1#frag"),
        (ts(4), "http://example.com/other"),
        (ts(5), "http://example.com/a?a=1&b=2"))
      q.processAllAvailable()
      val urls = spark.table("url_dedup_stream").select("url").collect()
        .map(_.getString(0)).toSeq.sorted
      assert(urls.size == 2)
      assert(urls.contains("http://example.com/other"))
      // batch agreement: the survivors' canonical forms equal the
      // batch-normalized distinct set
      import spark.implicits._
      val batchCanon = Seq("HTTP://Example.COM/a?b=2&a=1",
        "http://example.com:80/a?a=1&b=2&utm_source=x",
        "http://www.example.com/a/?b=2&a=1#frag",
        "http://example.com/other",
        "http://example.com/a?a=1&b=2").toDF("url")
        .select(graft.functions.UrlFns.normalizeUrl(col("url")).as("u"))
        .distinct().as[String].collect().toSet
      val streamCanon = urls.map(u => Seq(u).toDF("url")
        .select(graft.functions.UrlFns.normalizeUrl(col("url")).as("u"))
        .as[String].collect().head).toSet
      assert(streamCanon == batchCanon)
    } finally q.stop()
  }

  test("harvestSink: micro-batches merge into a partitioned store, replay-safe") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-hsink").toString
    val store = new graft.store.ParquetStore(spark, s"$dir/store",
      Seq("a", "b"), partitionCols = Seq("a"))
    val input = MemoryStream[(Long, Long, Double)]
    val q = Streaming.harvestSink(
      input.toDF().toDF("a", "b", "v"), store, s"$dir/ckpt")
    try {
      input.addData((1L, 1L, 11.0), (1L, 2L, 12.0))
      q.processAllAvailable()
      input.addData((2L, 1L, 21.0), (1L, 3L, 13.0)) // second batch: new + same partition
      q.processAllAvailable()
      val got = store.load().select("a", "b", "v")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == Set((1L, 1L, 11.0), (1L, 2L, 12.0),
        (2L, 1L, 21.0), (1L, 3L, 13.0)))
      // replay safety: merging an already-merged delta is a no-op
      store.mergeIn(Seq((2L, 1L, 21.0)).toDF("a", "b", "v"))
      assert(store.load().count() == 4)
    } finally q.stop()
  }

  test("harvestSink rides out a transient lease holder (bounded backoff)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-hsink-lease").toString
    val store = new graft.store.ParquetStore(spark, s"$dir/store",
      Seq("a", "b"), partitionCols = Seq("a"))
    // simulate a batch writer holding the store's write lease
    val lock = new org.apache.hadoop.fs.Path(s"$dir/store.__lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(lock, false)
    o.write("pid=batch-writer op=test".getBytes("UTF-8")); o.close()
    val input = MemoryStream[(Long, Long, Double)]
    val q = Streaming.harvestSink(
      input.toDF().toDF("a", "b", "v"), store, s"$dir/ckpt",
      leaseRetries = 6, retryBaseMs = 50)
    try {
      // the "batch writer" finishes (releases the lease) mid-backoff
      val releaser = new Thread(() => { Thread.sleep(400); fs.delete(lock, false); () })
      releaser.start()
      input.addData((1L, 1L, 11.0), (2L, 1L, 21.0))
      q.processAllAvailable() // must ride out the held lease, not die
      releaser.join()
      assert(q.exception.isEmpty, s"stream died: ${q.exception}")
      assert(store.load().count() == 2)
    } finally q.stop()
  }

  test("harvestSink surfaces ConcurrentWriteException once retries burn out") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-hsink-stale").toString
    val store = new graft.store.ParquetStore(spark, s"$dir/store", Seq("a"))
    val lock = new org.apache.hadoop.fs.Path(s"$dir/store.__lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(lock, false)
    o.write("pid=crashed-writer op=test".getBytes("UTF-8")); o.close()
    val input = MemoryStream[(Long, Double)]
    val q = Streaming.harvestSink(
      input.toDF().toDF("a", "v"), store, s"$dir/ckpt",
      leaseRetries = 1, retryBaseMs = 10)
    try {
      input.addData((1L, 1.0))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(5000)
      }
      // the typed loud failure (naming breakLease) still stands for a
      // genuinely stale lease — retry only absorbs TRANSIENT holders
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(_.isInstanceOf[graft.store.ConcurrentWriteException]))
    } finally { q.stop(); fs.delete(lock, false) }
  }

  test("Mixture.sampleByRate is stateless-streaming-safe and batch-identical") {
    // the keep/drop decision is a pure function of (salt, id), so the
    // same sampler runs unchanged on a stream (no state, no watermark)
    // and selects exactly the rows the batch pass selects
    implicit val sqlCtx = spark.sqlContext
    val rates = Map("en" -> 0.6, "de" -> 0.3)
    val rows = (1L to 200L).map(i => (i, if (i % 3 == 0) "de" else "en"))
    val batch = graft.functions.Mixture.sampleByRate(
      rows.toDF("doc_id", "lang"), "doc_id", "lang", rates, salt = "s1")
      .select("doc_id").as[Long].collect().toSet
    val input = MemoryStream[(Long, String)]
    val out = graft.functions.Mixture.sampleByRate(
      input.toDF().toDF("doc_id", "lang"), "doc_id", "lang", rates, salt = "s1")
    val q = out.writeStream.format("memory").queryName("mix_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.take(100): _*)
      input.addData(rows.drop(100): _*) // second micro-batch: no flips
      q.processAllAvailable()
      val streamed = spark.table("mix_stream").select("doc_id")
        .as[Long].collect().toSet
      assert(streamed == batch && batch.nonEmpty && batch.size < 200)
    } finally q.stop()
  }

  test("ruleCleanStream: t26+t27 rule chain is stateless-streaming-safe " +
       "and batch-identical; chrome pages die mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    // five real-looking sentences -> survives; nav/short pages die
    val goodPage = (1 to 6).map(i =>
      s"Sentence number $i carries enough words to pass every gate.")
      .mkString("\n")
    val navPage = "<div><a href=\"x\">Home</a> | <a href=\"y\">About</a>" +
      "</div>\nBuy now!\nShort."
    val rows = (1L to 30L).map { i =>
      (i, if (i % 3 == 0) navPage else goodPage + s"\nUnique tail $i ends the page properly.")
    }
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    def batchForm(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.Streaming.ruleCleanStream(df, "text")
    val batch = key(batchForm(rows.toDF("doc_id", "text")))
    assert(batch.size == 20 && batch.forall(!_._2.contains("<")))
    val input = MemoryStream[(Long, String)]
    val q = batchForm(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("rule_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.take(15): _*)
      input.addData(rows.drop(15): _*)
      q.processAllAvailable()
      assert(key(spark.table("rule_stream")) == batch)
    } finally q.stop()
  }

  test("chunkTokens is stateless-streaming-safe and batch-identical") {
    // map-only (tokenize -> explode offsets -> slice): no state, no
    // watermark — context-window chunking runs unchanged on a stream
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 40L).map(i =>
      (i, (1 to (i % 7 + 3).toInt).map(j => s"d${i}w$j").mkString(" ")))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "chunk_id", "chunk_text").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val batch = key(graft.functions.TextFns.chunkTokens(
      rows.toDF("doc_id", "text"), "doc_id", "text", chunk = 4, stride = 2))
    val input = MemoryStream[(Long, String)]
    val out = graft.functions.TextFns.chunkTokens(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      chunk = 4, stride = 2)
    val q = out.writeStream.format("memory").queryName("chunk_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.take(20): _*)
      input.addData(rows.drop(20): _*)
      q.processAllAvailable()
      assert(key(spark.table("chunk_stream")) == batch && batch.size > 40)
    } finally q.stop()
  }
}
