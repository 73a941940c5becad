package graft

import graft.sources.{NetCDF3Sink, NetCDF3Source, ZarrSink, ZarrSource}
import java.nio.file.{Files, Paths}

/** Save-side bridge: [[ZarrSink]] / [[NetCDF3Sink]] write stores that
  * xarray/zarr-python/scipy open unchanged.
  *
  * The core check is NON-circular: the goldens under
  * src/test/resources/write_golden were produced by an INDEPENDENT
  * python-stdlib writer (json + struct only; generator recipe in
  * FIXTURES.md) following the same public specs and the same pinned
  * layout conventions — byte equality between two independent
  * implementations validates both. Round-trips then go through
  * [[ZarrSource]]/[[NetCDF3Source]], which were themselves validated
  * against independent fixtures, closing write → read end to end.
  */
class WriteSinkSpec extends SparkSpec {

  private val golden = "src/test/resources/write_golden"

  /** Canonical long-form dataset (see the generator header): dims
    * a=[1,2,3] (i8), t=[0.0,0.5] (f8); x(a,t) f8 with the (3,0.5)
    * cell MISSING (null → NaN fill); n(a,t) i8 total. */
  private def canonical = {
    import spark.implicits._
    Seq[(Long, Double, Option[Double], Long)](
      (1L, 0.0, Some(1.5), 10L), (1L, 0.5, Some(2.5), 20L),
      (2L, 0.0, Some(3.5), 30L), (2L, 0.5, Some(-4.25), 40L),
      (3L, 0.0, Some(5.0), 50L), (3L, 0.5, None, 60L))
      .toDF("a", "t", "x", "n")
  }

  private def filesUnder(root: String): Seq[String] = {
    val base = Paths.get(root)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    Files.walk(base).forEach { p =>
      // Hadoop's local ChecksumFileSystem adds .crc sidecars — not
      // part of the store (absent on HDFS/object stores)
      if (Files.isRegularFile(p) && !p.getFileName.toString.endsWith(".crc"))
        out += base.relativize(p).toString
    }
    out.toSeq.sorted
  }

  /** Byte-identity between a golden tree and a written tree. */
  private def assertTreesEqual(goldenRoot: String, dir: String): Unit = {
    val want = filesUnder(goldenRoot)
    val got = filesUnder(dir)
    assert(got == want, s"file sets differ: got $got want $want")
    for (f <- want) {
      val g = Files.readAllBytes(Paths.get(s"$goldenRoot/$f"))
      val o = Files.readAllBytes(Paths.get(s"$dir/$f"))
      assert(java.util.Arrays.equals(g, o),
        s"$f differs: golden ${g.length}B vs written ${o.length}B" +
          (if (f.endsWith(".json") || f.contains(".z"))
             s"\n golden: ${new String(g)}\n written: ${new String(o)}"
           else ""))
    }
  }

  test("ZarrSink uncompressed output is byte-identical to the independent python writer") {
    val dir = Files.createTempDirectory("zarrsink").toString
    ZarrSink.writeDataset(canonical, dir, Seq("a", "t"), compress = false)
    assertTreesEqual(s"$golden/zarr", dir)
  }

  test("ZarrSink v3 uncompressed output is byte-identical to the independent python writer") {
    val dir = Files.createTempDirectory("zarrsink3").toString
    ZarrSink.writeDataset(canonical, dir, Seq("a", "t"), compress = false,
      zarrFormat = 3)
    assertTreesEqual(s"$golden/zarr_v3", dir)
  }

  test("ZarrSink v3 SHARDED uncompressed output is byte-identical to the " +
       "independent python writer (missing OOB inner chunk, CRC32C index)") {
    val dir = Files.createTempDirectory("zarrsink3s").toString
    // 32 B/shard => 2 rows of the (3,2) grid per shard, 1-row inner
    // chunks => shard c/1/0 has a MISSING second inner chunk
    ZarrSink.writeDataset(canonical, dir, Seq("a", "t"),
      chunkTargetBytes = 32L, compress = false, zarrFormat = 3,
      shardInnerRows = 1)
    assertTreesEqual(s"$golden/zarr_v3s", dir)
  }

  test("ZarrSink v3 gzip store round-trips through ZarrSource.readDataset") {
    val dir = Files.createTempDirectory("zarrsink3z").toString
    ZarrSink.writeDataset(canonical, dir, Seq("a", "t"), compress = true,
      zarrFormat = 3)
    val back = ZarrSource.readDataset(spark, dir)
      .select("a", "t", "x", "n").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2))
    assert(back.length == 6)
    assert(back.take(5).toSeq == Seq((1L, 0.0, 1.5, 10L), (1L, 0.5, 2.5, 20L),
      (2L, 0.0, 3.5, 30L), (2L, 0.5, -4.25, 40L), (3L, 0.0, 5.0, 50L)))
    assert(back.last._3.isNaN && back.last._4 == 60L)
  }

  test("ZarrSink v3 sharded gzip: PARTIAL edge inner chunk pads with fill " +
       "and round-trips exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarrsink3sp").toString
    // 5 dim-0 rows, 2-row inner chunks, 64 B/shard => c0=4: shard 0 =
    // inners (0-1),(2-3); shard 1 = inner (4-5) PARTIALLY out of
    // bounds (row 5 is fill padding) + second inner fully OOB
    val df = (0 until 5).map(i => (i.toLong, i * 1.5)).toDF("i", "v")
    ZarrSink.writeDataset(df, dir, Seq("i"), chunkTargetBytes = 64L,
      compress = true, zarrFormat = 3, shardInnerRows = 2)
    val meta = ZarrSource.readMeta(spark, s"$dir/v")
    assert(meta.sharding.exists(_.innerChunks == Seq(2)), meta.toString)
    val back = ZarrSource.readArray(spark, s"$dir/v", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(back.size == 5, back.toString)
    for (i <- 0 until 5) assert(back(i.toLong) == i * 1.5, s"i=$i")
  }

  test("ZarrSink zlib store round-trips through ZarrSource.readDataset") {
    val dir = Files.createTempDirectory("zarrsinkz").toString
    ZarrSink.writeDataset(canonical, dir, Seq("a", "t"), compress = true)
    val back = ZarrSource.readDataset(spark, dir)
      .select("a", "t", "x", "n").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2))
    assert(back.length == 6)
    val want = Seq((1L, 0.0, 1.5, 10L), (1L, 0.5, 2.5, 20L),
      (2L, 0.0, 3.5, 30L), (2L, 0.5, -4.25, 40L),
      (3L, 0.0, 5.0, 50L))
    assert(back.take(5).toSeq == want)
    val miss = back.last
    assert(miss._1 == 3L && miss._2 == 0.5 && miss._3.isNaN && miss._4 == 60L)
  }

  test("ZarrSink splits dim-0 slabs into per-chunk files at small chunk targets") {
    val dir = Files.createTempDirectory("zarrsinkc").toString
    // 16 bytes/chunk => 1 row of the (3,2) f8 grid per chunk => 3 chunks
    ZarrSink.writeDataset(canonical.select("a", "t", "x"), dir, Seq("a", "t"),
      chunkTargetBytes = 16L, compress = false)
    val chunkFiles = filesUnder(dir).filter(_.matches("x/\\d+\\.\\d+"))
    assert(chunkFiles == Seq("x/0.0", "x/1.0", "x/2.0"), chunkFiles.toString)
    val back = ZarrSource.readArray(spark, s"$dir/x", "x").collect()
    assert(back.length == 6) // dense read across the 3 slab chunks
  }

  test("ZarrSink writes EVERY chunk: a float slab with no rows still gets a " +
       "chunk file and round-trips as NaN") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarrsinkm").toString
    // x is null for BOTH rows of slab a=2 (coords for the slab come
    // from other rows), 1 row per chunk => chunk 1 would previously be
    // skipped entirely and the cells silently lost on read-back
    val df = Seq[(Long, Long, Option[Double])](
      (1L, 0L, Some(1.0)), (1L, 1L, Some(2.0)),
      (2L, 0L, None), (2L, 1L, None),
      (3L, 0L, Some(5.0)), (3L, 1L, Some(6.0)))
      .toDF("a", "t", "x")
    ZarrSink.writeDataset(df, dir, Seq("a", "t"),
      chunkTargetBytes = 16L, compress = false)
    val chunkFiles = filesUnder(dir).filter(_.matches("x/\\d+\\.\\d+"))
    assert(chunkFiles == Seq("x/0.0", "x/1.0", "x/2.0"), chunkFiles.toString)
    val back = ZarrSource.readArray(spark, s"$dir/x", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(back.size == 6)
    assert(back((0L, 0L)) == 1.0 && back((2L, 1L)) == 6.0)
    assert(back((1L, 0L)).isNaN && back((1L, 1L)).isNaN)
  }

  test("ZarrSink: a grid cell written twice fails loudly as a conflict") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarrsinkd").toString
    val dup = Seq((1L, 0L, 1.0), (1L, 0L, 2.0), (2L, 0L, 3.0))
      .toDF("a", "t", "x")
    val e = intercept[org.apache.spark.SparkException] {
      ZarrSink.writeDataset(dup, dir, Seq("a", "t"), compress = false)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("written twice")))
  }

  test("sinks reject a null dim coordinate loudly, even when the value cell " +
       "is also null") {
    import spark.implicits._
    val bad = Seq[(Option[Long], Long, Option[Double])](
      (Some(1L), 0L, Some(1.0)), (None, 1L, None))
      .toDF("a", "t", "x")
    val e1 = intercept[Exception] {
      ZarrSink.writeDataset(bad, Files.createTempDirectory("zn").toString,
        Seq("a", "t"), compress = false)
    }
    assert(e1.getMessage.contains("null coordinate"))
    val e2 = intercept[Exception] {
      NetCDF3Sink.writeDataset(bad,
        Files.createTempFile("nn", ".nc").toString, Seq("a", "t"))
    }
    assert(e2.getMessage.contains("null coordinate"))
  }

  test("sinks refuse column names their formats cannot represent") {
    import spark.implicits._
    val df = Seq((1L, 2.0)).toDF("a", "x/y")
    val e = intercept[IllegalArgumentException] {
      ZarrSink.writeDataset(df, Files.createTempDirectory("zb").toString,
        Seq("a"))
    }
    assert(e.getMessage.contains("'/'"), e.getMessage)
  }

  test("ZarrSink: integer variable with a missing cell fails loudly") {
    val dir = Files.createTempDirectory("zarrsinkf").toString
    val bad = canonical.filter("n != 60") // drop one (a,t) row entirely
      .select("a", "t", "n")
    val e = intercept[org.apache.spark.SparkException] {
      ZarrSink.writeDataset(bad, dir, Seq("a", "t"), compress = false)
    }
    assert(e.getMessage.contains("cannot encode missing cells") ||
      Option(e.getCause).exists(
        _.getMessage.contains("cannot encode missing cells")))
  }

  test("NetCDF3Sink CDF-1 and CDF-5 output is byte-identical to the independent python writer") {
    for ((version, goldenFile) <- Seq(1 -> "golden_cdf1.nc", 5 -> "golden_cdf5.nc")) {
      val f = Files.createTempFile("ncsink", ".nc").toString
      NetCDF3Sink.writeDataset(canonical, f, Seq("a", "t"), version = version)
      val g = Files.readAllBytes(Paths.get(s"$golden/$goldenFile"))
      val o = Files.readAllBytes(Paths.get(f))
      assert(java.util.Arrays.equals(g, o),
        s"CDF-$version differs: golden ${g.length}B vs written ${o.length}B")
    }
  }

  test("NetCDF3Sink output round-trips through NetCDF3Source.readDataset") {
    for (version <- Seq(1, 5)) {
      val f = Files.createTempFile("ncsinkrt", ".nc").toString
      NetCDF3Sink.writeDataset(canonical, f, Seq("a", "t"), version = version)
      val back = NetCDF3Source.readDataset(spark, f)
        .select("a", "t", "x", "n").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
        .sortBy(r => (r._1, r._2))
      assert(back.length == 6, s"CDF-$version")
      assert(back.take(5).toSeq == Seq((1L, 0.0, 1.5, 10L), (1L, 0.5, 2.5, 20L),
        (2L, 0.0, 3.5, 30L), (2L, 0.5, -4.25, 40L), (3L, 0.0, 5.0, 50L)),
        s"CDF-$version")
      assert(back.last._3.isNaN && back.last._4 == 60L, s"CDF-$version")
    }
  }

  test("NetCDF3Sink: CDF-1 rejects 64-bit values; CDF-5 takes them") {
    import spark.implicits._
    val big = Seq((1L, 5_000_000_000L), (2L, 6_000_000_000L)).toDF("a", "big")
    val f1 = Files.createTempFile("ncbig", ".nc").toString
    val e = intercept[Exception] {
      NetCDF3Sink.writeDataset(big, f1, Seq("a"), version = 1)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("NC_INT range")))
    NetCDF3Sink.writeDataset(big, f1, Seq("a"), version = 5)
    val back = NetCDF3Source.readArray(spark, f1, "big", "big").collect()
      .map(_.getLong(1)).sorted
    assert(back.toSeq == Seq(5_000_000_000L, 6_000_000_000L))
  }

  test("zarr round-trip: string DATA variable (<U, odd width, " +
       "supplementary-plane char); netCDF rejects it loudly") {
    import spark.implicits._
    val df = Seq(
      (1L, "abc", 1.0), (2L, "𝄞", 2.0), (3L, "xy", 3.0)
    ).toDF("a", "tag", "v")
    val dir = Files.createTempDirectory("zstrv").toString + "/st.zarr"
    ZarrSink.writeDataset(df, dir, Seq("a"))
    // width = longest value in CODEPOINTS (abc = 3, odd) — <U3
    val metaTxt = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "tag", ".zarray")), "UTF-8")
    assert(metaTxt.contains("\"<U3\""), metaTxt)
    val back = ZarrSource.readDataset(spark, dir).collect()
      .map(r => r.getLong(r.fieldIndex("a")) ->
        r.getString(r.fieldIndex("tag"))).toMap
    assert(back == Map(1L -> "abc", 2L -> "𝄞", 3L -> "xy"))
    // a NULL string cell fails loudly (strings, like ints, are total)
    val bad = Seq((1L, Some("x")), (2L, None)).toDF("a", "tag")
    intercept[Exception] {
      ZarrSink.writeDataset(bad,
        Files.createTempDirectory("zstrn").toString + "/st.zarr", Seq("a"))
    }
    val e2 = intercept[IllegalArgumentException] {
      NetCDF3Sink.writeDataset(df,
        Files.createTempFile("n", ".nc").toString, Seq("a"))
    }
    assert(e2.getMessage.contains("string DATA variables not supported"))
  }

  test("zarr round-trip: string axis + bool variable (v2)") {
    import spark.implicits._
    // non-ASCII + multi-codepoint value exercises the UCS-4 encoding
    val df = Seq(
      ("alpha", 1L, true, 1.5), ("alpha", 2L, false, 2.5),
      ("béta𝄞", 1L, false, -0.5), ("béta𝄞", 2L, true, Double.NaN),
      ("c", 1L, true, 0.0), ("c", 2L, true, 7.25)
    ).toDF("s", "k", "flag", "x")
    val dir = Files.createTempDirectory("zstr").toString + "/st.zarr"
    ZarrSink.writeDataset(df, dir, Seq("s", "k"))
    val back = ZarrSource.readDataset(spark, dir)
      .select("s", "k", "flag", "x").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2))
    val want = Seq(
      ("alpha", 1L, true, 1.5), ("alpha", 2L, false, 2.5),
      ("béta𝄞", 1L, false, -0.5), ("béta𝄞", 2L, true, Double.NaN),
      ("c", 1L, true, 0.0), ("c", 2L, true, 7.25))
    assert(back.length == want.length)
    back.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3)
      assert(g._4 == w._4 || (g._4.isNaN && w._4.isNaN))
    }
    // the string axis really is numpy <U on disk
    val metaTxt = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "s", ".zarray")), "UTF-8")
    assert(metaTxt.contains("\"<U"))
  }

  test("zarr v3 rejects string axes; bool vars write as v3 bool") {
    import spark.implicits._
    val sdf = Seq(("a", 1.0)).toDF("s", "x")
    val e = intercept[IllegalArgumentException] {
      ZarrSink.writeDataset(sdf,
        Files.createTempDirectory("z3s").toString, Seq("s"), zarrFormat = 3)
    }
    assert(e.getMessage.contains("zarrFormat = 2"))
    val bdf = Seq((1L, true), (2L, false), (3L, true)).toDF("k", "flag")
    val dir = Files.createTempDirectory("z3b").toString + "/b.zarr"
    ZarrSink.writeDataset(bdf, dir, Seq("k"), zarrFormat = 3)
    val metaTxt = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "flag", "zarr.json")), "UTF-8")
    assert(metaTxt.contains("\"data_type\": \"bool\""))
    val back = ZarrSource.readDataset(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("k")),
        r.getBoolean(r.fieldIndex("flag")))).sortBy(_._1)
    assert(back.toSeq == Seq((1L, true), (2L, false), (3L, true)))
  }

  test("CDF-2 (64-bit-offset) output round-trips and differs from " +
       "CDF-1 only in the version byte and 8-byte begins") {
    import spark.implicits._
    val df = Seq((1L, 1.5, 10L), (2L, 2.5, 20L), (3L, 3.5, 30L))
      .toDF("a", "x", "n")
    val f1 = Files.createTempFile("cdf1", ".nc").toString
    val f2 = Files.createTempFile("cdf2", ".nc").toString
    NetCDF3Sink.writeDataset(df, f1, Seq("a"), version = 1)
    NetCDF3Sink.writeDataset(df, f2, Seq("a"), version = 2)
    val b2 = Files.readAllBytes(Paths.get(f2))
    assert(b2(3) == 2, "version byte")
    // 3 vars with 8-byte begins instead of 4 -> header grows by 12
    assert(b2.length == Files.readAllBytes(Paths.get(f1)).length + 12)
    val back = NetCDF3Source.readDataset(spark, f2)
      .select("a", "x", "n").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(back.toSeq == Seq((1L, 1.5, 10L), (2L, 2.5, 20L), (3L, 3.5, 30L)))
    // CDF-2 keeps CDF-1's NC_INT: 64-bit values still refuse loudly
    val big = Seq((1L, 5_000_000_000L)).toDF("a", "big")
    val e = intercept[Exception] {
      NetCDF3Sink.writeDataset(big,
        Files.createTempFile("cdf2big", ".nc").toString, Seq("a"),
        version = 2)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("NC_INT range")))
  }

  test("netCDF data section costs ONE job regardless of variable count") {
    import spark.implicits._
    val one = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("a", "x")
    val four = Seq((1L, 1.0, 10L, -1.0, 100L), (2L, 2.0, 20L, -2.0, 200L),
      (3L, 3.0, 30L, -3.0, 300L)).toDF("a", "x", "n", "y", "m")
    def countJobs(body: => Unit): Int = {
      // job ids are monotonic, so counting ids above the pre-body max
      // is exact even when the status tracker rotates old entries out
      // (a length delta goes negative mid-suite for that reason)
      val t = spark.sparkContext.statusTracker
      val maxBefore = t.getJobIdsForGroup(null).foldLeft(-1)(math.max)
      body
      t.getJobIdsForGroup(null).count(_ > maxBefore)
    }
    val f1 = Files.createTempFile("nc1v", ".nc").toString
    val f4 = Files.createTempFile("nc4v", ".nc").toString
    val j1 = countJobs(NetCDF3Sink.writeDataset(one, f1, Seq("a")))
    val j4 = countJobs(NetCDF3Sink.writeDataset(four, f4, Seq("a")))
    // same job count for 1 var and 4 vars: the data section is one
    // sorted pass, not a job per variable
    assert(j4 == j1, s"jobs: 1-var $j1 vs 4-var $j4")
    val back = NetCDF3Source.readDataset(spark, f4)
      .select("a", "x", "n", "y", "m").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).sortBy(_._1)
    assert(back.toSeq == Seq((1L, 1.0, 10L, -1.0, 100L),
      (2L, 2.0, 20L, -2.0, 200L), (3L, 3.0, 30L, -3.0, 300L)))
  }

  test("sinks hold the write lease: a second writer throws " +
       "ConcurrentWriteException; breakLease clears a stale one") {
    import spark.implicits._
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("a", "x")
    val zdir = Files.createTempDirectory("zlease").toString + "/st.zarr"
    // simulate a concurrent holder
    Files.createDirectories(Paths.get(zdir).getParent)
    Files.writeString(Paths.get(zdir + ".__lock"), "pid=999 op=zarr-write")
    val e1 = intercept[graft.store.ConcurrentWriteException] {
      ZarrSink.writeDataset(df, zdir, Seq("a"))
    }
    assert(e1.getMessage.contains("another process"))
    ZarrSink.breakLease(spark, zdir)
    ZarrSink.writeDataset(df, zdir, Seq("a")) // now succeeds
    assert(!Files.exists(Paths.get(zdir + ".__lock"))) // released
    val nf = Files.createTempDirectory("nclease").toString + "/f.nc"
    Files.writeString(Paths.get(nf + ".__lock"), "pid=999 op=netcdf-write")
    val e2 = intercept[graft.store.ConcurrentWriteException] {
      NetCDF3Sink.writeDataset(df, nf, Seq("a"))
    }
    assert(e2.getMessage.contains("another process"))
    NetCDF3Sink.breakLease(spark, nf)
    NetCDF3Sink.writeDataset(df, nf, Seq("a"))
    assert(!Files.exists(Paths.get(nf + ".__lock")))
  }

  test("a failed write leaves the OLD store intact, never a mix") {
    import spark.implicits._
    val v1 = Seq((1L, 10L), (2L, 20L)).toDF("a", "n")
    // int var with a missing cell: the write job itself fails mid-way
    val bad = Seq((1L, Some(1L)), (2L, None), (3L, Some(3L)))
      .toDF("a", "n")
    val zdir = Files.createTempDirectory("zatomic").toString + "/st.zarr"
    ZarrSink.writeDataset(v1, zdir, Seq("a"))
    intercept[Exception] { ZarrSink.writeDataset(bad, zdir, Seq("a")) }
    val back = ZarrSource.readDataset(spark, zdir).collect()
      .map(r => r.getLong(r.fieldIndex("a")) ->
        r.getLong(r.fieldIndex("n"))).toMap
    assert(back == Map(1L -> 10L, 2L -> 20L)) // v1, untouched
    assert(!Files.exists(Paths.get(zdir + ".__lock"))) // lease released
    val nf = Files.createTempDirectory("natomic").toString + "/f.nc"
    NetCDF3Sink.writeDataset(v1, nf, Seq("a"))
    intercept[Exception] { NetCDF3Sink.writeDataset(bad, nf, Seq("a")) }
    val nback = NetCDF3Source.readDataset(spark, nf).collect()
      .map(r => r.getLong(r.fieldIndex("a")) ->
        r.getLong(r.fieldIndex("n"))).toMap
    assert(nback == Map(1L -> 10L, 2L -> 20L))
    assert(!Files.exists(Paths.get(nf + ".__lock")))
  }

  /** Canonical DTYPE dataset (round 10) matching the generator header
    * in scripts/gen_write_golden_dtypes.py: string axis s, i8 axis k,
    * f8 x (one missing cell), bool f (total), complex zc (one missing
    * cell — zarr only). */
  private def dtypeCanonical = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, when}
    Seq[(String, Long, Option[Double], Boolean, Option[(Double, Double)], String)](
      ("A", 1L, Some(1.25), false, Some((0.1, 0.0)), "abc"),
      ("A", 2L, Some(2.25), true, Some((0.2, 0.0)), "d"),
      ("BB", 1L, Some(11.25), true, Some((1.1, 1.0)), "ef"),
      ("BB", 2L, Some(12.25), false, Some((1.2, 2.0)), "ghi"),
      ("C", 1L, Some(21.25), false, None, "j"),
      ("C", 2L, None, true, Some((2.2, 4.0)), "kl"))
      .toDF("s", "k", "x", "f", "zv", "tg")
      .select(col("s"), col("k"), col("x"), col("f"),
        when(col("zv").isNotNull, graft.functions.ComplexFns.complex(
          col("zv._1"), col("zv._2"))).as("zc"), col("tg"))
  }

  test("DTYPE store (string axis + bool + complex + string data var) is " +
       "byte-identical to the independent python writer — zarr v2") {
    val dir = Files.createTempDirectory("zarrdtw").toString + "/st"
    ZarrSink.writeDataset(dtypeCanonical, dir, Seq("s", "k"),
      compress = false)
    assertTreesEqual(s"$golden/zarr_dtypes_w", dir)
  }

  test("VLEN string store (|O + vlen-utf8, xarray's default encoding) is " +
       "byte-identical to the independent python writer and round-trips") {
    val dir = Files.createTempDirectory("zarrvlw").toString + "/st"
    ZarrSink.writeDataset(dtypeCanonical, dir, Seq("s", "k"),
      compress = false, stringEncoding = "vlen")
    assertTreesEqual(s"$golden/zarr_vlen_w", dir)
    // round-trip through our own vlen READ path: same rows back
    val back = ZarrSource.readDataset(spark, dir)
      .select("s", "k", "tg").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(back == Map(("A", 1L) -> "abc", ("A", 2L) -> "d",
      ("BB", 1L) -> "ef", ("BB", 2L) -> "ghi",
      ("C", 1L) -> "j", ("C", 2L) -> "kl"))
    // and the COMPRESSED flavor round-trips too (zlib-wrapped vlen)
    val dirC = Files.createTempDirectory("zarrvlwc").toString + "/st"
    ZarrSink.writeDataset(dtypeCanonical, dirC, Seq("s", "k"),
      compress = true, stringEncoding = "vlen")
    val backC = ZarrSource.readDataset(spark, dirC)
      .select("s", "tg").collect().map(r => r.getString(1)).sorted
    assert(backC.toSeq == Seq("abc", "d", "ef", "ghi", "j", "kl"))
  }

  test("DTYPE netCDF (NC_CHAR axis + NC_BYTE bool) is byte-identical to " +
       "the independent python writer — CDF-1") {
    val f = Files.createTempDirectory("ncdtw").toString + "/st.nc"
    NetCDF3Sink.writeDataset(dtypeCanonical.drop("zc").drop("tg"), f,
      Seq("s", "k"))
    val got = Files.readAllBytes(Paths.get(f))
    val want = Files.readAllBytes(Paths.get(s"$golden/golden_dtypes.nc"))
    assert(java.util.Arrays.equals(got, want),
      s"differs: golden ${want.length}B vs written ${got.length}B")
    // and the independent bytes read back through our own reader
    val back = NetCDF3Source.readDataset(spark,
      s"$golden/golden_dtypes.nc").select("s", "k", "x", "f").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(back.head == (("A", 1L, 1.25, 0L)))
    assert(back.last._3.isNaN && back.last._4 == 1L) // (C,2) missing x
  }

  test("zarr round-trip: complex128 variable (struct -> <c16 -> struct), " +
       "missing cells fill NaN+NaN; netCDF rejects complex loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, when}
    val df = Seq(
      (1L, Some((1.5, -2.5))), (2L, Some((0.0, 3.25))), (3L, None)
    ).toDF("a", "zv")
      .select(col("a"), when(col("zv").isNotNull,
        graft.functions.ComplexFns.complex(col("zv._1"), col("zv._2")))
        .as("zc"))
    val dir = Files.createTempDirectory("zc16").toString + "/st.zarr"
    ZarrSink.writeDataset(df, dir, Seq("a"))
    val metaTxt = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "zc", ".zarray")), "UTF-8")
    assert(metaTxt.contains("\"<c16\""))
    val back = ZarrSource.readDataset(spark, dir).collect()
      .map { r =>
        val z = r.getStruct(r.fieldIndex("zc"))
        r.getLong(r.fieldIndex("a")) -> ((z.getDouble(0), z.getDouble(1)))
      }.toMap
    assert(back(1L) == ((1.5, -2.5)) && back(2L) == ((0.0, 3.25)))
    assert(back(3L)._1.isNaN && back(3L)._2.isNaN) // missing cell -> NaN fill
    // v3 writes data_type complex128
    val dir3 = Files.createTempDirectory("zc16v3").toString + "/st.zarr"
    ZarrSink.writeDataset(df.filter(col("zc").isNotNull), dir3, Seq("a"),
      zarrFormat = 3)
    val m3 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir3, "zc", "zarr.json")), "UTF-8")
    assert(m3.contains("\"data_type\": \"complex128\""))
    val e = intercept[IllegalArgumentException] {
      NetCDF3Sink.writeDataset(df,
        Files.createTempFile("ncc", ".nc").toString, Seq("a"))
    }
    assert(e.getMessage.contains("no complex type"))
  }

  test("netCDF round-trip: string axis (NC_CHAR) + bool variable (NC_BYTE)") {
    import spark.implicits._
    val df = Seq(
      ("red", 1L, true, 1.0), ("red", 2L, false, 2.0),
      ("green", 1L, false, 3.0), ("green", 2L, true, 4.0)
    ).toDF("color", "k", "flag", "x")
    val f = Files.createTempFile("ncstr", ".nc").toString
    NetCDF3Sink.writeDataset(df, f, Seq("color", "k"))
    // bool narrows to NC_BYTE 0/1 (classic has no boolean): LONG on read
    val back = NetCDF3Source.readDataset(spark, f)
      .select("color", "k", "flag", "x").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(back.toSeq == Seq(
      ("green", 1L, 0L, 3.0), ("green", 2L, 1L, 4.0),
      ("red", 1L, 1L, 1.0), ("red", 2L, 0L, 2.0)))
  }
}
