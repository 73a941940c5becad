package graft

import graft.sources.ZarrSource
import org.apache.spark.sql.functions._

/** The fixture store under src/test/resources/zarr_store was written
  * by an INDEPENDENT implementation (python stdlib: json + struct +
  * zlib/gzip, no zarr library — see the generator recipe in
  * FIXTURES.md), so these are cross-implementation format tests, not
  * a round-trip of our own writer. Layout: dims x(5) i8-zlib coords,
  * y(4) f8-raw coords; vars v(x,y) f8-zlib, n(x,y) i8-gzip, w(y)
  * f4-raw; 3-element chunks exercise edge-chunk zero padding in every
  * array.
  */
class ZarrSpec extends SparkSpec {

  // the fixture is referenced at its source location: sbt's resource
  // copy drops dot-files, and zarr metadata lives in .zarray/.zattrs
  private val store = "src/test/resources/zarr_store"

  test("readArray: f8 zlib chunks, C-order indices, edge padding dropped") {
    val v = ZarrSource.readArray(spark, s"$store/v", "v")
    assert(v.columns.toSeq == Seq("x", "y", "v"))
    val rows = v.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows.size == 20) // 5x4 values, padding from 3x3 chunks dropped
    for (xi <- 0L until 5L; yi <- 0L until 4L)
      assert(rows((xi, yi)) == xi * 10 + yi + 0.25, s"($xi,$yi)")
  }

  test("readArray: i8 gzip and f4 raw dtypes decode exactly") {
    val n = ZarrSource.readArray(spark, s"$store/n", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (xi <- 0L until 5L; yi <- 0L until 4L)
      assert(n((xi, yi)) == xi * 100 + yi)
    val w = ZarrSource.readArray(spark, s"$store/w", "w").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w == Map(0L -> 1.0, 1L -> 2.0, 2L -> 3.0, 3L -> 4.0))
  }

  test("readDataset: outer-aligned long form with coordinate values") {
    val ds = ZarrSource.readDataset(spark, store)
    assert(ds.columns.toSet == Set("x", "y", "v", "n", "w"))
    val rows = ds.collect().map { r =>
      (r.getAs[Long]("x"), r.getAs[Double]("y")) ->
        ((r.getAs[Double]("v"), r.getAs[Long]("n"), r.getAs[Double]("w")))
    }.toMap
    assert(rows.size == 20)
    // coords replaced indices: x in {10..50}, y in {0.5..3.5}
    for (xi <- 0 until 5; yi <- 0 until 4) {
      val key = ((xi + 1) * 10L, yi + 0.5)
      val (v, n, w) = rows(key)
      assert(v == xi * 10 + yi + 0.25 && n == xi * 100 + yi && w == yi + 1.0,
        s"at $key")
    }
  }

  test("readDataset feeds the harvest store: zarr -> ParquetStore round-trip") {
    val ds = ZarrSource.readDataset(spark, store)
    val dir = java.nio.file.Files.createTempDirectory("graft-zarr").toString
    val st = new graft.store.ParquetStore(spark, s"$dir/store", Seq("x", "y"))
    st.mergeIn(ds)
    assert(st.load().count() == 20)
    // a second migration merge of the same store must be a no-op
    st.mergeIn(ds) // NoConflicts: identical values coalesce silently
    assert(st.load().count() == 20)
    assert(st.load().agg(sum("n")).head().getLong(0) == (0 until 5).map(_ * 100L * 4).sum + (0 until 4).sum * 5)
  }

  // ---- blosc-framed stores (numcodecs' DEFAULT to_zarr encoding).
  // Fixtures written by the independent stdlib generator: lz4 chunks
  // with split byte-plane streams (constant planes RLE-compressed,
  // varying plane stored raw), a leftover block, blosc-zlib chunks,
  // and memcpy chunks — all byte-shuffled where blosc would be.

  private val bloscStore = "src/test/resources/zarr_blosc"

  test("blosc-lz4: split byte-plane streams, leftover block, edge chunk") {
    val a = ZarrSource.readArray(spark, s"$bloscStore/big", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.size == 520)
    for (k <- 0 until 520) assert(a(k.toLong) == k * 0.5, s"k=$k")
  }

  test("blosc-zlib: unsplit shuffled blocks decode exactly") {
    val a = ZarrSource.readArray(spark, s"$bloscStore/zl", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.size == 20)
    for (k <- 0 until 20) assert(a(k.toLong) == k.toLong * k, s"k=$k")
  }

  test("blosc memcpy chunks pass through raw") {
    val a = ZarrSource.readArray(spark, s"$bloscStore/mc", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.size == 10)
    for (k <- 0 until 10) assert(a(k.toLong) == k + 0.25, s"k=$k")
  }

  test("blosc-zstd streams decode (zstd-jni, container layout as fixtures)") {
    // container layout is pinned by the python-generated fixtures; the
    // zstd stream itself is produced here because no stdlib writer for
    // zstd exists in this container. zlib codec id 4, nsplits=1.
    val n = 40
    val raw = new Array[Byte](n * 8)
    val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (k <- 0 until n) bb.putLong(k * 8, k * 3L)
    // shuffle per block (one block: blocksize = nbytes)
    val shuffled = new Array[Byte](raw.length)
    val rows = raw.length / 8
    for (i <- 0 until rows; b <- 0 until 8) shuffled(b * rows + i) = raw(i * 8 + b)
    val comp = com.github.luben.zstd.Zstd.compress(shuffled, 3)
    val out = java.io.File.createTempFile("graft-zstd", "")
    val dir = java.nio.file.Files.createTempDirectory("graft-zstd-arr")
    val arr = dir.resolve("q"); java.nio.file.Files.createDirectory(arr)
    java.nio.file.Files.write(arr.resolve(".zarray"),
      s"""{"zarr_format":2,"order":"C","filters":null,"dtype":"<i8",
          "shape":[$n],"chunks":[$n],
          "compressor":{"id":"blosc","cname":"zstd","clevel":3,"shuffle":1}}"""
        .getBytes)
    val chunk = java.nio.ByteBuffer.allocate(16 + 4 + 4 + comp.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    chunk.put(2.toByte).put(1.toByte)
      .put((0x01 | (4 << 5)).toByte).put(8.toByte) // shuffle + zstd
      .putInt(raw.length).putInt(raw.length).putInt(16 + 4 + 4 + comp.length)
      .putInt(16 + 4)           // bstarts[0]
      .putInt(comp.length)      // stream cbytes
    chunk.put(comp)
    java.nio.file.Files.write(arr.resolve("0"), chunk.array())
    val got = ZarrSource.readArray(spark, arr.toString, "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (k <- 0 until n) assert(got(k.toLong) == k * 3L)
    out.delete()
  }

  // ---- round-6 fixtures: the remaining c-blosc codecs/filters.
  // Written by the stdlib generator (spec-based blosclz/snappy
  // encoders, round-trip checked in python before commit); the snappy
  // chunks are decoded here by xerial snappy-java — an implementation
  // we did not write — giving a genuine two-implementation check.

  test("blosclz: split byte-plane streams, RLE/short matches, leftover block") {
    val a = ZarrSource.readArray(spark, s"$bloscStore/blz", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.size == 300)
    for (k <- 0 until 300) assert(a(k.toLong) == ((k * 7) % 500) - 250, s"k=$k")
  }

  test("blosclz: far matches (>8191B distance, 16-bit escape) decode") {
    val per = (0 until 2500).map(i => ((i.toLong * i * 7 + i) % 251).toInt)
    val a = ZarrSource.readArray(spark, s"$bloscStore/bfar", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.size == 20000)
    for (k <- 0 until 20000) assert(a(k.toLong) == per(k % 2500), s"k=$k")
  }

  test("blosc-snappy: xerial decodes the spec-written raw streams") {
    val a = ZarrSource.readArray(spark, s"$bloscStore/bsn", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.size == 200)
    for (k <- 0 until 200) assert(a(k.toLong) == (k % 17) * 0.5 - 4.0, s"k=$k")
  }

  test("blosc bit-shuffle: 8-aligned prefix planes + verbatim tail") {
    val a = ZarrSource.readArray(spark, s"$bloscStore/bbt", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.size == 50) // chunks of 20 i8: n8=16 elems, 4-elem tail
    for (k <- 0 until 50) assert(a(k.toLong) == k.toLong * k * 3 - 40L * k, s"k=$k")
  }

  test("blosc bit-shuffle + blosclz split streams compose") {
    val a = ZarrSource.readArray(spark, s"$bloscStore/bbs", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.size == 256)
    for (k <- 0 until 256) assert(a(k.toLong) == ((k * 3) % 97) - 48, s"k=$k")
  }

  // ---- Zarr v3 (zarr.json metadata; what zarr-python 3 writes by
  // default). Fixture store exercises all three chunk-key encodings
  // (default "c/0/1", default "c.0.1", v2-compat "0"), gzip/blosc/raw
  // byte streams, edge-chunk padding, and dimension_names.

  private val v3Store = "src/test/resources/zarr_v3_store"

  test("v3 readArray: gzip + nested c/i/j chunk keys, edge chunks dropped") {
    val a = ZarrSource.readArray(spark, s"$v3Store/vv", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(a.size == 20)
    for (xi <- 0 until 5; yi <- 0 until 4)
      assert(a((xi.toLong, yi.toLong)) == xi * 10 + yi + 0.25)
  }

  test("v3 readArray: blosc-lz4 int32 + flat c.i.j keys") {
    val a = ZarrSource.readArray(spark, s"$v3Store/nn", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (xi <- 0 until 5; yi <- 0 until 4)
      assert(a((xi.toLong, yi.toLong)) == xi * 100 + yi)
  }

  test("v3 readArray: raw bytes codec + v2-compat chunk keys") {
    val a = ZarrSource.readArray(spark, s"$v3Store/x", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == Map(0L -> 10L, 1L -> 20L, 2L -> 30L, 3L -> 40L, 4L -> 50L))
  }

  test("v3 readDataset: outer-aligned with coord values from dimension_names") {
    val ds = ZarrSource.readDataset(spark, v3Store)
    assert(ds.columns.toSet == Set("x", "y", "vv", "nn"))
    val rows = ds.collect().map { r =>
      (r.getAs[Long]("x"), r.getAs[Double]("y")) ->
        ((r.getAs[Double]("vv"), r.getAs[Long]("nn")))
    }.toMap
    assert(rows.size == 20)
    for (xi <- 0 until 5; yi <- 0 until 4) {
      val (vv, nn) = rows(((xi + 1) * 10L, yi + 0.5))
      assert(vv == xi * 10 + yi + 0.25 && nn == xi * 100 + yi, s"($xi,$yi)")
    }
  }

  // ---- v3 blosc parity with v2 (round 7): the chunk payloads are the
  // SAME independently-generated container bytes as the v2 fixtures
  // (zarr_blosc/bbs, zarr_blosc/bsn — a v3 [bytes, blosc] codec chain
  // produces byte-identical chunk files to a v2 blosc compressor), so
  // only the metadata parse is new; the decode path is shared.

  private val v3Blosc = "src/test/resources/zarr_v3_blosc"

  test("v3 blosc: blosclz + bit-shuffle reads like its v2 twin") {
    val a = ZarrSource.readArray(spark, s"$v3Blosc/bbs", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.size == 256)
    for (k <- 0 until 256) assert(a(k.toLong) == ((k * 3) % 97) - 48, s"k=$k")
  }

  test("v3 blosc: snappy + byte-shuffle reads like its v2 twin") {
    val a = ZarrSource.readArray(spark, s"$v3Blosc/bsn", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.size == 200)
    for (k <- 0 until 200) assert(a(k.toLong) == (k % 17) * 0.5 - 4.0, s"k=$k")
  }

  test("v3 blosc metadata: every numcodecs config accepted, unknowns refused") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-v3blosc")
    val arr = tmp.resolve("a"); java.nio.file.Files.createDirectory(arr)
    def meta(cname: String, shuffle: String): String =
      s"""{"zarr_format":3,"node_type":"array","shape":[4],
          "data_type":"int32",
          "chunk_grid":{"name":"regular","configuration":{"chunk_shape":[2]}},
          "chunk_key_encoding":{"name":"default"},
          "fill_value":0,
          "codecs":[{"name":"bytes","configuration":{"endian":"little"}},
            {"name":"blosc","configuration":{"cname":"$cname",
              "clevel":5,"shuffle":"$shuffle","typesize":4}}]}"""
    for (cname <- Seq("blosclz", "lz4", "lz4hc", "snappy", "zlib", "zstd");
         shuffle <- Seq("noshuffle", "shuffle", "bitshuffle")) {
      java.nio.file.Files.write(arr.resolve("zarr.json"),
        meta(cname, shuffle).getBytes)
      ZarrSource.readMeta(spark, arr.toString) // must not throw
    }
    java.nio.file.Files.write(arr.resolve("zarr.json"),
      meta("madeup", "shuffle").getBytes)
    val e1 = intercept[IllegalArgumentException](
      ZarrSource.readMeta(spark, arr.toString))
    assert(e1.getMessage.contains("madeup"), e1.getMessage)
    java.nio.file.Files.write(arr.resolve("zarr.json"),
      meta("lz4", "zigzag").getBytes)
    val e2 = intercept[IllegalArgumentException](
      ZarrSource.readMeta(spark, arr.toString))
    assert(e2.getMessage.contains("zigzag"), e2.getMessage)
  }

  test("v3 refusals: transpose and NESTED sharding fail naming the feature") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-badv3")
    val arr = tmp.resolve("a"); java.nio.file.Files.createDirectory(arr)
    // transpose is still out of scope
    java.nio.file.Files.write(arr.resolve("zarr.json"),
      """{"zarr_format":3,"node_type":"array","shape":[4],
          "data_type":"float64",
          "chunk_grid":{"name":"regular","configuration":{"chunk_shape":[2]}},
          "chunk_key_encoding":{"name":"default"},
          "fill_value":0,
          "codecs":[{"name":"transpose","configuration":{"order":[0]}},
                    {"name":"bytes","configuration":{"endian":"little"}}]}"""
        .getBytes)
    val e = intercept[IllegalArgumentException](
      ZarrSource.readMeta(spark, arr.toString))
    assert(e.getMessage.contains("transpose") &&
      e.getMessage.contains("migrate_xyzpy.py"), e.getMessage)
    // sharding_indexed nested INSIDE a shard's inner chain is refused
    // (one level per spec reading; nested shards are not generated by
    // zarr-python and would silently double-decode here)
    java.nio.file.Files.write(arr.resolve("zarr.json"),
      """{"zarr_format":3,"node_type":"array","shape":[4],
          "data_type":"float64",
          "chunk_grid":{"name":"regular","configuration":{"chunk_shape":[4]}},
          "chunk_key_encoding":{"name":"default"},
          "fill_value":0,
          "codecs":[{"name":"sharding_indexed","configuration":{
            "chunk_shape":[2],
            "codecs":[{"name":"sharding_indexed","configuration":{}}],
            "index_codecs":[{"name":"bytes"},{"name":"crc32c"}],
            "index_location":"end"}}]}""".getBytes)
    val e2 = intercept[IllegalArgumentException](
      ZarrSource.readMeta(spark, arr.toString))
    assert(e2.getMessage.contains("sharding_indexed"), e2.getMessage)
    // a bytes->bytes codec wrapping the shard stream is refused
    java.nio.file.Files.write(arr.resolve("zarr.json"),
      """{"zarr_format":3,"node_type":"array","shape":[4],
          "data_type":"float64",
          "chunk_grid":{"name":"regular","configuration":{"chunk_shape":[4]}},
          "chunk_key_encoding":{"name":"default"},
          "fill_value":0,
          "codecs":[{"name":"sharding_indexed","configuration":{
            "chunk_shape":[2],
            "codecs":[{"name":"bytes"}],
            "index_codecs":[{"name":"bytes"},{"name":"crc32c"}],
            "index_location":"end"}},{"name":"gzip"}]}""".getBytes)
    val e3 = intercept[IllegalArgumentException](
      ZarrSource.readMeta(spark, arr.toString))
    assert(e3.getMessage.contains("only top-level codec"), e3.getMessage)
  }

  test("every numcodecs blosc config is accepted; unknown cname refused") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-badblosc")
    val arr = tmp.resolve("a"); java.nio.file.Files.createDirectory(arr)
    for (cname <- Seq("blosclz", "lz4", "lz4hc", "snappy", "zlib", "zstd");
         shuffle <- 0 to 2) {
      java.nio.file.Files.write(arr.resolve(".zarray"),
        s"""{"zarr_format":2,"order":"C","filters":null,"dtype":"<f8",
           "shape":[2],"chunks":[2],
           "compressor":{"id":"blosc","cname":"$cname","clevel":5,
             "shuffle":$shuffle}}""".getBytes)
      ZarrSource.readMeta(spark, arr.toString) // must not throw
    }
    java.nio.file.Files.write(arr.resolve(".zarray"),
      """{"zarr_format":2,"order":"C","filters":null,"dtype":"<f8",
         "shape":[2],"chunks":[2],
         "compressor":{"id":"blosc","cname":"madeup","clevel":5,"shuffle":1}}"""
        .getBytes)
    val e = intercept[IllegalArgumentException](
      ZarrSource.readMeta(spark, arr.toString))
    assert(e.getMessage.contains("madeup"), e.getMessage)
  }

  test("unsupported dtype/compressor fail with actionable errors") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-badzarr")
    val arr = tmp.resolve("a"); java.nio.file.Files.createDirectory(arr)
    java.nio.file.Files.write(arr.resolve(".zarray"),
      """{"zarr_format":2,"order":"C","filters":null,"dtype":">f8",
         "shape":[2],"chunks":[2],"compressor":null}""".getBytes)
    val e = intercept[IllegalArgumentException](
      ZarrSource.readMeta(spark, arr.toString))
    assert(e.getMessage.contains("dtype"))
  }

  // ---- v3 sharding_indexed (round 8): fixtures from the stdlib
  // generator per the public ZEP 2 spec; the index CRC32C is verified
  // by java.util.zip.CRC32C — an implementation independent of the
  // generator's hand-rolled Castagnoli loop, so unlike the blosclz
  // fixtures this decode is NOT circularly validated. FIXTURES.md has
  // provenance.

  private val shardStore = "src/test/resources/zarr_v3_sharded"

  test("v3 sharded: gzip inner chunks, index at end, missing + padded " +
       "edge chunks, out-of-index-order file layout") {
    val meta = ZarrSource.readMeta(spark, s"$shardStore/sg")
    assert(meta.sharding.exists(s => s.innerChunks == Seq(2, 2) &&
      s.innerComp.contains("gzip") && s.indexLocation == "end" && s.indexCrc))
    val a = ZarrSource.readArray(spark, s"$shardStore/sg", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // 6x7 array: row-6/7 inner chunks are MISSING (2^64-1 index
    // entries), col-7 elements are zero-padding dropped by bounds;
    // shard (0,0)'s chunk bytes are laid out in REVERSE index order
    assert(a.size == 42)
    for (xi <- 0 until 6; yi <- 0 until 7)
      assert(a((xi.toLong, yi.toLong)) == xi * 10 + yi + 0.5, s"($xi,$yi)")
  }

  test("v3 sharded: raw inner chunks, index at START, int32, 1-D") {
    val meta = ZarrSource.readMeta(spark, s"$shardStore/sr")
    assert(meta.sharding.exists(s => s.innerChunks == Seq(4) &&
      s.innerComp.isEmpty && s.indexLocation == "start" && s.indexCrc))
    val a = ZarrSource.readArray(spark, s"$shardStore/sr", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.size == 10)
    for (i <- 0 until 10) assert(a(i.toLong) == i * 7 - 3, s"i=$i")
  }

  test("v3 sharded: a flipped index byte fails the CRC32C check loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-shardcrc")
    val dst = tmp.resolve("sr")
    // copy the fixture, then corrupt one byte of shard 0's index
    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(from).forEach { p =>
        val t = to.resolve(from.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
      }
    }
    copyTree(java.nio.file.Paths.get(s"$shardStore/sr"), dst)
    val shard = dst.resolve("c/0")
    val bytes = java.nio.file.Files.readAllBytes(shard)
    bytes(3) = (bytes(3) ^ 0x40).toByte // inside the start-located index
    java.nio.file.Files.write(shard, bytes)
    val e = intercept[org.apache.spark.SparkException](
      ZarrSource.readArray(spark, dst.toString, "v").collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("CRC32C mismatch")), e.getMessage)
  }

  test("an ABSENT chunk file reads as fill_value (write_empty_chunks=False " +
       "stores); fill_value null stays absent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-absent").toString
    val df = Seq((0L, 1.5), (1L, 2.5), (2L, 3.5), (3L, 4.5)).toDF("i", "v")
    graft.sources.ZarrSink.writeDataset(df, dir, Seq("i"),
      chunkTargetBytes = 16L, compress = false) // 2 rows/chunk, 2 chunks
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "v", "1"))
    val back = ZarrSource.readArray(spark, s"$dir/v", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // fill_value "NaN" per the sink's .zarray: absent chunk = NaN cells
    assert(back.size == 4, back.toString)
    assert(back(0L) == 1.5 && back(1L) == 2.5)
    assert(back(2L).isNaN && back(3L).isNaN)
    // fill_value null (v2 "undefined"): absent chunks produce NOTHING
    val za = java.nio.file.Paths.get(dir, "v", ".zarray")
    val txt = new String(java.nio.file.Files.readAllBytes(za))
      .replace("\"fill_value\": \"NaN\"", "\"fill_value\": null")
    java.nio.file.Files.write(za, txt.getBytes)
    // the out-of-band rewrite invalidates the local FS's .crc sidecar
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "v", "..zarray.crc"))
    val sparse = ZarrSource.readArray(spark, s"$dir/v", "v").collect()
    assert(sparse.length == 2, sparse.mkString(","))
  }

  test("absent chunk in an INT array reads as its integer fill_value") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-absenti").toString
    val df = Seq((0L, 10L), (1L, 20L), (2L, 30L), (3L, 40L)).toDF("i", "n")
    graft.sources.ZarrSink.writeDataset(df, dir, Seq("i"),
      chunkTargetBytes = 16L, compress = false)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "n", "0"))
    val back = ZarrSource.readArray(spark, s"$dir/n", "n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back.size == 4)
    assert(back(0L) == 0L && back(1L) == 0L) // fill_value 0
    assert(back(2L) == 30L && back(3L) == 40L)
  }

  test("readDataset discovers arrays via CONSOLIDATED metadata when present " +
       "(v2 .zmetadata and v3 group zarr.json), listing only as fallback") {
    import spark.implicits._
    for (fmt <- Seq(2, 3)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-cons$fmt").toString
      val df = Seq((0L, 1.5), (1L, 2.5)).toDF("i", "v")
      graft.sources.ZarrSink.writeDataset(df, dir, Seq("i"),
        compress = false, zarrFormat = fmt)
      // a stray directory that LOOKS like an array but is not in the
      // manifest: manifest-driven discovery must skip it; a listing
      // would trip over its corrupt metadata
      val stray = java.nio.file.Paths.get(dir, "stray")
      java.nio.file.Files.createDirectory(stray)
      java.nio.file.Files.write(stray.resolve(
        if (fmt == 2) ".zarray" else "zarr.json"), "NOT JSON".getBytes)
      val back = ZarrSource.readDataset(spark, dir)
        .select("i", "v").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(back == Map(0L -> 1.5, 1L -> 2.5), s"fmt $fmt: $back")
    }
  }

  test("v3 sharded: readDataset integrates sharded arrays group-wide") {
    // the group holds sg (x,y f8) and sr (i i4) — disjoint dims, so the
    // dataset outer-aligns to a cartesian over both sharded arrays
    val ds = ZarrSource.readDataset(spark, shardStore)
    assert(ds.columns.toSet == Set("x", "y", "i", "sg", "sr"))
    assert(ds.count() == 42L * 10L)
  }

  // ---- dtype bridge (round 10): the reference's canonical store
  // shape — string coordinate, bool + complex128 variables
  // (tests/test_manage.py:15-27). Fixtures from the stdlib generator
  // scripts/gen_zarr_dtypes.py (json/struct/zlib only, no zarr lib);
  // expected values are hand-computed here, not read back from the
  // generator. FIXTURES.md has provenance.

  private val dtypeStore = "src/test/resources/zarr_dtypes"

  test("dtypes: <U3 string coord, |b1 bool, <c16 complex, |S4 bytes " +
       "all decode; edge chunks and 2-byte UTF-8 chars included") {
    // s axis: unicode incl. 'é'
    val s = ZarrSource.readArray(spark, s"$dtypeStore/s", "s").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s == Map(0L -> "ab", 1L -> "cdé", 2L -> "f"))
    // flag: (i + j) even — 3x2 chunks pad both dims at the edges
    val flag = ZarrSource.readArray(spark, s"$dtypeStore/flag", "flag")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    assert(flag.size == 12)
    for (i <- 0L until 4L; j <- 0L until 3L)
      assert(flag((i, j)) == ((i + j) % 2 == 0), s"flag($i,$j)")
    // tag: fixed |S4 bytes, NUL padding trimmed
    val tag = ZarrSource.readArray(spark, s"$dtypeStore/tag", "tag")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tag == Map(0L -> "AA", 1L -> "BBBB", 2L -> "C", 3L -> "DD"))
  }

  test("dtypes: complex chunks decode to struct(re, im); an ABSENT " +
       "complex chunk synthesizes the [0, NaN] fill") {
    val z = ZarrSource.readArray(spark, s"$dtypeStore/z", "z").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        r.getStruct(2)).toMap
    assert(z.size == 12)
    for (i <- 0L until 2L; j <- 0L until 3L) {
      val c = z((i, j))
      assert(c.getDouble(0) == i + j / 10.0 && c.getDouble(1) == i * j,
        s"z($i,$j) = $c")
    }
    for (i <- 2L until 4L; j <- 0L until 3L) {
      val c = z((i, j))
      assert(c.getDouble(0) == 0.0 && c.getDouble(1).isNaN, s"z($i,$j) = $c")
    }
  }

  test("dtypes: an ABSENT bool chunk synthesizes fill_value true") {
    val b2 = ZarrSource.readArray(spark, s"$dtypeStore/b2", "b2").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(b2 == Map(0L -> true, 1L -> false, 2L -> true, 3L -> true))
  }

  test("dtypes: readDataset aligns the full canonical shape — string " +
       "axis values replace indices, bool/complex/bytes vars ride along") {
    val ds = ZarrSource.readDataset(spark, dtypeStore)
    assert(ds.columns.toSet == Set("x", "s", "flag", "z", "tag", "b2"))
    val rows = ds.collect().map { r =>
      (r.getAs[Long]("x"), r.getAs[String]("s")) ->
        ((r.getAs[Boolean]("flag"), r.getAs[org.apache.spark.sql.Row]("z"),
          r.getAs[String]("tag"), r.getAs[Boolean]("b2")))
    }.toMap
    assert(rows.size == 12)
    val sAxis = Seq("ab", "cdé", "f")
    val tags = Seq("AA", "BBBB", "C", "DD")
    for (i <- 0 until 4; j <- 0 until 3) {
      val (flag, z, tag, b2) = rows(((i + 1) * 10L, sAxis(j)))
      assert(flag == ((i + j) % 2 == 0))
      assert(tag == tags(i))
      assert(b2 == (i != 1))
      if (i < 2) assert(z.getDouble(0) == i + j / 10.0 && z.getDouble(1) == i * j)
      else assert(z.getDouble(0) == 0.0 && z.getDouble(1).isNaN)
    }
  }

  private val v3DtypeStore = "src/test/resources/zarr_v3_dtypes"

  test("v3 dtypes: bool (gzip) and complex128 (raw, absent chunk -> " +
       "[NaN, 2.5] fill) read under their v3 names") {
    val ds = ZarrSource.readDataset(spark, v3DtypeStore)
    assert(ds.columns.toSet == Set("y", "fb", "cz"))
    val rows = ds.collect().map { r =>
      r.getAs[Long]("y") ->
        ((r.getAs[Boolean]("fb"), r.getAs[org.apache.spark.sql.Row]("cz")))
    }.toMap
    val ys = Seq(1L, 2L, 3L, 5L, 8L)
    val fbs = Seq(true, false, false, true, true)
    for (k <- 0 until 5) {
      val (fb, cz) = rows(ys(k))
      assert(fb == fbs(k), s"fb($k)")
      if (k < 3) assert(cz.getDouble(0) == k.toDouble && cz.getDouble(1) == -k.toDouble)
      else assert(cz.getDouble(0).isNaN && cz.getDouble(1) == 2.5, s"cz($k) = $cz")
    }
  }

  test("vlen-utf8 object strings (xarray's DEFAULT str encoding) read: " +
       "vlen COORD, zlib-wrapped vlen var, edge-chunk empty padding") {
    val store = "src/test/resources/zarr_vlen"
    val ds = ZarrSource.readDataset(spark, store)
    assert(ds.columns.toSet == Set("x", "v", "names"))
    val rows = ds.collect().map { r =>
      r.getAs[String]("x") ->
        ((r.getAs[Double]("v"), r.getAs[String]("names")))
    }.toMap
    // coord x is itself vlen-utf8: indices replaced by string values
    assert(rows == Map(
      "né" -> ((1.5, "alpha")), "b" -> ((2.5, "béta")),
      "ccc" -> ((3.5, "gamma"))))
  }

  test("vlen-utf8 with any OTHER filter chain refuses loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-badfilter")
    val arr = tmp.resolve("a"); java.nio.file.Files.createDirectory(arr)
    java.nio.file.Files.write(arr.resolve(".zarray"),
      """{"zarr_format":2,"order":"C","dtype":"<f8","shape":[2],
         "chunks":[2],"compressor":null,"fill_value":null,
         "filters":[{"id":"delta"}]}""".getBytes)
    val e = intercept[IllegalArgumentException](
      ZarrSource.readMeta(spark, arr.toString))
    assert(e.getMessage.contains("filters"), e.getMessage)
  }

  test("v3 dtypes: variable-length string data_type refuses with the " +
       "migration hint") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-v3str")
    val arr = tmp.resolve("a"); java.nio.file.Files.createDirectory(arr)
    java.nio.file.Files.write(arr.resolve("zarr.json"),
      """{"zarr_format":3,"node_type":"array","shape":[2],
         "data_type":"string",
         "chunk_grid":{"name":"regular","configuration":{"chunk_shape":[2]}},
         "codecs":[{"name":"bytes"}],"fill_value":""}""".getBytes)
    val e = intercept[IllegalArgumentException](
      ZarrSource.readMeta(spark, arr.toString))
    assert(e.getMessage.contains("variable-length strings"))
  }
}
