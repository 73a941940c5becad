package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.{ByteBuffer, ByteOrder}
import scala.jdk.CollectionConverters._

/** Spark-native reader for Zarr v2 AND v3 stores — the migration bridge for
  * xyzpy/xarray result stores (reference IO surface: manage.py:32-169,
  * whose h5netcdf/netcdf4/zarr engines persist xarray Datasets; an
  * xarray store exported with `to_zarr` + zlib/no compression is read
  * here directly, see scripts/migrate_xyzpy.py).
  *
  * Spark-first shape: chunk files ARE the parallel unit. The listing
  * and metadata (.zarray/.zattrs JSON) are driver-side (tiny); chunk
  * payloads ride Spark's `binaryFile` source, so decode is one
  * distributed flatMap — each task inflates its chunks and emits
  * (dim indices, value) rows. At 100 TB a zarr store is exactly a
  * directory of independent chunks, so this scales with the file
  * listing, not the array size; no driver materialization anywhere.
  *
  * Scope: zarr_format 2 (.zarray) and 3 (zarr.json), C order.
  * Dtypes: little-endian f8/f4/i8/i4, `|b1` → BOOLEAN, `<c16`
  * (complex128) → struct(re, im), fixed-width strings `|S<n>` (bytes,
  * UTF-8) and `<U<n>` (UCS-4) → STRING — the reference's canonical
  * store shape (string coords, bool/complex vars,
  * tests/test_manage.py:15-27) crosses whole. v2 object dtype `|O`
  * with the numcodecs vlen-utf8 filter — xarray `to_zarr`'s DEFAULT
  * encoding for python-str variables and coordinates — reads as
  * STRING too (the one supported filter; any other chain refuses).
  * v3 adds bool and complex128 under their own names; v3
  * VARIABLE-length strings fail fast with the migration hint. Byte streams: null | zlib | gzip |
  * zstd | blosc with EVERY c-blosc-1 inner codec — blosclz, lz4,
  * lz4hc, snappy, zlib, zstd — and shuffle mode — none, byte, bit —
  * ([[BloscCodec]]/[[BloscLz]]: any numcodecs `Blosc(...)`
  * configuration, including the DEFAULT `to_zarr` encoding, reads
  * directly). v3 chunk keys: `default` encoding ("c/0/1" or "c.0.1")
  * and the `v2` compatibility encoding. v3 `sharding_indexed` (ZEP 2 —
  * what zarr-python 3 writes for large arrays) reads natively: shard =
  * concatenated inner chunks + uint64-LE (offset, nbytes) index +
  * CRC32C, verified against `java.util.zip.CRC32C` (independent of the
  * fixture generator's hand-rolled CRC — no circular validation);
  * start/end index locations, nested inner codec chains, missing inner
  * chunks, and shards whose file layout differs from index order all
  * handled. Shard files stay the `binaryFile` parallel unit — one task
  * decodes a whole shard, which is exactly the layout's intent (zarr
  * shards exist so object stores see few large objects; inner chunks
  * subdivide them for random access, and a full-scan reader like this
  * streams the shard once). The v3 transpose codec fails fast naming
  * the feature and the migration script. Edge chunks are zero-padded
  * per spec (v3 writers may also truncate trailing chunks; both read);
  * padding is dropped by bounds checks.
  */
object ZarrSource {

  /** v3 `sharding_indexed` layout (ZEP 2): a shard file concatenates
    * inner chunks plus an index of (offset, nbytes) uint64-LE pairs —
    * one per inner chunk in C-order, missing = 2⁶⁴−1 — optionally
    * CRC32C-tailed, at the shard's start or end. */
  final case class ShardingMeta(innerChunks: Seq[Int],
                                innerComp: Option[String],
                                indexLocation: String,
                                indexCrc: Boolean) extends Serializable

  final case class ArrayMeta(shape: Seq[Int], chunks: Seq[Int],
                             dtype: String, compressor: Option[String],
                             dims: Seq[String],
                             version: Int = 2,
                             sharding: Option[ShardingMeta] = None,
                             fillValue: Option[Any] = None)
      extends Serializable {
    def ndim: Int = shape.length
    def isFloat: Boolean = dtype.endsWith("f8") || dtype.endsWith("f4")
    /** Bytes per element for every supported dtype (fixed-width only —
      * zarr v2 strings are `|S<n>` bytes / `<U<n>` UCS-4). */
    def elemSize: Int = dtype match {
      case "<f8" | "<i8"           => 8
      case "<f4" | "<i4"           => 4
      case "|b1"                   => 1
      case "<c16"                  => 16
      case "|O"                    => 0 // variable-length (vlen path)
      case s if s.startsWith("|S") => s.drop(2).toInt
      case s if s.startsWith("<U") => s.drop(2).toInt * 4
    }
    /** Object dtype carrying numcodecs VLenUTF8 strings. */
    def isVlen: Boolean = dtype == "|O"
    /** Spark-side value type: numerics widen to DOUBLE/LONG, `|b1` →
      * BOOLEAN, fixed strings → STRING, `<c16` → struct(re, im) —
      * the engine's complex encoding ([[graft.functions.ComplexFns]]). */
    def valueType: DataType = dtype match {
      case "<f8" | "<f4" => DoubleType
      case "<i8" | "<i4" => LongType
      case "|b1"         => BooleanType
      case "<c16"        => StructType(Seq(
        StructField("re", DoubleType, nullable = false),
        StructField("im", DoubleType, nullable = false)))
      case _             => StringType // |S* / <U* / |O (vlen-utf8)
    }
  }

  /** The v2 dtypes this bridge reads — the reference's canonical store
    * shape (string coords, bool + complex128 variables,
    * tests/test_manage.py:15-27) plus the numeric core. */
  private def supportedV2Dtype(d: String): Boolean =
    Set("<f8", "<f4", "<i8", "<i4", "|b1", "<c16").contains(d) ||
      d.matches("\\|S[1-9][0-9]*") || d.matches("<U[1-9][0-9]*")

  private val migrateHint = "re-encode with zlib: scripts/migrate_xyzpy.py"

  private def readSmall(spark: SparkSession, p: Path): String = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      new String(buf, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Parse array metadata: `.zarray` (+ `.zattrs`) for v2, `zarr.json`
    * for v3 — normalized into one [[ArrayMeta]]. */
  def readMeta(spark: SparkSession, arrayPath: String): ArrayMeta = {
    val root = new Path(arrayPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(root, ".zarray")) &&
      fs.exists(new Path(root, "zarr.json"))) readMetaV3(spark, arrayPath)
    else readMetaV2(spark, arrayPath)
  }

  private def readMetaV2(spark: SparkSession, arrayPath: String): ArrayMeta = {
    val om = new ObjectMapper()
    val za = om.readTree(readSmall(spark, new Path(arrayPath, ".zarray")))
    val attrs =
      try Some(om.readTree(readSmall(spark, new Path(arrayPath, ".zattrs"))))
      catch { case _: java.io.FileNotFoundException => None }
    metaV2(za, attrs)
  }

  /** v2 metadata from parsed nodes — shared between per-array file
    * reads and the consolidated manifest (which inlines the same
    * objects). */
  private def metaV2(za: JsonNode, attrs: Option[JsonNode]): ArrayMeta = {
    require(za.get("zarr_format").asInt() == 2, "only zarr v2 supported")
    require(za.get("order").asText() == "C", "only C-order zarr arrays supported")
    def ints(n: JsonNode): Seq[Int] = n.elements().asScala.map(_.asInt()).toSeq
    val dtype = za.get("dtype").asText()
    // the ONE supported filter chain: object dtype + vlen-utf8 — what
    // xarray's `to_zarr` emits by DEFAULT for python-str variables and
    // coordinates (numcodecs VLenUTF8). Anything else fails fast.
    val filters = Option(za.get("filters")).filterNot(_.isNull)
      .map(_.elements().asScala.toSeq).getOrElse(Nil)
    if (dtype == "|O") {
      require(filters.length == 1 &&
        filters.head.get("id").asText() == "vlen-utf8",
        s"object dtype requires the vlen-utf8 filter (found " +
          s"${filters.map(_.get("id").asText()).mkString(",")})")
    } else {
      require(filters.isEmpty,
        s"zarr filters not supported (found " +
          s"${filters.map(_.get("id").asText()).mkString(",")})")
      require(supportedV2Dtype(dtype),
        s"unsupported dtype '$dtype' (f8/f4/i8/i4/b1/c16/S*/U*/O-vlen only)")
    }
    val comp = Option(za.get("compressor")).filterNot(_.isNull).map { c =>
      val id = c.get("id").asText()
      require(id == "zlib" || id == "gzip" || id == "zstd" || id == "blosc",
        s"unsupported compressor '$id' (re-encode with zlib: scripts/migrate_xyzpy.py)")
      if (id == "blosc") {
        // every c-blosc-1 inner codec (blosclz/lz4/lz4hc/snappy/zlib/
        // zstd) and shuffle mode (none/byte/bit) decodes natively —
        // the actual codec id comes from each chunk's own header, so
        // only sanity-check that the name is a known one
        val cname = Option(c.get("cname")).map(_.asText()).getOrElse("blosclz")
        require(Set("blosclz", "lz4", "lz4hc", "snappy", "zlib", "zstd")
          .contains(cname), s"unknown blosc inner codec '$cname'")
      }
      id
    }
    val dims = attrs
      .flatMap(a => Option(a.get("_ARRAY_DIMENSIONS")))
      .map(_.elements().asScala.map(_.asText()).toSeq)
      .getOrElse(Seq.empty)
    val shape = ints(za.get("shape"))
    val finalDims =
      if (dims.nonEmpty) dims else shape.indices.map(i => s"dim_$i")
    require(finalDims.length == shape.length)
    ArrayMeta(shape, ints(za.get("chunks")), dtype, comp, finalDims,
      fillValue = parseFill(za.get("fill_value"), dtype))
  }

  /** `fill_value` → the typed fill for this dtype: Double for floats
    * (including the JSON-string spellings v2/v3 use for non-finite
    * values), Long for ints, Boolean for `|b1`, a 2-element
    * [real, imag] array → Row for `<c16`, and — per the v2 spec —
    * base64-encoded raw scalar bytes for `|S`/`<U`. v2 `null` =
    * undefined fill → None (absent chunks then stay absent rather
    * than synthesizing cells). */
  private def parseFill(node: JsonNode, dtype: String): Option[Any] =
    Option(node).filterNot(_.isNull).map { n =>
      def fp(x: JsonNode): Double =
        if (x.isTextual) x.asText() match {
          case "NaN"       => Double.NaN
          case "Infinity"  => Double.PositiveInfinity
          case "-Infinity" => Double.NegativeInfinity
          case other => throw new IllegalArgumentException(
            s"unsupported fill_value '$other'")
        } else x.asDouble()
      dtype match {
        case "<f8" | "<f4" => fp(n)
        case "<i8" | "<i4" => n.asLong()
        case "|b1" => if (n.isBoolean) n.asBoolean() else n.asLong() != 0L
        case "<c16" =>
          require(n.isArray && n.size() == 2,
            s"complex fill_value must be [real, imag], got $n")
          Row(fp(n.get(0)), fp(n.get(1)))
        case "|O" => n.asText()
        case s if s.startsWith("|S") =>
          trimNul(new String(java.util.Base64.getDecoder.decode(n.asText()),
            java.nio.charset.StandardCharsets.UTF_8))
        case s if s.startsWith("<U") =>
          val raw = java.util.Base64.getDecoder.decode(n.asText())
          decodeUcs4(ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN),
            0, raw.length / 4)
      }
    }

  private def trimNul(s: String): String = {
    var end = s.length
    while (end > 0 && s.charAt(end - 1) == '\u0000') end -= 1
    s.substring(0, end)
  }

  /** UCS-4 little-endian (numpy `<U`) → String; trailing NUL padding
    * dropped. `off` is a byte offset, `n` a code-point count. */
  private def decodeUcs4(bb: ByteBuffer, off: Int, n: Int): String = {
    var end = n
    while (end > 0 && bb.getInt(off + (end - 1) * 4) == 0) end -= 1
    val sb = new java.lang.StringBuilder(end)
    var i = 0
    while (i < end) { sb.appendCodePoint(bb.getInt(off + i * 4)); i += 1 }
    sb.toString
  }

  /** Zarr v3 array metadata (public spec: zarr.json, regular chunk
    * grid, codecs chain of one array→bytes `bytes` codec plus at most
    * one supported bytes→bytes compressor). */
  private def readMetaV3(spark: SparkSession, arrayPath: String): ArrayMeta = {
    val om = new ObjectMapper()
    metaV3(om.readTree(readSmall(spark, new Path(arrayPath, "zarr.json"))))
  }

  /** v3 metadata from the parsed node — shared between per-array file
    * reads and the consolidated manifest. */
  private def metaV3(zj: JsonNode): ArrayMeta = {
    require(zj.get("zarr_format").asInt() == 3, "zarr.json without zarr_format 3")
    require(zj.get("node_type").asText() == "array",
      "not a zarr v3 array node")
    def ints(n: JsonNode): Seq[Int] = n.elements().asScala.map(_.asInt()).toSeq
    val dtype = zj.get("data_type").asText() match {
      case "float64"    => "<f8"
      case "float32"    => "<f4"
      case "int64"      => "<i8"
      case "int32"      => "<i4"
      case "bool"       => "|b1"
      case "complex128" => "<c16"
      case "string" => throw new IllegalArgumentException(
        "v3 variable-length strings not supported — export string axes " +
          s"as zarr v2 fixed-width <U ($migrateHint)")
      case other => throw new IllegalArgumentException(
        s"unsupported v3 data_type '$other' " +
          "(float64/float32/int64/int32/bool/complex128 only)")
    }
    val grid = zj.get("chunk_grid")
    require(grid != null && grid.get("name").asText() == "regular",
      "only the regular chunk grid is supported")
    val chunks = ints(grid.get("configuration").get("chunk_shape"))
    var sharding: Option[ShardingMeta] = None
    var comp: Option[String] = None
    val it = zj.get("codecs").elements().asScala.toSeq
    if (it.exists(_.get("name").asText() == "sharding_indexed")) {
      // sharding_indexed IS the array->bytes codec; nothing else may
      // wrap the shard stream (a bytes->bytes codec after it would
      // re-compress whole shards — refuse rather than misread)
      require(it.length == 1,
        s"sharding_indexed must be the only top-level codec ($migrateHint)")
      val cfg = it.head.get("configuration")
      val innerShape = ints(cfg.get("chunk_shape"))
      require(innerShape.length == chunks.length &&
        innerShape.indices.forall(i => chunks(i) % innerShape(i) == 0),
        s"inner chunk shape $innerShape must divide shard shape $chunks")
      val innerComp = parseByteChain(cfg.get("codecs"), "sharding inner")
      var idxCrc = false
      cfg.get("index_codecs").elements().asScala.foreach { ic =>
        ic.get("name").asText() match {
          case "bytes" =>
            val endian = Option(ic.get("configuration"))
              .flatMap(x => Option(x.get("endian"))).map(_.asText())
            require(endian.forall(_ == "little"),
              s"big-endian shard index not supported ($migrateHint)")
          case "crc32c" => idxCrc = true
          case other => throw new IllegalArgumentException(
            s"unsupported shard index codec '$other' ($migrateHint)")
        }
      }
      val loc = Option(cfg.get("index_location")).filterNot(_.isNull)
        .map(_.asText()).getOrElse("end")
      require(loc == "start" || loc == "end",
        s"unknown index_location '$loc'")
      sharding = Some(ShardingMeta(innerShape, innerComp, loc, idxCrc))
    } else {
      comp = parseByteChain(zj.get("codecs"), "v3")
    }
    val shape = ints(zj.get("shape"))
    val dims = Option(zj.get("dimension_names"))
      .filterNot(_.isNull)
      .map(_.elements().asScala.map(_.asText()).toSeq)
      .getOrElse(shape.indices.map(i => s"dim_$i"))
    require(dims.length == shape.length)
    ArrayMeta(shape, chunks, dtype, comp, dims, version = 3,
      sharding = sharding,
      fillValue = parseFill(zj.get("fill_value"), dtype))
  }

  /** Parse a v3 bytes-stream codec chain — one `bytes` (little-endian)
    * codec plus at most one supported compressor. Shared between the
    * top-level chain and the sharding codec's inner-chunk chain. */
  private def parseByteChain(codecs: JsonNode, where: String): Option[String] = {
    var comp: Option[String] = None
    var sawBytes = false
    codecs.elements().asScala.foreach { c =>
      c.get("name").asText() match {
        case "bytes" =>
          val endian = Option(c.get("configuration"))
            .flatMap(cfg => Option(cfg.get("endian"))).map(_.asText())
          require(endian.forall(_ == "little"),
            s"big-endian v3 arrays not supported ($migrateHint)")
          sawBytes = true
        case "gzip" => comp = Some("gzip")
        case "zstd" => comp = Some("zstd")
        case "blosc" =>
          // same scope as v2: the decode dispatches on each chunk's own
          // self-describing header ([[BloscCodec]] — every c-blosc-1
          // inner codec and shuffle mode), so the metadata check is
          // only a sanity gate on the declared name
          val cfg = c.get("configuration")
          val cname = Option(cfg).flatMap(x => Option(x.get("cname")))
            .map(_.asText()).getOrElse("blosclz")
          require(Set("blosclz", "lz4", "lz4hc", "snappy", "zlib", "zstd")
            .contains(cname), s"unknown blosc inner codec '$cname'")
          val shuffle = Option(cfg).flatMap(x => Option(x.get("shuffle")))
            .map(_.asText()).getOrElse("shuffle")
          require(Set("noshuffle", "shuffle", "bitshuffle").contains(shuffle),
            s"unknown blosc shuffle mode '$shuffle'")
          comp = Some("blosc")
        case other => // transpose, nested sharding_indexed, crc32c, ...
          throw new IllegalArgumentException(
            s"unsupported $where codec '$other' ($migrateHint)")
      }
    }
    require(sawBytes, s"$where codecs chain lacks the bytes (array->bytes) codec")
    comp
  }

  private def decompress(content: Array[Byte], comp: Option[String],
                         outLen: Int): Array[Byte] = comp match {
    case None => content
    case Some("zlib") =>
      val inf = new java.util.zip.Inflater()
      inf.setInput(content)
      val out = new Array[Byte](outLen)
      var off = 0
      while (!inf.finished() && off < outLen)
        off += inf.inflate(out, off, outLen - off)
      inf.end()
      require(off == outLen, s"zlib chunk inflated to $off of $outLen bytes")
      out
    case Some("gzip") =>
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(content))
      val out = new Array[Byte](outLen)
      var off = 0
      var n = 0
      while (off < outLen && n >= 0) {
        n = in.read(out, off, outLen - off)
        if (n > 0) off += n
      }
      in.close()
      require(off == outLen, s"gzip chunk inflated to $off of $outLen bytes")
      out
    case Some("zstd") =>
      val out = new Array[Byte](outLen)
      val n = com.github.luben.zstd.Zstd.decompressByteArray(
        out, 0, outLen, content, 0, content.length)
      require(n == outLen, s"zstd chunk decoded $n of $outLen bytes")
      out
    case Some("blosc") => BloscCodec.decode(content, outLen)
    case Some(other) => throw new IllegalArgumentException(other)
  }

  /** One zarr array → long DataFrame: the dim columns (as 0-based
    * LONG indices, named by `_ARRAY_DIMENSIONS`) plus `valueCol`
    * (DOUBLE for f4/f8, LONG for i4/i8). Distributed decode over
    * `binaryFile` chunk splits.
    */
  def readArray(spark: SparkSession, arrayPath: String,
                valueCol: String = "value",
                knownMeta: Option[ArrayMeta] = None): DataFrame = {
    val meta = knownMeta.getOrElse(readMeta(spark, arrayPath))
    require(!(meta.isVlen && meta.sharding.isDefined),
      "vlen-utf8 inside sharding_indexed not supported")
    val elemSize = meta.elemSize
    val chunkElems = meta.chunks.product
    val schema = StructType(
      meta.dims.map(d => StructField(d, LongType, nullable = false)) :+
        StructField(valueCol, meta.valueType, nullable = false))
    // v2 chunk files are flat "i.j"; v3 default keys nest as "c/i/j"
    // (or flat "c.i.j") — recursive listing covers all encodings, and
    // the index parse below is encoding-agnostic
    val root = new Path(arrayPath)
    val rootUri = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(root).toString
    val files = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(arrayPath)
      .select("path", "content")
    val m = meta // stable closure capture
    // chunk key → indices: optional "c" prefix, "/" or "." separators;
    // metadata files → None (shared by the decode pass and the
    // missing-chunk census below)
    val parseKey: String => Option[Array[Int]] = { p =>
      val rel = if (p.startsWith(rootUri)) p.substring(rootUri.length + 1)
                else p.split('/').last
      val tokens = rel.split("[/.]").filterNot(_ == "c")
      if (rel == "zarr.json" || rel == ".zarray" || rel == ".zattrs" ||
        !tokens.forall(_.forall(_.isDigit)) || tokens.isEmpty) None
      else {
        val chunkIdx = tokens.map(_.toInt)
        require(chunkIdx.length == m.ndim, s"chunk '$rel' vs ndim ${m.ndim}")
        Some(chunkIdx)
      }
    }
    val rdd = files.rdd.flatMap { r =>
      parseKey(r.getString(0)) match {
        case None => Iterator.empty
        case Some(chunkIdx) =>
          val content = r.getAs[Array[Byte]](1)
          val base = Array.tabulate(m.ndim)(i => chunkIdx(i).toLong * m.chunks(i))
          m.sharding match {
            case None if m.isVlen =>
              val items = decodeVlenChunk(content, m.compressor, chunkElems)
              emitElems(m, m.chunks, base, items(_))
            case None =>
              val raw = decompress(content, m.compressor, chunkElems * elemSize)
              val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
              emitElems(m, m.chunks, base, bufferValue(m, bb))
            case Some(sh) =>
              readShard(m, sh, chunkIdx,
                r.getString(0).split('/').last, content, elemSize)
          }
      }
    }
    // Zarr semantics: an ABSENT chunk file means every cell in it is
    // fill_value (zarr-python `write_empty_chunks=False` elides
    // all-fill chunks — common in sparse migrated stores). Synthesize
    // those cells so read-back is dense like a present chunk's; v2
    // fill_value null = undefined, so absent stays absent there. The
    // census is per-CHUNK (ids only, distributed anti-join), never
    // per-element, and the path-only scan reads no chunk bytes.
    val full = m.fillValue match {
      case None => rdd
      case Some(fill) =>
        val grid = m.shape.indices.map(i =>
          (m.shape(i) + m.chunks(i) - 1) / m.chunks(i)).toArray
        val totalChunks = grid.map(_.toLong).product
        import spark.implicits._
        val present = files.select("path").as[String].flatMap { p =>
          parseKey(p).map(_.zipWithIndex.foldLeft(0L) {
            case (acc, (ci, i)) => acc * grid(i) + ci
          })
        }.toDF("cid")
        val missing = spark.range(totalChunks).toDF("cid")
          .join(present.distinct(), Seq("cid"), "left_anti")
        val fillRows = missing.rdd.flatMap { row =>
          var rem = row.getLong(0)
          val base = new Array[Long](m.ndim)
          var i = m.ndim - 1
          while (i >= 0) {
            base(i) = (rem % grid(i)) * m.chunks(i); rem /= grid(i)
            i -= 1
          }
          emitElems(m, m.chunks, base, _ => fill)
        }
        rdd.union(fillRows)
    }
    spark.createDataFrame(full, schema)
  }

  /** Element extractor for a decoded little-endian chunk buffer. */
  private def bufferValue(m: ArrayMeta, bb: ByteBuffer): Int => Any =
    m.dtype match {
      case "<f8"  => flat => bb.getDouble(flat * 8)
      case "<f4"  => flat => bb.getFloat(flat * 4).toDouble
      case "<i8"  => flat => bb.getLong(flat * 8)
      case "<i4"  => flat => bb.getInt(flat * 4).toLong
      case "|b1"  => flat => bb.get(flat) != 0
      case "<c16" => flat =>
        Row(bb.getDouble(flat * 16), bb.getDouble(flat * 16 + 8))
      case s if s.startsWith("|S") =>
        val n = m.elemSize
        flat => {
          val b = new Array[Byte](n)
          var i = 0
          while (i < n) { b(i) = bb.get(flat * n + i); i += 1 }
          var end = n
          while (end > 0 && b(end - 1) == 0) end -= 1
          new String(b, 0, end, java.nio.charset.StandardCharsets.UTF_8)
        }
      case s if s.startsWith("<U") =>
        val n = s.drop(2).toInt
        flat => decodeUcs4(bb, flat * n * 4, n)
    }

  /** numcodecs VLenUTF8 chunk: uint32-LE item count, then per item a
    * uint32-LE byte length + UTF-8 bytes; the whole stream optionally
    * wrapped in the array's compressor. Decoded size is unknown ahead,
    * so compressed streams inflate into a growing buffer (blosc/zstd
    * frames carry their own size). Returns exactly `chunkElems`
    * strings (numcodecs encodes full chunks, edge padding included). */
  private def decodeVlenChunk(content: Array[Byte], comp: Option[String],
                              chunkElems: Int): Array[String] = {
    val raw = inflateAll(content, comp)
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val count = bb.getInt()
    require(count == chunkElems,
      s"vlen chunk stores $count items, chunk shape implies $chunkElems")
    Array.fill(count) {
      val n = bb.getInt()
      val b = new Array[Byte](n)
      bb.get(b)
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  /** Decompress a stream of UNKNOWN decoded size (vlen chunks). */
  private def inflateAll(content: Array[Byte],
                         comp: Option[String]): Array[Byte] = comp match {
    case None => content
    case Some("zlib") =>
      val inf = new java.util.zip.Inflater()
      inf.setInput(content)
      val out = new java.io.ByteArrayOutputStream(content.length * 4 + 64)
      val tmp = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(tmp)
        if (n > 0) out.write(tmp, 0, n)
        // ANY zero-progress state that isn't completion (truncated
        // input, preset-dictionary stream, malformed data) must throw,
        // not spin — needsInput()/needsDictionary() both land here
        else if (!inf.finished())
          throw new IllegalArgumentException(
            "truncated or malformed zlib vlen chunk")
      }
      inf.end()
      out.toByteArray
    case Some("gzip") =>
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(content))
      try in.readAllBytes() finally in.close()
    case Some("zstd") =>
      val sz = com.github.luben.zstd.Zstd.getFrameContentSize(content)
      require(sz > 0 && sz <= Int.MaxValue, s"zstd frame size $sz")
      val out = new Array[Byte](sz.toInt)
      val n = com.github.luben.zstd.Zstd.decompressByteArray(
        out, 0, sz.toInt, content, 0, content.length)
      require(n == sz, s"zstd vlen chunk decoded $n of $sz bytes")
      out
    case Some("blosc") =>
      // the c-blosc header carries the decompressed size (nbytes,
      // LE uint32 at offset 4)
      require(content.length >= 16, "truncated blosc header")
      val nbytes = ByteBuffer.wrap(content, 4, 4)
        .order(ByteOrder.LITTLE_ENDIAN).getInt
      BloscCodec.decode(content, nbytes)
    case Some(other) => throw new IllegalArgumentException(other)
  }

  /** Emit (global indices, value) rows for one chunk of shape `cshape`
    * whose element [0,…,0] sits at global `base`; C-order flat
    * offsets, out-of-bounds (edge padding) dropped. `value` maps the
    * flat offset to the cell value — a decoded buffer read for present
    * chunks, a constant for synthesized fill chunks. */
  private def emitElems(m: ArrayMeta, cshape: Seq[Int], base: Array[Long],
                        value: Int => Any): Iterator[Row] = {
    val elems = cshape.product
    (0 until elems).iterator.flatMap { flat =>
      var rem = flat
      val gidx = new Array[Long](m.ndim)
      var inBounds = true
      var i = m.ndim - 1
      while (i >= 0) {
        val off = rem % cshape(i); rem /= cshape(i)
        val g = base(i) + off
        gidx(i) = g
        if (g >= m.shape(i)) inBounds = false // edge-chunk padding
        i -= 1
      }
      if (!inBounds) None
      else Some(Row.fromSeq(gidx.toSeq :+ value(flat)))
    }
  }

  /** Decode one `sharding_indexed` shard file: locate the index
    * (uint64-LE (offset, nbytes) per inner chunk, C-order, missing =
    * 2⁶⁴−1), verify its CRC32C against `java.util.zip.CRC32C` — an
    * implementation independent of any fixture generator — then
    * decode each present inner chunk via the inner codec chain.
    * Offsets are absolute within the shard file per the spec, so the
    * reader follows the index rather than assuming layout order. */
  private def readShard(m: ArrayMeta, sh: ShardingMeta, chunkIdx: Array[Int],
                        rel: String, buf: Array[Byte],
                        elemSize: Int): Iterator[Row] = {
    val innerGrid = Array.tabulate(m.ndim)(i => m.chunks(i) / sh.innerChunks(i))
    val numInner = innerGrid.product
    val innerElems = sh.innerChunks.product
    val indexBytes = numInner * 16
    val indexSize = indexBytes + (if (sh.indexCrc) 4 else 0)
    require(buf.length >= indexSize,
      s"shard '$rel': ${buf.length} bytes < index size $indexSize")
    val idxOff = if (sh.indexLocation == "start") 0 else buf.length - indexSize
    val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
    if (sh.indexCrc) {
      val crc = new java.util.zip.CRC32C()
      crc.update(buf, idxOff, indexBytes)
      val want = bb.getInt(idxOff + indexBytes)
      require(crc.getValue.toInt == want,
        f"shard '$rel': index CRC32C mismatch (computed 0x${crc.getValue}%08x, stored 0x${want & 0xFFFFFFFFL}%08x) — corrupt shard")
    }
    (0 until numInner).iterator.flatMap { ci =>
      val off = bb.getLong(idxOff + ci * 16)
      val nb = bb.getLong(idxOff + ci * 16 + 8)
      // C-order inner-chunk coords within the shard
      var rem = ci
      val base = new Array[Long](m.ndim)
      var i = m.ndim - 1
      while (i >= 0) {
        val ic = rem % innerGrid(i); rem /= innerGrid(i)
        base(i) = chunkIdx(i).toLong * m.chunks(i) + ic.toLong * sh.innerChunks(i)
        i -= 1
      }
      if (off == -1L && nb == -1L) {
        // missing inner chunk = all fill_value (same semantics as a
        // missing chunk file; v3 always defines a fill)
        m.fillValue match {
          case Some(fill) => emitElems(m, sh.innerChunks, base, _ => fill)
          case None       => Iterator.empty
        }
      } else {
        require(off >= 0 && nb >= 0 && off + nb <= buf.length,
          s"shard '$rel': inner chunk $ci range [$off, ${off + nb}) outside ${buf.length}-byte shard")
        val payload = java.util.Arrays.copyOfRange(buf, off.toInt, (off + nb).toInt)
        val raw = decompress(payload, sh.innerComp, innerElems * elemSize)
        emitElems(m, sh.innerChunks, base,
          bufferValue(m, ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)))
      }
    }
  }

  /** TOP-LEVEL arrays (name → full [[ArrayMeta]]) from the group's
    * consolidated metadata, when present — v2 `.zmetadata` (xarray
    * writes it by default) or a v3 group `zarr.json` with inline
    * `consolidated_metadata` (zarr-python 3). The manifest inlines
    * every array's metadata objects, so on an object store the whole
    * group's metadata costs ONE small read instead of a listing plus
    * 1-2 reads per array — the reason the convention exists, and
    * [[ZarrSink]] writes it on both formats. Nested-group entries
    * (zarr consolidation walks the whole tree) are skipped on both
    * versions: this reader's dataset model is xarray's flat group. */
  private def consolidatedArrays(spark: SparkSession,
                                 root: Path): Option[Seq[(String, ArrayMeta)]] = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val om = new ObjectMapper()
    val v2Manifest = new Path(root, ".zmetadata")
    val v3Group = new Path(root, "zarr.json")
    if (fs.exists(v2Manifest)) {
      val mj = om.readTree(readSmall(spark, v2Manifest))
      Option(mj.get("metadata")).map { metaNode =>
        metaNode.fields().asScala.toSeq.flatMap { e =>
          val key = e.getKey
          if (key.endsWith("/.zarray") && !key.dropRight(8).contains("/")) {
            val name = key.dropRight(8)
            Some(name -> metaV2(e.getValue,
              Option(metaNode.get(s"$name/.zattrs"))))
          } else None
        }.sortBy(_._1)
      }.filter(_.nonEmpty)
    } else if (fs.exists(v3Group)) {
      val gj = om.readTree(readSmall(spark, v3Group))
      Option(gj.get("consolidated_metadata"))
        .flatMap(cm => Option(cm.get("metadata")))
        .map { metaNode =>
          metaNode.fields().asScala.toSeq.flatMap { e =>
            if (!e.getKey.contains("/") &&
              Option(e.getValue.get("node_type")).exists(_.asText() == "array"))
              Some(e.getKey -> metaV3(e.getValue))
            else None
          }.sortBy(_._1)
        }.filter(_.nonEmpty)
    } else None
  }

  /** Whole xarray-style group → ONE long DataFrame in graft's
    * harvest-store shape: dimension columns carry the COORD VALUES
    * (from the 1-D coordinate arrays, broadcast-joined over indices),
    * and each data variable is a value column, outer-aligned on its
    * dims — `load_ds` for a migrated store. Array discovery prefers
    * the consolidated manifest ([[consolidatedArrayNames]]), falling
    * back to a directory listing for stores written without one.
    */
  def readDataset(spark: SparkSession, groupPath: String): DataFrame = {
    val root = new Path(groupPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val arrays = consolidatedArrays(spark, root).getOrElse {
      fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
        .filter(p => fs.exists(new Path(p, ".zarray")) ||
          fs.exists(new Path(p, "zarr.json")))
        .map(p => p.getName -> readMeta(spark, p.toString)).toSeq.sortBy(_._1)
    }
    require(arrays.nonEmpty, s"no zarr arrays under $groupPath")
    val (coordArrays, dataVars) = arrays.partition { case (name, m) =>
      m.ndim == 1 && m.dims == Seq(name)
    }
    require(dataVars.nonEmpty, "no data variables (only coords) in group")

    // outer-align data vars: densest first, others join on their dims;
    // metas thread through so a consolidated store's metadata is never
    // re-read per array
    val base = dataVars.sortBy(-_._2.ndim)
    var df = readArray(spark, new Path(root, base.head._1).toString,
      base.head._1, Some(base.head._2))
    for ((name, m) <- base.tail) {
      val d = readArray(spark, new Path(root, name).toString, name, Some(m))
      val shared = m.dims.filter(df.columns.contains)
      df = if (shared.nonEmpty) df.join(d, shared, "full_outer")
           else df.crossJoin(d) // disjoint dims: outer-align = cartesian
    }
    // replace each dim-index column that has a coordinate array with
    // the coordinate VALUES (coords are per-dim and small -> broadcast)
    for ((name, m) <- coordArrays if df.columns.contains(name)) {
      val coords = readArray(spark, new Path(root, name).toString,
        s"__c_$name", Some(m))
      df = df.join(broadcast(coords), Seq(name), "left_outer")
        .drop(name)
        .withColumnRenamed(s"__c_$name", name)
    }
    df
  }
}
