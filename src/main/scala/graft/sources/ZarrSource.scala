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
  * Scope: zarr_format 2 (.zarray) and 3 (zarr.json), C order,
  * little-endian f8/f4/i8/i4. Byte streams: null | zlib | gzip |
  * zstd | blosc with EVERY c-blosc-1 inner codec — blosclz, lz4,
  * lz4hc, snappy, zlib, zstd — and shuffle mode — none, byte, bit —
  * ([[BloscCodec]]/[[BloscLz]]: any numcodecs `Blosc(...)`
  * configuration, including the DEFAULT `to_zarr` encoding, reads
  * directly). v3 chunk keys: `default` encoding ("c/0/1" or "c.0.1")
  * and the `v2` compatibility encoding. The v3
  * transpose/sharding/crc32c codecs fail fast naming the feature and
  * the migration script. Edge chunks are zero-padded per
  * spec (v3 writers may also truncate trailing chunks; both read);
  * padding is dropped by bounds checks.
  */
object ZarrSource {

  final case class ArrayMeta(shape: Seq[Int], chunks: Seq[Int],
                             dtype: String, compressor: Option[String],
                             dims: Seq[String],
                             version: Int = 2) extends Serializable {
    def ndim: Int = shape.length
    def isFloat: Boolean = dtype.endsWith("f8") || dtype.endsWith("f4")
  }

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
    require(za.get("zarr_format").asInt() == 2, "only zarr v2 supported")
    require(za.get("order").asText() == "C", "only C-order zarr arrays supported")
    require(za.get("filters") == null || za.get("filters").isNull,
      "zarr filters not supported")
    def ints(n: JsonNode): Seq[Int] = n.elements().asScala.map(_.asInt()).toSeq
    val dtype = za.get("dtype").asText()
    require(Set("<f8", "<f4", "<i8", "<i4").contains(dtype),
      s"unsupported dtype '$dtype' (little-endian f8/f4/i8/i4 only)")
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
    val dims =
      try {
        val attrs = om.readTree(readSmall(spark, new Path(arrayPath, ".zattrs")))
        Option(attrs.get("_ARRAY_DIMENSIONS"))
          .map(_.elements().asScala.map(_.asText()).toSeq)
          .getOrElse(Seq.empty)
      } catch { case _: java.io.FileNotFoundException => Seq.empty }
    val shape = ints(za.get("shape"))
    val finalDims =
      if (dims.nonEmpty) dims else shape.indices.map(i => s"dim_$i")
    require(finalDims.length == shape.length)
    ArrayMeta(shape, ints(za.get("chunks")), dtype, comp, finalDims)
  }

  /** Zarr v3 array metadata (public spec: zarr.json, regular chunk
    * grid, codecs chain of one array→bytes `bytes` codec plus at most
    * one supported bytes→bytes compressor). */
  private def readMetaV3(spark: SparkSession, arrayPath: String): ArrayMeta = {
    val om = new ObjectMapper()
    val zj = om.readTree(readSmall(spark, new Path(arrayPath, "zarr.json")))
    require(zj.get("zarr_format").asInt() == 3, "zarr.json without zarr_format 3")
    require(zj.get("node_type").asText() == "array",
      s"$arrayPath is not a zarr v3 array node")
    def ints(n: JsonNode): Seq[Int] = n.elements().asScala.map(_.asInt()).toSeq
    val dtype = zj.get("data_type").asText() match {
      case "float64" => "<f8"
      case "float32" => "<f4"
      case "int64"   => "<i8"
      case "int32"   => "<i4"
      case other => throw new IllegalArgumentException(
        s"unsupported v3 data_type '$other' (float64/float32/int64/int32 only)")
    }
    val grid = zj.get("chunk_grid")
    require(grid != null && grid.get("name").asText() == "regular",
      "only the regular chunk grid is supported")
    val chunks = ints(grid.get("configuration").get("chunk_shape"))
    var comp: Option[String] = None
    var sawBytes = false
    zj.get("codecs").elements().asScala.foreach { c =>
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
        case other => // transpose, sharding_indexed, crc32c, ...
          throw new IllegalArgumentException(
            s"unsupported v3 codec '$other' ($migrateHint)")
      }
    }
    require(sawBytes, "v3 codecs chain lacks the bytes (array->bytes) codec")
    val shape = ints(zj.get("shape"))
    val dims = Option(zj.get("dimension_names"))
      .filterNot(_.isNull)
      .map(_.elements().asScala.map(_.asText()).toSeq)
      .getOrElse(shape.indices.map(i => s"dim_$i"))
    require(dims.length == shape.length)
    ArrayMeta(shape, chunks, dtype, comp, dims, version = 3)
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
                valueCol: String = "value"): DataFrame = {
    val meta = readMeta(spark, arrayPath)
    val elemSize = if (meta.dtype.endsWith("8")) 8 else 4
    val chunkElems = meta.chunks.product
    val schema = StructType(
      meta.dims.map(d => StructField(d, LongType, nullable = false)) :+
        StructField(valueCol,
          if (meta.isFloat) DoubleType else LongType, nullable = false))
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
    val rdd = files.rdd.flatMap { r =>
      val p = r.getString(0)
      val rel = if (p.startsWith(rootUri)) p.substring(rootUri.length + 1)
                else p.split('/').last
      // chunk key → indices: optional "c" prefix, "/" or "." separators
      val tokens = rel.split("[/.]").filterNot(_ == "c")
      if (rel == "zarr.json" || rel == ".zarray" || rel == ".zattrs" ||
        !tokens.forall(_.forall(_.isDigit)) || tokens.isEmpty) Iterator.empty
      else {
      val chunkIdx = tokens.map(_.toInt)
      require(chunkIdx.length == m.ndim, s"chunk '$rel' vs ndim ${m.ndim}")
      val raw = decompress(r.getAs[Array[Byte]](1),
        m.compressor, chunkElems * elemSize)
      val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      (0 until chunkElems).iterator.flatMap { flat =>
        // C-order within-chunk offsets -> global indices
        var rem = flat
        val gidx = new Array[Long](m.ndim)
        var inBounds = true
        var i = m.ndim - 1
        while (i >= 0) {
          val off = rem % m.chunks(i); rem /= m.chunks(i)
          val g = chunkIdx(i).toLong * m.chunks(i) + off
          gidx(i) = g
          if (g >= m.shape(i)) inBounds = false // edge-chunk padding
          i -= 1
        }
        if (!inBounds) None
        else {
          val v: Any = m.dtype match {
            case "<f8" => bb.getDouble(flat * 8)
            case "<f4" => bb.getFloat(flat * 4).toDouble
            case "<i8" => bb.getLong(flat * 8)
            case "<i4" => bb.getInt(flat * 4).toLong
          }
          Some(Row.fromSeq(gidx.toSeq :+ v))
        }
      }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Whole xarray-style group → ONE long DataFrame in graft's
    * harvest-store shape: dimension columns carry the COORD VALUES
    * (from the 1-D coordinate arrays, broadcast-joined over indices),
    * and each data variable is a value column, outer-aligned on its
    * dims — `load_ds` for a migrated store.
    */
  def readDataset(spark: SparkSession, groupPath: String): DataFrame = {
    val root = new Path(groupPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val arrays = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(p => fs.exists(new Path(p, ".zarray")) ||
        fs.exists(new Path(p, "zarr.json")))
      .map(p => p.getName -> readMeta(spark, p.toString)).toSeq.sortBy(_._1)
    require(arrays.nonEmpty, s"no zarr arrays under $groupPath")
    val (coordArrays, dataVars) = arrays.partition { case (name, m) =>
      m.ndim == 1 && m.dims == Seq(name)
    }
    require(dataVars.nonEmpty, "no data variables (only coords) in group")

    // outer-align data vars: densest first, others join on their dims
    val base = dataVars.sortBy(-_._2.ndim)
    var df = readArray(spark, new Path(root, base.head._1).toString, base.head._1)
    for ((name, m) <- base.tail) {
      val d = readArray(spark, new Path(root, name).toString, name)
      val shared = m.dims.filter(df.columns.contains)
      df = if (shared.nonEmpty) df.join(d, shared, "full_outer")
           else df.crossJoin(d) // disjoint dims: outer-align = cartesian
    }
    // replace each dim-index column that has a coordinate array with
    // the coordinate VALUES (coords are per-dim and small -> broadcast)
    for ((name, _) <- coordArrays if df.columns.contains(name)) {
      val coords = readArray(spark, new Path(root, name).toString, s"__c_$name")
      df = df.join(broadcast(coords), Seq(name), "left_outer")
        .drop(name)
        .withColumnRenamed(s"__c_$name", name)
    }
    df
  }
}
