package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.{ByteBuffer, ByteOrder}
import scala.jdk.CollectionConverters._

/** Spark-native reader for Zarr v2 stores — the migration bridge for
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
  * Scope: zarr_format 2, C order, little-endian `<f8 <f4 <i8 <i4`,
  * compressor null | zlib | gzip | blosc with lz4/lz4hc/zlib/zstd
  * inner streams and byte-shuffle ([[BloscCodec]] — covers the
  * numcodecs DEFAULT `to_zarr` encoding, so typical real-world stores
  * read directly); blosclz/snappy streams and bit-shuffle fail fast
  * naming the codec and the migration script. Edge chunks are
  * zero-padded per spec; padding is dropped by bounds checks.
  */
object ZarrSource {

  final case class ArrayMeta(shape: Seq[Int], chunks: Seq[Int],
                             dtype: String, compressor: Option[String],
                             dims: Seq[String]) extends Serializable {
    def ndim: Int = shape.length
    def isFloat: Boolean = dtype.endsWith("f8") || dtype.endsWith("f4")
  }

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

  /** Parse `.zarray` (+ `.zattrs` for xarray's `_ARRAY_DIMENSIONS`). */
  def readMeta(spark: SparkSession, arrayPath: String): ArrayMeta = {
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
      require(id == "zlib" || id == "gzip" || id == "blosc",
        s"unsupported compressor '$id' (re-encode with zlib: scripts/migrate_xyzpy.py)")
      if (id == "blosc") {
        // fail fast on inner codecs / filters the chunk decoder will
        // reject anyway, naming the exact codec and the way out
        val cname = Option(c.get("cname")).map(_.asText()).getOrElse("blosclz")
        require(Set("lz4", "lz4hc", "zlib", "zstd").contains(cname),
          s"unsupported blosc inner codec '$cname' " +
            "(re-encode with zlib: scripts/migrate_xyzpy.py)")
        val shuffle = Option(c.get("shuffle")).map(_.asInt()).getOrElse(1)
        require(shuffle != 2, // 2 = bit-shuffle
          "blosc bit-shuffle not supported " +
            "(re-encode with zlib: scripts/migrate_xyzpy.py)")
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
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "[0-9]*") // chunk files; skips .zarray/.zattrs
      .load(arrayPath)
      .select("path", "content")
    val m = meta // stable closure capture
    val rdd = files.rdd.flatMap { r =>
      val name = r.getString(0).split('/').last
      val chunkIdx = name.split('.').map(_.toInt)
      require(chunkIdx.length == m.ndim, s"chunk '$name' vs ndim ${m.ndim}")
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
      .filter(p => fs.exists(new Path(p, ".zarray")))
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
