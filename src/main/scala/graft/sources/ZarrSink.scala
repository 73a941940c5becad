package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.{ByteBuffer, ByteOrder}

/** Distributed Zarr v2 WRITER — the save side of the legacy-store
  * bridge (reference IO surface manage.py:61-99: `save_ds(ds, fn,
  * engine="zarr")` → `ds.to_zarr`). [[ZarrSource]] reads xyzpy's
  * stores into the engine; this writes engine results back out as a
  * store xarray/zarr-python opens unchanged (`_ARRAY_DIMENSIONS`
  * attrs, C-order little-endian arrays, zlib or raw chunks).
  *
  * Spark-first shape: one chunk = one task. Rows shuffle ONCE, keyed
  * by target chunk (dim-0 slabs, inner dims kept whole, so every
  * chunk is a contiguous C-order block and the per-task assembly is a
  * plain array fill); each reduce task assembles its chunk dense
  * (fill value for absent cells), encodes, deflates, and writes its
  * own `<var>/<i>.0…` file through the Hadoop FS — no driver
  * materialization of array data, write bandwidth scales with
  * executors exactly like the parquet store's. Only the per-dim
  * coordinate axes collect to the driver (bounded: they are the
  * store's dimensions, kilobytes by construction — same bound as
  * [[graft.store.ParquetStore]]'s key handling).
  *
  * Long-form in, dense out: input columns = `dims` (the coordinate
  * axes, numeric) + data-variable columns (numeric). Cells absent
  * from the long form become `fill_value` (NaN for floats — xyzpy's
  * own missing-cell encoding, farming.py:975-1008); integer variables
  * have no NaN, so absent/null cells there fail loudly instead of
  * inventing a sentinel. A grid cell written twice is a conflict and
  * fails loudly (mirrors [[graft.store.Merge.NoConflicts]]).
  */
object ZarrSink {

  /** Write `df` (long form) as a Zarr v2 group at `path`, one array
    * per non-dim column plus one 1-D coordinate array per dim.
    *
    * @param chunkTargetBytes dim-0 slab size per chunk, pre-compression
    *                         (16 MiB default: large enough to amortize
    *                         per-file overhead, small enough that the
    *                         dense assembly fits comfortably in a task)
    * @param compress zlib-1 chunks (numcodecs `zlib`) vs raw
    */
  def writeDataset(df: DataFrame, path: String, dims: Seq[String],
                   chunkTargetBytes: Long = 16L << 20,
                   compress: Boolean = true): Unit = {
    val spark = df.sparkSession
    val dataVars = df.columns.filterNot(dims.contains).toSeq
    require(dims.nonEmpty && dims.forall(df.columns.contains),
      s"dims ${dims.mkString(",")} must be columns of ${df.columns.mkString(",")}")
    require(dataVars.nonEmpty, "no data-variable columns besides dims")

    // normalize every column to i8/f8 so coord lookup and encoding
    // see exactly two runtime types
    def norm(c: String): org.apache.spark.sql.Column = df.schema(c).dataType match {
      case LongType | DoubleType              => col(c)
      case ByteType | ShortType | IntegerType => col(c).cast(LongType).as(c)
      case FloatType                          => col(c).cast(DoubleType).as(c)
      case BooleanType => col(c).cast(LongType).as(c) // zarr v2 has no bool in our subset
      case t => throw new IllegalArgumentException(
        s"column '$c': unsupported type $t (numeric/boolean only)")
    }
    val nd = df.select((dims ++ dataVars).map(norm): _*)
    val isFloatCol: Map[String, Boolean] =
      (dims ++ dataVars).map(c => c -> (nd.schema(c).dataType == DoubleType)).toMap

    // coordinate axes: sorted distinct values per dim (driver-side,
    // bounded — these ARE the store dimensions)
    val coords: Seq[(String, Array[Any])] = dims.map { d =>
      val vs = nd.select(d).na.drop().distinct().collect().map(_.get(0))
      require(vs.nonEmpty, s"dim '$d' has no values")
      d -> (if (isFloatCol(d)) vs.map(_.asInstanceOf[Double]).sorted.toArray[Any]
            else vs.map(_.asInstanceOf[Long]).sorted.toArray[Any])
    }
    val shape = coords.map(_._2.length)
    val innerElems = shape.drop(1).map(_.toLong).product
    val c0 = math.max(1L, math.min(shape.head.toLong,
      chunkTargetBytes / 8L / math.max(1L, innerElems))).toInt
    val nChunks = (shape.head + c0 - 1) / c0
    val chunkElems = c0 * innerElems
    require(chunkElems <= (Int.MaxValue - 16L) / 8L,
      s"chunk of $chunkElems elems exceeds the 2 GiB single-buffer bound " +
        "(inner dims too large — reorder dims so a big axis leads)")

    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(path))
    // every metadata file also lands in .zmetadata (consolidated
    // metadata, zarr v2 convention): xarray's open_zarr defaults to
    // consolidated=True, and on object stores one .zmetadata read
    // replaces a listing plus 3 small reads per array
    val meta = scala.collection.mutable.TreeMap[String, String]()
    def metaFile(key: String, text: String): Unit = {
      meta(key) = text
      writeSmall(fs, new Path(path, key), text)
    }
    metaFile(".zgroup", """{"zarr_format": 2}""")
    metaFile(".zattrs", "{}")

    // coordinate arrays: tiny, single-chunk, driver-written
    for ((d, vs) <- coords)
      writeCoordArray(fs, new Path(path, d), d, vs, isFloatCol(d), compress,
        metaFile)

    val idxMaps: Map[String, Map[Any, Long]] =
      coords.map { case (d, vs) => d -> vs.zipWithIndex.map { case (v, i) => v -> i.toLong }.toMap }.toMap
    val bIdx = spark.sparkContext.broadcast(idxMaps)
    val dimsArr = dims.toArray
    val shapeTail = shape.drop(1).map(_.toLong).toArray

    for (v <- dataVars) {
      val float = isFloatCol(v)
      fs.mkdirs(new Path(path, v))
      metaFile(s"$v/.zarray",
        zarrayJson(shape, c0 +: shape.drop(1), float, compress))
      metaFile(s"$v/.zattrs",
        s"""{"_ARRAY_DIMENSIONS": [${dims.map(d => s""""$d"""").mkString(", ")}]}""")

      // (chunk, offsetInChunk, value-bits): absent → fill at assembly
      val rows = nd.select((dimsArr.toSeq :+ v).map(col): _*).rdd.flatMap { r =>
        if (r.isNullAt(dimsArr.length)) {
          require(float, s"integer variable '$v' has a null cell " +
            "(no NaN fill exists for ints — fill or drop before writing)")
          Iterator.empty
        } else {
          val maps = bIdx.value
          var dn = 0
          while (dn < dimsArr.length) {
            require(!r.isNullAt(dn),
              s"null coordinate in dim '${dimsArr(dn)}' (dims must be total)")
            dn += 1
          }
          // row-major offset over (local0, i1..in); inner chunk
          // extents are the full shape, so offset arithmetic is the
          // array's own except dim 0 folds to its slab-local index
          val i0 = maps(dimsArr(0))(r.get(0))
          var off = i0 % c0
          var dd = 1
          while (dd < dimsArr.length) {
            off = off * shapeTail(dd - 1) + maps(dimsArr(dd))(r.get(dd))
            dd += 1
          }
          val bits = if (float) java.lang.Double.doubleToRawLongBits(r.getDouble(dimsArr.length))
                     else r.getLong(dimsArr.length)
          Iterator(((i0 / c0).toInt, (off, bits)))
        }
      }
      writeChunks(rows, path, v, float, compress, nChunks, c0,
        chunkElems.toInt, innerElems, shape.head, dims.length,
        spark.sparkContext.hadoopConfiguration)
    }
    // consolidated metadata last: readers treating it as the manifest
    // only ever see a complete store
    writeSmall(fs, new Path(path, ".zmetadata"),
      "{\"metadata\": {" +
        meta.map { case (k, t) => s""""$k": $t""" }.mkString(", ") +
        "}, \"zarr_consolidated_format\": 1}")
  }

  /** Assemble + write each chunk in its own reduce task. */
  private def writeChunks(rows: org.apache.spark.rdd.RDD[(Int, (Long, Long))],
                          path: String, v: String, float: Boolean,
                          compress: Boolean, nChunks: Int, c0: Int,
                          chunkElems: Int, innerElems: Long, dim0: Int,
                          ndim: Int,
                          conf: org.apache.hadoop.conf.Configuration): Unit = {
    val hconf = new SerializableHadoopConf(conf)
    val fillBits =
      if (float) java.lang.Double.doubleToRawLongBits(Double.NaN) else 0L
    rows.combineByKey[(Array[Long], java.util.BitSet)](
      (t: (Long, Long)) => {
        val a = Array.fill(chunkElems)(fillBits)
        val seen = new java.util.BitSet(chunkElems)
        a(t._1.toInt) = t._2; seen.set(t._1.toInt); (a, seen)
      },
      (acc: (Array[Long], java.util.BitSet), t: (Long, Long)) => {
        require(!acc._2.get(t._1.toInt),
          s"conflict: cell written twice in variable '$v'")
        acc._1(t._1.toInt) = t._2; acc._2.set(t._1.toInt); acc
      },
      (a1: (Array[Long], java.util.BitSet), a2: (Array[Long], java.util.BitSet)) => {
        var i = a2._2.nextSetBit(0)
        while (i >= 0) {
          require(!a1._2.get(i), s"conflict: cell written twice in variable '$v'")
          a1._1(i) = a2._1(i); a1._2.set(i)
          i = a2._2.nextSetBit(i + 1)
        }
        a1
      },
      new HashPartitioner(math.max(1, math.min(nChunks, 64)))
    ).foreach { case (chunk, (bits, seen)) =>
      val validElems = (math.min(c0.toLong * (chunk + 1), dim0.toLong) -
        c0.toLong * chunk) * innerElems
      if (!float) { // ints have no fill — the grid must be complete
        require(seen.cardinality().toLong == validElems,
          s"integer variable '$v' chunk $chunk: ${seen.cardinality()} of " +
            s"$validElems cells present (ints cannot encode missing cells)")
      }
      val buf = ByteBuffer.allocate(chunkElems * 8).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < chunkElems) { buf.putLong(bits(i)); i += 1 }
      val raw = buf.array()
      val payload = if (compress) deflate(raw) else raw
      val fsx = new Path(path).getFileSystem(hconf.value)
      // v2 chunk key: dot-joined per-dim chunk indices; inner dims are
      // unsplit, so every key is "<i0>.0.0…"
      val key = (chunk.toString +: Seq.fill(ndim - 1)("0")).mkString(".")
      val out = fsx.create(new Path(new Path(path, v), key), true)
      try out.write(payload) finally out.close()
    }
  }

  private def writeCoordArray(fs: org.apache.hadoop.fs.FileSystem, arrPath: Path,
                              name: String, vs: Array[Any], float: Boolean,
                              compress: Boolean,
                              metaFile: (String, String) => Unit): Unit = {
    fs.mkdirs(arrPath)
    metaFile(s"$name/.zarray",
      zarrayJson(Seq(vs.length), Seq(vs.length), float, compress))
    metaFile(s"$name/.zattrs",
      s"""{"_ARRAY_DIMENSIONS": ["$name"]}""")
    val buf = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach {
      case d: Double => buf.putDouble(d)
      case l: Long   => buf.putLong(l)
      case other => throw new IllegalStateException(s"coord $other")
    }
    val raw = buf.array()
    val out = fs.create(new Path(arrPath, "0"), true)
    try out.write(if (compress) deflate(raw) else raw) finally out.close()
  }

  /** `.zarray` text matching zarr-python's own field set; key order is
    * alphabetical like `json.dumps(..., sort_keys=True)` so the golden
    * byte-compare spec can pin both writers to one canonical form. */
  private def zarrayJson(shape: Seq[Int], chunks: Seq[Int],
                         float: Boolean, compress: Boolean): String = {
    val dtype = if (float) "<f8" else "<i8"
    val comp = if (compress) """{"id": "zlib", "level": 1}""" else "null"
    val fill = if (float) "\"NaN\"" else "0"
    s"""{"chunks": [${chunks.mkString(", ")}], "compressor": $comp, """ +
      s""""dtype": "$dtype", "fill_value": $fill, "filters": null, """ +
      s""""order": "C", "shape": [${shape.mkString(", ")}], "zarr_format": 2}"""
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(1)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  private def writeSmall(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                         text: String): Unit = {
    val out = fs.create(p, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
