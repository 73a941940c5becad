package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.Partitioner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}

/** Distributed Zarr v2 WRITER — the save side of the legacy-store
  * bridge (reference IO surface manage.py:61-99: `save_ds(ds, fn,
  * engine="zarr")` → `ds.to_zarr`). [[ZarrSource]] reads xyzpy's
  * stores into the engine; this writes engine results back out as a
  * store xarray/zarr-python opens unchanged (`_ARRAY_DIMENSIONS`
  * attrs, C-order little-endian arrays, zlib or raw chunks).
  *
  * Spark-first shape: rows shuffle ONCE as (chunk, offset, bits)
  * triples — `repartitionAndSortWithinPartitions` keyed by (chunk,
  * offset), so each reduce task streams its chunks IN ORDER and holds
  * exactly ONE dense chunk buffer at a time (no map-side dense
  * combiners: a sparse slab costs its rows, never its dense extent).
  * Chunks are dim-0 slabs with inner dims kept whole, so every chunk
  * is a contiguous C-order block and assembly is a plain array fill;
  * each task encodes, deflates, and writes its chunk files through the
  * Hadoop FS — no driver materialization of array data, write
  * bandwidth scales with executors (reduce width follows
  * `defaultParallelism`, capped by the chunk count) exactly like the
  * parquet store's. Only the per-dim coordinate axes collect to the
  * driver (bounded: they are the store's dimensions, kilobytes by
  * construction — same bound as [[graft.store.ParquetStore]]'s key
  * handling).
  *
  * Long-form in, dense out: input columns = `dims` (the coordinate
  * axes, numeric) + data-variable columns (numeric). Cells absent
  * from the long form become `fill_value` (NaN for floats — xyzpy's
  * own missing-cell encoding, farming.py:975-1008); integer variables
  * have no NaN, so absent/null cells there fail loudly instead of
  * inventing a sentinel. EVERY chunk in the grid is written, even
  * all-fill ones (a seed row per chunk rides the shuffle): the store
  * is complete on disk, the int-completeness check cannot be bypassed
  * by a wholly-absent slab, and readers that don't synthesize missing
  * chunks still see every cell. A grid cell written twice is a
  * conflict and fails loudly (mirrors [[graft.store.Merge.NoConflicts]];
  * duplicates are ADJACENT after the sort, so detection is a local
  * compare, not a lookup structure).
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
                   compress: Boolean = true): Unit =
    GridPrep.withGrid(df, dims) { g =>
      val spark = df.sparkSession
      val shape = g.shape
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
      for ((d, vs) <- g.coords)
        writeCoordArray(fs, new Path(path, d), d, vs, g.isFloatCol(d),
          compress, metaFile)

      val bIdx = spark.sparkContext.broadcast(g.idxMaps)
      val dimsArr = dims.toArray
      val shapeTail = shape.drop(1).map(_.toLong).toArray

      for (v <- g.dataVars) {
        val float = g.isFloatCol(v)
        fs.mkdirs(new Path(path, v))
        metaFile(s"$v/.zarray",
          zarrayJson(shape, c0 +: shape.drop(1), float, compress))
        metaFile(s"$v/.zattrs",
          s"""{"_ARRAY_DIMENSIONS": [${dims.map(GridPrep.jsonString).mkString(", ")}]}""")

        // (chunk, offsetInChunk, value-bits); dims are total (GridPrep
        // rejected null coords up front), value-null cells become fill
        val rows = g.nd.select((dimsArr.toSeq :+ v).map(col): _*).rdd.flatMap { r =>
          var dn = 0
          while (dn < dimsArr.length) {
            require(!r.isNullAt(dn),
              s"null coordinate in dim '${dimsArr(dn)}' (dims must be total)")
            dn += 1
          }
          if (r.isNullAt(dimsArr.length)) {
            require(float, s"integer variable '$v' has a null cell " +
              "(no NaN fill exists for ints — fill or drop before writing)")
            Iterator.empty
          } else {
            val maps = bIdx.value
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
            Iterator(((i0 / c0).toInt, off, bits))
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
          meta.map { case (k, t) => s"""${GridPrep.jsonString(k)}: $t""" }.mkString(", ") +
          "}, \"zarr_consolidated_format\": 1}")
    }

  /** One ordered shuffle, then stream: each partition's rows arrive
    * sorted by (chunk, offset), so chunks assemble one at a time in a
    * single reusable-size buffer and duplicates are adjacent. A
    * sentinel seed (offset −1) per chunk guarantees every chunk
    * flushes, including all-fill ones. */
  private def writeChunks(rows: org.apache.spark.rdd.RDD[(Int, Long, Long)],
                          path: String, v: String, float: Boolean,
                          compress: Boolean, nChunks: Int, c0: Int,
                          chunkElems: Int, innerElems: Long, dim0: Int,
                          ndim: Int,
                          conf: org.apache.hadoop.conf.Configuration): Unit = {
    val sc = rows.sparkContext
    val hconf = new SerializableHadoopConf(conf)
    val fillBits =
      if (float) java.lang.Double.doubleToRawLongBits(Double.NaN) else 0L
    // reduce width scales with the cluster, bounded by the chunk count
    // (each task then streams several chunks sequentially — memory
    // stays one chunk buffer regardless)
    val parts = math.max(1, math.min(nChunks,
      math.max(sc.defaultParallelism * 2, 32)))
    val byChunk = new Partitioner {
      def numPartitions: Int = parts
      def getPartition(key: Any): Int = {
        val c = key.asInstanceOf[(Int, Long)]._1
        (c % parts + parts) % parts
      }
    }
    val seeds = sc.parallelize(0 until nChunks, math.min(nChunks, parts))
      .map(c => ((c, -1L), 0L))
    seeds.union(rows.map { case (c, off, bits) => ((c, off), bits) })
      .repartitionAndSortWithinPartitions(byChunk)
      .foreachPartition { it =>
        val fsx = new Path(path).getFileSystem(hconf.value)
        var cur = -1
        var buf: Array[Long] = null
        var lastOff = -1L
        var cells = 0L
        def flush(): Unit = if (cur >= 0) {
          val validElems = (math.min(c0.toLong * (cur + 1), dim0.toLong) -
            c0.toLong * cur) * innerElems
          if (!float) { // ints have no fill — the grid must be complete
            require(cells == validElems,
              s"integer variable '$v' chunk $cur: $cells of " +
                s"$validElems cells present (ints cannot encode missing cells)")
          }
          val bb = ByteBuffer.allocate(chunkElems * 8).order(ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < chunkElems) { bb.putLong(buf(i)); i += 1 }
          val raw = bb.array()
          val payload = if (compress) deflate(raw) else raw
          // v2 chunk key: dot-joined per-dim chunk indices; inner dims
          // are unsplit, so every key is "<i0>.0.0…"
          val key = (cur.toString +: Seq.fill(ndim - 1)("0")).mkString(".")
          val out = fsx.create(new Path(new Path(path, v), key), true)
          try out.write(payload) finally out.close()
        }
        while (it.hasNext) {
          val ((c, off), bits) = it.next()
          if (c != cur) {
            flush()
            cur = c
            if (buf == null) buf = new Array[Long](chunkElems)
            java.util.Arrays.fill(buf, fillBits)
            lastOff = -1L
            cells = 0L
          }
          if (off >= 0L) { // a real cell (−1 is the seed sentinel)
            require(off != lastOff,
              s"conflict: cell written twice in variable '$v'")
            buf(off.toInt) = bits
            lastOff = off
            cells += 1
          }
        }
        flush()
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
      s"""{"_ARRAY_DIMENSIONS": [${GridPrep.jsonString(name)}]}""")
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
