package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Spark-native reader for the netCDF classic family (CDF-1 classic,
  * CDF-2 64-bit-offset, CDF-5 64-bit-data) — the other half of the
  * xyzpy store bridge (reference IO surface manage.py:32-169: xyzpy's
  * default engines persist xarray Datasets as netCDF;
  * `ds.to_netcdf(..., format="NETCDF3_CLASSIC")` writes CDF-1, xarray
  * switches to CDF-2/CDF-5 for >2 GB files — none need an HDF5
  * library to read: the header is a few hundred bytes of big-endian
  * tags and variable data lies at known offsets, per the public
  * NetCDF User Guide spec).
  *
  * Format deltas (public spec appendix "File Format Specifications"):
  * CDF-2 widens only `begin` offsets to 8 bytes; CDF-5 widens every
  * NON_NEG (numrecs, list counts, name lengths, dim lengths, attr
  * counts, var ndims, dimids, vsize) AND `begin` to 8 bytes and adds
  * the unsigned/64-bit atomic types (NC_UBYTE..NC_UINT64).
  *
  * Spark-first shape: the header parses driver-side (tiny), then each
  * variable's byte extent is split into ranges and decoded by
  * executor-side positional reads (`FSDataInputStream.readFully`) —
  * one distributed pass, no driver materialization, scaling with the
  * variable size. Record (UNLIMITED-dim) variables read per-record
  * slabs from the interleaved record section.
  *
  * Scope: classic format only (netCDF-4 IS HDF5 — migrate those with
  * scripts/migrate_xyzpy.py); numeric types byte/short/int/float/
  * double, plus 2-D NC_CHAR matrices named after their first dim,
  * which read as STRING coordinate axes (the classic string-axis
  * encoding; other char vars and NC_CHAR attributes are skipped).
  */
object NetCDF3Source {

  private val NcDimension = 0x0A
  private val NcVariable = 0x0B

  final case class VarMeta(name: String, dims: Seq[String],
                           shape: Seq[Int], ncType: Int, vsize: Long,
                           begin: Long, isRecord: Boolean) extends Serializable {
    def elemSize: Int = ncType match {
      case 1 | 2 | 7  => 1 // byte, char, ubyte
      case 3 | 8      => 2 // short, ushort
      case 4 | 5 | 9  => 4 // int, float, uint
      case 6 | 10 | 11 => 8 // double, int64, uint64
    }
    def isFloat: Boolean = ncType == 5 || ncType == 6
    /** elements in one slab (whole var if fixed, one record if record) */
    def slabElems: Long =
      (if (isRecord) shape.drop(1) else shape).map(_.toLong).product
  }

  final case class Header(numrecs: Int, dims: Seq[(String, Int)],
                          vars: Seq[VarMeta], recSize: Long) extends Serializable

  /** Driver-side header parse (CDF-1 / CDF-2 / CDF-5 widths). */
  def readHeader(spark: SparkSession, file: String): Header = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = math.min(fs.getFileStatus(p).getLen, 1 << 20).toInt // headers are small
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    val bb = ByteBuffer.wrap(buf) // netCDF is big-endian = JVM default
    require(bb.get() == 'C' && bb.get() == 'D' && bb.get() == 'F', "not a netCDF file")
    val version = bb.get()
    require(version == 1 || version == 2 || version == 5,
      s"netCDF classic CDF-1/2/5 only (version byte $version; netCDF-4/HDF5 " +
        "stores: re-export with format='NETCDF3_CLASSIC' or scripts/migrate_xyzpy.py)")
    def u32(): Int = bb.getInt()
    // NON_NEG: 8 bytes in CDF-5, 4 bytes otherwise. Counts/lengths that
    // must fit driver-side structures are range-checked to Int.
    def sizeT(): Long = if (version == 5) bb.getLong() else u32().toLong & 0xFFFFFFFFL
    def sizeTi(what: String): Int = {
      val v = sizeT()
      require(v <= Int.MaxValue, s"$what $v exceeds header Int range")
      v.toInt
    }
    // begin: 8 bytes in CDF-2 and CDF-5, 4 in CDF-1
    def offset(): Long = if (version >= 2) bb.getLong() else u32().toLong & 0xFFFFFFFFL
    def nam(): String = {
      val n = sizeTi("name length")
      val b = new Array[Byte](n); bb.get(b)
      bb.position(bb.position() + ((4 - n % 4) % 4))
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    }
    def skipAttrs(): Unit = {
      val tag = u32(); val n = sizeTi("attr count")
      require(tag == 0x0C || (tag == 0 && n == 0), s"bad att_list tag $tag")
      for (_ <- 0 until n) {
        nam()
        val typ = u32(); val cnt = sizeTi("attr nelems")
        val esz = typ match {
          case 1 | 2 | 7 => 1; case 3 | 8 => 2
          case 4 | 5 | 9 => 4; case 6 | 10 | 11 => 8
        }
        val bytes = cnt * esz
        bb.position(bb.position() + bytes + ((4 - bytes % 4) % 4))
      }
    }
    val numrecs = sizeTi("numrecs") // STREAMING (-1) not produced by xarray/pnetcdf saves
    val dtag = u32(); val ndims = sizeTi("dim count")
    require(dtag == NcDimension || (dtag == 0 && ndims == 0), s"bad dim_list tag $dtag")
    val dims = Seq.fill(ndims)((nam(), sizeTi("dim length")))
    skipAttrs() // global attributes
    val vtag = u32(); val nvars = sizeTi("var count")
    require(vtag == NcVariable || (vtag == 0 && nvars == 0), s"bad var_list tag $vtag")
    val vars = Seq.fill(nvars) {
      val name = nam()
      val nd = sizeTi("var ndims")
      // dimids are NON_NEG too: 8-byte in CDF-5 (netcdf-c v1hpg.c
      // writes them via ncx_putn_longlong_int when version == 5)
      val dimids = Seq.fill(nd)(sizeTi("dimid"))
      skipAttrs()
      val typ = u32(); val vsize = sizeT(); val begin = offset()
      val isRec = dimids.headOption.exists(d => dims(d)._2 == 0)
      val shape = dimids.map(d => dims(d)._2).zipWithIndex
        .map { case (s, i) => if (i == 0 && isRec) numrecs else s }
      VarMeta(name, dimids.map(d => dims(d)._1), shape, typ, vsize, begin, isRec)
    }
    val recSize = vars.filter(_.isRecord).map(_.vsize).sum
    Header(numrecs, dims, vars, recSize)
  }

  private def decodeSlab(buf: Array[Byte], ncType: Int, n: Int): Array[Any] = {
    val bb = ByteBuffer.wrap(buf)
    Array.tabulate[Any](n) { i =>
      ncType match {
        case 1  => bb.get(i).toLong                      // NC_BYTE
        case 3  => bb.getShort(i * 2).toLong             // NC_SHORT
        case 4  => bb.getInt(i * 4).toLong               // NC_INT
        case 5  => bb.getFloat(i * 4).toDouble
        case 6  => bb.getDouble(i * 8)
        case 7  => (bb.get(i) & 0xFF).toLong             // NC_UBYTE (CDF-5)
        case 8  => (bb.getShort(i * 2) & 0xFFFF).toLong  // NC_USHORT
        case 9  => bb.getInt(i * 4).toLong & 0xFFFFFFFFL // NC_UINT
        case 10 => bb.getLong(i * 8)                     // NC_INT64
        case 11 => bb.getLong(i * 8) // NC_UINT64 (maps to signed Long;
        // values > 2^63-1 wrap — acceptable for index-like payloads)
      }
    }
  }

  /** One variable → long DataFrame (dim index columns as LONG + value
    * column, DOUBLE for float/double, LONG for integral types).
    * Distributed positional reads: fixed vars split into ~`splits`
    * row-ranges; record vars read one record-slab per task batch.
    */
  def readArray(spark: SparkSession, file: String, varName: String,
                valueCol: String = "value", splits: Int = 0): DataFrame = {
    val hdr = readHeader(spark, file)
    val m = hdr.vars.find(_.name == varName).getOrElse(
      throw new IllegalArgumentException(
        s"no variable '$varName' in $file (have ${hdr.vars.map(_.name).mkString(", ")})"))
    require(m.ncType != 2, s"NC_CHAR variable '$varName' not supported")
    val schema = StructType(
      m.dims.map(d => StructField(d, LongType, nullable = false)) :+
        StructField(valueCol, if (m.isFloat) DoubleType else LongType,
          nullable = false))
    // slab table: (byteOffset, firstFlatElemIndex, elemCount)
    val slabs: Seq[(Long, Long, Int)] =
      if (m.isRecord)
        (0 until hdr.numrecs).map { rec =>
          (m.begin + rec.toLong * hdr.recSize, rec * m.slabElems, m.slabElems.toInt)
        }
      else {
        val total = m.slabElems
        val nSplit = math.max(if (splits > 0) splits
          else math.min(total / 65536 + 1, 256).toInt, 1)
        (0 until nSplit).flatMap { i =>
          val lo = total * i / nSplit; val hi = total * (i + 1) / nSplit
          if (hi > lo) Some((m.begin + lo * m.elemSize, lo, (hi - lo).toInt))
          else None
        }
      }
    val shape = m.shape.map(_.toLong)
    val hconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val rdd = spark.sparkContext
      .parallelize(slabs, math.max(1, math.min(slabs.size, 64)))
      .mapPartitions { it =>
        val fs = new Path(file).getFileSystem(hconf.value)
        val in = fs.open(new Path(file))
        val rows = it.flatMap { case (byteOff, firstElem, count) =>
          val buf = new Array[Byte](count * m.elemSize)
          in.readFully(byteOff, buf)
          val vals = decodeSlab(buf, m.ncType, count)
          (0 until count).iterator.map { i =>
            var rem = firstElem + i
            val idx = new Array[Long](shape.length)
            var d = shape.length - 1
            while (d >= 0) { idx(d) = rem % shape(d); rem /= shape(d); d -= 1 }
            Row.fromSeq(idx.toSeq :+ vals(i))
          }
        }
        // NOTE: the stream closes with the JVM; Hadoop LocalFS streams are
        // cheap, and the iterator is consumed within the task
        rows
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Whole file → ONE long DataFrame in harvest-store shape: data
    * variables outer-aligned on their dims, dim indices replaced by
    * coordinate-variable VALUES (netCDF convention: a 1-D variable
    * named like its dim is that dim's coordinate). `load_ds` for a
    * classic-format xyzpy store.
    */
  def readDataset(spark: SparkSession, file: String): DataFrame = {
    val hdr = readHeader(spark, file)
    val (charVars, rest) = hdr.vars.partition(_.ncType == 2)
    // a 2-D NC_CHAR matrix named after its FIRST dim is that dim's
    // STRING coordinate axis (classic-format string encoding — the
    // second dim is the fixed string length); other char vars are
    // skipped as before
    val strCoords = charVars.filter(m =>
      m.dims.length == 2 && m.dims.head == m.name)
    val (coordVars, dataVars) = rest.partition(m => m.dims == Seq(m.name))
    require(dataVars.nonEmpty, s"no data variables in $file")
    val base = dataVars.sortBy(-_.shape.length)
    var df = readArray(spark, file, base.head.name, base.head.name)
    for (m <- base.tail) {
      val d = readArray(spark, file, m.name, m.name)
      val shared = m.dims.filter(df.columns.contains)
      df = if (shared.nonEmpty) df.join(d, shared, "full_outer")
           else df.crossJoin(d)
    }
    for (m <- coordVars if df.columns.contains(m.name)) {
      val coords = readArray(spark, file, m.name, s"__c_${m.name}")
      df = df.join(broadcast(coords), Seq(m.name), "left_outer")
        .drop(m.name)
        .withColumnRenamed(s"__c_${m.name}", m.name)
    }
    for (m <- strCoords if df.columns.contains(m.name)) {
      val coords = readCharCoord(spark, file, m)
      df = df.join(broadcast(coords), Seq(m.name), "left_outer")
        .drop(m.name)
        .withColumnRenamed(s"__c_${m.name}", m.name)
    }
    df
  }

  /** String coordinate axis from a 2-D NC_CHAR matrix: one driver-side
    * positional read (bounded — coordinate axes ARE the store's
    * dimensions). Rows trim trailing NULs ONLY — the C-string padding
    * [[NetCDF3Sink]] writes. Trimming spaces too would corrupt values
    * that legitimately end in a space (two axis labels differing only
    * in trailing whitespace would collapse), so Fortran-style
    * space-padded external files keep their pad spaces. */
  private def readCharCoord(spark: SparkSession, file: String,
                            m: VarMeta): DataFrame = {
    val Seq(len, strlen) = m.shape
    val buf = new Array[Byte](len * strlen)
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try in.readFully(m.begin, buf) finally in.close()
    val rows = (0 until len).map { i =>
      var end = (i + 1) * strlen
      while (end > i * strlen && buf(end - 1) == 0) end -= 1
      Row(i.toLong, new String(buf, i * strlen, end - i * strlen,
        java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField(m.name, LongType, nullable = false),
        StructField(s"__c_${m.name}", StringType, nullable = false))))
  }
}

/** Minimal serializable Hadoop Configuration carrier (the Spark-internal
  * one is private[spark]). */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
