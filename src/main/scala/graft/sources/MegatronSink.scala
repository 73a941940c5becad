package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType}

/** Tokenized training-shard EXPORT/import in the Megatron-LM /
  * fairseq "mmap indexed dataset" convention — the `.bin` + `.idx`
  * pair a GPT training run actually memory-maps (Megatron-LM
  * `megatron/core/datasets/indexed_dataset.py`, which inherited the
  * layout from fairseq `fairseq/data/indexed_dataset.py`;
  * reimplemented here from the published format, not their code).
  *
  * Layout (everything little-endian):
  *  - `.bin` — the token ids of every sequence, concatenated in
  *    sequence order, each id in the dataset dtype (uint16 when the
  *    vocab fits, Megatron's `best_fitting_dtype`; int32 otherwise).
  *  - `.idx` — `MMIDIDX\0\0` magic (9 bytes), u64 version = 1,
  *    u8 dtype code (fairseq table: 1=u8 2=i8 3=i16 4=i32 5=i64
  *    6=f32 7=f64 8=u16), u64 sequence count, u64 document-index
  *    length, then i32 `sizes[n]` (token count per sequence), i64
  *    `pointers[n]` (byte offset of each sequence in `.bin`), i64
  *    `doc_idx[d]` (sequence-index boundaries of documents —
  *    `[0 … n]`, one sequence per document, in this writer).
  *
  * Writer shape for scale: ONE hash exchange on the shard key, sort
  * within partitions on (shard, order) — every shard lands whole and
  * ordered in exactly one task, which streams it to the filesystem
  * row by row (the only per-shard driver-independent state is the
  * i32 sizes array, two orders of magnitude smaller than the ids).
  * A task holding several shards (hash collision) writes them
  * sequentially off the same sorted iterator. Files commit via
  * write-to-`.tmp` + rename, `.idx` LAST — a crashed task never
  * leaves a readable-but-short pair, and the reader keys on `.idx`.
  *
  * Reader: strict. Magic, version, dtype, every pointer re-derived
  * from sizes, doc_idx monotonicity/bounds and the physical `.bin`
  * length are all verified before any row is emitted; one task per
  * shard file, `.bin` streamed sequentially (never held whole).
  */
object MegatronSink {

  /** `.idx` header magic — fairseq/Megatron `MMIDIDX\x00\x00`. */
  val HdrMagic: Array[Byte] =
    "MMIDIDX".getBytes(StandardCharsets.US_ASCII) ++ Array[Byte](0, 0)

  val Version: Long = 1L

  /** fairseq dtype-code table (indexed_dataset `_code_to_dtype`). */
  val DtypeUint8 = 1; val DtypeInt8 = 2; val DtypeInt16 = 3
  val DtypeInt32 = 4; val DtypeInt64 = 5; val DtypeFloat32 = 6
  val DtypeFloat64 = 7; val DtypeUint16 = 8

  /** Megatron's `best_fitting_dtype`: uint16 while the vocab fits
    * (their threshold is 65500, not 65536 — matched exactly so the
    * files we write are byte-identical to theirs), int32 above. */
  def bestFittingDtype(vocabSize: Int): Int =
    if (vocabSize < 65500) DtypeUint16 else DtypeInt32

  private[sources] def itemSize(code: Int): Int = code match {
    case DtypeUint8 | DtypeInt8 => 1
    case DtypeInt16 | DtypeUint16 => 2
    case DtypeInt32 | DtypeFloat32 => 4
    case DtypeInt64 | DtypeFloat64 => 8
    case c => throw new IllegalArgumentException(
      s"unknown indexed-dataset dtype code $c")
  }

  /** Max representable token id per integer dtype (ids are
    * non-negative vocab indices — the signed codes still bound at
    * their positive range). */
  private def maxId(code: Int): Long = code match {
    case DtypeUint8 => 255L
    case DtypeInt8 => 127L
    case DtypeInt16 => 32767L
    case DtypeUint16 => 65535L
    case DtypeInt32 => Int.MaxValue.toLong
    case DtypeInt64 => Long.MaxValue
    case c => throw new IllegalArgumentException(
      s"dtype code $c is not an integer token-id dtype")
  }

  private def shardName(shard: Long): String = f"shard-$shard%05d"

  /** Write `df` as one `.bin`/`.idx` pair per distinct `shardCol`
    * value under `outDir`, sequences ordered by `orderCol` within
    * each shard. `idsCol` must be `array<int>` of non-negative token
    * ids in the dtype's range — a `-1` missing-vocab sentinel or an
    * overflowing id fails LOUDLY naming the shard and sequence,
    * because a silently wrapped id stream is a corrupted training
    * run, not an error anyone sees.
    *
    * `packBudget = 0` (default) writes ONE SEQUENCE PER ROW — the
    * Megatron `preprocess_data.py` convention (documents as
    * sequences; the training loader packs at read). `packBudget > 0`
    * instead CONCAT-AND-SPLITS each shard's token stream into
    * fixed-`packBudget`-token sequences (t17's packSequences
    * semantics made physical — the pre-packed artifact shape, e.g.
    * GPT-NeoX's pretokenized data): sizes are all `packBudget`
    * except one final partial per shard; document boundaries are
    * deliberately not carried (callers wanting them append an EOD
    * id per document upstream, exactly as the real pipelines do). */
  def write(df: DataFrame, outDir: String, shardCol: String,
            orderCol: String, idsCol: String, numShards: Int,
            dtypeCode: Int = DtypeUint16, packBudget: Int = 0): Unit = {
    require(df.schema(idsCol).dataType == ArrayType(IntegerType, true) ||
      df.schema(idsCol).dataType == ArrayType(IntegerType, false),
      s"$idsCol must be array<int> token ids, got " +
        df.schema(idsCol).dataType.simpleString)
    require(numShards > 0, s"numShards must be positive, got $numShards")
    require(packBudget >= 0,
      s"packBudget must be >= 0 (0 = one sequence per row), got $packBudget")
    val idMax = maxId(dtypeCode)
    val item = itemSize(dtypeCode)
    val spark = df.sparkSession
    val hconf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    locally {
      val base = new Path(outDir)
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(base)
    }
    import spark.implicits._
    df.select(col(shardCol).cast("long").as("__shard"),
        col(orderCol).cast("long").as("__ord"), col(idsCol).as("__ids"))
      .repartition(numShards, col("__shard"))
      .sortWithinPartitions("__shard", "__ord")
      .as[(Long, Long, Array[Int])]
      .foreachPartition { it: Iterator[(Long, Long, Array[Int])] =>
        val fs = new Path(outDir).getFileSystem(hconf.value)
        var shard = -1L
        var out: java.io.DataOutputStream = null
        var sizes: scala.collection.mutable.ArrayBuilder.ofInt = null
        var fill = 0 // open packed-sequence fill (packBudget > 0)
        def finish(): Unit = if (shard >= 0) {
          if (packBudget > 0 && fill > 0) { sizes += fill; fill = 0 }
          out.close()
          val name = shardName(shard)
          val szs = sizes.result()
          writeIndex(fs, new Path(outDir, s"$name.idx.tmp"), dtypeCode, szs)
          // commit: .bin first, .idx LAST — readers key on .idx
          commit(fs, new Path(outDir, s"$name.bin.tmp"),
            new Path(outDir, s"$name.bin"))
          commit(fs, new Path(outDir, s"$name.idx.tmp"),
            new Path(outDir, s"$name.idx"))
        }
        while (it.hasNext) {
          val (s, ord, ids) = it.next()
          if (s != shard) {
            finish()
            shard = s
            require(shard >= 0, s"negative shard id $shard")
            out = new java.io.DataOutputStream(
              new java.io.BufferedOutputStream(
                fs.create(new Path(outDir, s"${shardName(shard)}.bin.tmp"),
                  true), 1 << 16))
            sizes = new scala.collection.mutable.ArrayBuilder.ofInt
            fill = 0
          }
          require(ids != null,
            s"shard $shard sequence at $orderCol=$ord: null $idsCol")
          var i = 0
          while (i < ids.length) {
            val id = ids(i)
            require(id >= 0 && id <= idMax,
              s"shard $shard sequence at $orderCol=$ord: token id $id " +
                s"out of range [0, $idMax] for dtype code $dtypeCode " +
                "(a -1 means a symbol missed the vocab)")
            writeLE(out, id.toLong, item)
            if (packBudget > 0) {
              fill += 1
              if (fill == packBudget) { sizes += packBudget; fill = 0 }
            }
            i += 1
          }
          if (packBudget == 0) sizes += ids.length
        }
        finish()
      }
  }

  private def commit(fs: org.apache.hadoop.fs.FileSystem,
                     tmp: Path, dst: Path): Unit = {
    fs.delete(dst, false)
    require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed")
  }

  private def writeLE(out: java.io.DataOutputStream, v: Long,
                      bytes: Int): Unit = {
    var i = 0
    while (i < bytes) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def writeIndex(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                         dtypeCode: Int, sizes: Array[Int]): Unit = {
    val item = itemSize(dtypeCode)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16))
    try {
      out.write(HdrMagic)
      writeLE(out, Version, 8)
      out.write(dtypeCode)
      writeLE(out, sizes.length.toLong, 8)
      writeLE(out, sizes.length.toLong + 1L, 8) // doc_idx length
      var i = 0
      while (i < sizes.length) { writeLE(out, sizes(i).toLong, 4); i += 1 }
      var ptr = 0L
      i = 0
      while (i < sizes.length) {
        writeLE(out, ptr, 8)
        ptr += sizes(i).toLong * item
        i += 1
      }
      // one sequence per document: doc_idx = [0, 1, …, n]
      i = 0
      while (i <= sizes.length) { writeLE(out, i.toLong, 8); i += 1 }
    } finally out.close()
  }

  /** One decoded sequence of an indexed dataset. `doc_ix` is the
    * document (per `doc_idx`) the sequence belongs to — the identity
    * mapping for files this writer produced, meaningful for foreign
    * files whose doc_idx groups several sequences per document. */
  final case class MegatronSeq(idx_path: String, seq_ix: Long,
                               doc_ix: Long, n_tokens: Long,
                               ids: Array[Int])

  /** Read every `*.idx`/`*.bin` pair under `dir` — one task per
    * shard, `.bin` streamed. Strict: a bad magic, version, dtype,
    * pointer, doc_idx or physical length fails loudly naming the
    * file; float dtypes are rejected (token-id datasets are integer
    * by construction); an `.idx` without its `.bin` is an error, not
    * an empty read. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val st = fs.globStatus(new Path(base, "*.idx"))
    require(st != null && st.nonEmpty,
      s"$dir: no *.idx files — not an indexed-dataset directory")
    val paths = st.map(_.getPath.toString).sorted.toSeq
    val hconf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    spark.createDataset(paths)
      .repartition(paths.length)
      .flatMap(p => readShard(p, hconf.value))
      .toDF()
  }

  private def readLE(in: java.io.DataInputStream, bytes: Int): Long = {
    var v = 0L
    var i = 0
    while (i < bytes) {
      val b = in.read()
      require(b >= 0, "unexpected EOF")
      v |= (b.toLong & 0xff) << (8 * i)
      i += 1
    }
    v
  }

  private def readShard(idxPath: String,
                        conf: org.apache.hadoop.conf.Configuration)
  : Iterator[MegatronSeq] = {
    val ip = new Path(idxPath)
    val fs = ip.getFileSystem(conf)
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$idxPath: $msg")
    val idxLen = fs.getFileStatus(ip).getLen
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(ip), 1 << 16))
    val (code, sizes, docIdx) =
      try {
        val magic = new Array[Byte](HdrMagic.length)
        in.readFully(magic)
        if (!java.util.Arrays.equals(magic, HdrMagic))
          fail("bad magic — not an MMIDIDX indexed-dataset index")
        val ver = readLE(in, 8)
        if (ver != Version) fail(s"unsupported index version $ver (want 1)")
        val code = in.read()
        val item = itemSize(code) // loud on unknown codes
        if (code == DtypeFloat32 || code == DtypeFloat64)
          fail(s"float dtype code $code — not a token-id dataset")
        val nSeq = readLE(in, 8)
        val nDoc = readLE(in, 8)
        if (nSeq < 0 || nSeq > Int.MaxValue) fail(s"bad sequence count $nSeq")
        if (nDoc < 0 || nDoc > Int.MaxValue) fail(s"bad doc_idx length $nDoc")
        val expect = HdrMagic.length + 8 + 1 + 8 + 8 + 4 * nSeq +
          8 * nSeq + 8 * nDoc
        if (idxLen != expect)
          fail(s"index is $idxLen bytes, layout needs $expect " +
            s"($nSeq sequences, $nDoc doc entries)")
        val sizes = new Array[Int](nSeq.toInt)
        var i = 0
        while (i < sizes.length) {
          val s = readLE(in, 4)
          if (s < 0 || s > Int.MaxValue) fail(s"sequence $i: bad size $s")
          sizes(i) = s.toInt
          i += 1
        }
        var ptr = 0L
        i = 0
        while (i < sizes.length) {
          val p = readLE(in, 8)
          if (p != ptr) fail(s"sequence $i: pointer $p != derived $ptr " +
            "(sizes and pointers disagree)")
          ptr += sizes(i).toLong * item
          i += 1
        }
        val docIdx = new Array[Long](nDoc.toInt)
        i = 0
        while (i < docIdx.length) { docIdx(i) = readLE(in, 8); i += 1 }
        if (docIdx.length > 0) {
          if (docIdx(0) != 0L) fail(s"doc_idx[0] = ${docIdx(0)}, want 0")
          if (docIdx.last != sizes.length.toLong)
            fail(s"doc_idx last = ${docIdx.last}, want ${sizes.length}")
          i = 1
          while (i < docIdx.length) {
            if (docIdx(i) < docIdx(i - 1))
              fail(s"doc_idx[$i] = ${docIdx(i)} decreasing")
            i += 1
          }
        } else if (sizes.nonEmpty) fail("empty doc_idx with sequences")
        (code, sizes, docIdx)
      } finally in.close()
    val item = itemSize(code)
    val binPath = new Path(idxPath.stripSuffix(".idx") + ".bin")
    if (!fs.exists(binPath)) fail(s"missing data file $binPath")
    val totalBytes = sizes.foldLeft(0L)((a, s) => a + s.toLong * item)
    val binLen = fs.getFileStatus(binPath).getLen
    if (binLen != totalBytes)
      fail(s"$binPath is $binLen bytes, index needs $totalBytes")
    val bin = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(binPath), 1 << 16))
    var si = 0
    var di = 0
    new Iterator[MegatronSeq] {
      def hasNext: Boolean = {
        val h = si < sizes.length
        if (!h) bin.close()
        h
      }
      def next(): MegatronSeq = {
        val n = sizes(si)
        val ids = new Array[Int](n)
        var i = 0
        while (i < n) {
          val v = readLE(bin, item)
          if (v > Int.MaxValue)
            fail(s"sequence $si token $i: id $v exceeds Int range")
          ids(i) = v.toInt
          i += 1
        }
        // advance doc cursor: doc d spans sequences [docIdx(d), docIdx(d+1))
        while (di + 1 < docIdx.length && docIdx(di + 1) <= si.toLong)
          di += 1
        val r = MegatronSeq(idxPath, si.toLong, di.toLong, n.toLong, ids)
        si += 1
        r
      }
    }
  }
}
