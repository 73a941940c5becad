package graft

import java.nio.file.{Files, Paths}

import graft.sources.MegatronSink
import org.apache.spark.sql.functions._

/** Byte-layout and strict-reader gates for the Megatron/fairseq
  * indexed-dataset export (`.bin` + `.idx`) — the WriteSinkSpec
  * discipline: the `.idx` fixture is hand-assembled from the
  * published layout (independent of the writer), endianness pinned
  * byte by byte, every loud reader path exercised.
  */
class MegatronSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft-mega-$name")
    d.toString
  }

  /** Hand-assembled little-endian .idx for the given sizes —
    * NOT via the writer: this is the independent fixture. */
  private def handIdx(dtype: Int, sizes: Seq[Int]): Array[Byte] = {
    val item = dtype match {
      case 8 => 2; case 4 => 4; case 5 => 8; case 1 => 1
      case 3 => 2; case 2 => 1
    }
    val out = new java.io.ByteArrayOutputStream()
    def le(v: Long, n: Int): Unit =
      (0 until n).foreach(i => out.write(((v >>> (8 * i)) & 0xff).toInt))
    out.write("MMIDIDX".getBytes("US-ASCII")); out.write(0); out.write(0)
    le(1L, 8)                       // version
    out.write(dtype)                // dtype code
    le(sizes.length.toLong, 8)      // n sequences
    le(sizes.length.toLong + 1, 8)  // doc_idx length
    sizes.foreach(s => le(s.toLong, 4))
    var ptr = 0L
    sizes.foreach { s => le(ptr, 8); ptr += s.toLong * item }
    (0 to sizes.length).foreach(i => le(i.toLong, 8))
    out.toByteArray
  }

  /** All messages down the cause chain — Spark wraps task failures
    * in SparkException layers of varying depth. */
  private def chainMsg(e: Throwable): String = {
    val sb = new StringBuilder
    var t = e
    while (t != null) { sb.append(Option(t.getMessage).getOrElse("")); t = t.getCause }
    sb.toString
  }

  private def handBinU16(ids: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    ids.foreach { v => out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    out.toByteArray
  }

  test("writer emits the exact hand-assembled byte layout (uint16)") {
    val dir = tmp("layout")
    val df = Seq(
      (0L, 1L, Array(3, 515, 65535)),
      (0L, 2L, Array(7)),
      (1L, 1L, Array(256, 0))).toDF("shard", "pos", "ids")
    MegatronSink.write(df, dir, "shard", "pos", "ids", numShards = 2)
    val idx0 = Files.readAllBytes(Paths.get(dir, "shard-00000.idx"))
    assert(idx0.toSeq == handIdx(8, Seq(3, 1)).toSeq,
      "shard 0 .idx differs from the hand-assembled layout")
    val bin0 = Files.readAllBytes(Paths.get(dir, "shard-00000.bin"))
    assert(bin0.toSeq == handBinU16(Seq(3, 515, 65535, 7)).toSeq,
      "shard 0 .bin differs from hand-packed uint16 LE")
    val idx1 = Files.readAllBytes(Paths.get(dir, "shard-00001.idx"))
    assert(idx1.toSeq == handIdx(8, Seq(2)).toSeq)
    val bin1 = Files.readAllBytes(Paths.get(dir, "shard-00001.bin"))
    assert(bin1.toSeq == handBinU16(Seq(256, 0)).toSeq)
    // no .tmp litter after commit
    assert(!new java.io.File(dir).list().exists(_.endsWith(".tmp")))
  }

  test("round trip: reader returns every sequence in order with exact ids") {
    val dir = tmp("rt")
    val df = Seq(
      (0L, 2L, Array(9, 8)),
      (0L, 1L, Array(1, 2, 3)),
      (1L, 1L, Array[Int]()),          // empty sequence round-trips
      (1L, 2L, Array(65535))).toDF("shard", "pos", "ids")
    MegatronSink.write(df, dir, "shard", "pos", "ids", numShards = 2)
    val back = MegatronSink.read(spark, dir)
      .select(regexp_extract(col("idx_path"), "shard-(\\d+)\\.idx$", 1)
        .cast("int").as("shard"), col("seq_ix"), col("doc_ix"),
        col("n_tokens"), col("ids"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getSeq[Int](4).toList)).sortBy(x => (x._1, x._2))
    assert(back.toList == List(
      (0, 0L, 0L, 3L, List(1, 2, 3)),  // pos=1 first: order respected
      (0, 1L, 1L, 2L, List(9, 8)),
      (1, 0L, 0L, 0L, Nil),
      (1, 1L, 1L, 1L, List(65535))))
  }

  test("int32 dtype path round-trips ids beyond the uint16 range") {
    val dir = tmp("i32")
    val df = Seq((0L, 1L, Array(70000, 0, Int.MaxValue)))
      .toDF("shard", "pos", "ids")
    MegatronSink.write(df, dir, "shard", "pos", "ids", numShards = 1,
      dtypeCode = MegatronSink.DtypeInt32)
    val back = MegatronSink.read(spark, dir)
      .select("ids").as[Seq[Int]].collect()
    assert(back.toList == List(Seq(70000, 0, Int.MaxValue)))
    // best_fitting_dtype mirrors Megatron's 65500 threshold exactly
    assert(MegatronSink.bestFittingDtype(65499) == MegatronSink.DtypeUint16)
    assert(MegatronSink.bestFittingDtype(65500) == MegatronSink.DtypeInt32)
  }

  test("packed mode: concat-and-split at the budget, exact layout, one final partial") {
    val dir = tmp("packed")
    // shard 0 stream in pos order: 1,2,3 | 4,5 | 6 -> budget 4 packs
    // into [1,2,3,4] and the partial [5,6]
    val df = Seq(
      (0L, 2L, Array(4, 5)),
      (0L, 1L, Array(1, 2, 3)),
      (0L, 3L, Array(6))).toDF("shard", "pos", "ids")
    MegatronSink.write(df, dir, "shard", "pos", "ids", numShards = 1,
      packBudget = 4)
    val idx = Files.readAllBytes(Paths.get(dir, "shard-00000.idx"))
    assert(idx.toSeq == handIdx(8, Seq(4, 2)).toSeq,
      "packed .idx differs from the hand-assembled layout")
    val bin = Files.readAllBytes(Paths.get(dir, "shard-00000.bin"))
    assert(bin.toSeq == handBinU16(Seq(1, 2, 3, 4, 5, 6)).toSeq)
    val back = MegatronSink.read(spark, dir)
      .select("seq_ix", "ids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).sortBy(_._1)
    assert(back.toList == List(0L -> List(1, 2, 3, 4), 1L -> List(5, 6)))
    // an exact-multiple stream has NO partial sequence
    val dir2 = tmp("packed2")
    MegatronSink.write(Seq((0L, 1L, Array(7, 8, 9, 10)))
      .toDF("shard", "pos", "ids"), dir2, "shard", "pos", "ids",
      numShards = 1, packBudget = 2)
    val idx2 = Files.readAllBytes(Paths.get(dir2, "shard-00000.idx"))
    assert(idx2.toSeq == handIdx(8, Seq(2, 2)).toSeq)
  }

  test("write is loud on out-of-range and sentinel ids") {
    val dir = tmp("range")
    val over = Seq((0L, 1L, Array(70000))).toDF("shard", "pos", "ids")
    val e1 = intercept[Exception] {
      MegatronSink.write(over, dir, "shard", "pos", "ids", numShards = 1)
    }
    assert(chainMsg(e1).contains("out of range"))
    val neg = Seq((0L, 1L, Array(-1))).toDF("shard", "pos", "ids")
    val e2 = intercept[Exception] {
      MegatronSink.write(neg, dir, "shard", "pos", "ids", numShards = 1)
    }
    assert(chainMsg(e2).contains("out of range"))
  }

  test("reader is loud on every corruption: magic, version, dtype, pointers, lengths") {
    def freshPair(): String = {
      val dir = tmp("corrupt")
      val df = Seq((0L, 1L, Array(1, 2)), (0L, 2L, Array(3)))
        .toDF("shard", "pos", "ids")
      MegatronSink.write(df, dir, "shard", "pos", "ids", numShards = 1)
      dir
    }
    // drop Hadoop LocalFileSystem's .crc sidecars so the READER's
    // own strict checks (not the client checksum layer) are what fire
    def dropCrc(dir: String): Unit =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    def mutate(dir: String, f: Array[Byte] => Array[Byte]): Unit = {
      val p = Paths.get(dir, "shard-00000.idx")
      Files.write(p, f(Files.readAllBytes(p)))
      dropCrc(dir)
    }
    def loud(dir: String, frag: String): Unit = {
      val e = intercept[Exception] {
        MegatronSink.read(spark, dir).collect()
      }
      val m = chainMsg(e)
      assert(m.contains(frag), s"wanted '$frag' in: $m")
    }
    // bad magic
    val d1 = freshPair()
    mutate(d1, b => { b(0) = 'X'.toByte; b })
    loud(d1, "bad magic")
    // bad version
    val d2 = freshPair()
    mutate(d2, b => { b(9) = 9; b })
    loud(d2, "unsupported index version")
    // float dtype rejected for token ids
    val d3 = freshPair()
    mutate(d3, b => { b(17) = 6; b })
    loud(d3, "float dtype")
    // pointer drift (pointers live after 9+8+1+8+8+4*2 = 42; flip 2nd)
    val d4 = freshPair()
    mutate(d4, b => { b(42 + 8) = 99; b })
    loud(d4, "pointer")
    // truncated index
    val d5 = freshPair()
    mutate(d5, b => b.dropRight(4))
    loud(d5, "layout needs")
    // .bin length mismatch
    val d6 = freshPair()
    val bp = Paths.get(d6, "shard-00000.bin")
    Files.write(bp, Files.readAllBytes(bp).dropRight(2))
    dropCrc(d6)
    loud(d6, "index needs")
    // orphan .idx (missing .bin)
    val d7 = freshPair()
    Files.delete(Paths.get(d7, "shard-00000.bin"))
    dropCrc(d7)
    loud(d7, "missing data file")
    // empty dir
    val d8 = tmp("empty")
    loud(d8, "no *.idx files")
  }

  test("reader accepts a foreign hand-written pair (interop, grouped doc_idx)") {
    // a file as another tool would write it: 3 sequences, doc_idx
    // groups them into 2 documents ([0, 2, 3]) — sentence-split shape
    val dir = tmp("foreign")
    val item = 2
    val sizes = Seq(2, 1, 3)
    val out = new java.io.ByteArrayOutputStream()
    def le(v: Long, n: Int): Unit =
      (0 until n).foreach(i => out.write(((v >>> (8 * i)) & 0xff).toInt))
    out.write("MMIDIDX".getBytes("US-ASCII")); out.write(0); out.write(0)
    le(1L, 8); out.write(8); le(3L, 8); le(3L, 8)
    sizes.foreach(s => le(s.toLong, 4))
    var ptr = 0L
    sizes.foreach { s => le(ptr, 8); ptr += s.toLong * item }
    Seq(0L, 2L, 3L).foreach(le(_, 8))
    Files.write(Paths.get(dir, "ext.idx"), out.toByteArray)
    Files.write(Paths.get(dir, "ext.bin"),
      handBinU16(Seq(10, 11, 20, 30, 31, 32)))
    val rows = MegatronSink.read(spark, dir)
      .select("seq_ix", "doc_ix", "ids").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toList))
      .sortBy(_._1)
    assert(rows.toList == List(
      (0L, 0L, List(10, 11)),
      (1L, 0L, List(20)),       // doc 0 spans sequences [0, 2)
      (2L, 1L, List(30, 31, 32))))
  }
}
