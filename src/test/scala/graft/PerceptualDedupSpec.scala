package graft

import graft.dedup.Dedup
import graft.multimodal.{Multimodal, PngCodec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Planted-image contract for [[Multimodal.perceptualHash]] + Hamming
  * banding (mm5's machinery): a slightly perturbed copy of an image
  * must land within dHash distance 3 and cluster with its source; an
  * unrelated image must not. The oracle row (mm5) pins the arithmetic
  * against DuckDB; this pins the OPERATOR SEMANTICS on a case where
  * ground truth is known by construction.
  */
class PerceptualDedupSpec extends SparkSpec {

  private val w = 64
  private val h = 32

  private def mediaDF(imgs: Seq[(Long, Array[Byte])]) = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        imgs.map { case (id, px) => Row(id, PngCodec.encode(px, w, h)) }, 2),
      schema)
  }

  test("near-dup image clusters with its source; unrelated image does not") {
    val base = Array.tabulate(w * h)(i => (((i % w) * 3 + (i / w) * 11) % 251).toByte)
    // small local perturbation: a handful of pixels nudged by ±2 —
    // block means move by <1 in a couple of grid cells, so at most a
    // few dHash comparisons can flip
    val near = base.clone()
    Seq(5, 200, 900, 1500).foreach(i => near(i) = (near(i) + 2).toByte)
    // unrelated content: different gradient structure entirely
    val far = Array.tabulate(w * h)(i => (((i % w) * 13 + (i / w) * (i / w)) % 249).toByte)
    val sigs = Multimodal.perceptualHash(mediaDF(Seq(1L -> base, 2L -> near, 3L -> far)))
    val rows = sigs.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(rows(1L)._1, rows(2L)._1) <= 3,
      s"planted near-dup dHash distance ${ham(rows(1L)._1, rows(2L)._1)}")
    assert(ham(rows(1L)._1, rows(3L)._1) > 3)
    val pairs = Dedup.simHashPairsFromSigs(
      sigs.select(col("media_id").as("id"), col("dhash").as("sig")),
      maxDist = 3, bits = 60)
    val cc = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.get(1L).contains(1L) && cc.get(2L).contains(1L))
    assert(!cc.contains(3L)) // no pair touches the unrelated image
    // aHash agrees on the planted pair too (coarser: mean-threshold)
    assert(ham(rows(1L)._2, rows(2L)._2) <= 3)
  }

  private def audioDF(clips: Seq[(Long, Array[Short])]) = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        clips.map { case (id, s) =>
          Row(id, graft.multimodal.WavCodec.encode(s, 8000))
        }, 2),
      schema)
  }

  test("near-dup audio clusters with its source; unrelated clip does not") {
    val n = 4000
    // structured waveform: per-frame energy/rising-step profiles vary
    val base = Array.tabulate(n)(i =>
      ((i % 97) * 23 + (i / 61) * 7 - 1500).toShort)
    // small perturbation: a handful of samples nudged by ±3 — frame
    // energies and rising counts move slightly, at most a few
    // delta-sign comparisons can flip
    val near = base.clone()
    Seq(10, 700, 1900, 3100).foreach(i => near(i) = (near(i) + 3).toShort)
    // unrelated: different modulation structure entirely
    val far = Array.tabulate(n)(i =>
      ((i % 41) * 31 - (i / 13) % 800).toShort)
    val sigs = Multimodal.audioFingerprint(
      audioDF(Seq(1L -> base, 2L -> near, 3L -> far)))
    val rows = sigs.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(rows(1L)._1, rows(2L)._1) <= 3,
      s"planted near-dup ehash distance ${ham(rows(1L)._1, rows(2L)._1)}")
    assert(ham(rows(1L)._1, rows(3L)._1) > 3)
    val pairs = Dedup.simHashPairsFromSigs(
      sigs.select(col("media_id").as("id"), col("ehash").as("sig")),
      maxDist = 3, bits = 60)
    val cc = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.get(1L).contains(1L) && cc.get(2L).contains(1L))
    assert(!cc.contains(3L)) // no pair touches the unrelated clip
    // the rising-step hash agrees on the planted pair too
    assert(ham(rows(1L)._2, rows(2L)._2) <= 3)
  }

  test("sharedFramePairs: an embedded clip is found where the " +
       "whole-video fingerprint misses it; unrelated videos don't pair") {
    import org.apache.spark.sql.functions.encode
    import spark.implicits._
    def payload(seed: Int, n: Int): String =
      Array.tabulate(n)(i => ('a' + ((i * (3 + seed) + seed * 7) % 26)).toChar).mkString
    val clip = payload(1, 256) // 4 original frames -> 2 kept
    // long video: 1024 bytes of OTHER content with the clip spliced in
    // at a kept-frame boundary (offset 512 = original frame 8, kept)
    val host = payload(2, 512) + clip + payload(3, 256)
    val far = payload(9, 1024)
    val docs = Seq((1L, clip), (2L, host), (3L, far)).toDF("doc_id", "text")
    val media = Multimodal.asMedia(
      docs.withColumn("payload", encode(col("text"), "utf-8")),
      "doc_id", "payload", kind = "video", mime = "application/octet-stream")
    val fh = Multimodal.frameDHash(
      Multimodal.sampleFrames(media, frameSize = 64, stride = 2), w = 8, h = 8)
    val pairs = Multimodal.sharedFramePairs(fh, "media_id", "dhash",
        minShared = 2, bucketCap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) >= 2,
      s"embedded clip not found: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    // ...and mm7's whole-video fingerprints are FAR apart (the case
    // mm8 exists for): the host's majority bits track its own content
    val sigs = Multimodal.majorityFingerprint(fh, "media_id", "dhash")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(2L)) > 3)
  }

  test("audioWindowHash: an embedded jingle is found where the " +
       "whole-clip fingerprint misses it; unrelated clips don't pair") {
    // jingle: 192 samples = 3 full 64-sample windows; host: other
    // content with the jingle spliced at a window-ALIGNED offset
    // (640 = 10·64 — the stated alignment boundary of the
    // non-overlapping window model); far: unrelated structure
    def wave(seed: Int, n: Int): Array[Short] =
      Array.tabulate(n)(i =>
        (((i % (89 + seed)) * (17 + seed) + (i / 31) * seed) % 3000 - 1500)
          .toShort)
    val jingle = wave(1, 192)
    val host = wave(2, 640) ++ jingle ++ wave(3, 192)
    val far = wave(9, 1024)
    val media = audioDF(Seq(1L -> jingle, 2L -> host, 3L -> far))
    val wh = Multimodal.audioWindowHash(media, windowSamples = 64)
    val pairs = Multimodal.sharedFramePairs(wh, "media_id", "whash",
        minShared = 2, bucketCap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) >= 2,
      s"embedded jingle not found: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    // ...and mm6's whole-clip fingerprints are FAR apart (the case
    // mm9 exists for): the host's 61 frames span its own content, so
    // the splice shifts every frame boundary
    val sigs = Multimodal.audioFingerprint(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(2L)) > 3,
      "whole-clip fingerprint unexpectedly catches the embedding")
    // OVERLAPPING hop closes the alignment boundary half-way: a
    // jingle at offset 608 = 19·32 is NOT on the 64 grid (hop = 64
    // misses it on the host side) but IS on the 32 grid (hop = 32
    // finds it)
    val host32 = wave(2, 608) ++ jingle ++ wave(3, 224)
    val media32 = audioDF(Seq(1L -> jingle, 2L -> host32, 3L -> far))
    def sharedAt(hop: Int) = Multimodal.sharedFramePairs(
        Multimodal.audioWindowHash(media32, windowSamples = 64, hop = hop),
        "media_id", "whash", minShared = 2, bucketCap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!sharedAt(64).contains((1L, 2L)),
      "64-aligned windows should miss the 32-aligned embedding")
    assert(sharedAt(32).contains((1L, 2L)),
      "hop=32 should catch the 32-aligned embedding")
  }

  test("perturbed video clusters with its source; different video does not") {
    import org.apache.spark.sql.functions.encode
    import spark.implicits._
    // 'videos' = byte payloads carved into 64-byte 8x8 frames (stride
    // 2 -> 8 kept frames from 1024 bytes); a one-frame perturbation
    // must be erased by the majority-bit fingerprint
    def payload(seed: Int): String =
      Array.tabulate(1024)(i => ('a' + ((i * (3 + seed) + seed * 7) % 26)).toChar).mkString
    val base = payload(1)
    // bytes 128-131 sit in original frame 2 — a frame stride=2 KEEPS
    // (frames 0,2,4,... = byte ranges [0,64), [128,192), ...); the
    // first draft hit bytes 200-203 in dropped frame 3, which made
    // the robustness assertion vacuous (review catch)
    val near = base.substring(0, 128) + "XXXX" + base.substring(132)
    val far = payload(9)
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val media = Multimodal.asMedia(
      docs.withColumn("payload", encode(col("text"), "utf-8")),
      "doc_id", "payload", kind = "video", mime = "application/octet-stream")
    val fh = Multimodal.frameDHash(
      Multimodal.sampleFrames(media, frameSize = 64, stride = 2), w = 8, h = 8)
    // non-vacuity: the perturbation really changed a KEPT frame's hash
    val perFrame = fh.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(perFrame.keys.count(_._1 == 1L) == 8)
    assert(perFrame.exists { case ((id, fi), h) =>
      id == 1L && perFrame.get((2L, fi)).exists(_ != h) },
      "perturbation did not alter any kept frame hash — test vacuous")
    val sigs = Multimodal.majorityFingerprint(fh, "media_id", "dhash")
    val rows = sigs.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.values.forall(_._1 == 8L), s"want 8 kept frames: $rows")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(rows(1L)._2, rows(2L)._2) <= 3,
      s"one-frame perturbation moved the majority fingerprint by " +
        s"${ham(rows(1L)._2, rows(2L)._2)} bits")
    assert(ham(rows(1L)._2, rows(3L)._2) > 3)
    val pairs = Dedup.simHashPairsFromSigs(
      sigs.select(col("media_id").as("id"), col("vhash").as("sig")),
      maxDist = 3, bits = 60)
    val cc = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.get(1L).contains(1L) && cc.get(2L).contains(1L))
    assert(!cc.contains(3L))
  }

  test("identical payloads hash identically regardless of partitioning") {
    val img = Array.tabulate(w * h)(i => ((i * 37 + 5) % 256).toByte)
    val sigs = Multimodal.perceptualHash(
      mediaDF(Seq(10L -> img, 11L -> img.clone())))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(sigs.size == 1)
  }
}
