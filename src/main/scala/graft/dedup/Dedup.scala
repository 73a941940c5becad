package graft.dedup

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard — designed for the 100 TB
  * path (shingle → signature → band → bucket-join; never an O(n²)
  * full cross join except the explicitly-exact verifier).
  */
object Dedup {

  /** Exact dedup on a normalized fingerprint: keep the smallest id per
    * fingerprint group (hash-groupBy — one shuffle on the md5 key,
    * map-side partial aggregation).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fp", TextFns.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Rows surviving exact dedup (first id per fingerprint wins). */
  def exactSurvivors(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(TextFns.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact pairwise n-gram Jaccard ≥ `threshold` within `blockCols`
    * blocks. O(block²) — the *correctness baseline*; use
    * [[minHashCandidates]] at scale. Returns (id_a, id_b, jaccard).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double,
                   blockCols: Seq[String]): DataFrame = {
    val sh = df.select(
      (blockCols.map(col) :+ col(idCol).as("id") :+
        TextFns.shingles(col(textCol), n).as("sh")): _*)
    val a = sh.select(blockCols.map(col) :+ col("id").as("id_a") :+ col("sh").as("sh_a"): _*)
    val b = sh.select(blockCols.map(col) :+ col("id").as("id_b") :+ col("sh").as("sh_b"): _*)
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val uni = (size(col("sh_a")) + size(col("sh_b"))).cast("double") - inter
    a.join(b, blockCols).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", round(inter / uni, 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: `k` independent minima of per-shingle 64-bit
    * hashes (`xxhash64(shingle, seed_i)`). Pure built-in expressions.
    */
  def minHashSignature(shingleCol: Column, k: Int): Column = {
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleCol, s => xxhash64(s, i))))
  }

  /** MinHash-LSH candidate pairs: signatures split into `bands` bands
    * of `rows` hashes; docs sharing any band bucket become candidates.
    * Collision probability ≈ 1-(1-j^rows)^bands (s-curve). Output has
    * exact Jaccard attached and filtered to ≥ `threshold` — LSH recall
    * is probabilistic but precision is exact.
    *
    * Scale shape: explode(bands) → shuffle on (band, bucket) →
    * within-bucket self-join. Exact-duplicate floods (many docs in one
    * bucket) are the skew risk — AQE skew-join handles moderate cases;
    * run [[exact]] first so identical docs never reach LSH.
    */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, bands: Int = 16, rows: Int = 4,
                        threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      TextFns.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = sh.withColumn("sig", minHashSignature(col("sh"), bands * rows))
    val banded = sig.select(col("id"), col("sh"),
      posexplode(array((0 until bands).map(
        b => xxhash64(slice(col("sig"), b * rows + 1, rows))): _*))
        .as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val uni = (size(col("sh_a")) + size(col("sh_b"))).cast("double") - inter
    l.join(r, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("jaccard", round(inter / uni, 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over token hashes: bit b of the signature is the
    * sign of Σ_tokens (±1 by token-hash bit b). Computed in one pass
    * per row with built-in higher-order functions (no UDF): for each
    * bit, aggregate +1/-1 votes.
    */
  def simHash(textCol: Column): Column = {
    val th = transform(TextFns.tokens(textCol), t => xxhash64(t))
    // votes: for bit b, count tokens with bit set minus tokens without
    (0 until 64).map { b =>
      val votes = aggregate(th, lit(0L),
        (v, h) => v + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup candidates: Hamming distance ≤ `maxDist` found
    * by chunk-banding (pigeonhole: 4 chunks of 16 bits — any pair with
    * distance ≤ 3 shares a chunk). Verification via bit_count(xor).
    */
  def simHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        maxDist: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))
    val chunked = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(
        c => shiftright(col("sig"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "ck")))
    val l = chunked.select(col("chunk"), col("ck"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = chunked.select(col("chunk"), col("ck"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("chunk", "ck")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }
}
