package graft.dedup

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: per training document, how many of its
  * distinct word n-grams appear anywhere in an evaluation/benchmark
  * set — the standard overlap test run before training (GPT-3 App. C /
  * Llama-style 13-gram checks; here n is a parameter because the
  * corpus documents are short).
  *
  * Shape for scale (the asymmetry is the whole design): the corpus is
  * ~everything (100 TB), the benchmark is tiny (eval suites are at
  * most millions of n-grams). So the benchmark side is deduplicated
  * and BROADCAST, the corpus side streams map-side through the
  * semi-join — corpus text is never shuffled; the only corpus-wide
  * exchange carries (id, partial count) pairs out of a map-side
  * combined aggregation. Set `broadcastBench = false` only if the
  * benchmark outgrows executor memory, which falls back to a shuffled
  * semi-join on the n-gram.
  */
object Decontaminate {

  /** @return one row per `docs` row: id, n_shingles (distinct n-grams),
    *         n_contaminated (of those, how many occur in `bench`),
    *         contamination (their ratio, 0 for shingle-less docs).
    *
    * ONE corpus scan: the `(id, shingles)` projection is computed once,
    * `n_shingles` rides alongside the `explode_outer` (outer keeps
    * zero-shingle docs in-plan — no second scan + outer join to
    * recover them), and the benchmark probe is a broadcast LEFT join
    * whose hit marker is counted in the same per-id aggregation that
    * carries `first(n_shingles)`. Tokenize+shingle — the expensive
    * part at 100 TB — runs exactly once per document.
    */
  def ngramOverlap(docs: DataFrame, bench: DataFrame, idCol: String,
                   textCol: String, n: Int = 3,
                   broadcastBench: Boolean = true): DataFrame = {
    val benchGrams0 = bench
      .select(explode(TextFns.shingles(col(textCol), n)).as("__g"))
      .distinct()
      .withColumn("__hit", lit(1))
    val benchGrams = if (broadcastBench) broadcast(benchGrams0) else benchGrams0
    def frac(num: Column, den: Column): Column =
      round(num.cast("double") / greatest(den, lit(1)).cast("double"), 4)
    docs
      .select(col(idCol), TextFns.shingles(col(textCol), n).as("__sh"))
      .select(col(idCol), size(col("__sh")).cast("long").as("n_shingles"),
        explode_outer(col("__sh")).as("__g"))
      .join(benchGrams, Seq("__g"), "left")
      .groupBy(idCol)
      .agg(first("n_shingles").as("n_shingles"),
        count(col("__hit")).as("n_contaminated"))
      .withColumn("contamination", frac(col("n_contaminated"), col("n_shingles")))
  }
}
