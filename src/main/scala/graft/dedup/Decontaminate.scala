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

  /** Contamination ratio: hits / max(shingles, 1), 4 dp — ONE
    * definition so the exact and Bloom paths can never diverge. */
  private def frac(num: Column, den: Column): Column =
    round(num.cast("double") / greatest(den, lit(1)).cast("double"), 4)

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

  /** EVAL-side contamination report (t30) — the direction [[ngramOverlap]]
    * deliberately does not cover: per EVAL document, the fraction of
    * its distinct n-grams that appear anywhere in the TRAIN corpus,
    * plus a `dirty` gate — the GPT-3 App. C / PaLM "clean eval subset"
    * analysis a release runs to decide which benchmark numbers are
    * trustworthy. Semantically this is `ngramOverlap(eval, train)`,
    * and the spec pins that equality — but that call would broadcast
    * the TRAIN gram set, which at 100 TB does not exist as a
    * broadcastable object. The scale shape here inverts the
    * asymmetry: the EVAL gram set (a sliver — eval suites are at most
    * millions of n-grams) broadcasts INTO the train scan as a
    * map-side semi-join, so train text never shuffles and the only
    * train-wide exchange carries the semi-join survivors into a
    * map-combined distinct whose result (`hitGrams` ⊆ eval grams) is
    * itself a broadcastable sliver. The `dirty` gate thresholds the
    * RAW ratio (rounding display-only — the jaccardPairs discipline).
    *
    * @return one row per eval doc: id, n_shingles, n_hit, overlap
    *         (4 dp), dirty.
    */
  def evalContamination(train: DataFrame, eval: DataFrame, idCol: String,
                        textCol: String, n: Int = 3,
                        dirtyAt: Double = 0.2): DataFrame = {
    val evalSh = graft.Materialize.reuse(
      eval.select(col(idCol), TextFns.shingles(col(textCol), n).as("__sh")))
    val evalGrams = evalSh.select(explode(col("__sh")).as("__g")).distinct()
    val hitGrams = train
      .select(explode(TextFns.shingles(col(textCol), n)).as("__g"))
      .join(broadcast(evalGrams), Seq("__g"), "left_semi")
      .distinct()
      .withColumn("__hit", lit(1))
    val raw = col("n_hit").cast("double") /
      greatest(col("n_shingles"), lit(1)).cast("double")
    evalSh
      .select(col(idCol), size(col("__sh")).cast("long").as("n_shingles"),
        explode_outer(col("__sh")).as("__g"))
      .join(broadcast(hitGrams), Seq("__g"), "left")
      .groupBy(idCol)
      .agg(first("n_shingles").as("n_shingles"),
        count(col("__hit")).as("n_hit"))
      .select(col(idCol), col("n_shingles"), col("n_hit"),
        round(raw, 4).as("overlap"), (raw >= dirtyAt).as("dirty"))
  }

  /** Bloom-prefiltered decontamination — the shape for when the
    * benchmark set has outgrown executor memory (so [[ngramOverlap]]'s
    * broadcast is off the table) but the corpus-side exchange into a
    * shuffled semi-join would still be O(corpus n-grams). A Bloom
    * filter over the benchmark n-gram hashes (built by Spark's own
    * `bloom_filter_agg`, delivered as a scalar subquery so the probe
    * — Catalyst's codegen'd `BloomFilterMightContain` — stays inside
    * the corpus scan's codegen span) drops every n-gram that cannot
    * match BEFORE the join exchange; the exact equi-join then removes
    * the filter's false positives, so the result is IDENTICAL to
    * [[ngramOverlap]] — the Bloom pass changes the exchange volume
    * (expected: fpp of the clean corpus stream), never the answer.
    *
    * Exchanges at scale: benchmark grams aggregate once (materialized
    * — the set feeds both the filter build and the exact verify);
    * the corpus-side join exchange carries ONLY Bloom survivors; hit
    * counts and the final totals join are (id)-keyed rows. The
    * tokenize+shingle pass over corpus text runs once (materialized),
    * and corpus text itself never enters any exchange.
    *
    * Sizing contract: `numBits` defaults to 12·`expectedItems`
    * (~12 bits/item ≈ 0.3% false-positive rate at the expected load) —
    * size `expectedItems` to the BENCHMARK's distinct n-gram count, or
    * pass `expectedItems <= 0` to MEASURE it (one count over the
    * already-materialized benchmark gram set — the benchmark side is
    * tiny by this function's own premise, so the extra job is
    * negligible and the filter can never be silently undersized).
    * Undersizing never changes the answer (the exact verify join
    * removes false positives) but silently erases the exchange-volume
    * reduction that is this function's whole purpose: at 8 bits/item
    * the fpp is ~2%, at 4 bits/item ~15% of the clean corpus stream
    * leaks through to the join.
    */
  def ngramOverlapBloom(docs: DataFrame, bench: DataFrame, idCol: String,
                        textCol: String, n: Int = 3,
                        expectedItems: Long = -1L,
                        numBits: Long = -1L): DataFrame = {
    import org.apache.spark.sql.GraftSqlShims
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val benchGrams = graft.Materialize.reuse(bench
      .select(explode(TextFns.shingles(col(textCol), n)).as("__g"))
      .distinct())
    val items =
      if (expectedItems > 0) expectedItems
      else math.max(benchGrams.count(), 1L)
    val bits = if (numBits > 0) numBits else 12L * items
    // bloom_filter_agg exists in Catalyst but is not SQL-registered —
    // build the aggregate expression directly
    val bloom = benchGrams
      .select(GraftSqlShims.column(new BloomFilterAggregate(
          GraftSqlShims.expression(xxhash64(col("__g"))),
          Literal(items), Literal(bits))
        .toAggregateExpression()).as("__bf"))
      .scalar()
    def mightContain(g: Column): Column =
      GraftSqlShims.column(BloomFilterMightContain(
        GraftSqlShims.expression(bloom),
        GraftSqlShims.expression(xxhash64(g))))
    val base = graft.Materialize.reuse(docs.select(col(idCol),
      TextFns.shingles(col(textCol), n).as("__sh")))
    val survivors = base
      .select(col(idCol), explode(col("__sh")).as("__g"))
      .where(mightContain(col("__g")))
    val hits = survivors
      .join(benchGrams, Seq("__g"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("__hits"))
    base.select(col(idCol), size(col("__sh")).cast("long").as("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("__hits"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination", frac(col("n_contaminated"), col("n_shingles")))
  }
}
