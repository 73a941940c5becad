package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus mixture sampling — the standard way a
  * training-data pipeline takes domain-weighted subsamples and
  * train/validation splits: keep a row iff a content-derived hash
  * fraction falls under the row's target rate. Hash-based (not RNG)
  * so the decision is a pure function of (salt, id): stable across
  * runs, partitionings, engines, and re-executions — re-running a
  * 100 TB sampling job yields byte-identical splits, and adding new
  * rows never flips old decisions (the property reservoir/RNG
  * sampling lacks).
  *
  * The fraction is the high 60 bits of md5(salt:id) over 2⁶⁰ — the
  * same construction as the oracled LSH planes (Similarity.md5Planes),
  * reproducible in any engine with md5 + hex parsing.
  */
object Mixture {

  /** High 60 bits of md5(salt:key) as a non-negative BIGINT — the
    * integer form behind [[hashFraction]]; reproducible in any engine
    * with md5 + hex parsing (DuckDB:
    * `CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)`). */
  def hashLong60(key: Column, salt: String): Column =
    conv(substring(md5(concat_ws(":", lit(salt), key.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** Uniform [0,1) hash fraction of (salt, key) — engine-reproducible. */
  def hashFraction(key: Column, salt: String): Column =
    hashLong60(key, salt).cast("double") / lit(1.152921504606846976e18)

  /** Keep each row iff hashFraction < the rate of its `keyCol` value;
    * rows whose key has no configured rate are dropped. The rate
    * table is a handful of rows → broadcast; the corpus side streams
    * map-only (no shuffle anywhere).
    */
  def sampleByRate(df: DataFrame, idCol: String, keyCol: String,
                   rates: Map[String, Double], salt: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rateTable = broadcast(rates.toSeq.toDF(keyCol, "__rate"))
    df.join(rateTable, Seq(keyCol))
      .filter(hashFraction(col(idCol), salt) < col("__rate"))
      .drop("__rate")
  }

  /** [[sampleByRate]] with the rate table as a DATAFRAME (`keyCols` +
    * a `rate` column) — the form that composes directly with
    * [[temperatureRates]]' output and with STREAM-static joins
    * ([[graft.streaming.Streaming.temperatureMixtureStream]]): the
    * rates side broadcasts, the corpus side streams map-only, and the
    * keep decision is the same stateless (salt, id) hash coin — so a
    * batch run and a streaming run over the same rows keep IDENTICAL
    * subsets by construction. Rows whose key has no rate row drop;
    * the `rate` column rides along in the output (cp2's shape).
    */
  def sampleByRates(df: DataFrame, idCol: String, keyCols: Seq[String],
                    rates: DataFrame, salt: String): DataFrame =
    df.join(broadcast(rates), keyCols)
      .filter(hashFraction(col(idCol), salt) < col("rate"))

  /** Temperature-scaled mixture rates (the multilingual re-balancing
    * rule of Conneau & Lample 2019 / XLM-R, α ∈ (0,1]): sampling
    * probability p_g ∝ c_g^α over per-stratum token counts c_g —
    * α = 1 keeps natural proportions, α → 0 flattens toward uniform,
    * up-weighting low-resource strata. Rates are per-row keep
    * probabilities against a token budget of `targetFraction` of the
    * corpus: `rate_g = min(1, frac·Σc·p_g / c_g)`, so the expected
    * kept token mass is the budget (up to the cap). Compose with
    * [[sampleByRate]]'s hash coin for the deterministic subsample.
    *
    * Determinism contract: c_g^α is quantized to integer micro-units
    * before the normalizing sum, so Z is order-independent integer
    * math; the rate is then a fixed chain of IEEE ops over exact
    * integers, rounded to `dp` decimals. For α = 0.5 the power is
    * evaluated as `sqrt` — correctly rounded per IEEE 754 in every
    * engine, so the registered oracle query is bit-exact by
    * construction (general α rides `pow`, within 1 ulp, absorbed by
    * the micro-quantization in practice).
    *
    * Shape for scale: `profile` is stratum-cardinality rows (the
    * cp1 output, not the corpus); everything here is arithmetic over
    * a handful of rows plus one 1-row broadcast.
    */
  def temperatureRates(profile: DataFrame, keyCols: Seq[String],
                       countCol: String, alpha: Double,
                       targetFraction: Double, dp: Int = 6): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(targetFraction > 0, s"positive targetFraction, got $targetFraction")
    val g = keyCols.map(col)
    val c = col(countCol).cast("double")
    val powC = if (alpha == 0.5) sqrt(c) else pow(c, lit(alpha))
    // in-plan guards (the store's M1 raise discipline): a zero/negative
    // count would put 0/0 = NaN into its rate — and least(1.0, NaN)
    // treats NaN as largest, silently granting the empty stratum rate
    // 1.0; a count past ~9.2e12 (at alpha→1) overflows the micro-unit
    // long and corrupts Z. Both are malformed-profile states that must
    // fail loudly, not sample wrong.
    val cChecked = when(col(countCol).isNull || col(countCol) <= 0,
        raise_error(concat(lit("temperatureRates: non-positive count for stratum "),
          concat_ws("/", g.map(_.cast("string")): _*))))
      .when(lit(1e6) * powC >= lit(Long.MaxValue.toDouble),
        raise_error(concat(lit("temperatureRates: count overflows micro-units for stratum "),
          concat_ws("/", g.map(_.cast("string")): _*))))
      .otherwise(col(countCol).cast("long"))
    val base = graft.Materialize.reuse(profile.select(
      g :+ cChecked.as("__c")
        :+ round(lit(1e6) * powC).cast("long").as("__zq"): _*))
    // decimal(38,0) sums: exact integer math immune to Long overflow
    // when Σ c_g or Σ c_g^α micro-units exceed 2⁶³ across strata
    val tot = base.agg(
      sum(col("__c").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("__tot"),
      sum(col("__zq").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("__Z"))
    base.crossJoin(broadcast(tot))
      .select(g :+ round(least(lit(1.0),
        lit(targetFraction) *
          ((col("__tot").cast("double") * col("__zq").cast("double")) /
           (col("__Z").cast("double") * col("__c").cast("double")))),
        dp).as("rate"): _*)
  }

  /** EXACT stratified sampling: per stratum (`keyCol` value) keep
    * exactly `ceil(rate · n_g)` rows, chosen deterministically by
    * md5-hash order of (salt, id) — the exact-allocation companion to
    * [[sampleByRate]]'s per-row coin (binomial-noise counts, right for
    * unbounded streams; this form hits bounded targets exactly, e.g.
    * assembling a fixed-size training mix). Strata without a
    * configured rate are dropped.
    *
    * Shape for scale: rates broadcast; one exchange on the stratum
    * key + a rank window per stratum. The rank bound is per-group
    * data so WindowGroupLimit cannot prune it — for strata larger
    * than an executor's sort budget use [[sampleByRate]], or refine:
    * Bernoulli pre-filter at rate·(1+ε), then exact rank on the
    * survivors.
    */
  def stratifiedSample(df: DataFrame, idCol: String, keyCol: String,
                       rates: Map[String, Double], salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val rateTable = broadcast(rates.toSeq.toDF(keyCol, "__rate"))
    val wp = Window.partitionBy(keyCol)
    val wo = wp.orderBy(md5(concat_ws(":", lit(salt), col(idCol).cast("string"))))
    df.join(rateTable, Seq(keyCol))
      .withColumn("__rk", row_number().over(wo))
      .withColumn("__n", count(lit(1)).over(wp))
      .filter(col("__rk") <= ceil(col("__rate") * col("__n")))
      .drop("__rate", "__rk", "__n")
  }

  /** Deterministic epoch shuffle + shard assignment (t29) — the
    * training-data shuffle every run actually ships (the
    * WebDataset/Megatron discipline: a training job must read its
    * corpus in a pseudo-random order that is REPRODUCIBLE — resume
    * from step k, re-run a failed job, audit which samples a
    * checkpoint saw — and different per epoch): each row keys on
    * `ekey = md5(seed:id)` (the [[hashLong60]] coin), lands in shard
    * `ekey mod shards`, and takes `epoch_pos` = its 1-based rank
    * within the shard by `(ekey, id)` — a total order, id breaking
    * the ~2⁻⁶⁰ hash ties. A new seed is a fresh independent
    * permutation; adding rows later never REORDERS surviving pairs
    * within a shard (ranks shift, relative order is hash-fixed).
    *
    * Shape for scale: ONE hash exchange on shard + a per-shard sort —
    * the terasort shape; the only window partitions by shard, so
    * with `shards` sized to ~1-10 GB of rows each (10⁴-10⁵ at
    * 100 TB) every rank task sorts a spill-backed slice, and NO
    * global window exists. The sort carries (id, ekey) pairs only —
    * a training loader joins text back by id per shard, or the
    * caller selects payload columns through.
    */
  def epochShuffle(df: DataFrame, idCol: String, seed: String,
                   shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val ekey = hashLong60(col(idCol), seed)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard")).orderBy(col("__ekey"), col(idCol))
    df.select(col(idCol), ekey.as("__ekey"),
        pmod(ekey, lit(shards.toLong)).as("__shard"))
      .withColumn("__pos", row_number().over(w))
      .select(col(idCol), col("__ekey").as("ekey"),
        col("__shard").as("shard"),
        col("__pos").cast("long").as("epoch_pos"))
  }
}
