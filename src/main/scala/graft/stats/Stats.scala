package graft.stats

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One-pass statistics (SURVEY §2.8, S1-S4).
  *
  * Reference: utils.py:411-540 (`RunningStatistics` Welford mean/var,
  * `RunningCovariance`), :543-645 (covariance matrix), :648-758
  * (`estimate_from_repeats` convergence loop).
  *
  * The Welford state `(n, mean, M2)` is associatively mergeable
  * (Chan et al. parallel variance), which is exactly what a Spark
  * `Aggregator` needs: partial states per partition, merged on the
  * reduce side — and the same state works as a Structured Streaming
  * aggregation. Built-ins (`avg`/`var_pop`/`stddev_samp`) cover the
  * *outputs*; the Aggregator exists for incremental/convergence use
  * where the state itself must be carried across batches.
  */
final case class WelfordState(n: Long, mean: Double, m2: Double) {
  def add(x: Double): WelfordState = {
    val n1 = n + 1
    val d = x - mean
    val mean1 = mean + d / n1
    WelfordState(n1, mean1, m2 + d * (x - mean1))
  }
  /** Chan et al. pairwise merge — the distributed combine step. */
  def merge(o: WelfordState): WelfordState =
    if (o.n == 0) this
    else if (n == 0) o
    else {
      val nT = n + o.n
      val d = o.mean - mean
      WelfordState(nT, mean + d * o.n / nT,
        m2 + o.m2 + d * d * n * o.n / nT)
    }
  def varPop: Double = if (n > 0) m2 / n else Double.NaN
  def varSamp: Double = if (n > 1) m2 / (n - 1) else Double.NaN
  /** Population std — reference parity: utils.py `RunningStatistics.std`
    * is `sqrt(M2/count)`, NOT the sample std. */
  def std: Double = math.sqrt(varPop)
  /** Sample std (n-1 denominator) for summary outputs that follow the
    * `stddev_samp` convention. */
  def stdSamp: Double = math.sqrt(varSamp)
  /** Error on the mean — reference parity: utils.py `RunningStatistics
    * .err` is population `std / sqrt(count)`. */
  def stderr: Double = if (n > 0) math.sqrt(varPop / n) else Double.NaN
  /** S1 `converged(rtol, atol)` (utils.py:476-508) — uses the population
    * stderr, exactly as the reference's `err < rtol*|mean| + atol`. */
  def converged(rtol: Double, atol: Double = 0.0): Boolean =
    n > 1 && stderr < atol + rtol * math.abs(mean)
}

object WelfordState {
  val zero: WelfordState = WelfordState(0L, 0.0, 0.0)
  def of(xs: Iterable[Double]): WelfordState = xs.foldLeft(zero)(_.add(_))
}

/** Final result row of the stats aggregator. `std`/`stderr` follow the
  * reference's population convention; `stdSamp` is the n-1 variant. */
final case class StatsResult(n: Long, mean: Double, varPop: Double,
                             varSamp: Double, std: Double, stdSamp: Double,
                             stderr: Double)

/** S1 as a typed, mergeable Spark Aggregator: usable via
  * `WelfordAgg.column` in any groupBy, or as streaming state. */
object WelfordAgg extends Aggregator[Double, WelfordState, StatsResult] {
  def zero: WelfordState = WelfordState.zero
  def reduce(b: WelfordState, x: Double): WelfordState = b.add(x)
  def merge(a: WelfordState, b: WelfordState): WelfordState = a.merge(b)
  def finish(s: WelfordState): StatsResult =
    StatsResult(s.n, s.mean, s.varPop, s.varSamp, s.std, s.stdSamp, s.stderr)
  def bufferEncoder: Encoder[WelfordState] = Encoders.product[WelfordState]
  def outputEncoder: Encoder[StatsResult] = Encoders.product[StatsResult]
  /** Untyped column form for DataFrame groupBy.agg. */
  def column(c: Column): Column = udaf(this).apply(c)
}

/** S2 online covariance state (utils.py:511-540) — also mergeable. */
final case class CovState(n: Long, meanX: Double, meanY: Double, c: Double) {
  def add(x: Double, y: Double): CovState = {
    val n1 = n + 1
    val dx = x - meanX
    val mx = meanX + dx / n1
    val my = meanY + (y - meanY) / n1
    CovState(n1, mx, my, c + dx * (y - my))
  }
  def merge(o: CovState): CovState =
    if (o.n == 0) this
    else if (n == 0) o
    else {
      val nT = n + o.n
      val dx = o.meanX - meanX
      val dy = o.meanY - meanY
      CovState(nT, meanX + dx * o.n / nT, meanY + dy * o.n / nT,
        c + o.c + dx * dy * n * o.n / nT)
    }
  def covPop: Double = if (n > 0) c / n else Double.NaN
  def covSamp: Double = if (n > 1) c / (n - 1) else Double.NaN
}

object CovState { val zero: CovState = CovState(0L, 0.0, 0.0, 0.0) }

/** S2 as a typed, mergeable Spark Aggregator (the two-column analogue
  * of [[WelfordAgg]]): sample covariance via distributed CovState
  * merges — usable in any groupBy, or as streaming state. */
object CovAgg extends Aggregator[(Double, Double), CovState, Double] {
  def zero: CovState = CovState.zero
  def reduce(b: CovState, x: (Double, Double)): CovState = b.add(x._1, x._2)
  def merge(a: CovState, b: CovState): CovState = a.merge(b)
  def finish(s: CovState): Double = s.covSamp
  def bufferEncoder: Encoder[CovState] = Encoders.product[CovState]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  /** Untyped column form for DataFrame groupBy.agg. */
  def column(x: Column, y: Column): Column = udaf(this).apply(x, y)
}

object Stats {

  /** S3: full covariance matrix of `columns` in ONE aggregation pass —
    * all pairwise `covar_pop`s in a single groupBy-less agg (no
    * per-pair jobs; one shuffle-free reduce at scale). Returns one row
    * with `cov_<a>_<b>` columns.
    */
  def covarianceMatrix(df: DataFrame, columns: Seq[String],
                       sample: Boolean = false): DataFrame = {
    val f: (Column, Column) => Column =
      if (sample) covar_samp(_, _) else covar_pop(_, _)
    val aggs = for {
      (a, i) <- columns.zipWithIndex
      b <- columns.drop(i)
    } yield f(col(a), col(b)).as(s"cov_${a}_$b")
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** S4 `estimate_from_repeats` (utils.py:648-758): run batches of
    * `batch` evaluations of a DataFrame-producing sampler until the
    * running stderr converges. Driver-side loop; each batch is one
    * distributed job whose Welford partials merge into the carried
    * state — nothing is re-scanned.
    */
  def estimateFromRepeats(spark: SparkSession,
                          sampleBatch: Int => DataFrame, valueCol: String,
                          rtol: Double, batch: Int = 1024,
                          minBatches: Int = 2, maxBatches: Int = 64): (WelfordState, Int) = {
    var state = WelfordState.zero
    var i = 0
    var done = false
    while (i < maxBatches && !done) {
      val part = sampleBatch(batch)
        .agg(count(valueCol).as("n"), avg(valueCol).as("mean"),
          coalesce(var_pop(valueCol), lit(0.0)).as("vp"))
        .collect()(0)
      val n = part.getLong(0)
      // an empty batch leaves avg/var_pop NULL — getDouble would NPE, and
      // there is nothing to merge anyway
      if (n > 0) {
        val batchState = WelfordState(n, part.getDouble(1), part.getDouble(2) * n)
        state = state.merge(batchState)
      }
      i += 1
      done = i >= minBatches && state.converged(rtol)
    }
    (state, i)
  }

  /** S5 `format_number_with_error` (utils.py:358-408): "1.2812(64)e+11"
    * error-bracket formatting. Driver-side scalar utility. */
  def formatWithError(x: Double, err: Double): String = {
    if (err == 0 || err.isNaN || x.isNaN) return x.toString
    val expX = math.floor(math.log10(math.abs(x))).toInt
    val expE = math.floor(math.log10(err)).toInt
    val sig = math.max(expX - expE + 1, 1)
    val mant = x / math.pow(10, expX)
    val errDigits = math.round(err / math.pow(10, expE - 1)).toInt
    f"%%.${math.max(sig - 1, 0)}f".format(mant) + s"($errDigits)" +
      (if (expX != 0) f"e$expX%+03d" else "")
  }
}
