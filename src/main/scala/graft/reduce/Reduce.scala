package graft.reduce

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reduction / aggregation operators (SURVEY §2.6, A1-A8) — the
  * data-prep side of xyzpy's plot layer (infiniplot.py:573-684,
  * plot/core.py:380-494).
  *
  * Scale notes: every op here is a single `groupBy` over the kept
  * axes — one shuffle, partial aggregation map-side. `median`/
  * `quantile` have three forms: grouped-exact ([[exactQuantiles]] —
  * count compaction, value-parallel), global-exact (Spark's
  * `percentile`, whose value→count partials merge map-side), and
  * `approx` (`percentile_approx`, mergeable sketch — the fast path
  * when interpolated-exact semantics aren't required).
  */
object Reduce {

  /** Exact interpolated quantiles (`percentile` / `quantile_cont`
    * semantics, bit-identical to Spark's builtin) via count
    * compaction: groupBy (keys, value) count → per-key ordered
    * running count → pick each q's two straddling order statistics →
    * interpolate with the builtin's exact double arithmetic
    * (pos = ((n−1): long→double)·q; (hi−pos)·xlo + (pos−lo)·xhi,
    * equal-rank/equal-value short-circuits).
    *
    * Why not the builtin for grouped data: `percentile`/`median`
    * carry a value→count OpenHashMap per group per partition and
    * funnel ≈ distinct × partitions entries into ONE final-merge task
    * per group. Compaction does that reduction as a real shuffle
    * aggregation (map-side combine, value-parallel) and only ≤2
    * straddling rows per (group, q) reach the final agg — measured
    * ≈2× faster at sf0.1 on a ≈190k-distinct-per-group double column,
    * and the advantage grows with scale. The window pass sorts each
    * group's *distinct values* (not rows) in one task — bounded by
    * value cardinality, which is what also bounds the builtin's merge.
    * All `qs` share one compaction + one window pass — one scan of
    * `df` total. Null-only groups yield NULL rows like the builtin.
    *
    * Output: `keep` ++ one column per `qs` entry (name → quantile).
    */
  def exactQuantiles(df: DataFrame, keep: Seq[String], value: String,
                     qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0 && q <= 1 })
    if (keep.isEmpty)
      // global = one constant group. (Edge difference vs the builtin:
      // an EMPTY input yields an empty frame here, not one NULL row.)
      return exactQuantiles(df.withColumn("__g", lit(1)), Seq("__g"),
        value, qs).drop("__g")
    val keyCols = keep.map(col)
    // count(value) counts non-nulls, so a NULL-value row compacts to a
    // group row with __c = 0: it keeps its group alive through the
    // pipeline (NULL-only groups emit NULL like the builtin) without a
    // second scan of df to recover group keys, and contributes nothing
    // to any running count (NULLs sort first; min() skips them)
    val counts = df.groupBy((keep :+ value).map(col): _*)
      .agg(count(col(value)).as("__c"))
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col(value))
    val wAll = Window.partitionBy(keyCols: _*)
    // running count = 1-indexed rank of each distinct value's LAST row
    val staged = counts
      .withColumn("__cum", sum("__c").over(wOrd))
      .withColumn("__n", sum("__c").over(wAll))
    // per q: the k-th (0-indexed) order statistic is the first value
    // whose running count reaches k+1; lo/hi from the builtin's
    // position arithmetic, per-row but constant within a group
    val aggCols = qs.flatMap { case (name, q) =>
      val pos = (col("__n") - lit(1L)).cast("double") * lit(q)
      val xlo = min(when(col("__cum") >= floor(pos) + 1, col(value)))
        .cast("double").as(s"__lo_$name")
      val xhi = min(when(col("__cum") >= ceil(pos) + 1, col(value)))
        .cast("double").as(s"__hi_$name")
      Seq(xlo, xhi)
    } :+ first(col("__n")).as("__n")
    // groupBy keys directly after the window: partitioning is already
    // by keys, so this aggregation adds no exchange
    val agg = staged.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
    qs.foldLeft(agg) { case (a, (name, q)) =>
      val pos = (col("__n") - lit(1L)).cast("double") * lit(q)
      val (l, h) = (floor(pos), ceil(pos))
      val (xlo, xhi) = (col(s"__lo_$name"), col(s"__hi_$name"))
      a.withColumn(name,
        when(h === l || xlo === xhi, xlo)
          .otherwise((h - pos) * xlo + (pos - l) * xhi))
    }.select((keyCols ++ qs.map(n => col(n._1))): _*)
  }

  /** A1: collapse `over` dims keeping `keep`, reducing `value` with a
    * named method (median default — infiniplot.py:638-684).
    */
  def aggregate(df: DataFrame, keep: Seq[String], value: String,
                method: String = "median", approx: Boolean = false): DataFrame = {
    if (method == "median" && !approx && keep.nonEmpty)
      return exactQuantiles(df, keep, value, Seq(value -> 0.5))
    val v = col(value)
    val c: Column = method match {
      case "median" => if (approx) percentile_approx(v, lit(0.5), lit(10000))
                       // global (no keys) exact median: the builtin —
                       // one group, so compaction has nothing to win
                       else median(v)
      case "mean"   => avg(v)
      case "min"    => min(v)
      case "max"    => max(v)
      case "sum"    => sum(v)
      case "count"  => count(v)
      case m => throw new IllegalArgumentException(s"unknown aggregate_method $m")
    }
    df.groupBy(keep.map(col): _*).agg(c.as(value))
  }

  /** A2: median + quantile error band `0.5 ± r/2` (infiniplot.py:664-671). */
  def quantileBand(df: DataFrame, keep: Seq[String], value: String,
                   r: Double = 0.68, approx: Boolean = false): DataFrame = {
    val (ql, qu) = (0.5 - r / 2, 0.5 + r / 2)
    if (!approx && keep.nonEmpty)
      // all three quantiles share ONE compaction + window pass
      return exactQuantiles(df, keep, value,
        Seq(value -> 0.5, s"${value}_lo" -> ql, s"${value}_hi" -> qu))
    val (lo, mid, hi) =
      if (approx) (percentile_approx(col(value), lit(ql), lit(10000)),
                   percentile_approx(col(value), lit(0.5), lit(10000)),
                   percentile_approx(col(value), lit(qu), lit(10000)))
      else (expr(s"percentile($value, $ql)"), expr(s"percentile($value, 0.5)"),
            expr(s"percentile($value, $qu)"))
    df.groupBy(keep.map(col): _*)
      .agg(mid.as(value), lo.as(s"${value}_lo"), hi.as(s"${value}_hi"))
  }

  /** A3: mean ± std band (infiniplot.py:647-652). */
  def stdBand(df: DataFrame, keep: Seq[String], value: String): DataFrame =
    df.groupBy(keep.map(col): _*).agg(
      avg(col(value)).as(value),
      (avg(col(value)) - stddev_samp(col(value))).as(s"${value}_lo"),
      (avg(col(value)) + stddev_samp(col(value))).as(s"${value}_hi"))

  /** A4: mean ± std/sqrt(n) stderr band; n counts non-nulls
    * (infiniplot.py:654-662). */
  def stderrBand(df: DataFrame, keep: Seq[String], value: String): DataFrame = {
    val se = stddev_samp(col(value)) / sqrt(count(col(value)))
    df.groupBy(keep.map(col): _*).agg(
      avg(col(value)).as(value),
      (avg(col(value)) - se).as(s"${value}_lo"),
      (avg(col(value)) + se).as(s"${value}_hi"))
  }

  /** A5 auto-bin rule: `clamp(round(sqrt(n)), 3, 50)`
    * (infiniplot.py:581-589). */
  def autoBins(n: Long): Int =
    math.max(3, math.min(50, math.round(math.sqrt(n.toDouble)).toInt))

  /** A5: histogram of `value` into `nbins` equal bins on [lo, hi],
    * optionally per extra key dims; returns (keys…, bin, lo, hi,
    * count). Bins are half-open [lo+i*w, lo+(i+1)*w) with the last bin
    * closed (NumPy convention, np.histogram). One pass: width_bucket +
    * count, all codegen'd.
    */
  def histogram(df: DataFrame, value: String, nbins: Int,
                lo: Double, hi: Double, keys: Seq[String] = Nil,
                density: Boolean = false): DataFrame = {
    val w = (hi - lo) / nbins
    val bin = least(
      floor((col(value) - lit(lo)) / lit(w)).cast("long"), lit(nbins - 1L))
    val g = df.filter(col(value) >= lo && col(value) <= hi)
      .withColumn("bin", bin)
      .groupBy((keys :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", lit(lo) + col("bin") * lit(w))
      .withColumn("bin_hi", lit(lo) + (col("bin") + 1) * lit(w))
    if (!density) g
    else {
      val tot = Window.partitionBy(keys.map(col): _*)
      g.withColumn("density", col("n") / (sum("n").over(tot) * lit(w)))
    }
  }

  /** A6/A8: one aggregate row with min/max per column (plot limits /
    * color norm, plot/core.py:588-619,465-494). */
  def range(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = columns.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** A7: heatmap pivot `z[y, x]` — dense 2-D view
    * (plot/core.py:443-463). */
  def heatmap(df: DataFrame, x: String, y: String, z: String,
              xValues: Seq[Any] = Nil): DataFrame =
    graft.collect.Collect.dense(df, Seq(y), x, z, xValues)

  /** Top-k rows per group by an explicit ordering (include a unique
    * tiebreaker column for determinism). row_number + rank-filter is
    * the shape Spark's WindowGroupLimit optimizer rewrites into a
    * per-partition PARTIAL top-k BEFORE the exchange — only k rows per
    * group per input partition shuffle, so a top-3-of-billions query
    * moves ~3×partitions rows, not the table. */
  def topKPerGroup(df: DataFrame, keep: Seq[String], order: Seq[Column],
                   k: Int): DataFrame = {
    require(k > 0)
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(keep.map(col): _*).orderBy(order: _*)))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** P6: jitter — additive gaussian noise (plot/core.py:389-408). */
  def jitter(df: DataFrame, column: String, scale: Double, seed: Long): DataFrame =
    df.withColumn(column, col(column) + randn(seed) * scale)
}

/** Missing-data discovery (SURVEY §2.5, F1-F6) — predicates over the
  * long table; all single-pass groupBy/anti-join shapes.
  */
object MissingData {

  /** F1: a point is missing iff *all* variables are null
    * (case_runner.py:217-259; `nan` mode treats NaN as missing). */
  def allMissing(vars: Seq[String], nanAsMissing: Boolean = false): Column =
    vars.map { v =>
      if (nanAsMissing) col(v).isNull || isnan(col(v)) else col(v).isNull
    }.reduce(_ && _)

  /** F2: enumerate grid points whose every row is all-missing — or
    * absent entirely (case_runner.py:262-301). `ignoreDims` collapses
    * internal dims by grouping on the kept axes. */
  def findMissingCases(df: DataFrame, axes: Seq[String],
                       vars: Seq[String]): DataFrame = {
    val present = df
      .groupBy(axes.map(col): _*)
      .agg(max(when(!allMissing(vars), 1).otherwise(0)).as("__any"))
      .filter(col("__any") === 1)
      .select(axes.map(col): _*)
    graft.expand.Grid.effectiveGrid(df, axes)
      .join(present, axes, "left_anti")
  }

  /** F3 `trimna`: drop coordinate values (per axis) where everything
    * is null (manage.py:211-227). */
  def trimna(df: DataFrame, axes: Seq[String], vars: Seq[String]): DataFrame =
    axes.foldLeft(df) { (d, axis) =>
      val dead = d.groupBy(col(axis))
        .agg(min(allMissing(vars).cast("int")).as("__all"))
        .filter(col("__all") === 1)
        .select(col(axis))
      d.join(dead, Seq(axis), "left_anti")
    }

  /** F4 `check_runs`: holes in an integer dimension — missing values
    * between observed min and max (manage.py:268-310). The candidate
    * range comes from `spark.range(lo, hi+1)` (distributed, chunked)
    * — an `explode(sequence(lo, hi))` would materialize the whole
    * range as ONE array in one task. Bounds are two longs: collecting
    * them is free. */
  def holes(df: DataFrame, dim: String): DataFrame = {
    val spark = df.sparkSession
    val b = df.agg(min(col(dim)).cast("long"), max(col(dim)).cast("long")).head()
    if (b.isNullAt(0)) return df.select(dim).limit(0)
    spark.range(b.getLong(0), b.getLong(1) + 1).toDF(dim)
      .join(df.select(col(dim).cast("long").as(dim)).distinct(),
        Seq(dim), "left_anti")
  }

  /** F5: finite-mask — keep rows where all listed cols are finite
    * (plot/core.py:380-387). */
  def finite(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(c =>
      col(c).isNotNull && !isnan(col(c)) &&
        col(c) =!= Double.PositiveInfinity && col(c) =!= Double.NegativeInfinity
    ).reduce(_ && _))

  /** F6 `check_excess_dims`: assert every non-selected axis has one
    * distinct value (plot/core.py:127-148). Single aggregate pass. */
  def assertNoExcessDims(df: DataFrame, selected: Seq[String],
                         axes: Seq[String]): Unit = {
    val excess = axes.filterNot(selected.contains)
    if (excess.nonEmpty) {
      val counts = df.agg(
        countDistinct(col(excess.head)).as(excess.head),
        excess.tail.map(a => countDistinct(col(a)).as(a)): _*).collect()(0)
      val bad = excess.zipWithIndex.filter { case (_, i) => counts.getLong(i) > 1 }
      require(bad.isEmpty,
        s"unmapped dims with >1 value: ${bad.map(_._1).mkString(", ")}")
    }
  }
}
