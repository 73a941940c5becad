package graft

import graft.reduce.{MissingData, Reduce}
import graft.stats._
import org.apache.spark.sql.functions._

class ReduceSpec extends SparkSpec {
  import spark.implicits._

  test("A1: median aggregate over dims (infiniplot.py:638-684)") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 9.0), ("h", 4.0))
      .toDF("k", "v")
    val m = Reduce.aggregate(df, Seq("k"), "v").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m == Map("g" -> 2.0, "h" -> 4.0))
  }

  test("A1: compacted exact quantiles are bit-identical to the builtin percentile") {
    // ties, odd/even group sizes, single-value groups, a null-only
    // group, and irrational-position quantiles — every interpolation
    // branch of the builtin, compared bitwise (no tolerance)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 4000).map { i =>
      val g = s"g${i % 7}"
      val v: java.lang.Double =
        if (i % 7 == 6) null // g6 = null-only group
        else if (rnd.nextInt(4) == 0) rnd.nextInt(10).toDouble // ties
        else rnd.nextDouble() * 100
      (g, v)
    } :+ (("solo", java.lang.Double.valueOf(42.0)))
    val df = rows.toDF("k", "v")
    // global (no keys) form agrees with the builtin global percentile
    val g = Reduce.exactQuantiles(df, Nil, "v", Seq("p" -> 0.5))
      .collect()(0).getDouble(0)
    val gb = df.agg(expr("percentile(v, 0.5)")).collect()(0).getDouble(0)
    assert(java.lang.Double.compare(g, gb) == 0)
    for (q <- Seq(0.0, 0.25, 0.5, 1.0 / 3.0, 0.9, 1.0)) {
      val builtin = df.groupBy("k").agg(expr(s"percentile(v, $q)").as("p"))
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val compact = Reduce.exactQuantiles(df, Seq("k"), "v", Seq("p" -> q))
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(compact == builtin, s"q=$q")
      // bitwise: java.lang.Double.equals distinguishes ulps via Some(d)
    }
  }

  test("A3/A4: std and stderr bands match closed forms") {
    val df = Seq.tabulate(4)(i => ("g", (i + 1).toDouble)).toDF("k", "v")
    val r = Reduce.stdBand(df, Seq("k"), "v").collect()(0)
    val mean = 2.5; val sd = math.sqrt(5.0 / 3.0)
    assert(math.abs(r.getDouble(1) - mean) < 1e-12)
    assert(math.abs(r.getDouble(2) - (mean - sd)) < 1e-12)
    val e = Reduce.stderrBand(df, Seq("k"), "v").collect()(0)
    assert(math.abs(e.getDouble(3) - (mean + sd / 2)) < 1e-12)
  }

  test("A5: histogram bins + auto-bin rule (infiniplot.py:573-625)") {
    assert(Reduce.autoBins(4) == 3 && Reduce.autoBins(100) == 10 &&
      Reduce.autoBins(1000000) == 50)
    val df = Seq(0.0, 0.5, 1.0, 1.5, 2.0).toDF("v") // hi edge joins last bin
    val h = Reduce.histogram(df, "v", nbins = 2, lo = 0.0, hi = 2.0)
    val byBin = h.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBin == Map(0L -> 2L, 1L -> 3L))
  }

  test("A6/A8: range produces min/max per column") {
    val df = Seq((1.0, 5.0), (3.0, 2.0)).toDF("x", "y")
    val r = Reduce.range(df, Seq("x", "y")).collect()(0)
    assert(r.toSeq == Seq(1.0, 3.0, 2.0, 5.0))
  }

  test("F3: trimna drops all-null coordinate slices (manage.py:211-227)") {
    val df = Seq((1L, Some(1.0)), (1L, None), (2L, None), (2L, None))
      .toDF("a", "v")
    val t = MissingData.trimna(df, Seq("a"), Seq("v"))
    assert(t.select("a").distinct().as[Long].collect().toSeq == Seq(1L))
  }

  test("F4: holes finds gaps in an integer dim (manage.py:268-310)") {
    val df = Seq(1L, 2L, 5L, 7L).toDF("i")
    assert(MissingData.holes(df, "i").as[Long].collect().sorted.toSeq ==
      Seq(3L, 4L, 6L))
  }

  test("F2: findMissingCases = all-null or absent grid points") {
    val df = Seq(
      (1L, 1L, Some(1.0)), (1L, 2L, None), (2L, 1L, Some(2.0)))
      .toDF("a", "b", "v") // (2,2) absent entirely
    val miss = MissingData.findMissingCases(df, Seq("a", "b"), Seq("v"))
    assert(collectSorted(miss).toSet ==
      Set(Seq[Any](1L, 2L), Seq[Any](2L, 2L)))
  }

  test("F5: finite drops null/NaN/inf rows") {
    val df = Seq(1.0, Double.NaN, Double.PositiveInfinity, 2.0).toDF("v")
    assert(MissingData.finite(df, Seq("v")).as[Double].collect().sorted.toSeq
      == Seq(1.0, 2.0))
  }

  test("F6: excess-dim guard raises only for >1-valued unmapped axes") {
    val df = Seq((1L, 1L, 2.0), (2L, 1L, 3.0)).toDF("a", "b", "v")
    MissingData.assertNoExcessDims(df, Seq("a"), Seq("a", "b")) // b has 1 value
    assertThrows[IllegalArgumentException](
      MissingData.assertNoExcessDims(df, Seq("b"), Seq("a", "b")))
  }
}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private val xs = Seq(1.3, -2.1, 0.0, 4.5, 3.3, 2.2, -0.7, 1.1)

  test("S1: Welford matches two-pass mean/std (utils.py golden vs numpy)") {
    val s = WelfordState.of(xs)
    val mean = xs.sum / xs.size
    val varS = xs.map(x => (x - mean) * (x - mean)).sum / (xs.size - 1)
    assert(math.abs(s.mean - mean) < 1e-12)
    assert(math.abs(s.varSamp - varS) < 1e-12)
  }

  test("S1: merge of split states equals single-pass state (Chan et al.)") {
    val (l, r) = xs.splitAt(3)
    val merged = WelfordState.of(l).merge(WelfordState.of(r))
    val whole = WelfordState.of(xs)
    assert(math.abs(merged.mean - whole.mean) < 1e-12)
    assert(math.abs(merged.m2 - whole.m2) < 1e-12)
    // zero-state is the identity
    assert(WelfordState.zero.merge(whole) == whole)
  }

  test("S1: WelfordAgg as a groupBy aggregator matches built-ins") {
    val df = xs.map(("g", _)).toDF("k", "v")
    val r = df.groupBy("k").agg(WelfordAgg.column(col("v")).as("s"))
      .select("s.n", "s.mean", "s.stdSamp").collect()(0)
    val b = df.agg(count("v"), avg("v"), stddev_samp("v")).collect()(0)
    assert(r.getLong(0) == b.getLong(0))
    assert(math.abs(r.getDouble(1) - b.getDouble(1)) < 1e-12)
    assert(math.abs(r.getDouble(2) - b.getDouble(2)) < 1e-12)
  }

  test("S1: std/err match the reference's population convention (utils.py docstring golden)") {
    // utils.py:433-447: [1.1, 1.4, 1.2, 1.5, 1.3, 1.6] -> mean 1.35,
    // std 0.17078252585383266 (population), err 0.06972167422092768
    // 1e-6 tolerance: the docstring numbers carry float32 noise, but the
    // population-vs-sample distinction is 0.1708 vs 0.1871 — far larger
    val s = WelfordState.of(Seq(1.1, 1.4, 1.2, 1.5, 1.3, 1.6))
    assert(math.abs(s.mean - 1.35) < 1e-6)
    assert(math.abs(s.std - 0.17078252585383266) < 1e-6)
    assert(math.abs(s.stderr - 0.06972167422092768) < 1e-6)
  }

  test("S4: estimateFromRepeats survives an empty batch (no NPE on NULL moments)") {
    var calls = 0
    val (state, batches) = Stats.estimateFromRepeats(
      spark,
      n => { calls += 1
        // first batch yields zero rows — avg/var_pop are NULL
        if (calls == 1) spark.range(0).select(lit(1.0).as("v"))
        else spark.range(n).select((lit(3.0) + (rand(7 + calls) - 0.5) * 0.01).as("v")) },
      "v", rtol = 1e-3, batch = 256, minBatches = 2, maxBatches = 10)
    assert(batches >= 2 && math.abs(state.mean - 3.0) < 0.01)
  }

  test("S2: CovAgg as a groupBy aggregator matches covar_samp") {
    val rnd = new scala.util.Random(5)
    val df = (0 until 500).map { i =>
      (s"g${i % 3}", rnd.nextDouble() * 10, rnd.nextDouble() * 3 + i % 3)
    }.toDF("k", "x", "y")
    val got = df.groupBy("k").agg(CovAgg.column(col("x"), col("y")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = df.groupBy("k").agg(covar_samp(col("x"), col("y")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9) }
  }

  test("S2: CovState matches covar_samp") {
    val ys = xs.map(x => 2 * x + 1).zip(xs).map { case (y, x) => (x, y + x * x) }
    val st = ys.foldLeft(CovState.zero) { case (s, (x, y)) => s.add(x, y) }
    val b = ys.toDF("x", "y").agg(covar_samp("x", "y")).collect()(0).getDouble(0)
    assert(math.abs(st.covSamp - b) < 1e-10)
  }

  test("S3: covariance matrix in one pass") {
    val df = xs.zipWithIndex.map { case (x, i) => (x, i.toDouble) }.toDF("x", "y")
    val r = Stats.covarianceMatrix(df, Seq("x", "y")).collect()(0)
    // cov_x_x is the population variance
    val vp = df.agg(var_pop("x")).collect()(0).getDouble(0)
    assert(math.abs(r.getDouble(0) - vp) < 1e-12)
    assert(Stats.covarianceMatrix(df, Seq("x", "y")).columns.toSeq ==
      Seq("cov_x_x", "cov_x_y", "cov_y_y"))
  }

  test("S4: estimateFromRepeats converges on a constant-ish sampler") {
    var calls = 0
    val (state, batches) = Stats.estimateFromRepeats(
      spark,
      n => { calls += 1
        spark.range(n).select((lit(5.0) + (rand(42 + calls) - 0.5) * 0.01).as("v")) },
      "v", rtol = 1e-3, batch = 512, minBatches = 2, maxBatches = 10)
    assert(state.converged(1e-3))
    assert(batches >= 2 && math.abs(state.mean - 5.0) < 0.01)
  }

  test("S5: error-bracket formatting") {
    assert(Stats.formatWithError(1.234567, 0.0012) == "1.235(12)")
    assert(Stats.formatWithError(12345.0, 67.0) == "1.235(67)e+04")
  }
}
