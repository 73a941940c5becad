package graft

import graft.expand.Grid
import graft.spec._
import graft.store.Merge
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks of the expansion/merge algebra (SURVEY §5 —
  * an upgrade over the reference's example-based tests). Kept to few
  * Spark-sized cases per property (each case is a full Spark job);
  * raw ScalaCheck generators drawn with fixed seeds for determinism.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = Gen.Parameters.default.withSize(6)

  /** Draw `n` deterministic samples from a generator and check each. */
  private def forAll[A](g: Gen[A], n: Int = 5)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      check(g.pureApply(params, Seed(42L + i)))
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(check: (A, B) => Unit): Unit =
    (0 until 5).foreach { i =>
      check(ga.pureApply(params, Seed(42L + i)),
        gb.pureApply(params, Seed(1042L + i)))
    }

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])
                             (check: (A, B, C) => Unit): Unit =
    (0 until 5).foreach { i =>
      check(ga.pureApply(params, Seed(42L + i)),
        gb.pureApply(params, Seed(1042L + i)),
        gc.pureApply(params, Seed(2042L + i)))
    }

  private val axisGen: Gen[Seq[Long]] = for {
    n <- Gen.choose(1, 4)
    vs <- Gen.pick(n, 1L to 12L)
  } yield vs.toSeq

  test("property: |expand(combos)| = ∏ |axis| and rows are distinct") {
    forAll(axisGen, axisGen) { (as, bs) =>
      val g = Grid.expand(spark, ComboSpec.of("a" -> as, "b" -> bs))
      assert(g.count() == as.size.toLong * bs.size)
      assert(g.distinct().count() == g.count())
    }
  }

  test("property: missing(grid, store) ∪ store-keys = grid, disjointly") {
    forAll(axisGen, axisGen, Gen.choose(0, 10)) { (as, bs, nStore) =>
      val grid = Grid.expand(spark, ComboSpec.of("a" -> as, "b" -> bs))
      val store = grid.orderBy("a", "b").limit(nStore)
      val miss = Grid.missing(grid, store, Seq("a", "b"))
      assert(miss.count() + store.count() == grid.count())
      assert(miss.join(store, Seq("a", "b"), "inner").count() == 0)
    }
  }

  test("property: merge is idempotent and NewWins/OldWins agree on disjoint stores") {
    forAll(axisGen, axisGen) { (as, bs) =>
      val a = as.map(x => (x, x * 2.0)).toDF("k", "v")
      val b = bs.map(x => (x + 100L, x * 3.0)).toDF("k", "v") // disjoint keys
      assert(collectSorted(Merge.merge(a, a, Seq("k"))) == collectSorted(a))
      val nw = Merge.merge(a, b, Seq("k"), Merge.NewWins)
      val ow = Merge.merge(a, b, Seq("k"), Merge.OldWins)
      assert(collectSorted(nw) == collectSorted(ow))
      assert(nw.count() == a.count() + b.count())
    }
  }

  test("property: sample(grid, n) ⊆ grid with exactly min(n,|grid|) distinct rows") {
    forAll(axisGen, Gen.choose(1, 8), Gen.choose(0L, 1000L)) { (as, n, seed) =>
      val grid = Grid.expand(spark, ComboSpec.of("a" -> as))
      val s = Grid.sample(grid, n, seed)
      val expected = math.min(n.toLong, grid.count())
      assert(s.count() == expected)
      assert(s.except(grid).count() == 0)
    }
  }

  test("property: Welford merge associativity across random splits") {
    import graft.stats.WelfordState
    forAll(Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0)), Gen.choose(0, 20)) {
      (xs, at) =>
        val (l, r) = xs.splitAt(at % math.max(xs.size, 1))
        val merged = WelfordState.of(l).merge(WelfordState.of(r))
        val whole = WelfordState.of(xs)
        assert(merged.n == whole.n)
        assert(math.abs(merged.mean - whole.mean) < 1e-9)
        assert(math.abs(merged.m2 - whole.m2) < 1e-6 * math.max(1.0, whole.m2))
    }
  }
}

/** Black-box Scala-closure evaluation — the reference's arbitrary-fn
  * parity (V1 with a genuinely opaque function): a Scala closure as a
  * UDF, and the typed-Dataset flatMap path for Dataset-returning fns
  * (combo_runner.py:493-503).
  */
class BlackBoxEvalSpec extends SparkSpec {
  import spark.implicits._

  test("opaque Scala closure over the grid via udf") {
    def mystery(a: Long, b: Long): Double = { // pretend we can't see inside
      var acc = 0.0
      for (i <- 0L until (a % 7)) acc += math.sin(i * b)
      acc + a * b
    }
    val u = udf(mystery _)
    val g = Grid.expand(spark, ComboSpec.of("a" -> (1L to 5L), "b" -> (1L to 4L)))
    val out = g.withColumn("y", u(col("a"), col("b"))).collect()
    out.foreach(r => assert(r.getDouble(2) == mystery(r.getLong(0), r.getLong(1))))
  }

  test("Dataset-returning fn via typed flatMap (inner dims become rows)") {
    val g = Grid.expand(spark, ComboSpec.of("a" -> (1L to 3L)))
    val out = g.as[Long].flatMap { a =>
      (0 until a.toInt).map(t => (a, t, a * 10.0 + t)) // per-point time series
    }.toDF("a", "t", "y")
    assert(out.count() == 6) // 1 + 2 + 3
    assert(out.filter($"a" === 3L).select("t").as[Int].collect().sorted.toSeq
      == Seq(0, 1, 2))
  }
}
