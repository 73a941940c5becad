package graft

import graft.collect.Collect
import graft.expand.Grid
import graft.reduce.MissingData
import graft.run.Runner
import graft.spec._
import org.apache.spark.sql.functions._

/** Golden parity with the reference's central fixtures (FIXTURES.md;
  * reference tests/test_gen/test_farming.py:36-110,
  * test_case_runner.py:63-106,212-277). Values asserted are the
  * reference's published goldens, not re-derived.
  */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  /** fn3_fba: (a, b; c const) → (sum, even, a·(b·linspace(0,1,3)+c)) —
    * the reference's `fn3_fba_ds` golden (test_farming.py:66-81).
    */
  test("golden fn3_fba_ds: sweep + constants + internal time dim") {
    val time = Seq(0.0, 0.5, 1.0) // np.linspace(0, 1, 3) — var_coords
    val runner = Runner.ofColumns(
      Constants(recorded = Map("c" -> 100L)),
      "sum" -> (col("a") + col("b") + col("c")),
      "even" -> ((col("a") + col("b") + col("c")) % 2 === 0),
      "array" -> transform(array(time.map(lit): _*),
        t => col("a") * (col("b") * t + col("c"))))
    val long = runner.runCombos(spark,
      ComboSpec.of("a" -> Seq(1L, 2L), "b" -> Seq(3L, 4L)))
    val exploded = Collect.explodeDim(long, "array", "time", coords = time)

    // golden scalar vars: sum [[104,105],[105,106]], even [[T,F],[F,T]]
    val scalars = long.select("a", "b", "sum", "even").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(scalars == Map(
      (1L, 3L) -> ((104L, true)), (1L, 4L) -> ((105L, false)),
      (2L, 3L) -> ((105L, false)), (2L, 4L) -> ((106L, true))))

    // golden array var over (a, b, time)
    val arr = exploded.select("a", "b", "time", "array").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)) -> r.getDouble(3))
      .toMap
    val golden = Map(
      (1L, 3L) -> Seq(100.0, 101.5, 103.0), (1L, 4L) -> Seq(100.0, 102.0, 104.0),
      (2L, 3L) -> Seq(200.0, 203.0, 206.0), (2L, 4L) -> Seq(200.0, 204.0, 208.0))
    for (((a, b), vals) <- golden; (t, i) <- time.zipWithIndex)
      assert(arr((a, b, t)) == vals(i), s"array($a,$b,$t)")
    assert(exploded.count() == 12)
  }

  /** Sparse cases → NULL-filled dense grid (test_case_runner.py:63-106):
    * cases [(1,20,300), (3,20,100)] over foo3_scalar, effective grid
    * a:[1,3] × b:[20] × c:[100,300] with 2 filled and 2 NULL cells.
    */
  test("golden sparse cases: dense view NULL-fills unvisited cells") {
    val cases = CaseSpec(Seq("a", "b", "c"),
      Seq(Seq(1L, 20L, 300L), Seq(3L, 20L, 100L)))
    val run = Runner.ofColumns("x" -> (col("a") + col("b") + col("c")))
      .runCases(spark, cases)
    val grid = Grid.effectiveGrid(run, Seq("a", "b", "c"))
    assert(grid.count() == 4) // a:[1,3] × b:[20] × c:[100,300]
    val dense = grid.join(run, Seq("a", "b", "c"), "left_outer")
    val cells = dense.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> Option(r.get(3)))
      .toMap
    assert(cells((1L, 20L, 300L)).contains(321L))
    assert(cells((3L, 20L, 100L)).contains(123L))
    assert(cells((1L, 20L, 100L)).isEmpty)
    assert(cells((3L, 20L, 300L)).isEmpty)
  }

  /** Missing-case discovery golden (test_case_runner.py:212-277):
    * x(a,b) = [[0.1, NaN], [NaN, 0.2], [NaN, NaN]] →
    * missing = {(1,50), (2,40), (3,40), (3,50)}.
    */
  test("golden find_missing_cases: NaN rows and absent rows are missing") {
    val df = Seq(
      (1L, 40L, 0.1), (1L, 50L, Double.NaN),
      (2L, 40L, Double.NaN), (2L, 50L, 0.2),
      (3L, 40L, Double.NaN), (3L, 50L, Double.NaN))
      .toDF("a", "b", "x")
      .withColumn("x", when(isnan(col("x")), lit(null)).otherwise(col("x")))
    val missing = MissingData.findMissingCases(df, Seq("a", "b"), Seq("x"))
    assert(collectSorted(missing).toSet == Set(
      Seq[Any](1L, 50L), Seq[Any](2L, 40L), Seq[Any](3L, 40L), Seq[Any](3L, 50L)))
  }

  /** foo2_array_array: two array outputs sharing one internal dim
    * (test_combo_runner.py:218-232). */
  test("golden foo2_array_array: shared internal dim across two vars") {
    val runner = Runner.ofColumns(
      "x" -> transform(sequence(lit(0L), lit(4L)), i => col("b") + i * col("a")),
      "y" -> transform(sequence(lit(0L), lit(4L)), i => col("b") - i * col("a")))
    val long = runner.runCombos(spark,
      ComboSpec.of("a" -> Seq(2L), "b" -> Seq(30L)))
    val zipped = long.select(col("a"), col("b"),
      posexplode(zip_with(col("x"), col("y"), (x, y) => struct(x.as("x"), y.as("y"))))
        .as(Seq("seed", "xy")))
      .select(col("a"), col("b"), col("seed"), col("xy.x"), col("xy.y"))
    val rows = zipped.orderBy("seed").collect()
      .map(r => (r.getInt(2), r.getLong(3), r.getLong(4))).toSeq
    assert(rows == Seq((0, 30L, 30L), (1, 32L, 28L), (2, 34L, 26L),
      (3, 36L, 24L), (4, 38L, 22L)))
  }

  /** foo2_zarray1_zarray2: complex-array outputs (b+a±0.1i·k,
    * test_combo_runner.py:246-262) via the struct complex algebra. */
  test("golden complex arrays: b+a+0.1i*k and conjugate partner") {
    import graft.functions.ComplexFns
    val runner = Runner.ofColumns(
      "z1" -> transform(sequence(lit(0L), lit(4L)),
        k => ComplexFns.complex(col("a") + col("b"), k.cast("double") * 0.1)),
      "z2" -> transform(sequence(lit(0L), lit(4L)),
        k => ComplexFns.complex(col("a") + col("b"), k.cast("double") * -0.1)))
    val long = runner.runCombos(spark,
      ComboSpec.of("a" -> Seq(1L), "b" -> Seq(10L)))
    val z = long.select(posexplode(col("z1")).as(Seq("k", "z")))
      .select(col("k"), col("z.re"), col("z.im")).orderBy("k").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    val want = Seq((0, 11.0, 0.0), (1, 11.0, 0.1), (2, 11.0, 0.2),
      (3, 11.0, 0.3), (4, 11.0, 0.4))
    z.zip(want).foreach { case ((k, re, im), (wk, wre, wim)) =>
      assert(k == wk && re == wre && math.abs(im - wim) < 1e-12)
    }
    // z2 is the conjugate partner
    val conj = long.select(
      ComplexFns.im(element_at(col("z1"), 3)) +
        ComplexFns.im(element_at(col("z2"), 3))).head().getDouble(0)
    assert(conj == 0.0)
  }
}
