package graft

import graft.spec._
import graft.expand.Grid
import org.apache.spark.sql.functions._

class SpecSpec extends SparkSpec {
  test("duplicate axis values raise (prepare.py:34-42)") {
    assertThrows[IllegalArgumentException](Axis("a", Seq(1, 2, 2)))
  }
  test("duplicate axis names raise") {
    assertThrows[IllegalArgumentException](
      ComboSpec.of("a" -> Seq(1), "a" -> Seq(2)))
  }
  test("grid size is the product of axis sizes") {
    assert(ComboSpec.of("a" -> Seq(1, 2, 3), "b" -> Seq(4, 5)).size == 6)
  }
  test("cases must cover all args") {
    assertThrows[IllegalArgumentException](
      CaseSpec(Seq("a", "b"), Seq(Seq(1))))
  }
}

class ExpandSpec extends SparkSpec {

  test("E3: |crossJoin| = product of axis sizes; all pairs present") {
    val combos = ComboSpec.of("a" -> Seq(1L, 2L, 3L), "b" -> Seq(10L, 20L))
    val g = Grid.expand(spark, combos)
    assert(g.columns.toSeq == Seq("a", "b"))
    val rows = collectSorted(g)
    assert(rows.size == 6)
    assert(rows.toSet ==
      (for (a <- Seq(1L, 2L, 3L); b <- Seq(10L, 20L)) yield Seq[Any](a, b)).toSet)
  }

  test("E3: cases x combos with disjoint args (combo_runner.py:194-218)") {
    val combos = ComboSpec.of("c" -> Seq(1L, 2L))
    val cases = CaseSpec(Seq("a", "b"), Seq(Seq(10L, 1L), Seq(20L, 2L)))
    val g = Grid.expand(spark, combos, Some(cases))
    assert(g.count() == 4) // 2 cases x 2 combo values
    // overlapping args must raise
    assertThrows[IllegalArgumentException] {
      Grid.expand(spark, ComboSpec.of("a" -> Seq(1L)), Some(cases))
    }
  }

  test("E5: coordinate union is sorted distinct") {
    import spark.implicits._
    val df = Seq(3L, 1L, 3L, 2L).toDF("a")
    assert(Grid.coordUnion(df, "a").as[Long].collect().toSeq == Seq(1L, 2L, 3L))
  }

  test("M9: missing = grid minus observed; union with observed = grid") {
    import spark.implicits._
    val observed = Seq((1L, 10L), (2L, 20L)).toDF("a", "b")
    val grid = Grid.effectiveGrid(observed, Seq("a", "b"))
    assert(grid.count() == 4)
    val miss = Grid.missing(grid, observed, Seq("a", "b"))
    assert(collectSorted(miss).toSet == Set(Seq[Any](1L, 20L), Seq[Any](2L, 10L)))
    // anti-join ∪ store = grid (SURVEY §5 property)
    assert(miss.count() + observed.count() == grid.count())
  }

  test("E7: sample draws exactly n distinct grid points") {
    val g = Grid.expand(spark, ComboSpec.of("a" -> (1L to 20L), "b" -> (1L to 5L)))
    val s = Grid.sample(g, 7, seed = 42)
    assert(s.count() == 7)
    assert(s.distinct().count() == 7)
    // sampled points are grid points
    assert(s.join(g, Seq("a", "b"), "left_anti").count() == 0)
  }

  test("E4: shuffled preserves the row multiset") {
    val g = Grid.expand(spark, ComboSpec.of("a" -> (1L to 10L)))
    assert(collectSorted(Grid.shuffled(g, 7)) == collectSorted(g))
  }
}
