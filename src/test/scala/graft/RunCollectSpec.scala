package graft

import graft.spec._
import graft.expand.Grid
import graft.run.{Eval, Runner}
import graft.collect.Collect
import org.apache.spark.sql.functions._

class RunSpec extends SparkSpec {

  test("V1: sweep eval matches per-point function application") {
    val r = Runner.ofColumns("total" -> (col("a") + col("b")))
    val out = r.runCombos(spark,
      ComboSpec.of("a" -> Seq(1L, 2L, 3L), "b" -> Seq(10L, 20L)))
    val got = collectSorted(out)
    val want = (for (a <- Seq(1L, 2L, 3L); b <- Seq(10L, 20L))
      yield Seq[Any](a, b, a + b)).sortBy(_.mkString("|"))
    assert(got == want)
    assert(r.lastDF.isDefined)
  }

  test("constants are recorded as columns (combo_runner.py:517-535)") {
    val r = Runner.ofColumns(Constants(recorded = Map("c" -> 5L)),
      "y" -> (col("a") * col("c")))
    val out = r.runCombos(spark, ComboSpec.of("a" -> Seq(1L, 2L)))
    assert(out.columns.toSet == Set("a", "c", "y"))
    assert(collectSorted(out) == Seq(Seq[Any](1L, 5L, 5L), Seq[Any](2L, 5L, 10L)))
  }

  test("V4: struct output split into fields (combo_runner.py:293-297)") {
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("a")
      .withColumn("r", struct((col("a") + 1).as("p"), (col("a") * 2).as("q")))
    val out = Eval.splitStruct(df, "r")
    assert(out.columns.toSeq == Seq("a", "p", "q"))
    assert(collectSorted(out) == Seq(Seq[Any](1L, 2L, 2L), Seq[Any](2L, 3L, 4L)))
  }

  test("V6: error-tolerant eval yields (null, message) rows") {
    val g = Grid.expand(spark, ComboSpec.of("a" -> Seq(0L, 1L), "b" -> Seq(2L)))
    val out = Eval.tryEval2(g, "a", "b", "r") { (x, y) =>
      if (x == 0L) throw new ArithmeticException("bad point") else x.toDouble / y
    }
    val byA = out.select("a", "r.value", "r.error").collect()
      .map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    assert(byA(0L)._1 == null && byA(0L)._2.toString.contains("bad point"))
    assert(byA(1L)._1 == 0.5 && byA(1L)._2 == null)
  }
}

class CollectSpec extends SparkSpec {

  test("C1/C2: dense pivot NULL-fills unvisited cells (case_runner NaN-fill)") {
    import spark.implicits._
    val long = Seq((1L, "x", 10.0), (2L, "y", 20.0)).toDF("a", "k", "v")
    val dense = Collect.dense(long, Seq("a"), "k", "v", Seq("x", "y"))
    val byA = dense.collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    assert(byA(1L) == ((10.0, null)))
    assert(byA(2L) == ((null, 20.0)))
  }

  test("C2 var_dims: explodeDim with coords lookup (prepare.py:126-215)") {
    import spark.implicits._
    val df = Seq((1L, Seq(10.0, 11.0))).toDF("a", "xs")
    val out = Collect.explodeDim(df, "xs", "t", coords = Seq(0.5, 1.5))
    assert(collectSorted(out.select("a", "xs", "t")) ==
      Seq(Seq[Any](1L, 10.0, 0.5), Seq[Any](1L, 11.0, 1.5)))
  }

  test("C3: Dataset-returning fn flattened along sweep dims") {
    import spark.implicits._
    val df = Seq((1L, Seq((0, 1.0), (1, 2.0))), (2L, Seq((0, 3.0))))
      .toDF("a", "inner")
      .withColumn("inner", col("inner").cast("array<struct<t:int,v:double>>"))
    val out = Collect.concatInner(df, "inner")
    assert(out.columns.toSeq == Seq("a", "t", "v"))
    assert(out.count() == 3)
  }

  test("P2: melt to long (variable, value) rows") {
    import spark.implicits._
    val df = Seq((1L, 2.0, 3.0)).toDF("a", "x", "y")
    val out = Collect.melt(df, Seq("a"), Seq("x", "y"))
    assert(collectSorted(out) ==
      Seq(Seq[Any](1L, "x", 2.0), Seq[Any](1L, "y", 3.0)))
  }

  test("P8/P9: sortDims + postFix") {
    import spark.implicits._
    val df = Seq((1.0, 2L, "k")).toDF("v", "a", "key")
    assert(Collect.sortDims(df, Seq("key", "a")).columns.toSeq ==
      Seq("key", "a", "v"))
    assert(Collect.postFix(df, Seq("key"), "_2").columns.toSet ==
      Set("v_2", "a_2", "key"))
  }
}
