package graft

import graft.collect.Collect
import graft.expand.Grid
import graft.run.Farming
import graft.reduce.{MissingData, Reduce}
import graft.spec._
import org.apache.spark.sql.functions._

/** Runnable end-to-end walkthrough of the engine — the reference's
  * README workflow re-expressed: declare outputs, harvest a sweep
  * incrementally, widen an axis with missing-only work skipping, view
  * densely, discover holes, reduce with error bands.
  *
  * `sbt "runMain graft.Demo"`
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val dir = java.nio.file.Files.createTempDirectory("graft-demo").toString

    // 1. a Harvester: outputs declared once, bound to an on-disk store
    val h = Farming.harvester(spark, s"$dir/store", Seq("alpha", "beta"),
      "energy" -> (col("alpha") * col("alpha") - col("beta")),
      "stable" -> (col("alpha") * col("alpha") > col("beta")))

    // 2. first harvest: 3×3 grid
    println("== harvest 3x3 ==")
    h.harvestCombos(Seq(
      "alpha" -> Some(Seq(1L, 2L, 3L)),
      "beta" -> Some(Seq(0L, 4L, 9L)))).show()

    // 3. widen alpha; missing_only evaluates ONLY the 3 new points
    println("== widen alpha to 4 values (missing-only) ==")
    val full = h.harvestCombos(Seq(
      "alpha" -> Some(Seq(1L, 2L, 3L, 4L)), "beta" -> None),
      missingOnly = true)
    full.show()

    // 4. dense (xarray-style) view: alpha rows × beta columns
    println("== dense view of energy ==")
    Collect.dense(full, Seq("alpha"), "beta", "energy",
      colValues = Seq(0L, 4L, 9L)).orderBy("alpha").show()

    // 5. reductions: stderr band of energy over beta
    println("== mean±stderr of energy per alpha ==")
    Reduce.stderrBand(full, Seq("alpha"), "energy").orderBy("alpha").show()

    // 6. grid holes after dropping a coordinate
    h.store.dropSel("beta", Seq(4L))
    val grid = Grid.expandDFs(Seq(
      h.store.coords("alpha").toDF("alpha"), spark.range(0, 10).toDF("beta")))
    println("== unvisited grid points (anti-join) ==")
    println(s"missing: ${h.store.missing(grid).count()} of ${grid.count()}")

    spark.stop()
  }
}
