package graft.queries

import graft.functions.ComplexFns._
import graft.run.Runner
import graft.spec.ComboSpec
import org.apache.spark.sql.functions._

/** Complex-valued sweep queries (the reference's complex-array
  * capability, test_combo_runner.py:246-262, as struct algebra).
  */
object ComplexQueries {

  /** CX1: sweep z = e^{i·k·x} · (c + i·k) over a (k, x) grid; emit
    * re/im/|z|/arg — every complex op exercised, oracled with plain
    * trigonometry.
    */
  val cx1 = QueryDef(
    "cx1_complex_sweep",
    (s, _) => {
      val combos = ComboSpec.of(
        "k" -> Seq(1L, 2L, 3L), "x" -> Seq(0L, 1L, 2L, 3L))
      Runner.ofColumns(
        "z" -> mul(expi(col("k") * col("x")), complex(lit(2.0), col("k")))
      ).runCombos(s, combos)
        .select(col("k"), col("x"),
          round(re(col("z")), 6).as("z_re"),
          round(im(col("z")), 6).as("z_im"),
          round(modulus(col("z")), 6).as("z_abs"),
          round(arg(col("z")), 6).as("z_arg"))
    },
    Some("""SELECT CAST(k.k AS BIGINT) AS k, CAST(x.x AS BIGINT) AS x,
      ROUND(cos(k.k*x.x)*2 - sin(k.k*x.x)*k.k, 6) AS z_re,
      ROUND(cos(k.k*x.x)*k.k + sin(k.k*x.x)*2, 6) AS z_im,
      ROUND(sqrt((cos(k.k*x.x)*2 - sin(k.k*x.x)*k.k)^2 +
                 (cos(k.k*x.x)*k.k + sin(k.k*x.x)*2)^2), 6) AS z_abs,
      ROUND(atan2(cos(k.k*x.x)*k.k + sin(k.k*x.x)*2,
                  cos(k.k*x.x)*2 - sin(k.k*x.x)*k.k), 6) AS z_arg
      FROM (SELECT unnest([1,2,3]) AS k) k
      CROSS JOIN (SELECT unnest([0,1,2,3]) AS x) x"""))

  /** CX2: complex values through the STORE MERGE path (the reference
    * harvests complex sweeps into its store and merges shards,
    * test_case_runner.py:134-190). Two half-grids overlap at k = 2
    * with IDENTICAL complex cells, so the NoConflicts in-plan guard
    * evaluates struct(re,im) equality (equal → coalesce, not raise)
    * and the full-outer merge coalesces struct cells from whichever
    * side carries them. Oracle: the same trigonometry as cx1 over the
    * union grid.
    */
  val cx2 = QueryDef(
    "cx2_complex_store_merge",
    (s, _) => {
      def half(ks: Seq[Long]) = {
        val combos = ComboSpec.of("k" -> ks, "x" -> Seq(0L, 1L, 2L, 3L))
        Runner.ofColumns(
          "z" -> mul(expi(col("k") * col("x")), complex(lit(2.0), col("k")))
        ).runCombos(s, combos)
      }
      val merged = graft.store.Merge.merge(
        half(Seq(1L, 2L)), half(Seq(2L, 3L)), Seq("k", "x"))
      merged.select(col("k"), col("x"),
        round(re(col("z")), 6).as("z_re"),
        round(im(col("z")), 6).as("z_im"))
    },
    Some("""SELECT CAST(k.k AS BIGINT) AS k, CAST(x.x AS BIGINT) AS x,
      ROUND(cos(k.k*x.x)*2 - sin(k.k*x.x)*k.k, 6) AS z_re,
      ROUND(cos(k.k*x.x)*k.k + sin(k.k*x.x)*2, 6) AS z_im
      FROM (SELECT unnest([1,2,3]) AS k) k
      CROSS JOIN (SELECT unnest([0,1,2,3]) AS x) x"""))

  /** CX3: complex values through the LEGACY-STORE bridge both ways —
    * the reference's canonical complex persistence
    * (test_manage.py:15-27, 92-111: a complex128 variable saved and
    * reloaded through zarr). The cx1 sweep writes to a zarr v2 store
    * (struct cells → `<c16` chunks via [[graft.sources.ZarrSink]]),
    * reads back via [[graft.sources.ZarrSource]], and must reproduce
    * the same trigonometry — so encode layout, fill metadata, and the
    * struct(re,im) read path are all on the compare path.
    */
  val cx3 = QueryDef(
    "cx3_complex_zarr_roundtrip",
    (s, _) => {
      val combos = ComboSpec.of(
        "k" -> Seq(1L, 2L, 3L), "x" -> Seq(0L, 1L, 2L, 3L))
      val grid = Runner.ofColumns(
        "z" -> mul(expi(col("k") * col("x")), complex(lit(2.0), col("k")))
      ).runCombos(s, combos)
      val d = graft.TempDirs.scratch("cx3") + "/grid.zarr"
      graft.sources.ZarrSink.writeDataset(grid, d, Seq("k", "x"))
      graft.sources.ZarrSource.readDataset(s, d)
        .select(col("k"), col("x"),
          round(re(col("z")), 6).as("z_re"),
          round(im(col("z")), 6).as("z_im"))
    },
    Some("""SELECT CAST(k.k AS BIGINT) AS k, CAST(x.x AS BIGINT) AS x,
      ROUND(cos(k.k*x.x)*2 - sin(k.k*x.x)*k.k, 6) AS z_re,
      ROUND(cos(k.k*x.x)*k.k + sin(k.k*x.x)*2, 6) AS z_im
      FROM (SELECT unnest([1,2,3]) AS k) k
      CROSS JOIN (SELECT unnest([0,1,2,3]) AS x) x"""))

  val all: Seq[QueryDef] = Seq(cx1, cx2, cx3)
}
