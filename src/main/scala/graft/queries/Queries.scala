package graft.queries

import graft.spec._
import graft.expand.Grid
import graft.run.{Eval, Runner}
import graft.collect.Collect
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared operator-query: the Spark implementation + (when
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB
  * on the same parquet tables. Column names must match exactly —
  * the driver sorts columns by name and hashes values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")


  // ---------------------------------------------------------------- core

  /** Flagship: the sweep-shaped aggregate (one "function evaluation"
    * per (returnflag, linestatus) grid cell) — TPC-H Q1 shape.
    */
  val q1Agg = QueryDef(
    "q1_agg",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
      // revenue in exact integer space: price has <=2 decimals and
      // discount <=4, so cents x discount-units is an exact long
      // product (<=1e11/row); the decimal(38,0) SUM is overflow-safe
      // at any corpus size, and /1e6 -> decimal(18,2) -> double equals
      // the dec4xdec4 decimal route bit-for-bit (same exact rational,
      // same HALF_UP at 2dp, same final IEEE round) while skipping two
      // decimal casts and a Decimal128 multiply per row (~25% faster).
      val prod = round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1.0) - col("l_discount")) * 10000).cast("long")
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity")).as("sum_qty"),
        (sum(prod.cast(DecimalType(38, 0))) / lit(1000000))
          .cast(DecimalType(18, 2)).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      sum(l_quantity) AS sum_qty,
      CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1-l_discount AS DECIMAL(18,4))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
      count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag, l_linestatus"""))

  /** E3: Cartesian expansion of data-derived axes (broadcast cross
    * join — axis tables are tiny by construction).
    */
  val e3Cross = QueryDef(
    "e3_cross_expand",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
      val ords = table(s, dir, "orders")
      Grid.expandDFs(Seq(
        li.select(col("l_returnflag").as("flag")).distinct(),
        li.select(col("l_linestatus").as("status")).distinct(),
        ords.select(col("o_orderpriority").as("priority")).distinct()))
    },
    Some("""SELECT f.flag, st.status, p.priority
      FROM (SELECT DISTINCT l_returnflag AS flag FROM lineitem) f
      CROSS JOIN (SELECT DISTINCT l_linestatus AS status FROM lineitem) st
      CROSS JOIN (SELECT DISTINCT o_orderpriority AS priority FROM orders) p"""))

  /** E5: case-coordinate union — sorted distinct coordinates of an
    * axis (combo_runner.py:257-266).
    */
  val e5Coords = QueryDef(
    "e5_coord_union",
    (s, dir) => Grid.coordUnion(table(s, dir, "part"), "p_brand"),
    Some("SELECT DISTINCT p_brand FROM part ORDER BY p_brand"))

  /** V1: sweep evaluation — literal combo axes × named output
    * expressions via Runner (the combo_runner_to_df hot path).
    */
  val v1Sweep = QueryDef(
    "v1_sweep_eval",
    (s, _) => {
      val combos = ComboSpec.of(
        "a" -> Seq(1L, 2L, 3L, 4L, 5L),
        "b" -> Seq(10L, 20L, 30L))
      Runner.ofColumns(
        "total" -> (col("a") + col("b")),
        "prod"  -> (col("a") * col("b"))
      ).runCombos(s, combos)
    },
    Some("""SELECT CAST(a.a AS BIGINT) AS a, CAST(b.b AS BIGINT) AS b,
      CAST(a.a + b.b AS BIGINT) AS total, CAST(a.a * b.b AS BIGINT) AS prod
      FROM (SELECT unnest([1,2,3,4,5]) AS a) a
      CROSS JOIN (SELECT unnest([10,20,30]) AS b) b"""))

  /** V4: multi-output evaluation with constants recorded as columns
    * (constants→coords, combo_runner.py:517-535).
    */
  val v4Multi = QueryDef(
    "v4_multi_output",
    (s, _) => {
      val combos = ComboSpec.of("a" -> Seq(1L, 2L, 3L), "b" -> Seq(4L, 5L))
      Runner.ofColumns(
        Constants(recorded = Map("c" -> 100L)),
        "sum"  -> (col("a") + col("b") + col("c")),
        "even" -> (col("a") % 2 === 0)
      ).runCombos(s, combos)
    },
    Some("""SELECT CAST(a.a AS BIGINT) AS a, CAST(b.b AS BIGINT) AS b,
      CAST(100 AS BIGINT) AS c,
      CAST(a.a + b.b + 100 AS BIGINT) AS sum,
      (a.a % 2 = 0) AS even
      FROM (SELECT unnest([1,2,3]) AS a) a
      CROSS JOIN (SELECT unnest([4,5]) AS b) b"""))

  /** V2: sweep THROUGHPUT — a 1M-point grid (1000×1000 broadcast
    * cross join of range axes) evaluated and reduced in one pass.
    * The reference's published sweep overhead is ~85k points/s
    * single-process (BASELINE.md); this shape is where the
    * distributed evaluation path has to win, not the 15-point grids.
    */
  val v2Throughput = QueryDef(
    "v2_sweep_throughput",
    (s, _) => {
      val a = s.range(0, 1000).toDF("a")
      val b = s.range(0, 1000).toDF("b")
      graft.expand.Grid.expandDFs(Seq(a, b))
        .withColumn("y", col("a") * col("b") + (col("a") - col("b")))
        .withColumn("z", pmod(col("a") * 31L + col("b") * 17L, lit(97L)))
        .groupBy(pmod(col("a"), lit(8L)).as("bucket"))
        .agg(count(lit(1)).as("n"), sum("y").as("sum_y"), sum("z").as("sum_z"))
    },
    Some("""SELECT a.a % 8 AS bucket, count(*) AS n,
      CAST(SUM(a.a * b.b + (a.a - b.b)) AS BIGINT) AS sum_y,
      CAST(SUM((a.a * 31 + b.b * 17) % 97) AS BIGINT) AS sum_z
      FROM (SELECT unnest(range(0, 1000)) AS a) a
      CROSS JOIN (SELECT unnest(range(0, 1000)) AS b) b
      GROUP BY 1"""))

  /** C6: explicit CASES (non-Cartesian point list) × combos evaluated
    * through the same Runner — xyzpy's cases+combos product where the
    * cases are individually enumerated coordinates.
    */
  val c6Cases = QueryDef(
    "c6_case_runs",
    (s, _) => {
      val cases = CaseSpec(Seq("x", "y"),
        Seq(Seq(1L, 10L), Seq(2L, 10L), Seq(5L, 40L)))
      val combos = ComboSpec.of("m" -> Seq(2L, 3L))
      Runner.ofColumns("z" -> (col("x") * col("m") + col("y")))
        .runCombos(s, combos, Some(cases))
    },
    Some("""SELECT CAST(c.x AS BIGINT) AS x, CAST(c.y AS BIGINT) AS y,
      CAST(m.m AS BIGINT) AS m, CAST(c.x * m.m + c.y AS BIGINT) AS z
      FROM (VALUES (1, 10), (2, 10), (5, 40)) c(x, y)
      CROSS JOIN (SELECT unnest([2,3]) AS m) m"""))

  /** V6: error-tolerant evaluation — a sweep whose function throws on
    * one grid point; the failed cell carries the error string and a
    * NULL value instead of killing the sweep (xyzpy allow_error).
    * The error payload (`Throwable.toString`) is deterministic, so
    * even the error column oracles exactly.
    */
  val v6Tolerant = QueryDef(
    "v6_error_tolerant",
    (s, _) => {
      val grid = Grid.expand(s, ComboSpec.of(
        "a" -> Seq(1L, 2L, 3L, 4L, 5L), "b" -> Seq(10L, 20L)))
      Eval.tryEval2(grid, "a", "b", "r") { (a, b) =>
        if (a == 3L) throw new ArithmeticException("bad point")
        else b.toDouble / (a - 3L)
      }.select(col("a"), col("b"),
        col("r.value").as("value"), col("r.error").as("error"))
    },
    Some("""SELECT CAST(a.a AS BIGINT) AS a, CAST(b.b AS BIGINT) AS b,
      CASE WHEN a.a <> 3 THEN b.b / (a.a - 3.0) END AS value,
      CASE WHEN a.a = 3
           THEN 'java.lang.ArithmeticException: bad point' END AS error
      FROM (SELECT unnest([1,2,3,4,5]) AS a) a
      CROSS JOIN (SELECT unnest([10,20]) AS b) b"""))

  /** M9/E6/F2: missing-point discovery — grid left-anti observed
    * combinations (xyzpy's missing_only work-skipping).
    */
  val m9Missing = QueryDef(
    "m9_missing_cases",
    (s, dir) => {
      val part = table(s, dir, "part")
      val grid = Grid.expandDFs(Seq(
        part.select("p_brand").distinct(),
        part.select("p_size").distinct()))
      Grid.missing(grid, part, Seq("p_brand", "p_size"))
    },
    Some("""SELECT g.p_brand, g.p_size
      FROM (SELECT DISTINCT b.p_brand, s.p_size
            FROM (SELECT DISTINCT p_brand FROM part) b
            CROSS JOIN (SELECT DISTINCT p_size FROM part) s) g
      WHERE NOT EXISTS (SELECT 1 FROM part p
        WHERE p.p_brand = g.p_brand AND p.p_size = g.p_size)"""))

  /** C1/C2: dense pivoted view — the xarray-Dataset shape as a
    * relational pivot (NULL where the grid cell is unvisited).
    */
  val c1Dense = QueryDef(
    "c1_dense_pivot",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
      Collect.dense(
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity").as("q")),
        rowAxes = Seq("l_returnflag"), colAxis = "l_linestatus",
        value = "q", colValues = Seq("F", "O"))
    },
    Some("""SELECT l_returnflag,
      sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS "F",
      sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS "O"
      FROM lineitem GROUP BY l_returnflag"""))

  /** C2 internal dims: array-valued output exploded into an extra dim
    * column with coordinate lookup (var_dims/var_coords).
    */
  val c2Explode = QueryDef(
    "c2_internal_dims",
    (s, _) => {
      val combos = ComboSpec.of("a" -> Seq(1L, 2L), "b" -> Seq(3L, 4L))
      val swept = Runner.ofColumns(
        "xs" -> transform(sequence(lit(0), lit(2)),
                  i => col("a") + col("b") * i)
      ).runCombos(s, combos)
      Collect.explodeDim(swept, "xs", "t")
        .withColumnRenamed("xs", "x")
        .withColumn("t", col("t").cast("bigint"))
    },
    Some("""SELECT CAST(a.a AS BIGINT) AS a, CAST(b.b AS BIGINT) AS b,
      CAST(a.a + b.b * i.i AS BIGINT) AS x, CAST(i.i AS BIGINT) AS t
      FROM (SELECT unnest([1,2]) AS a) a
      CROSS JOIN (SELECT unnest([3,4]) AS b) b
      CROSS JOIN (SELECT unnest([0,1,2]) AS i) i"""))

  /** P7 `auto_xyz_ds` (manage.py:313-346): raw aligned arrays coerced
    * to a labelled long table. Values are exact IEEE doubles on both
    * sides (halves/quarters) so the hash compare is bit-exact.
    */
  val p7AutoXyz = QueryDef(
    "p7_auto_xyz",
    (s, _) => Collect.autoXYZ(s,
      xs = Seq(0.5, 1.5, 2.5, 3.5, 4.5),
      ys = Seq(10.25, 20.5, 30.75, 41.0, 51.25)),
    Some("""SELECT CAST(unnest([0.5, 1.5, 2.5, 3.5, 4.5]) AS DOUBLE) AS x,
      CAST(unnest([10.25, 20.5, 30.75, 41.0, 51.25]) AS DOUBLE) AS y"""))

  // ------------------------------------------------------------ registry

  val all: Seq[QueryDef] = Seq(
    q1Agg, e3Cross, e5Coords, v1Sweep, v2Throughput, v4Multi, v6Tolerant, c6Cases, m9Missing, c1Dense,
    c2Explode, p7AutoXyz) ++ StoreReduceQueries.all ++ TextQueries.all ++
    LifecycleQueries.all ++ ComplexQueries.all ++ ClusterQueries.all ++
    WetQueries.all

  def queryMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
