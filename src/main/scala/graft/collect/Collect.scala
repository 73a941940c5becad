package graft.collect

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collection / reshaping — long ↔ dense views (SURVEY §2.3).
  *
  * The canonical shape is the tidy long DataFrame (one row per
  * evaluated point — xyzpy's `results_to_df`, combo_runner.py:538-569).
  * The dense labelled N-d Dataset (`results_to_ds`,
  * combo_runner.py:473-535) is a *view*: pivot one axis to columns, or
  * keep the long form keyed on axis columns. At 100 TB the long form is
  * the only viable canonical form — a pivot materializes |colAxis|
  * columns and is only for small rendered views (heatmaps, goldens).
  */
object Collect {

  /** C1/C2 dense view: grid axes → rows × one axis → columns.
    * Unvisited cells become NULL (xyzpy's NaN-fill,
    * combo_runner.py:47-74) because pivot is an outer operation.
    * `colValues` pins the pivot domain (avoids the extra distinct job
    * and keeps column order deterministic).
    */
  def dense(df: DataFrame, rowAxes: Seq[String], colAxis: String,
            value: String, colValues: Seq[Any] = Nil): DataFrame = {
    val g = df.groupBy(rowAxes.map(col): _*)
    val p = if (colValues.nonEmpty) g.pivot(colAxis, colValues)
            else g.pivot(colAxis)
    p.agg(first(col(value), ignoreNulls = true))
  }

  /** Internal output dimensions (`var_dims`/`var_coords`,
    * prepare.py:126-215): an array-valued output exploded into an
    * extra dim column, keeping everything relational. `coords` maps
    * position → coordinate value (xyzpy's var_coords); when empty the
    * position itself is the coordinate.
    */
  def explodeDim(df: DataFrame, arrayCol: String, dimName: String,
                 coords: Seq[Any] = Nil): DataFrame = {
    val others = df.columns.filterNot(_ == arrayCol).map(col)
    val exploded = df.select(
      others :+ posexplode(col(arrayCol)).as(Seq("__pos", arrayCol)): _*)
    val withDim =
      if (coords.isEmpty) exploded.withColumn(dimName, col("__pos"))
      else {
        val lut = array(coords.map(lit): _*)
        exploded.withColumn(dimName, element_at(lut, col("__pos") + 1))
      }
    withDim.drop("__pos")
  }

  /** C3 `multi_concat`: per-point array-of-struct results (a
    * Dataset-returning fn, combo_runner.py:447-465,493-503) flattened
    * along the sweep dims — inner coords become ordinary columns.
    */
  def concatInner(df: DataFrame, arrayOfStructCol: String): DataFrame = {
    val others = df.columns.filterNot(_ == arrayOfStructCol).map(col)
    df.select(others :+ explode(col(arrayOfStructCol)).as("__s"): _*)
      .select(others :+ col("__s.*"): _*)
  }

  /** P2 multi-var melt: wide value columns → (var, value) long rows
    * (z-iteration over multiple y variables, plot/core.py:234-271).
    */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String = "variable", valueName: String = "value"): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray,
      varName, valueName)

  /** P4: fuse several dims into one composite iteration key
    * (infiniplot.py:569-578 stack). */
  def stackDims(df: DataFrame, dims: Seq[String], name: String,
                sep: String = "|"): DataFrame =
    df.withColumn(name, concat_ws(sep, dims.map(col): _*))

  /** P7 `auto_xyz_ds` (manage.py:313-346): a raw array + coordinate
    * values coerced to a labelled long table.
    */
  def autoXYZ(spark: org.apache.spark.sql.SparkSession,
              xs: Seq[Double], ys: Seq[Double],
              xName: String = "x", yName: String = "y"): DataFrame = {
    import spark.implicits._
    require(xs.size == ys.size, "x and y must align")
    xs.zip(ys).toDF(xName, yName)
  }

  /** Free-form sweep `attrs` (combo_runner.py:514-515) attached as
    * column metadata on a marker column's schema — survives parquet
    * round-trips, never becomes data. */
  def withAttrs(df: DataFrame, attrs: Map[String, String]): DataFrame = {
    val mb = new org.apache.spark.sql.types.MetadataBuilder()
    attrs.foreach { case (k, v) => mb.putString(k, v) }
    val first = df.columns.head
    df.withColumn(first, col(first).as(first, mb.build()))
  }

  /** Read back attrs attached by [[withAttrs]]. */
  def attrsOf(df: DataFrame): Map[String, String] = {
    val md = df.schema.head.metadata
    val json = org.json4s.jackson.JsonMethods.parse(md.json)
    json match {
      case org.json4s.JObject(fields) => fields.collect {
        case (k, org.json4s.JString(v)) => k -> v
      }.toMap
      case _ => Map.empty
    }
  }

  /** P1 facet grid (plot/core.py:752-768): split by row/col coordinate
    * values into panel sub-frames. The distinct panel key set is tiny
    * (it indexes subplots) — collected once; each panel is a pruned
    * filter over the source, so downstream evaluation stays lazy and
    * partition-pruned when the store is partitioned by a facet dim.
    */
  def facets(df: DataFrame, rowDim: String, colDim: String)
      : Seq[((Any, Any), DataFrame)] =
    df.select(rowDim, colDim).distinct()
      .orderBy(rowDim, colDim).collect().toSeq
      .map { r =>
        ((r.get(0), r.get(1)),
          df.filter(col(rowDim) === r.get(0) && col(colDim) === r.get(1)))
      }

  /** P8 `sort_dims`: canonical column order (manage.py:230-247). */
  def sortDims(df: DataFrame, order: Seq[String]): DataFrame = {
    val rest = df.columns.filterNot(order.contains)
    df.select((order ++ rest).map(col): _*)
  }

  /** P9 `post_fix`: suffix every non-key column (manage.py:250-265). */
  def postFix(df: DataFrame, keys: Seq[String], suffix: String): DataFrame =
    df.columns.foldLeft(df) { (d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, c + suffix)
    }
}
