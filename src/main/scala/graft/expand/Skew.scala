package graft.expand

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys.
  *
  * AQE's skew-join handling covers joins; heavily-skewed *aggregations*
  * (one grid cell holding most rows — e.g. an `en`-dominant language
  * key at corpus scale) still funnel into one reducer. The classic fix
  * is two-stage salting: aggregate on (keys, salt) first — spreading
  * the hot key over `salts` reducers — then combine the partials.
  * Valid for algebraic aggregates (sum/count/min/max; avg via
  * sum+count).
  */
object Skew {

  /** sum/count/min/max on `valueCol` per `keys`, computed skew-safely
    * over `salts`-way salted partials.
    */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: String,
                  salts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__sum"), count(col(valueCol)).as("__n"),
        min(col(valueCol)).as("__min"), max(col(valueCol)).as("__max"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum("__sum").as("sum"), sum("__n").as("n"),
        min("__min").as("min"), max("__max").as("max"))
      .withColumn("mean", col("sum") / col("n"))
  }
}
