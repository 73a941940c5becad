package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Tabular IO beyond the parquet store (IO2, manage.py:405-453):
  * format-dispatched save/load for the long-table shape. Parquet is
  * the canonical store; orc is the alternate columnar container
  * (HDF's role); csv/json cover interchange (the reference's pandas
  * to_csv/to_json paths). Pickle has no Spark analogue — columnar
  * parquet replaces it.
  */
object IO {

  def save(df: DataFrame, path: String, format: String = "parquet",
           mode: SaveMode = SaveMode.Overwrite): Unit = format match {
    case "parquet" => df.write.mode(mode).parquet(path)
    case "orc"     => df.write.mode(mode).orc(path)
    case "csv"     => df.write.mode(mode).option("header", "true").csv(path)
    case "json"    => df.write.mode(mode).json(path)
    case f => throw new IllegalArgumentException(s"unknown format $f")
  }

  def load(spark: SparkSession, path: String,
           format: String = "parquet"): DataFrame = format match {
    case "parquet" => spark.read.parquet(path)
    case "orc"     => spark.read.orc(path)
    case "csv"     => spark.read.option("header", "true")
      .option("inferSchema", "true").csv(path)
    case "json"    => spark.read.json(path)
    case f => throw new IllegalArgumentException(s"unknown format $f")
  }
}
