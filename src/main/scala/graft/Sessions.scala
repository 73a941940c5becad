package graft

import org.apache.spark.sql.SparkSession

/** Session factory shared by Verify/Bench/tests — one place for the
  * configs the engine depends on.
  *
  * - shuffle.partitions = core count: local[N] has no reason for 200
  *   reducers; on a real cluster this is set per-deploy (or AQE
  *   coalesces it).
  * - AQE on (default in 4.x, pinned explicitly): runtime coalescing +
  *   skew-join handling are part of the 100 TB design.
  */
object Sessions {
  def local(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // compatibility, not semantics: TIMESTAMP(NANOS) parquet columns
      // (older exports) are otherwise REJECTED by the reader; with the
      // flag they arrive as Long nanos, which TimeFns' schema-adaptive
      // accessors convert. Plain TIMESTAMP (micros) columns — the
      // current events encoding — are unaffected by this flag.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // catalog tables (BucketedStore) land under /tmp, not the repo;
      // a cluster deployment points this at its metastore-backed path
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", "/tmp/graft_warehouse"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
