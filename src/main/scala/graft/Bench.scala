package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every registered query against
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Queries are forced through the `noop` sink — a bare `count()` lets
  * Catalyst prune the projections (a map-only query would measure an
  * empty scan), while noop materializes every output column without
  * write-side cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
    // warm-up: JIT/codegen + parquet footer caches, so the first timed
    // query isn't charged session startup
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    // each query runs twice and reports the faster pass: the first run
    // is dominated by whole-stage-codegen compilation + JIT (measured
    // ~0.5-3s/query), which is a fixed one-time cost, not the
    // throughput that scales with data — "value" is the steady-state
    // total, "cold_value" records the first-pass total for reference
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (t1, ok1) = once()
      val (t2, ok2) = if (ok1) once() else (t1, ok1)
      (name, math.min(t1, t2), t1, ok1 && ok2)
    }
    // a failed query must not masquerade as a fast success: its slot
    // carries -1 and the name is listed in "failed"
    val qs = results.map { case (k, v, _, ok) => "\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, _, true) => v }.sum
    val cold = results.collect { case (_, _, t1, true) => t1 }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"cold_value":$cold,"sf":"$sfDir"}""")
    spark.stop()
  }
}
