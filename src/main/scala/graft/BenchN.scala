package graft

/** Dev-only repeated-measure bench: runs the named queries K times each
  * in one warm JVM and prints per-query min/median — one-shot timings
  * on this box swing ±15% with background JVM teardown, the min is the
  * stable signal. Usage:
  * SPARK_GRAFT_QUERIES=d2_jaccard_pairs,d3_minhash_lsh SPARK_GRAFT_ITERS=3
  */
object BenchN {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val names = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        Materialize.releaseAll() // outside the timer, like Bench
        t
      }.sorted
      println(f"[benchN] $name%-26s min ${ts.head}%6.2f  med ${ts(ts.size / 2)}%6.2f  max ${ts.last}%6.2f")
    }
    spark.stop()
  }
}
