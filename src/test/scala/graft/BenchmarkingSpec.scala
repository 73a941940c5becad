package graft

import graft.stats.{Benchmarking, CacheToDisk}
import org.apache.spark.sql.functions._

class BenchmarkingSpec extends SparkSpec {

  test("A10: adaptive benchmark returns a positive best time and ≥3 reps") {
    val (best, reps) = Benchmarking.benchmark(
      () => (1 to 1000).map(math.sqrt(_)).sum, minTotalMs = 10)
    assert(best > 0 && reps >= 3)
  }

  test("A9: benchmark sweep produces one row per kernel × size") {
    val df = Benchmarking.benchmarkSweep(spark,
      Map("sum" -> ((n: Long) => { (0L until n).sum; () }),
          "count" -> ((n: Long) => { (0L until n).count(_ => true); () })),
      sizes = Seq(10L, 100L), minTotalMs = 5)
    assert(df.count() == 4)
    assert(df.columns.toSeq == Seq("kernel", "n", "best_sec", "repeats"))
    assert(df.filter(col("best_sec") <= 0).count() == 0)
  }

  test("S6/S7: progress listener observes tasks and records of a real job") {
    val (sum, l) = Benchmarking.withProgress(spark) {
      spark.range(0, 100000, 1, 8).agg(org.apache.spark.sql.functions.sum("id"))
        .collect()(0).getLong(0)
    }
    assert(sum == 4999950000L)
    assert(l.tasksCompleted >= 8)
  }

  test("S8: size estimate grows with object size") {
    val small = Array.fill(10)(0L)
    val big = Array.fill(10000)(0L)
    assert(Benchmarking.estimateSize(big) > Benchmarking.estimateSize(small))
  }

  test("IO3: cacheToDisk persists with DISK_ONLY") {
    import spark.implicits._
    val df = CacheToDisk(Seq(1, 2, 3).toDF("x"))
    assert(df.storageLevel.useDisk && !df.storageLevel.useMemory)
    assert(df.count() == 3)
    CacheToDisk.release(df)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }
}
