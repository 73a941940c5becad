package graft.stats

import graft.run.Runner
import graft.spec.ComboSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/** Benchmarking + progress/memory observation utilities
  * (SURVEY §2.8 S6-S8, §2.6 A9-A10; reference utils.py:94-355,761-942).
  */
object Benchmarking {

  /** A10 `benchmark` (utils.py:180-259): adaptive min-of-repeats
    * timing of a thunk — repeats grow until `minTotalMs` of work is
    * observed; returns (bestSec, repeats).
    */
  def benchmark[T](fn: () => T, minTotalMs: Long = 200,
                   maxRepeats: Int = 64): (Double, Int) = {
    var best = Double.MaxValue
    var reps = 0
    val tEnd = System.nanoTime() + minTotalMs * 1000000L
    while ((reps < 3 || System.nanoTime() < tEnd) && reps < maxRepeats) {
      val t0 = System.nanoTime()
      fn()
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
      reps += 1
    }
    (best, reps)
  }

  /** A9 `Benchmarker` (utils.py:262-355): time a kernel over a
    * (kernel × size) sweep into a tidy DataFrame — itself just a sweep
    * whose measure is wall time.
    */
  def benchmarkSweep(spark: SparkSession,
                     kernels: Map[String, Long => Unit],
                     sizes: Seq[Long], minTotalMs: Long = 50): DataFrame = {
    import spark.implicits._
    val rows = for {
      (name, k) <- kernels.toSeq
      n <- sizes
    } yield {
      val (t, reps) = benchmark(() => k(n), minTotalMs)
      (name, n, t, reps)
    }
    rows.toDF("kernel", "n", "best_sec", "repeats")
  }

  /** S6 progress: a SparkListener counting finished tasks — the
    * engine-side analogue of the reference's tqdm hook. Attach, run,
    * read `tasksCompleted`/`recordsRead`, detach.
    */
  final class ProgressListener extends SparkListener {
    private val tasks = new LongAdder
    private val records = new LongAdder
    private val peakMem = new AtomicLong(0L)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      tasks.increment()
      val m = e.taskMetrics
      if (m != null) {
        records.add(m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead)
        peakMem.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
      }
    }
    def tasksCompleted: Long = tasks.sum()
    def recordsRead: Long = records.sum()
    /** S7: peak per-task execution memory (bytes) — the engine-side
      * MemoryMonitor (utils.py:761-826 observes RSS; Spark exposes the
      * managed-memory peak per task). */
    def peakTaskMemory: Long = peakMem.get()
  }

  /** Attach a listener for the duration of `body`. */
  def withProgress[T](spark: SparkSession)(body: => T): (T, ProgressListener) = {
    val l = new ProgressListener
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      // listener events post asynchronously (no public drain API):
      // poll until the task counter stabilizes
      var last = -1L
      var spins = 0
      while (l.tasksCompleted != last && spins < 40) {
        last = l.tasksCompleted
        Thread.sleep(50)
        spins += 1
      }
      (r, l)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  /** S8 `getsizeof`: Spark's own deep size estimate. */
  def estimateSize(obj: AnyRef): Long =
    org.apache.spark.util.SizeEstimator.estimate(obj)
}

/** IO3 `cache_to_disk` (manage.py:15-29): result memoization. In Spark
  * the idioms are (a) `persist` for intra-session reuse and (b) the
  * harvest-store anti-join for cross-session memoization (M9); this
  * helper is (a) with an explicit storage level.
  */
object CacheToDisk {
  def apply(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)

  /** Explicit release — CacheToDisk is USER-managed memoization, so its
    * lifetime is deliberately not tied to [[graft.Materialize.releaseAll]]
    * (a runner quiescing between queries must not drop a cache the user
    * asked to keep). Callers pair apply/release like open/close. */
  def release(df: DataFrame): DataFrame = df.unpersist(blocking = false)
}
