package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization discipline for derived stages (round-7 fault-
  * tolerance directive).
  *
  * `localCheckpoint()` truncates lineage AND pins the blocks to
  * executor-local storage: on a multi-executor cluster, losing one
  * executor after the checkpoint kills the job — there is no recompute
  * path, and the Spark docs call out dynamic allocation +
  * localCheckpoint as an unsafe pairing. At local[32] that failure
  * mode is invisible, which is exactly why the discipline lives here
  * as policy rather than per-site judgement calls:
  *
  *  - [[reuse]] — a DETERMINISTIC derived stage consumed by several
  *    plan branches (both sides of a self-join, a tf table feeding two
  *    aggregations). `persist(MEMORY_AND_DISK)` keeps the lineage:
  *    executor loss recomputes the lost partitions from source instead
  *    of failing the job, eviction spills to disk instead of dropping,
  *    and the persisted plan still blocks CollapseProject from
  *    inlining the stage's expressions into every consumer.
  *  - [[truncate]] — an ITERATIVE loop's contraction point, where
  *    cutting the plan is the point (star-contraction rounds would
  *    otherwise stack O(iters) joins into one Catalyst plan). Uses a
  *    RELIABLE `checkpoint()` when the session has a checkpoint dir
  *    configured (the cluster deployment: blocks live on the shared
  *    FS and survive executor loss), and falls back to
  *    `localCheckpoint()` only in local mode, where executor loss is
  *    JVM death anyway.
  */
object Materialize {

  /** Deterministic multi-consumer stage: persist with lineage kept. */
  def reuse(df: DataFrame): DataFrame = df.persist(StorageLevel.MEMORY_AND_DISK)

  /** Iterative-loop truncation point: reliable checkpoint when
    * configured, executor-local truncation otherwise (documented
    * local-mode-only fallback). */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
}
