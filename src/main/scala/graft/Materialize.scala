package graft

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable

/** Materialization discipline for derived stages.
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
  *
  * == Release discipline (round-8) ==
  *
  * Every cached stage must be RELEASED once the pipeline that created
  * it has run its terminal action — a long-lived driver running many
  * pipelines would otherwise accumulate cached stages without bound,
  * and MEMORY_AND_DISK eviction then thrashes recompute exactly on the
  * cache-dependent plans. Two forms:
  *
  *  - [[withReuse]] — scoped: persist, run the body (which must
  *    perform every action that benefits from the cache), unpersist in
  *    `finally`. Use when the stage does NOT escape into a returned
  *    lazy plan.
  *  - [[reuse]]/[[truncate]] + [[releaseAll]] — registry: most graft
  *    pipelines RETURN a lazy DataFrame whose plan references the
  *    cached stage, so the stage must outlive the function that built
  *    it. Both calls register what they pin in a session-global
  *    registry; the pipeline's RUNNER (Verify / Bench / a test
  *    harness / a user driver) calls `releaseAll()` after the terminal
  *    action (write/collect). Releasing is non-blocking. A released
  *    [[reuse]] plan that is re-run afterwards recomputes from source
  *    (the CacheManager keeps lineage) — safe, never wrong. A released
  *    [[truncate]]-LOCAL frame must NOT be re-run: localCheckpoint cut
  *    the lineage and unpersist dropped the only copy, so a re-run
  *    fails with a missing-checkpoint-block error rather than
  *    recomputing. releaseAll() is therefore a QUIESCE point — call it
  *    when the pipeline's outputs have been written/collected and its
  *    frames will not be driven again (with a checkpoint dir set,
  *    `truncate` uses reliable checkpoints and re-runs stay safe).
  *
  * `truncate`'s local fallback is tracked by RDD-id diff around the
  * (eager) `localCheckpoint()` call: `Dataset.unpersist` cannot reach
  * the checkpointed RDD (it lives behind a `LogicalRDD`, not the
  * CacheManager), so release goes through
  * `SparkContext.getPersistentRDDs`. Driver-side pipeline construction
  * is single-threaded per query (our runners and specs run queries
  * sequentially), which the id-diff relies on; concurrent misattribution
  * would only change WHICH releaseAll() drops a block, never whether.
  * MaterializeLifecycleSpec asserts the invariant the registry exists
  * for: after every registered query's action + releaseAll(), the
  * session's persistent-RDD set returns to its baseline.
  *
  * == Scoping (round-10) ==
  *
  * The registry is keyed by a SCOPE token carried in a
  * `DynamicVariable` (thread-inherited at thread creation; see the
  * [[inScope]] caveat for pre-existing pooled threads). [[releaseAll]]
  * drops only the stages registered under the CALLING pipeline's
  * scope, so two pipelines interleaved on one driver — a streaming job
  * and a batch harvest, two notebook cells — cannot release each
  * other's caches (previously a silent perf cliff: the victim's plans
  * recompute from source). [[inScope]] drains its scope on exit, so an
  * abandoned scope cannot leak caches. Sequential runners
  * (Verify/Bench/specs) never call [[inScope]] and keep the exact old
  * behavior: everything registers under the root scope, and each
  * releaseAll() drains what the just-finished query registered there.
  * A concurrent pipeline wraps its build+run+release in
  * `Materialize.inScope { ... }`.
  */
object Materialize {

  /** Opaque registry key; one per [[inScope]] activation. */
  private final class Scope
  private val rootScope = new Scope
  private val currentScope = new scala.util.DynamicVariable[Scope](rootScope)

  /** Run `body` under a fresh registry scope: stages registered inside
    * belong to this pipeline alone, and only ITS releaseAll() (called
    * inside the scope) drops them. On exit the scope is DRAINED
    * unconditionally — a pipeline that throws (or forgets releaseAll)
    * cannot leak its caches for the driver's lifetime, because its
    * scope token would otherwise be unreachable by any later call.
    *
    * Thread caveat: the scope rides a `DynamicVariable`
    * (InheritableThreadLocal) — threads CREATED inside the scope
    * inherit it; pre-existing pooled threads do NOT, and registrations
    * from such threads land in the pool-creating thread's scope
    * (usually root — the pre-scoping behavior, no worse). Build plans
    * and call reuse/truncate from the pipeline's own thread. */
  def inScope[A](body: => A): A = currentScope.withValue(new Scope) {
    try body
    finally releaseAll() // drains THIS scope only (releaseAll is scoped)
  }

  /** DataFrame handles persisted via [[reuse]] (CacheManager-backed). */
  private val persistedFrames = mutable.ArrayBuffer.empty[(Scope, DataFrame)]

  /** RDD ids pinned by [[truncate]]'s local fallback (BlockManager-
    * backed; no CacheManager entry exists for these). */
  private val pinnedRddIds = mutable.ArrayBuffer.empty[(Scope, SparkContext, Int)]

  /** Deterministic multi-consumer stage: persist with lineage kept,
    * registered for [[releaseAll]]. */
  def reuse(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    persistedFrames += ((currentScope.value, p))
    p
  }

  /** Scoped variant for stages that do NOT escape the builder: persist,
    * run every consuming action inside `body`, unpersist in finally. */
  def withReuse[A](df: DataFrame)(body: DataFrame => A): A = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    try body(p)
    finally p.unpersist(blocking = false)
  }

  /** Iterative-loop truncation point: reliable checkpoint when
    * configured, executor-local truncation otherwise (documented
    * local-mode-only fallback, registered for [[releaseAll]]). */
  def truncate(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isDefined) df.checkpoint()
    else synchronized {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint() // eager: blocks register here
      pinnedRddIds ++= sc.getPersistentRDDs.keySet.toSet.diff(before.toSet)
        .map((currentScope.value, sc, _))
      out
    }
  }

  /** Release every stage registered IN THE CALLING SCOPE since its last
    * call (root scope when no [[inScope]] is active — the sequential-
    * runner behavior). Runners call this after each pipeline's terminal
    * action; non-blocking, so the cost is bookkeeping, not I/O. Call at
    * a QUIESCE point — after the registered pipelines' outputs are
    * written/collected: re-running a released [[reuse]] plan recomputes
    * from source, but a released truncate-local frame has no lineage
    * left to recompute (see class doc). */
  def releaseAll(): Unit = synchronized {
    val scope = currentScope.value
    persistedFrames.filter(_._1 eq scope).foreach { case (_, df) =>
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
    }
    persistedFrames.filterInPlace(_._1 ne scope)
    pinnedRddIds.filter(_._1 eq scope).foreach { case (_, sc, id) =>
      try sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
    }
    pinnedRddIds.filterInPlace(_._1 ne scope)
  }

  /** Count of registered-but-unreleased stages in the calling scope
    * (spec/diagnostic use). */
  def trackedCount: Int = synchronized {
    val scope = currentScope.value
    persistedFrames.count(_._1 eq scope) + pinnedRddIds.count(_._1 eq scope)
  }
}
