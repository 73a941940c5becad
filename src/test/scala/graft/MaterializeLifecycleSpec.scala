package graft

/** Round-8 persist-lifecycle gate: every registered query, run to its
  * terminal action and then released via [[Materialize.releaseAll]],
  * must leave the session's persistent-RDD set exactly where it found
  * it. This is the invariant the Materialize registry exists for — a
  * long-lived driver running many pipelines must not accumulate cached
  * stages until eviction thrashes recompute (round-7 verdict, What's
  * wrong #1).
  *
  * The assertion is against `SparkContext.getPersistentRDDs`, which
  * sees BOTH CacheManager-backed persists ([[Materialize.reuse]]) and
  * the BlockManager-only RDDs pinned by `localCheckpoint`
  * ([[Materialize.truncate]]'s local fallback) — a leak of either kind
  * fails with the offending query's name.
  */
class MaterializeLifecycleSpec extends SparkSpec {

  test("getPersistentRDDs returns to baseline after every registered query") {
    // clear anything earlier suites registered in the shared session
    Materialize.releaseAll()
    val sc = spark.sparkContext
    val baseline = sc.getPersistentRDDs.keySet
    val dir = sf()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // noop sink = the bench's terminal action: materializes every
      // output column, so every persist on the path actually populates
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      Materialize.releaseAll()
      assert(Materialize.trackedCount == 0, s"$name left tracked handles")
      val leaked = sc.getPersistentRDDs.keySet -- baseline
      assert(leaked.isEmpty,
        s"$name leaked persistent RDDs ${leaked.toSeq.sorted.mkString(",")}")
    }
  }
}
