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

  test("scoped registries: two interleaved pipelines cannot release " +
       "each other's caches") {
    import org.apache.spark.storage.StorageLevel
    Materialize.releaseAll()
    Materialize.inScope {
      // pipeline A registers its stage...
      val a = Materialize.reuse(spark.range(1000).toDF("a"))
      a.count()
      assert(a.storageLevel != StorageLevel.NONE)
      // ...pipeline B starts, registers, finishes, and releases ITS OWN
      Materialize.inScope {
        val b = Materialize.reuse(spark.range(2000).toDF("b"))
        b.count()
        Materialize.releaseAll()
        assert(b.storageLevel == StorageLevel.NONE, "B's own release")
        assert(Materialize.trackedCount == 0, "B's scope drained")
      }
      // A's cache survived B's releaseAll
      assert(a.storageLevel != StorageLevel.NONE,
        "pipeline B's releaseAll must not drop pipeline A's cache")
      assert(Materialize.trackedCount == 1, "A still tracked in its scope")
      Materialize.releaseAll()
      assert(a.storageLevel == StorageLevel.NONE)
    }
    // truncate-pinned RDDs are scope-keyed too (local fallback)
    Materialize.inScope {
      val t = Materialize.truncate(spark.range(100).toDF("t"))
      t.count()
      Materialize.inScope { Materialize.releaseAll() } // someone else's
      assert(Materialize.trackedCount == 1,
        "another scope's releaseAll must not unpin A's truncate")
      Materialize.releaseAll()
      assert(Materialize.trackedCount == 0)
    }
  }

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
      // releaseAll is NON-BLOCKING (unpersist(blocking=false)): under
      // box load the BlockManager map drains asynchronously, so poll
      // briefly before declaring a leak (a real leak never drains)
      var leaked = sc.getPersistentRDDs.keySet -- baseline
      val deadline = System.nanoTime + 5L * 1000 * 1000 * 1000
      while (leaked.nonEmpty && System.nanoTime < deadline) {
        Thread.sleep(100)
        leaked = sc.getPersistentRDDs.keySet -- baseline
      }
      assert(leaked.isEmpty,
        s"$name leaked persistent RDDs ${leaked.toSeq.sorted.mkString(",")}")
    }
  }
}
