package graft

import graft.dedup.{Dedup, DedupSnapshot}
import org.apache.spark.sql.functions._

/** [[graft.dedup.DedupSnapshot]] — incremental cross-snapshot dedup.
  *
  * The oracle row (d11) proves from-scratch parity; these specs pin
  * the structural contracts the oracle can't see:
  *  - the stored corpus is never re-shingled (delta ingest survives the
  *    corpus table being dropped outright),
  *  - the production path (bucketCap on, commit=true, multiple deltas)
  *    matches a from-scratch run over the union,
  *  - commit advances the snapshot so the NEXT delta dedups against
  *    the previous delta's survivors too.
  */
class SnapshotDedupSpec extends SparkSpec {

  private def docs() = spark.read.parquet(sf() + "/documents.parquet")

  /** From-scratch pipeline: exact keep-first per fp, then near-dup CC
    * over minhash pairs among exact survivors, keep cluster minima. */
  private def fromScratch(df: org.apache.spark.sql.DataFrame): Set[Long] = {
    val exact = Dedup.exactSurvivors(df, "doc_id", "text")
    val drops = Dedup.nearDupDrops(
      Dedup.minHashCandidates(exact, "doc_id", "text",
        n = 3, bands = 16, rows = 4, threshold = 0.8))
    exact.join(drops.select(col("drop_id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("ingestDelta matches from-scratch over the union (production caps, commit on)") {
    val d = docs()
    val all = fromScratch(d)
    val snap = new DedupSnapshot(spark, "graft_spec_snap", nBuckets = 4)
    snap.writeCorpus(d.filter(col("doc_id") < 200), "doc_id", "text",
      keepCols = Seq("lang"))
    // two committed deltas: the second must dedup against the first's
    // survivors as well as the original corpus
    val s1 = snap.ingestDelta(d.filter(col("doc_id") >= 200 && col("doc_id") < 350),
      "doc_id", "text", keepCols = Seq("lang"), commit = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = snap.ingestDelta(d.filter(col("doc_id") >= 350),
      "doc_id", "text", keepCols = Seq("lang"), commit = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == all.filter(id => id >= 200 && id < 350))
    assert(s2 == all.filter(_ >= 350))
    // the committed corpus IS the from-scratch survivor set
    val stored = snap.corpus().select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(stored == all)
    // ...and carries no duplicate ids after the appends
    assert(snap.corpus().count() == stored.size)
  }

  test("delta ingest never touches the stored corpus (drop it; dedup still right)") {
    val d = docs()
    val all = fromScratch(d)
    val snap = new DedupSnapshot(spark, "graft_spec_snap2", nBuckets = 4)
    snap.writeCorpus(d.filter(col("doc_id") < 300), "doc_id", "text")
    // drop the corpus table — only the side tables (seen/sigs/shingles)
    // may be consulted by ingest; re-shingling the store would now fail
    spark.sql("DROP TABLE graft_spec_snap2_corpus")
    val surv = snap.ingestDelta(d.filter(col("doc_id") >= 300),
      "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surv == all.filter(_ >= 300))
  }

  test("flooded-band cap: delta pairs stay capped and exact dups still drop") {
    import spark.implicits._
    // 40 identical store docs + 10 identical delta copies of the same
    // text: every band floods into one bucket; with a tiny cap the
    // sub-bucket salt must still pair each delta row with SOMETHING
    // from its clique (md5 sub-bucket ≥ 2 members whp) — and the exact
    // fp stage catches identical text regardless, so survivors = none
    val base = (0L until 40L).map(i => (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val delta = (100L until 110L).map(i => (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val snap = new DedupSnapshot(spark, "graft_spec_snap3", nBuckets = 2,
      bucketCap = 4)
    snap.writeCorpus(base.toDF("doc_id", "text"), "doc_id", "text")
    val surv = snap.ingestDelta(delta.toDF("doc_id", "text"), "doc_id", "text")
    assert(surv.count() == 0)
  }

  test("takedown: erased docs leave dedup memory; frozen ids fail " +
       "loudly; rebuild compacts and clears tombstones") {
    import spark.implicits._
    val store = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "completely unrelated store content about streams and sinks"),
      (3L, "another unrelated store doc mentioning windows and joins"))
      .toDF("doc_id", "text")
    val snap = new DedupSnapshot(spark, "graft_spec_snap4", nBuckets = 2,
      bucketCap = 0)
    snap.writeCorpus(store, "doc_id", "text")
    snap.takedown(Seq(1L).toDF("doc_id"), "doc_id")
    // liveCorpus hides the erased row
    assert(snap.liveCorpus("doc_id").select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    // an exact copy of the ERASED doc now survives ingestion (its
    // census row is gone) while a copy of a live doc still drops
    val delta = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again today"),
      (101L, "completely unrelated store content about streams and sinks"),
      (102L, "fresh delta content that matches nothing in the store"))
      .toDF("doc_id", "text")
    val surv = snap.ingestDelta(delta, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surv == Set(100L, 102L), s"got $surv")
    // a delta carrying the tombstoned id itself is frozen until rebuild
    val e = intercept[IllegalArgumentException](snap.ingestDelta(
      Seq((1L, "anything")).toDF("doc_id", "text"), "doc_id", "text")
      .collect())
    assert(e.getMessage.contains("frozen until"))
    // rebuild is the compaction point: tombstones clear, id 1 ingests
    snap.writeCorpus(store.filter(col("doc_id") =!= 1L), "doc_id", "text")
    val surv2 = snap.ingestDelta(
      Seq((1L, "anything at all works after the rebuild compaction"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surv2 == Set(1L))
  }
}
