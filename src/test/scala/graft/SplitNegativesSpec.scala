package graft

import graft.dedup.Dedup
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** sp1/n11 operator semantics on planted data (the oracle rows pin
  * cross-engine exactness; these pin the contracts).
  */
class SplitNegativesSpec extends SparkSpec {
  import spark.implicits._

  test("leakageSafeSplit: a dup cluster never straddles splits; assignments are growth-stable") {
    // pairs: {1,2,3} one cluster, {10,11} another; 20..40 isolated
    val docs = ((1L to 3L) ++ (10L to 11L) ++ (20L to 40L)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.leakageSafeSplit(docs, "doc_id", pairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size == 26)
    // whole-cluster assignment
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(out(1L)._1 == 1L)
    assert(Set(out(10L), out(11L)).size == 1)
    // growth stability: adding new docs never flips earlier coins
    val more = Dedup.leakageSafeSplit(
      docs.union(Seq(100L, 101L).toDF("doc_id")), "doc_id", pairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.forall { case (id, v) => more(id) == v })
    // every split name is one of the declared three
    assert(out.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("leakageSafeSplit with prior: bridged clusters keep prior splits, " +
       "never migrate toward eval, and unseen clusters coin fresh") {
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val docs1 = ((1L to 3L) ++ (10L to 11L) ++ (20L to 30L)).toDF("doc_id")
    val pairs1 = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val v1 = Dedup.leakageSafeSplit(docs1, "doc_id", pairs1, fr, salt = "pp")
    val prior = v1.select("doc_id", "split")
    val m1 = v1.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // release 2: doc 5 BRIDGES clusters {1,2,3} and {10,11} (the merge
    // re-labels the {10,11} side to min id 1 — without prior, its
    // members would re-coin); docs 40,41 form a brand-new cluster
    val docs2 = (docs1.as[Long].collect() ++ Seq(5L, 40L, 41L)).toSeq.toDF("doc_id")
    val pairs2 = pairs1.union(Seq((1L, 5L), (5L, 10L), (40L, 41L)).toDF("id_a", "id_b"))
    val v2 = Dedup.leakageSafeSplit(docs2, "doc_id", pairs2, fr, salt = "pp",
      prior = Some(prior))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // the merged cluster carries ONE split = the earliest-listed prior
    // split among members (train-first collapse): no doc ever moves
    // from an earlier-listed split to a later one
    val rank = Map("train" -> 0, "val" -> 1, "test" -> 2)
    val mergedNames = Set(m1(1L), m1(10L))
    val expect = Seq("train", "val", "test").find(mergedNames.contains).get
    Seq(1L, 2L, 3L, 5L, 10L, 11L).foreach { id =>
      assert(v2(id)._2 == expect, s"doc $id got ${v2(id)._2}, want $expect")
      assert(v2(id)._1 == 1L) // merged label
    }
    m1.keys.foreach { id =>
      assert(rank(v2(id)._2) <= rank(m1(id)),
        s"doc $id migrated ${m1(id)} -> ${v2(id)._2} (toward eval)")
    }
    // clusters untouched by the bridge keep their assignments verbatim
    (20L to 30L).foreach(id => assert(v2(id)._2 == m1(id)))
    // the never-before-seen cluster coins on its (fresh) min label,
    // matching a no-prior run of the same corpus
    val fresh = Dedup.leakageSafeSplit(docs2, "doc_id", pairs2, fr, salt = "pp")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(v2(40L)._2 == fresh(40L) && v2(41L)._2 == fresh(40L))
  }

  test("leakageSafeSplit: fractions are honored on many isolated docs") {
    val docs = (0L until 5000L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val counts = Dedup.leakageSafeSplit(docs, "doc_id", noPairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // hash coin: binomial around the targets (5σ ≈ 0.03 at n=5000)
    assert(math.abs(counts("train") / 5000.0 - 0.8) < 0.03, counts.toString)
    assert(math.abs(counts("val") / 5000.0 - 0.1) < 0.03, counts.toString)
    assert(math.abs(counts("test") / 5000.0 - 0.1) < 0.03, counts.toString)
  }

  test("groupKFold: clusters never straddle folds; folds in range and " +
       "all populated on enough isolated docs; growth-stable") {
    val docs = ((1L to 3L) ++ (10L to 11L) ++ (20L to 120L)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.groupKFold(docs, "doc_id", pairs, k = 5, salt = "f1")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out.size == 106)
    // whole-cluster folds
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(Set(out(10L), out(11L)).size == 1)
    // every fold in [0, 5) and (whp on 100+ coins) all five populated
    val folds = out.values.map(_._2).toSet
    assert(folds.subsetOf((0L until 5L).toSet) && folds.size == 5)
    // growth stability (no-merge case): new docs never flip old coins
    val more = Dedup.groupKFold(
      docs.union(Seq(200L, 201L).toDF("doc_id")), "doc_id", pairs,
      k = 5, salt = "f1")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out.forall { case (id, v) => more(id) == v })
  }

  test("groupKFold with prior: bridged clusters keep the LOWEST prior " +
       "fold, untouched clusters verbatim, fresh clusters coin") {
    val docs1 = ((1L to 3L) ++ (10L to 11L) ++ (20L to 30L)).toDF("doc_id")
    val pairs1 = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val v1 = Dedup.groupKFold(docs1, "doc_id", pairs1, k = 5, salt = "fp")
    val prior = v1.select("doc_id", "fold")
    val m1 = v1.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // release 2: doc 5 BRIDGES clusters {1,2,3} and {10,11}; docs
    // 40,41 form a brand-new cluster
    val docs2 = (docs1.as[Long].collect() ++ Seq(5L, 40L, 41L)).toSeq
      .toDF("doc_id")
    val pairs2 = pairs1.union(
      Seq((1L, 5L), (5L, 10L), (40L, 41L)).toDF("id_a", "id_b"))
    val v2 = Dedup.groupKFold(docs2, "doc_id", pairs2, k = 5, salt = "fp",
        prior = Some(prior))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // the merged cluster carries ONE fold = the LOWEST prior fold
    // among previously-assigned members (sp1's earliest-listed
    // collapse, fold-ordered): no released doc migrates upward
    val expect = math.min(m1(1L), m1(10L))
    Seq(1L, 2L, 3L, 5L, 10L, 11L).foreach { id =>
      assert(v2(id)._2 == expect, s"doc $id got ${v2(id)._2}, want $expect")
      assert(v2(id)._1 == 1L)
    }
    m1.keys.foreach(id => assert(v2(id)._2 <= m1(id),
      s"doc $id fold rose ${m1(id)} -> ${v2(id)._2} under the pin"))
    // clusters untouched by the bridge keep their folds verbatim
    (20L to 30L).foreach(id => assert(v2(id)._2 == m1(id)))
    // the never-before-seen cluster coins fresh, matching a no-prior run
    val fresh = Dedup.groupKFold(docs2, "doc_id", pairs2, k = 5, salt = "fp")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(v2(40L)._2 == fresh(40L) && v2(41L)._2 == fresh(40L))
  }

  test("walkForwardSplits: exact per-fold cutoffs, expanding train, " +
       "last event kept, in-span growth stability") {
    import java.sql.Timestamp
    def ev(ids: Seq[(Long, Long)]) = ids.map { case (id, sec) =>
      (id, Timestamp.from(java.time.Instant.ofEpochSecond(sec)))
    }.toDF("event_id", "ts")
    // span [0, 100] s, k = 4, embargo 5% → fold f: origin at 20f s,
    // embargo [20f, 20f+5), test [20f+5, 20(f+1)) — fold 4's test
    // closes at 100 INCLUSIVE
    val base = ev(Seq(1L -> 0L, 2L -> 19L, 3L -> 20L, 4L -> 24L,
      5L -> 25L, 6L -> 39L, 7L -> 40L, 8L -> 85L, 9L -> 100L))
    val r = Dedup.walkForwardSplits(base, "event_id", "ts",
        k = 4, embargoPct = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getString(2))
      .toMap
    // fold 1: train < 20, embargo [20, 25), test [25, 40)
    assert(r((1L, 1L)) == "train" && r((2L, 1L)) == "train")
    assert(r((3L, 1L)) == "embargo" && r((4L, 1L)) == "embargo")
    assert(r((5L, 1L)) == "test" && r((6L, 1L)) == "test")
    // events past fold 1's test window are ABSENT from fold 1
    assert(!r.contains((7L, 1L)) && !r.contains((9L, 1L)))
    // expanding origin: event 6 (39 s) is test in fold 1, train in fold 2+
    assert(r((6L, 2L)) == "train" && r((6L, 4L)) == "train")
    // the span's last event is test in the last fold (inclusive close)
    assert(r((9L, 4L)) == "test")
    // event 8 (85 s) is future of fold 3 (test closes at 80 s) but
    // test in fold 4
    assert(r((8L, 4L)) == "test" && !r.contains((8L, 3L)))
    // every event is in fold 4 (nothing is "future" of the last fold)
    assert((1L to 9L).forall(id => r.contains((id, 4L))))
    // in-span growth: adding interior rows moves no boundary
    val grown = ev(Seq(1L -> 0L, 2L -> 19L, 3L -> 20L, 4L -> 24L,
      5L -> 25L, 6L -> 39L, 7L -> 40L, 8L -> 85L, 9L -> 100L,
      10L -> 50L, 11L -> 99L))
    val r2 = Dedup.walkForwardSplits(grown, "event_id", "ts",
        k = 4, embargoPct = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getString(2))
      .toMap
    assert(r.forall { case (k2, v) => r2(k2) == v })
    intercept[IllegalArgumentException] {
      Dedup.walkForwardSplits(base, "event_id", "ts", k = 4, embargoPct = 20)
    }
    // guard is the EXACT condition embargoPct·(k+1) < 100 (advisor
    // r14: the integer-divided 100/(k+1) form over-rejected): k=2
    // embargo=33 is valid (33·3 = 99 < 100), k=2 embargo=34 is not,
    // and embargo=0 stays valid at any k, including k ≥ 100
    Dedup.walkForwardSplits(base, "event_id", "ts", k = 2, embargoPct = 33)
    Dedup.walkForwardSplits(base, "event_id", "ts", k = 120, embargoPct = 0)
    intercept[IllegalArgumentException] {
      Dedup.walkForwardSplits(base, "event_id", "ts", k = 2, embargoPct = 34)
    }
  }

  test("groupKFold prior validation: out-of-range and null prior folds " +
       "raise in-plan instead of silently re-coining") {
    val docs = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    // a prior built with a LARGER k (fold 7 >= this k=3) must fail
    val bigK = Seq((1L, 7L)).toDF("doc_id", "fold")
    val e1 = intercept[Exception] {
      Dedup.groupKFold(docs, "doc_id", pairs, k = 3, salt = "gv",
        prior = Some(bigK)).collect()
    }
    assert(e1.getMessage != null && e1.getMessage.contains("out of range"))
    // a NULL prior fold must fail, not fall back to the coin
    val nullF = Seq((java.lang.Long.valueOf(1L), null: java.lang.Long))
      .toDF("doc_id", "fold")
    val e2 = intercept[Exception] {
      Dedup.groupKFold(docs, "doc_id", pairs, k = 3, salt = "gv",
        prior = Some(nullF)).collect()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("out of range"))
    // in-range priors still pin (regression guard for the new check)
    val ok = Seq((1L, 2L)).toDF("doc_id", "fold")
    val v = Dedup.groupKFold(docs, "doc_id", pairs, k = 3, salt = "gv",
        prior = Some(ok))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(v(1L) == 2L && v(2L) == 2L)
  }

  test("temporalSplit: exact cutoffs, embargo band, in-span growth stability") {
    import java.sql.Timestamp
    // span [0, 100] seconds → c1 at 70 s, c2 at 75 s (exact micros)
    def ev(ids: Seq[(Long, Long)]) = ids.map { case (id, sec) =>
      (id, Timestamp.from(java.time.Instant.ofEpochSecond(sec)))
    }.toDF("event_id", "ts")
    val base = ev(Seq(1L -> 0L, 2L -> 69L, 3L -> 70L, 4L -> 74L,
      5L -> 75L, 6L -> 100L))
    val r = Dedup.temporalSplit(base, "event_id", "ts")
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r == Map(1L -> "train", 2L -> "train", 3L -> "embargo",
      4L -> "embargo", 5L -> "test", 6L -> "test"))
    // adding rows INSIDE the span moves no boundary: same assignments
    val grown = ev(Seq(1L -> 0L, 2L -> 69L, 3L -> 70L, 4L -> 74L,
      5L -> 75L, 6L -> 100L, 7L -> 50L, 8L -> 90L))
    val r2 = Dedup.temporalSplit(grown, "event_id", "ts")
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r.forall { case (k, v) => r2(k) == v })
    assert(r2(7L) == "train" && r2(8L) == "test")
    intercept[IllegalArgumentException] {
      Dedup.temporalSplit(base, "event_id", "ts", trainPct = 96, embargoPct = 5)
    }
  }

  test("hardNegatives: same-label vectors are excluded, hardest different-label wins") {
    val emb = Seq(
      (0L, Seq(1.0, 0.0, 0.0), "a"),   // anchor
      (1L, Seq(0.999, 0.01, 0.0), "a"), // same label, nearly identical -> excluded
      (2L, Seq(0.9, 0.1, 0.0), "b"),   // hardest valid negative
      (3L, Seq(0.5, 0.5, 0.0), "b"),
      (4L, Seq(0.0, 1.0, 0.0), "c")
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(
      emb.filter(col("vec_id") === 0L), emb, "vec_id", "embedding", "label", k = 2)
      .orderBy(desc("sim")).collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 2L && out(0).getString(2) == "b")
    assert(out(1).getLong(1) == 3L)
    assert(!out.map(_.getLong(1)).contains(1L))
  }
}
