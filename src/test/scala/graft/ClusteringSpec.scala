package graft

import graft.similarity.Clustering
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // two tight, well-separated blobs around (0,0) and (10,10) plus ids
  // laid out so spaced seeding (k=2, stride=4) picks one row from each
  private lazy val blobs = Seq(
    (0L, Seq(0.1, 0.0)), (1L, Seq(0.0, 0.2)), (2L, Seq(-0.1, 0.1)),
    (3L, Seq(0.2, -0.1)),
    (4L, Seq(10.1, 10.0)), (5L, Seq(9.9, 10.2)), (6L, Seq(10.0, 9.8)),
    (7L, Seq(10.2, 10.1))).toDF("id", "v")

  test("spacedSeeds picks rows at ranks 0, n/k, ... in id order") {
    val seeds = Clustering.spacedSeeds(blobs, "id", "v", k = 2)
    assert(seeds.length == 2)
    assert(seeds(0).toSeq == Seq(0.1, 0.0))   // rank 0 -> id 0
    assert(seeds(1).toSeq == Seq(10.1, 10.0)) // rank 4 -> id 4
  }

  test("lloyd converges to the blob means and is deterministic") {
    val seeds = Clustering.spacedSeeds(blobs, "id", "v", k = 2)
    val c1 = Clustering.lloyd(blobs, "v", seeds, iters = 2)
    val c2 = Clustering.lloyd(blobs, "v", seeds, iters = 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq) // bit-identical rerun
    // blob means: (0.05, 0.05) and (10.05, 10.025)
    assert(c1(0).zip(Array(0.05, 0.05)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    assert(c1(1).zip(Array(10.05, 10.025)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("assign matches brute-force argmin with lowest-id tie-break") {
    val cents = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val got = Clustering.assign(blobs.withColumn("v", col("v").cast("array<double>")), "v", cents)
      .select("id", "centroid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert((0L to 3L).forall(got(_) == 0) && (4L to 7L).forall(got(_) == 1))
    // exact tie -> lowest centroid id wins
    val tie = Seq((0L, Seq(5.0, 5.0))).toDF("id", "v")
    val t = Clustering.assign(tie, "v", cents).select("centroid").head.getInt(0)
    assert(t == 0)
  }

  test("semanticDedup flags only lower-id within-cluster near-dups") {
    // id 3 is a near-copy of id 0 (same cluster); blobs are far apart
    val cents = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val df = Seq(
      (0L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.001)),  // cosine ~ 1.0
      (1L, Seq(0.0, 1.0)),                          // orthogonal to both
      (4L, Seq(10.0, 10.0)), (5L, Seq(-10.0, 10.0)) // cluster 2, cosine 0
    ).toDF("id", "v")
    val got = Clustering.semanticDedup(df, "id", "v", cents, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(0L -> false, 3L -> true, 1L -> false,
      4L -> false, 5L -> false))
  }

  test("semDeDup end-to-end is deterministic and keeps lowest ids") {
    val out = Clustering.semDeDup(blobs, "id", "v", k = 2, iters = 2, tau = 0.99)
      .orderBy("id").collect()
    val out2 = Clustering.semDeDup(blobs, "id", "v", k = 2, iters = 2, tau = 0.99)
      .orderBy("id").collect()
    assert(out.toSeq == out2.toSeq)
    // within each blob every vector pair has cosine ~ 1 except the
    // near-orthogonal pairs involving (0.1,0)/(0,0.2)-style axes; at
    // tau=0.99 the (10.x,10.y) blob rows after the first are all dups
    val dup = out.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(!dup(4L) && dup(5L) && dup(6L) && dup(7L)) // 4 is the keeper
  }

  test("sampledSeeds: full-sample pick equals spacedSeeds; sub-sample is deterministic") {
    // sampleSize >= n: every row sampled, spacedSeeds' id-ranking takes
    // over -> bit-identical to the spaced flavor
    val full = Clustering.sampledSeeds(blobs, "id", "v", k = 2, sampleSize = 100)
    val spaced = Clustering.spacedSeeds(blobs, "id", "v", k = 2)
    assert(full.map(_.toSeq).toSeq == spaced.map(_.toSeq).toSeq)
    // sub-sample: deterministic across runs (md5 order is a pure
    // function of the ids), right count, and every seed is a real row
    val s1 = Clustering.sampledSeeds(blobs, "id", "v", k = 2, sampleSize = 4)
    val s2 = Clustering.sampledSeeds(blobs, "id", "v", k = 2, sampleSize = 4)
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq)
    assert(s1.length == 2)
    val rows = blobs.collect().map(_.getSeq[Double](1).toSeq).toSet
    assert(s1.forall(s => rows.contains(s.toSeq)))
  }

  test("semanticDedupCapped: cap >= cluster size reproduces the uncapped answer") {
    val cents = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val df = Seq(
      (0L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.001)),
      (1L, Seq(0.0, 1.0)),
      (4L, Seq(10.0, 10.0)), (5L, Seq(-10.0, 10.0))).toDF("id", "v")
    val uncapped = Clustering.semanticDedup(df, "id", "v", cents, tau = 0.9)
      .orderBy("id").collect().toSeq
    val capped = Clustering.semanticDedupCapped(df, "id", "v", cents,
      tau = 0.9, cap = 100).orderBy("id").collect().toSeq
    assert(capped == uncapped)
  }

  test("semanticDedupCapped: planted giant cluster keeps candidate pairs bounded") {
    // one 600-row near-duplicate cluster (the SemDeDup pathology: a
    // single crowded centroid) + a 5-row healthy cluster
    val giant = (0L until 600L).map(i => (i, Seq(1.0, 1e-6 * i)))
    val small = (1000L until 1005L).map(i => (i, Seq(-1.0, 5.0)))
    val df = (giant ++ small).toDF("id", "v")
    val cents = Array(Array(1.0, 0.0), Array(-1.0, 5.0))
    val cap = 50
    // bucket stage: ceil(600/50) = 12 salted buckets for the giant
    // cluster, single bucket for the small one
    val a = Clustering.assign(
      df.select(col("id"), col("v").cast("array<double>").as("v")), "v", cents)
    val b = Clustering.saltedBuckets(a, "id", cap, "t")
    val bs = b.groupBy("centroid", "bucket").count().collect()
    assert(bs.count(_.getInt(0) == 0) == 12) // giant cluster split 12 ways
    assert(bs.count(_.getInt(0) == 1) == 1)  // healthy cluster untouched
    // candidate-pair volume: Σ C(n_b, 2) — must sit far below the
    // uncapped C(600, 2) = 179_700 and near the ideal 12·C(50, 2) =
    // 14_700 (md5 split is uniform-ish, not exact; 2x headroom)
    val pairs = bs.filter(_.getInt(0) == 0)
      .map(r => { val n = r.getLong(2); n * (n - 1) / 2 }).sum
    assert(pairs < 2 * 12 * (cap.toLong * (cap - 1) / 2),
      s"pair volume $pairs not bounded by the cap")
    assert(pairs > 0)
    // end to end: every giant-cluster row except per-bucket minima is
    // flagged (vectors are all cosine ~1), output covers every row
    val out = Clustering.semanticDedupCapped(df, "id", "v", cents,
      tau = 0.99, cap = cap, salt = "t")
    assert(out.count() == 605)
    val minPerBucket = b.filter(col("centroid") === 0)
      .groupBy("bucket").agg(min("id")).collect().map(_.getLong(1)).toSet
    val dups = out.filter(col("dup")).select("id").collect()
      .map(_.getLong(0)).toSet
    // small cluster: identical vectors, single bucket -> 1000 keeps
    assert(dups ==
      ((0L until 600L).toSet -- minPerBucket) ++ (1001L until 1005L))
    // measured DENSE-FLOOD drop recall >= the documented bound
    // (n_c - B)/(n_c - 1): true dups = 599 of 600, capped path drops
    // all but one per bucket
    val nC = 600.0
    val bCnt = minPerBucket.size // = B: one survivor per bucket
    val trueDups = (0L until 600L).toSet.size - 1
    val measured = dups.count(_ < 600L).toDouble / trueDups
    val bound = (nC - bCnt) / (nC - 1)
    assert(measured >= bound,
      s"flood recall $measured below documented bound $bound")
    assert(bound > 0.97) // the docstring's ">= 98% at cap 100" ballpark
  }
}
