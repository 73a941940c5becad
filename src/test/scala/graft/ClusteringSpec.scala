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
}
