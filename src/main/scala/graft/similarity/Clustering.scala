package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.similarity.Similarity.IvfIndex

/** Distributed k-means (Lloyd's) and SemDeDup-style semantic
  * deduplication (Abbas et al. 2023, "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication"): cluster
  * the corpus embeddings, then prune near-duplicate pairs WITHIN each
  * cluster only — the clustering bounds the pairwise work that a full
  * cosine self-join would make quadratic.
  *
  * Differs from [[Similarity.IvfIndex.fit]] (driver-side sample fit)
  * in that each Lloyd iteration runs ON THE CLUSTER: assignment is the
  * codegen'd [[graft.functions.NearestCentroid]] argmin over broadcast
  * centroids (map-side, no shuffle), and the mean recomputation is one
  * partial-aggregated groupBy over (centroid, component) — k*dim rows
  * cross the exchange, k*dim rows reach the driver, independent of
  * corpus size. At 100 TB each iteration is one map + one bounded
  * shuffle; the driver state is the k*dim centroid matrix only.
  *
  * Determinism contract (what makes the sd1 oracle hash-exact): seeds
  * are spaced picks in `idCol` order; each new centroid component is
  * rounded HALF_UP to `roundDecimals` before the next assignment, so
  * both engines iterate from bit-identical centroids regardless of
  * their double-summation order; argmin ties break to the lowest
  * centroid id (the kernel's strict `<`).
  */
object Clustering {

  /** k spaced seed vectors in ascending `idCol` order: rows at ranks
    * 0, stride, 2*stride, … with stride = n/k (floor). The rank pass
    * runs on the ids-only projection (narrow columns through the one
    * single-partition window exchange), and only the k winners join
    * back (broadcast) to fetch their vectors. For corpora where even
    * an ids-only sort is too hot, fit on a sample via
    * [[Similarity.IvfIndex.fit]] instead — spaced seeding is the
    * oracle-replicable flavor, not the only one.
    */
  def spacedSeeds(df: DataFrame, idCol: String, vecCol: String,
                  k: Int): Array[Array[Double]] = {
    // n via a second window over the same single-partition spec — no
    // separate count() scan, no extra exchange
    val w = Window.orderBy(col(idCol))
    val ranked = df.select(col(idCol))
      .withColumn("rn", row_number().over(w) - 1)
      .withColumn("stride", greatest(
        (count(lit(1)).over(w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)) / k)
          .cast("long"), lit(1L)))
      .filter(col("rn") % col("stride") === 0 && col("rn") / col("stride") < k)
      .select(col(idCol), (col("rn") / col("stride")).cast("int").as("cid"))
    df.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .join(broadcast(ranked), idCol)
      .select("cid", "v")
      .collect() // bounded: k rows
      .sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)
      .ensuring(_.nonEmpty, "spacedSeeds on an empty corpus")
  }

  /** One distributed Lloyd refinement pass per iteration. Empty
    * clusters keep their previous centroid (cannot occur with spaced
    * seeding on data that has >= k distinct rows, and the sd1 oracle
    * depends on it never occurring — DuckDB's GROUP BY simply drops
    * the empty id).
    */
  def lloyd(df: DataFrame, vecCol: String, init: Array[Array[Double]],
            iters: Int, roundDecimals: Int = 6): Array[Array[Double]] = {
    require(init.nonEmpty, "lloyd needs at least one initial centroid")
    var centroids = init
    val v = col(vecCol).cast("array<double>")
    for (_ <- 0 until iters) {
      val means = assign(df.select(v.as("v")), "v", centroids)
        .select(col("centroid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("centroid", "pos").agg(avg("x").as("m"))
        .collect() // bounded: k*dim rows
      val next = centroids.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = roundHalfUp(r.getDouble(2), roundDecimals)
      }
      centroids = next
    }
    centroids
  }

  /** DuckDB `round(x, d)` semantics: half away from zero. */
  private def roundHalfUp(x: Double, d: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Map-side nearest-centroid assignment (broadcast centroids inside
    * the codegen'd kernel — no shuffle, no join).
    */
  def assign(df: DataFrame, vecCol: String,
             centroids: Array[Array[Double]]): DataFrame =
    new IvfIndex(centroids).assign(df, vecCol)

  /** SemDeDup: flag every row that has a same-cluster neighbor with
    * strictly lower id and cosine >= tau (keep-lowest-id rule).
    * Output: (idCol, cluster, dup). The pairwise stage self-joins on
    * `centroid` only — shuffle both sides by cluster id and compare
    * within; with k scaled so clusters stay ~10^3-10^4 rows (k ~ n /
    * targetClusterSize at real scale), the per-cluster quadratic term
    * is bounded and embarrassingly parallel across clusters.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    centroids: Array[Array[Double]],
                    tau: Double): DataFrame = {
    // assignment feeds three consumers (both self-join sides + the
    // final cluster projection) — materialize so the corpus scan and
    // nearest-centroid kernel run once, not per consumer
    val a = graft.Materialize.reuse(assign(
      df.select(col(idCol), col(vecCol).cast("array<double>").as("v")),
      "v", centroids))
    val l = a.select(col(idCol).as("lid"), col("v").as("lv"), col("centroid"))
    val r = a.select(col(idCol).as("rid"), col("v").as("rv"), col("centroid"))
    val dups = l.join(r, Seq("centroid"))
      .filter(col("rid") < col("lid") &&
        Similarity.cosine(col("lv"), col("rv")) >= tau)
      .select(col("lid").as(idCol)).distinct()
      .withColumn("dup", lit(true))
    a.select(col(idCol), col("centroid").as("cluster"))
      .join(dups, Seq(idCol), "left")
      .na.fill(false, Seq("dup"))
  }

  /** The full sd1 pipeline: spaced seeds -> `iters` distributed Lloyd
    * passes -> within-cluster cosine dedup.
    */
  def semDeDup(df: DataFrame, idCol: String, vecCol: String, k: Int,
               iters: Int = 2, tau: Double = 0.4): DataFrame = {
    // seeds + each Lloyd pass + the dedup assignment all scan the
    // corpus — one materialized (id, vec) projection feeds them all
    val cached = graft.Materialize.reuse(df.select(col(idCol), col(vecCol)))
    val seeds = spacedSeeds(cached, idCol, vecCol, k)
    val fitted = lloyd(cached, vecCol, seeds, iters)
    semanticDedup(cached, idCol, vecCol, fitted, tau)
  }
}
