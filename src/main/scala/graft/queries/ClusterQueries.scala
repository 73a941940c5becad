package graft.queries

import graft.similarity.Clustering
import org.apache.spark.sql.functions._
import Queries.table

/** Corpus clustering + semantic-dedup queries (SemDeDup family). */
object ClusterQueries {

  /** sd1: SemDeDup over the embeddings table — k=8 spaced seeds, two
    * distributed Lloyd passes (centroids rounded to 6dp each pass, the
    * cross-engine determinism contract, see [[Clustering]]), then
    * within-cluster cosine >= 0.4 flags every row with a lower-id
    * near-duplicate. The oracle replays the identical iteration in
    * DuckDB CTEs: spaced seeds by row_number, argmin assignment via
    * row_number over (distance, cid), per-component rounded avg, and
    * the same keep-lowest-id pairwise rule. tau=0.4 sits in a >=5e-4
    * empirical gap of the intra-cluster similarity distribution at the
    * verify SF, so the threshold compare cannot flip on FP noise.
    */
  val sd1SemDedup = QueryDef(
    "sd1_semantic_dedup",
    (s, dir) => Clustering.semDeDup(
      table(s, dir, "embeddings"), "vec_id", "embedding",
      k = 8, iters = 2, tau = 0.4),
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      st AS (SELECT count(*) // 8 AS stride FROM e),
      sd AS (SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS rn FROM e),
      c0 AS (SELECT CAST(rn // (SELECT stride FROM st) AS INT) AS cid, v FROM sd
             WHERE rn % (SELECT stride FROM st) = 0
               AND rn // (SELECT stride FROM st) < 8),
      a0 AS (SELECT vec_id, v, cid FROM (
              SELECT e.vec_id, e.v, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(e.v, c.v), c.cid) AS rk
              FROM e CROSS JOIN c0 c) t WHERE rk = 1),
      c1 AS (SELECT cid, list(m ORDER BY pos) AS v FROM (
              SELECT cid, pos, round(avg(val), 6) AS m FROM (
                SELECT cid, generate_subscripts(v, 1) AS pos, unnest(v) AS val
                FROM a0) u GROUP BY cid, pos) g GROUP BY cid),
      a1 AS (SELECT vec_id, v, cid FROM (
              SELECT e.vec_id, e.v, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(e.v, c.v), c.cid) AS rk
              FROM e CROSS JOIN c1 c) t WHERE rk = 1),
      c2 AS (SELECT cid, list(m ORDER BY pos) AS v FROM (
              SELECT cid, pos, round(avg(val), 6) AS m FROM (
                SELECT cid, generate_subscripts(v, 1) AS pos, unnest(v) AS val
                FROM a1) u GROUP BY cid, pos) g GROUP BY cid),
      a2 AS (SELECT vec_id, v, cid FROM (
              SELECT e.vec_id, e.v, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(e.v, c.v), c.cid) AS rk
              FROM e CROSS JOIN c2 c) t WHERE rk = 1),
      dup AS (SELECT DISTINCT a.vec_id FROM a2 a JOIN a2 b
              ON a.cid = b.cid AND b.vec_id < a.vec_id
              AND list_cosine_similarity(a.v, b.v) >= 0.4)
      SELECT a.vec_id, a.cid AS cluster, (d.vec_id IS NOT NULL) AS dup
      FROM a2 a LEFT JOIN dup d ON a.vec_id = d.vec_id"""))

  val all: Seq[QueryDef] = Seq(sd1SemDedup)
}
