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
    (s, dir) => Clustering.semDeDupSpaced(
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

  /** tc1: text clustering — the COMPOSITION t13 hashed-TF-IDF →
    * dense integer-micro vectors (exact doubles, normalize=false so
    * both engines cluster the SAME bits) → k=5 spaced seeds → two
    * distributed Lloyd passes → final assignment. Proves the
    * text→embedding→clustering bridge end to end; the oracle
    * recomputes every hash, idf floor, bucket sum, dense fill, seed
    * pick, rounded centroid mean, and argmin in DuckDB. Distance
    * margins between best and runner-up centroid are ≥1e9 absolute
    * (≥9e-6 relative) at every SF — eight orders above double
    * rounding noise, so assignment cannot flip cross-engine.
    */
  val tc1TextClusters = QueryDef(
    "tc1_text_clusters",
    (s, dir) => {
      val vecs = graft.Materialize.reuse(
        graft.functions.TextFns.assembleVectors(
          graft.functions.TextFns.hashedTfIdf(
            table(s, dir, "documents"), "doc_id", "text", dim = 64),
          "doc_id", dim = 64, normalize = false))
      val seeds = Clustering.spacedSeeds(vecs, "doc_id", "embedding", k = 5)
      val cents = Clustering.lloyd(vecs, "embedding", seeds, iters = 2)
      Clustering.assign(
        vecs.select(col("doc_id"), col("embedding").as("v")), "v", cents)
        .select(col("doc_id"), col("centroid").as("cluster"))
    },
    Some("""WITH tok AS (SELECT doc_id,
        unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents),
      tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY 1, 2),
      dfq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      w AS (SELECT tf.doc_id,
          CAST('0x' || substr(md5('tfidf:' || tf.t), 1, 15) AS BIGINT) AS hv,
          tf.tf, dfq.df FROM tf JOIN dfq USING (t)),
      lf AS (SELECT doc_id, CAST(hv % 64 AS BIGINT) AS bucket,
        CAST(SUM((1 - 2 * ((hv // 64) % 2)) * tf *
          CAST(FLOOR(1000000 * (ln((n.n + 1.0) / (df + 1.0)) + 1.0)) AS BIGINT))
          AS BIGINT) AS w_micro
        FROM w, n GROUP BY 1, 2),
      vec AS (SELECT g.doc_id,
          list(CAST(COALESCE(lf.w_micro, 0) AS DOUBLE) ORDER BY g.b) AS v
        FROM (SELECT d.doc_id, b.b
              FROM (SELECT DISTINCT doc_id FROM lf) d
              CROSS JOIN (SELECT unnest(range(64)) AS b) b) g
        LEFT JOIN lf ON lf.doc_id = g.doc_id AND lf.bucket = g.b
        GROUP BY g.doc_id),
      st AS (SELECT count(*) // 5 AS stride FROM vec),
      sd AS (SELECT v, row_number() OVER (ORDER BY doc_id) - 1 AS rn FROM vec),
      c0 AS (SELECT CAST(rn // (SELECT stride FROM st) AS INT) AS cid, v FROM sd
             WHERE rn % (SELECT stride FROM st) = 0
               AND rn // (SELECT stride FROM st) < 5),
      a0 AS (SELECT doc_id, v, cid FROM (
              SELECT e.doc_id, e.v, c.cid,
                     row_number() OVER (PARTITION BY e.doc_id
                       ORDER BY list_distance(e.v, c.v), c.cid) AS rk
              FROM vec e CROSS JOIN c0 c) q WHERE rk = 1),
      c1 AS (SELECT cid, list(m ORDER BY pos) AS v FROM (
              SELECT cid, pos, round(avg(val), 6) AS m FROM (
                SELECT cid, generate_subscripts(v, 1) AS pos, unnest(v) AS val
                FROM a0) u GROUP BY cid, pos) g GROUP BY cid),
      a1 AS (SELECT doc_id, v, cid FROM (
              SELECT e.doc_id, e.v, c.cid,
                     row_number() OVER (PARTITION BY e.doc_id
                       ORDER BY list_distance(e.v, c.v), c.cid) AS rk
              FROM vec e CROSS JOIN c1 c) q WHERE rk = 1),
      c2 AS (SELECT cid, list(m ORDER BY pos) AS v FROM (
              SELECT cid, pos, round(avg(val), 6) AS m FROM (
                SELECT cid, generate_subscripts(v, 1) AS pos, unnest(v) AS val
                FROM a1) u GROUP BY cid, pos) g GROUP BY cid)
      SELECT doc_id, cid AS cluster FROM (
        SELECT e.doc_id, c.cid,
               row_number() OVER (PARTITION BY e.doc_id
                 ORDER BY list_distance(e.v, c.v), c.cid) AS rk
        FROM vec e CROSS JOIN c2 c) q WHERE rk = 1"""))

  /** sd2: the PRODUCTION SemDeDup path under the same bit-exact gate
    * as sd1 — seeds fitted on a deterministic md5-ordered 200-row
    * sample (no global window: the corpus never funnels through one
    * task), two distributed Lloyd passes, then CAPPED within-cluster
    * dedup (cap=40 → every cluster over 40 rows salts into
    * ceil(n/40) md5 sub-buckets; at the verify SFs most clusters
    * exceed the cap, so the salted branch is exercised, not latent).
    * The oracle replays the whole thing: the hash-ordered sample pick,
    * spaced seeds over the sample, both rounded Lloyd passes over the
    * FULL corpus, cluster sizes, every salted bucket id, and the
    * keep-lowest-id pair rule within (cluster, bucket).
    */
  val sd2SemDedupProd = QueryDef(
    "sd2_semantic_dedup_capped",
    (s, dir) => Clustering.semDeDup(
      table(s, dir, "embeddings"), "vec_id", "embedding",
      k = 8, iters = 2, tau = 0.4, sampleSize = 200, cap = 40, salt = "sd2"),
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      samp AS (SELECT vec_id, v FROM e
        ORDER BY CAST('0x' || substr(md5('sd2:' || vec_id), 1, 15) AS BIGINT),
                 vec_id
        LIMIT 200),
      st AS (SELECT count(*) // 8 AS stride FROM samp),
      sd AS (SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS rn FROM samp),
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
      sz AS (SELECT cid, count(*) AS n FROM a2 GROUP BY cid),
      bk AS (SELECT a.vec_id, a.v, a.cid,
               CASE WHEN CEIL(sz.n / 40.0) <= 1 THEN 0
                 ELSE CAST('0x' || substr(md5('sd2b:' || a.vec_id), 1, 15) AS BIGINT)
                      % CAST(CEIL(sz.n / 40.0) AS BIGINT) END AS bucket
             FROM a2 a JOIN sz USING (cid)),
      dup AS (SELECT DISTINCT a.vec_id FROM bk a JOIN bk b
              ON a.cid = b.cid AND a.bucket = b.bucket AND b.vec_id < a.vec_id
              AND list_cosine_similarity(a.v, b.v) >= 0.4)
      SELECT a.vec_id, a.cid AS cluster, (d.vec_id IS NOT NULL) AS dup
      FROM a2 a LEFT JOIN dup d ON a.vec_id = d.vec_id"""))

  /** tc2: text clustering on the PRODUCTION seeding path — identical
    * t13 vectors to tc1, but seeds fitted on the deterministic
    * md5-ordered 200-doc sample instead of the full-corpus
    * row_number window. The oracle recomputes the vectors, the sample
    * pick, spaced seeds over it, both rounded Lloyd passes, and the
    * final argmin assignment.
    */
  val tc2TextClustersProd = QueryDef(
    "tc2_text_clusters_sampled",
    (s, dir) => {
      val vecs = graft.Materialize.reuse(
        graft.functions.TextFns.assembleVectors(
          graft.functions.TextFns.hashedTfIdf(
            table(s, dir, "documents"), "doc_id", "text", dim = 64),
          "doc_id", dim = 64, normalize = false))
      val seeds = Clustering.sampledSeeds(vecs, "doc_id", "embedding",
        k = 5, sampleSize = 200, salt = "tc2")
      val cents = Clustering.lloyd(vecs, "embedding", seeds, iters = 2)
      Clustering.assign(
        vecs.select(col("doc_id"), col("embedding").as("v")), "v", cents)
        .select(col("doc_id"), col("centroid").as("cluster"))
    },
    Some("""WITH tok AS (SELECT doc_id,
        unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents),
      tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY 1, 2),
      dfq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      w AS (SELECT tf.doc_id,
          CAST('0x' || substr(md5('tfidf:' || tf.t), 1, 15) AS BIGINT) AS hv,
          tf.tf, dfq.df FROM tf JOIN dfq USING (t)),
      lf AS (SELECT doc_id, CAST(hv % 64 AS BIGINT) AS bucket,
        CAST(SUM((1 - 2 * ((hv // 64) % 2)) * tf *
          CAST(FLOOR(1000000 * (ln((n.n + 1.0) / (df + 1.0)) + 1.0)) AS BIGINT))
          AS BIGINT) AS w_micro
        FROM w, n GROUP BY 1, 2),
      vec AS (SELECT g.doc_id,
          list(CAST(COALESCE(lf.w_micro, 0) AS DOUBLE) ORDER BY g.b) AS v
        FROM (SELECT d.doc_id, b.b
              FROM (SELECT DISTINCT doc_id FROM lf) d
              CROSS JOIN (SELECT unnest(range(64)) AS b) b) g
        LEFT JOIN lf ON lf.doc_id = g.doc_id AND lf.bucket = g.b
        GROUP BY g.doc_id),
      samp AS (SELECT doc_id, v FROM vec
        ORDER BY CAST('0x' || substr(md5('tc2:' || doc_id), 1, 15) AS BIGINT),
                 doc_id
        LIMIT 200),
      st AS (SELECT count(*) // 5 AS stride FROM samp),
      sd AS (SELECT v, row_number() OVER (ORDER BY doc_id) - 1 AS rn FROM samp),
      c0 AS (SELECT CAST(rn // (SELECT stride FROM st) AS INT) AS cid, v FROM sd
             WHERE rn % (SELECT stride FROM st) = 0
               AND rn // (SELECT stride FROM st) < 5),
      a0 AS (SELECT doc_id, v, cid FROM (
              SELECT e.doc_id, e.v, c.cid,
                     row_number() OVER (PARTITION BY e.doc_id
                       ORDER BY list_distance(e.v, c.v), c.cid) AS rk
              FROM vec e CROSS JOIN c0 c) q WHERE rk = 1),
      c1 AS (SELECT cid, list(m ORDER BY pos) AS v FROM (
              SELECT cid, pos, round(avg(val), 6) AS m FROM (
                SELECT cid, generate_subscripts(v, 1) AS pos, unnest(v) AS val
                FROM a0) u GROUP BY cid, pos) g GROUP BY cid),
      a1 AS (SELECT doc_id, v, cid FROM (
              SELECT e.doc_id, e.v, c.cid,
                     row_number() OVER (PARTITION BY e.doc_id
                       ORDER BY list_distance(e.v, c.v), c.cid) AS rk
              FROM vec e CROSS JOIN c1 c) q WHERE rk = 1),
      c2 AS (SELECT cid, list(m ORDER BY pos) AS v FROM (
              SELECT cid, pos, round(avg(val), 6) AS m FROM (
                SELECT cid, generate_subscripts(v, 1) AS pos, unnest(v) AS val
                FROM a1) u GROUP BY cid, pos) g GROUP BY cid)
      SELECT doc_id, cid AS cluster FROM (
        SELECT e.doc_id, c.cid,
               row_number() OVER (PARTITION BY e.doc_id
                 ORDER BY list_distance(e.v, c.v), c.cid) AS rk
        FROM vec e CROSS JOIN c2 c) q WHERE rk = 1"""))

  val all: Seq[QueryDef] =
    Seq(sd1SemDedup, tc1TextClusters, sd2SemDedupProd, tc2TextClustersProd)
}
