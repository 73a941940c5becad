package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.functions._

/** Native vector expressions: parity with the HOF formulation, null
  * handling, and interpreted-vs-codegen agreement (eval is exercised
  * by constant folding / fallback paths, codegen by the normal plan).
  */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.5, -1.5, 2.5), Array(-0.5, 1.5, -2.5)),
    (3L, Array(1e-3, 2e3, -3.0), Array(7.0, 1e-4, 9.0))
  ).toDF("id", "a", "b")

  test("dot/cosine match the zip_with+aggregate formulation") {
    def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (s, v) => s + v)
    val r = vecs.select(
      VectorExprs.dot(col("a"), col("b")).as("d"),
      hofDot(col("a"), col("b")).as("dRef"),
      VectorExprs.cosine(col("a"), col("b")).as("c"),
      (hofDot(col("a"), col("b")) /
        (sqrt(hofDot(col("a"), col("a"))) * sqrt(hofDot(col("b"), col("b"))))).as("cRef")
    ).collect()
    r.foreach { row =>
      assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-12)
      assert(math.abs(row.getDouble(2) - row.getDouble(3)) < 1e-12)
    }
  }

  test("l2Normalize yields unit vectors and preserves direction") {
    val r = vecs.select(col("a"), VectorExprs.l2Normalize(col("a")).as("n")).collect()
    r.foreach { row =>
      val a = row.getSeq[Double](0); val n = row.getSeq[Double](1)
      val norm = math.sqrt(n.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-12)
      val scale = a.head / n.head
      a.zip(n).foreach { case (x, y) => assert(math.abs(x - y * scale) < 1e-9) }
    }
    // zero vector stays zero (no division blow-up)
    val z = Seq(Tuple1(Array(0.0, 0.0))).toDF("v")
      .select(VectorExprs.l2Normalize(col("v"))).collect()(0).getSeq[Double](0)
    assert(z == Seq(0.0, 0.0))
  }

  test("null input propagates null, not a crash") {
    val withNull = Seq((1L, Some(Array(1.0, 2.0))), (2L, None))
      .toDF("id", "v")
    val r = withNull.select(col("id"),
      VectorExprs.dot(col("v"), col("v")).as("d"),
      VectorExprs.rhpSignature(col("v"), 2, 16).as("sig")).collect()
    assert(!r.find(_.getLong(0) == 1L).get.isNullAt(1))
    assert(r.find(_.getLong(0) == 2L).get.isNullAt(1))
    assert(r.find(_.getLong(0) == 2L).get.isNullAt(2))
  }

  test("rhpSignature: deterministic per seed, bit b = sign of projection onto plane b") {
    val rnd = new scala.util.Random(42L)
    val planes = Array.fill(16 * 3)(rnd.nextGaussian())
    val rows = vecs.select(col("a"),
      VectorExprs.rhpSignature(col("a"), 3, 16, 42L).as("sig")).collect()
    rows.foreach { row =>
      val v = row.getSeq[Double](0); val sig = row.getLong(1)
      (0 until 16).foreach { b =>
        val proj = (0 until 3).map(i => v(i) * planes(b * 3 + i)).sum
        assert((((sig >> b) & 1L) == 1L) == (proj >= 0),
          s"bit $b of $v: proj=$proj sig=$sig")
      }
    }
    // same seed → same signatures; different seed → (almost surely) different
    val s1 = vecs.select(VectorExprs.rhpSignature(col("a"), 3, 16, 42L)).collect().map(_.getLong(0))
    val s2 = vecs.select(VectorExprs.rhpSignature(col("a"), 3, 16, 42L)).collect().map(_.getLong(0))
    val s3 = vecs.select(VectorExprs.rhpSignature(col("a"), 3, 16, 7L)).collect().map(_.getLong(0))
    assert(s1.sameElements(s2))
    assert(!s1.sameElements(s3))
  }

  test("interpreted eval agrees with codegen (forced via interpreted mode)") {
    val before = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = vecs.select(
        VectorExprs.cosine(col("a"), col("b")),
        VectorExprs.dot(col("a"), col("b")),
        VectorExprs.rhpSignature(col("a"), 3, 32)).collect()
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val gen = vecs.select(
        VectorExprs.cosine(col("a"), col("b")),
        VectorExprs.dot(col("a"), col("b")),
        VectorExprs.rhpSignature(col("a"), 3, 32)).collect()
      interp.zip(gen).foreach { case (ir, gr) =>
        assert(math.abs(ir.getDouble(0) - gr.getDouble(0)) < 1e-15)
        assert(math.abs(ir.getDouble(1) - gr.getDouble(1)) < 1e-15)
        assert(ir.getLong(2) == gr.getLong(2))
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      before match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("SQL surface: registered functions plan the same native kernels") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("vecs_sql")
    val viaSql = spark.sql(
      """SELECT id, vec_dot(a, b) AS d, vec_cosine(a, b) AS c,
                vec_l2_normalize(a) AS an,
                rhp_sig(a, 3, 16) AS sig
         FROM vecs_sql""").collect()
    val viaCol = vecs.select(col("id"),
      VectorExprs.dot(col("a"), col("b")).as("d"),
      VectorExprs.cosine(col("a"), col("b")).as("c"),
      VectorExprs.l2Normalize(col("a")).as("an"),
      VectorExprs.rhpSignature(col("a"), dim = 3, nbits = 16).as("sig")).collect()
    assert(viaSql.map(_.toString).sorted.toSeq == viaCol.map(_.toString).sorted.toSeq)
    // shingle_hash: SQL vs TextExprs on a token array
    Seq((1L, Seq("a", "b", "c", "d"))).toDF("id", "toks")
      .createOrReplaceTempView("toks_sql")
    val sh1 = spark.sql("SELECT shingle_hash(toks, 2) AS h FROM toks_sql").collect()
    val sh2 = Seq((1L, Seq("a", "b", "c", "d"))).toDF("id", "toks")
      .select(graft.functions.TextExprs.shingleHashes(col("toks"), 2).as("h")).collect()
    assert(sh1.map(_.toString).toSeq == sh2.map(_.toString).toSeq)
    // round-6 kernels: gram_run_stats and char_window_hashes
    Seq((1L, Seq("x y", "a b", "x y"), "abcabcabc")).toDF("id", "gs", "t")
      .createOrReplaceTempView("r6_sql")
    val gr1 = spark.sql(
      "SELECT gram_run_stats(gs) AS s, char_window_hashes(t, 3) AS h FROM r6_sql")
      .collect()
    val gr2 = Seq((1L, Seq("x y", "a b", "x y"), "abcabcabc")).toDF("id", "gs", "t")
      .select(graft.functions.TextExprs.gramRunStats(col("gs")).as("s"),
        graft.functions.TextExprs.charWindowHashes(col("t"), 3).as("h")).collect()
    assert(gr1.map(_.toString).toSeq == gr2.map(_.toString).toSeq)
    // round-11 kernels: winnowed_window_hashes, minhash_sig, simhash64
    Seq((1L, "abcabcabcabc", Seq(11L, 22L, 33L), Seq("tok", "tok", "other")))
      .toDF("id", "t", "hs", "ws").createOrReplaceTempView("r11_sql")
    val r11sql = spark.sql(
      """SELECT winnowed_window_hashes(t, 3, 2) AS w,
                minhash_sig(hs, 8) AS m,
                simhash64(ws) AS s64, simhash64(ws, 60) AS s60
         FROM r11_sql""").collect()
    val r11col = Seq((1L, "abcabcabcabc", Seq(11L, 22L, 33L)))
      .toDF("id", "t", "hs")
      .select(
        graft.functions.TextExprs.winnowedWindowHashes(col("t"), 3, 2).as("w"),
        graft.dedup.Dedup.minHashSignatureFromHashes(col("hs"), 8).as("m"))
      .collect()
    assert(r11sql.head.getSeq[org.apache.spark.sql.Row](0) ==
      r11col.head.getSeq[org.apache.spark.sql.Row](0))
    assert(r11sql.head.getSeq[Long](1) == r11col.head.getSeq[Long](1))
    // simhash64 SQL matches the Dedup column route on the same tokens
    val s64col = Seq((1L, "tok tok other")).toDF("id", "txt")
      .select(graft.dedup.Dedup.simHash(col("txt")).as("s64"),
        graft.dedup.Dedup.simHashFnv60(col("txt")).as("s60")).head
    assert(r11sql.head.getLong(2) == s64col.getLong(0))
    assert(r11sql.head.getLong(3) == s64col.getLong(1))
    // literal-argument guard: a column where a literal is required fails
    intercept[Exception] {
      spark.sql("SELECT rhp_sig(a, 3, CAST(id AS INT)) FROM vecs_sql").collect()
    }
  }
}
