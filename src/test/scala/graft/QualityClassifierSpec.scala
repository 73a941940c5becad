package graft

import graft.functions.QualityClassifier
import org.apache.spark.sql.functions._

/** [[QualityClassifier]] — the trained discriminative filter. The
  * oracle row (t20) pins bit-exact training parity with DuckDB; these
  * specs pin that the classifier actually LEARNS: on a corpus whose
  * reference and web classes have genuinely different token
  * distributions, planted low-quality docs must rank below planted
  * reference-like docs after training.
  */
class QualityClassifierSpec extends SparkSpec {

  test("planted low-quality docs rank below reference-like docs") {
    import spark.implicits._
    // reference class: coherent English-like vocabulary; web class:
    // spam-like vocabulary. Held-out docs (label irrelevant at scoring
    // time) from each distribution must order correctly by score.
    val refVocab = Seq("the", "of", "science", "history", "theory",
      "analysis", "method", "result", "study", "evidence")
    val webVocab = Seq("click", "buy", "free", "winner", "casino",
      "pills", "offer", "xxx", "cheap", "now")
    def doc(vocab: Seq[String], seed: Int, n: Int): String =
      (0 until n).map(i => vocab((i * 7 + seed * 13) % vocab.size)).mkString(" ")
    val train = ((0 until 40).map(i => (i.toLong, doc(refVocab, i, 30), 1)) ++
      (40 until 80).map(i => (i.toLong, doc(webVocab, i, 30), 0)))
    // held-out: ids 1000/1001 reference-like, 2000/2001 spam-like —
    // labeled 0 so their own labels can't leak into their scores
    val test0 = Seq((1000L, doc(refVocab, 91, 25), 0),
      (1001L, doc(refVocab, 57, 25), 0),
      (2000L, doc(webVocab, 91, 25), 0),
      (2001L, doc(webVocab, 57, 25), 0))
    val docs = (train ++ test0).toDF("doc_id", "text", "lbl")
    val (w, scored) = QualityClassifier.fitScore(
      docs, "doc_id", "text", col("lbl") === 1, dim = 64, iters = 4,
      salt = "spec")
    val s = scored.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.length == 65)
    // every reference-like held-out doc outscores every spam-like one
    for (r <- Seq(1000L, 1001L); b <- Seq(2000L, 2001L))
      assert(s(r) > s(b), s"ref doc $r (${s(r)}) should outscore spam $b (${s(b)})")
    // and the training classes separate on average
    val refAvg = (0 until 40).map(i => s(i.toLong)).sum / 40
    val webAvg = (40 until 80).map(i => s(i.toLong)).sum / 40
    assert(refAvg > webAvg + 0.01)
  }

  test("tokenless docs are scored at the bias, never dropped (advisor r12)") {
    import spark.implicits._
    // id 100 (empty text → the single '' token, matching DuckDB's
    // string_split_regex) and id 101 (NULL text → NO token rows at
    // all) must both appear in the scored output; 101 scores at the
    // pure bias — and fitScore/scoreWith must agree on them
    val docs = ((0 until 30).map(i =>
      (i.toLong, s"alpha beta tok${i % 5} gamma", i % 2 == 0)) ++
      Seq((100L, "", false), (101L, null.asInstanceOf[String], false)))
      .toDF("doc_id", "text", "y")
    val (w, scored) = QualityClassifier.fitScore(
      docs, "doc_id", "text", col("y"), dim = 16, iters = 2, salt = "nb")
    val s = scored.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s.size == 32 && s.contains(100L) && s.contains(101L))
    // pure-bias score: sp = w(dim)·10⁴, p = ½ + ½·z̃/(1+|z̃|) at 6dp
    val z = w(16).toDouble * 10000.0 / 1e10
    val expect = BigDecimal(0.5 + 0.5 * z / (1 + math.abs(z)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s(101L) == expect, s"null-text score ${s(101L)} != bias $expect")
    val online = QualityClassifier.scoreWith(
      docs.filter(col("doc_id") >= 100L), "doc_id", "text", w,
      dim = 16, salt = "nb")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(online == Map(100L -> s(100L), 101L -> expect))
  }

  test("scores are partition-invariant (integer-quantized gradients)") {
    import spark.implicits._
    val docs = (0 until 60).map(i =>
      (i.toLong, s"token${i % 7} token${(i * 3) % 11} filler common word", i % 3 == 0))
      .toDF("doc_id", "text", "y")
    def run(parts: Int) = QualityClassifier.fitScore(
      docs.repartition(parts), "doc_id", "text", col("y"),
      dim = 32, iters = 3, salt = "pi")._2
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(run(1) == run(7))
  }

  test("fitScorePerGroup: each group's fit is bit-identical to a solo fit, " +
       "and a planted cross-language quality inversion is recovered") {
    import spark.implicits._
    val refVocab = Seq("science", "history", "theory", "method", "result")
    val webVocab = Seq("click", "buy", "free", "winner", "casino")
    def doc(vocab: Seq[String], seed: Int): String =
      (0 until 24).map(i => vocab((i * 7 + seed * 13) % vocab.size)).mkString(" ")
    // lang aa: refVocab is the reference class; lang bb: the SAME
    // refVocab is the SPAM class (the inversion a pooled model
    // averages away and a per-language model must recover)
    val docs = ((0 until 20).map(i => (i.toLong, "aa", doc(refVocab, i), 1)) ++
      (20 until 40).map(i => (i.toLong, "aa", doc(webVocab, i), 0)) ++
      (40 until 60).map(i => (i.toLong, "bb", doc(refVocab, i), 0)) ++
      (60 until 80).map(i => (i.toLong, "bb", doc(webVocab, i), 1)))
      .toDF("doc_id", "lang", "text", "lbl")
    val (w, scored) = QualityClassifier.fitScorePerGroup(
      docs, "doc_id", "text", "lang", col("lbl") === 1,
      dim = 32, iters = 3, salt = "pg")
    val s = scored.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // inversion recovered: refVocab docs outscore webVocab docs in aa
    // and UNDERscore them in bb
    for (r <- 0 until 20; b <- 20 until 40)
      assert(s(r.toLong) > s(b.toLong), s"aa: ref $r !> web $b")
    for (b <- 40 until 60; r <- 60 until 80)
      assert(s(r.toLong) > s(b.toLong), s"bb: web-as-ref $r !> ref-as-spam $b")
    // batching property: group bb's weights == a solo fitScore on
    // bb's rows alone (same features, denominators, rounding)
    val (wSolo, _) = QualityClassifier.fitScore(
      docs.filter(col("lang") === "bb"), "doc_id", "text",
      col("lbl") === 1, dim = 32, iters = 3, salt = "pg")
    assert(w("bb").toSeq == wSolo.toSeq)
    // NULL group keys fail LOUDLY (advisor r13): a null would never
    // join the (group, j) weight table and its docs would silently
    // vanish from margins/scored
    val withNull = docs.withColumn("lang",
      org.apache.spark.sql.functions.when(col("doc_id") === 0L,
        org.apache.spark.sql.functions.lit(null)).otherwise(col("lang")))
    val e = intercept[IllegalArgumentException](
      QualityClassifier.fitScorePerGroup(withNull, "doc_id", "text",
        "lang", col("lbl") === 1, dim = 32, iters = 1, salt = "pg"))
    assert(e.getMessage.contains("NULL lang"))
  }

  test("evaluate: exact confusion counters and ratios per threshold") {
    import spark.implicits._
    // labels/scores chosen so each threshold slices differently:
    //   pos: 900k, 600k, 400k   neg: 700k, 300k
    val scored = Seq(
      (1L, 1L, 900000L), (2L, 1L, 600000L), (3L, 1L, 400000L),
      (4L, 0L, 700000L), (5L, 0L, 300000L)
    ).toDF("doc_id", "label", "score_micro")
    val r = QualityClassifier.evaluate(scored, Seq(500000L, 800000L, 1000000L))
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getDouble(5), x.getDouble(6), x.getDouble(7)))).toMap
    // thr 500k: keep {1,2,4} → tp=2 fp=1 fn=1 tn=1
    assert(r(500000L) == ((2L, 1L, 1L, 1L, 0.666667, 0.666667, 0.666667)))
    // thr 800k: keep {1} → tp=1 fp=0 fn=2 tn=2; prec=1, rec=1/3,
    // f1 = 2·1/(2·1+0+2) = 0.5
    assert(r(800000L) == ((1L, 0L, 2L, 2L, 1.0, 0.333333, 0.5)))
    // thr 1M: keep {} → all-zero keeps; prec pinned to 0.0, not NaN
    assert(r(1000000L) == ((0L, 0L, 3L, 2L, 0.0, 0.0, 0.0)))
  }

  test("auc: exact Mann-Whitney with midrank ties; single-class pins 0") {
    import spark.implicits._
    // ascending: 400k×2 (pos+neg tie, midrank 1.5), 600k pos (3),
    // 700k neg (4), 900k pos (5) → Σranks(pos) = 9.5 →
    // U = 9.5 − 6 = 3.5 → AUC = 3.5 / (3·2) = 0.583333
    val scored = Seq(
      (1L, 1L, 900000L), (2L, 1L, 600000L), (3L, 1L, 400000L),
      (4L, 0L, 700000L), (5L, 0L, 400000L)
    ).toDF("doc_id", "label", "score_micro")
    val r = QualityClassifier.auc(scored).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.583333, s"auc ${r.getDouble(2)}")
    val one = QualityClassifier.auc(
      Seq((1L, 1L, 5L), (2L, 1L, 9L)).toDF("doc_id", "label", "score_micro"))
      .head()
    assert(one.getLong(1) == 0L && one.getDouble(2) == 0.0)
  }

  test("calibration: exact hand-computed bins; top bin closed at 1.0; " +
       "empty bins absent") {
    import spark.implicits._
    // bin 0 [0, 100k): 150k?? no — 50k neg → n=1 pos=0
    // bin 1 [100k, 200k): 150k pos + 120k neg → n=2 pos=1
    // bin 9 [900k, 1M]: 950k pos + 1.0 EXACTLY (closed top) → n=2 pos=2
    val scored = Seq(
      (1L, 0L, 50000L), (2L, 1L, 150000L), (3L, 0L, 120000L),
      (4L, 1L, 950000L), (5L, 1L, 1000000L)
    ).toDF("doc_id", "label", "score_micro")
    val r = QualityClassifier.calibration(scored)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(r.keySet == Set(0L, 1L, 9L), s"bins ${r.keySet}") // empties absent
    assert(r(0L) == ((1L, 0L, 0.05, 0.0)))
    // mean_score bin 1 = (150000+120000)/(2e6) = 0.135
    assert(r(1L) == ((2L, 1L, 0.135, 0.5)))
    // 1.0 joins bin 9 (closed), mean = 1950000/2e6 = 0.975
    assert(r(9L) == ((2L, 2L, 0.975, 1.0)))
    intercept[IllegalArgumentException] {
      QualityClassifier.calibration(scored, bins = 7) // 7 ∤ 1e6
    }
  }
}
