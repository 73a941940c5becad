package graft

import graft.functions.{LangIdNgram, TextFns}
import org.apache.spark.sql.functions._

/** [[LangIdNgram]] — the Cavnar-Trenkle rank-profile classifier:
  * planted multilingual fixtures (including the marker-free doc the
  * t3 heuristic cannot place), rank/tie determinism, the 'und'
  * fallback, and the scale shape (profiles broadcast).
  */
class LangIdNgramSpec extends SparkSpec {

  import spark.implicits._

  private val trainDocs = Seq(
    // distinctive character patterns per language, NO shared text
    (1L, "the quick brown fox jumps over the lazy dog with them", "en", "tr"),
    (2L, "this thing that brings the sloth north with strength", "en", "tr"),
    (3L, "schnelle braune füchse springen über faule hunde gerne", "de", "tr"),
    (4L, "schließlich wurden schöne geschichten über münchen geschrieben", "de", "tr"),
    (5L, "los rápidos zorros marrones saltan sobre los perros", "es", "tr"),
    (6L, "quisiera señalar que los niños llegaron a la montaña", "es", "tr"))

  test("classifies a marker-free doc the marker heuristic cannot") {
    // no 'der die und das ist nicht ein zu' token anywhere — t3 says
    // 'und'; the char-3-gram profile still places it as German
    val markerFree = "schließlich verschwunden geworden übermäßige geschichten"
    val docs = (trainDocs :+ (100L, markerFree, "??", "test"))
      .toDF("doc_id", "text", "lang", "source")
    val t3 = docs.filter($"doc_id" === 100L)
      .select(TextFns.langId($"text")).head.getString(0)
    assert(t3 == "und") // the heuristic has nothing to fire on
    val pred = LangIdNgram.predict(docs, "doc_id", "text", "lang",
      $"source" === "tr").collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(pred(100L) == "de")
    // training docs classify as their own language (profiles are
    // their own nearest neighbors on this disjoint fixture)
    assert(pred(1L) == "en" && pred(3L) == "de" && pred(5L) == "es")
  }

  test("docs shorter than n normalized chars predict 'und'") {
    val docs = (trainDocs ++ Seq((200L, "ab", "??", "test"),
      (201L, "  a  ", "??", "test"), (202L, "", "??", "test")))
      .toDF("doc_id", "text", "lang", "source")
    val pred = LangIdNgram.predict(docs, "doc_id", "text", "lang",
      $"source" === "tr").collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(pred(200L) == "und" && pred(201L) == "und" && pred(202L) == "und")
  }

  test("exact distance ties break to the lexicographically first language") {
    // two languages trained on IDENTICAL text → identical profiles →
    // every doc is exactly equidistant → the (dist, lang) struct min
    // must pick 'aa'
    val docs = Seq(
      (1L, "identical training text for both", "zz", "tr"),
      (2L, "identical training text for both", "aa", "tr"),
      (3L, "identical training text for both again", "zz", "tr"),
      (4L, "identical training text for both again", "aa", "tr"),
      (9L, "some identical-ish query text for the tie", "??", "test"))
      .toDF("doc_id", "text", "lang", "source")
    val pred = LangIdNgram.predict(docs, "doc_id", "text", "lang",
      $"source" === "tr").collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(pred(9L) == "aa")
  }

  test("profiles: rank 1..K by count DESC then gram ASC, capped at K") {
    val docs = Seq((1L, "ababab xyz", "en", "tr"))
      .toDF("doc_id", "text", "lang", "source")
    val prof = LangIdNgram.profiles(docs, "lang", "text",
      $"source" === "tr", n = 3, k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getInt(2)))
    // grams of "ababab xyz": aba(2) bab(2) ab␣(1) b␣x(1) ␣xy(1) xyz(1)
    assert(prof.length == 4) // capped at K=4
    assert(prof.take(2).toSeq == Seq(("aba", 1), ("bab", 2))) // ties: gram ASC
    assert(prof(2)._1 < prof(3)._1) // count-1 ties also gram ASC
  }

  test("predictWith: persisted profile artifact reproduces in-plan predict exactly") {
    val docs = trainDocs.toDF("doc_id", "text", "lang", "source")
    val inPlan = LangIdNgram.predict(docs, "doc_id", "text", "lang",
      $"source" === "tr").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-langid")
    LangIdNgram.profiles(docs, "lang", "text", $"source" === "tr")
      .write.mode("overwrite").parquet(dir.toString)
    val frozen = spark.read.parquet(dir.toString)
    val viaArtifact = LangIdNgram.predictWith(docs, "doc_id", "text", frozen)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaArtifact == inPlan)
    // loud on a frame that is not a profile artifact
    val e = intercept[IllegalArgumentException] {
      LangIdNgram.predictWith(docs, "doc_id", "text",
        Seq(("en", "abc")).toDF("lang", "gram"))
    }
    assert(e.getMessage.contains("(lang, gram, rank)"))
  }

  test("normalization: case, whitespace runs, and surrounding space fold away") {
    val a = Seq((1L, "  The   QUICK\tbrown  ", "en", "tr"),
      (2L, "the quick brown", "en", "tr"))
      .toDF("doc_id", "text", "lang", "source")
      .select(LangIdNgram.normForm($"text")).as[String].collect()
    assert(a(0) == a(1) && a(0) == "the quick brown")
  }

  test("scale shape: profiles and language list reach the distance join broadcast") {
    val docs = trainDocs.toDF("doc_id", "text", "lang", "source")
    val plan = LangIdNgram.predict(docs, "doc_id", "text", "lang",
      $"source" === "tr").queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
    // the corpus-side text column never reaches an Exchange row wider
    // than (id, gram, count): no 'text' attribute below any shuffle
    // (cheap proxy: the final aggregate's child exchanges carry __g)
    assert(plan.contains("__g"))
  }
}
