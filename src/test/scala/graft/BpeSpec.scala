package graft

import graft.functions.{Bpe, BpeKernel}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** [[Bpe]] merge application — golden segmentations hand-computed
  * against the fixture merges table (the t21 oracle replays the loop
  * in SQL; these pin the loop's semantics directly, including the
  * overlap and priority rules that make BPE BPE).
  */
class BpeSpec extends SparkSpec {

  private def seg(w: String, rules: Seq[(String, String)] = Bpe.merges) =
    BpeKernel.segment(UTF8String.fromString(w), BpeKernel.rankMap(rules)).toSeq

  test("golden segmentations against the fixture merges") {
    // hand-traced: lowest-rank rule first, all occurrences merged
    assert(seg("the") == Seq("the"))
    assert(seg("and") == Seq("and"))        // (a,n) before (n,d), then (an,d)
    assert(seg("that") == Seq("that"))      // th, at, then (th,at)
    assert(seg("when") == Seq("wh", "en"))  // (e,n) rank 8 beats (w,h) rank 36
    assert(seg("theater") == Seq("the", "at", "er"))
    assert(seg("tokenizer") == Seq("to", "k", "en", "i", "z", "er"))
    assert(seg("xyzq") == Seq("x", "y", "z", "q")) // nothing applies
    assert(seg("a") == Seq("a"))
    assert(seg("") == Seq.empty)
  }

  test("all occurrences merge left-to-right non-overlapping") {
    val rules = Seq("a" -> "a", "aa" -> "b")
    assert(seg("aaa", rules) == Seq("aa", "a"))        // not (a, aa)
    assert(seg("aaaa", rules) == Seq("aa", "aa"))      // both pairs in one pass
    assert(seg("aab", rules) == Seq("aab"))            // then (aa,b)
    // b,a,a,a,b -> (a,a) L-to-R gives b,aa,a,b; no (aa,b) adjacency
    // remains, so the trailing a and b stay split
    assert(seg("baaab", rules) == Seq("b", "aa", "a", "b"))
  }

  test("priority: lowest rank wins even when a later rule matches earlier in the word") {
    val rules = Seq("c" -> "d", "a" -> "b")
    // "abcd": rule (c,d) has rank 0 -> applies first even though (a,b)
    // sits earlier in the word
    assert(seg("abcd", rules) == Seq("ab", "cd"))
    val rules2 = Seq("a" -> "b", "b" -> "c")
    // (a,b) consumes the b, so (b,c) never applies
    assert(seg("abc", rules2) == Seq("ab", "c"))
  }

  test("tokenCount composes counts through the vocabulary join") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the theater when"),  // 1 + 3 + 2 = 6 bpe tokens
      (2L, "the the the"),       // 3 (vocab computed once, count 3x)
      (3L, "xyzq")               // 4
    ).toDF("doc_id", "text")
    val got = Bpe.tokenCount(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (3L, 6L))
    assert(got(2L) == (3L, 3L))
    assert(got(3L) == (1L, 4L))
  }
}
