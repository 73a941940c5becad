package graft

import graft.functions.UrlFns
import org.apache.spark.sql.functions._

/** [[UrlFns.normalizeUrl]] / [[UrlFns.hostOf]] — hand-expected
  * canonical forms for every rule (written from the RFC 3986 §6
  * spec in the object doc, independently of the implementation),
  * totality on non-URLs, and idempotence over the wet3 fixture
  * residue classes.
  */
class UrlFnsSpec extends SparkSpec {

  private def norm(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(UrlFns.normalizeUrl(col("url"))).as[String]
      .collect().toSeq
  }

  private def host(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(UrlFns.hostOf(col("url"))).as[String]
      .collect().toSeq
  }

  test("scheme and host lowercase; fragment dropped") {
    assert(norm("HTTP://Example.COM/Path#sec") ===
      Seq("http://example.com/Path"))
  }

  test("default port dropped per scheme; real port kept") {
    assert(norm(
      "http://a.com:80/x", "https://a.com:443/x",
      "http://a.com:443/x", "https://a.com:80/x", "http://a.com:8080/x") ===
      Seq("http://a.com/x", "https://a.com/x",
        "http://a.com:443/x", "https://a.com:80/x", "http://a.com:8080/x"))
  }

  test("userinfo, trailing root dot, and one leading www. dropped") {
    assert(norm("https://user:pw@WWW.A.com./x") === Seq("https://a.com/x"))
    // trailing dot BEFORE a kept port
    assert(norm("http://a.com.:8080/x") === Seq("http://a.com:8080/x"))
  }

  test("path: slash collapse, empty -> '/', non-root trailing slash dropped") {
    assert(norm("http://a.com//p//x/", "http://a.com", "http://a.com/") ===
      Seq("http://a.com/p/x", "http://a.com/", "http://a.com/"))
  }

  test("query: tracking params dropped, rest byte-sorted, empty ? dropped") {
    assert(norm(
      "http://a.com/x?b=2&a=1&utm_source=feed",
      "http://a.com/x?utm_campaign=z&fbclid=1&gclid=2&ref=nav",
      "http://a.com/x?",
      "http://a.com/x?z=1&refresh=ok") === Seq(
      "http://a.com/x?a=1&b=2",
      "http://a.com/x",
      "http://a.com/x",
      // 'refresh' must NOT die to the 'ref' rule (anchored k=)
      "http://a.com/x?refresh=ok&z=1"))
  }

  test("total on non-URLs: fragment-stripped passthrough") {
    assert(norm("not a url#frag", "relative/path?a=1") ===
      Seq("not a url", "relative/path?a=1"))
  }

  test("percent-encoding: unreserved decodes, retained hex uppercases, invalid passthrough") {
    assert(norm(
      "https://a.com/%41b%7ec",     // %41 -> A, %7e -> ~ (unreserved)
      "https://a.com/a%2fb",        // %2f reserved: retained, uppercased
      "https://a.com/a%2Fb",        // already canonical: unchanged
      "https://a.com/x%zzq",        // invalid triplet: passthrough
      "https://a.com/x%4",          // dangling %: passthrough
      "https://a.com/x?a=%41&b=%7E" // query side too
    ) === Seq(
      "https://a.com/Ab~c", "https://a.com/a%2Fb", "https://a.com/a%2Fb",
      "https://a.com/x%zzq", "https://a.com/x%4",
      "https://a.com/x?a=A&b=~"))
  }

  test("dot segments removed per RFC 3986 §5.2.4") {
    assert(norm(
      "https://a.com/a/./b/../c", // rules B + C
      "https://a.com/../x",       // .. above root clamps at root
      "https://a.com/a/b/..",     // trailing /.. (then /a/ -> /a)
      "https://a.com/a/.",        // trailing /.
      "https://a.com/./a",        // leading /./
      "https://a.com/a/%2E%2E/b"  // pct runs FIRST and creates the ..
    ) === Seq(
      "https://a.com/a/c", "https://a.com/x", "https://a.com/a",
      "https://a.com/a", "https://a.com/a", "https://a.com/b"))
    // the kernel-normalized form is itself a fixed point
    val out = norm("https://a.com/a%2fb/%41x/./c?x=%41&b=2")
    assert(norm(out.head) === out)
  }

  test("kernel scalars: edge shapes") {
    import graft.functions.UrlKernel._
    assert(pctNormalize("") == "")
    assert(pctNormalize("%") == "%")
    assert(pctNormalize("%%41") == "%A")
    assert(pctNormalize("100%25") == "100%25") // %25 = '%': reserved, kept
    assert(removeDotSegments("") == "")
    assert(removeDotSegments(".") == "")
    assert(removeDotSegments("..") == "")
    assert(removeDotSegments("../a") == "a")
    assert(removeDotSegments("./a") == "a")
    assert(removeDotSegments("/a.b/c.") == "/a.b/c.") // dots in names survive
    assert(removeDotSegments("/a/../../b") == "/b")
  }

  test("stacked www. strips to a fixed point (advisor r16)") {
    assert(norm("https://www.www.a.com/x") === Seq("https://a.com/x"))
    assert(host("https://WWW.www.A.com/x") === Seq("a.com"))
    // nested www deeper than 2 as well
    assert(host("http://www.www.www.b.com/") === Seq("b.com"))
  }

  test("valueless tracking keys dropped; refresh still survives (advisor r16)") {
    assert(norm(
      "http://a.com/x?fbclid",
      "http://a.com/x?utm_source&a=1",
      "http://a.com/x?ref",
      "http://a.com/x?refresh") === Seq(
      "http://a.com/x", "http://a.com/x?a=1", "http://a.com/x",
      "http://a.com/x?refresh"))
  }

  test("hostOf matches the host inside the canonical form") {
    assert(host("https://u@WWW.B.Example.ORG.:443//x?utm_source=1#f") ===
      Seq("b.example.org"))
  }

  test("idempotent over the wet3 fixture classes") {
    import spark.implicits._
    // one representative per interacting residue combination (19, 76,
    // 133 hit the stacked-www %19 arm inside %3==1)
    val ids = (0L until 2000L by 7L) ++ Seq(0L, 11L, 13L, 17L, 19L, 30L,
      34L, 39L, 51L, 55L, 60L, 65L, 66L, 76L, 78L, 85L, 102L, 130L, 133L,
      170L, 187L, 221L)
    val once = ids.toDF("doc_id")
      .select(UrlFns.normalizeUrl(concat(
        when(col("doc_id") % 2 === 0, "HTTP").otherwise(lit("https")),
        lit("://"),
        when(col("doc_id") % 11 === 0, "u:p@").otherwise(lit("")),
        when(col("doc_id") % 3 === 1,
          when(col("doc_id") % 19 === 0, "WWW.www.").otherwise(lit("WWW.")))
          .otherwise(lit("")),
        lit("Site"), (col("doc_id") % 7).cast("string"),
        lit(".Example.COM"),
        when(col("doc_id") % 13 === 0, ".").otherwise(lit("")),
        when(col("doc_id") % 17 === 0, ":8080")
          .when(col("doc_id") % 3 === 0,
            when(col("doc_id") % 2 === 0, ":80").otherwise(":443"))
          .otherwise(lit("")),
        lit("//p"), (col("doc_id") % 10).cast("string"), lit("//x"),
        when(col("doc_id") % 5 === 0, "/").otherwise(lit("")),
        when(col("doc_id") % 4 === 0, "?b=2&a=1&utm_source=feed")
          .when(col("doc_id") % 4 === 1, "?a=1&b=2")
          .when(col("doc_id") % 4 === 2, "?utm_campaign=z&fbclid")
          .otherwise(lit("")),
        when(col("doc_id") % 6 === 0, "#sec").otherwise(lit(""))))
        .as("n1"))
    val twice = once.select(UrlFns.normalizeUrl(col("n1")).as("n2"),
      col("n1"))
    assert(twice.filter(col("n1") =!= col("n2")).count() === 0)
  }
}
