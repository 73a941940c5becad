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

  test("hostOf matches the host inside the canonical form") {
    assert(host("https://u@WWW.B.Example.ORG.:443//x?utm_source=1#f") ===
      Seq("b.example.org"))
  }

  test("idempotent over the wet3 fixture classes") {
    import spark.implicits._
    // one representative per interacting residue combination
    val ids = (0L until 2000L by 7L) ++ Seq(0L, 11L, 13L, 17L, 30L, 34L,
      39L, 51L, 55L, 60L, 65L, 66L, 78L, 85L, 102L, 130L, 170L, 187L, 221L)
    val once = ids.toDF("doc_id")
      .select(UrlFns.normalizeUrl(concat(
        when(col("doc_id") % 2 === 0, "HTTP").otherwise(lit("https")),
        lit("://"),
        when(col("doc_id") % 11 === 0, "u:p@").otherwise(lit("")),
        when(col("doc_id") % 3 === 1, "WWW.").otherwise(lit("")),
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
          .when(col("doc_id") % 4 === 2, "?utm_campaign=z")
          .otherwise(lit("")),
        when(col("doc_id") % 6 === 0, "#sec").otherwise(lit(""))))
        .as("n1"))
    val twice = once.select(UrlFns.normalizeUrl(col("n1")).as("n2"),
      col("n1"))
    assert(twice.filter(col("n1") =!= col("n2")).count() === 0)
  }
}
