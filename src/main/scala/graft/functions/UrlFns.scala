package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** RFC 3986 *syntax-based* URL canonicalization (wet3/wet4) — the
  * dedup key every real crawl pipeline computes BEFORE any text
  * operator runs: CCNet/C4/RefinedWeb all deduplicate and blocklist
  * at the (normalized-URL, host) level first, because it is free
  * relative to content hashing and removes the bulk of crawl-level
  * duplication (http/https aliases, tracking-param variants, default
  * ports, `www.` mirrors). Reference scope: xyzpy has no crawl layer;
  * this extends the WET family (wet1/wet2) with the step that sits
  * between record parse and rule cleaning.
  *
  * The normalization is the deterministic, oracle-replayable subset
  * of RFC 3986 §6 plus the standard crawl-dedup conventions, applied
  * in this FIXED order (each step's regex is anchored or run with
  * replace-all on both engines, so the composition is well-defined):
  *
  *  1. fragment strip (`#…` — never sent to the server);
  *  2. parse `scheme://authority path ?query` with one RE2-safe
  *     regex; a non-URL string (no `scheme://`) passes through
  *     fragment-stripped only, making the function total;
  *  3. authority: drop userinfo (`user:pw@`), lowercase (scheme and
  *     host are case-insensitive per §6.2.2.1), drop the scheme's
  *     DEFAULT port only (`:80` http / `:443` https — a real `:8080`
  *     survives), drop a trailing root-label dot (`example.com.`),
  *     drop the leading `www.` RUN to a fixed point (`www.www.a.com`
  *     → `a.com` — the anchored `(www\.)+` strip keeps normalizeUrl
  *     idempotent on stacked mirror prefixes; advisor r16);
  *  4. path: percent-normalize (§6.2.2.2 — [[UrlKernel.pctNormalize]],
  *     a native codegen'd kernel: unreserved `%XX` decodes, retained
  *     hex uppercases), collapse duplicate slashes, remove dot
  *     segments (§5.2.4 — [[UrlKernel.removeDotSegments]]; pct runs
  *     FIRST because `%2E` decodes to `.` and may create a dot
  *     segment), empty path becomes `/` (§6.2.3), a non-root trailing
  *     slash is dropped;
  *  5. query: percent-normalize, split on `&`, drop empties and
  *     TRACKING params (`utm_*`, `fbclid`, `gclid`, `ref` — never
  *     content-bearing; the `=` is OPTIONAL, so a bare `?fbclid`
  *     dies too — advisor r16), sort byte-wise, rejoin; an emptied
  *     query drops its `?`. (`%26` is a RESERVED octet so the pct
  *     pass never materializes a raw `&` — splitting after it is
  *     safe.)
  *
  * Deliberately OUT of scope (documented, not silent): percent-forms
  * in the HOST (vanishingly rare; would fight the lowercasing chain)
  * and IDN/punycode. Sorting is byte-order on both sides, exact on
  * the ASCII query strings real params use.
  *
  * Oracle note: the wet3-wet6 oracles replay the REGEX steps in
  * DuckDB SQL; the two native-kernel steps are exercised by wet3b,
  * whose fixture residue classes let the oracle construct the
  * EXPECTED canonical form directly (and are identity on the
  * wet3-wet6 fixtures, which contain no `%` or dot segments — so
  * those SQL replays stay exact).
  *
  * Shape for scale: every step is a codegen'd builtin over the
  * URL column (regexp_replace / regexp_extract / lower / concat)
  * or a codegen'd native kernel ([[UrlPctNormalize]] /
  * [[UrlRemoveDotSegments]] — single pass per row, no UDF); the only
  * higher-order functions (filter / array_sort / array_join) run
  * over the PER-URL param list — a handful of elements, bounded by
  * URL length, never corpus-shaped. Map-only: no shuffle, text never
  * leaves the row.
  */
object UrlFns {

  /** scheme/authority/path splitter (fragment must be stripped
    * first, so `#` exclusions are belt-and-braces). */
  private val Parts = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)"

  /** Params dropped from every query string: classic tracking keys.
    * Anchored at the param start; the `=` is optional (`(=|$)`) so
    * VALUELESS tracking keys (`?fbclid`, `?utm_source`) are dropped
    * too — but `refresh=1` survives (`ref` must be followed by `=`
    * or end-of-param). `\z` not `$`: Java's `$` also matches before a
    * final newline where RE2's does not — `\z` is end-of-input on
    * both sides of the oracle, so crawl garbage with a trailing
    * newline cannot diverge the engines. */
  val TrackingParams = "^(utm_[^=]*|fbclid|gclid|ref)(=|\\z)"

  def stripFragment(url: Column): Column = regexp_replace(url, "#.*$", "")

  /** The canonical host (steps 1-3): userinfo dropped, lowercased,
    * default port for `scheme` dropped, trailing dot dropped, one
    * leading `www.` dropped. Exposed for per-host profiling. */
  def hostOf(url: Column): Column = {
    val u = stripFragment(url)
    val scheme = lower(regexp_extract(u, Parts, 1))
    normHost(scheme, regexp_extract(u, Parts, 2))
  }

  private def normHost(scheme: Column, auth: Column): Column = {
    val lowered = lower(regexp_replace(auth, "^[^@]*@", ""))
    val unported = when(scheme === "http", regexp_replace(lowered, ":80$", ""))
      .when(scheme === "https", regexp_replace(lowered, ":443$", ""))
      .otherwise(lowered)
    // the trailing root-label dot may sit before a KEPT port:
    // `example.com.:8080` -> `example.com:8080` (backref keeps the port)
    val undotted = regexp_replace(unported, "\\.(:[0-9]+)?$", "$1")
    // the whole leading www. RUN, not one: fixed-point idempotence
    regexp_replace(undotted, "^(www\\.)+", "")
  }

  /** Column form of [[UrlPctNormalize]]. */
  def pctNormalize(c: Column): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      UrlPctNormalize(org.apache.spark.sql.GraftSqlShims.expression(c)))

  /** Column form of [[UrlRemoveDotSegments]]. */
  def removeDotSegments(c: Column): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      UrlRemoveDotSegments(org.apache.spark.sql.GraftSqlShims.expression(c)))

  /** Full canonical form (object doc). Total: a string with no
    * `scheme://` passes through fragment-stripped. */
  def normalizeUrl(url: Column): Column = {
    val u = stripFragment(url)
    val scheme = lower(regexp_extract(u, Parts, 1))
    val host = normHost(scheme, regexp_extract(u, Parts, 2))
    val p0 = removeDotSegments(regexp_replace(
      pctNormalize(regexp_extract(u, Parts, 3)), "/{2,}", "/"))
    val p1 = when(p0 === "", lit("/")).otherwise(p0)
    val path = when(p1 =!= "/", regexp_replace(p1, "/$", "")).otherwise(p1)
    val q0 = pctNormalize(regexp_extract(u, "\\?(.*)$", 1))
    val params = filter(split(q0, "&"),
      x => x =!= "" && !x.rlike(TrackingParams))
    val qn = array_join(array_sort(params), "&")
    val rebuilt = concat(scheme, lit("://"), host, path,
      when(qn === "", lit("")).otherwise(concat(lit("?"), qn)))
    when(scheme === "", u).otherwise(rebuilt)
  }
}
