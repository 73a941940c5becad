package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants — the contracts the driver's correctness gate
  * and bench harness assume about [[SparkEntry]], asserted without a
  * Spark session so a registration slip fails in milliseconds.
  */
class RegistrySpec extends AnyFunSuite {

  private val defs = graft.queries.Queries.all

  test("every registered query carries a DuckDB oracle") {
    // the driver records a weaker rows-only check for oracle-less
    // queries; this registry deliberately has none — a new QueryDef
    // without SQL must be a conscious exception, not an omission
    val missing = defs.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"oracle-less queries: $missing")
  }

  test("query names are unique, stable-format, and map-consistent") {
    val names = defs.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate names: ${names.diff(names.distinct)}")
    assert(names.forall(_.matches("[a-z0-9_]+")),
      s"non-kebab names: ${names.filterNot(_.matches("[a-z0-9_]+"))}")
    assert(graft.queries.Queries.queryMap.keySet == names.toSet)
    assert(graft.queries.Queries.oracleMap.keySet == names.toSet)
  }

  test("oracle SQL references only driver-provided tables") {
    // the driver creates views for exactly these parquet tables; an
    // oracle naming anything else fails at gate time with a confusing
    // DuckDB binder error — catch it here instead
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val fromRe = """(?i)\b(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)""".r
    for (d <- defs; sql <- d.oracle) {
      // optional (col, ...) list between the CTE name and AS —
      // `r(lang, rate) AS (VALUES ...)` is a legal CTE header
      val ctes =
        """(?i)([a-z_][a-z0-9_]*)\s*(?:\([^)]*\))?\s+AS(?:\s+MATERIALIZED)?\s*\(""".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val refs = fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase)
        .filterNot(ctes)
        // alias-only FROM (subquery) tokens and VALUES clauses
        .filterNot(Set("values", "lateral", "unnest", "read_parquet"))
        .toSet
      val unknown = refs -- tables
      assert(unknown.isEmpty,
        s"${d.name}: oracle references unknown relations $unknown " +
          "(CTE name regex may need an update if this is a false hit)")
    }
  }
}
