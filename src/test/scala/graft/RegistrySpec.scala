package graft

/** Driver-contract invariants of the SparkEntry registry itself. */
class RegistrySpec extends SparkSuite {

  test("every registered query has a DuckDB oracle and vice versa") {
    // a key registered in queries without oracleSql silently downgrades
    // the driver's gate to a rows-only check, so rows-only entries must
    // be DECLARED here, with the reason, not accidental; an oracle
    // without a query is dead SQL. The only declared exceptions:
    //  - q_percentiles_approx: a GK sketch's returned sample depends on
    //    partition merge order (any value within the rank-error bound is
    //    a correct answer), so cross-engine hash equality is not a
    //    meaningful contract; PropertySpec pins the rank-error bound
    //    against the exact operator instead.
    //  - q_top_terms_approx: same class — the Misra-Gries summary's
    //    content under compaction depends on merge order; PropertySpec
    //    pins the est <= true <= est+loss bound in the lossy regime and
    //    EXACT equality with q_top_terms below the counter budget.
    val rowsOnly = Set("q_percentiles_approx", "q_top_terms_approx")
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- rowsOnly) == o,
      s"queries without oracle: ${(q -- rowsOnly -- o).toSeq.sorted.mkString(", ")}; " +
        s"oracles without query: ${(o -- q).toSeq.sorted.mkString(", ")}")
    assert(rowsOnly.subsetOf(q), "declared rows-only key not registered")
    assert((rowsOnly & o).isEmpty, "declared rows-only key has an oracle — undeclare it")
  }

  test("flagship entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1L)
  }

  test("oracle SQL references only the driver's tables") {
    // check_oracle.py (and the driver) create views for exactly these
    // names; an oracle referencing anything else fails only at gate time
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val fromRe = "(?i)\\b(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // collect bare identifiers after FROM/JOIN that are not CTE names
      // CTE names may carry a column list: `walk(node, comp) AS (...)`
      val ctes = "(?i)\\b([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*(?:MATERIALIZED\\s+)?\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val refs = fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- tables -- ctes - "unnest" - "range"
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }
}
