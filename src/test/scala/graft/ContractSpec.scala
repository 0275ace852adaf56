package graft

/** Driver-contract guard: every declared query has an oracle, names are
  * consistent, and the flagship entry returns rows — the invariants the
  * driver's smoke/correctness gates assume. */
class ContractSpec extends SparkSpec {

  test("every query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert(q.subsetOf(o), s"queries without oracles: ${q -- o}")
  }

  test("flagship entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL references only the driver-registered tables") {
    val allowed = graft.sources.Tables.All.toSet
    val tablePattern = "(?i)\\bFROM\\s+([a-z_][a-z0-9_]*)".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      tablePattern.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        // CTE names and derived aliases are fine; flag only unknown
        // bare names that look like base tables
        val cteNames = "(?i)\\b([a-z_][a-z0-9_]*)\\s*(\\([^)]*\\))?\\s+AS\\s*\\(".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        assert(allowed.contains(t) || cteNames.contains(t) || t == "read_parquet",
          s"$name references unknown table '$t'")
      }
    }
  }
}
