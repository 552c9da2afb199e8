package graft

import graft.operators.SqlSurface

/** The SQL-text surface's structural contract with its DataFrame
  * twins. Each `sql_*` query shares an oracle with a DataFrame-form
  * query, and the driver's compare hashes VALUES — so a type drift
  * that happens to print identically can pass for rounds and then
  * break on new data. The round-13 instance: Spark SQL parses a bare
  * fractional literal (`1.0`, `0.15`) as DECIMAL while the DataFrame
  * twin's `lit(1.0)` is DOUBLE, so `sql_pagerank`'s unrolled rank
  * chain ran decimal arithmetic and diverged from the double oracle
  * in the 6th decimal after three re-rounded iterations. This spec
  * closes the CLASS: every twin pair must agree on output schema —
  * column names, order, AND types — at analysis time, before any row
  * is computed.
  */
class SqlSurfaceSpec extends SparkTestBase {

  test("every SQL twin's output schema equals its DataFrame twin's (names and types)") {
    val qs = SparkEntry.queries
    SqlSurface.twins.foreach { case (sqlName, dfName) =>
      assert(qs.contains(sqlName), s"unregistered SQL twin $sqlName")
      assert(qs.contains(dfName), s"unregistered DataFrame twin $dfName")
      // analysis only — .schema resolves the plan without running it
      // (artifact-backed twins still materialize their tables once)
      val sqlSchema = qs(sqlName)(spark, sfDir).schema
        .map(f => (f.name, f.dataType))
      val dfSchema = qs(dfName)(spark, sfDir).schema
        .map(f => (f.name, f.dataType))
      assert(sqlSchema == dfSchema,
        s"$sqlName vs $dfName schema drift:\n  sql: $sqlSchema\n  df:  $dfSchema")
    }
  }

  test("every sql_* query is twinned or carries a standalone oracle") {
    // a future SQL twin added to `queries` without a `twins` row would
    // silently skip the parity check above — fail it here instead
    val standalone = Set("sql_revenue_by_nation", "sql_upc_valid_share")
    val untracked = SqlSurface.queries.keySet --
      SqlSurface.twins.keySet -- standalone
    assert(untracked.isEmpty,
      s"SQL queries with no twin mapping and no standalone oracle: $untracked")
  }
}
