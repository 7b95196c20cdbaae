package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query runs on sf0.001 and yields rows, and
  * every oracle entry points at a declared query. Value-level
  * correctness is the driver's DuckDB gate (tools/local_verify.py).
  */
class QueryCatalogSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query returns rows on sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with 0 rows: $empty")
  }

  test("entry() smoke: flagship query yields rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("dashboard serve-layer result cache survives repeated serves and dir switches") {
    // q55 serves dashboard Q2 through the per-(session, dir) result
    // cache; q164 derives from the same served result. Serving twice
    // must be value-identical, and switching sf dirs must evict — a
    // stale cached result from the other dir would differ in rows.
    val q55 = SparkEntry.queries("q55_pipeline_dash_q2")
    val first = q55(spark, sfDir).collect().toSeq
    assert(first.nonEmpty)
    assert(q55(spark, sfDir).collect().toSeq === first, "repeat serve diverged")
    val other = q55(spark, "/root/testdata/sf0.01").collect().toSeq
    assert(other.size !== first.size, "dir switch should change the result set")
    assert(q55(spark, sfDir).collect().toSeq === first,
      "switching back must rebuild and re-serve the original result")
  }
}
