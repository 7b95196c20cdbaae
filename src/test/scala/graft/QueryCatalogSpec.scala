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
}
