package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the session-sizing derivation (VERDICT r11 #5): shuffle width
  * defaults to the core count — the sf10 sweep measured 96-wide
  * shuffles 2–4× slower than 32 at fixed 32 cores on the ANN family
  * (q185 501 s → 121 s) — with `SPARK_GRAFT_SHUFFLE` as the explicit
  * override, and the assumed core count comes from `SPARK_GRAFT_CPUS`
  * else the JVM's visible processors. The env-injectable overloads
  * make both branches testable regardless of the test JVM's real
  * environment; the no-arg forms are pinned to agree with the
  * injectable forms on the real env.
  */
class GraftSessionSpec extends AnyFunSuite {

  test("shuffle width defaults to the core count when no override is set") {
    assert(GraftSession.shuffleWidth(4, Map.empty) === 4)
    assert(GraftSession.shuffleWidth(32, Map.empty) === 32)
    assert(GraftSession.shuffleWidth(96, Map.empty) === 96)
  }

  test("SPARK_GRAFT_SHUFFLE overrides the core-derived width") {
    assert(GraftSession.shuffleWidth(32, Map("SPARK_GRAFT_SHUFFLE" -> "96")) === 96)
    assert(GraftSession.shuffleWidth(96, Map("SPARK_GRAFT_SHUFFLE" -> "32")) === 32)
    // unrelated env keys do not override
    assert(GraftSession.shuffleWidth(8, Map("SPARK_GRAFT_CPUS" -> "96")) === 8)
  }

  test("assumed cores = SPARK_GRAFT_CPUS else the JVM's visible processors") {
    assert(GraftSession.availableCores(Map("SPARK_GRAFT_CPUS" -> "7")) === 7)
    assert(GraftSession.availableCores(Map.empty) ===
      Runtime.getRuntime.availableProcessors())
  }

  test("the no-arg forms read the real environment (same derivation)") {
    assert(GraftSession.availableCores === GraftSession.availableCores(sys.env))
    assert(GraftSession.shuffleWidth(13) === GraftSession.shuffleWidth(13, sys.env))
  }
}
