package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench hygiene guards (no Spark session needed). This VM degrades
  * shuffle-heavy runs up to 4× as host-side page-cache state
  * accumulates; the non-monotonicity guard is what stops a degraded
  * run's numbers from being folded into the committed min-map.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("nonMonotone flags a later pass slower by >15%") {
    // the canonical degraded-host signature: pass 3 blows up
    assert(Bench.nonMonotone(Seq(78.0, 80.0, 272.0)))
    // a mild wobble inside the 15% band is normal pass noise
    assert(!Bench.nonMonotone(Seq(100.0, 90.0, 95.0)))
    // strictly improving passes (cold → steady) are the healthy shape
    assert(!Bench.nonMonotone(Seq(120.0, 85.0, 80.0)))
    // just inside the band is NOT suspect, just past it is
    assert(!Bench.nonMonotone(Seq(100.0, 114.9)))
    assert(Bench.nonMonotone(Seq(100.0, 115.1)))
    // degenerate inputs never flag
    assert(!Bench.nonMonotone(Seq.empty))
    assert(!Bench.nonMonotone(Seq(42.0)))
  }
}
