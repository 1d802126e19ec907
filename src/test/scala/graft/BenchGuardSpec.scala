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

  test("foldKey refuses a min-merge across conflicting artifact states") {
    // existing map timed the BUILD (14 s), this run timed a cached
    // HIT (0.07 s): different work — keep existing, flag the refusal
    val (v, fromNew, art, refused) =
      Bench.foldKey(Some(14.0), "build", Some(0.07), "hit")
    assert(v == 14.0 && !fromNew && art == "build" && refused)
    // and symmetrically
    assert(Bench.foldKey(Some(0.07), "hit", Some(14.0), "build") ==
      ((0.07, false, "hit", true)))
  }

  test("foldKey min-folds when states agree, state travels with the min") {
    assert(Bench.foldKey(Some(2.0), "hit", Some(1.5), "hit") ==
      ((1.5, true, "hit", false)))
    assert(Bench.foldKey(Some(1.0), "none", Some(3.0), "none") ==
      ((1.0, false, "none", false)))
    // ties go to the new run (fresher spread)
    assert(Bench.foldKey(Some(2.0), "none", Some(2.0), "none") ==
      ((2.0, true, "none", false)))
  }

  test("foldKey: legacy '?' state folds and inherits the known state") {
    // pre-field map: unknown state must not block the fold, and the
    // surviving entry picks up whatever state IS known
    assert(Bench.foldKey(Some(5.0), "?", Some(1.0), "hit") ==
      ((1.0, true, "hit", false)))
    assert(Bench.foldKey(Some(1.0), "?", Some(5.0), "build") ==
      ((1.0, false, "build", false)))
    assert(Bench.foldKey(Some(5.0), "build", Some(1.0), "?") ==
      ((1.0, true, "build", false)))
  }

  test("foldKey: one-sided keys pass through") {
    assert(Bench.foldKey(Some(3.0), "build", None, "?") ==
      ((3.0, false, "build", false)))
    assert(Bench.foldKey(None, "?", Some(4.0), "hit") ==
      ((4.0, true, "hit", false)))
  }
}
