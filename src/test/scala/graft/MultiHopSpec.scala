package graft

import graft.eval.MultiHop

/** Pins the reconstruct A/B mechanism (BASELINE.md: reference
  * gold-coverage@5 0.083 → 0.208 with the reconstruct tool; its BEAM
  * multi_hop 0.6% shows default fusion alone cannot multi-hop). On
  * this repo's clean 2-hop fixture the direct lexical lane must MISS
  * every gold (the query shares no vocabulary with the answer doc —
  * that is what makes it multi-hop) and the reconstruct pass (seed
  * top-5 → 1-hop entity link → re-rank) must recover them all.
  * Mechanism demonstration on a synthetic fixture, not dataset parity
  * — see MultiHop scaladoc. */
class MultiHopSpec extends SparkSpec {

  test("direct lexical retrieval misses multi-hop golds; reconstruct recovers them") {
    val c = MultiHop.goldCoverage(spark, k = 5)
    // premise first: every query must rank its own bridge in the
    // direct top-5, or the A/B would pass vacuously with both lanes
    // missing everything
    assert(c.bridgeTop === 1.0,
      s"only ${c.bridgeTop} of queries rank their bridge — fixture drifted")
    assert(c.direct <= 0.25,
      s"direct coverage ${c.direct} — fixture leaks query vocabulary into golds")
    assert(c.reconstruct >= 0.9,
      s"reconstruct coverage ${c.reconstruct} — entity hop failed to recover golds")
    assert(c.reconstruct > c.direct,
      s"reconstruct (${c.reconstruct}) must beat direct (${c.direct})")
  }
}
