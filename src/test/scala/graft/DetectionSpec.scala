package graft

import graft.eval.Detection

/** Pins the detection-rate harness to the rates the engine claims
  * against BASELINE.md's audit/defense table: 100% on every tamper
  * family — INCLUDING the reference's two disclosed gaps (payload-only
  * forge, tail truncation) — with a 0% benign false-positive floor,
  * and the MINJA-style lexical lane at TPR 1.0 / FPR 0.0. Compact
  * trial counts here (the committed DETECTION.json carries the
  * full-size reference-parity counts); same seeded deterministic
  * target selection, so rates are exact, not flaky. */
class DetectionSpec extends SparkSpec {

  test("tamper families: 100% detection, 0% benign FP (full verifier incl. w9 digest)") {
    val tiers = Detection.tamperRatesTiered(spark, attackTrials = 40, benignTrials = 60)
    val rates = tiers.map { case (k, v) => k -> v.full }
    assert(rates("benign").detected === 0L,
      s"benign logs flagged: ${rates("benign")}")
    Seq("payload_forge", "delete_interior", "reorder",
      "hash_forge_interior", "hash_forge_tail", "tail_truncation",
      "single_byte").foreach { fam =>
      val r = rates(fam)
      assert(r.detected === r.trials,
        s"$fam: ${r.detected}/${r.trials} detected — missed tampers")
    }
    // the conformance family runs at the reference's exact trial count
    // even when the others are compact (BASELINE.md: 256 trials,
    // Wilson95 lower >= 0.985)
    assert(rates("single_byte").trials === 256L)
    assert(rates("single_byte").wilson95._1 >= 0.985)
    // the two disclosed-gap families are the headline: assert them by
    // name so a regression names the exact capability lost
    assert(rates("payload_forge").rate === 1.0)
    assert(rates("tail_truncation").rate === 1.0)
    // benign digests must re-fold identically (digest-leg FP floor)
    assert(tiers("benign").walkReg.detected === 0L)
  }

  test("disclosed boundary: a self-consistent TAIL forge evades walk+registration, only the w9 digest catches it") {
    // pinned as a MEASURED negative result (the honesty convention the
    // reference uses for its own gaps): if walkReg ever starts catching
    // the tail forge, the disclosure in DETECTION.json/README is stale
    // and must be re-measured, not assumed
    val tiers = Detection.tamperRatesTiered(spark, attackTrials = 30, benignTrials = 10)
    val tail = tiers("hash_forge_tail")
    assert(tail.walkReg.detected === 0L,
      s"walk+registration unexpectedly caught tail forges (update the " +
        s"disclosure docs): ${tail.walkReg}")
    assert(tail.full.rate === 1.0,
      s"registered digest missed tail forges: ${tail.full}")
    // the interior forge stays caught WITHOUT the digest — the boundary
    // is exactly at the tail, nowhere else
    assert(tiers("hash_forge_interior").walkReg.rate === 1.0)
  }

  test("injection lexical lane: TPR 1.0 on marker templates, FPR 0.0 on benign notes") {
    val (tpr, fpr) = Detection.injectionRates(spark, trials = 80)
    assert(tpr.detected === tpr.trials, s"poison missed: $tpr")
    assert(fpr.detected === 0L, s"benign flagged: $fpr")
  }

  test("forged-reasoning lane: ASR 1.0 undefended, 0.0 defended, 0 benign misclassifications") {
    val asr = Detection.reasoningTrustAsr(spark, trials = 60)
    assert(asr("asr_defense_off").rate === 1.0,
      s"attack should land undefended: ${asr("asr_defense_off")}")
    assert(asr("asr_defense_on").detected === 0L,
      s"defense missed attacks: ${asr("asr_defense_on")}")
    assert(asr("benign_fp").detected === 0L,
      s"benign rows misclassified as forged: ${asr("benign_fp")}")
  }

  test("z-score lane reproduces the reference's PUBLISHED limitation: poison sits below the 3-sigma gate") {
    // the reference discloses its embedding z-score lane does NOT catch
    // MINJA poison (poison ~1.5 sigma < 3 sigma gate) — measured over
    // our hash embeddings the same limitation holds (median poison z
    // 1.57 at bench scale), which is WHY the lexical lane exists and
    // is the lane pinned at TPR 1.0 above (defense-in-depth ordering)
    val (tpr, fpr, medianZ) = Detection.zScoreLane(spark, trials = 80)
    assert(tpr.detected === 0L,
      s"z-gate unexpectedly caught poison (limitation no longer reproduces " +
        s"— re-measure and update README/DETECTION.json): $tpr")
    assert(fpr.detected === 0L, s"benign flagged by z-gate: $fpr")
    assert(medianZ > 1.0 && medianZ < 2.5,
      s"median poison z $medianZ left the ~1.5-sigma band the docs cite")
  }

  test("wilson interval matches the reference's published bound shape") {
    // reference: 256/256 -> Wilson95 lower >= 0.985 (BASELINE.md single-byte row)
    val r = Detection.FamilyRate(256, 256)
    val (lo, hi) = r.wilson95
    assert(lo >= 0.985 && hi === 1.0)
    val half = Detection.FamilyRate(10, 5)
    val (l2, h2) = half.wilson95
    assert(l2 > 0.2 && l2 < 0.5 && h2 > 0.5 && h2 < 0.8)
  }
}
