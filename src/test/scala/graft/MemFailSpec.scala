package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.api.Mnemo
import graft.eval.MemFail
import graft.eval.MemFail.Stage

/** MemFail-style fault isolation (SURVEY §5 row 7, reference
  * eval/memfail.rs + tests/memfail_isolation.rs): the three
  * per-operation probe sets pass on a well-formed store, the canonical
  * stale-context fixture attributes the stale recall to the retrieve
  * stage, and injected store / summarize faults move the attribution to
  * the injected stage. */
class MemFailSpec extends SparkSpec {

  private val Agent = "memfail-agent"
  private def t0 = Timestamp.valueOf("2024-03-01 10:00:00")

  private def freshStore() = {
    val dir = Files.createTempDirectory("memfail-store").toFile
    dir.delete()
    Mnemo.open(spark, dir.getAbsolutePath)
  }

  test("three stage probe sets each pass independently on a well-formed store") {
    val store = freshStore()
    val s = MemFail.runStoreProbes(store, Agent, t0)
    assert(s.passed, s"store probes: ${s.failingProbes}")
    assert(s.stage == Stage.Store && s.probes.length == 3)

    val sum = MemFail.runSummarizeProbes(freshStore(), Agent, t0)
    assert(sum.passed, s"summarize probes: ${sum.failingProbes}")
    assert(sum.stage == Stage.Summarize && sum.probes.length == 3)

    val r = MemFail.runRetrieveProbes(freshStore(), Agent, t0)
    assert(r.passed, s"retrieve probes: ${r.failingProbes}")
    assert(r.stage == Stage.Retrieve && r.probes.length == 2)
  }

  test("stale-context fixture reproduces stale-on-top and attributes it to retrieve") {
    val report = MemFail.runStaleContextFixture(freshStore(), Agent, t0)
    assert(report.isolated, s"upstream probes failed: ${report.evidence}")
    assert(report.attributedStage == Stage.Retrieve)
    assert(report.observedFailure.contains("older write"),
      s"stale bias did not reproduce: ${report.observedFailure}")
    assert(report.storeReport.passed && report.summarizeReport.passed)
  }

  test("injected storage corruption moves the attribution to the store stage") {
    val report = MemFail.runStaleContextFixture(freshStore(), Agent, t0,
      inject = s => MemFail.corruptContent(s, "memfail-stale-older"))
    assert(report.attributedStage == Stage.Store,
      s"expected store blamed, got ${report.attributedStage}: ${report.evidence}")
    assert(!report.isolated)
    assert(report.storeReport.failingProbes.exists(_.name == "stale.store.older_write"))
    // the untouched record still verifies — the tamper is localized
    assert(report.storeReport.probes.find(_.name == "stale.store.newer_write").exists(_.passed))
  }

  test("injected consolidation over the fact moves the attribution to the summarize stage") {
    val report = MemFail.runStaleContextFixture(freshStore(), Agent, t0,
      inject = s => s.consolidate(Agent, minClusterSize = 2,
        at = Timestamp.valueOf("2024-03-01 13:00:00")))
    assert(report.attributedStage == Stage.Summarize,
      s"expected summarize blamed, got ${report.attributedStage}: ${report.evidence}")
    assert(!report.isolated)
    assert(report.storeReport.passed, "store verification must still pass under a summarize fault")
    assert(report.summarizeReport.failingProbes.nonEmpty)
  }
}
