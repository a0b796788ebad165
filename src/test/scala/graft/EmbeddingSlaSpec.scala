package graft

import graft.eval.EmbeddingSla
import graft.eval.EmbeddingSla._

/** SLA-aware embedding-backend recommender (reference bench/embeddings):
  * recommender logic pinned on synthetic measurements, quality harness
  * sanity-checked on the real fixture. */
class EmbeddingSlaSpec extends SparkSpec {

  private def r(name: String, ndcg: Double, p95: Double) =
    BackendResult(name, ndcg, ndcg, p95 / 2, p95, 1000.0)

  test("recommender picks the highest-nDCG backend within the SLO and reports the gap") {
    val results = Seq(
      r("fast-weak", ndcg = 0.61, p95 = 5.0),
      r("slow-best", ndcg = 0.82, p95 = 120.0),
      r("mid", ndcg = 0.79, p95 = 40.0))
    val tight = EmbeddingSla.recommend(results, sloMs = 50.0)
    assert(tight.chosen.contains("mid"))
    assert(tight.bestQuality == "slow-best")
    assert(math.abs(tight.ndcgGap - 0.03) < 1e-12)

    val loose = EmbeddingSla.recommend(results, sloMs = 500.0)
    assert(loose.chosen.contains("slow-best") && loose.ndcgGap == 0.0)

    val impossible = EmbeddingSla.recommend(results, sloMs = 1.0)
    assert(impossible.chosen.isEmpty && impossible.bestQuality == "slow-best")
  }

  test("recommender breaks nDCG ties toward lower p95") {
    val results = Seq(r("slow", 0.8, 100.0), r("fast", 0.8, 10.0))
    assert(EmbeddingSla.recommend(results, sloMs = 500.0).chosen.contains("fast"))
  }

  test("percentile: nearest-rank on small samples") {
    assert(EmbeddingSla.percentile(Seq(3.0, 1.0, 2.0), 0.5) == 2.0)
    assert(EmbeddingSla.percentile(Seq(3.0, 1.0, 2.0), 0.95) == 3.0)
    assert(EmbeddingSla.percentile(Seq(7.0), 0.95) == 7.0)
  }

  test("quality harness: the production hash backend beats the degenerate noop on the fixture") {
    val (ndcgHash, recallHash) = EmbeddingSla.quality(spark, HashBackend(64))
    val (ndcgNoop, _) = EmbeddingSla.quality(spark, NoopBackend)
    assert(ndcgHash >= 0.0 && ndcgHash <= 1.0 && recallHash >= 0.0 && recallHash <= 1.0)
    assert(recallHash > 0.8, s"hash-64 gold recall@10 too low: $recallHash")
    assert(ndcgHash > ndcgNoop,
      s"hash-64 nDCG ($ndcgHash) must beat noop ($ndcgNoop)")
  }

  test("single-embed latency sampling returns one sample per text per rep") {
    val samples = EmbeddingSla.singleEmbedSamples(
      spark, HashBackend(16), Seq("alpha beta", "gamma delta"), reps = 2)
    assert(samples.length == 4 && samples.forall(_ > 0.0))
  }
}
