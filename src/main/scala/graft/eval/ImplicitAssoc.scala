package graft.eval

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Mnemo
import graft.api.Mnemo.{RecallRequest, RememberRequest}

/** Implicit-association (indirect recall) A/B with the orientation
  * cache — the counterpart to the LAST unmeasured quality row of
  * BASELINE.md: indirect recall@5 ~0.87 → 1.00 combined with the
  * orientation map (reference: `bench/RESULTS.md:107-131`,
  * `docs/benchmarks/implicit-association.md`, bin
  * `implicit_association.rs`).
  *
  * Probe question (the reference's framing): does the memory layer
  * surface a decisive stored fact when the query shares NO wording
  * with it — and does the constant-token orientation map, warmed by
  * prior direct access, keep that fact visible for the later indirect
  * question?
  *
  * Fixture (original, authored for this repo, the MultiHop
  * convention): 12 cases, each with a stored FACT carrying a decisive
  * target entity token, a DIRECT control query sharing the fact's
  * wording (premise: the fact is retrievable at all), and an INDIRECT
  * query sharing ZERO informative tokens with the fact (enforced by
  * [[leakage]], the mirror of the reference's
  * implicit_association_corpus.rs test). Six per-case distractors
  * deliberately reuse the indirect query's vocabulary so the indirect
  * top-k has something to prefer — the fact cannot land in the top-5
  * by tie-break accident.
  *
  * Arms, per the reference's protocol (each case is its own agent +
  * namespace in ONE real store — the p7 maintained orientation store,
  * not a synthetic map):
  *  - `direct`: recall@5 of the fact via the direct query — control;
  *  - `indirect`: recall@5 via the indirect query — the blind spot;
  *  - `indirect+orientation`: the namespace map is warmed by 2 prior
  *    recalls of the DIRECT query (the reference's explicit warming —
  *    "keep a previously-seen fact visible", not zero-shot bridging),
  *    then sub-count A = fact in the indirect top-k memories and
  *    sub-count B = target entity surfaced in the rendered map are
  *    reported SEPARATELY (A is ranked, B is a binary surfaced
  *    signal), plus combined A‖B.
  *
  * HONESTY NOTE: the recall lane here is the engine's lexical lane
  * (token Jaccard) — under the zero-overlap constraint its indirect
  * arm is a structural ~0.0, harsher than the reference's ~0.87
  * (whose real embedder bridges semantically). The row this produces
  * is a MECHANISM demonstration (the map recovers what retrieval
  * misses, sub-count A stays ≈ indirect — same shape as the
  * reference's result), not dataset or model parity — the same label
  * as the MultiHop and hash-embedder-floor rows (README). */
object ImplicitAssoc {

  final case class Case(cid: Int, fact: String, target: String,
      direct: String, indirect: String)

  /** 12 cases across everyday domains. The fact's decisive entity is
    * `target`; the indirect query bridges only through world knowledge
    * the engine does not model — by construction it shares no
    * informative token with the fact. */
  val cases: Seq[Case] = Seq(
    Case(0, "my anniversary falls on bastille day each summer", "bastille",
      "when does my anniversary fall",
      "which mid july fireworks holiday should i plan a party around"),
    Case(1, "the cardiologist started me on metoprolol after the checkup", "metoprolol",
      "what did the cardiologist start me on",
      "which beta blocker pill do i take every morning"),
    Case(2, "our wifi router password is stored under the blue teapot", "teapot",
      "where is the wifi router password stored",
      "what kitchen object hides the network login"),
    Case(3, "the landlord renews my lease every michaelmas quarter", "michaelmas",
      "when does the landlord renew my lease",
      "which late september feast marks the tenancy rollover"),
    Case(4, "grandma's sourdough starter is named clementine", "clementine",
      "what is grandma's sourdough starter named",
      "which citrus moniker belongs to the bubbling bread culture"),
    Case(5, "my marathon training plan peaks at pfitzinger week twelve", "pfitzinger",
      "where does my marathon training plan peak",
      "whose running schedule governs the hardest block"),
    Case(6, "the cabin spare key hangs inside the osprey birdhouse", "osprey",
      "where does the cabin spare key hang",
      "which raptor box conceals a way into the lakeside hut"),
    Case(7, "my dissertation advisor was professor okonkwo at trinity", "okonkwo",
      "who was my dissertation advisor at trinity",
      "which scholar guided the doctoral thesis work"),
    Case(8, "the car insurance renews through the gecko company in march", "gecko",
      "when does the car insurance renew",
      "which lizard branded firm covers the vehicle policy"),
    Case(9, "our book club always meets at the persephone cafe", "persephone",
      "where does our book club always meet",
      "which underworld goddess names the reading group venue"),
    Case(10, "the allotment rhubarb crowns came from great uncle silas", "silas",
      "where did the allotment rhubarb crowns come from",
      "which elderly relative donated the tart garden stalks"),
    Case(11, "my passport lives in the fireproof box labeled magellan", "magellan",
      "where does my passport live",
      "which explorer tagged container holds the travel document"))

  /** Informative tokens: the engine's own definition (≥3 chars, not a
    * stopword — the distiller's filter in api/OrientationCache), which
    * is also the reference corpus test's "significant token" notion
    * (articles are not vocabulary leakage). */
  private def toks(s: String): Set[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.length > 2).toSet --
      graft.api.OrientationCache.StopWords

  /** Informative tokens shared between a case's fact and its indirect
    * query — MUST be empty for every case (the corpus constraint the
    * reference enforces in implicit_association_corpus.rs). Returned
    * rather than asserted so the spec can name the violating case. */
  def leakage: Seq[(Int, Set[String])] =
    cases.map(c => c.cid -> (toks(c.fact) intersect toks(c.indirect)))
      .filter(_._2.nonEmpty)

  /** Six distractors per case, built FROM the indirect query's own
    * vocabulary (minus the target, which never appears) so the
    * indirect arm's top-5 is occupied by positive-score foils. */
  def distractors(c: Case): Seq[String] = {
    val ts = toks(c.indirect).toSeq.sorted
    (0 until 6).map { j =>
      val a = ts(j % ts.size)
      val b = ts((j + 1) % ts.size)
      s"reminder $j about $a and $b logistics filed with general notes"
    }
  }

  final case class Arms(direct: Double, indirect: Double, memA: Double,
      mapB: Double, combined: Double)

  private def ts0(ms: Long) = new Timestamp(1700000000000L + ms)

  /** Run the three arms over a REAL store at `storeDir` (created and
    * populated by this call): one remember batch for the whole corpus,
    * per-case agent/namespace scoping, the p7 orientation store for
    * the map arm. Returns per-arm rates over the 12 cases. */
  def run(spark: SparkSession, storeDir: String, k: Int = 5): Arms = {
    val store = Mnemo.open(spark, storeDir)
    val reqs = cases.flatMap { c =>
      val agent = s"case-${c.cid}"
      RememberRequest(s"fact-${c.cid}", agent, "t0", c.fact,
        createdAt = ts0(c.cid * 1000L)) +:
        distractors(c).zipWithIndex.map { case (d, j) =>
          RememberRequest(s"noise-${c.cid}-$j", agent, "t0", d,
            createdAt = ts0(c.cid * 1000L + j + 1))
        }
    }
    store.remember(reqs)
    val now = ts0(10000000L)

    def topK(agent: String, q: String) =
      store.recallVisible(agent,
        RecallRequest(query = q, strategy = "lexical", limit = k), now)

    def hitsFact(agent: String, q: String, cid: Int): Boolean =
      topK(agent, q).filter(col("id") === s"fact-$cid").count() > 0

    var direct, indirect, memA, mapB, combined = 0
    cases.foreach { c =>
      val agent = s"case-${c.cid}"
      val d = hitsFact(agent, c.direct, c.cid)
      val i = hitsFact(agent, c.indirect, c.cid)
      // warm the namespace map with 2 prior DIRECT recalls (the
      // reference's warming protocol), then ask the indirect question
      (0 until 2).foreach { w =>
        store.orientationUpdate(topK(agent, c.direct), agent,
          1700000000L + c.cid * 100L + w)
      }
      val a = hitsFact(agent, c.indirect, c.cid) // map never re-ranks
      val b = store.orientationRender(agent)
        .filter(col("key") === c.target).count() > 0
      if (d) direct += 1
      if (i) indirect += 1
      if (a) memA += 1
      if (b) mapB += 1
      if (a || b) combined += 1
    }
    val n = cases.size.toDouble
    Arms(direct / n, indirect / n, memA / n, mapB / n, combined / n)
  }
}
