package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reconstruct A/B over a graph-linked multi-hop fixture — the
  * counterpart to the reference's reconstruct gold-coverage@5 row
  * (0.083 direct → 0.208 with the reconstruct tool,
  * `docs/benchmarks/index.md:34`) and the honest context for its
  * BEAM multi_hop 0.6% result (default RRF alone cannot answer
  * multi-hop questions; `graph`/`reconstruct` are the tools —
  * `bench/RESULTS.md:88-113`).
  *
  * Fixture shape (original, authored for this repo): each case is a
  * 2-hop chain. The BRIDGE document shares the question's vocabulary
  * but holds only a case-file code; the GOLD document carries the
  * answer under that code and shares NO vocabulary with the question.
  * Direct lexical retrieval therefore finds the bridge and misses the
  * gold (that is what multi-hop MEANS for a lexical lane); the
  * reconstruct pass seeds top-k, extracts entity codes, pulls the
  * 1-hop entity-linked documents with inherited seed scores, and
  * re-ranks — the r9_reconstruct plan shape (seed top-k → bounded
  * 1-hop link join → re-rank), scored here for gold coverage.
  *
  * NOTE: this measures the MECHANISM on a clean synthetic fixture
  * (coverage jumps from ~0 to ~1 because every gold is exactly one
  * hop from a findable bridge); the reference's 0.208 is on its own
  * noisier dataset. Mechanism demonstration, not dataset parity —
  * same honesty rule as the hash-embedder floor (README).
  *
  * Scale shape: queries broadcast against the corpus (bounded query
  * set), entity edges via an equi-join on the extracted code — no
  * cartesian anything; the same plan at corpus scale. */
object MultiHop {

  final case class Case(qid: Int, query: String, bridge: String,
      gold: String, code: String)

  /** 12 two-hop cases: query vocabulary lives in the bridge, the
    * answer lives in the gold doc under the shared case-file code. */
  val cases: Seq[Case] = Seq(
    Case(0, "what dose of the beta blocker did the cardiologist set",
      "the cardiologist recorded the beta blocker dose under file cf1001",
      "cf1001 lists metoprolol fifty milligram twice daily", "cf1001"),
    Case(1, "which gate does the lisbon flight leave from",
      "lisbon flight departure details were filed under booking cf1002",
      "cf1002 shows departure gate b22 at seven forty", "cf1002"),
    Case(2, "what caused the checkout latency incident",
      "the checkout latency incident root cause is in postmortem cf1003",
      "cf1003 names an unindexed coupon join as the culprit", "cf1003"),
    Case(3, "how hot should the dutch oven be for the sourdough bake",
      "sourdough bake temperatures are noted in recipe card cf1004",
      "cf1004 says preheat to two hundred fifty celsius lid on", "cf1004"),
    Case(4, "what is the employer match on the retirement plan",
      "retirement plan employer match terms sit in benefits memo cf1005",
      "cf1005 grants fifty percent match up to eight percent", "cf1005"),
    Case(5, "how often does the drip irrigation water the beds",
      "the drip irrigation watering schedule is pinned as note cf1006",
      "cf1006 schedules twenty minutes at dawn thrice weekly", "cf1006"),
    Case(6, "when does the perseid meteor shower peak this year",
      "perseid meteor shower timing was saved under almanac cf1007",
      "cf1007 marks august twelfth with sixty per hour", "cf1007"),
    Case(7, "which opening did she play against the club champion",
      "the club champion game opening is archived as game cf1008",
      "cf1008 records a caro kann held to a draw", "cf1008"),
    Case(8, "what was the top deadlift set at the meet",
      "the meet deadlift numbers were logged in sheet cf1009",
      "cf1009 logs one forty kilograms for a double", "cf1009"),
    Case(9, "how many nights is the alfama hotel booked for",
      "the alfama hotel booking confirmation is receipt cf1010",
      "cf1010 confirms four nights with rooftop terrace", "cf1010"),
    Case(10, "what ferritin level did the iron panel show",
      "the iron panel ferritin result was attached as lab cf1011",
      "cf1011 reports nine nanograms per milliliter", "cf1011"),
    Case(11, "who owns the alerting gap action item",
      "the alerting gap action item assignment is ticket cf1012",
      "cf1012 assigns it to the payments oncall rotation", "cf1012"))

  /** Distractors: realistic notes, no query vocabulary, no codes. */
  val distractors: Seq[String] = Seq(
    "quarterly onsite moved to the lakeside venue in june",
    "new espresso machine installed in the third floor kitchen",
    "library returns are due on the first monday of the month",
    "the standup rotates facilitators alphabetically by surname",
    "parking garage level two closes for resurfacing next week",
    "team jerseys arrived in navy with white lettering",
    "the greenhouse thermostat was recalibrated on sunday",
    "annual fire drill scheduled for the second wednesday",
    "conference wifi password rotates every ninety days",
    "the archive room key lives with facilities on level one",
    "street sweeping alternates sides of the block fortnightly",
    "the vending machine now accepts contactless payment",
    "reading group picked a novella for the holiday break",
    "the elevator inspection certificate was renewed in april",
    "lost and found moved next to the mail room",
    "office plants get watered by the friday volunteer")

  /** Corpus frame: doc_id, text, code (null for unlinked docs). */
  def corpus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val docs =
      cases.map(c => (s"bridge-${c.qid}", c.bridge)) ++
        cases.map(c => (s"gold-${c.qid}", c.gold)) ++
        distractors.zipWithIndex.map { case (t, i) => (s"noise-$i", t) }
    docs.toDF("doc_id", "text")
      .withColumn("code", regexp_extract(col("text"), "(cf\\d{4})", 1))
      .withColumn("code", when(col("code") === "", null).otherwise(col("code")))
  }

  private def tokens(c: org.apache.spark.sql.Column) =
    array_distinct(filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 2))

  final case class Coverage(direct: Double, reconstruct: Double,
      bridgeTop: Double)

  /** Gold-coverage@k of direct lexical retrieval vs the reconstruct
    * pass (seed top-k → 1-hop entity join with inherited score →
    * re-rank → top-k). `bridgeTop` reports how many queries rank their
    * own bridge in the direct top-k — the premise the A/B rests on (if
    * bridges stopped ranking, both lanes would miss and the comparison
    * would pass vacuously). */
  def goldCoverage(spark: SparkSession, k: Int = 5): Coverage = {
    import spark.implicits._
    val docs = corpus(spark).withColumn("dtok", tokens(col("text")))
    val qs = cases.map(c => (c.qid, c.query, s"gold-${c.qid}"))
      .toDF("qid", "query", "gold_id")
      .withColumn("qtok", tokens(col("query")))
    // lexical lane: token-set Jaccard, every query against every doc
    // (query side bounded + broadcast; corpus side scans once)
    val scored = docs.crossJoin(broadcast(qs))
      .withColumn("inter", size(array_intersect(col("dtok"), col("qtok"))))
      .withColumn("uni", size(array_union(col("dtok"), col("qtok"))))
      .withColumn("score", col("inter").cast("double") / col("uni"))
      .select("qid", "gold_id", "doc_id", "code", "score")

    val byRank = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("doc_id"))
    def coverage(ranked: DataFrame): Double = {
      val hits = ranked.withColumn("rk", row_number().over(byRank))
        .filter(col("rk") <= k && col("doc_id") === col("gold_id"))
        .select("qid").distinct().count()
      hits.toDouble / cases.size
    }

    val direct = coverage(scored)
    val bridgeTop = scored.withColumn("rk", row_number().over(byRank))
      .filter(col("rk") <= k &&
        col("doc_id") === concat(lit("bridge-"), col("qid")))
      .select("qid").distinct().count().toDouble / cases.size

    // reconstruct: top-k seeds, follow their entity codes one hop,
    // linked docs inherit the seed score damped; union + re-rank
    val seeds = scored.withColumn("rk", row_number().over(byRank))
      .filter(col("rk") <= k)
    val linked = seeds.filter(col("code").isNotNull).alias("s")
      .join(corpus(spark).alias("n"), Seq("code"))
      .filter(col("n.doc_id") =!= col("s.doc_id"))
      .select(col("s.qid").as("qid"), col("s.gold_id").as("gold_id"),
        col("n.doc_id").as("doc_id"), col("n.code").as("code"),
        (col("s.score") * 0.9).as("score"))
    val expanded = seeds.select("qid", "gold_id", "doc_id", "code", "score")
      .unionByName(linked)
      .groupBy("qid", "gold_id", "doc_id")
      .agg(max(col("score")).as("score"), first(col("code")).as("code"))
    val reconstruct = coverage(expanded)

    Coverage(direct, reconstruct, bridgeTop)
  }
}
