package graft

/** Original 45-record longmemeval_m-STYLE retrieval-quality fixture
  * (same shape as the reference's bundled slice — 45 rows of
  * (id, conversation, turn, content, gold query) across 9 multi-turn
  * conversations — but authored from scratch for this repo; the
  * reference fixture is its own dataset and is not copied).
  *
  * Protocol mirrored from bench/RESULTS.md: seed the full corpus, run
  * every record's query against it, gold-document retrieval — the
  * query's own record is the gold hit; recall@k / MRR over the ranks.
  */
object LongMemFixture {

  final case class Rec(id: String, conv: String, turn: Int,
      content: String, query: String)

  val records: Seq[Rec] = Seq(
    Rec("c01-t1", "c01", 1, "Patient notes migraines recurring every thursday afternoon for six weeks", "how often do the migraines recur"),
    Rec("c01-t2", "c01", 2, "Ferritin level measured at 9 nanograms per milliliter, well under the reference floor", "what was the ferritin level"),
    Rec("c01-t3", "c01", 3, "Prescribed sumatriptan 50 milligram at headache onset, max two doses daily", "what dose of sumatriptan was prescribed"),
    Rec("c01-t4", "c01", 4, "Patient reports caffeine intake of five espressos daily, mostly after lunch", "how many espressos does the patient drink"),
    Rec("c01-t5", "c01", 5, "Followup scheduled in eight weeks with repeat iron panel and headache diary", "when is the followup visit scheduled"),
    Rec("c02-t1", "c02", 1, "Checkout latency spiked to 900 milliseconds after the friday canary deploy", "what did checkout latency spike to"),
    Rec("c02-t2", "c02", 2, "Rollback restored p99 to 180 milliseconds within eleven minutes", "what did p99 return to after rollback"),
    Rec("c02-t3", "c02", 3, "Root cause was an unindexed join in the coupon eligibility service", "what was the root cause of the incident"),
    Rec("c02-t4", "c02", 4, "Added covering index on coupon_id and shopper_id, verified with explain", "which columns got the covering index"),
    Rec("c02-t5", "c02", 5, "Postmortem assigned alerting gap action item to the payments oncall rotation", "who owns the alerting gap action item"),
    Rec("c03-t1", "c03", 1, "Flight to Lisbon departs march twelfth at seven forty from gate b22", "when does the lisbon flight depart"),
    Rec("c03-t2", "c03", 2, "Hotel in Alfama booked for four nights with rooftop terrace view", "how many nights is the alfama hotel booked"),
    Rec("c03-t3", "c03", 3, "Day trip to Sintra planned by train from rossio station", "how do we get to sintra"),
    Rec("c03-t4", "c03", 4, "Dinner reservation at a fado house in Bairro Alto for saturday", "where is the saturday dinner reservation"),
    Rec("c03-t5", "c03", 5, "Travel insurance covers trip cancellation up to three thousand euros", "how much cancellation does insurance cover"),
    Rec("c04-t1", "c04", 1, "Sourdough starter doubles in five hours at room temperature after feeding", "how long until the starter doubles"),
    Rec("c04-t2", "c04", 2, "Final dough hydration is seventy eight percent with ten percent whole rye", "what is the dough hydration percent"),
    Rec("c04-t3", "c04", 3, "Bulk fermentation ran four hours with coil folds every forty five minutes", "how long was bulk fermentation"),
    Rec("c04-t4", "c04", 4, "Baked in dutch oven at 250 celsius lid on for twenty minutes", "what temperature was the dutch oven"),
    Rec("c04-t5", "c04", 5, "Crumb came out open with a slightly gummy band near the base", "how did the crumb turn out"),
    Rec("c05-t1", "c05", 1, "Emergency fund target set at six months of expenses in a money market", "what is the emergency fund target"),
    Rec("c05-t2", "c05", 2, "Employer matches fifty percent of 401k contributions up to eight percent", "what is the employer 401k match"),
    Rec("c05-t3", "c05", 3, "Refinanced the mortgage at five point one percent for twenty years", "what rate was the mortgage refinanced at"),
    Rec("c05-t4", "c05", 4, "Vanguard index allocation is eighty twenty stocks to bonds rebalanced yearly", "what is the stock bond allocation"),
    Rec("c05-t5", "c05", 5, "College savings uses a 529 plan funded two hundred monthly", "how much goes to the 529 monthly"),
    Rec("c06-t1", "c06", 1, "Tomato seedlings started indoors under grow lights in late february", "when were tomato seedlings started"),
    Rec("c06-t2", "c06", 2, "Raised beds amended with three inches of compost and worm castings", "what was added to the raised beds"),
    Rec("c06-t3", "c06", 3, "Drip irrigation runs twenty minutes at dawn three times weekly", "how often does drip irrigation run"),
    Rec("c06-t4", "c06", 4, "Aphids on the kale controlled with neem oil spray at dusk", "how were the aphids controlled"),
    Rec("c06-t5", "c06", 5, "First zucchini harvest yielded nine fruits averaging 300 grams", "how many zucchini in the first harvest"),
    Rec("c07-t1", "c07", 1, "Saturn's rings tilt toward edge on view reaching minimum in march", "when do saturns rings reach minimum tilt"),
    Rec("c07-t2", "c07", 2, "New eight inch dobsonian resolves cassini division on steady nights", "what can the dobsonian resolve"),
    Rec("c07-t3", "c07", 3, "Bortle class four skies at the club's dark site near the reservoir", "what bortle class is the dark site"),
    Rec("c07-t4", "c07", 4, "Perseid meteor shower peaks august twelfth with sixty per hour expected", "when does the perseid shower peak"),
    Rec("c07-t5", "c07", 5, "Astrophotography stack used ninety exposures of thirty seconds each", "how many exposures were stacked"),
    Rec("c08-t1", "c08", 1, "Opened with the caro kann against the club champion and held a draw", "which opening was played against the champion"),
    Rec("c08-t2", "c08", 2, "Blundered a knight on move twenty three in time trouble", "what was blundered in time trouble"),
    Rec("c08-t3", "c08", 3, "Rating climbed to 1845 after the weekend rapid tournament", "what did the rating climb to"),
    Rec("c08-t4", "c08", 4, "Studying rook endgames from the lucena and philidor positions", "which endgame positions are being studied"),
    Rec("c08-t5", "c08", 5, "Next round pairing is against a 1920 rated fide master student", "who is the next round pairing against"),
    Rec("c09-t1", "c09", 1, "Deadlift worked up to 140 kilograms for a double at rpe eight", "what was the deadlift top set"),
    Rec("c09-t2", "c09", 2, "Zone two cardio three mornings weekly for forty five minutes", "how much zone two cardio weekly"),
    Rec("c09-t3", "c09", 3, "Left knee niggle flagged during lunges, swapped to split squats", "which exercise replaced lunges"),
    Rec("c09-t4", "c09", 4, "Protein target set at 160 grams using greek yogurt and lentils", "what is the daily protein target"),
    Rec("c09-t5", "c09", 5, "Deload week programmed every fifth week at sixty percent volume", "how often is the deload week"))
}
