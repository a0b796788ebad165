package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher / MassiveText document-filter rule columns (Rae et al.
  * 2021, Appendix A1.1) as ONE shared builder — the single source of
  * the thresholds and the stop-word lexicon, called by BOTH the
  * registered `pl11_gopher_rules` operator and the `pl16_curation_
  * funnel`'s quality stage, so the funnel can never drift from the
  * operator it claims to compose (the round-11 DedupEnrich discipline
  * applied to the quality rules). Threshold provenance and the
  * corpus-appropriate lexicon substitution are documented on pl11. */
object GopherRules {

  /** The shared stop-word lexicon (the pl1/t2 scoring list — see
    * pl11's declared substitution note for why not the paper's own). */
  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Adds the measured statistics (`n_words`, `mean_word_len`,
    * `n_symbols`, `alpha_frac`, `n_stop_hits`), the per-rule verdicts
    * (`r_words`, `r_word_len`, `r_symbol`, `r_alpha`, `r_stop`) and
    * their conjunction (`kept`) to a frame carrying `text` and a bound
    * token-array column `toks`. One narrow projection, no shuffle. */
  def withStats(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val nonEmpty: Column = size(col("toks")) > 0
    // round 19: one native token-stats pass (TokenStatsExpr) replaces
    // the interpreted aggregate-length and rlike-filter lambdas; the
    // kernel's sum_len is Spark length() (numChars) and n_alpha is the
    // rlike("[a-z]") class verbatim (NativeKernelsSpec-pinned), so
    // every derived column is value-identical
    d.withColumn("_gr_ts", ColumnBridge.column(graft.plans.TokenStatsExpr(
        ColumnBridge.expression(col("toks")), IndexedSeq.empty)))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("mean_word_len", when(nonEmpty,
        round(col("_gr_ts.sum_len")
          .cast("double") / col("n_words"), 6)).otherwise(0.0))
      .withColumn("n_symbols", (length(col("text"))
        - length(regexp_replace(col("text"), "[#…]", ""))).cast("long"))
      .withColumn("alpha_frac", when(nonEmpty,
        round(col("_gr_ts.n_alpha").cast("double")
          / col("n_words"), 6)).otherwise(0.0))
      .drop("_gr_ts")
      .withColumn("n_stop_hits", size(array_intersect(
        array_distinct(col("toks")),
        array(StopWords.map(lit): _*))).cast("long"))
      .withColumn("r_words",
        (col("n_words") >= 50 && col("n_words") <= 100000).cast("int"))
      .withColumn("r_word_len",
        (nonEmpty && col("mean_word_len").between(3.0, 10.0)).cast("int"))
      .withColumn("r_symbol",
        (nonEmpty &&
          col("n_symbols").cast("double") / col("n_words") <= 0.1).cast("int"))
      .withColumn("r_alpha", (col("alpha_frac") >= 0.8).cast("int"))
      .withColumn("r_stop", (col("n_stop_hits") >= 2).cast("int"))
      .withColumn("kept", (col("r_words") === 1 && col("r_word_len") === 1 &&
        col("r_symbol") === 1 && col("r_alpha") === 1 &&
        col("r_stop") === 1).cast("int"))
  }
}
