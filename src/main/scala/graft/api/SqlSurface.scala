package graft.api

import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F5 — the pgwire surface's hint-comment dispatch (reference:
  * mnemo-pgwire/src/parser.rs:31-94): a SELECT may carry the SQL
  * comment directives `/*+ orientation_cache */` (v0.4.8) and
  * `/*+ reconstruct */` (v0.5.1). The reference detects them with a
  * case-insensitive contains-match (optional space after the `+`) and
  * routes the query to the corresponding post-processor instead of
  * returning raw rows: `reconstruct` sets `strategy = "reconstruct"`
  * on the underlying request so the response is the belief-state
  * summary of the hits, and `orientation_cache` attaches the
  * orientation-cache config so the response carries per-namespace
  * orientation context.
  *
  * Spark-first shape: the hint never reaches the engine — it is
  * detected and stripped up front, the remaining plain SQL runs
  * through `spark.sql` (full Catalyst optimization, unlike the
  * reference's hand-rolled subset parser), and the dispatch is a
  * DataFrame→DataFrame post-processor over the result:
  *
  *  - `reconstruct` re-uses the r9 belief-state shape (recall.rs:
  *    867-871,1019-1106) with the SQL's own result rows as seeds:
  *    rank-ordered excerpt summary, mean-score confidence, 1-hop
  *    linked-context count against the full `memories` view;
  *  - `orientation_cache` joins each hit's namespace (`source`) to the
  *    per-namespace top-5 informative-token orientation line (the
  *    [[OrientationCache.distill]] distillation) — the map is
  *    vocabulary-bounded per namespace, so the join side is a
  *    broadcast dimension at any corpus size.
  */
object SqlSurface {

  final case class Hints(orientationCache: Boolean, reconstruct: Boolean)

  /** Hint detection — the reference's contains-match semantics
    * (parser.rs:92-94): case-insensitive, space after `+` optional,
    * position in the statement irrelevant. */
  def parseHints(sql: String): Hints = {
    val upper = sql.toUpperCase
    Hints(
      orientationCache = upper.contains("/*+ ORIENTATION_CACHE") ||
        upper.contains("/*+ORIENTATION_CACHE"),
      reconstruct = upper.contains("/*+ RECONSTRUCT") ||
        upper.contains("/*+RECONSTRUCT"))
  }

  /** Remove every `/*+ ... */` block so the remainder is plain SQL
    * (Spark would otherwise only accept hints directly after SELECT,
    * and would warn on unresolved ones). */
  def stripHints(sql: String): String =
    sql.replaceAll("""(?s)/\*\+.*?\*/""", " ")

  /** Execute a pgwire-surface statement with hint dispatch. The
    * `memories` view must be registered (the pgwire server's one
    * table); a `reconstruct` query must select `doc_id`, `source`,
    * `text` and a `score` column — the columns the recall hit list
    * carries into the reconstruction strategy. */
  def run(s: SparkSession, sql: String): DataFrame = {
    val h = parseHints(sql)
    val base = s.sql(stripHints(sql))
    if (h.reconstruct) reconstructOver(s, base)
    else if (h.orientationCache) withOrientation(s, base)
    else base
  }

  /** Belief-state summary of the hit rows (strategy = "reconstruct"):
    * excerpts joined in (score desc, doc_id) order, mean-score
    * confidence, and the count of 1-hop linked context docs (adjacent
    * ids within the same source) — the r9 output contract. */
  private def reconstructOver(s: SparkSession, hits: DataFrame): DataFrame = {
    val d = s.table("memories")
    val seeds = hits.select(col("doc_id"), col("source"), col("score"),
      TextOps.excerpt(col("text"), 30).as("ex"))
    val linked = seeds.alias("s")
      .join(d.alias("n"),
        col("n.source") === col("s.source") &&
          (col("n.doc_id") === col("s.doc_id") + 1 ||
            col("n.doc_id") === col("s.doc_id") - 1))
      .select(col("s.doc_id").as("seed_id"))
      .groupBy("seed_id").agg(count(lit(1)).as("n_linked"))
    seeds.join(linked, col("doc_id") === col("seed_id"), "left")
      .agg(
        concat_ws(" | ",
          transform(
            array_sort(collect_list(struct((-col("score")).as("ns"),
              col("doc_id"), col("ex")))),
            p => p.getField("ex"))).as("belief"),
        round(avg(col("score")), 6).as("confidence"),
        sum(coalesce(col("n_linked"), lit(0L))).as("linked_context"))
  }

  /** Per-namespace orientation line: top-5 informative tokens by
    * (freq desc, token asc) from the distilled full view, attached to
    * every hit row. */
  private def withOrientation(s: SparkSession, hits: DataFrame): DataFrame = {
    val d = s.table("memories")
    val toks = OrientationCache.distill(d, col("source"), col("text"))
    val w = Window.partitionBy(col("namespace")).orderBy(col("occ").desc, col("key"))
    val orient = toks.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy("namespace")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("rn"), col("key")))),
          p => p.getField("key"))).as("orientation"))
    hits.join(broadcast(orient), hits("source") === orient("namespace"), "left")
      .drop("namespace")
  }
}
