package graft.api

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** P7 — the orientation cache as a MAINTAINED store (reference:
  * query/orientation_cache.rs:93-739): recalled content is distilled
  * into per-namespace (key → entry) maps, each recall batch UPSERTS
  * into the map (freq bump + last_seen refresh, merge_into at
  * orientation_cache.rs:449-469), and the Evictor drops the
  * lowest-priority entries until the map fits the token budget
  * (evict_to_budget at orientation_cache.rs:481-521,
  * priority = freq × recency × size-penalty at :471-479).
  *
  * Spark-first re-design: every pass is a Column-expression transform —
  * distillation is one explode+groupBy, the upsert is one full-outer
  * join, and the reference's drop-one-at-a-time eviction loop collapses
  * to a single window pass: token estimates never change while the loop
  * runs, so the dropped set is exactly the maximal prefix of the
  * priority-ascending order whose pre-drop remaining total still
  * exceeds the budget. One shuffle per pass, keyed by namespace — at
  * 100 TB the state is tiny relative to the corpus (vocabulary-bounded)
  * and every operation streams the corpus side once.
  *
  * Divergence noted: the reference distiller extracts entities /
  * UPPER_SNAKE constants / fenced schemas from prose; the corpus here
  * is lowercase token soup, so the distiller keys on informative
  * tokens (≥3 chars, non-stopword) and freq counts occurrences per
  * batch rather than once per distilled list entry.
  */
object OrientationCache {

  /** Reference DEFAULT_TOKEN_BUDGET (orientation_cache.rs:79). */
  val DefaultBudget = 512

  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Reference estimate_tokens (orientation_cache.rs:86): ~4 chars per
    * token, minimum 1. */
  def estTokens(s: Column): Column =
    greatest(ceil(length(s).cast("double") / 4.0).cast("long"), lit(1L))

  /** Distill a batch of recalled rows into upsert items:
    * (namespace, key, value, occ). */
  def distill(hits: DataFrame, namespace: Column, text: Column): DataFrame =
    hits.select(namespace.as("namespace"), explode(TextOps.tokens(text)).as("key"))
      .filter(length(col("key")) >= 3 && !col("key").isin(StopWords.map(lit): _*))
      .groupBy("namespace", "key")
      .agg(count(lit(1)).as("occ"))
      .withColumn("value", col("key"))

  /** merge_into: full-outer merge of the current state with a distilled
    * batch at `nowUnix` — existing entries bump freq and refresh
    * last_seen, new entries start fresh, untouched entries carry over. */
  def upsert(state: DataFrame, batch: DataFrame, nowUnix: Long): DataFrame =
    state.select("namespace", "key", "freq", "last_seen", "value")
      .join(batch.select(col("namespace"), col("key"), col("occ"),
          col("value").as("new_value")),
        Seq("namespace", "key"), "full_outer")
      .select(col("namespace"), col("key"),
        (coalesce(col("freq"), lit(0L)) + coalesce(col("occ"), lit(0L))).as("freq"),
        when(col("occ").isNotNull, lit(nowUnix)).otherwise(col("last_seen"))
          .as("last_seen"),
        coalesce(col("new_value"), col("value")).as("value"))
      .withColumn("tokens", estTokens(concat(col("key"), lit(": "), col("value"))))

  /** evict_to_budget in closed form. The reference loop drops the
    * single lowest-priority entry and re-checks the total; since
    * per-entry token estimates are loop-invariant, entry i (in
    * priority-ascending order, key-ascending on ties — the BTreeMap
    * iteration order of the reference's stable sort) is dropped iff
    * the remaining total before considering it, total − Σ tokens of
    * already-dropped entries, still exceeds the budget. */
  def evict(state: DataFrame, budget: Int, nowUnix: Long): DataFrame = {
    // age clamps at 0 (the reference's saturating_sub) — an entry seen
    // "after" now must not blow up the recency denominator
    val recency = lit(1.0) /
      (lit(1.0) +
        greatest(lit(nowUnix) - col("last_seen"), lit(0L)).cast("double") / 86400.0)
    val penalty = greatest(lit(1.0) - col("tokens").cast("double") / budget, lit(0.05))
    val ns = Window.partitionBy(col("namespace"))
    val byPri = ns.orderBy(col("priority").asc, col("key").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    state.withColumn("priority", col("freq").cast("double") * recency * penalty)
      .withColumn("total", sum(col("tokens")).over(ns))
      .withColumn("prevcum", coalesce(sum(col("tokens")).over(byPri), lit(0L)))
      .filter(col("total") - col("prevcum") <= budget)
      .drop("priority", "total", "prevcum")
  }
}
