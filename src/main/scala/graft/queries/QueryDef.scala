package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Contract notes (driver compare):
  *  - output column names must match the oracle exactly;
  *  - every query ends with a total ORDER BY (unique tie-break), so row
  *    order is deterministic in both engines;
  *  - money/count aggregates are computed in exact decimal then cast to
  *    double; transcendental scores are rounded to 6 dp — so the value
  *    hash matches bit-for-bit.
  *
  * CACHE LIFECYCLE: several builders (`d2`-`d4`, `d6`, `d9`-`d12`,
  * `pl12`-`pl16`, ...) `.cache()` a shared intermediate frame that two
  * downstream legs consume — the plan-level fix for recompute-the-
  * expensive-expression regressions. A builder returns a LAZY frame,
  * so it cannot unpersist after "the" action (the caller owns the
  * action, and may run several). The convention instead: cached blocks
  * are session-scoped; harness callers clear between queries
  * (`graft.Bench` calls `spark.catalog.clearCache()` per query and per
  * rep; `graft.Verify` exits per run), and a LONG-LIVED interactive
  * session that invokes many registered queries should do the same —
  * `spark.catalog.clearCache()` — at its own batch boundaries.
  * Storage level is Spark's default MEMORY_AND_DISK, so an uncleared
  * session degrades by LRU eviction, never by OOM.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Sizing for iterated small frames (the CC / label-propagation loops).
  *
  * The edge lists those loops iterate over are orders of magnitude
  * smaller than the corpus that produced them, so running each
  * iteration at full shuffle parallelism wastes scheduler overhead —
  * but a hard-coded constant would serialize a real cluster. Scale
  * with the session's shuffle parallelism instead: 1/8 of
  * `spark.sql.shuffle.partitions`, floored at 4 (= the old local[32]
  * behaviour at the repo's 32-partition test config).
  */
object IterSizing {
  def iterParts(s: SparkSession): Int =
    math.max(4, s.conf.get("spark.sql.shuffle.partitions", "200").toInt / 8)
}

trait QueryGroup {
  def all: Seq[QueryDef]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap
  final def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
