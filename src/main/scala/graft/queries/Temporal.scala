package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Point-in-time semantics (SURVEY T1/T2): soft-delete tombstones are
  * never physically removed, so "state as of T" is a pure predicate —
  * `created <= T AND NOT (deleted <= T)` — and deleted rows remain
  * queryable for audits. The tombstone column is synthesized
  * deterministically (every 7th order is soft-deleted 30 days after
  * creation), making the as-of query fully oracle-checkable.
  */
object Temporal extends QueryGroup {

  private val q1 = QueryDef(
    "t1_asof_pointintime",
    (s, dir) => {
      val t = lit("1997-06-15").cast("timestamp")
      val withTombstone = Tables.orders(s, dir)
        .withColumn("deleted_at",
          when(col("o_orderkey") % 7 === 0,
            col("o_orderdate") + expr("INTERVAL 30 DAYS")))
      withTombstone
        .filter(col("o_orderdate") <= t &&
          !(col("deleted_at").isNotNull && col("deleted_at") <= t))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_live"),
          round(sum(col("o_totalprice").cast("decimal(12,2)")).cast("double"), 2)
            .as("total_value"))
        .orderBy("o_orderstatus")
    },
    Some("""
      WITH t AS (
        SELECT o_orderstatus, o_totalprice, o_orderdate,
               CASE WHEN o_orderkey % 7 = 0
                    THEN o_orderdate + INTERVAL 30 DAY END AS deleted_at
        FROM orders)
      SELECT o_orderstatus, COUNT(*) AS n_live,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_value
      FROM t
      WHERE o_orderdate <= TIMESTAMP '1997-06-15'
        AND NOT (deleted_at IS NOT NULL AND deleted_at <= TIMESTAMP '1997-06-15')
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""))

  private val q2 = QueryDef(
    "t6_reflection_cadence",
    (s, dir) => {
      // coordinated reflection cadence (T6, reflection.rs:56-137): run a
      // pass only if ≥5 new records since the last ReflectionCompleted
      // marker AND ≥24h have elapsed (never-reflected agents gate on
      // volume alone). `signup` events stand in for the completion marker.
      val NowMicros = 1706745600000000L // 2024-02-01T00:00:00Z
      val e = Tables.events(s, dir).filter(col("user_id") < 30)
      val last = e.groupBy("user_id")
        .agg(max(when(col("event_type") === "signup", col("ts"))).as("last_reflect"))
      val counts = e.join(last, "user_id")
        .filter(col("last_reflect").isNull || col("ts") > col("last_reflect"))
        .groupBy("user_id").agg(count(lit(1)).as("n_new"))
      last.join(counts, Seq("user_id"), "left")
        .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
        .withColumn("hours_since", round(
          (lit(NowMicros) - col("last_reflect")).cast("double") / 3.6e9, 6))
        .withColumn("should_run",
          col("n_new") >= 5 &&
            (col("last_reflect").isNull || col("hours_since") >= 24.0))
        .select("user_id", "n_new", "hours_since", "should_run")
        .orderBy("user_id")
    },
    Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu
                 FROM events WHERE user_id < 30),
      last AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'signup' THEN tsu END) AS last_reflect
        FROM e GROUP BY user_id),
      counts AS (
        SELECT e.user_id, COUNT(*) AS n_new
        FROM e JOIN last USING (user_id)
        WHERE last_reflect IS NULL OR tsu > last_reflect
        GROUP BY e.user_id)
      SELECT last.user_id,
             COALESCE(n_new, 0) AS n_new,
             ROUND(CAST(1706745600000000 - last_reflect AS DOUBLE) / 3.6e9, 6) AS hours_since,
             COALESCE(n_new, 0) >= 5
               AND (last_reflect IS NULL
                    OR CAST(1706745600000000 - last_reflect AS DOUBLE) / 3.6e9 >= 24.0)
               AS should_run
      FROM last LEFT JOIN counts USING (user_id)
      ORDER BY last.user_id"""))

  val all: Seq[QueryDef] = Seq(q1, q2)
}
