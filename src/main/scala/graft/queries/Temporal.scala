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

  val all: Seq[QueryDef] = Seq(q1)
}
