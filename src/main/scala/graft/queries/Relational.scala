package graft.queries

import graft.Tables
import graft.functions.HashChain
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core operators over the TPC-H-ish testdata, one per SURVEY
  * §2 shape: pushdown filter + top-k (S6), broadcast/semi/anti joins
  * (J1/J2/S5), latest-per-group (W2/S15), running-sum evidence budget
  * (W3/P2), reciprocal-rank fusion (R7/A1), hash-chain window (W4/X1/X2),
  * bitemporal as-of join (J6/T3), rank-per-group top-k (W1).
  *
  * Scale notes: joins to `nation`/`region`/small dims are explicitly
  * broadcast; the per-key windows (chains, budgets, latest) partition by
  * high-cardinality keys (custkey/user_id), so at 100 TB each window is
  * shuffle-once and embarrassingly parallel across keys. Aggregations are
  * partial (map-side combine) by construction.
  */
object Relational extends QueryGroup {

  // money columns arrive as doubles; all sums go through exact decimal so
  // the DuckDB comparison is bit-identical regardless of accumulation order
  private val M = "decimal(12,2)" // money: < 1e10
  private val R = "decimal(4,2)"  // rates: discount/tax in [0, 1)

  private val q1 = QueryDef(
    "a1_pricing_summary",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
      val price = col("l_extendedprice").cast(M)
      val disc = col("l_discount").cast(R)
      val tax = col("l_tax").cast(R)
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(M)).cast("double").as("sum_qty"),
          sum(price).cast("double").as("sum_base_price"),
          sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
          sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
          (sum(col("l_quantity").cast(M)).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(price).cast("double") / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1999-12-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  private val q2 = QueryDef(
    "s6_filter_topk",
    (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "O" &&
          col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_totalprice") > 100000.0 &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      FROM orders
      WHERE o_orderstatus = 'O' AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_totalprice > 100000.0 AND o_orderpriority IN ('1-URGENT','2-HIGH')
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 100"""))

  private val q3 = QueryDef(
    "j2_broadcast_join_agg",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val revenue = col("l_extendedprice").cast(M) * (lit(1) - col("l_discount").cast(R))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(sum(revenue).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""))

  private val q4 = QueryDef(
    "j1_semi_join",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000.0)
      c.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      ORDER BY c_custkey"""))

  private val q5 = QueryDef(
    "j5_anti_join",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  private val q6 = QueryDef(
    "w2_latest_per_group",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_custkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders)
      WHERE rn = 1
      ORDER BY o_custkey"""))

  private val q7 = QueryDef(
    "w3_running_budget",
    (s, dir) => {
      // evidence-budget semantics (P2): greedy prefix per customer in
      // chronological order; a row is kept iff the spend BEFORE it is
      // still under budget (so the first crossing row is included).
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.orders(s, dir)
        .withColumn("spent_before",
          coalesce(sum(col("o_totalprice").cast(M)).over(w), lit(0).cast(M)))
        .filter(col("spent_before") < 300000.0)
        .select(col("o_custkey"), col("o_orderkey"),
          col("spent_before").cast("double").as("spent_before"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, CAST(spent_before AS DOUBLE) AS spent_before
      FROM (SELECT o_custkey, o_orderkey,
                   COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS spent_before
            FROM orders)
      WHERE spent_before < 300000.0
      ORDER BY o_custkey, o_orderkey"""))

  private val q8 = QueryDef(
    "r7_rrf_fusion",
    (s, dir) => {
      // two ranked lanes over the event stream — "importance" (value desc)
      // and "recency" (ts desc) — fused by reciprocal-rank fusion with the
      // reference's k=60 (query/retrieval.rs:7-29).
      // top-k-then-rank: TakeOrderedAndProject trims each lane to 200 rows
      // BEFORE the rank window, so the global window never sees the full
      // table — the scalable formulation of "rank within lane".
      val ev = Tables.events(s, dir)
      val laneVal = ev.orderBy(col("value").desc, col("event_id")).limit(200)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("value").desc, col("event_id"))))
        .select("event_id", "rank")
      val laneRec = ev.orderBy(col("ts").desc, col("event_id")).limit(200)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("ts").desc, col("event_id"))))
        .select("event_id", "rank")
      laneVal.unionAll(laneRec)
        .groupBy("event_id")
        .agg(round(sum(lit(1.0) / (col("rank") + 60)), 6).as("rrf_score"),
          count(lit(1)).as("n_lanes"))
        .orderBy(col("rrf_score").desc, col("event_id"))
        .limit(50)
    },
    Some("""
      WITH lane_val AS (
        SELECT event_id, ROW_NUMBER() OVER (ORDER BY value DESC, event_id) AS rank
        FROM events QUALIFY rank <= 200),
      lane_rec AS (
        SELECT event_id, ROW_NUMBER() OVER (ORDER BY ts DESC, event_id) AS rank
        FROM events QUALIFY rank <= 200),
      lanes AS (SELECT * FROM lane_val UNION ALL SELECT * FROM lane_rec)
      SELECT event_id, ROUND(SUM(CAST(1.0 AS DOUBLE) / (rank + 60)), 6) AS rrf_score,
             COUNT(*) AS n_lanes
      FROM lanes GROUP BY event_id
      ORDER BY rrf_score DESC, event_id
      LIMIT 50"""))

  private val q9 = QueryDef(
    "w4_hash_chain",
    (s, dir) => {
      val chained = HashChain.buildChain(
        Tables.events(s, dir),
        hashInput = Seq(col("event_id").cast("string"), col("event_type"),
          col("user_id").cast("string")),
        partitionCols = Seq(col("user_id")),
        orderCols = Seq(col("ts"), col("event_id")))
      chained
        .select(col("user_id"), col("event_id"), col("content_hash"),
          coalesce(col("prev_hash"), lit("")).as("prev_hash"), col("chain_hash"))
        .orderBy("user_id", "event_id")
    },
    Some("""
      SELECT user_id, event_id, content_hash,
             COALESCE(prev_hash, '') AS prev_hash,
             sha256(content_hash || COALESCE(prev_hash, '')) AS chain_hash
      FROM (SELECT user_id, event_id,
                   sha256(CAST(event_id AS VARCHAR) || chr(1) || event_type || chr(1) || CAST(user_id AS VARCHAR)) AS content_hash,
                   LAG(sha256(CAST(event_id AS VARCHAR) || chr(1) || event_type || chr(1) || CAST(user_id AS VARCHAR)))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_hash
            FROM events)
      ORDER BY user_id, event_id"""))

  private val q10 = QueryDef(
    "j6_asof_join",
    (s, dir) => {
      // bitemporal as-of shape (T3/J6): each order is "valid" from its
      // orderdate until the customer's next order; pick the row valid at T.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val t = lit("1998-06-01").cast("timestamp")
      Tables.orders(s, dir)
        .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
        .filter(col("o_orderdate") <= t &&
          (col("valid_to").isNull || col("valid_to") > t))
        .select("o_custkey", "o_orderkey", "o_orderdate", "valid_to")
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate, valid_to
      FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                   LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS valid_to
            FROM orders)
      WHERE o_orderdate <= TIMESTAMP '1998-06-01'
        AND (valid_to IS NULL OR valid_to > TIMESTAMP '1998-06-01')
      ORDER BY o_custkey, o_orderkey"""))

  private val q11 = QueryDef(
    "w1_topk_per_group",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("o_custkey", "rank", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rank")
    },
    Some("""
      SELECT o_custkey, rank, o_orderkey, o_totalprice
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey) AS rank
            FROM orders)
      WHERE rank <= 3
      ORDER BY o_custkey, rank"""))

  private val q12 = QueryDef(
    "j9_asof_event",
    (s, dir) => {
      // per-row as-of join (the multi-probe generalization of J6): each
      // purchase event is matched to the user's latest view event at or
      // before its timestamp. Implemented as the union+window merge —
      // tag both streams, sort within user, carry the last build row
      // forward — which is ONE shuffle on the user key and a linear
      // window pass; the naive formulation is an O(n·m) theta join that
      // Spark can only execute as a nested loop. Builds sort before
      // probes at equal ts (kind 0 < 1), so "at or before" is exact.
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"),
          lit(0).as("kind"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"),
          lit(1).as("kind"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      views.unionAll(purchases)
        .withColumn("bld",
          last(when(col("kind") === 0,
            struct(col("event_id"), col("value"))), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"),
          coalesce(col("bld.event_id"), lit(-1L)).as("view_id"),
          round(coalesce(col("bld.value"), lit(0.0)), 6).as("view_value"))
        .orderBy("event_id")
    },
    Some("""
      WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tsu FROM events),
      tagged AS (
        SELECT user_id, tsu, event_id, value, 0 AS kind FROM e WHERE event_type = 'view'
        UNION ALL
        SELECT user_id, tsu, event_id, value, 1 AS kind FROM e WHERE event_type = 'purchase'),
      m AS (
        SELECT *,
          last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY tsu, kind, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_id,
          last_value(CASE WHEN kind = 0 THEN value END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY tsu, kind, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_value
        FROM tagged)
      SELECT event_id, user_id,
             COALESCE(view_id, -1) AS view_id,
             ROUND(COALESCE(view_value, 0.0), 6) AS view_value
      FROM m WHERE kind = 1
      ORDER BY event_id"""))

  private val q13 = QueryDef(
    "w6_delta_budget",
    (s, dir) => {
      // Δ-impact evidence scorer (the reference's pluggable second
      // EvidenceScorer, query/evidence.rs:195-262): each candidate is
      // scored by its MARGINAL NOVELTY — the fraction of its distinct
      // tokens not already contributed by any earlier-ranked candidate —
      // scaled by its retrieval score; the budget keeps the greedy prefix
      // whose running score-sum is below the sufficiency threshold (first
      // crossing row included, w3's convention), under a hard cap of 10.
      // Because select_within_budget selects every examined candidate
      // until it stops, "already selected" == "earlier rank", so the
      // sequential loop relationalizes exactly: token first-appearance
      // rank via a per-(group, token) min window, novelty via one
      // aggregate. Scores are 6-dp-rounded then accumulated in exact
      // decimal so the crossing point is engine-independent.
      import graft.functions.TextOps
      val M6 = "decimal(18,6)"
      val wRel = Window.partitionBy(col("qgroup"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      val cand = Tables.documents(s, dir)
        .withColumn("qgroup", col("doc_id") % 8)
        .withColumn("rn", row_number().over(wRel))
        .filter(col("rn") <= 20)
        .withColumn("retrieval_score",
          round(lit(1.0) / (lit(1.0) + lit(0.25) * (col("rn") - 1)), 6))
        .select(col("qgroup"), col("rn"), col("doc_id"), col("retrieval_score"),
          col("text"))
      val tok = cand.select(col("qgroup"), col("rn"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
      val firstSeen = tok.withColumn("first_rn",
        min(col("rn")).over(Window.partitionBy(col("qgroup"), col("tok"))))
      val novelty = firstSeen.groupBy("qgroup", "rn")
        .agg((sum(when(col("first_rn") === col("rn"), 1).otherwise(0)).cast("double")
          / count(lit(1))).as("novelty"))
      val scored = cand.join(novelty, Seq("qgroup", "rn"), "left")
        .withColumn("score",
          round(coalesce(col("novelty"), lit(0.0)) * col("retrieval_score"), 6).cast(M6))
      val wCum = Window.partitionBy(col("qgroup")).orderBy(col("rn"))
        .rowsBetween(Window.unboundedPreceding, -1)
      scored
        .withColumn("cum_before", coalesce(sum(col("score")).over(wCum), lit(0).cast(M6)))
        .filter(col("cum_before") < 1.5 && col("rn") <= 10)
        .select(col("qgroup"), col("rn"), col("doc_id"),
          col("score").cast("double").as("score"),
          col("cum_before").cast("double").as("cum_before"))
        .orderBy("qgroup", "rn")
    },
    Some("""
      WITH cand0 AS (
        SELECT doc_id, doc_id % 8 AS qgroup,
               ROW_NUMBER() OVER (PARTITION BY doc_id % 8
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               list_distinct(list_filter(
                 regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                 x -> len(x) > 0)) AS toks
        FROM documents),
      cand AS (
        SELECT *, ROUND(CAST(1.0 AS DOUBLE)
          / (CAST(1.0 AS DOUBLE) + CAST(0.25 AS DOUBLE) * (rn - 1)), 6) AS retrieval_score
        FROM cand0 WHERE rn <= 20),
      tok AS (SELECT qgroup, rn, unnest(toks) AS tok FROM cand),
      firstseen AS (
        SELECT qgroup, rn, tok,
               MIN(rn) OVER (PARTITION BY qgroup, tok) AS first_rn
        FROM tok),
      novelty AS (
        SELECT qgroup, rn,
               CAST(SUM(CASE WHEN first_rn = rn THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS novelty
        FROM firstseen GROUP BY qgroup, rn),
      scored AS (
        SELECT c.qgroup, c.rn, c.doc_id,
               CAST(ROUND(COALESCE(n.novelty, 0.0) * c.retrieval_score, 6)
                 AS DECIMAL(18,6)) AS score
        FROM cand c LEFT JOIN novelty n ON c.qgroup = n.qgroup AND c.rn = n.rn),
      budget AS (
        SELECT qgroup, rn, doc_id, score,
               COALESCE(SUM(score) OVER (PARTITION BY qgroup ORDER BY rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 CAST(0 AS DECIMAL(18,6))) AS cum_before
        FROM scored)
      SELECT qgroup, rn, doc_id, CAST(score AS DOUBLE) AS score,
             CAST(cum_before AS DOUBLE) AS cum_before
      FROM budget
      WHERE cum_before < 1.5 AND rn <= 10
      ORDER BY qgroup, rn"""))

  val all: Seq[QueryDef] =
    Seq(q1, q2, q3, q4, q5, q6, q7, q8, q9, q10, q11, q12, q13)
}
