package graft.queries

import graft.Tables
import graft.api.SqlSurface
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Governance / API-surface operators from SURVEY §2.1/§2.2/§2.4/§2.11:
  * the current-fact resolver (P5), the ACL+delegation permission closure
  * (S13), the pgwire-style SQL entry point (F5 — Spark SQL is a strict
  * superset of the reference's parser, so the "parser" is one
  * `spark.sql` call over a registered view), quarantine replay, the
  * token-budget planner (X13), and the watermark-incremental upsert
  * (S11).
  *
  * Scale design: every permission leg is a join against tiny broadcast
  * dimension tables (acls/delegations), exactly how a 100 TB memories
  * table would check access — the big side streams, never shuffles. The
  * fact resolver and upsert are single-shuffle window passes partitioned
  * by the fact/merge key.
  */
object Governance extends QueryGroup {

  private val NowMicros = 1706745600000000L // 2024-02-01T00:00:00Z
  private val WmMicros = 1705276800000000L // 2024-01-15T00:00:00Z

  /** P5 — current-fact resolver (query/current_fact_resolver.rs:108-180):
    * group hits by fact key, keep the most recent per group (recency
    * desc, tie score desc, then id desc), emit the supersession chain of
    * losers; keyless hits pass through; re-sort by score. */
  private val q1 = QueryDef(
    "p5_current_fact",
    (s, dir) => {
      val hits = Tables.events(s, dir)
        .filter(col("value") > 4.0)
        .withColumn("fact_key",
          when(col("event_type") === "purchase",
            concat(lit("k:"), get_json_object(col("props"), "$.k"))))
      val w = Window.partitionBy(col("fact_key"))
        .orderBy(col("ts").desc, col("value").desc, col("event_id").desc)
      val ranked = hits.filter(col("fact_key").isNotNull)
        .withColumn("rn", row_number().over(w))
      val chains = ranked.groupBy("fact_key").agg(
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_superseded"),
        concat_ws(",",
          transform(
            array_sort(collect_list(when(col("rn").between(2, 4),
              struct(col("rn"), col("event_id").cast("string").as("event_id"))))),
            p => p.getField("event_id"))).as("superseded"))
      val winners = ranked.filter(col("rn") === 1)
        .join(chains, "fact_key")
        .select(col("event_id"), col("fact_key"), col("value").as("score"),
          col("n_superseded"), col("superseded"))
      val keyless = hits.filter(col("fact_key").isNull)
        .select(col("event_id"), col("fact_key"), col("value").as("score"),
          lit(0L).as("n_superseded"), lit("").as("superseded"))
      winners.unionAll(keyless)
        .orderBy(col("score").desc, col("event_id"))
        .limit(100)
    },
    Some("""
      WITH hits AS (
        SELECT event_id, epoch_us(ts) AS tsu, value,
               CASE WHEN event_type = 'purchase'
                    THEN 'k:' || json_extract_string(props, '$.k') END AS fact_key
        FROM events WHERE value > 4.0),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fact_key
                   ORDER BY tsu DESC, value DESC, event_id DESC) AS rn
        FROM hits WHERE fact_key IS NOT NULL),
      chains AS (
        SELECT fact_key,
               CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_superseded,
               COALESCE(string_agg(CASE WHEN rn BETWEEN 2 AND 4
                 THEN CAST(event_id AS VARCHAR) END, ',' ORDER BY rn), '') AS superseded
        FROM ranked GROUP BY fact_key),
      winners AS (
        SELECT r.event_id, r.fact_key, r.value AS score, c.n_superseded, c.superseded
        FROM ranked r JOIN chains c USING (fact_key) WHERE rn = 1),
      keyless AS (
        SELECT event_id, fact_key, value AS score, CAST(0 AS BIGINT) AS n_superseded,
               '' AS superseded
        FROM hits WHERE fact_key IS NULL)
      SELECT * FROM (SELECT * FROM winners UNION ALL SELECT * FROM keyless)
      ORDER BY score DESC, event_id
      LIMIT 100"""))

  /** S13 — permission closure with delegation chain
    * (storage/duckdb.rs:338-426,754-830): accessible = owner ∪ direct
    * grant ∪ grant-to-delegator (depth 1 and 2). The acls/delegations
    * sides are tiny and broadcast; the memories side streams. */
  private val q2 = QueryDef(
    "s13_delegation_chain",
    (s, dir) => {
      val orders = Tables.orders(s, dir)
        .select(col("o_orderkey"), (col("o_custkey") % 100).as("owner"))
      val acl = orders
        .filter(col("o_orderkey") % 11 === 0 && col("o_orderkey") % 13 =!= 0)
        .select(col("o_orderkey"), (col("o_orderkey") % 100).as("principal"))
      val deleg = s.range(100).select(col("id").as("p"))
        .filter(col("p") % 3 === 0 && col("p") % 5 =!= 0)
        .select(col("p").as("dfrom"), ((col("p") * 7 + 1) % 100).as("dto"))
      val ownerLeg = orders.filter(col("owner") < 10)
        .select(col("owner").as("agent"), col("o_orderkey"), lit("owner").as("leg"))
      val directLeg = acl.filter(col("principal") < 10)
        .select(col("principal").as("agent"), col("o_orderkey"), lit("direct").as("leg"))
      val d1Leg = acl.join(broadcast(deleg), col("principal") === col("dfrom"))
        .filter(col("dto") < 10)
        .select(col("dto").as("agent"), col("o_orderkey"), lit("deleg1").as("leg"))
      val d2 = deleg.select(col("dfrom").as("dfrom2"), col("dto").as("dto2"))
      val d2Leg = acl
        .join(broadcast(deleg), col("principal") === col("dfrom"))
        .join(broadcast(d2), col("dto") === col("dfrom2"))
        .filter(col("dto2") < 10)
        .select(col("dto2").as("agent"), col("o_orderkey"), lit("deleg2").as("leg"))
      ownerLeg.unionAll(directLeg).unionAll(d1Leg).unionAll(d2Leg)
        .groupBy("agent")
        .agg(
          countDistinct(when(col("leg") === "owner", col("o_orderkey"))).as("n_owner"),
          countDistinct(when(col("leg") === "direct", col("o_orderkey"))).as("n_direct"),
          countDistinct(when(col("leg") === "deleg1", col("o_orderkey"))).as("n_deleg1"),
          countDistinct(when(col("leg") === "deleg2", col("o_orderkey"))).as("n_deleg2"),
          countDistinct(col("o_orderkey")).as("n_accessible"))
        .orderBy("agent")
    },
    Some("""
      WITH acl AS (
        SELECT o_orderkey, o_orderkey % 100 AS principal
        FROM orders WHERE o_orderkey % 11 = 0 AND o_orderkey % 13 <> 0),
      deleg AS (
        SELECT range AS dfrom, (range * 7 + 1) % 100 AS dto
        FROM range(100) WHERE range % 3 = 0 AND range % 5 <> 0),
      legs AS (
        SELECT o_custkey % 100 AS agent, o_orderkey, 'owner' AS leg
        FROM orders WHERE o_custkey % 100 < 10
        UNION ALL
        SELECT principal, o_orderkey, 'direct' FROM acl WHERE principal < 10
        UNION ALL
        SELECT d.dto, a.o_orderkey, 'deleg1'
        FROM acl a JOIN deleg d ON a.principal = d.dfrom WHERE d.dto < 10
        UNION ALL
        SELECT d2.dto, a.o_orderkey, 'deleg2'
        FROM acl a JOIN deleg d1 ON a.principal = d1.dfrom
        JOIN deleg d2 ON d1.dto = d2.dfrom WHERE d2.dto < 10)
      SELECT agent,
             COUNT(DISTINCT CASE WHEN leg = 'owner' THEN o_orderkey END) AS n_owner,
             COUNT(DISTINCT CASE WHEN leg = 'direct' THEN o_orderkey END) AS n_direct,
             COUNT(DISTINCT CASE WHEN leg = 'deleg1' THEN o_orderkey END) AS n_deleg1,
             COUNT(DISTINCT CASE WHEN leg = 'deleg2' THEN o_orderkey END) AS n_deleg2,
             COUNT(DISTINCT o_orderkey) AS n_accessible
      FROM legs
      GROUP BY agent
      ORDER BY agent"""))

  /** F5 — pgwire SQL surface (crates/mnemo-pgwire/src/parser.rs:9-382):
    * the reference hand-rolls a SELECT/LIKE/LIMIT/OFFSET parser; Spark
    * SQL is a strict superset, so the whole entry point is one
    * `spark.sql` over a registered view. */
  private val q3 = QueryDef(
    "f5_sql_surface",
    (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("memories")
      s.sql("""
        SELECT doc_id AS id, source AS agent_id, lang, n_chars
        FROM memories
        WHERE text LIKE '%the%' AND lang = 'en'
        ORDER BY doc_id
        LIMIT 40 OFFSET 10""")
    },
    Some("""
      SELECT doc_id AS id, source AS agent_id, lang, n_chars
      FROM documents
      WHERE text LIKE '%the%' AND lang = 'en'
      ORDER BY doc_id
      LIMIT 40 OFFSET 10"""))

  /** F5 — pgwire hint dispatch, reconstruct leg (parser.rs:36-42,92-94):
    * `/*+ reconstruct */` in the statement routes the hit rows through
    * the belief-state post-processor ([[graft.api.SqlSurface]]) instead
    * of returning them raw — the r9 output contract seeded by the SQL's
    * own WHERE/ORDER/LIMIT selection. */
  private val q3b = QueryDef(
    "f6_hint_reconstruct",
    (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("memories")
      // 1000e0: Spark parses a bare `1000.0` literal as DECIMAL, which
      // would ride through avg() and render '0.543400' vs the oracle's
      // double '0.5434' — the repo-wide double-at-the-boundary rule.
      SqlSurface.run(s, """
        SELECT /*+ reconstruct */ doc_id, source, text,
               round(n_chars / 1000e0, 6) AS score
        FROM memories
        WHERE lang = 'en' AND text LIKE '%the%'
        ORDER BY score DESC, doc_id
        LIMIT 5""")
    },
    Some("""
      WITH seeds AS (
        SELECT doc_id, source,
               CASE WHEN len(fl) <= 30 THEN fl
                    ELSE substr(fl, 1, 30) || '…' END AS ex,
               round(n_chars / 1000.0, 6) AS score
        FROM (SELECT doc_id, source, n_chars,
                (list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1] AS fl
              FROM documents
              WHERE lang = 'en' AND text LIKE '%the%')
        ORDER BY score DESC, doc_id
        LIMIT 5),
      linked AS (
        SELECT s.doc_id AS seed_id, COUNT(*) AS n_linked
        FROM seeds s JOIN documents n
          ON n.source = s.source AND (n.doc_id = s.doc_id + 1 OR n.doc_id = s.doc_id - 1)
        GROUP BY s.doc_id)
      SELECT string_agg(ex, ' | ' ORDER BY score DESC, doc_id) AS belief,
             ROUND(AVG(score), 6) AS confidence,
             CAST(SUM(COALESCE(n_linked, 0)) AS BIGINT) AS linked_context
      FROM seeds LEFT JOIN linked ON doc_id = seed_id"""))

  /** F5 — pgwire hint dispatch, orientation leg (parser.rs:31-35,92-93):
    * `/*+orientation_cache*/` (no-space variant, exercising the second
    * contains-match) attaches the per-namespace orientation line to
    * every hit row. */
  private val q3c = QueryDef(
    "f7_hint_orientation",
    (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("memories")
      SqlSurface.run(s, """
        SELECT /*+orientation_cache*/ doc_id, source, lang
        FROM memories
        WHERE doc_id % 25 = 0
        ORDER BY doc_id
        LIMIT 20""")
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT source AS namespace,
               unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                 x -> len(x) >= 3)) AS tok
        FROM documents),
      counts AS (
        SELECT namespace, tok, COUNT(*) AS n
        FROM toks
        WHERE tok NOT IN ('the', 'a', 'of', 'and', 'to', 'in')
        GROUP BY namespace, tok),
      top AS (
        SELECT namespace, tok,
               ROW_NUMBER() OVER (PARTITION BY namespace ORDER BY n DESC, tok) AS rn
        FROM counts),
      orient AS (
        SELECT namespace, string_agg(tok, ' ' ORDER BY rn) AS orientation
        FROM top WHERE rn <= 5 GROUP BY namespace),
      hits AS (
        SELECT doc_id, source, lang FROM documents
        WHERE doc_id % 25 = 0 ORDER BY doc_id LIMIT 20)
      SELECT doc_id, source, lang, orientation
      FROM hits LEFT JOIN orient ON source = namespace
      ORDER BY doc_id"""))

  /** replay_quarantine (§2.11): re-evaluate quarantined records against
    * the current policy — single-marker long documents are released,
    * the rest stay quarantined. */
  private val q4 = QueryDef(
    "q1_quarantine_replay",
    (s, dir) => {
      // the replay policy's high-severity subset, composed from the
      // shared x9 constants (Scoring) so the regexes cannot drift
      val markers = Seq(Scoring.MarkerIgnorePrevious,
        Scoring.MarkerSystemPrompt, Scoring.MarkerExfil)
      val nHits = markers
        .map(m => when(lower(col("text")).rlike(m), 1L).otherwise(0L))
        .reduce(_ + _)
      Tables.documents(s, dir)
        .withColumn("n_hits", nHits)
        .filter(col("n_hits") >= 1)
        .withColumn("decision",
          when(col("n_hits") === 1 && col("n_chars") >= 200, "release")
            .otherwise("quarantined"))
        .select("doc_id", "n_hits", "n_chars", "decision")
        .orderBy("doc_id")
    },
    Some(s"""
      WITH scanned AS (
        SELECT doc_id, n_chars,
               CAST((CASE WHEN regexp_matches(lower(text), '${Scoring.MarkerIgnorePrevious}') THEN 1 ELSE 0 END)
                  + (CASE WHEN regexp_matches(lower(text), '${Scoring.MarkerSystemPrompt}') THEN 1 ELSE 0 END)
                  + (CASE WHEN regexp_matches(lower(text), '${Scoring.MarkerExfil}') THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
        FROM documents)
      SELECT doc_id, n_hits, n_chars,
             CASE WHEN n_hits = 1 AND n_chars >= 200 THEN 'release'
                  ELSE 'quarantined' END AS decision
      FROM scanned
      WHERE n_hits >= 1
      ORDER BY doc_id"""))

  /** X13 — token-budget planner (budget/planner.rs:1-215): per-model
    * context budget → per-lane token allocation; pure arithmetic over a
    * literal model table. */
  private val q5 = QueryDef(
    "x13_budget_plan",
    (s, dir) => {
      import s.implicits._
      Seq(("m8k", 8192L), ("m32k", 32768L), ("m128k", 131072L), ("m200k", 200000L))
        .toDF("model", "ctx")
        .withColumn("budget", col("ctx") - 3072L)
        .withColumn("evidence",
          least(floor(col("budget") / 2.0).cast("long"), lit(4096L)))
        .withColumn("semantic_toks", floor(col("evidence") * 0.5).cast("long"))
        .withColumn("lexical_toks", floor(col("evidence") * 0.3).cast("long"))
        .withColumn("graph_toks",
          col("evidence") - col("semantic_toks") - col("lexical_toks"))
        .select("model", "ctx", "budget", "evidence",
          "semantic_toks", "lexical_toks", "graph_toks")
        .orderBy("model")
    },
    Some("""
      WITH m AS (
        SELECT * FROM (VALUES ('m8k', CAST(8192 AS BIGINT)), ('m32k', 32768),
                              ('m128k', 131072), ('m200k', 200000)) AS t(model, ctx)),
      plan AS (
        SELECT model, ctx, ctx - 3072 AS budget,
               LEAST(CAST(FLOOR((ctx - 3072) / 2.0) AS BIGINT), 4096) AS evidence
        FROM m)
      SELECT model, ctx, budget, evidence,
             CAST(FLOOR(evidence * 0.5) AS BIGINT) AS semantic_toks,
             CAST(FLOOR(evidence * 0.3) AS BIGINT) AS lexical_toks,
             evidence - CAST(FLOOR(evidence * 0.5) AS BIGINT)
                      - CAST(FLOOR(evidence * 0.3) AS BIGINT) AS graph_toks
      FROM plan
      ORDER BY model"""))

  /** S11 — watermark-incremental sync + upsert (list_memories_since /
    * upsert_memory, storage/duckdb.rs:714-740): latest-per-key snapshots
    * either side of the watermark, full-outer merged and classified —
    * the read/compute side of a `MERGE INTO`. */
  private val q6 = QueryDef(
    "s11_watermark_upsert",
    (s, dir) => {
      val e = Tables.events(s, dir)
      def latest(df: org.apache.spark.sql.DataFrame) = {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts").desc, col("event_id").desc)
        df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id"))
      }
      val base = latest(e.filter(col("ts") <= WmMicros))
        .withColumnRenamed("event_id", "base_id")
      val incr = latest(e.filter(col("ts") > WmMicros))
        .withColumnRenamed("event_id", "incr_id")
      base.join(incr, Seq("user_id", "event_type"), "full_outer")
        .withColumn("class",
          when(col("base_id").isNull, "insert")
            .when(col("incr_id").isNull, "unchanged")
            .otherwise("update"))
        .groupBy("event_type")
        .agg(
          sum(when(col("class") === "insert", 1L).otherwise(0L)).as("n_insert"),
          sum(when(col("class") === "update", 1L).otherwise(0L)).as("n_update"),
          sum(when(col("class") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"),
          count(lit(1)).as("n_keys"))
        .orderBy("event_type")
    },
    Some("""
      WITH base AS (
        SELECT user_id, event_type, event_id FROM (
          SELECT user_id, event_type, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE epoch_us(ts) <= 1705276800000000)
        WHERE rn = 1),
      incr AS (
        SELECT user_id, event_type, event_id FROM (
          SELECT user_id, event_type, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE epoch_us(ts) > 1705276800000000)
        WHERE rn = 1),
      merged AS (
        SELECT COALESCE(b.event_type, i.event_type) AS event_type,
               CASE WHEN b.event_id IS NULL THEN 'insert'
                    WHEN i.event_id IS NULL THEN 'unchanged'
                    ELSE 'update' END AS class
        FROM base b FULL OUTER JOIN incr i
          ON b.user_id = i.user_id AND b.event_type = i.event_type)
      SELECT event_type,
             CAST(SUM(CASE WHEN class = 'insert' THEN 1 ELSE 0 END) AS BIGINT) AS n_insert,
             CAST(SUM(CASE WHEN class = 'update' THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
             CAST(SUM(CASE WHEN class = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
             COUNT(*) AS n_keys
      FROM merged
      GROUP BY event_type
      ORDER BY event_type"""))

  /** S22 — markdown/git working-set sync (crates/mnemo-md-sync/src/lib.rs,
    * parser.rs): parse each document into fixed blocks, hash per block,
    * roll up a content hash, and three-way diff the remote snapshot
    * against the previous local working set (simulated deterministically:
    * every 97th doc is new, every 5th was edited). The parse+hash is a
    * narrow per-row projection; the diff is one equi-join on doc id. */
  private val q7 = QueryDef(
    "s22_workingset_diff",
    (s, dir) => {
      import graft.functions.TextOps
      def blocksOf(toks: org.apache.spark.sql.Column) = {
        val nblk = floor((size(toks) + 19) / 20).cast("int")
        when(size(toks) > 0,
          transform(sequence(lit(0), nblk - 1), i =>
            md5(concat_ws(" ", slice(toks, i * 20 + 1, lit(20))))))
          .otherwise(array().cast("array<string>"))
      }
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      val remote = d
        .withColumn("blocks", blocksOf(col("toks")))
        .select(col("doc_id"), size(col("blocks")).cast("long").as("n_blocks"),
          md5(concat_ws(",", col("blocks"))).as("rh"))
      val local = d.filter(col("doc_id") % 97 =!= 0)
        .withColumn("ltoks",
          when(col("doc_id") % 5 === 0, slice(col("toks"), lit(2), size(col("toks"))))
            .otherwise(col("toks")))
        .withColumn("blocks", blocksOf(col("ltoks")))
        .select(col("doc_id"), md5(concat_ws(",", col("blocks"))).as("lh"))
      remote.join(local, Seq("doc_id"), "left")
        .withColumn("status",
          when(col("lh").isNull, "new")
            .when(col("rh") =!= col("lh"), "changed")
            .otherwise("unchanged"))
        .select("doc_id", "n_blocks", "status")
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS toks
        FROM documents),
      remote AS (
        SELECT doc_id,
               CASE WHEN len(toks) > 0
                 THEN list_transform(generate_series(0, CAST(CEIL(len(toks) / 20.0) AS BIGINT) - 1),
                        i -> md5(array_to_string(list_slice(toks, i * 20 + 1, i * 20 + 20), ' ')))
                 ELSE []::VARCHAR[] END AS blocks
        FROM t),
      r AS (SELECT doc_id, len(blocks) AS n_blocks,
                   md5(array_to_string(blocks, ',')) AS rh FROM remote),
      lt AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN list_slice(toks, 2, len(toks)) ELSE toks END AS toks
        FROM t WHERE doc_id % 97 <> 0),
      localb AS (
        SELECT doc_id,
               CASE WHEN len(toks) > 0
                 THEN list_transform(generate_series(0, CAST(CEIL(len(toks) / 20.0) AS BIGINT) - 1),
                        i -> md5(array_to_string(list_slice(toks, i * 20 + 1, i * 20 + 20), ' ')))
                 ELSE []::VARCHAR[] END AS blocks
        FROM lt),
      l AS (SELECT doc_id, md5(array_to_string(blocks, ',')) AS lh FROM localb)
      SELECT r.doc_id, n_blocks,
             CASE WHEN lh IS NULL THEN 'new'
                  WHEN rh <> lh THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM r LEFT JOIN l ON r.doc_id = l.doc_id
      ORDER BY r.doc_id"""))

  /** F1+R11 — the FULL recall predicate matrix (recall.rs:1125-1275),
    * run through the production [[graft.api.Mnemo.recallPredicate]]
    * conjunction (the same Column the typed API filters with): reserved
    * experience-plan hiding, tombstones, expiry, quarantine, type set,
    * importance floor, tags-any-of, created_at range, and scope-based
    * visibility with the shared→ACL-grant leg. Deterministic memory
    * attributes are synthesized from doc_id so every leg excludes some
    * rows at every SF. */
  private val q8 = QueryDef(
    "f1_filter_matrix",
    (s, dir) => {
      import graft.api.Mnemo
      val baseTs = "timestamp'2024-01-01 00:00:00'"
      val m = Tables.documents(s, dir).select(
        col("doc_id"),
        concat(lit("agent_"), col("doc_id") % 7).as("agent_id"),
        element_at(array(lit("private"), lit("shared"), lit("public"), lit("global")),
          (col("doc_id") % 4 + 1).cast("int")).as("scope"),
        element_at(array(lit("episodic"), lit("semantic"), lit("procedural"), lit("working")),
          ((col("doc_id") / 4).cast("long") % 4 + 1).cast("int")).as("memory_type"),
        ((col("doc_id") % 100).cast("double") / 100.0).as("importance"),
        concat(
          array(concat(lit("topic_"), col("doc_id") % 5)),
          when(col("doc_id") % 11 === 0, array(lit(Mnemo.ExperiencePlanTag)))
            .otherwise(array().cast("array<string>")),
          when(col("doc_id") % 13 === 0, array(lit("pii")))
            .otherwise(array().cast("array<string>"))).as("tags"),
        expr(s"timestampadd(MINUTE, doc_id, $baseTs)").as("created_at"),
        when(col("doc_id") % 17 === 0,
          expr(s"timestampadd(MINUTE, doc_id + 60, $baseTs)")).as("deleted_at"),
        when(col("doc_id") % 19 === 0,
          expr(s"timestampadd(DAY, doc_id % 300, $baseTs)")).as("expires_at"),
        (col("doc_id") % 23 === 0).as("quarantined"),
        (col("doc_id") % 29 === 0).as("granted"))
      val req = Mnemo.RecallRequest(
        agentId = Some("agent_3"),
        memoryTypes = Seq("episodic", "semantic"),
        minImportance = Some(0.25f),
        tagsAnyOf = Seq("topic_1", "topic_2", "topic_3", "pii"),
        // created_at = base + doc_id minutes, so the window must catch
        // rows at EVERY correctness SF (sf0.001 tops out at 50 minutes)
        after = Some(java.sql.Timestamp.valueOf("2024-01-01 00:10:00")),
        before = Some(java.sql.Timestamp.valueOf("2024-01-03 00:00:00")))
      val now = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
      m.filter(Mnemo.recallPredicate(req, now, col("granted")))
        .select(col("doc_id"), col("agent_id"), col("scope"),
          col("memory_type"), col("importance"))
        .orderBy("doc_id")
    },
    Some("""
      WITH m AS (
        SELECT doc_id,
               'agent_' || (doc_id % 7) AS agent_id,
               (['private', 'shared', 'public', 'global'])[CAST(doc_id % 4 AS INT) + 1] AS scope,
               (['episodic', 'semantic', 'procedural', 'working'])[CAST((doc_id // 4) % 4 AS INT) + 1] AS memory_type,
               CAST(doc_id % 100 AS DOUBLE) / 100.0 AS importance,
               list_concat(list_concat(
                 ['topic_' || (doc_id % 5)],
                 CASE WHEN doc_id % 11 = 0 THEN ['__experience_plan__'] ELSE [] END),
                 CASE WHEN doc_id % 13 = 0 THEN ['pii'] ELSE [] END) AS tags,
               TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id) MINUTE AS created_at,
               CASE WHEN doc_id % 17 = 0
                    THEN TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id + 60) MINUTE END AS deleted_at,
               CASE WHEN doc_id % 19 = 0
                    THEN TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id % 300) DAY END AS expires_at,
               doc_id % 23 = 0 AS quarantined,
               doc_id % 29 = 0 AS granted
        FROM documents)
      SELECT doc_id, agent_id, scope, memory_type, importance
      FROM m
      WHERE NOT list_contains(tags, '__experience_plan__')
        AND deleted_at IS NULL
        AND (expires_at IS NULL OR expires_at >= TIMESTAMP '2024-06-01 00:00:00')
        AND NOT quarantined
        AND memory_type IN ('episodic', 'semantic')
        AND importance >= 0.25
        AND len(list_intersect(tags, ['topic_1', 'topic_2', 'topic_3', 'pii'])) > 0
        AND created_at >= TIMESTAMP '2024-01-01 00:10:00'
        AND created_at <= TIMESTAMP '2024-01-03 00:00:00'
        AND (scope IN ('public', 'global') OR agent_id = 'agent_3'
             OR (scope = 'shared' AND granted))
      ORDER BY doc_id"""))

  /** c2: CMA audit-sidecar reconciliation — the audit.jsonl bridge
    * (mnemo-cma/src/audit_bridge.rs:1-60): markdown-tree write ops are
    * hashed into the provenance chain (`bridge_hash = sha256(source ||
    * path || op || bytes || prev)`, pairwise-lag linkage as in
    * [[graft.functions.HashChain]]), while the CMA sidecar keeps its
    * own audit.jsonl copy of the same rows. Reconciliation replays
    * BOTH chains per path (the sidecar having deterministically lost a
    * subset of rows) and reports, per path: op counts, the missing-row
    * count, whether the replayed chain heads still agree, and the
    * offset of the first op absent from the sidecar. One window pass
    * per chain + one join on the bounded path set — no driver state. */
  private val q9 = QueryDef(
    "c2_audit_bridge",
    (s, dir) => {
      import graft.functions.HashChain
      val ops = Tables.events(s, dir)
        .filter(col("event_id") % 7 === 0)
        .select(
          col("event_id"), col("ts"),
          concat(lit("mem/"), col("user_id") % 50, lit(".md")).as("cma_path"),
          when(col("event_id") % 3 === 0, lit("cma_import"))
            .otherwise(lit("cma_beta")).as("source"),
          element_at(array(lit("write"), lit("append"), lit("delete")),
            (col("user_id") % 3 + 1).cast("int")).as("cma_op"),
          // floor() EXPLICITLY: Spark's double→bigint cast truncates
          // while DuckDB's rounds, and bytes feeds the chain hashes —
          // an implicit cast silently diverges the two replays
          floor(abs(col("value") * 100)).cast("bigint").as("bytes"),
          // the sidecar's audit.jsonl lost these rows (crash between
          // store write and sidecar append — the reconciliation target)
          (col("event_id") % 101 === 0).as("lost"))
      def chained(df: org.apache.spark.sql.DataFrame) = {
        val w = Window.partitionBy(col("cma_path")).orderBy(col("ts"), col("event_id"))
        df.withColumn("content_hash", sha2(concat_ws(HashChain.Sep,
            col("source"), col("cma_path"), col("cma_op"),
            col("bytes").cast("string")), 256))
          .withColumn("off", (row_number().over(w) - 1).cast("bigint"))
          .withColumn("chain_hash", sha2(concat(col("content_hash"),
            coalesce(lag(col("content_hash"), 1).over(w), lit(""))), 256))
      }
      def head = min(struct((-col("off")).as("no"), col("chain_hash").as("h")))
        .getField("h")
      val bridge = chained(ops).groupBy("cma_path").agg(
        count(lit(1)).as("n_bridge_ops"),
        head.as("bridge_head"),
        min(when(col("lost"), col("off"))).as("first_missing_offset"))
      val sidecar = chained(ops.filter(!col("lost"))).groupBy("cma_path").agg(
        count(lit(1)).as("n_sidecar_ops"),
        head.as("sidecar_head"))
      bridge.join(sidecar, Seq("cma_path"), "left")
        .select(col("cma_path"), col("n_bridge_ops"),
          coalesce(col("n_sidecar_ops"), lit(0L)).as("n_sidecar_ops"),
          (col("n_bridge_ops") - coalesce(col("n_sidecar_ops"), lit(0L)))
            .as("n_missing"),
          (col("bridge_head") === coalesce(col("sidecar_head"), lit("")))
            .as("heads_match"),
          col("first_missing_offset"))
        .orderBy("cma_path")
    },
    Some("""
      WITH ops AS (
        SELECT event_id, ts,
               'mem/' || CAST(user_id % 50 AS VARCHAR) || '.md' AS cma_path,
               CASE WHEN event_id % 3 = 0 THEN 'cma_import' ELSE 'cma_beta' END AS source,
               (['write', 'append', 'delete'])[CAST(user_id % 3 + 1 AS INT)] AS cma_op,
               CAST(FLOOR(abs(value * 100)) AS BIGINT) AS bytes,
               event_id % 101 = 0 AS lost
        FROM events WHERE event_id % 7 = 0),
      bridge_chain AS (
        SELECT *, sha256(source || chr(1) || cma_path || chr(1) || cma_op || chr(1) || CAST(bytes AS VARCHAR)) AS content_hash,
               CAST(ROW_NUMBER() OVER w - 1 AS BIGINT) AS off,
               sha256(sha256(source || chr(1) || cma_path || chr(1) || cma_op || chr(1) || CAST(bytes AS VARCHAR))
                 || COALESCE(LAG(sha256(source || chr(1) || cma_path || chr(1) || cma_op || chr(1) || CAST(bytes AS VARCHAR))) OVER w, '')) AS chain_hash
        FROM ops WINDOW w AS (PARTITION BY cma_path ORDER BY ts, event_id)),
      sidecar_chain AS (
        SELECT *, CAST(ROW_NUMBER() OVER w - 1 AS BIGINT) AS off,
               sha256(sha256(source || chr(1) || cma_path || chr(1) || cma_op || chr(1) || CAST(bytes AS VARCHAR))
                 || COALESCE(LAG(sha256(source || chr(1) || cma_path || chr(1) || cma_op || chr(1) || CAST(bytes AS VARCHAR))) OVER w, '')) AS chain_hash
        FROM ops WHERE NOT lost WINDOW w AS (PARTITION BY cma_path ORDER BY ts, event_id)),
      bridge AS (
        SELECT cma_path, COUNT(*) AS n_bridge_ops,
               min(struct_pack(no := -off, h := chain_hash)).h AS bridge_head,
               min(CASE WHEN lost THEN off END) AS first_missing_offset
        FROM bridge_chain GROUP BY cma_path),
      sidecar AS (
        SELECT cma_path, COUNT(*) AS n_sidecar_ops,
               min(struct_pack(no := -off, h := chain_hash)).h AS sidecar_head
        FROM sidecar_chain GROUP BY cma_path)
      SELECT bridge.cma_path, n_bridge_ops,
             COALESCE(n_sidecar_ops, 0) AS n_sidecar_ops,
             n_bridge_ops - COALESCE(n_sidecar_ops, 0) AS n_missing,
             bridge_head = COALESCE(sidecar_head, '') AS heads_match,
             first_missing_offset
      FROM bridge LEFT JOIN sidecar ON bridge.cma_path = sidecar.cma_path
      ORDER BY bridge.cma_path"""))

  /** c3: processing-log retention-floor verification — the compliance
    * crate's RetentionProfile check (mnemo-compliance/src/lib.rs:19-27,
    * retention.rs): given BEFORE and AFTER snapshots of the event log
    * around a deletion/compaction/cold-tier pass, verify that no row
    * whose timestamp falls inside an obligation's retention floor was
    * dropped. Floors carry the reference's real obligations (DPDP Rules
    * 2025 → 365 d, EU AI Act Art.19/26(6) → 180 d, HIPAA §164.312(b) →
    * 6 y) plus a short internal profile that legitimises the simulated
    * cold-tier compaction of old rows while still catching the
    * simulated in-floor bug drop. Shape: ONE id-only left join (before
    * vs after ids) + a 4-row broadcast obligation table + a hash
    * aggregate — the before side streams once. */
  private val q10 = QueryDef(
    "c3_retention_floor",
    (s, dir) => {
      import s.implicits._
      val coldCutoffUs = 1704412800000000L // 2024-01-05T00:00:00Z
      val before = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id")) // ts = micros
      // the deletion pass under audit: a legitimate cold-tier
      // compaction of old even-user rows, plus a buggy modulo drop
      val after = before.filter(!(col("event_id") % 151 === 0 ||
        (col("ts") < coldCutoffUs && col("user_id") % 2 === 0)))
      val obligations = Seq(
        ("dpdp_rules_2025", 365L), ("eu_ai_act_art19", 180L),
        ("hipaa_164_312b", 2190L), ("internal_debug", 21L))
        .toDF("obligation", "floor_days")
      before
        .join(after.select(col("event_id"), lit(true).as("present")),
          Seq("event_id"), "left")
        .crossJoin(broadcast(obligations))
        .filter(col("ts") >= lit(NowMicros) - col("floor_days") * 86400000000L)
        .groupBy("obligation", "floor_days")
        .agg(count(lit(1)).as("n_scoped"),
          count(when(col("present").isNull, 1)).as("n_violations"),
          min(when(col("present").isNull, col("event_id"))).as("first_violation_id"))
        .withColumn("ok", col("n_violations") === 0)
        .select("obligation", "floor_days", "n_scoped", "n_violations",
          "first_violation_id", "ok")
        .orderBy("obligation")
    },
    Some("""
      WITH before_log AS (SELECT event_id, epoch_us(ts) AS tsu, user_id FROM events),
      after_log AS (
        SELECT event_id FROM before_log
        WHERE NOT (event_id % 151 = 0
          OR (tsu < 1704412800000000 AND user_id % 2 = 0))),
      obligations AS (
        SELECT * FROM (VALUES
          ('dpdp_rules_2025', CAST(365 AS BIGINT)),
          ('eu_ai_act_art19', 180),
          ('hipaa_164_312b', 2190),
          ('internal_debug', 21)) AS t(obligation, floor_days)),
      checked AS (
        SELECT b.event_id, b.tsu, a.event_id IS NOT NULL AS present
        FROM before_log b LEFT JOIN after_log a ON b.event_id = a.event_id)
      SELECT obligation, floor_days,
             COUNT(*) AS n_scoped,
             COUNT(CASE WHEN NOT present THEN 1 END) AS n_violations,
             min(CASE WHEN NOT present THEN event_id END) AS first_violation_id,
             COUNT(CASE WHEN NOT present THEN 1 END) = 0 AS ok
      FROM checked CROSS JOIN obligations
      WHERE checked.tsu >= 1706745600000000 - floor_days * 86400000000
      GROUP BY obligation, floor_days
      ORDER BY obligation"""))

  /** c4: GEM-aligned trajectory-correctness audit — the compliance
    * crate's four trajectory-level failure modes over the event log
    * (mnemo-compliance/src/trajectory.rs:1-24), which per-record chain
    * verification (w4/c2) cannot catch. Event-type mapping for the
    * synthetic log, stated once: read=view, write=purchase|signup,
    * delete=click, redact=error; a delete's forget strategy is derived
    * from its props key (k % 7 → the five named strategies; 5-6 =
    * out-of-policy).
    *
    *  - unregulated_growth: net live rows (writes − deletes) above the
    *    policy ceiling (24 ≈ the observed p95).
    *  - missing_semantic_revision: a fact key written ≥ 2 times with
    *    no delete for that key — stale coexists with current.
    *  - capacity_driven_forgetting: deletes outside the five named
    *    strategies.
    *  - read_only_retrieval: scopes that only ever read.
    *
    * Shape: two per-user hash aggregates + one per-(user, key)
    * aggregate with a left join — everything partitions by user;
    * the 4-row output is a union of count aggregates. */
  private val q11 = QueryDef(
    "c4_gem_trajectory",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      val perUser = ev.groupBy("user_id").agg(
        count(when(col("event_type") === "view", 1)).as("n_read"),
        count(when(col("event_type").isin("purchase", "signup"), 1)).as("n_write"),
        count(when(col("event_type") === "click", 1)).as("n_delete"),
        count(when(col("event_type") === "error", 1)).as("n_redact"),
        count(when(col("event_type") === "click" && col("k") % 7 >= 5, 1))
          .as("n_unlabeled"))
      val stale = ev.filter(col("event_type").isin("purchase", "signup"))
        .groupBy("user_id", "k").agg(count(lit(1)).as("n_w"))
        .join(ev.filter(col("event_type") === "click")
          .groupBy("user_id", "k").agg(count(lit(1)).as("n_d")),
          Seq("user_id", "k"), "left")
        .filter(col("n_w") >= 2 && coalesce(col("n_d"), lit(0L)) === 0)
        .select("user_id").distinct()
      // the three per-user modes fold into ONE pass over perUser (a
      // naive one-aggregate-per-mode union re-scans the event log once
      // per mode — 4 corpus scans for a 4-row answer); the row shape
      // comes back via an explode over mode structs
      val cdf = col("n_unlabeled") > 0
      val ror = col("n_read") > 0 &&
        col("n_write") + col("n_delete") + col("n_redact") === 0
      val ug = col("n_write") - col("n_delete") > 24
      def flagged(p: Column) = count(when(p, 1))
      def firstOf(p: Column) = min(when(p, col("user_id")))
      val perUserModes = perUser.agg(
        flagged(cdf).as("n_cdf"), firstOf(cdf).as("f_cdf"),
        flagged(ror).as("n_ror"), firstOf(ror).as("f_ror"),
        flagged(ug).as("n_ug"), firstOf(ug).as("f_ug"))
        .select(explode(array(
          struct(lit("capacity_driven_forgetting").as("failure_mode"),
            col("n_cdf").as("n_flagged"), col("f_cdf").as("first_flagged_user")),
          struct(lit("read_only_retrieval").as("failure_mode"),
            col("n_ror").as("n_flagged"), col("f_ror").as("first_flagged_user")),
          struct(lit("unregulated_growth").as("failure_mode"),
            col("n_ug").as("n_flagged"), col("f_ug").as("first_flagged_user"))))
          .as("m"))
        .select("m.*")
      val staleMode = stale.agg(count(lit(1)).as("n_flagged"),
        min(col("user_id")).as("first_flagged_user"))
        .withColumn("failure_mode", lit("missing_semantic_revision"))
        .select("failure_mode", "n_flagged", "first_flagged_user")
      perUserModes.unionAll(staleMode)
        .orderBy("failure_mode")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events),
      per_user AS (
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_read,
               COUNT(CASE WHEN event_type IN ('purchase', 'signup') THEN 1 END) AS n_write,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_delete,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_redact,
               COUNT(CASE WHEN event_type = 'click' AND k % 7 >= 5 THEN 1 END) AS n_unlabeled
        FROM e GROUP BY user_id),
      stale AS (
        SELECT DISTINCT w.user_id
        FROM (SELECT user_id, k, COUNT(*) AS n_w FROM e
              WHERE event_type IN ('purchase', 'signup') GROUP BY user_id, k) w
        LEFT JOIN (SELECT user_id, k, COUNT(*) AS n_d FROM e
                   WHERE event_type = 'click' GROUP BY user_id, k) d
          ON w.user_id = d.user_id AND w.k = d.k
        WHERE w.n_w >= 2 AND COALESCE(d.n_d, 0) = 0),
      modes AS (
        SELECT 'capacity_driven_forgetting' AS failure_mode,
               COUNT(*) AS n_flagged, min(user_id) AS first_flagged_user
        FROM per_user WHERE n_unlabeled > 0
        UNION ALL
        SELECT 'missing_semantic_revision', COUNT(*), min(user_id) FROM stale
        UNION ALL
        SELECT 'read_only_retrieval', COUNT(*), min(user_id)
        FROM per_user WHERE n_read > 0 AND n_write + n_delete + n_redact = 0
        UNION ALL
        SELECT 'unregulated_growth', COUNT(*), min(user_id)
        FROM per_user WHERE n_write - n_delete > 24)
      SELECT failure_mode, n_flagged, first_flagged_user
      FROM modes
      ORDER BY failure_mode"""))

  val all: Seq[QueryDef] = Seq(q1, q2, q3, q3b, q3c, q4, q5, q6, q7, q8, q9, q10, q11)
}
