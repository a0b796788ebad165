package graft.queries

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lifecycle batch passes and event-log analytics — the most
  * Spark-native part of the reference (SURVEY §3.4): full scan →
  * per-row transform → groupBy → (conceptually) MERGE back. Here each
  * pass is the read/compute side, emitted as a deterministic report.
  *
  * Scale design: every pass groups by a high-cardinality key (user_id,
  * customer, label) — one shuffle, embarrassingly parallel across keys;
  * global statistics (profile means, variances) are tiny aggregates
  * broadcast back against the big side. Nothing collects to the driver.
  *
  * Reference: decay query/lifecycle.rs:12-155, consolidation
  * lifecycle.rs:199-398, profiles query/poisoning.rs:319-364, baseline
  * anomaly/outlier.rs:60-251, TTL lifecycle.rs:423-531, trajectory
  * audit mnemo-compliance/src/trajectory.rs, sync sync/engine.rs:24-161,
  * replay query/replay.rs:61-221, merge query/merge.rs:58-182.
  */
object Lifecycle extends QueryGroup {

  private val NowMicros = 1706745600000000L // 2024-02-01T00:00:00Z

  private val q1 = QueryDef(
    "l1_decay_pass",
    (s, dir) => {
      // effective_importance = value·e^(−rate·age_h) + access boost
      // 0.05·ln(1+k); bucketed into lifecycle states (A8/A9)
      val ageH = (lit(NowMicros) - col("ts")).cast("double") / 3.6e9
      val k = get_json_object(col("props"), "$.k").cast("double")
      val eff = col("value") * exp(ageH * -0.001) +
        lit(0.05) * log(lit(1.0) + coalesce(k, lit(0.0)))
      Tables.events(s, dir)
        .withColumn("eff", eff)
        .withColumn("bucket",
          when(col("eff") < 0.5, "forgotten")
            .when(col("eff") < 2.0, "archived")
            .otherwise("active"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), round(avg(col("eff")), 6).as("avg_eff"))
        .orderBy("bucket")
    },
    Some("""
      WITH e AS (
        SELECT value * exp(-0.001 * (CAST(1706745600000000 - epoch_us(ts) AS DOUBLE) / 3.6e9))
               + 0.05 * ln(1.0 + COALESCE(CAST(json_extract_string(props, '$.k') AS DOUBLE), 0.0)) AS eff
        FROM events)
      SELECT CASE WHEN eff < 0.5 THEN 'forgotten'
                  WHEN eff < 2.0 THEN 'archived'
                  ELSE 'active' END AS bucket,
             COUNT(*) AS n, ROUND(AVG(eff), 6) AS avg_eff
      FROM e
      GROUP BY 1
      ORDER BY bucket"""))

  private val q2 = QueryDef(
    "l2_consolidation",
    (s, dir) => {
      // group-wise summarization (A2's aggregation half): per cluster,
      // member count, mean importance proxy, and a deterministic
      // rank-ordered digest of the 3 earliest members
      val d = Tables.documents(s, dir)
      val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
      val withEx = d.withColumn("rn", row_number().over(w))
        .withColumn("ex", TextOps.excerpt(col("text"), 20))
      val stats = d.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_members"),
          round(avg(col("n_chars")), 6).as("avg_chars"))
      val digest = withEx.filter(col("rn") <= 3)
        .groupBy("lang", "source")
        .agg(concat_ws(" | ",
          transform(array_sort(collect_list(struct(col("doc_id"), col("ex")))),
            x => x.getField("ex"))).as("digest"))
      stats.join(digest, Seq("lang", "source"))
        .orderBy("lang", "source")
    },
    Some("""
      WITH ex AS (
        SELECT lang, source, doc_id, n_chars,
               CASE WHEN len((list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1]) <= 20
                    THEN (list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1]
                    ELSE substr((list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1], 1, 20) || '…' END AS ex,
               ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        FROM documents)
      SELECT lang, source, COUNT(*) AS n_members,
             ROUND(AVG(n_chars), 6) AS avg_chars,
             string_agg(CASE WHEN rn <= 3 THEN ex END, ' | ' ORDER BY doc_id) AS digest
      FROM ex
      GROUP BY lang, source
      ORDER BY lang, source"""))

  private val q3 = QueryDef(
    "l3_agent_profiles",
    (s, dir) => {
      // per-agent running stats + z-score drift vs the population (A6 +
      // the scalar half of X11)
      val prof = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          avg(col("value")).as("avg_value"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"))
      val stats = prof.agg(avg(col("avg_value")).as("mu"),
        stddev_pop(col("avg_value")).as("sigma"))
      prof.crossJoin(broadcast(stats))
        .withColumn("z", round((col("avg_value") - col("mu")) / col("sigma"), 6))
        .select(col("user_id"), col("n_events"), round(col("avg_value"), 6).as("avg_value"),
          col("n_error"), col("n_purchase"), col("z"))
        .orderBy("user_id")
    },
    Some("""
      WITH prof AS (
        SELECT user_id, COUNT(*) AS n_events, AVG(value) AS avg_value,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
        FROM events GROUP BY user_id),
      stats AS (SELECT AVG(avg_value) AS mu, stddev_pop(avg_value) AS sigma FROM prof)
      SELECT user_id, n_events, ROUND(avg_value, 6) AS avg_value, n_error, n_purchase,
             ROUND((avg_value - mu) / sigma, 6) AS z
      FROM prof CROSS JOIN stats
      ORDER BY user_id"""))

  private val q4 = QueryDef(
    "l4_embedding_baseline",
    (s, dir) => {
      // per-label (μ, diag σ²) baseline + per-vector z-score distance
      // (A7 + X11): outliers = top-20 by sqrt(mean((x−μ)²/max(σ²,ε))).
      // The baseline (10 labels × 64 dims) is re-packed into per-label μ/σ²
      // ARRAYS and broadcast, so the scoring pass is one narrow zip_with
      // scan over the vectors — no join back on (label, dim)
      val e = Tables.embeddings(s, dir)
      val x = e.select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .withColumn("x", col("x").cast("double"))
      val base = x.groupBy("label", "dim")
        .agg(avg(col("x")).as("mu"), var_pop(col("x")).as("v"))
      val baseArr = base.groupBy("label").agg(
        transform(array_sort(collect_list(struct(col("dim"), col("mu")))),
          p => p.getField("mu")).as("mus"),
        transform(array_sort(collect_list(struct(col("dim"), col("v")))),
          p => p.getField("v")).as("vs"))
      e.join(broadcast(baseArr), "label")
        .withColumn("zdist",
          round(graft.functions.VectorOps.zScoreDistance(
            col("embedding"), col("mus"), col("vs")), 6))
        .select("vec_id", "label", "zdist")
        .orderBy(col("zdist").desc, col("vec_id"))
        .limit(20)
    },
    Some("""
      WITH x AS (
        SELECT vec_id, label,
               unnest(embedding::DOUBLE[]) AS x,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings),
      base AS (
        SELECT label, dim, AVG(x) AS mu, var_pop(x) AS v
        FROM x GROUP BY label, dim)
      SELECT vec_id, x.label,
             ROUND(sqrt(SUM((x - mu) * (x - mu) / GREATEST(v, 1e-6)) / 64.0), 6) AS zdist
      FROM x JOIN base ON x.label = base.label AND x.dim = base.dim
      GROUP BY vec_id, x.label
      ORDER BY zdist DESC, vec_id
      LIMIT 20"""))

  private val q5 = QueryDef(
    "l6_sessionization",
    (s, dir) => {
      // 30-minute-gap sessionization (T7/W5): the classic event-time
      // window pass, partitioned per user
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .filter(col("user_id") < 30)
        .withColumn("gap", col("ts") - lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("gap").isNull || col("gap") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          round((max(col("ts")) - min(col("ts"))).cast("double") / 1e6, 6)
            .as("duration_sec"))
        .orderBy("user_id", "session_id")
    },
    Some("""
      WITH g AS (
        SELECT user_id, event_id, epoch_us(ts) AS tsu,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events WHERE user_id < 30),
      sess AS (
        SELECT user_id, event_id, tsu,
               SUM(CASE WHEN gap IS NULL OR gap > 1800 * 1000000 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY tsu, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM g)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
             ROUND(CAST(MAX(tsu) - MIN(tsu) AS DOUBLE) / 1e6, 6) AS duration_sec
      FROM sess
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""))

  private val q6 = QueryDef(
    "l7_sync_conflict",
    (s, dir) => {
      // watermark-sync conflict detection (J7/T5): full outer join of a
      // local and a (simulated) remote snapshot, classify per row
      val local = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("lp"))
      val remote = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")).as("rp"))
      local.join(remote, Seq("k"), "full_outer")
        .withColumn("class",
          when(col("lp").isNull, "remote_only")
            .when(col("rp").isNull, "local_only")
            .when(col("lp") =!= col("rp"), "conflict")
            .otherwise("in_sync"))
        .groupBy("class").agg(count(lit(1)).as("n"))
        .orderBy("class")
    },
    Some("""
      WITH locl AS (SELECT o_orderkey AS k, o_totalprice AS lp FROM orders),
      remote AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS rp
        FROM orders WHERE o_orderkey % 3 <> 0)
      SELECT CASE WHEN lp IS NULL THEN 'remote_only'
                  WHEN rp IS NULL THEN 'local_only'
                  WHEN lp <> rp THEN 'conflict'
                  ELSE 'in_sync' END AS class,
             COUNT(*) AS n
      FROM locl FULL OUTER JOIN remote USING (k)
      GROUP BY 1
      ORDER BY class"""))

  private val q7 = QueryDef(
    "l8_checkpoint_replay",
    (s, dir) => {
      // checkpoint = per-customer array of its top-3 order refs; replay =
      // explode refs ⨝ orders → recomputed state (J8/T2)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val refs = Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy("o_custkey")
        .agg(sort_array(collect_list(col("o_orderkey"))).as("refs"))
      refs.select(col("o_custkey"), explode(col("refs")).as("o_orderkey"),
          size(col("refs")).as("n_refs"))
        .join(Tables.orders(s, dir).select("o_orderkey", "o_totalprice"), "o_orderkey")
        .groupBy("o_custkey")
        .agg(max(col("n_refs")).as("n_refs"),
          round(sum(col("o_totalprice").cast("decimal(12,2)")).cast("double"), 2)
            .as("replayed_total"))
        .orderBy("o_custkey")
    },
    Some("""
      WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders),
      refs AS (
        SELECT o_custkey, list_sort(list(o_orderkey)) AS refs
        FROM ranked WHERE rn <= 3 GROUP BY o_custkey),
      exploded AS (
        SELECT o_custkey, unnest(refs) AS o_orderkey, len(refs) AS n_refs FROM refs)
      SELECT e.o_custkey, MAX(n_refs) AS n_refs,
             ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS replayed_total
      FROM exploded e JOIN orders o USING (o_orderkey)
      GROUP BY e.o_custkey
      ORDER BY e.o_custkey"""))

  private val q8 = QueryDef(
    "l9_branch_merge",
    (s, dir) => {
      // branch/merge of memory-ref arrays (§2.8): per customer, branch A
      // (open orders) ∪ branch B (big orders), union-distinct, digested
      val merged = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(
          sort_array(collect_list(when(col("o_orderstatus") === "O", col("o_orderkey"))))
            .as("a"),
          sort_array(collect_list(when(col("o_totalprice") > 150000.0, col("o_orderkey"))))
            .as("b"))
        .withColumn("merged", array_sort(array_union(col("a"), col("b"))))
      merged.select(col("o_custkey"),
          size(col("a")).as("n_a"), size(col("b")).as("n_b"),
          size(col("merged")).as("n_merged"),
          md5(concat_ws(",", transform(col("merged"), x => x.cast("string")))).as("digest"))
        .filter(col("n_merged") > 0)
        .orderBy("o_custkey")
    },
    Some("""
      WITH m AS (
        SELECT o_custkey,
               COALESCE(list_sort(list(o_orderkey) FILTER (o_orderstatus = 'O')), []) AS a,
               COALESCE(list_sort(list(o_orderkey) FILTER (o_totalprice > 150000.0)), []) AS b
        FROM orders GROUP BY o_custkey)
      SELECT o_custkey, len(a) AS n_a, len(b) AS n_b,
             len(list_sort(list_distinct(list_concat(a, b)))) AS n_merged,
             md5(array_to_string(list_sort(list_distinct(list_concat(a, b))), ',')) AS digest
      FROM m
      WHERE len(list_distinct(list_concat(a, b))) > 0
      ORDER BY o_custkey"""))

  private val q9 = QueryDef(
    "l10_ttl_sweep",
    (s, dir) => {
      // TTL expiry sweep (T4/S12): expired = old AND low-value; per-type
      // expiry report
      val expired = col("ts") < lit(1704672000000000L) && col("value") < 1.0 // 2024-01-08
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(sum(when(expired, 1L).otherwise(0L)).as("n_expired"),
          sum(when(!expired, 1L).otherwise(0L)).as("n_live"))
        .withColumn("expired_pct",
          round(col("n_expired").cast("double") / (col("n_expired") + col("n_live")), 6))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type,
             CAST(SUM(CASE WHEN epoch_us(ts) < 1704672000000000 AND value < 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_expired,
             CAST(SUM(CASE WHEN NOT (epoch_us(ts) < 1704672000000000 AND value < 1.0) THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
             ROUND(CAST(SUM(CASE WHEN epoch_us(ts) < 1704672000000000 AND value < 1.0 THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*), 6) AS expired_pct
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  private val q10 = QueryDef(
    "l5_trajectory_audit",
    (s, dir) => {
      // GEM trajectory audit (A11): per-scope event-mix aggregates →
      // failure-mode flags, emitted only for flagged scopes
      val prof = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_view"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
          sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("n_signup"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"))
      prof
        .withColumn("unregulated_growth", col("n_events") > 80)
        .withColumn("read_only",
          col("n_view") > 0 && col("n_purchase") === 0 && col("n_signup") === 0)
        .withColumn("error_heavy",
          col("n_error").cast("double") / col("n_events") > 0.25)
        .withColumn("unattributed_purchase",
          col("n_purchase") > 0 && col("n_signup") === 0)
        .filter(col("unregulated_growth") || col("read_only") ||
          col("error_heavy") || col("unattributed_purchase"))
        .orderBy("user_id")
    },
    Some("""
      WITH prof AS (
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        FROM events GROUP BY user_id)
      SELECT user_id, n_events, n_view, n_purchase, n_signup, n_error,
             n_events > 80 AS unregulated_growth,
             n_view > 0 AND n_purchase = 0 AND n_signup = 0 AS read_only,
             CAST(n_error AS DOUBLE) / n_events > 0.25 AS error_heavy,
             n_purchase > 0 AND n_signup = 0 AS unattributed_purchase
      FROM prof
      WHERE n_events > 80 OR (n_view > 0 AND n_purchase = 0 AND n_signup = 0)
         OR CAST(n_error AS DOUBLE) / n_events > 0.25
         OR (n_purchase > 0 AND n_signup = 0)
      ORDER BY user_id"""))

  private val q11 = QueryDef(
    "a12_behavior_drift",
    (s, dir) => {
      // behavioural-baseline drift exporter (A12,
      // mnemo-baseline/src/{profile,anomaly}.rs): per-agent daily event
      // rate → EWMA profile (geometric weights, alpha=0.3) → z-score of
      // the latest day against the profile
      val daily = Tables.events(s, dir)
        .filter(col("user_id") < 50)
        .withColumn("day", expr("ts div 86400000000"))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).cast("double").as("cnt"))
      val withLast = daily.withColumn("last_day",
        max(col("day")).over(Window.partitionBy(col("user_id"))))
      withLast.groupBy("user_id")
        .agg(
          count(lit(1)).as("n_days"),
          max_by(col("cnt"), col("day")).as("last_cnt"),
          stddev_pop(col("cnt")).as("sd"),
          sum(col("cnt") * pow(lit(0.7), col("last_day") - col("day"))).as("wsum"),
          sum(pow(lit(0.7), col("last_day") - col("day"))).as("wnorm"))
        .withColumn("ewma", col("wsum") / col("wnorm"))
        .withColumn("z",
          round((col("last_cnt") - col("ewma")) / greatest(col("sd"), lit(0.001)), 6))
        .select(col("user_id"), col("n_days"), round(col("ewma"), 6).as("ewma"),
          col("last_cnt").cast("long").as("last_cnt"), col("z"))
        .orderBy("user_id")
    },
    Some("""
      WITH daily AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(*) AS DOUBLE) AS cnt
        FROM events WHERE user_id < 50
        GROUP BY user_id, epoch_us(ts) // 86400000000),
      w AS (
        SELECT user_id, day, cnt,
               MAX(day) OVER (PARTITION BY user_id) AS last_day
        FROM daily),
      prof AS (
        SELECT user_id, COUNT(*) AS n_days,
               arg_max(cnt, day) AS last_cnt,
               stddev_pop(cnt) AS sd,
               SUM(cnt * pow(0.7, last_day - day)) / SUM(pow(0.7, last_day - day)) AS ewma
        FROM w GROUP BY user_id)
      SELECT user_id, n_days, ROUND(ewma, 6) AS ewma,
             CAST(last_cnt AS BIGINT) AS last_cnt,
             ROUND((last_cnt - ewma) / GREATEST(sd, 0.001), 6) AS z
      FROM prof
      ORDER BY user_id"""))

  private val q12 = QueryDef(
    "c1_consolidate_topic",
    (s, dir) => {
      // caller-chosen topic consolidation (consolidate.rs:1-409): members
      // selected by topic predicate, digested in deterministic
      // (doc_id)-order into one "[Consolidated from N memories] a | b…"
      // document per language
      // topic word chosen to actually match rows at every correctness SF
      // (the synthetic corpus vocabulary has no "model"), so the
      // excerpt/string_agg parity is exercised, not vacuously green
      val members = Tables.documents(s, dir)
        .filter(lower(col("text")).contains("vector"))
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      val withEx = members.withColumn("rn", row_number().over(w))
        .withColumn("ex", TextOps.excerpt(col("text"), 20))
      withEx.groupBy("lang")
        .agg(
          count(lit(1)).as("n_members"),
          round(avg(col("n_chars")), 6).as("avg_chars"),
          concat_ws(" | ",
            transform(
              array_sort(collect_list(when(col("rn") <= 3,
                struct(col("doc_id"), col("ex"))))),
              p => p.getField("ex"))).as("body"))
        .withColumn("doc",
          concat(lit("[Consolidated from "), col("n_members").cast("string"),
            lit(" memories] "), col("body")))
        .select("lang", "n_members", "avg_chars", "doc")
        .orderBy("lang")
    },
    Some("""
      WITH members AS (
        SELECT lang, doc_id, n_chars,
               CASE WHEN len((list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1]) <= 20
                    THEN (list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1]
                    ELSE substr((list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1], 1, 20) || '…' END AS ex,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents
        WHERE lower(text) LIKE '%vector%')
      SELECT lang, COUNT(*) AS n_members,
             ROUND(AVG(n_chars), 6) AS avg_chars,
             '[Consolidated from ' || COUNT(*) || ' memories] '
               || string_agg(CASE WHEN rn <= 3 THEN ex END, ' | ' ORDER BY doc_id) AS doc
      FROM members
      GROUP BY lang
      ORDER BY lang"""))

  val all: Seq[QueryDef] =
    Seq(q1, q2, q3, q4, q5, q6, q7, q8, q9, q10, q11, q12)
}
