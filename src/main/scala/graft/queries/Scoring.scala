package graft.queries

import graft.Tables
import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scoring and post-retrieval processor shapes from SURVEY §2.4/§2.6:
  * conflict evidence composites (A4), cluster maturity (A5), date
  * absolutization (X5), injection-marker scanning (X9), token-budget
  * retained capsules (P6), and the orientation-cache distillation (P7).
  * All are single-shuffle column-arithmetic passes: scores are
  * projections, budgets are running-sum windows per partition key, and
  * the distillation is one groupBy + per-group top-k window.
  */
object Scoring extends QueryGroup {

  private val NowMicros = 1706745600000000L // 2024-02-01T00:00:00Z

  // ---- injection-marker regexes (poisoning.rs ~100-160) ----
  // SINGLE source of truth for every consumer of the MINJA marker set:
  // the x9 scan (Spark AND oracle SQL built from these), the q1
  // quarantine-replay policy (its 3-marker high-severity subset), and
  // the eval/Detection TPR/FPR harness — so an edit to the scan can
  // never silently unmoor the published detection rates from the
  // shipped query. Each marker is individually named so policy subsets
  // compose from the same constants instead of re-typing regexes.
  val MarkerIgnorePrevious = "ignore (all )?previous instructions"
  val MarkerSystemPrompt = "system prompt"
  val MarkerDoNotTell = "\\bdo not tell\\b"
  val MarkerAlwaysRespond = "always (respond|answer) with"
  val MarkerExfil = "exfiltrate|keylogger"
  // the reference's remaining self-referential patterns (poisoning.rs
  // ~138-152), previously uncovered here: instruction displacement
  // ("disregard …", "new instructions:") and system-role spoofing
  // (<<sys>>-style tokens, fake role headers, mode-switch phrasing)
  val MarkerDisregardPrevious = "disregard (all prior|previous)"
  val MarkerNewInstructions = "new instructions:"
  val MarkerRoleSpoof =
    "<<sys>>|\\[system\\]|```system|system: you are|you are now in"

  /** The full x9 scan set, in the scan's reporting order. */
  val InjectionMarkers: Seq[String] = Seq(
    MarkerIgnorePrevious, MarkerSystemPrompt, MarkerDoNotTell,
    MarkerAlwaysRespond, MarkerExfil, MarkerDisregardPrevious,
    MarkerNewInstructions, MarkerRoleSpoof)

  private val q1 = QueryDef(
    "a4_conflict_scoring",
    (s, dir) => {
      // composite = 0.3·reliability + 0.2·recency + 0.2·usage +
      // 0.2·importance + 0.1·similarity (conflict.rs:45-80), with the
      // reference's per-source reliability lookup re-keyed by event_type
      val reliability = when(col("event_type") === "purchase", 0.9)
        .when(col("event_type") === "signup", 0.8)
        .when(col("event_type") === "click", 0.6)
        .when(col("event_type") === "view", 0.5)
        .otherwise(0.3)
      val ageH = (lit(NowMicros) - col("ts")).cast("double") / 3.6e9
      val recency = exp(-ageH * log(lit(2.0)) / 168.0)
      val usage = col("value") / max(col("value")).over(Window.partitionBy(col("user_id")))
      val importance = least(lit(1.0), col("value") / 5.0)
      val similarity = coalesce(
        get_json_object(col("props"), "$.k").cast("double") / 100.0, lit(0.0))
      Tables.events(s, dir)
        .withColumn("score", round(
          lit(0.3) * reliability + lit(0.2) * recency + lit(0.2) * usage +
            lit(0.2) * importance + lit(0.1) * similarity, 6))
        .select("event_id", "user_id", "event_type", "score")
        .orderBy(col("score").desc, col("event_id"))
        .limit(50)
    },
    Some("""
      WITH sc AS (
        SELECT event_id, user_id, event_type,
               ROUND(0.3 * (CASE event_type WHEN 'purchase' THEN 0.9 WHEN 'signup' THEN 0.8
                            WHEN 'click' THEN 0.6 WHEN 'view' THEN 0.5 ELSE 0.3 END)
                   + 0.2 * exp(-(CAST(1706745600000000 - epoch_us(ts) AS DOUBLE) / 3.6e9) * ln(2.0) / 168.0)
                   + 0.2 * (value / MAX(value) OVER (PARTITION BY user_id))
                   + 0.2 * LEAST(1.0, value / 5.0)
                   + 0.1 * COALESCE(CAST(json_extract_string(props, '$.k') AS DOUBLE) / 100.0, 0.0), 6) AS score
        FROM events)
      SELECT event_id, user_id, event_type, score
      FROM sc
      ORDER BY score DESC, event_id
      LIMIT 50"""))

  private val q2 = QueryDef(
    "a5_cluster_maturity",
    (s, dir) => {
      // weight-normalised maturity per cluster (maturity.rs:1-491):
      // 0.3·size (log-saturated) + 0.3·redundancy (mean pairwise cosine,
      // neutral 0.5 if <2 embeddings) + 0.4·substance (chars vs corpus max)
      val d = Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val de = d.join(e, col("doc_id") === col("vec_id")).cache()
      val a = de.select(col("lang"), col("source"), col("doc_id").as("ia"),
        col("embedding").as("va"))
      val b = de.select(col("lang"), col("source"), col("doc_id").as("ib"),
        col("embedding").as("vb"))
      val pairCos = a.join(b, Seq("lang", "source")).filter(col("ia") < col("ib"))
        .withColumn("cos", VectorOps.cosineFast(col("va"), col("vb")))
        .groupBy("lang", "source")
        .agg(avg(col("cos")).as("redundancy"))
      val maxChars = d.agg(max(col("n_chars")).as("max_chars"))
      d.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_members"), avg(col("n_chars")).as("avg_chars"))
        .join(pairCos, Seq("lang", "source"), "left")
        .crossJoin(broadcast(maxChars))
        .withColumn("maturity", round(
          lit(0.3) * (log(lit(1.0) + col("n_members")) / log(lit(51.0))) +
            lit(0.3) * coalesce((col("redundancy") + 1.0) / 2.0, lit(0.5)) +
            lit(0.4) * (col("avg_chars") / col("max_chars")), 6))
        .select(col("lang"), col("source"), col("n_members"),
          round(coalesce(col("redundancy"), lit(0.0)), 6).as("redundancy"),
          col("maturity"))
        .orderBy("lang", "source")
    },
    Some("""
      WITH de AS (
        SELECT lang, source, doc_id, n_chars, embedding::DOUBLE[] AS v
        FROM documents JOIN embeddings ON doc_id = vec_id),
      pc AS (
        SELECT a.lang, a.source,
               AVG(list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) AS redundancy
        FROM de a JOIN de b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        GROUP BY a.lang, a.source),
      cl AS (
        SELECT lang, source, COUNT(*) AS n_members, AVG(n_chars) AS avg_chars
        FROM documents GROUP BY lang, source),
      mx AS (SELECT MAX(n_chars) AS max_chars FROM documents)
      SELECT cl.lang, cl.source, n_members,
             ROUND(COALESCE(redundancy, 0.0), 6) AS redundancy,
             ROUND(0.3 * (ln(1.0 + n_members) / ln(51.0))
                 + 0.3 * COALESCE((redundancy + 1.0) / 2.0, 0.5)
                 + 0.4 * (avg_chars / max_chars), 6) AS maturity
      FROM cl LEFT JOIN pc ON cl.lang = pc.lang AND cl.source = pc.source
      CROSS JOIN mx
      ORDER BY cl.lang, cl.source"""))

  private val q3 = QueryDef(
    "x5_date_absolutize",
    (s, dir) => {
      // relative-date phrase rewriting anchored at a per-record date
      // (reflection.rs:305-357). Phrases are synthesized deterministically
      // from doc_id; the rewrite itself is the operator under test.
      val phrase = element_at(array(
        lit("met yesterday"), lit("due today"), lit("ship tomorrow"),
        lit("seen last week"), lit("plan next week")),
        (col("doc_id") % 5 + 1).cast("int"))
      val anchor = lit("2024-03-15").cast("date")
      val resolved = when(col("doc_id") % 5 === 0, date_add(anchor, -1))
        .when(col("doc_id") % 5 === 1, anchor)
        .when(col("doc_id") % 5 === 2, date_add(anchor, 1))
        .when(col("doc_id") % 5 === 3, date_add(anchor, -7))
        .otherwise(date_add(anchor, 7))
      Tables.documents(s, dir)
        .withColumn("phrase", phrase)
        .withColumn("absolutized",
          regexp_replace(col("phrase"),
            "yesterday|today|tomorrow|last week|next week",
            "on DATE"))
        .withColumn("resolved_date", resolved.cast("string"))
        .select("doc_id", "phrase", "absolutized", "resolved_date")
        .orderBy("doc_id")
        .limit(100)
    },
    Some("""
      SELECT doc_id,
             (['met yesterday', 'due today', 'ship tomorrow', 'seen last week', 'plan next week'])[CAST(doc_id % 5 AS INT) + 1] AS phrase,
             regexp_replace(
               (['met yesterday', 'due today', 'ship tomorrow', 'seen last week', 'plan next week'])[CAST(doc_id % 5 AS INT) + 1],
               'yesterday|today|tomorrow|last week|next week', 'on DATE') AS absolutized,
             CAST(CASE CAST(doc_id % 5 AS INT)
               WHEN 0 THEN DATE '2024-03-14' WHEN 1 THEN DATE '2024-03-15'
               WHEN 2 THEN DATE '2024-03-16' WHEN 3 THEN DATE '2024-03-08'
               ELSE DATE '2024-03-22' END AS VARCHAR) AS resolved_date
      FROM documents
      ORDER BY doc_id
      LIMIT 100"""))

  private val q4 = QueryDef(
    "x9_injection_scan",
    (s, dir) => {
      // prompt-injection marker scan (poisoning.rs ~100-160): per-marker
      // hit counts over the corpus — the write-path quarantine predicate
      // run as a batch audit
      val markers = InjectionMarkers
      val d = Tables.documents(s, dir)
      markers.map { m =>
        d.agg(lit(m).as("marker"),
          sum(when(lower(col("text")).rlike(m), 1L).otherwise(0L)).as("n_hits"),
          count(lit(1)).as("n_docs"))
      }.reduce(_ unionAll _)
        .orderBy("marker")
    },
    Some {
      val markers = InjectionMarkers
      // DuckDB string literals keep backslashes as-is, so the raw marker
      // text serves both as the label and the regex
      markers.map { m =>
        s"""SELECT '${m.replace("'", "''")}' AS marker,
           |  CAST(SUM(CASE WHEN regexp_matches(lower(text), '${m.replace("'", "''")}') THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           |  COUNT(*) AS n_docs FROM documents""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY marker")
    })

  private val q5 = QueryDef(
    "p6_retained_capsules",
    (s, dir) => {
      // EMBER retained-evidence capsules (retained.rs:147-210): rank by a
      // recoverability proxy, greedy-pack excerpt capsules under a token
      // budget — running-sum window, budget checked BEFORE each candidate
      val d = Tables.documents(s, dir)
        .withColumn("est_tokens", TextOps.estTokens(col("text")))
        .withColumn("recoverability",
          round(col("n_chars").cast("double") / 1000.0, 6))
      val w = Window.orderBy(col("recoverability").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      d.orderBy(col("recoverability").desc, col("doc_id")).limit(200)
        .withColumn("tokens_before", coalesce(sum(col("est_tokens")).over(w), lit(0L)))
        .filter(col("tokens_before") < 2000)
        .withColumn("capsule", TextOps.excerpt(col("text"), 40))
        .select("doc_id", "recoverability", "est_tokens", "tokens_before", "capsule")
        .orderBy(col("recoverability").desc, col("doc_id"))
    },
    Some("""
      WITH ranked AS (
        SELECT doc_id, text,
               CAST(CEIL(len(text) / 4.0) AS BIGINT) AS est_tokens,
               ROUND(CAST(n_chars AS DOUBLE) / 1000.0, 6) AS recoverability
        FROM documents
        ORDER BY recoverability DESC, doc_id
        LIMIT 200),
      budgeted AS (
        SELECT doc_id, text, recoverability, est_tokens,
               CAST(COALESCE(SUM(est_tokens) OVER (ORDER BY recoverability DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        FROM ranked)
      SELECT doc_id, recoverability, est_tokens, tokens_before,
             CASE WHEN len((list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1]) <= 40
                  THEN (list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1]
                  ELSE substr((list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1], 1, 40) || '…' END AS capsule
      FROM budgeted
      WHERE tokens_before < 2000
      ORDER BY recoverability DESC, doc_id"""))

  private val q6 = QueryDef(
    "p7_orientation_cache",
    (s, dir) => {
      // PEEK orientation cache (orientation_cache.rs:93-739): per
      // namespace (source), distill the most-frequent informative tokens
      // into a constant-budget context map entry
      val stop = Seq("the", "a", "of", "and", "to", "in")
      val toks = Tables.documents(s, dir)
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
        .filter(!col("tok").isin(stop.map(lit): _*))
      val counts = toks.groupBy("source", "tok").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("source")).orderBy(col("n").desc, col("tok"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .groupBy("source")
        .agg(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("rn"), col("tok")))),
            p => p.getField("tok"))).as("orientation"),
          sum(col("n")).as("mass"))
        .orderBy("source")
    },
    Some("""
      WITH toks AS (
        SELECT source, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                 x -> len(x) > 0)) AS tok
        FROM documents),
      counts AS (
        SELECT source, tok, COUNT(*) AS n
        FROM toks
        WHERE tok NOT IN ('the', 'a', 'of', 'and', 'to', 'in')
        GROUP BY source, tok),
      top AS (
        SELECT source, tok, n,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, tok) AS rn
        FROM counts)
      SELECT source,
             string_agg(tok, ' ' ORDER BY rn) AS orientation,
             CAST(SUM(n) AS BIGINT) AS mass
      FROM top
      WHERE rn <= 5
      GROUP BY source
      ORDER BY source"""))

  private val q7 = QueryDef(
    "a10_ebbinghaus",
    (s, dir) => {
      // Ebbinghaus decay lane (score/decay.rs:30-102):
      // clamp(0.5^(age/half_life) + log2(1+hits)·0.05, floor, 1.0)
      val ageH = (lit(NowMicros) - col("ts")).cast("double") / 3.6e9
      val hits = coalesce(
        get_json_object(col("props"), "$.k").cast("double"), lit(0.0))
      val retention = least(lit(1.0), greatest(lit(0.05),
        pow(lit(0.5), ageH / 168.0) + log2(lit(1.0) + hits) * 0.05))
      Tables.events(s, dir)
        .withColumn("retention", round(retention, 6))
        .select("event_id", "user_id", "retention")
        .orderBy(col("retention").desc, col("event_id"))
        .limit(100)
    },
    Some("""
      WITH r AS (
        SELECT event_id, user_id,
               ROUND(LEAST(1.0, GREATEST(0.05,
                 pow(0.5, (CAST(1706745600000000 - epoch_us(ts) AS DOUBLE) / 3.6e9) / 168.0)
                 + log2(1.0 + COALESCE(CAST(json_extract_string(props, '$.k') AS DOUBLE), 0.0)) * 0.05)), 6) AS retention
        FROM events)
      SELECT event_id, user_id, retention
      FROM r
      ORDER BY retention DESC, event_id
      LIMIT 100"""))

  /** P7 as a MAINTAINED store: two successive recall batches (even then
    * odd doc_ids) drive the production upsert + token-budget eviction
    * of [[graft.api.OrientationCache]]; the ORACLE checks the exact end
    * state — freqs accumulated across batches, last_seen split between
    * the two update times, and the evictor having dropped the
    * lowest-priority entries per namespace (budget 64). Output is
    * integer/string only, so the hash compare is float-free; priority
    * only orders the eviction window, identically in both engines. */
  private val q8 = QueryDef(
    "p7b_orientation_store",
    (s, dir) => {
      import graft.api.OrientationCache
      val Now1 = 1706745600L // 2024-02-01
      val Now2 = 1706832000L // 2024-02-02
      val Budget = 64
      val docs = Tables.documents(s, dir)
      def batch(parity: Int) =
        OrientationCache.distill(
          docs.filter(col("doc_id") % 2 === parity), col("source"), col("text"))
      val s1 = OrientationCache.evict(
        OrientationCache.upsert(
          docs.sparkSession.emptyDataFrame
            .withColumn("namespace", lit("")).withColumn("key", lit(""))
            .withColumn("freq", lit(0L)).withColumn("last_seen", lit(0L))
            .withColumn("value", lit("")).limit(0),
          batch(0), Now1),
        Budget, Now1)
      val s2 = OrientationCache.evict(
        OrientationCache.upsert(s1, batch(1), Now2), Budget, Now2)
      s2.select(col("namespace"), col("key"), col("freq"),
          col("last_seen"), col("tokens"))
        .orderBy("namespace", "key")
    },
    Some("""
      WITH toks AS (
        SELECT source AS ns, doc_id,
               unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                 x -> len(x) > 0)) AS key
        FROM documents),
      f AS (
        SELECT ns, doc_id, key FROM toks
        WHERE len(key) >= 3 AND key NOT IN ('the', 'a', 'of', 'and', 'to', 'in')),
      b1 AS (SELECT ns, key, COUNT(*) AS occ FROM f WHERE doc_id % 2 = 0 GROUP BY 1, 2),
      b2 AS (SELECT ns, key, COUNT(*) AS occ FROM f WHERE doc_id % 2 = 1 GROUP BY 1, 2),
      s1 AS (
        SELECT ns, key, occ AS freq, 1706745600 AS last_seen, key AS value,
               GREATEST(CAST(CEIL(CAST(len(key || ': ' || key) AS DOUBLE) / 4.0) AS BIGINT), 1) AS tokens
        FROM b1),
      s1p AS (
        SELECT *, freq * (1.0 / (1.0 + CAST(GREATEST(1706745600 - last_seen, 0) AS DOUBLE) / 86400.0))
                  * GREATEST(1.0 - CAST(tokens AS DOUBLE) / 64, 0.05) AS pri
        FROM s1),
      s1w AS (
        SELECT *, SUM(tokens) OVER (PARTITION BY ns) AS total,
               COALESCE(SUM(tokens) OVER (PARTITION BY ns ORDER BY pri ASC, key ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prevcum
        FROM s1p),
      s1e AS (SELECT ns, key, freq, last_seen, value FROM s1w WHERE total - prevcum <= 64),
      m2 AS (
        SELECT COALESCE(a.ns, b.ns) AS ns, COALESCE(a.key, b.key) AS key,
               COALESCE(a.freq, 0) + COALESCE(b.occ, 0) AS freq,
               CASE WHEN b.key IS NOT NULL THEN 1706832000 ELSE a.last_seen END AS last_seen,
               COALESCE(b.key, a.value) AS value
        FROM s1e a FULL OUTER JOIN b2 b ON a.ns = b.ns AND a.key = b.key),
      m2t AS (
        SELECT *, GREATEST(CAST(CEIL(CAST(len(key || ': ' || value) AS DOUBLE) / 4.0) AS BIGINT), 1) AS tokens
        FROM m2),
      s2p AS (
        SELECT *, freq * (1.0 / (1.0 + CAST(GREATEST(1706832000 - last_seen, 0) AS DOUBLE) / 86400.0))
                  * GREATEST(1.0 - CAST(tokens AS DOUBLE) / 64, 0.05) AS pri
        FROM m2t),
      s2w AS (
        SELECT *, SUM(tokens) OVER (PARTITION BY ns) AS total,
               COALESCE(SUM(tokens) OVER (PARTITION BY ns ORDER BY pri ASC, key ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prevcum
        FROM s2p)
      SELECT ns AS namespace, key, freq, last_seen, tokens
      FROM s2w
      WHERE total - prevcum <= 64
      ORDER BY namespace, key"""))

  val all: Seq[QueryDef] = Seq(q1, q2, q3, q4, q5, q6, q7, q8)
}
