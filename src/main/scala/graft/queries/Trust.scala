package graft.queries

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trust-policy filtering and experience-plan retrieval.
  *
  * f3: the ReasoningTrustPolicy admit/exclude/rerank pass (SURVEY F3,
  * retrieval.rs:325-434) — provenance class parsed from metadata JSON
  * (fail-closed to `unverified`), Quarantine drops the row, DownWeight
  * multiplies the score and re-sorts. Pure `when/otherwise` column
  * algebra over the scored frame.
  *
  * x8: experience-plan recall (SURVEY §2.11 `recall_plan`,
  * experience.rs:152-357) — signature-token Jaccard match of queries
  * against a stored plan library; per query keep the best plan above
  * threshold. The match is a broadcast join of the (small) query set
  * against the plan library with set-similarity column math.
  */
object Trust extends QueryGroup {

  /** x8's query sample: first 32 multiples of 101 — fixed-size, so the
    * broadcast query-token side is constant in corpus size (the
    * MaxQueries pattern from [[Similarity]]). */
  private val MaxPlanQueries = 32
  private val MaxPlanQueryId = 101L * MaxPlanQueries // 3232

  private val q1 = QueryDef(
    "f3_trust_rerank",
    (s, dir) => {
      // provenance class derived from props.k (fail-closed): k missing ->
      // unverified; k%10==0 -> forged (quarantine); k%3==0 -> unverified
      // (downweight 0.5); else verified (keep)
      val k = get_json_object(col("props"), "$.k").cast("long")
      val cls = when(k.isNull, "unverified")
        .when(k % 10 === 0, "forged")
        .when(k % 3 === 0, "unverified")
        .otherwise("verified")
      val weighted = when(col("trust_class") === "unverified", col("value") * 0.5)
        .otherwise(col("value"))
      Tables.events(s, dir)
        .withColumn("trust_class", cls)
        .filter(col("trust_class") =!= "forged") // quarantine
        .withColumn("score", round(weighted, 6))
        .select("event_id", "user_id", "trust_class", "score")
        .orderBy(col("score").desc, col("event_id"))
        .limit(100)
    },
    Some("""
      WITH t AS (
        SELECT event_id, user_id, value,
               CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 'unverified'
                    WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 0 THEN 'forged'
                    WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 = 0 THEN 'unverified'
                    ELSE 'verified' END AS trust_class
        FROM events)
      SELECT event_id, user_id, trust_class,
             ROUND(CASE WHEN trust_class = 'unverified' THEN value * 0.5 ELSE value END, 6) AS score
      FROM t
      WHERE trust_class <> 'forged'
      ORDER BY score DESC, event_id
      LIMIT 100"""))

  private val q2 = QueryDef(
    "x8_plan_match",
    (s, dir) => {
      // plan library = all documents; queries = the first MaxPlanQueries
      // multiples of 101 — a FIXED-size deterministic sample, so the
      // broadcast query-token side is O(1) in corpus size (a bare
      // `% 101` pick is ~1/101 of ALL corpus tokens — unbounded at
      // 100×, the round-4 scale flag); match = signature-token Jaccard,
      // keep best plan >= 0.2. Scalable formulation: |A∩B| comes from
      // an exploded token equi-join (hash join on the token),
      // |A∪B| = |A|+|B|−|A∩B| — never a pairwise array scan, so cost is
      // O(matching tokens), not O(plans × queries × set size).
      // Zero-overlap pairs drop out naturally (their Jaccard 0 can't
      // reach the threshold).
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.tokenSet(col("text")).as("sig"))
        .cache() // tokenized once, read by both the query and plan sides
      val queries = d.filter(col("doc_id") % 101 === 0 &&
          col("doc_id") < MaxPlanQueryId)
        .select(col("doc_id").as("query_id"), col("sig").as("qsig"),
          size(col("sig")).as("nq"))
      val qTokens = queries.select(col("query_id"), col("nq"),
        explode(col("qsig")).as("tok"))
      val planTokens = d.filter(col("doc_id") % 101 =!= 0)
        .select(col("doc_id").as("plan_id"), size(col("sig")).as("np"),
          explode(col("sig")).as("tok"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("jac").desc, col("plan_id"))
      planTokens.join(broadcast(qTokens), "tok")
        .groupBy("query_id", "plan_id", "nq", "np")
        .agg(count(lit(1)).as("ninter"))
        .withColumn("jac",
          col("ninter").cast("double") / (col("nq") + col("np") - col("ninter")))
        .filter(col("jac") >= 0.2)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("plan_id"), round(col("jac"), 6).as("jaccard"))
        .orderBy("query_id")
    },
    Some(s"""
      WITH sigs AS (
        SELECT doc_id,
               list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                 x -> len(x) > 0)) AS sig
        FROM documents),
      q AS (SELECT doc_id AS query_id, sig AS qsig FROM sigs
            WHERE doc_id % 101 = 0 AND doc_id < $MaxPlanQueryId),
      plans AS (SELECT doc_id AS plan_id, sig FROM sigs WHERE doc_id % 101 <> 0),
      scored AS (
        SELECT query_id, plan_id,
               CAST(len(list_intersect(sig, qsig)) AS DOUBLE)
                 / len(list_distinct(list_concat(sig, qsig))) AS jac
        FROM plans CROSS JOIN q)
      SELECT query_id, plan_id, ROUND(jac, 6) AS jaccard
      FROM (SELECT query_id, plan_id, jac,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY jac DESC, plan_id) AS rn
            FROM scored
            WHERE jac >= 0.2)
      WHERE rn = 1
      ORDER BY query_id"""))

  /** x15: agent-on-agent deal ledger with dispute detection — the
    * reference's chained-HMAC deal log (mnemo-deal/src/lib.rs:1-30,
    * envelope.rs:19-27, dispute.rs:23-42) as one window-chain pass.
    * Deals are signed into per-ledger hash chains (content hash over
    * the canonical field concatenation, keyed; linkage + row MAC as in
    * [[graft.functions.HashChain]]); a deterministic subset of stored
    * terms is then tampered post-signing, and the verify walk reports
    * each ledger's first divergence as (offset, expected, actual) —
    * the DisputeReport shape. The real HMAC-SHA256 lives in
    * functions/CryptoOps (P8, spec-covered); this query uses the
    * keyed-sha canonical form both engines compute bit-identically.
    * Scale: one window over ledger partitions + one hash aggregate —
    * no joins, no driver state. */
  private val q3 = QueryDef(
    "x15_deal_ledger",
    (s, dir) => {
      import graft.functions.HashChain
      val key = "deal-ledger-key"
      val w = Window.partitionBy(col("ledger_id")).orderBy(col("signed_at"), col("deal_id"))
      def canonical(terms: Column) = sha2(concat_ws(HashChain.Sep, lit(key),
        col("deal_id").cast("string"), col("buyer"), col("seller"),
        terms.cast("string"), col("signed_at").cast("string")), 256)
      val signed = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 13 === 0)
        .select(
          col("o_orderkey").as("deal_id"),
          (col("o_custkey") % 16).as("ledger_id"),
          concat(lit("agent-"), col("o_custkey")).as("buyer"),
          concat(lit("agent-"), col("o_orderkey") % 997).as("seller"),
          col("o_totalprice").cast("decimal(12,2)").as("terms"),
          col("o_orderdate").cast("date").as("signed_at"))
        .withColumn("content_hash", canonical(col("terms")))
        .withColumn("deal_offset", (row_number().over(w) - 1).cast("bigint"))
        .withColumn("prev_hash", coalesce(lag(col("content_hash"), 1).over(w), lit("")))
        .withColumn("mac", sha2(concat(col("content_hash"), col("prev_hash")), 256))
        // post-signing tamper: a hostile party edits the stored terms
        .withColumn("observed_terms",
          when(col("deal_id") % 29 === 0, col("terms") + lit(0.01))
            .otherwise(col("terms")).cast("decimal(12,2)"))
      val verified = signed
        .withColumn("recomputed", canonical(col("observed_terms")))
        .withColumn("row_valid",
          col("recomputed") === col("content_hash") &&
            col("mac") === sha2(concat(col("content_hash"), col("prev_hash")), 256))
      verified.groupBy("ledger_id")
        .agg(
          count(lit(1)).as("n_deals"),
          count(when(!col("row_valid"), 1)).as("n_invalid"),
          min(when(!col("row_valid"), struct(
            col("deal_offset").as("o"), col("content_hash").as("e"),
            col("recomputed").as("a")))).as("d"))
        .select(col("ledger_id"), col("n_deals"), col("n_invalid"),
          (col("n_invalid") === 0).as("chain_valid"),
          col("d.o").as("divergent_offset"),
          col("d.e").as("expected_hash"),
          col("d.a").as("actual_hash"))
        .orderBy("ledger_id")
    },
    Some("""
      WITH deals AS (
        SELECT o_orderkey AS deal_id,
               o_custkey % 16 AS ledger_id,
               'agent-' || CAST(o_custkey AS VARCHAR) AS buyer,
               'agent-' || CAST(o_orderkey % 997 AS VARCHAR) AS seller,
               CAST(o_totalprice AS DECIMAL(12,2)) AS terms,
               CAST(o_orderdate AS DATE) AS signed_at
        FROM orders WHERE o_orderkey % 13 = 0),
      signed AS (
        SELECT *,
               sha256('deal-ledger-key' || chr(1) || CAST(deal_id AS VARCHAR) || chr(1) || buyer
                 || chr(1) || seller || chr(1) || CAST(terms AS VARCHAR)
                 || chr(1) || CAST(signed_at AS VARCHAR)) AS content_hash,
               CAST(ROW_NUMBER() OVER (PARTITION BY ledger_id ORDER BY signed_at, deal_id) - 1 AS BIGINT) AS deal_offset,
               COALESCE(LAG(sha256('deal-ledger-key' || chr(1) || CAST(deal_id AS VARCHAR) || chr(1) || buyer
                 || chr(1) || seller || chr(1) || CAST(terms AS VARCHAR)
                 || chr(1) || CAST(signed_at AS VARCHAR)))
                 OVER (PARTITION BY ledger_id ORDER BY signed_at, deal_id), '') AS prev_hash,
               CAST(CASE WHEN deal_id % 29 = 0 THEN terms + 0.01 ELSE terms END AS DECIMAL(12,2)) AS observed_terms
        FROM deals),
      verified AS (
        SELECT *,
               sha256('deal-ledger-key' || chr(1) || CAST(deal_id AS VARCHAR) || chr(1) || buyer
                 || chr(1) || seller || chr(1) || CAST(observed_terms AS VARCHAR)
                 || chr(1) || CAST(signed_at AS VARCHAR)) AS recomputed
        FROM signed)
      SELECT ledger_id, COUNT(*) AS n_deals,
             COUNT(CASE WHEN recomputed <> content_hash THEN 1 END) AS n_invalid,
             COUNT(CASE WHEN recomputed <> content_hash THEN 1 END) = 0 AS chain_valid,
             min(CASE WHEN recomputed <> content_hash
                 THEN struct_pack(o := deal_offset, e := content_hash, a := recomputed) END).o AS divergent_offset,
             min(CASE WHEN recomputed <> content_hash
                 THEN struct_pack(o := deal_offset, e := content_hash, a := recomputed) END).e AS expected_hash,
             min(CASE WHEN recomputed <> content_hash
                 THEN struct_pack(o := deal_offset, e := content_hash, a := recomputed) END).a AS actual_hash
      FROM verified
      GROUP BY ledger_id
      ORDER BY ledger_id"""))

  /** x16: advisory reputation score over the x15 deal frame — the
    * reference's `compute_reputation` (mnemo-deal/src/reputation.rs:
    * 54-101): every envelope an agent participates in (buyer OR
    * seller) counts as completed with a 90-day-half-life decay weight;
    * each dispute (a tampered deal the agent touches, per x15's verify
    * walk) applies a 10% penalty of the weighted-completed mass; score
    * clamps to [0,1] with the near-zero-weight → neutral-0.5 fallback.
    * Weights are 6dp-rounded DECIMAL sums (repo convention) so the
    * aggregate is partition-order-independent; the as-of instant is a
    * pinned literal (no now(), repo convention). Scale: explode to
    * (agent, deal) participation rows, then ONE hash aggregate per
    * agent — no joins, no windows. */
  private val q4 = QueryDef(
    "x16_deal_reputation",
    (s, dir) => {
      val halfLifeDays = 90.0
      val asOf = lit("1998-12-31").cast("date")
      val parts = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 13 === 0)
        .select(
          col("o_orderkey").as("deal_id"),
          concat(lit("agent-"), col("o_custkey")).as("buyer"),
          concat(lit("agent-"), col("o_orderkey") % 997).as("seller"),
          col("o_orderdate").cast("date").as("signed_at"),
          (col("o_orderkey") % 29 === 0).as("disputed"))
        .select(explode(array(col("buyer"), col("seller"))).as("agent"),
          col("signed_at"), col("disputed"))
        .withColumn("age_days", datediff(asOf, col("signed_at")).cast("double"))
        .withColumn("w",
          round(pow(lit(0.5), col("age_days") / halfLifeDays), 6)
            .cast("decimal(12,6)"))
      val rep = parts.groupBy("agent").agg(
        count(lit(1)).as("completed"),
        count(when(col("disputed"), 1)).as("disputed"),
        sum(col("w")).as("wt"),
        sum((col("age_days") * 86400000L).cast("long")).as("settle_ms_total"))
      rep.select(
        col("agent"), col("completed"), col("disputed"),
        floor(col("settle_ms_total") / col("completed")).cast("bigint")
          .as("mean_settlement_ms"),
        round(when(col("wt").cast("double") < 1e-6, 0.5)
          .otherwise(least(lit(1.0), greatest(lit(0.0),
            (col("wt") - lit(0.1) * col("disputed") * col("wt")).cast("double")
              / col("wt").cast("double")))), 6).as("score"))
        .orderBy("agent")
    },
    Some("""
      WITH parts AS (
        SELECT unnest(['agent-' || CAST(o_custkey AS VARCHAR),
                       'agent-' || CAST(o_orderkey % 997 AS VARCHAR)]) AS agent,
               CAST(o_orderdate AS DATE) AS signed_at,
               o_orderkey % 29 = 0 AS disputed
        FROM orders WHERE o_orderkey % 13 = 0),
      weighted AS (
        SELECT agent, disputed,
               CAST(datediff('day', signed_at, DATE '1998-12-31') AS DOUBLE) AS age_days,
               CAST(ROUND(POW(0.5, CAST(datediff('day', signed_at, DATE '1998-12-31') AS DOUBLE) / 90.0), 6)
                 AS DECIMAL(12,6)) AS w
        FROM parts),
      rep AS (
        SELECT agent, COUNT(*) AS completed,
               COUNT(CASE WHEN disputed THEN 1 END) AS disputed,
               SUM(w) AS wt,
               SUM(CAST(age_days * 86400000 AS BIGINT)) AS settle_ms_total
        FROM weighted GROUP BY agent)
      SELECT agent, completed, disputed,
             CAST(FLOOR(settle_ms_total / completed) AS BIGINT) AS mean_settlement_ms,
             ROUND(CASE WHEN CAST(wt AS DOUBLE) < 0.000001 THEN 0.5
                   ELSE LEAST(1.0, GREATEST(0.0,
                     CAST(wt - 0.1 * disputed * wt AS DOUBLE) / CAST(wt AS DOUBLE)))
                   END, 6) AS score
      FROM rep
      ORDER BY agent"""))

  /** w7: tail-truncation detection over the x15 deal-ledger frame —
    * deliberately EXCEEDING reference parity: the reference documents
    * that deleting the newest envelopes is NOT caught by its verify
    * walk (every remaining link still verifies; BASELINE.md notes the
    * gap, dispute.rs:23-42 only recomputes links). The cheap fix the
    * ledger API shape already provides ([[graft.api.DealLedger
    * .headHashes]]): register each ledger's (length, head hash) at
    * signing time, then compare the observed chain against the
    * registration. Here the registration is computed over the full
    * signed frame, truncation is simulated by dropping each marked
    * ledger's last two envelopes, and the detector reports
    * n_missing + head mismatch per ledger.
    * Scale: ONE window pass for offsets/registration bounds, one
    * aggregate with conditional legs — no joins, no second scan. */
  private val q5 = QueryDef(
    "w7_tail_truncation",
    (s, dir) => {
      import graft.functions.HashChain
      val key = "deal-ledger-key"
      val w = Window.partitionBy(col("ledger_id")).orderBy(col("signed_at"), col("deal_id"))
      def canonical(terms: Column) = sha2(concat_ws(HashChain.Sep, lit(key),
        col("deal_id").cast("string"), col("buyer"), col("seller"),
        terms.cast("string"), col("signed_at").cast("string")), 256)
      val signed = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 13 === 0)
        .select(
          col("o_orderkey").as("deal_id"),
          (col("o_custkey") % 16).as("ledger_id"),
          concat(lit("agent-"), col("o_custkey")).as("buyer"),
          concat(lit("agent-"), col("o_orderkey") % 997).as("seller"),
          col("o_totalprice").cast("decimal(12,2)").as("terms"),
          col("o_orderdate").cast("date").as("signed_at"))
        .withColumn("content_hash", canonical(col("terms")))
        .withColumn("deal_offset", (row_number().over(w) - 1).cast("bigint"))
        // the signing-time registration bound, from the same window pass
        .withColumn("reg_len",
          (max(col("deal_offset")).over(Window.partitionBy(col("ledger_id"))) + 1))
        // truncation attack: ledgers ≡ 0 (mod 5) lose their newest two
        // envelopes from the OBSERVED store; the registration predates it
        .withColumn("observed",
          !(col("ledger_id") % 5 === 0 && col("deal_offset") >= col("reg_len") - 2))
      signed.groupBy("ledger_id")
        .agg(
          max(col("deal_offset") + 1).as("registered_len"),
          max(struct(col("deal_offset"), col("content_hash"))).as("rh"),
          count(when(col("observed"), 1)).as("observed_len"),
          max(when(col("observed"),
            struct(col("deal_offset"), col("content_hash")))).as("oh"))
        .select(col("ledger_id"), col("registered_len"), col("observed_len"),
          (col("registered_len") - col("observed_len")).as("n_missing"),
          col("rh.content_hash").as("registered_head"),
          col("oh.content_hash").as("observed_head"),
          (col("observed_len") < col("registered_len") ||
            col("oh.content_hash") =!= col("rh.content_hash")).as("truncated"))
        .orderBy("ledger_id")
    },
    Some("""
      WITH deals AS (
        SELECT o_orderkey AS deal_id,
               o_custkey % 16 AS ledger_id,
               'agent-' || CAST(o_custkey AS VARCHAR) AS buyer,
               'agent-' || CAST(o_orderkey % 997 AS VARCHAR) AS seller,
               CAST(o_totalprice AS DECIMAL(12,2)) AS terms,
               CAST(o_orderdate AS DATE) AS signed_at
        FROM orders WHERE o_orderkey % 13 = 0),
      signed AS (
        SELECT *,
               sha256('deal-ledger-key' || chr(1) || CAST(deal_id AS VARCHAR) || chr(1) || buyer
                 || chr(1) || seller || chr(1) || CAST(terms AS VARCHAR)
                 || chr(1) || CAST(signed_at AS VARCHAR)) AS content_hash,
               CAST(ROW_NUMBER() OVER (PARTITION BY ledger_id ORDER BY signed_at, deal_id) - 1 AS BIGINT) AS deal_offset
        FROM deals),
      bounded AS (
        SELECT *,
               MAX(deal_offset) OVER (PARTITION BY ledger_id) + 1 AS reg_len
        FROM signed),
      observed AS (
        SELECT *,
               NOT (ledger_id % 5 = 0 AND deal_offset >= reg_len - 2) AS observed
        FROM bounded)
      SELECT ledger_id,
             MAX(deal_offset + 1) AS registered_len,
             COUNT(CASE WHEN observed THEN 1 END) AS observed_len,
             MAX(deal_offset + 1) - COUNT(CASE WHEN observed THEN 1 END) AS n_missing,
             MAX(struct_pack(o := deal_offset, h := content_hash)).h AS registered_head,
             MAX(CASE WHEN observed THEN struct_pack(o := deal_offset, h := content_hash) END).h AS observed_head,
             (COUNT(CASE WHEN observed THEN 1 END) < MAX(deal_offset + 1)
               OR MAX(CASE WHEN observed THEN struct_pack(o := deal_offset, h := content_hash) END).h
                  <> MAX(struct_pack(o := deal_offset, h := content_hash)).h) AS truncated
      FROM observed
      GROUP BY ledger_id
      ORDER BY ledger_id"""))

  /** w8: payload-forge detection over the x15 deal-ledger frame — the
    * reference's OTHER disclosed audit gap (BASELINE.md: payload-only
    * forge not caught; dispute.rs:23-42 only recomputes links). Three
    * attacker tiers on disjoint deal subsets, each relinking the chain
    * downstream of its edit (the strongest version of each attacker):
    *
    *  - `keyless`: edits stored terms and recomputes content hash + mac
    *    WITHOUT the signing key. The verify walk recomputes
    *    canonical(terms) with the true key → caught row-level, because
    *    the canonical hash is keyed (the reference's gap is only real
    *    when envelopes are unkeyed — ours are).
    *  - `keyed_head`: attacker HAS the key and rewrites the newest
    *    envelope (the economically interesting forge: final terms).
    *    Every link re-verifies, so the walk passes — caught ONLY by the
    *    w7 signing-time registration (the head hash on record no longer
    *    matches the observed head).
    *  - `keyed_mid`: attacker has the key, rewrites a mid-chain
    *    envelope and relinks the suffix. The walk passes AND the
    *    (length, head-hash) registration passes — `n_undetected` > 0 is
    *    this query REPORTING ITS OWN detection boundary: content
    *    hashes cover single envelopes, so the head hash does not commit
    *    to interior rows. Closing it needs a recursively-accumulated
    *    chain digest (or per-envelope countersignatures) registered
    *    out-of-band — a different trust anchor, documented here rather
    *    than faked.
    *
    * Scale: one ordered window pass (offsets, relink lag) + one
    * unordered ledger window (registration heads) + one hash aggregate;
    * no joins. */
  private val q6 = QueryDef(
    "w8_payload_forge",
    (s, dir) => {
      import graft.functions.HashChain
      val key = "deal-ledger-key"
      val w = Window.partitionBy(col("ledger_id")).orderBy(col("signed_at"), col("deal_id"))
      val wl = Window.partitionBy(col("ledger_id"))
      def canonicalWith(k: String, terms: Column) = sha2(concat_ws(HashChain.Sep,
        lit(k), col("deal_id").cast("string"), col("buyer"), col("seller"),
        terms.cast("string"), col("signed_at").cast("string")), 256)
      def canonical(terms: Column) = canonicalWith(key, terms)
      val signed = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 13 === 0)
        .select(
          col("o_orderkey").as("deal_id"),
          (col("o_custkey") % 16).as("ledger_id"),
          concat(lit("agent-"), col("o_custkey")).as("buyer"),
          concat(lit("agent-"), col("o_orderkey") % 997).as("seller"),
          col("o_totalprice").cast("decimal(12,2)").as("terms"),
          col("o_orderdate").cast("date").as("signed_at"))
        .withColumn("content_hash", canonical(col("terms")))
        .withColumn("deal_offset", (row_number().over(w) - 1).cast("bigint"))
        .withColumn("reg_len",
          max(col("deal_offset")).over(wl) + 1)
        // keyed_mid requires reg_len > 2 (same guard as w9): on a
        // 2-deal ledger offset 1 IS the head, and mislabeling the head
        // forge as mid-chain would flip the tier's documented
        // evades-registration boundary
        .withColumn("tier",
          when(col("deal_id") % 29 === 0, "keyless")
            .when(col("ledger_id") % 5 === 1 &&
              col("deal_offset") === col("reg_len") - 1, "keyed_head")
            .when(col("ledger_id") % 5 === 2 && col("reg_len") > 2 &&
              col("deal_offset") === 1, "keyed_mid")
            .otherwise("none"))
        .withColumn("observed_terms",
          when(col("tier") =!= "none", col("terms") + lit(0.01))
            .otherwise(col("terms")).cast("decimal(12,2)"))
        .withColumn("observed_content",
          when(col("tier") === "keyless",
            canonicalWith("stolen-guess", col("observed_terms")))
            .when(col("tier").isin("keyed_head", "keyed_mid"),
              canonical(col("observed_terms")))
            .otherwise(col("content_hash")))
        .withColumn("observed_prev",
          coalesce(lag(col("observed_content"), 1).over(w), lit("")))
        .withColumn("observed_mac",
          sha2(concat(col("observed_content"), col("observed_prev")), 256))
      val verified = signed
        // the verify walk: recompute the keyed canonical over observed
        // payloads, re-derive the mac over observed linkage (dispute.rs's
        // two checks — the mac leg passes against a relinking attacker,
        // which is exactly why the canonical leg must be keyed)
        .withColumn("walk_flag",
          canonical(col("observed_terms")) =!= col("observed_content") ||
            col("observed_mac") =!=
              sha2(concat(col("observed_content"), col("observed_prev")), 256))
        // the w7 signing-time registration: head hash on record vs head
        // hash observed (length is unchanged by a pure payload forge)
        .withColumn("reg_head",
          max(struct(col("deal_offset"), col("content_hash"))).over(wl)
            .getField("content_hash"))
        .withColumn("obs_head",
          max(struct(col("deal_offset"), col("observed_content"))).over(wl)
            .getField("observed_content"))
        .withColumn("reg_caught", col("obs_head") =!= col("reg_head"))
      verified.groupBy("ledger_id")
        .agg(
          count(lit(1)).as("n_deals"),
          count(when(col("tier") =!= "none", 1)).as("n_forged"),
          count(when(col("walk_flag"), 1)).as("n_walk_caught"),
          min(when(col("walk_flag"), col("deal_offset"))).as("walk_first_offset"),
          (max(when(col("reg_caught"), 1).otherwise(0)) === 1).as("registration_caught"),
          count(when(col("tier") =!= "none" && !col("walk_flag") &&
            !col("reg_caught"), 1)).as("n_undetected"))
        .orderBy("ledger_id")
    },
    Some("""
      WITH deals AS (
        SELECT o_orderkey AS deal_id,
               o_custkey % 16 AS ledger_id,
               'agent-' || CAST(o_custkey AS VARCHAR) AS buyer,
               'agent-' || CAST(o_orderkey % 997 AS VARCHAR) AS seller,
               CAST(o_totalprice AS DECIMAL(12,2)) AS terms,
               CAST(o_orderdate AS DATE) AS signed_at
        FROM orders WHERE o_orderkey % 13 = 0),
      signed AS (
        SELECT *,
               sha256('deal-ledger-key' || chr(1) || CAST(deal_id AS VARCHAR) || chr(1) || buyer
                 || chr(1) || seller || chr(1) || CAST(terms AS VARCHAR)
                 || chr(1) || CAST(signed_at AS VARCHAR)) AS content_hash,
               CAST(ROW_NUMBER() OVER (PARTITION BY ledger_id ORDER BY signed_at, deal_id) - 1 AS BIGINT) AS deal_offset
        FROM deals),
      bounded AS (
        SELECT *,
               MAX(deal_offset) OVER (PARTITION BY ledger_id) + 1 AS reg_len
        FROM signed),
      tiered AS (
        SELECT *,
               CASE WHEN deal_id % 29 = 0 THEN 'keyless'
                    WHEN ledger_id % 5 = 1 AND deal_offset = reg_len - 1 THEN 'keyed_head'
                    WHEN ledger_id % 5 = 2 AND reg_len > 2 AND deal_offset = 1 THEN 'keyed_mid'
                    ELSE 'none' END AS tier
        FROM bounded),
      observed AS (
        SELECT *,
               CAST(CASE WHEN tier <> 'none' THEN terms + 0.01 ELSE terms END AS DECIMAL(12,2)) AS observed_terms
        FROM tiered),
      forged AS (
        SELECT *,
               CASE WHEN tier = 'keyless'
                 THEN sha256('stolen-guess' || chr(1) || CAST(deal_id AS VARCHAR) || chr(1) || buyer
                   || chr(1) || seller || chr(1) || CAST(observed_terms AS VARCHAR)
                   || chr(1) || CAST(signed_at AS VARCHAR))
                 WHEN tier IN ('keyed_head', 'keyed_mid')
                 THEN sha256('deal-ledger-key' || chr(1) || CAST(deal_id AS VARCHAR) || chr(1) || buyer
                   || chr(1) || seller || chr(1) || CAST(observed_terms AS VARCHAR)
                   || chr(1) || CAST(signed_at AS VARCHAR))
                 ELSE content_hash END AS observed_content
        FROM observed),
      linked AS (
        SELECT *,
               COALESCE(LAG(observed_content) OVER (PARTITION BY ledger_id ORDER BY signed_at, deal_id), '') AS observed_prev
        FROM forged),
      verified AS (
        SELECT *,
               sha256(observed_content || observed_prev) AS observed_mac,
               (sha256('deal-ledger-key' || chr(1) || CAST(deal_id AS VARCHAR) || chr(1) || buyer
                 || chr(1) || seller || chr(1) || CAST(observed_terms AS VARCHAR)
                 || chr(1) || CAST(signed_at AS VARCHAR)) <> observed_content) AS walk_flag,
               (MAX(struct_pack(o := deal_offset, h := content_hash)) OVER (PARTITION BY ledger_id)).h AS reg_head,
               (MAX(struct_pack(o := deal_offset, h := observed_content)) OVER (PARTITION BY ledger_id)).h AS obs_head
        FROM linked)
      SELECT ledger_id,
             COUNT(*) AS n_deals,
             COUNT(CASE WHEN tier <> 'none' THEN 1 END) AS n_forged,
             COUNT(CASE WHEN walk_flag THEN 1 END) AS n_walk_caught,
             MIN(CASE WHEN walk_flag THEN deal_offset END) AS walk_first_offset,
             MAX(CASE WHEN obs_head <> reg_head THEN 1 ELSE 0 END) = 1 AS registration_caught,
             COUNT(CASE WHEN tier <> 'none' AND NOT walk_flag AND obs_head = reg_head THEN 1 END) AS n_undetected
      FROM verified
      GROUP BY ledger_id
      ORDER BY ledger_id"""))

  /** w9: recursive-chain-digest registration — CLOSING the detection
    * boundary w8 documents. w8's `keyed_mid` tier shows that a forger
    * holding the signing key who rewrites an interior envelope and
    * relinks the suffix beats both the verify walk AND the w7
    * (length, head-hash) registration, because the registered head
    * hash commits only to the head envelope's own fields. The fix the
    * w8 scaladoc prescribes: register a recursively-accumulated digest
    * `d_i = sha256(d_{i-1} || content_hash_i)` (fold in offset order)
    * with the out-of-band trust anchor instead. Any edit to ANY
    * interior envelope changes the fold's result, so:
    *
    *  - `keyed_head` forges: caught by the head registration AND the
    *    digest (the digest subsumes w7's check);
    *  - `keyed_mid` forges: head registration still passes (reported
    *    here as head_reg_caught = false — the boundary, reproduced),
    *    but digest_caught = true. `undetected` is identically false.
    *
    * The remaining trust assumption is the anchor itself: a forger who
    * can also rewrite the registration store beats any scheme — that
    * is the definition of the trust anchor, not a detection gap.
    *
    * Scale: one ordered window pass + one hash aggregate per ledger.
    * The fold is inherently sequential WITHIN a ledger (that is what
    * makes it tamper-evident) but independent ACROSS ledgers — the
    * aggregate state is one array of fixed-width hashes per ledger,
    * bounded by deals-per-ledger; at cluster scale you would fold
    * per-segment and register intermediate digests (Merkle-style),
    * same plan shape. No joins. */
  private val q7 = QueryDef(
    "w9_chain_digest",
    (s, dir) => {
      import graft.functions.HashChain
      val key = "deal-ledger-key"
      val w = Window.partitionBy(col("ledger_id")).orderBy(col("signed_at"), col("deal_id"))
      val wl = Window.partitionBy(col("ledger_id"))
      def canonical(terms: Column) = sha2(concat_ws(HashChain.Sep, lit(key),
        col("deal_id").cast("string"), col("buyer"), col("seller"),
        terms.cast("string"), col("signed_at").cast("string")), 256)
      // the registered digest: left fold of sha256(acc || hash) over
      // the ledger's content hashes in offset order, seeded at "" —
      // hashes are fixed-width hex, so bare concat is unambiguous
      def fold(hashes: Column) = aggregate(hashes, lit(""),
        (acc, h) => sha2(concat(acc, h), 256))
      val signed = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 13 === 0)
        .select(
          col("o_orderkey").as("deal_id"),
          (col("o_custkey") % 16).as("ledger_id"),
          concat(lit("agent-"), col("o_custkey")).as("buyer"),
          concat(lit("agent-"), col("o_orderkey") % 997).as("seller"),
          col("o_totalprice").cast("decimal(12,2)").as("terms"),
          col("o_orderdate").cast("date").as("signed_at"))
        .withColumn("content_hash", canonical(col("terms")))
        .withColumn("deal_offset", (row_number().over(w) - 1).cast("bigint"))
        .withColumn("reg_len", max(col("deal_offset")).over(wl) + 1)
        // keyed_mid requires reg_len > 2, else offset 1 IS the head on a
        // 2-deal ledger and the tier's "head registration passes"
        // invariant would be vacuously violated (QueriesSpec pins it)
        .withColumn("tier",
          when(col("ledger_id") % 5 === 1 &&
            col("deal_offset") === col("reg_len") - 1, "keyed_head")
            .when(col("ledger_id") % 5 === 2 && col("reg_len") > 2 &&
              col("deal_offset") === 1, "keyed_mid")
            .otherwise("none"))
        .withColumn("observed_terms",
          when(col("tier") =!= "none", col("terms") + lit(0.01))
            .otherwise(col("terms")).cast("decimal(12,2)"))
        // the forger HAS the key in both tiers — the strongest attacker
        // the walk and w7 cannot stop
        .withColumn("observed_content",
          when(col("tier") =!= "none", canonical(col("observed_terms")))
            .otherwise(col("content_hash")))
      signed.groupBy("ledger_id")
        .agg(
          count(lit(1)).as("n_deals"),
          count(when(col("tier") =!= "none", 1)).as("n_forged"),
          max(when(col("tier") =!= "none", col("tier"))).as("forge_tier"),
          max(struct(col("deal_offset"), col("content_hash"))).as("rh"),
          max(struct(col("deal_offset"), col("observed_content"))).as("oh"),
          array_sort(collect_list(struct(col("deal_offset"), col("content_hash"))))
            .as("ra"),
          array_sort(collect_list(struct(col("deal_offset"), col("observed_content"))))
            .as("oa"))
        .select(col("ledger_id"), col("n_deals"), col("n_forged"),
          col("forge_tier"),
          fold(transform(col("ra"), x => x.getField("content_hash")))
            .as("registered_digest"),
          fold(transform(col("oa"), x => x.getField("observed_content")))
            .as("observed_digest"),
          (col("oh.observed_content") =!= col("rh.content_hash"))
            .as("head_reg_caught"))
        .withColumn("digest_caught",
          col("observed_digest") =!= col("registered_digest"))
        .withColumn("undetected",
          col("n_forged") > 0 &&
            col("observed_digest") === col("registered_digest"))
        .orderBy("ledger_id")
    },
    Some("""
      WITH deals AS (
        SELECT o_orderkey AS deal_id,
               o_custkey % 16 AS ledger_id,
               'agent-' || CAST(o_custkey AS VARCHAR) AS buyer,
               'agent-' || CAST(o_orderkey % 997 AS VARCHAR) AS seller,
               CAST(o_totalprice AS DECIMAL(12,2)) AS terms,
               CAST(o_orderdate AS DATE) AS signed_at
        FROM orders WHERE o_orderkey % 13 = 0),
      signed AS (
        SELECT *,
               sha256('deal-ledger-key' || chr(1) || CAST(deal_id AS VARCHAR) || chr(1) || buyer
                 || chr(1) || seller || chr(1) || CAST(terms AS VARCHAR)
                 || chr(1) || CAST(signed_at AS VARCHAR)) AS content_hash,
               CAST(ROW_NUMBER() OVER (PARTITION BY ledger_id ORDER BY signed_at, deal_id) - 1 AS BIGINT) AS deal_offset
        FROM deals),
      bounded AS (
        SELECT *,
               MAX(deal_offset) OVER (PARTITION BY ledger_id) + 1 AS reg_len
        FROM signed),
      tiered AS (
        SELECT *,
               CASE WHEN ledger_id % 5 = 1 AND deal_offset = reg_len - 1 THEN 'keyed_head'
                    WHEN ledger_id % 5 = 2 AND reg_len > 2 AND deal_offset = 1 THEN 'keyed_mid'
                    ELSE 'none' END AS tier
        FROM bounded),
      observed AS (
        SELECT *,
               CAST(CASE WHEN tier <> 'none' THEN terms + 0.01 ELSE terms END AS DECIMAL(12,2)) AS observed_terms
        FROM tiered),
      forged AS (
        SELECT *,
               CASE WHEN tier <> 'none'
                 THEN sha256('deal-ledger-key' || chr(1) || CAST(deal_id AS VARCHAR) || chr(1) || buyer
                   || chr(1) || seller || chr(1) || CAST(observed_terms AS VARCHAR)
                   || chr(1) || CAST(signed_at AS VARCHAR))
                 ELSE content_hash END AS observed_content
        FROM observed),
      agg AS (
        SELECT ledger_id,
               COUNT(*) AS n_deals,
               COUNT(CASE WHEN tier <> 'none' THEN 1 END) AS n_forged,
               MAX(CASE WHEN tier <> 'none' THEN tier END) AS forge_tier,
               (MAX(struct_pack(o := deal_offset, h := content_hash))).h AS reg_head,
               (MAX(struct_pack(o := deal_offset, h := observed_content))).h AS obs_head,
               list_reduce(list_prepend('', list(content_hash ORDER BY deal_offset)),
                 (acc, x) -> sha256(acc || x)) AS registered_digest,
               list_reduce(list_prepend('', list(observed_content ORDER BY deal_offset)),
                 (acc, x) -> sha256(acc || x)) AS observed_digest
        FROM forged
        GROUP BY ledger_id)
      SELECT ledger_id, n_deals, n_forged, forge_tier,
             registered_digest, observed_digest,
             (obs_head <> reg_head) AS head_reg_caught,
             (observed_digest <> registered_digest) AS digest_caught,
             (n_forged > 0 AND observed_digest = registered_digest) AS undetected
      FROM agg
      ORDER BY ledger_id"""))

  val all: Seq[QueryDef] = Seq(q1, q2, q3, q4, q5, q6, q7)
}
