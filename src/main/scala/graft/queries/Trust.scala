package graft.queries

import graft.Tables
import graft.functions.TextOps
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

  val all: Seq[QueryDef] = Seq(q1, q2)
}
