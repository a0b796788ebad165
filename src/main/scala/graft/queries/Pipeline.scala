package graft.queries

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Training-data pipeline composition operators: quality gating,
  * deterministic stratified sampling, and temperature-weighted corpus
  * mixing. These are the passes that sit between dedup and training at
  * 100 TB — each is one narrow projection plus one small aggregate
  * join, so the corpus side streams and only per-stratum statistics
  * shuffle.
  */
object Pipeline extends QueryGroup {

  private val HexDigits = "0123456789abcdef"

  /** quality score shared with t2_quality_score: length, stopword and
    * word-shape components, each clamped to [0,1]. */
  private def quality(toks: org.apache.spark.sql.Column) = {
    val nToks = size(toks).cast("double")
    val avgLen = when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nToks)
      .otherwise(0.0)
    val stopRatio = when(size(toks) > 0,
      size(filter(toks, t => t.isin("the", "a", "of", "and", "to", "in"))).cast("double") / nToks)
      .otherwise(0.0)
    round(
      lit(0.4) * least(lit(1.0), nToks / 64.0)
        + lit(0.3) * least(lit(1.0), stopRatio * 4.0)
        + lit(0.3) * (lit(1.0) - least(lit(1.0), abs(avgLen - 4.7) / 4.7)), 6)
  }

  private val qualitySql =
    """ROUND(0.4 * LEAST(1.0, CAST(len(toks) AS DOUBLE) / 64.0)
      |    + 0.3 * LEAST(1.0, (CASE WHEN len(toks) > 0
      |        THEN CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE) / len(toks)
      |        ELSE 0.0 END) * 4.0)
      |    + 0.3 * (1.0 - LEAST(1.0, ABS((CASE WHEN len(toks) > 0
      |        THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
      |        ELSE 0.0 END) - 4.7) / 4.7)), 6)""".stripMargin

  private val toksSql =
    """toks AS (
      |  SELECT doc_id, lang,
      |         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS toks
      |  FROM documents)""".stripMargin

  /** Quality-gate pass: keep only documents at or above their language's
    * median quality — the per-stratum filter step of corpus curation.
    * The median is a 5-row aggregate broadcast back onto the stream. */
  private val q1 = QueryDef(
    "pl1_quality_gate",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("toks"))
        .withColumn("quality", quality(col("toks")))
        .select("doc_id", "lang", "quality")
      val med = d.groupBy("lang")
        .agg(round(percentile(col("quality"), lit(0.5)), 6).as("med"))
      d.join(broadcast(med), "lang")
        .filter(col("quality") >= col("med"))
        .select(col("doc_id"), col("lang"), col("quality"), col("med"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH $toksSql,
      scored AS (SELECT doc_id, lang, $qualitySql AS quality FROM toks),
      med AS (SELECT lang, ROUND(quantile_cont(quality, 0.5), 6) AS med
              FROM scored GROUP BY lang)
      SELECT doc_id, scored.lang, quality, med
      FROM scored JOIN med ON scored.lang = med.lang
      WHERE quality >= med
      ORDER BY doc_id"""))

  /** Deterministic per-stratum downsampling to ~100 docs per language:
    * keep doc iff its md5 bucket (first two hex chars, uniform on
    * [0,256)) falls under the stratum's acceptance rate. Hash-based
    * bernoulli is THE scalable sampler — no shuffle, no RNG state, and
    * membership is reproducible from the id alone. The digest pins the
    * exact sample across engines. */
  private val q2 = QueryDef(
    "pl2_stratified_sample",
    (s, dir) => {
      val target = 100
      val h = md5(col("doc_id").cast("string"))
      val v = ((instr(lit(HexDigits), substring(h, 1, 1)) - 1) * 16
        + (instr(lit(HexDigits), substring(h, 2, 1)) - 1)).cast("long")
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), v.as("bucket"))
      val sizes = d.groupBy("lang").agg(count(lit(1)).as("n_total"))
      val kept = d.join(broadcast(sizes), "lang")
        .filter(col("bucket") * col("n_total") < lit(256L * target))
      kept.groupBy("lang").agg(
          max(col("n_total")).as("n_total"),
          count(lit(1)).as("n_kept"),
          md5(concat_ws(",", array_sort(collect_list(col("doc_id").cast("string")))))
            .as("sample_digest"))
        .orderBy("lang")
    },
    Some("""
      WITH d AS (
        SELECT doc_id, lang,
               CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS BIGINT) AS bucket
        FROM documents),
      sizes AS (SELECT lang, COUNT(*) AS n_total FROM d GROUP BY lang),
      kept AS (
        SELECT d.doc_id, d.lang, s.n_total
        FROM d JOIN sizes s ON d.lang = s.lang
        WHERE d.bucket * s.n_total < 25600)
      SELECT lang, MAX(n_total) AS n_total, COUNT(*) AS n_kept,
             md5(array_to_string(list_sort(list(CAST(doc_id AS VARCHAR))), ',')) AS sample_digest
      FROM kept
      GROUP BY lang
      ORDER BY lang"""))

  /** Temperature-weighted corpus mix: allocate a 100k-token training
    * budget across sources proportionally to sqrt(source tokens) — the
    * standard alpha=0.5 rebalancing that upweights small sources without
    * letting large ones dominate. Pure arithmetic over a tiny per-source
    * aggregate. */
  private val q3 = QueryDef(
    "pl3_corpus_mix",
    (s, dir) => {
      val budget = 100000.0
      val perSrc = Tables.documents(s, dir)
        .groupBy("source")
        .agg(sum(TextOps.estTokens(col("text"))).as("est_tokens"))
      val total = perSrc.agg(sum(sqrt(col("est_tokens"))).as("z"))
      perSrc.crossJoin(broadcast(total))
        .withColumn("weight", round(sqrt(col("est_tokens")) / col("z"), 6))
        .withColumn("alloc_tokens",
          floor(lit(budget) * sqrt(col("est_tokens")) / col("z")).cast("long"))
        .select("source", "est_tokens", "weight", "alloc_tokens")
        .orderBy("source")
    },
    Some("""
      WITH per_src AS (
        SELECT source,
               CAST(SUM(CAST(CEIL(len(text) / 4.0) AS BIGINT)) AS BIGINT) AS est_tokens
        FROM documents GROUP BY source),
      z AS (SELECT SUM(sqrt(est_tokens)) AS z FROM per_src)
      SELECT source, est_tokens,
             ROUND(sqrt(est_tokens) / z, 6) AS weight,
             CAST(FLOOR(100000 * sqrt(est_tokens) / z) AS BIGINT) AS alloc_tokens
      FROM per_src CROSS JOIN z
      ORDER BY source"""))

  /** Deterministic shuffle-shard export: the final pipeline step that
    * writes training shards. Order is md5(doc_id) — a reproducible
    * pseudo-random permutation both engines compute identically — and
    * the shard is the first hex nibble's bucket, so a re-run (or a
    * different engine) produces byte-identical shard assignments. At
    * 100 TB this is one hash projection + one shuffle on shard, and
    * within-shard order is the hash order, so workers stream shards
    * without a global sort. */
  private val q4 = QueryDef(
    "pl4_shuffle_export",
    (s, dir) => {
      val NShards = 8
      val h = md5(col("doc_id").cast("string"))
      val shard = (instr(lit(HexDigits), substring(h, 1, 1)) - 1) % NShards
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("h"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"), h.as("h"))
        .withColumn("shard", shard.cast("int"))
        .withColumn("pos", row_number().over(w))
        .select(col("shard"), col("pos"), col("doc_id"), col("n_chars"))
        .orderBy("shard", "pos")
    },
    Some("""
      WITH h AS (
        SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h,
               CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 8 AS INT) AS shard
        FROM documents)
      SELECT shard,
             CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h) AS INT) AS pos,
             doc_id, n_chars
      FROM h
      ORDER BY shard, pos"""))

  val all: Seq[QueryDef] = Seq(q1, q2, q3, q4)
}
