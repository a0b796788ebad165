package graft.queries

import graft.Tables
import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's retrieval lanes (SURVEY §2.3) re-expressed as
  * declarative Spark jobs: exact filter scan (R1), BM25 lexical from
  * first-principles TF/DF aggregates (R2), semantic cosine top-k behind
  * a permission semi-join (R3/R10), recency decay (R8), and the
  * weighted reciprocal-rank hybrid fusion (R6/R7).
  *
  * Scale design: every lane ranks by a `round(score, 6)` key with a
  * unique-id tiebreak, so lane ranks are reproducible across engines
  * and runs; lane top-k happens BEFORE fusion (TakeOrderedAndProject on
  * each lane), so the fusion groupBy only ever sees k·lanes rows per
  * query regardless of corpus size. All corpus-level stats (N, avgdl,
  * document frequencies) are tiny aggregates broadcast back against the
  * big side.
  *
  * Reference: crates/mnemo-core/src/query/recall.rs:393-733,
  * query/retrieval.rs:7-46, search/tantivy_index.rs:150-200.
  */
object Retrieval extends QueryGroup {

  private val terms = Seq("spark", "query", "fast")
  private val K1 = 1.2
  private val B = 0.75

  private val toksSql =
    """toks AS (
      |  SELECT doc_id,
      |         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS toks
      |  FROM documents)""".stripMargin

  /** (doc_id, bm25) for docs matching >=1 query term; bm25 rounded 6dp. */
  private def bm25Scores(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val stats = toks.agg(count(lit(1)).as("n_docs"), avg(size(col("toks"))).as("avgdl"))
    val tf = toks
      .select(col("doc_id"), size(col("toks")).as("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms.map(lit): _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = col("tf") * (K1 + 1) /
      (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", idf * tfNorm)
      .groupBy("doc_id").agg(round(sum(col("contrib")), 6).as("bm25"))
  }

  private val bm25Sql = s"""
      |stats AS (SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM toks),
      |tf AS (
      |  SELECT doc_id, dl, term, COUNT(*) AS tf
      |  FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM toks)
      |  WHERE term IN (${terms.map(t => s"'$t'").mkString(", ")})
      |  GROUP BY doc_id, dl, term),
      |dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
      |bm AS (
      |  SELECT doc_id,
      |         ROUND(SUM(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
      |             * tf * ($K1 + 1) / (tf + $K1 * (1 - $B + $B * dl / avgdl))), 6) AS bm25
      |  FROM tf JOIN dft USING (term) CROSS JOIN stats
      |  GROUP BY doc_id)""".stripMargin

  private val q1 = QueryDef(
    "r1_exact_lane",
    (s, dir) =>
      Tables.documents(s, dir)
        .filter(col("lang") === "en" &&
          col("n_chars").between(200, 400) &&
          col("source").isin("src1", "src2", "src3") &&
          array_contains(TextOps.tokens(col("text")), "spark"))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id"),
    Some(s"""
      WITH $toksSql
      SELECT d.doc_id, source, n_chars
      FROM documents d JOIN toks USING (doc_id)
      WHERE lang = 'en' AND n_chars BETWEEN 200 AND 400
        AND source IN ('src1', 'src2', 'src3')
        AND list_contains(toks, 'spark')
      ORDER BY doc_id"""))

  private val q2 = QueryDef(
    "r2_bm25",
    (s, dir) =>
      bm25Scores(s, dir)
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20),
    Some(s"""
      WITH $toksSql,
      $bm25Sql
      SELECT doc_id, bm25 FROM bm
      ORDER BY bm25 DESC, doc_id
      LIMIT 20"""))

  private val q3 = QueryDef(
    "r3_semantic_lane",
    (s, dir) => {
      // permission pre-filter FIRST (semi-join against the accessible
      // dimension), THEN the cosine top-k — the "permission-safe ANN"
      // pushdown of recall.rs:381-387
      val e = Tables.embeddings(s, dir)
      val allowed = s.range(0, 8).select(col("id").cast("int").as("label"))
      val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      e.join(broadcast(allowed), Seq("label"), "left_semi")
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .withColumn("cos", round(VectorOps.cosineFast(col("embedding"), col("qv")), 6))
        .select(col("vec_id"), col("label"), col("cos").as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(10)
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
      SELECT vec_id, label,
             ROUND(list_dot_product(v, qv)
                 / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cosine
      FROM e CROSS JOIN q
      WHERE label IN (0, 1, 2, 3, 4, 5, 6, 7) AND vec_id <> 0
      ORDER BY cosine DESC, vec_id
      LIMIT 10"""))

  private val q4 = QueryDef(
    "r8_recency_score",
    (s, dir) => {
      // exp half-life decay (168 h), anchored at a fixed as-of instant so
      // the computation is reproducible (SURVEY §7 "non-determinism traps")
      val nowMicros = 1706745600000000L // 2024-02-01T00:00:00Z
      val ageH = (lit(nowMicros) - col("ts")).cast("double") / 3.6e9
      val score = exp(-ageH * log(lit(2.0)) / 168.0)
      Tables.events(s, dir)
        .withColumn("recency", round(score, 6))
        .select("event_id", "user_id", "recency")
        .orderBy(col("recency").desc, col("event_id"))
        .limit(100)
    },
    Some("""
      SELECT event_id, user_id,
             ROUND(exp(-(CAST(1706745600000000 - epoch_us(ts) AS DOUBLE) / 3.6e9)
                       * ln(2.0) / 168.0), 6) AS recency
      FROM events
      ORDER BY recency DESC, event_id
      LIMIT 100"""))

  private val q5 = QueryDef(
    "r6_hybrid_rrf",
    (s, dir) => {
      // weighted 3-lane hybrid: lexical BM25, semantic cosine, and an
      // "importance" lane (n_chars), fused by weighted RRF with k=60
      val d = Tables.documents(s, dir)
      val e = Tables.embeddings(s, dir)
      val qv = e.filter(col("vec_id") === 7).select(col("embedding").as("qv"))

      // top-k-then-rank: TakeOrderedAndProject trims the lane to 50 rows
      // BEFORE the global rank window, so the window never sees the corpus
      def lane(df: DataFrame, orderKey: Seq[org.apache.spark.sql.Column], w: Double): DataFrame =
        df.orderBy(orderKey: _*).limit(50)
          .withColumn("rank", row_number().over(Window.orderBy(orderKey: _*)))
          .select(col("doc_id"), (lit(w) / (col("rank") + 60)).as("contrib"))

      val lex = lane(bm25Scores(s, dir), Seq(col("bm25").desc, col("doc_id")), 0.5)
      val sem = lane(
        d.join(e, col("doc_id") === col("vec_id"))
          .crossJoin(broadcast(qv))
          .withColumn("cos", round(VectorOps.cosineFast(col("embedding"), col("qv")), 6)),
        Seq(col("cos").desc, col("doc_id")), 0.3)
      val imp = lane(d, Seq(col("n_chars").desc, col("doc_id")), 0.2)

      lex.unionAll(sem).unionAll(imp)
        .groupBy("doc_id")
        .agg(round(sum(col("contrib")), 6).as("rrf_score"), count(lit(1)).as("n_lanes"))
        .orderBy(col("rrf_score").desc, col("doc_id"))
        .limit(20)
    },
    Some(s"""
      WITH $toksSql,
      $bm25Sql,
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 7),
      lex AS (
        SELECT doc_id, 0.5 / (rank + 60) AS contrib
        FROM (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank FROM bm)
        WHERE rank <= 50),
      sem AS (
        SELECT doc_id, 0.3 / (rank + 60) AS contrib
        FROM (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY c DESC, doc_id) AS rank
              FROM (SELECT d.doc_id,
                           ROUND(list_dot_product(v, qv)
                               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS c
                    FROM documents d JOIN e ON d.doc_id = e.vec_id CROSS JOIN q))
        WHERE rank <= 50),
      imp AS (
        SELECT doc_id, 0.2 / (rank + 60) AS contrib
        FROM (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rank FROM documents)
        WHERE rank <= 50),
      lanes AS (SELECT * FROM lex UNION ALL SELECT * FROM sem UNION ALL SELECT * FROM imp)
      SELECT doc_id, ROUND(SUM(contrib), 6) AS rrf_score, COUNT(*) AS n_lanes
      FROM lanes GROUP BY doc_id
      ORDER BY rrf_score DESC, doc_id
      LIMIT 20"""))

  private val q6 = QueryDef(
    "r4_domain_scoped",
    (s, dir) => {
      // anti-dilution (MASDR-RAG, recall.rs:422-477): the domain predicate
      // (F2: source/lang sub-corpus) composes BEFORE the dense top-k, so
      // the cosine scan touches only the scoped slice — pushdown by
      // construction
      val e = Tables.embeddings(s, dir)
      val qv = e.filter(col("vec_id") === 3).select(col("embedding").as("qv"))
      Tables.documents(s, dir)
        .filter(col("lang") === "en" && col("source").isin("src2", "src5", "src8"))
        .join(e, col("doc_id") === col("vec_id"))
        .crossJoin(broadcast(qv))
        .withColumn("cos", round(VectorOps.cosineFast(col("embedding"), col("qv")), 6))
        .select(col("doc_id"), col("source"), col("cos").as("cosine"))
        .orderBy(col("cosine").desc, col("doc_id"))
        .limit(10)
    },
    Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 3)
      SELECT doc_id, source,
             ROUND(list_dot_product(v, qv)
                 / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cosine
      FROM documents JOIN e ON doc_id = e.vec_id CROSS JOIN q
      WHERE lang = 'en' AND source IN ('src2', 'src5', 'src8')
      ORDER BY cosine DESC, doc_id
      LIMIT 10"""))

  private val q7 = QueryDef(
    "r9_reconstruct",
    (s, dir) => {
      // reconstruct (recall.rs:867-871,1019-1106): semantic top-5 seeds →
      // 1-hop linked context (neighbouring docs in the same source) →
      // deterministic rank-ordered belief summary + mean-score confidence
      val d = Tables.documents(s, dir)
      val e = Tables.embeddings(s, dir)
      val qv = e.filter(col("vec_id") === 11).select(col("embedding").as("qv"))
      val seeds = d.join(e, col("doc_id") === col("vec_id"))
        .crossJoin(broadcast(qv))
        .withColumn("cos", round(VectorOps.cosineFast(col("embedding"), col("qv")), 6))
        .orderBy(col("cos").desc, col("doc_id")).limit(5)
        .select(col("doc_id"), col("source"), col("cos"),
          TextOps.excerpt(col("text"), 30).as("ex"))
      // 1-hop link: adjacent doc ids within the same source
      val linked = seeds.alias("s")
        .join(d.alias("n"),
          col("n.source") === col("s.source") &&
            (col("n.doc_id") === col("s.doc_id") + 1 ||
              col("n.doc_id") === col("s.doc_id") - 1))
        .select(col("s.doc_id").as("seed_id"), col("n.doc_id").as("linked_id"))
        .groupBy("seed_id").agg(count(lit(1)).as("n_linked"))
      seeds.join(linked, col("doc_id") === col("seed_id"), "left")
        .agg(
          concat_ws(" | ",
            transform(
              array_sort(collect_list(struct((-col("cos")).as("nc"),
                col("doc_id"), col("ex")))),
              p => p.getField("ex"))).as("belief"),
          round(avg(col("cos")), 6).as("confidence"),
          sum(coalesce(col("n_linked"), lit(0L))).as("linked_context"))
    },
    Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 11),
      seeds AS (
        SELECT doc_id, source,
               ROUND(list_dot_product(v, qv)
                   / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos,
               CASE WHEN len((list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1]) <= 30
                    THEN (list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1]
                    ELSE substr((list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1], 1, 30) || '…' END AS ex
        FROM documents JOIN e ON doc_id = e.vec_id CROSS JOIN q
        ORDER BY cos DESC, doc_id
        LIMIT 5),
      linked AS (
        SELECT s.doc_id AS seed_id, COUNT(*) AS n_linked
        FROM seeds s JOIN documents n
          ON n.source = s.source AND (n.doc_id = s.doc_id + 1 OR n.doc_id = s.doc_id - 1)
        GROUP BY s.doc_id)
      SELECT string_agg(ex, ' | ' ORDER BY cos DESC, doc_id) AS belief,
             ROUND(AVG(cos), 6) AS confidence,
             CAST(SUM(COALESCE(n_linked, 0)) AS BIGINT) AS linked_context
      FROM seeds LEFT JOIN linked ON doc_id = seed_id"""))

  private val q8 = QueryDef(
    "r5_graph_lane",
    (s, dir) => {
      // the graph retrieval lane proper (recall.rs:479-555): semantic
      // seeds → bounded BFS with per-hop decay 0.5^hop over the doc
      // adjacency (same-source neighbours), first-seen dedup, then
      // RRF-fusion of [seed lane, graph lane] with k=60
      val d = Tables.documents(s, dir)
      val e = Tables.embeddings(s, dir)
      val qv = e.filter(col("vec_id") === 5).select(col("embedding").as("qv"))
      val seeds = d.join(e, col("doc_id") === col("vec_id"))
        .crossJoin(broadcast(qv))
        .withColumn("cos", round(VectorOps.cosineFast(col("embedding"), col("qv")), 6))
        .orderBy(col("cos").desc, col("doc_id")).limit(5)
        .select(col("doc_id"), col("cos"))
      // adjacency: same source, doc id ±1 (the relations stand-in)
      val adj = d.alias("x").join(d.alias("y"),
          col("y.source") === col("x.source") &&
            (col("y.doc_id") === col("x.doc_id") + 1 ||
              col("y.doc_id") === col("x.doc_id") - 1))
        .select(col("x.doc_id").as("src"), col("y.doc_id").as("dst"))
      val h1 = adj.join(seeds.select(col("doc_id").as("src")), "src")
        .select(col("dst").as("doc_id")).distinct().withColumn("hop", lit(1))
      val h2 = adj.join(h1.select(col("doc_id").as("src")), "src")
        .select(col("dst").as("doc_id")).distinct().withColumn("hop", lit(2))
      val graphLane = h1.unionAll(h2)
        .join(seeds.select("doc_id"), Seq("doc_id"), "left_anti")
        .groupBy("doc_id").agg(min(col("hop")).as("hop"))
        .withColumn("gscore", pow(0.5, col("hop")))
      // RRF fuse: seed lane ranked by cosine, graph lane by decay score
      def rrf(df: DataFrame, key: Seq[org.apache.spark.sql.Column], w: Double) =
        df.orderBy(key: _*).limit(20)
          .withColumn("rank", row_number().over(Window.orderBy(key: _*)))
          .select(col("doc_id"), (lit(w) / (col("rank") + 60)).as("contrib"))
      rrf(seeds, Seq(col("cos").desc, col("doc_id")), 1.0)
        .unionAll(rrf(graphLane, Seq(col("gscore").desc, col("doc_id")), 1.0))
        .groupBy("doc_id")
        .agg(round(sum(col("contrib")), 6).as("rrf_score"), count(lit(1)).as("n_lanes"))
        .orderBy(col("rrf_score").desc, col("doc_id"))
        .limit(15)
    },
    Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 5),
      seeds AS (
        SELECT doc_id,
               ROUND(list_dot_product(v, qv)
                   / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
        FROM documents JOIN e ON doc_id = e.vec_id CROSS JOIN q
        ORDER BY cos DESC, doc_id
        LIMIT 5),
      adj AS (
        SELECT x.doc_id AS src, y.doc_id AS dst
        FROM documents x JOIN documents y
          ON y.source = x.source AND (y.doc_id = x.doc_id + 1 OR y.doc_id = x.doc_id - 1)),
      h1 AS (SELECT DISTINCT dst AS doc_id, 1 AS hop
             FROM adj JOIN seeds ON adj.src = seeds.doc_id),
      h2 AS (SELECT DISTINCT a.dst AS doc_id, 2 AS hop
             FROM adj a JOIN h1 ON a.src = h1.doc_id),
      graph_lane AS (
        SELECT doc_id, MIN(hop) AS hop, POW(0.5, MIN(hop)) AS gscore
        FROM (SELECT * FROM h1 UNION ALL SELECT * FROM h2)
        WHERE doc_id NOT IN (SELECT doc_id FROM seeds)
        GROUP BY doc_id),
      lane_seed AS (
        SELECT doc_id, 1.0 / (rank + 60) AS contrib
        FROM (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rank FROM seeds)
        WHERE rank <= 20),
      lane_graph AS (
        SELECT doc_id, 1.0 / (rank + 60) AS contrib
        FROM (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY gscore DESC, doc_id) AS rank FROM graph_lane)
        WHERE rank <= 20),
      lanes AS (SELECT * FROM lane_seed UNION ALL SELECT * FROM lane_graph)
      SELECT doc_id, ROUND(SUM(contrib), 6) AS rrf_score, COUNT(*) AS n_lanes
      FROM lanes GROUP BY doc_id
      ORDER BY rrf_score DESC, doc_id
      LIMIT 15"""))

  private val q9 = QueryDef(
    "p9_envelope",
    (s, dir) => {
      // P9 — harness envelope rendering (retrieval.rs:436-918): the same
      // top-k hit set shaped into per-harness context strings. Pure
      // presentation: the cross join fans each hit over the harness
      // table, one format expression per harness.
      import graft.functions.TextOps
      val hits = Tables.documents(s, dir)
        .orderBy(col("n_chars").desc, col("doc_id"))
        .limit(5)
        .select(col("doc_id"), TextOps.excerpt(col("text"), 30).as("ex"),
          col("n_chars"))
      val harness = Seq("claude_code", "codex", "generic")
      val fanned = harness.map(h => hits.withColumn("harness", lit(h)))
        .reduce(_ unionAll _)
      fanned.withColumn("envelope",
          when(col("harness") === "claude_code",
            concat(lit("<memory id=\""), col("doc_id").cast("string"),
              lit("\">"), col("ex"), lit("</memory>")))
            .when(col("harness") === "codex",
              concat(lit("## Memory "), col("doc_id").cast("string"),
                lit("\n"), col("ex")))
            .otherwise(concat(col("doc_id").cast("string"), lit(": "), col("ex"))))
        .select("harness", "doc_id", "envelope")
        .orderBy("harness", "doc_id")
    },
    Some("""
      WITH hits AS (
        SELECT doc_id,
               CASE WHEN len((list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1]) <= 30
                    THEN (list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1]
                    ELSE substr((list_filter(str_split(text, chr(10)), x -> len(trim(x)) > 0))[1], 1, 30) || '…' END AS ex
        FROM documents
        ORDER BY n_chars DESC, doc_id
        LIMIT 5),
      harness AS (SELECT unnest(['claude_code', 'codex', 'generic']) AS harness)
      SELECT harness, doc_id,
             CASE harness
               WHEN 'claude_code' THEN '<memory id="' || doc_id || '">' || ex || '</memory>'
               WHEN 'codex' THEN '## Memory ' || doc_id || chr(10) || ex
               ELSE doc_id || ': ' || ex END AS envelope
      FROM hits CROSS JOIN harness
      ORDER BY harness, doc_id"""))

  private val q10 = QueryDef(
    "r10_recall_explain",
    (s, dir) => {
      // R6's optional ScoreBreakdown (query/recall.rs:576-732 "explain"):
      // the same 3-lane weighted RRF as r6_hybrid_rrf, but per-lane rank
      // and contribution survive the fusion group-by as pivoted columns,
      // so every hit explains WHY it ranked. Same single small shuffle:
      // each lane is top-50 before the union, the pivot sees <=150 rows.
      val d = Tables.documents(s, dir)
      val e = Tables.embeddings(s, dir)
      val qv = e.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
      def lane(df: DataFrame, name: String,
               orderKey: Seq[org.apache.spark.sql.Column], w: Double): DataFrame =
        df.orderBy(orderKey: _*).limit(50)
          .withColumn("rank", row_number().over(Window.orderBy(orderKey: _*)))
          .select(col("doc_id"), lit(name).as("lane"), col("rank"),
            (lit(w) / (col("rank") + 60)).as("contrib"))
      val lex = lane(bm25Scores(s, dir), "lex", Seq(col("bm25").desc, col("doc_id")), 0.5)
      val sem = lane(
        d.join(e, col("doc_id") === col("vec_id"))
          .crossJoin(broadcast(qv))
          .withColumn("cos", round(VectorOps.cosineFast(col("embedding"), col("qv")), 6)),
        "sem", Seq(col("cos").desc, col("doc_id")), 0.3)
      val imp = lane(d, "imp", Seq(col("n_chars").desc, col("doc_id")), 0.2)
      def rankOf(l: String) =
        coalesce(max(when(col("lane") === l, col("rank"))), lit(0)).as(s"${l}_rank")
      lex.unionAll(sem).unionAll(imp)
        .groupBy("doc_id")
        .agg(round(sum(col("contrib")), 6).as("rrf_score"),
          rankOf("lex"), rankOf("sem"), rankOf("imp"),
          count(lit(1)).as("n_lanes"))
        .orderBy(col("rrf_score").desc, col("doc_id"))
        .limit(20)
    },
    Some(s"""
      WITH $toksSql,
      $bm25Sql,
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 7),
      lex AS (
        SELECT doc_id, 'lex' AS lane, rank, 0.5 / (rank + 60) AS contrib
        FROM (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank FROM bm)
        WHERE rank <= 50),
      sem AS (
        SELECT doc_id, 'sem' AS lane, rank, 0.3 / (rank + 60) AS contrib
        FROM (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY c DESC, doc_id) AS rank
              FROM (SELECT d.doc_id,
                           ROUND(list_dot_product(v, qv)
                               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS c
                    FROM documents d JOIN e ON d.doc_id = e.vec_id CROSS JOIN q))
        WHERE rank <= 50),
      imp AS (
        SELECT doc_id, 'imp' AS lane, rank, 0.2 / (rank + 60) AS contrib
        FROM (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rank FROM documents)
        WHERE rank <= 50),
      lanes AS (SELECT * FROM lex UNION ALL SELECT * FROM sem UNION ALL SELECT * FROM imp)
      SELECT doc_id, ROUND(SUM(contrib), 6) AS rrf_score,
             CAST(COALESCE(MAX(CASE WHEN lane = 'lex' THEN rank END), 0) AS INTEGER) AS lex_rank,
             CAST(COALESCE(MAX(CASE WHEN lane = 'sem' THEN rank END), 0) AS INTEGER) AS sem_rank,
             CAST(COALESCE(MAX(CASE WHEN lane = 'imp' THEN rank END), 0) AS INTEGER) AS imp_rank,
             COUNT(*) AS n_lanes
      FROM lanes GROUP BY doc_id
      ORDER BY rrf_score DESC, doc_id
      LIMIT 20"""))

  val all: Seq[QueryDef] = Seq(q1, q2, q3, q4, q5, q6, q7, q8, q9, q10)
}
