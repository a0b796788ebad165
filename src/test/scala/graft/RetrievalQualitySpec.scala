package graft

import graft.api.Mnemo
import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §5 item 3 — fixture-based retrieval-QUALITY replay: the
  * reference's published baseline is quality metrics over a 45-row
  * LongMemEval-style slice (bench/RESULTS.md:12-24), not wall-times.
  * This spec replays that protocol over [[LongMemFixture]] with the
  * engine's deterministic hash embedder and pins recall@1/@5 and MRR
  * per lane, so a scoring regression (tokenizer, embedding, fusion
  * weights, tie-breaks) fails CI even while SQL-parity stays green.
  *
  * The absolute numbers differ from the reference's published table by
  * design: that table is measured with a real 768-dim Ollama embedder,
  * which this container does not ship; the 64-dim hash embedder is the
  * engine's deterministic offline fallback. The PROTOCOL is identical:
  * full corpus seeded, gold-document retrieval, top-10, rank metrics.
  */
class RetrievalQualitySpec extends SparkSpec {

  private val K = 10

  /** Rank of every query's gold document under a score column. */
  private def ranks(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("score"), 6).desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("id") === col("qid"))
      .select(col("qid"), col("rank"))
  }

  private def metrics(r: DataFrame): (Double, Double, Double) = {
    val m = r.agg(
      round(avg(when(col("rank") === 1, 1.0).otherwise(0.0)), 6).as("r1"),
      round(avg(when(col("rank") <= 5, 1.0).otherwise(0.0)), 6).as("r5"),
      round(avg(when(col("rank") <= K, lit(1.0) / col("rank")).otherwise(0.0)), 6)
        .as("mrr")).collect()(0)
    (m.getDouble(0), m.getDouble(1), m.getDouble(2))
  }

  private lazy val corpus = {
    import spark.implicits._
    LongMemFixture.records.map(r => (r.id, r.content)).toDF("id", "content")
      .withColumn("emb", Mnemo.hashEmbedding(col("content")))
      .cache()
  }

  private lazy val queries = {
    import spark.implicits._
    LongMemFixture.records.map(r => (r.id, r.query)).toDF("qid", "query")
      .withColumn("qemb", Mnemo.hashEmbedding(col("query")))
      .cache()
  }

  private lazy val pairs = corpus.crossJoin(queries)

  private lazy val lexRanks = ranks(pairs.withColumn("score",
    coalesce(TextOps.jaccard(
      TextOps.tokenSet(col("content")), TextOps.tokenSet(col("query"))), lit(0.0))))
    .cache()

  private lazy val semRanks = ranks(pairs.withColumn("score",
    coalesce(VectorOps.cosineFast(col("emb"), col("qemb")), lit(0.0))))
    .cache()

  test("fixture sanity: 45 records, 9 conversations, unique ids") {
    assert(LongMemFixture.records.size == 45)
    assert(LongMemFixture.records.map(_.conv).distinct.size == 9)
    assert(LongMemFixture.records.map(_.id).distinct.size == 45)
  }

  // Pinned quality table (hash embedder, gold-doc retrieval, top-10),
  // the analogue of bench/RESULTS.md's mode table:
  //   lexical   recall@1 0.867  recall@5 0.978  MRR 0.908
  //   semantic  recall@1 0.378  recall@5 0.800  MRR 0.543
  //   hybrid    recall@1 0.733  recall@5 0.956  MRR 0.827
  // Lexical leads here for the same reason bm25 trails vector in the
  // reference's real-embedder table: the ranking quality tracks the
  // embedder; the 64-dim hash fallback is deliberately cheap.

  test("lexical lane quality pinned: recall@1/@5 and MRR") {
    assert(metrics(lexRanks) == (0.866667, 0.977778, 0.908148))
  }

  test("semantic lane quality pinned: recall@1/@5 and MRR") {
    assert(metrics(semRanks) == (0.377778, 0.8, 0.542954))
  }

  test("hybrid RRF lane quality pinned (recall-path weights 0.35 lex / 0.45 sem, k=60)") {
    // RRF needs ALL candidate ranks, not just gold: rebuild from both lanes
    val lexAll = pairs.withColumn("score",
      coalesce(TextOps.jaccard(
        TextOps.tokenSet(col("content")), TextOps.tokenSet(col("query"))), lit(0.0)))
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(round(col("score"), 6).desc, col("id").asc)))
      .select(col("qid"), col("id"), (lit(0.35) / (col("rank") + 60)).as("c"))
    val semAll = pairs.withColumn("score",
      coalesce(VectorOps.cosineFast(col("emb"), col("qemb")), lit(0.0)))
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(round(col("score"), 6).desc, col("id").asc)))
      .select(col("qid"), col("id"), (lit(0.35) / (col("rank") + 60)).as("c"))
    val fusedRanks = ranks(
      lexAll.unionAll(semAll).groupBy("qid", "id").agg(sum(col("c")).as("score")))
    assert(metrics(fusedRanks) == (0.733333, 0.955556, 0.826755))
  }

  // Precomputed-vector lane: vectors as DATA (parquet fixture), the
  // path a user with real model embeddings (nomic-embed / ONNX MiniLM —
  // BASELINE.md's 0.739 / 0.689 recall@1 rows) plugs into. The
  // committed fixture is a deterministic 256-dim trigram-hash stand-in
  // (eval/MakeVectorFixture), so this row demonstrates the plumbing and
  // a stronger-than-floor representation — NOT model parity.
  test("precomputed-vector lane quality pinned (trigram fixture, recall@1/@5 and MRR)") {
    val vecs = spark.read.parquet("fixtures/longmem_vectors.parquet")
    val d = vecs.select(col("id"), col("doc_vec"))
    val q = vecs.select(col("id").as("qid"), col("query_vec"))
    val preRanks = ranks(d.crossJoin(broadcast(q)).withColumn("score",
      coalesce(VectorOps.cosineFast(col("doc_vec"), col("query_vec")), lit(0.0))))
    // beside the floor rows above: semantic hash-64 recall@1 is 0.378;
    // the precomputed lane reaches 0.933 through the same rank protocol
    assert(metrics(preRanks) == (0.933333, 1.0, 0.962963))
  }

  test("token efficiency: lean top-5 slice vs full history (est_tokens = ceil(chars/4))") {
    val est = ceil(length(col("content")).cast("double") / 4.0)
    val full = corpus.agg(sum(est)).collect()(0).getLong(0).toDouble
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("score"), 6).desc, col("id").asc)
    val top5 = pairs.withColumn("score",
      coalesce(VectorOps.cosineFast(col("emb"), col("qemb")), lit(0.0)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .groupBy("qid").agg(sum(est).as("slice"))
      .agg(round(avg(col("slice")), 2).as("mean_slice")).collect()(0).getDouble(0)
    val reduction = 1.0 - top5 / full
    info(f"full=$full%.0f tokens, mean top-5 slice=$top5%.2f, reduction=${reduction * 100}%.1f%%")
    assert(reduction > 0.85, s"lean slice should cut >85% of context tokens, got $reduction")
  }
}
