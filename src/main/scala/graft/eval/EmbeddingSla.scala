package graft.eval

import graft.Tables
import graft.api.Mnemo
import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SLA-aware embedding-backend recommender (capability parity:
  * the reference's `bench/embeddings` + `mnemo bench embeddings
  * --slo-ms`, README "Embedding-backend selection"): run each
  * configured backend against a labeled fixture, measure retrieval
  * quality (nDCG@10, recall@10) AND tail latency (p50/p95 per
  * single-embed call, plus batch throughput), then pick the
  * highest-nDCG backend whose p95 fits the caller's SLO — reporting
  * the explicit nDCG gap vs the absolute best-quality backend, so the
  * operator sees what quality the latency budget costs.
  *
  * Backends here are the engine's deterministic hash embedder at
  * different dimensionalities, a lexical token-overlap baseline (the
  * reference's bench-local "hashing-baseline" sanity floor), and a
  * degenerate noop — all model-free, so the harness runs offline.
  * Latency is the user-visible wall time of one embed call through the
  * engine (plan + codegen + eval on one row): that is what an SLA on
  * this engine's embed path actually gates.
  */
object EmbeddingSla {

  sealed trait Backend { def name: String }
  /** Deterministic hash embedder at `dim` dimensions. */
  final case class HashBackend(dim: Int) extends Backend { val name = s"hash-$dim" }
  /** Token-overlap lexical floor — no vectors at all. */
  case object LexicalBaseline extends Backend { val name = "lexical-baseline" }
  /** Degenerate all-zero embedder (the reference's NoopEmbedding). */
  case object NoopBackend extends Backend { val name = "noop" }
  /** Precomputed-vector backend: vectors arrive as DATA — a parquet of
    * (id, doc_vec, query_vec) keyed by fixture record id — so quality
    * is scored over real model output without any model runtime in the
    * engine. This is the path that makes BASELINE.md's real-embedder
    * rows (recall@1 0.739 nomic-embed / 0.689 ONNX MiniLM) reproducible
    * here: export those models' vectors to parquet, point this backend
    * at the file. The committed fixture
    * (`fixtures/longmem_vectors.parquet`, [[MakeVectorFixture]]) is a
    * deterministic 256-dim trigram-hash stand-in, honestly labeled —
    * stronger than the 64-dim hash floor, not a model-parity claim. */
  final case class PrecomputedBackend(name: String, path: String) extends Backend

  val DefaultBackends: Seq[Backend] =
    Seq(HashBackend(16), HashBackend(64), HashBackend(256), LexicalBaseline, NoopBackend)

  final case class BackendResult(
      name: String,
      ndcgAt10: Double,
      recallAt10: Double,
      p50Ms: Double,
      p95Ms: Double,
      batchDocsPerSec: Double)

  final case class Recommendation(
      /** Highest-nDCG backend whose p95 ≤ SLO; None when none fits. */
      chosen: Option[String],
      /** Absolute best-quality backend, SLO ignored. */
      bestQuality: String,
      /** nDCG given up by meeting the SLO (0 when chosen == best). */
      ndcgGap: Double)

  /** The recommender: pure, so tests pin it against synthetic
    * measurements. Ties on nDCG break toward lower p95. */
  def recommend(results: Seq[BackendResult], sloMs: Double): Recommendation = {
    require(results.nonEmpty, "no backends measured")
    val best = results.maxBy(r => (r.ndcgAt10, -r.p95Ms))
    val within = results.filter(_.p95Ms <= sloMs)
    val chosen = if (within.isEmpty) None
      else Some(within.maxBy(r => (r.ndcgAt10, -r.p95Ms)))
    Recommendation(
      chosen = chosen.map(_.name),
      bestQuality = best.name,
      ndcgGap = chosen.map(c => best.ndcgAt10 - c.ndcgAt10).getOrElse(0.0))
  }

  /** Inclusive-rank percentile over raw samples (nearest-rank method). */
  def percentile(samples: Seq[Double], q: Double): Double = {
    require(samples.nonEmpty)
    val sorted = samples.sorted
    sorted(math.min(sorted.length - 1, math.ceil(q * sorted.length).toInt - 1).max(0))
  }

  /** Pairwise relevance score of a (doc text, query text) pair under a
    * backend. For embedding backends this is cosine over re-embedded
    * text; the fixture's gold signal is the label column. */
  private def scoreCol(b: Backend, docText: Column, qText: Column): Column = b match {
    case HashBackend(dim) =>
      VectorOps.cosineFast(Mnemo.hashEmbedding(docText, dim), Mnemo.hashEmbedding(qText, dim))
    case LexicalBaseline =>
      TextOps.jaccard(TextOps.tokenSet(docText), TextOps.tokenSet(qText))
    case NoopBackend => lit(0.0)
    case _: PrecomputedBackend =>
      // no text-side scorer exists: vectors are data, looked up by id
      throw new IllegalArgumentException("precomputed backend scores by id lookup")
  }

  /** Retrieval quality over the bundled labeled fixture
    * ([[graft.LongMemFixture]], the reference's 50-doc/10-query
    * bench-fixture shape): seed all 45 records as the corpus, run every
    * record's gold query, the query's own record is the single relevant
    * document. recall@10 = fraction of queries whose gold lands in the
    * top 10; nDCG@10 = avg 1/log2(goldRank+1) (single-relevant ideal
    * DCG = 1).
    *
    * Embed ONCE per side, score many: each side's representation is
    * materialized (localCheckpoint) BEFORE the pairwise cross join —
    * otherwise Catalyst collapses the embed projection into the join
    * and recomputes the O(dim·tokens) embedding per PAIR instead of
    * per document (the lambda-rebinding trap that cost a 12x in
    * shingling; here it would be |D|·|Q|-fold). */
  def quality(spark: SparkSession, b: Backend): (Double, Double) = {
    import spark.implicits._
    val corpus = graft.LongMemFixture.records
      .map(r => (r.id, r.content)).toDF("id", "content")
    val queries = graft.LongMemFixture.records
      .map(r => (r.id, r.query)).toDF("qid", "query")
    val (d, q) = b match {
      case HashBackend(dim) =>
        (corpus.withColumn("emb", Mnemo.hashEmbedding(col("content"), dim))
          .select("id", "emb").localCheckpoint(),
          queries.withColumn("qemb", Mnemo.hashEmbedding(col("query"), dim))
            .select("qid", "qemb").localCheckpoint())
      case PrecomputedBackend(_, path) =>
        val v = spark.read.parquet(path)
        (v.select(col("id"), col("doc_vec").as("emb")).localCheckpoint(),
          v.select(col("id").as("qid"), col("query_vec").as("qemb")).localCheckpoint())
      case _ =>
        (corpus.withColumn("toks", TextOps.tokenSet(col("content")))
          .select("id", "toks").localCheckpoint(),
          queries.withColumn("qtoks", TextOps.tokenSet(col("query")))
            .select("qid", "qtoks").localCheckpoint())
    }
    val pairScore = b match {
      case _: HashBackend | _: PrecomputedBackend =>
        VectorOps.cosineFast(col("emb"), col("qemb"))
      case LexicalBaseline => TextOps.jaccard(col("toks"), col("qtoks"))
      case NoopBackend => lit(0.0)
    }
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    val row = d.crossJoin(broadcast(q))
      .withColumn("score", coalesce(pairScore, lit(0.0)))
      .withColumn("rank", row_number().over(w))
      .filter(col("id") === col("qid"))
      .agg(
        avg(when(col("rank") <= 10, lit(1.0)).otherwise(0.0)).as("recall"),
        avg(when(col("rank") <= 10,
          lit(1.0) / log2(col("rank").cast("double") + 1.0)).otherwise(0.0))
          .as("ndcg"))
      .collect().head
    (row.getAs[Double]("ndcg"), row.getAs[Double]("recall"))
  }

  /** Wall-time samples (ms) of single-embed calls: one call = embed one
    * text through the engine (plan + eval on a 1-row frame). */
  def singleEmbedSamples(spark: SparkSession, b: Backend,
      texts: Seq[String], reps: Int): Seq[Double] = {
    import spark.implicits._
    b match {
      case PrecomputedBackend(_, path) =>
        // the per-call cost a precomputed backend pays is a vector
        // LOOKUP by id, not an embed — time exactly that
        val v = spark.read.parquet(path).select("id", "query_vec").localCheckpoint()
        // a text with no fixture match means the harness is miswired —
        // fail loudly rather than silently timing a lookup for some
        // other id (which would also mix apples into the SLO numbers)
        val ids = texts.map(t => graft.LongMemFixture.records
          .find(_.query == t).map(_.id)
          .getOrElse(throw new IllegalArgumentException(
            s"latency text is not a fixture query: '${t.take(60)}'")))
        for { _ <- 1 to reps; id <- ids } yield {
          val t0 = System.nanoTime()
          v.filter(col("id") === id).collect()
          (System.nanoTime() - t0) / 1e6
        }
      case _ =>
        for { _ <- 1 to reps; t <- texts } yield {
          val t0 = System.nanoTime()
          Seq(t).toDF("text").select(scoreCol(b, col("text"), col("text")).as("s")).collect()
          (System.nanoTime() - t0) / 1e6
        }
    }
  }

  /** Batch throughput: docs embedded per second over the corpus in one
    * job (the amortized path real ingest uses) — one representation per
    * row, forced via its size so nothing is optimized away. */
  def batchThroughput(spark: SparkSession, sfDir: String, b: Backend): Double = {
    // precomputed vectors are loaded, not computed: throughput is the
    // parquet vector-load path over the fixture (45 rows — the number
    // is a load-path sanity figure, not an embed rate)
    b match {
      case PrecomputedBackend(_, path) =>
        val t0 = System.nanoTime()
        val n = spark.read.parquet(path)
          .agg(count(col("id")), sum(size(col("doc_vec")))).collect().head.getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        return if (sec == 0.0) 0.0 else n / sec
      case _ => ()
    }
    val repr: Column = b match {
      case HashBackend(dim) => size(Mnemo.hashEmbedding(col("text"), dim))
      case LexicalBaseline => size(TextOps.tokenSet(col("text")))
      case NoopBackend => lit(0)
      case _: PrecomputedBackend => lit(0) // unreachable: handled above
    }
    val d = Tables.documents(spark, sfDir).select(col("text"))
    val t0 = System.nanoTime()
    val n = d.select(repr.as("r")).agg(count(col("r")), sum(col("r")))
      .collect().head.getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    if (sec == 0.0) 0.0 else n / sec
  }

  /** Measure one backend end to end. */
  def measure(spark: SparkSession, sfDir: String, b: Backend,
      latencyTexts: Seq[String], reps: Int = 3): BackendResult = {
    val (ndcg, recall) = quality(spark, b)
    val samples = singleEmbedSamples(spark, b, latencyTexts, reps)
    BackendResult(b.name,
      ndcgAt10 = ndcg, recallAt10 = recall,
      p50Ms = percentile(samples, 0.50), p95Ms = percentile(samples, 0.95),
      batchDocsPerSec = batchThroughput(spark, sfDir, b))
  }
}
