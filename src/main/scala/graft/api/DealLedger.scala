package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashChain

/** Append-only agent-commerce deal ledger — the reference's
  * `DealLedger` trait + disk-backed shape (mnemo-deal/src/ledger.rs:
  * 26-49, envelope.rs:19-27) as a parquet store with window-chained
  * envelopes:
  *
  *  - `append` chains a BATCH of envelopes off the current per-ledger
  *    head in one job (content hash over the keyed canonical field
  *    concatenation; pairwise lag linkage + row MAC — the
  *    [[graft.functions.HashChain]] convention shared with the memory
  *    store's remember path, so audit-log export emits one continuous
  *    ledger family). Offsets are stable: appending at offset N never
  *    reshuffles earlier offsets (ledger.rs:11-13).
  *  - `replay(from, until)` returns the envelope rows of an offset
  *    range, chain columns included.
  *  - `verify()` is the dispute walk (dispute.rs:23-42): recompute
  *    every content hash + linkage and report each ledger's FIRST
  *    divergence as (offset, expected, actual) — the DisputeReport.
  *  - `headHash`/`length` mirror the trait's introspection surface.
  *
  * Scale: append and verify are one window pass partitioned by
  * ledger_id; the tail lookup is a broadcast of one row per ledger.
  * The analytics twin of this API is the registered `x15_deal_ledger`
  * query (same canonical form, DuckDB-oracle-checked).
  *
  * SINGLE WRITER per ledger path (the reference serializes appends on
  * one engine handle, ledger.rs:26-49): two concurrent `append`s would
  * both chain off the same stored tail and fork the chain. The store
  * does not lock; instead [[verify]] reports `n_dup_offsets` per
  * ledger, so a violated single-writer assumption is detected on the
  * next dispute walk rather than silently accepted.
  */
final class DealLedger(val spark: SparkSession, val path: String,
    key: String = "deal-ledger-key") {

  import DealLedger.Envelope

  private def exists: Boolean =
    ManifestIO.listChildren(path).nonEmpty

  /** All envelope rows with chain columns. A never-written ledger
    * returns an EMPTY frame carrying the chained-envelope schema — not
    * a schemaless emptyDataFrame — so verify()/replay()/headHashes()
    * resolve their columns and return empty results instead of
    * throwing UNRESOLVED_COLUMN. */
  def table(): DataFrame =
    if (exists) spark.read.parquet(path)
    else spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      DealLedger.ChainSchema)

  private def canonical(terms: org.apache.spark.sql.Column) =
    sha2(concat_ws(HashChain.Sep, lit(key),
      col("deal_id"), col("buyer"), col("seller"),
      terms.cast("string"), col("signed_at").cast("string")), 256)

  /** Append a batch: chain each ledger's new envelopes off its stored
    * head (offset and hash), one job, no per-row probes. */
  def append(batch: Seq[Envelope]): Unit = {
    import spark.implicits._
    append(batch.toDF()
      .select(col("dealId").as("deal_id"), col("ledgerId").as("ledger_id"),
        col("buyer"), col("seller"), col("terms"),
        col("signedAt").as("signed_at")))
  }

  /** Frame-native append (snake_case request columns `deal_id,
    * ledger_id, buyer, seller, terms, signed_at`) — the path a
    * Structured Streaming `foreachBatch` sink calls with each
    * micro-batch, so envelopes never round-trip through the driver;
    * per-ledger chains stay valid across batches because each append
    * re-seeds from the stored tails. */
  def append(reqs: DataFrame): Unit = {
    // pinned: two consumers read the batch (the ledger-key prune and
    // the chained write) — without the pin a non-trivial upstream
    // micro-batch plan would be scanned twice per append
    val in = reqs
      .select(col("deal_id"), col("ledger_id"), col("buyer"), col("seller"),
        col("terms"), col("signed_at"))
      .withColumn("content_hash", canonical(col("terms")))
      .localCheckpoint()
    // pruned to the BATCH's ledgers before aggregating (the
    // enrichChain discipline): the store holds a tail per ledger EVER
    // seen — unbounded over a deployment's life — while this append
    // only re-seeds the chains it touches, an O(batch) set, so the
    // semi-join keeps the aggregate and the forced broadcast O(batch)
    val batchLedgers = in.select(col("ledger_id")).distinct()
    val tails = table()
      .join(broadcast(batchLedgers), Seq("ledger_id"), "left_semi")
      .groupBy("ledger_id").agg(
        max_by(struct(col("deal_offset"), col("content_hash")),
          col("deal_offset")).as("t"))
      .select(col("ledger_id"), col("t.deal_offset").as("tail_offset"),
        col("t.content_hash").as("tail_hash"))
    val w = Window.partitionBy(col("ledger_id"))
      .orderBy(col("signed_at"), col("deal_id"))
    val chained = in
      .join(broadcast(tails), Seq("ledger_id"), "left")
      .withColumn("deal_offset",
        coalesce(col("tail_offset"), lit(-1L)) + row_number().over(w))
      .withColumn("prev_hash",
        coalesce(lag(col("content_hash"), 1).over(w), col("tail_hash"), lit("")))
      .withColumn("mac",
        sha2(concat(col("content_hash"), col("prev_hash")), 256))
      .drop("tail_offset", "tail_hash")
    chained.write.mode(SaveMode.Append).parquet(path)
  }

  /** Envelopes of `[from, until)` per ledger, offset-ordered. */
  def replay(from: Long, until: Long): DataFrame =
    table().filter(col("deal_offset") >= from && col("deal_offset") < until)
      .orderBy("ledger_id", "deal_offset")

  /** The dispute walk: per ledger, n_deals / n_invalid / the first
    * divergent (offset, expected, actual) — NULL columns when intact.
    *
    * The genesis row's linkage is anchored at the empty string —
    * `append` always writes "" at a ledger's true genesis — NOT at the
    * row's own stored prev_hash, which would make the head check
    * vacuous (a forged offset-0 prev_hash plus a recomputed mac would
    * pass; the reference's verify_chain anchors the head at zeros,
    * dispute.rs:23-42). `n_dup_offsets` flags a forked chain from a
    * violated single-writer assumption; it fails `chain_valid` too. */
  def verify(): DataFrame = {
    val w = Window.partitionBy(col("ledger_id"))
      .orderBy(col("deal_offset"))
    val checked = table()
      .withColumn("recomputed", canonical(col("terms")))
      .withColumn("expect_prev",
        coalesce(lag(col("content_hash"), 1).over(w), lit("")))
      .withColumn("row_valid",
        col("recomputed") === col("content_hash") &&
          coalesce(col("prev_hash"), lit("")) === col("expect_prev") &&
          col("mac") === sha2(concat(col("content_hash"), col("prev_hash")), 256))
    checked.groupBy("ledger_id").agg(
      count(lit(1)).as("n_deals"),
      count(when(!col("row_valid"), 1)).as("n_invalid"),
      (count(lit(1)) - countDistinct(col("deal_offset"))).as("n_dup_offsets"),
      min(when(!col("row_valid"), struct(
        col("deal_offset").as("o"), col("content_hash").as("e"),
        col("recomputed").as("a")))).as("d"))
      .select(col("ledger_id"), col("n_deals"), col("n_invalid"),
        col("n_dup_offsets"),
        (col("n_invalid") === 0 && col("n_dup_offsets") === 0).as("chain_valid"),
        col("d.o").as("divergent_offset"),
        col("d.e").as("expected_hash"), col("d.a").as("actual_hash"))
      .orderBy("ledger_id")
  }

  /** Current head hash per ledger (ledger.rs `head_hash`, per chain);
    * empty frame with the (ledger_id, head_hash) schema when the
    * ledger has never been written. */
  def headHashes(): DataFrame =
    table().groupBy("ledger_id")
      .agg(max_by(col("content_hash"), col("deal_offset")).as("head_hash"))
      .orderBy("ledger_id")

  /** Per-ledger recursive chain digest — the registration snapshot a
    * relying party stores with an out-of-band trust anchor:
    * `d_i = sha256(d_{i-1} || content_hash_i)` folded in offset order,
    * seeded at "". Strictly stronger than [[headHashes]]: the head
    * hash commits only to the head envelope's own fields, so a keyed
    * forger rewriting an INTERIOR envelope and relinking the suffix
    * beats both [[verify]] and a head registration — but not the
    * digest, which commits to every envelope (the w9_chain_digest
    * query demonstrates the tiers; DealLedgerSpec pins the API).
    * The fold is sequential within a ledger (that sequentiality IS the
    * tamper evidence), independent across ledgers; the output is one
    * row per ledger. */
  def chainDigests(): DataFrame =
    table().groupBy("ledger_id")
      .agg(count(lit(1)).as("length"),
        array_sort(collect_list(struct(col("deal_offset"), col("content_hash"))))
          .as("a"))
      .select(col("ledger_id"), col("length"),
        aggregate(transform(col("a"), x => x.getField("content_hash")),
          lit(""), (acc, h) => sha2(concat(acc, h), 256)).as("chain_digest"))
      .orderBy("ledger_id")

  /** Audit the stored chains against a registration snapshot (a frame
    * of `ledger_id, length, chain_digest` as produced by
    * [[chainDigests]] at signing time). Full-outer: a ledger missing
    * from either side is NOT intact — truncation-to-empty cannot hide
    * by vanishing from the store, and an unregistered ledger appearing
    * in the store is flagged rather than silently trusted. Full outer
    * rules out BroadcastHashJoin, but both sides are per-ledger
    * aggregates (one row per ledger), so the exchange this join pays
    * is tiny by construction. */
  def verifyDigests(registered: DataFrame): DataFrame =
    chainDigests()
      .join(registered.select(col("ledger_id"),
        col("length").as("registered_length"),
        col("chain_digest").as("registered_digest")),
        Seq("ledger_id"), "full_outer")
      .select(col("ledger_id"), col("length"), col("registered_length"),
        col("chain_digest"), col("registered_digest"),
        (coalesce(col("length"), lit(0L)) ===
          coalesce(col("registered_length"), lit(0L)) &&
          coalesce(col("chain_digest"), lit("∅")) ===
            coalesce(col("registered_digest"), lit("∅"))).as("intact"))
      .orderBy("ledger_id")

  /** Total envelope count (ledger.rs `len`). */
  def length: Long = table().count()

  /** Operator-facing health view (the describe() satellite-parity
    * discipline): store presence + data-file count are driver-side
    * listings; envelope/ledger counts are ONE tiny count aggregate
    * (footer-driven parquet count, no chain recompute — [[verify]] is
    * the deep check). */
  def describe(): DealLedger.Health =
    if (!exists) DealLedger.Health(exists = false, 0L, 0L, 0)
    else {
      val r = table()
        .agg(count(lit(1)), countDistinct(col("ledger_id"))).collect()(0)
      DealLedger.Health(exists = true, r.getLong(0), r.getLong(1),
        ManifestIO.countDataFiles(path))
    }
}

object DealLedger {

  import org.apache.spark.sql.types._

  /** Schema of the stored chained envelopes (request fields + the
    * chain columns append() derives), in the exact column order
    * append() persists — its using-join hoists ledger_id first, and the
    * never-written empty frame must match positionally. */
  val ChainSchema: StructType = StructType(Seq(
    StructField("ledger_id", StringType),
    StructField("deal_id", StringType),
    StructField("buyer", StringType),
    StructField("seller", StringType),
    StructField("terms", StringType),
    StructField("signed_at", TimestampType),
    StructField("content_hash", StringType),
    StructField("deal_offset", LongType),
    StructField("prev_hash", StringType),
    StructField("mac", StringType)))

  /** [[DealLedger.describe]]'s report. `dataFiles` is the append-file
    * count — the small-files pressure signal of an append-only store. */
  final case class Health(
      exists: Boolean, envelopes: Long, ledgers: Long, dataFiles: Int)

  /** One contract row — the reference's envelope shape
    * (envelope.rs:19-27) minus the wire-format concerns. */
  final case class Envelope(
      dealId: String,
      ledgerId: String,
      buyer: String,
      seller: String,
      terms: String,
      signedAt: Timestamp)

  def open(spark: SparkSession, path: String): DealLedger =
    new DealLedger(spark, path)
}
