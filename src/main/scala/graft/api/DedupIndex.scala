package graft.api

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{MinHash, TextOps}

/** Maintained incremental-dedup state store — the PRODUCTION shape of
  * the d8/d10 registered queries: instead of recomputing the history's
  * Bloom positions and band keys inside every query, the accumulated
  * state persists as a maintained parquet store and each `ingest`
  * batch probes it, then folds itself in — one crash-atomic manifest
  * commit per batch, the same [[ManifestIO]] protocol as the memory
  * store, the profile sync loop, and the orientation cache.
  *
  * State = append-only generation dirs `g<N>/{bloom,bands}`:
  *  - `bloom`: parquet of (`pos` long) — the distinct Bloom positions
  *    (k = 4 md5-derived slots) of every historical d1 fingerprint;
  *  - `bands`: parquet of (`bk` string, `prior_id` long) — the
  *    MinHash band keys (8 hashes, 4 bands of 2 — the d3/d10
  *    Carter-Wegman family) of every historical document.
  * The manifest (`segs=g1,g2,…`, `m=<slots>`, `gen=`, `version=1`)
  * publishes which dirs are live; a crash between data write and
  * manifest rename leaves the prior state intact and the next commit
  * sweeps the orphan.
  *
  * The Bloom slot count `m` is fixed at CREATION from the declared
  * capacity (16 bits per expected element — FP ≈ 0.2% at capacity)
  * and persisted in the manifest, so every later open routes with the
  * creator's sizing regardless of the compiled default — the same
  * persisted-parameter discipline as the memory store's bucket count.
  * An index grown past its capacity saturates gracefully (FP rises,
  * never FN); re-sizing is a rebuild, as in every Bloom deployment.
  *
  * `ingest` verdicts are batch-vs-HISTORY (`maybe_dup` has no false
  * negatives; `near_candidate_ids` are LSH candidates for the
  * downstream exact verify). Batch-INTERNAL duplicates are the next
  * batch's history by contract — run the d1 groupBy inside the batch
  * first if intra-batch exactness is needed (same contract as the
  * d8/d10 queries).
  *
  * Scale shape: probing is one broadcast/hash join per index against
  * frames that carry 8-byte positions and 16-byte band keys — never
  * text; the per-batch state delta is O(batch); segment dirs compact
  * back to one once they exceed [[Mnemo.MaxSegments]] (the same
  * LSM-ish bound as the memory store's buckets). */
final class DedupIndex(val spark: SparkSession, val path: String,
    capacity: Long = 1000000L) {

  private val K = 4

  private def manifest: Option[Map[String, String]] = ManifestIO.read(path)

  /** Slot count: the manifest's persisted value for an existing store,
    * the capacity-derived default only at creation. */
  private def slots: Long =
    manifest.flatMap(_.get("m")).map(_.toLong)
      .getOrElse(math.max(16L * capacity, 1L))

  private def liveSegs: Seq[String] =
    manifest.flatMap(_.get("segs")).toSeq
      .flatMap(_.split(",")).filter(_.nonEmpty)

  private def positionsCol(fp: org.apache.spark.sql.Column, m: Long) =
    array((0 until K).map(i =>
      conv(substring(md5(concat(fp, lit(s":$i"))), 1, 8), 16, 10)
        .cast("long") % m): _*)

  private def enrich(batch: DataFrame, m: Long): DataFrame =
    batch
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(col("toks"))))).as("fp"),
        array_distinct(TextOps.shingles(col("toks"), 3)).as("sh"))
      .withColumn("fpr", MinHash.shingleFingerprints(col("sh")))
      .withColumn("sig", MinHash.signature(col("fpr"), 8))
      .select(col("doc_id"),
        array_distinct(positionsCol(col("fp"), m)).as("positions"),
        MinHash.bandKeys(col("sig"), 8, 2).as("bands"))

  private def readSub(sub: String): Option[DataFrame] = {
    val dirs = liveSegs.map(s => s"$path/$s/$sub")
    // a manifest-referenced dir that is MISSING is corruption — fail
    // loudly rather than silently probing against partial history (a
    // quiet skip here would admit duplicates while looking healthy)
    dirs.find(d => !java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)))
      .foreach(d => throw new IllegalStateException(
        s"dedup index at $path: manifest references missing segment dir $d"))
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  private def bloomState: DataFrame =
    readSub("bloom").getOrElse(spark.range(0).select(col("id").as("pos")))

  private def bandState: DataFrame =
    readSub("bands").getOrElse(
      spark.range(0).select(col("id").cast("string").as("bk"),
        col("id").as("prior_id")))

  /** Probe `batch` (`doc_id` long, `text` string) against the
    * accumulated history, then commit the batch INTO the history —
    * one atomic manifest publish. Returns one row per batch doc:
    * `doc_id`, `maybe_dup` (Bloom verdict vs history: 0 = proven new,
    * 1 = candidate for the exact confirm path), `near_candidate_ids`
    * (sorted prior ids sharing a MinHash band — the d10 candidates).
    * The result is pinned eagerly (localCheckpoint) BEFORE the
    * commit, so a compaction in this very commit can never invalidate
    * the frame a caller is still consuming. */
  def ingest(batch: DataFrame): DataFrame = {
    val man = manifest
    val m = slots
    val gen = man.flatMap(_.get("gen")).map(_.toLong).getOrElse(0L) + 1
    val enriched = enrich(batch, m).cache()

    // probe: Bloom membership = every one of the doc's distinct
    // positions present in the state
    val posMatches = enriched
      .select(col("doc_id"), explode(col("positions")).as("pos"))
      .join(bloomState, Seq("pos"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    val bandMatches = enriched
      .select(col("doc_id"), explode(col("bands")).as("bk"))
      .join(bandState, Seq("bk"))
      .groupBy("doc_id")
      .agg(array_sort(collect_set(col("prior_id"))).as("near_candidate_ids"))
    val result = enriched
      .join(posMatches, Seq("doc_id"), "left")
      .join(bandMatches, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("n_hit"), lit(0L)) === size(col("positions")))
          .cast("int").as("maybe_dup"),
        coalesce(col("near_candidate_ids"),
          array().cast("array<long>")).as("near_candidate_ids"))
      .orderBy("doc_id")
      .localCheckpoint()

    // fold the batch into the state: one new generation dir, published
    // by one manifest rename; compact everything into that dir when
    // the segment count is over budget
    val newSeg = s"g$gen"
    val overBudget = liveSegs.length + 1 > Mnemo.MaxSegments
    val (bloomOut, bandOut) =
      if (overBudget)
        (bloomState.unionByName(
            enriched.select(explode(col("positions")).as("pos"))).distinct(),
          bandState.unionByName(
            enriched.select(explode(col("bands")).as("bk"),
              col("doc_id").as("prior_id"))))
      else
        (enriched.select(explode(col("positions")).as("pos")).distinct(),
          enriched.select(explode(col("bands")).as("bk"),
            col("doc_id").as("prior_id")))
    bloomOut.write.mode(SaveMode.Overwrite).parquet(s"$path/$newSeg/bloom")
    bandOut.write.mode(SaveMode.Overwrite).parquet(s"$path/$newSeg/bands")
    val segs = if (overBudget) Seq(newSeg) else liveSegs :+ newSeg
    ManifestIO.write(path, Map(
      "version" -> "1", "m" -> m.toString, "gen" -> gen.toString,
      "segs" -> segs.mkString(",")))
    // sweep superseded generations and any crashed writer's orphans
    ManifestIO.gc(path, segs.toSet)
    enriched.unpersist()
    result
  }
}
