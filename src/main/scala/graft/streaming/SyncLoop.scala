package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** T5 write side — the sync engine's incremental MERGE loop
  * (reference: sync/engine.rs:24-161): each micro-batch of the event
  * feed is merged into a persisted per-user profile store, and a
  * PERSISTED watermark records the high-water event time so a
  * restarted loop resumes where it left off instead of double-counting
  * replayed input (the reference's get/set_sync_watermark contract
  * around list_memories_since).
  *
  * Spark-first shape: `foreachBatch` gives the streaming query a batch
  * DataFrame per trigger; the MERGE is one full-outer join of the
  * (small) profile store with the micro-batch aggregate — additive
  * stats only (count / decimal sum / min / max), so incremental
  * maintenance is EXACTLY equal to a one-shot batch recompute, which
  * is what the oracle checks. Sums ride DECIMAL, not DOUBLE, so the
  * equality is order-independent and bit-exact.
  *
  * Late events behind the persisted watermark are skipped by design
  * (the reference's since-watermark contract); bound upstream lateness
  * with `withWatermark` if the feed can reorder across triggers.
  */
object SyncLoop {

  /** Empty profile store frame (schema anchor). */
  def emptyProfiles(spark: SparkSession): DataFrame =
    spark.range(0).select(
      col("id").as("user_id"),
      lit(0L).as("n_events"),
      lit(null).cast("decimal(38,6)").as("total_value"),
      lit(0L).as("first_us"),
      lit(0L).as("last_us"))

  /** Per-user additive aggregate of one micro-batch
    * (cols: user_id, ts epoch-micros long, value double). */
  def aggBatch(batch: DataFrame): DataFrame =
    batch.groupBy("user_id").agg(
      count(lit(1)).as("b_n"),
      sum(col("value").cast("decimal(20,6)")).as("b_total"),
      min(col("ts")).as("b_first"),
      max(col("ts")).as("b_last"))

  /** MERGE a micro-batch into the profile store: one full-outer join,
    * additive update per column. least/greatest skip the null side of
    * the join, so new users and untouched users both come out right. */
  def merge(profiles: DataFrame, batch: DataFrame): DataFrame =
    profiles.join(aggBatch(batch), Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("n_events"), lit(0L)) + coalesce(col("b_n"), lit(0L)))
          .as("n_events"),
        (coalesce(col("total_value"), lit(0).cast("decimal(38,6)")) +
          coalesce(col("b_total"), lit(0).cast("decimal(20,6)")))
          .cast("decimal(38,6)").as("total_value"),
        least(col("first_us"), col("b_first")).as("first_us"),
        greatest(col("last_us"), col("b_last")).as("last_us"))

  def readWatermark(path: String): Option[Long] = {
    val p = Paths.get(path)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  def writeWatermark(path: String, highWater: Long): Unit =
    Files.writeString(Paths.get(path), highWater.toString)

  def readProfiles(spark: SparkSession, storePath: String): DataFrame = {
    val f = new java.io.File(storePath)
    if (f.exists() && f.list() != null && f.list().nonEmpty)
      spark.read.parquet(storePath)
    else emptyProfiles(spark)
  }

  /** Attach the foreachBatch MERGE loop to a streaming event frame.
    * Each trigger: drop rows at or below the persisted watermark,
    * MERGE the rest into the parquet store, advance the watermark to
    * the batch's max event time. */
  def maintainProfiles(events: DataFrame, storePath: String, wmPath: String,
      checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fresh = readWatermark(wmPath) match {
          case Some(w) => batch.filter(col("ts") > w)
          case None => batch
        }
        val mx = fresh.agg(max(col("ts"))).collect()(0)
        if (!mx.isNullAt(0)) {
          val merged = merge(readProfiles(spark, storePath), fresh)
          val tmp = storePath + ".tmp"
          merged.write.mode(SaveMode.Overwrite).parquet(tmp)
          spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(storePath)
          writeWatermark(wmPath, mx.getLong(0))
        }
      }
      .start()
}
