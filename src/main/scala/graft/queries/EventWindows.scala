package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Event-time window aggregations and skew-safe aggregation patterns.
  *
  * st1/st2 run the exact transforms from [[graft.streaming.EventStream]]
  * in batch mode (Spark's unified batch/streaming semantics) so the
  * streaming surface is oracle-checked too: tumbling 1h counts and the
  * sliding 6h/1h behavioural-baseline rate (A6/A12).
  *
  * k1 demonstrates the two-phase salted aggregation: with heavily skewed
  * group keys (5 event types over 100k rows), a straight groupBy sends
  * each hot key to one reducer; salting fans each key over 16 partial
  * aggregates that a second tiny aggregate folds — same result, no hot
  * partition. The oracle is the UNSALTED plain groupBy, proving
  * semantic equivalence.
  */
object EventWindows extends QueryGroup {

  private val q1 = QueryDef(
    "st1_hourly_counts",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("ts_ts").as("ts"), col("event_type"), col("value"))
      graft.streaming.EventStream.hourlyTypeCounts(ev)
        .withColumn("window_start", col("window_start").cast("string"))
        .orderBy("window_start", "event_type")
    },
    Some("""
      SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start, event_type,
             COUNT(*) AS n, ROUND(SUM(value), 6) AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_start, event_type"""))

  private val q2 = QueryDef(
    "st2_sliding_rates",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("user_id") < 20)
        .select(col("ts_ts").as("ts"), col("user_id"))
      graft.streaming.EventStream.slidingUserRates(
          ev.withColumn("value", lit(0.0)))
        .withColumn("window_start", col("window_start").cast("string"))
        .orderBy("window_start", "user_id")
    },
    Some("""
      SELECT CAST(date_trunc('hour', ts) - to_hours(off) AS VARCHAR) AS window_start,
             user_id, COUNT(*) AS n_events
      FROM events CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS off)
      WHERE user_id < 20
      GROUP BY 1, 2
      ORDER BY window_start, user_id"""))

  private val q3 = QueryDef(
    "k1_salted_agg",
    (s, dir) => {
      // phase 1: per (key, salt) partial aggregates — 16-way fan-out of
      // each hot key; phase 2: fold the 16 partials per key
      val partial = Tables.events(s, dir)
        .withColumn("salt", col("event_id") % 16)
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("pn"), sum(col("value")).as("psum"))
      partial.groupBy("event_type")
        .agg(sum(col("pn")).as("n"),
          round(sum(col("psum")), 6).as("total_value"),
          round(sum(col("psum")) / sum(col("pn")), 6).as("avg_value"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             ROUND(SUM(value), 6) AS total_value,
             ROUND(SUM(value) / COUNT(*), 6) AS avg_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  private val q4 = QueryDef(
    "w6_percentiles",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          round(percentile(col("value"), lit(0.5)), 6).as("p50"),
          round(percentile(col("value"), lit(0.95)), 6).as("p95"),
          round(percentile(col("value"), lit(0.99)), 6).as("p99"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type,
             ROUND(quantile_cont(value, 0.5), 6) AS p50,
             ROUND(quantile_cont(value, 0.95), 6) AS p95,
             ROUND(quantile_cont(value, 0.99), 6) AS p99
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  private val q5 = QueryDef(
    "w5_logical_clock",
    (s, dir) => {
      // W5 — logical-clock assignment (model/event.rs): per-agent
      // monotone event ordering; the digest proves the clock order is
      // identical across engines
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .filter(col("user_id") < 10)
        .withColumn("clock", row_number().over(w))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          max(col("clock")).cast("long").as("last_clock"),
          max_by(col("event_id"), col("clock")).as("last_event_id"),
          md5(concat_ws(",",
            transform(
              array_sort(collect_list(struct(col("clock"),
                col("event_id").cast("string").as("event_id")))),
              p => p.getField("event_id")))).as("chain_digest"))
        .orderBy("user_id")
    },
    Some("""
      WITH clocked AS (
        SELECT user_id, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS clock
        FROM events WHERE user_id < 10)
      SELECT user_id, COUNT(*) AS n_events,
             CAST(MAX(clock) AS BIGINT) AS last_clock,
             arg_max(event_id, clock) AS last_event_id,
             md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY clock)) AS chain_digest
      FROM clocked
      GROUP BY user_id
      ORDER BY user_id"""))

  /** T5 — the sync engine's incremental MERGE loop, oracle-checked:
    * the event feed is split into three deterministic micro-batches and
    * folded through the PRODUCTION [[graft.streaming.SyncLoop.merge]]
    * (the same function the foreachBatch sink runs); because every
    * maintained stat is additive (count / DECIMAL sum / min / max), the
    * incrementally-maintained store must equal a one-shot batch
    * recompute — which is exactly what the DuckDB oracle computes.
    * The store's exact DECIMAL total is cast to DOUBLE only at the
    * output boundary (repo-wide convention, see Relational.scala:22):
    * both engines convert the same exact decimal to its nearest
    * double, so the render is bit-identical — emitting the raw
    * DECIMAL diverges because DuckDB's client path renders it as a
    * float while parquet decimals render at full scale. */
  private val q6 = QueryDef(
    "t5_sync_loop",
    (s, dir) => {
      import graft.streaming.SyncLoop
      val ev = Tables.events(s, dir).select("event_id", "user_id", "ts", "value")
      val batches = (0 until 3).map(i => ev.filter(col("event_id") % 3 === i))
      val store = batches.foldLeft(SyncLoop.emptyProfiles(s))(SyncLoop.merge)
      store.withColumn("total_value", col("total_value").cast("double"))
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value,
             MIN(epoch_us(ts)) AS first_us,
             MAX(epoch_us(ts)) AS last_us
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""))

  val all: Seq[QueryDef] = Seq(q1, q2, q3, q4, q5, q6)
}
