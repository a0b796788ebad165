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

  /** K2 — KMV (k-minimum-values) distinct-count sketch. Unlike HLL
    * (whose register layout differs per engine, so approx_count_distinct
    * can never hash-match an oracle), KMV is fully deterministic from a
    * shared hash: the k-th smallest md5(user_id) estimates the distinct
    * count as (k-1)/frac(h_k), and both engines compute the identical
    * digest, so the SKETCH ITSELF is oracle-checked — estimate, error
    * and all. The sketch is mergeable (min-k of a union is the min-k of
    * the per-partition min-ks), which is what makes it the distributed
    * path. The Spark side computes the k-th minimum in TWO phases —
    * rank within (key, first-hex-nibble salt), keep at most k per salt
    * cell, then re-rank the <=16k survivors per key — so no single
    * partition ever sorts a hot key's full distinct set; the oracle is
    * the plain unsalted rank, proving the two-phase prune is exact (the
    * same device as k1's salted aggregation). */
  private val q7 = QueryDef(
    "k2_kmv_distinct",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val K = 64
      val hexDigits = "0123456789abcdef"
      val du = Tables.events(s, dir)
        .select(col("event_type"), col("user_id")).distinct()
        .withColumn("h", md5(col("user_id").cast("string")))
      val w1 = Window.partitionBy(col("event_type"), substring(col("h"), 1, 1))
        .orderBy(col("h"))
      val w2 = Window.partitionBy(col("event_type")).orderBy(col("h"))
      // frac(h) from the first 6 hex chars: uniform on [0,1) with 24-bit
      // resolution, built digit-by-digit so the oracle mirrors the exact
      // arithmetic (no engine-specific hex-parse builtin needed).
      val frac = (1 to 6).map(i =>
        (instr(lit(hexDigits), substring(col("h"), i, 1)) - 1).cast("double")
          * math.pow(16, 6 - i)).reduce(_ + _) / math.pow(16, 6)
      val kth = du
        .withColumn("r1", row_number().over(w1)).filter(col("r1") <= K)
        .withColumn("r", row_number().over(w2)).filter(col("r") === K)
        .select(col("event_type"), frac.as("fk"))
      val exact = du.groupBy("event_type")
        .agg(count(lit(1)).as("exact_distinct"))
      exact.join(kth, Seq("event_type"), "left")
        // fk is guarded > 0 explicitly: Spark's Divide yields NULL on /0
        // but DuckDB's IEEE division yields Infinity, so without the
        // guard a 64th-smallest hash of exactly 000000 (p ~ 2^-24 per
        // group) would break bit-equality; both engines now fall back to
        // the exact count on that degenerate draw.
        .withColumn("kmv_estimate",
          round(coalesce(when(col("fk") > 0, lit(K - 1.0) / col("fk")),
            col("exact_distinct").cast("double")), 6))
        .withColumn("rel_error",
          round(abs(col("kmv_estimate") - col("exact_distinct"))
            / col("exact_distinct"), 6))
        .select("event_type", "exact_distinct", "kmv_estimate", "rel_error")
        .orderBy("event_type")
    },
    Some("""
      WITH du AS (
        SELECT DISTINCT event_type, user_id FROM events),
      h AS (
        SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM du),
      ranked AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS r
        FROM h),
      kth AS (
        SELECT event_type,
               ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576.0
              + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536.0
              + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096.0
              + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 256.0
              + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16.0
              + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1)) / 16777216.0 AS fk
        FROM ranked WHERE r = 64),
      exact AS (
        SELECT event_type, COUNT(*) AS exact_distinct FROM du GROUP BY event_type),
      est AS (
        SELECT exact.event_type, exact_distinct,
               ROUND(COALESCE(63.0 / NULLIF(fk, 0), CAST(exact_distinct AS DOUBLE)), 6) AS kmv_estimate
        FROM exact LEFT JOIN kth ON exact.event_type = kth.event_type)
      SELECT event_type, exact_distinct, kmv_estimate,
             ROUND(ABS(kmv_estimate - exact_distinct) / exact_distinct, 6) AS rel_error
      FROM est
      ORDER BY event_type"""))

  /** K3 — count-min heavy hitters. The second mergeable-sketch family
    * (after k2's KMV): d=4 hash rows x w=64 counters, each cell a plain
    * SUM — so the sketch builds as one map-side-combinable aggregate
    * (the shuffle carries at most d*w rows per partition) and merges
    * across partitions/streams by cell-wise addition. Estimates are
    * min over the d cells and can only OVERcount (the spec asserts
    * estimate >= exact). All hashes are md5-derived, so both engines
    * build the identical sketch — estimate and inflation are
    * hash-checked, which no engine-native approx aggregate allows. */
  private val q8 = QueryDef(
    "k3_heavy_hitters",
    (s, dir) => {
      import graft.functions.TextOps
      import org.apache.spark.sql.Column
      val D = 4
      val W = 64
      val TopK = 20
      val hexDigits = "0123456789abcdef"
      def cell(tok: Column, r: Int): Column = {
        val h = md5(concat(lit(r.toString), lit(":"), tok))
        ((1 to 4).map(i =>
          (instr(lit(hexDigits), substring(h, i, 1)) - 1) * math.pow(16, 4 - i).toLong)
          .reduce(_ + _) % W).cast("long")
      }
      // one exact term-frequency pass (map-side combinable wordcount),
      // then the sketch is built from the (token, count) pairs: cells
      // are weighted sums, so hash work is O(vocabulary), not
      // O(occurrences) — the same sketch, built the way a distributed
      // ingest would (partial TFs merge cell-wise just like the cells)
      val tf = Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("tf"))
      val cells = tf
        .select(col("tf"),
          posexplode(array((0 until D).map(r => cell(col("tok"), r)): _*)).as(Seq("r", "c")))
        .groupBy("r", "c").agg(sum(col("tf")).as("n"))
      val top = tf.select(col("tok"), col("tf").as("exact_n"))
        .orderBy(col("exact_n").desc, col("tok")).limit(TopK)
      val probes = top.select(col("tok"), col("exact_n"),
        posexplode(array((0 until D).map(r => cell(col("tok"), r)): _*)).as(Seq("r", "c")))
      probes.join(cells, Seq("r", "c"))
        .groupBy("tok").agg(
          max(col("exact_n")).as("exact_n"),
          min(col("n")).as("cm_estimate"))
        .withColumn("inflation", (col("cm_estimate") - col("exact_n")).cast("long"))
        .select("tok", "exact_n", "cm_estimate", "inflation")
        .orderBy(col("exact_n").desc, col("tok"))
    },
    Some("""
      WITH toks AS (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  x -> len(x) > 0)) AS tok
        FROM documents),
      hashed AS (
        SELECT tok, r,
               ((strpos('0123456789abcdef', substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 1)) - 1) * 4096
              + (strpos('0123456789abcdef', substr(md5(CAST(r AS VARCHAR) || ':' || tok), 2, 1)) - 1) * 256
              + (strpos('0123456789abcdef', substr(md5(CAST(r AS VARCHAR) || ':' || tok), 3, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(CAST(r AS VARCHAR) || ':' || tok), 4, 1)) - 1)) % 64 AS c
        FROM toks, (SELECT unnest(generate_series(0, 3)) AS r)),
      cells AS (SELECT r, c, COUNT(*) AS n FROM hashed GROUP BY r, c),
      top AS (
        SELECT tok, COUNT(*) AS exact_n FROM toks GROUP BY tok
        ORDER BY exact_n DESC, tok LIMIT 20),
      probes AS (
        SELECT t.tok, t.exact_n, h.r, h.c
        FROM top t JOIN (SELECT DISTINCT tok, r, c FROM hashed) h ON t.tok = h.tok)
      SELECT p.tok, MAX(p.exact_n) AS exact_n, MIN(cells.n) AS cm_estimate,
             CAST(MIN(cells.n) - MAX(p.exact_n) AS BIGINT) AS inflation
      FROM probes p JOIN cells ON p.r = cells.r AND p.c = cells.c
      GROUP BY p.tok
      ORDER BY exact_n DESC, tok"""))

  val all: Seq[QueryDef] = Seq(q1, q2, q3, q4, q5, q6, q7, q8)
}
