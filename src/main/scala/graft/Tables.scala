package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir; on a
  * real cluster these would be partitioned/bucketed Delta tables, but the
  * read path is identical (`spark.read.parquet`), and all downstream
  * operators are written against the DataFrame, not the layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table's `ts` column has shipped in two physical forms:
    * originally a NANOSECOND parquet timestamp (which Spark rejects by
    * default — TimestampType is micros — so we read it via the
    * nanos-as-long escape hatch and divide), and, since the testdata
    * regeneration, a plain micros timestamp (surfaced as TIMESTAMP_NTZ by
    * parquet NTZ inference). Either way we expose `ts` as epoch
    * MICROseconds (long): DuckDB reads both forms as a micros timestamp,
    * so the micro-epoch long is the representation both engines agree on
    * bit-for-bit (oracle SQL uses `epoch_us(ts)`). `ts_ts` is the same
    * instant as a proper TimestampType column for event-time/streaming
    * use; the session timezone is pinned to UTC, so the NTZ cast is an
    * identity on the underlying micros. */
  private def eventsWithTs(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ branch's ts = epoch-micros contract depends on a UTC
    // session timezone (unix_micros interprets NTZ in session tz); pin
    // it HERE, not just in the mains/build flags, so the function is
    // self-contained and both layouts stay timezone-independent for
    // any consumer session (round-9 advice)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // legacy layout: int64 nanoseconds
        raw
          .withColumn("ts", expr("ts div 1000"))
          .withColumn("ts_ts", timestamp_micros(col("ts")))
      case _ => // current layout: timestamp[us] (NTZ or UTC-adjusted)
        raw
          .withColumn("ts_ts", col("ts").cast(TimestampType))
          .withColumn("ts", unix_micros(col("ts_ts")))
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame     = eventsWithTs(spark, dir)
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
