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

  /** The events table carries a nanosecond parquet timestamp, which Spark
    * rejects by default (TimestampType is micros). We read it via the
    * nanos-as-long escape hatch and expose `ts` as epoch MICROseconds
    * (long): DuckDB also truncates this column to micros on read, so the
    * micro-epoch long is the representation both engines agree on
    * bit-for-bit. `ts_ts` is the same instant as a proper TimestampType
    * column for event-time/streaming use. */
  private def eventsWithTs(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    load(spark, dir, "events")
      .withColumn("ts", expr("ts div 1000"))
      .withColumn("ts_ts", timestamp_micros(col("ts")))
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
