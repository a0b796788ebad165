package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins [[Tables.events]]'s dual-layout contract. The driver has
  * shipped events.parquet with `ts` as int64 NANOseconds (legacy,
  * read via the nanos-as-long escape hatch) and as a plain micros
  * timestamp (surfaced as TIMESTAMP_NTZ by parquet inference). Both
  * must load to the SAME logical frame: `ts` = epoch micros (long,
  * the bit-exact cross-engine representation the oracle's
  * `epoch_us(ts)` agrees on) and `ts_ts` = the same instant as a
  * proper TimestampType column. A testdata regeneration that flips
  * the physical layout must never change query results. */
class TablesSpec extends SparkSpec {

  private val instantsMicros = Seq(
    1700000000000000L, // 2023-11-14T22:13:20Z
    1705276800123456L, // micros precision survives
    0L)                // epoch

  private def loadAs(layout: String): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory(s"graft_tables_$layout").toFile
    dir.deleteOnExit()
    val rows = instantsMicros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, us, i.toLong, "click", 1.0, "{}")
    }
    val base = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), base)
    val physical = layout match {
      case "nanos_long" => df.withColumn("ts", col("ts") * 1000L)
      case "ntz_micros" =>
        df.withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
    }
    physical.write.parquet(s"$dir/events.parquet")
    Tables.events(spark, dir.getAbsolutePath)
  }

  test("legacy int64-nanos and current timestamp_ntz layouts load identically") {
    val legacy = loadAs("nanos_long")
    val current = loadAs("ntz_micros")
    for (df <- Seq(legacy, current)) {
      assert(df.schema("ts").dataType === LongType)
      assert(df.schema("ts_ts").dataType === TimestampType)
      assert(df.columns.toSeq ===
        Seq("event_id", "ts", "user_id", "event_type", "value", "props", "ts_ts"))
    }
    val l = legacy.select("event_id", "ts", "ts_ts").orderBy("event_id").collect()
    val c = current.select("event_id", "ts", "ts_ts").orderBy("event_id").collect()
    assert(l.toSeq === c.toSeq)
    assert(l.map(_.getLong(1)).toSeq === instantsMicros)
  }

  test("ts_ts is the same instant as ts under the pinned UTC session") {
    val df = loadAs("ntz_micros")
    val drift = df.filter(unix_micros(col("ts_ts")) =!= col("ts")).count()
    assert(drift === 0L)
  }
}
