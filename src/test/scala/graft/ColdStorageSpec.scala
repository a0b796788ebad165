package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Cold-storage archive/restore (SURVEY S18, storage/cold.rs:1-120): the
  * reference archives records as JSON objects keyed by agent; the Spark
  * equivalent is a partitioned JSON write + schema-preserving read. */
class ColdStorageSpec extends SparkSpec {

  test("archive to agent-partitioned JSON and restore losslessly") {
    val dir = Files.createTempDirectory("cold").toFile.getAbsolutePath
    val events = Tables.events(spark, Sf)
      .select("event_id", "user_id", "event_type", "value", "ts")
      .filter(col("user_id") < 5)

    events.write.partitionBy("user_id").mode("overwrite").json(dir)

    val restored = spark.read.json(dir)
    assert(restored.count() == events.count())
    // values roundtrip (JSON partition column comes back as a plain column)
    val a = events.select("event_id", "user_id", "event_type", "value", "ts")
      .orderBy("event_id").collect().map(_.toString).toSeq
    val b = restored.select(col("event_id"), col("user_id"),
        col("event_type"), col("value"), col("ts"))
      .orderBy("event_id").collect().map(_.toString).toSeq
    assert(a == b)
    // partition pruning: a single-agent restore touches one directory
    val one = spark.read.json(dir).filter(col("user_id") === 3)
    assert(one.count() == events.filter(col("user_id") === 3).count())
  }
}
