package graft

import org.apache.spark.sql.functions._

/** Runtime evidence for the AQE lane of the skew strategy (SURVEY §4):
  * k1_salted_agg demonstrates MANUAL salting for skewed aggregation;
  * this spec demonstrates that Adaptive Query Execution's skew-join
  * handling engages at runtime on a skewed shuffle join — the re-plan
  * path a 100 TB job relies on when a hot key concentrates one
  * partition. The thresholds are lowered only because the spec corpus
  * is small; production defaults (256 MB / factor 5) engage the same
  * mechanism.
  */
class SkewJoinSpec extends SparkSpec {


  test("AQE splits the hot partition of a skewed sort-merge join at runtime") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // Partition coalescing can absorb the hot partition into a merged
      // reader BEFORE skew detection compares sizes, making the spec
      // depend on byte-size accounting noise. Skew detection itself is
      // what this spec pins down, so turn coalescing off here.
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // Split skewed partitions even when AQE judges the extra shuffle
      // not worth it at this tiny scale — determinism over heuristics.
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB") {
      // 90% of the left side lands on one key, replicated 32x with a
      // per-replica perturbation (incompressible doubles), so the hot
      // shuffle partition's COMPRESSED size — what MapStatus reports and
      // skew detection compares — exceeds the 8KB threshold by orders of
      // magnitude deterministically. The .repartition(8) matters: AQE can
      // only split a skewed reduce partition along MAP-output boundaries,
      // and the tiny parquet scan otherwise produces a single map task —
      // an unsplittable hot partition no matter how large.
      val left = Tables.events(spark, Sf)
        .repartition(8)
        .withColumn("rep", explode(lit((0 until 32).toArray)))
        .select(when(col("user_id") < 900, lit(0L)).otherwise(col("user_id")).as("k"),
          (col("value") * (col("rep") + lit(1))).as("value"), col("rep"))
      val right = Tables.events(spark, Sf)
        .select(col("user_id").as("k"), col("event_type")).distinct()
      val joined = left.join(right, "k")
      // run THIS DataFrame's queryExecution (count() would plan a new
      // aggregate query and leave this one unexecuted)
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew-join did not engage; final plan:\n$finalPlan")
    }
  }
}
