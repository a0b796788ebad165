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

  test("d1 join-back at corpus scale: the mega-dup fp partition STREAMS through a hash probe, never sorts") {
    // Round 13 replaced count/min over (partition by fp) with
    // groupBy(fp) + join-back for the mega-dup corpus class. This spec
    // pins the AT-SCALE story of that join-back, with broadcast
    // disabled to simulate a corpus-sized groups table:
    //  - AQE's skew-join split CANNOT apply here, structurally: the
    //    groups side aggregates on the join key itself, so its final
    //    HashAggregate sits between the Sort and the shuffle stage and
    //    OptimizeSkewedJoin's SortExec(ShuffleQueryStage)-on-both-sides
    //    pattern never matches (verified empirically — with or without
    //    the group_size filter). Splits are also the wrong tool: the
    //    hot partition holds ONE key, and every split would replicate
    //    that key's single build row anyway.
    //  - What the shape needs instead is to not SORT the hot
    //    partition: a sort-merge join would materialize and sort the
    //    mega-dup fp's entire doc list per partition — the very cost
    //    the de-windowing removed. A shuffle_hash-hinted build side
    //    (one row per fingerprint — small per partition at any corpus
    //    size) makes the probe side STREAM: linear scan, bounded
    //    memory, no sort, one narrow (doc_id, fp) row at a time.
    // At test scale the un-hinted plan broadcasts the groups side,
    // which is strictly better still — the hint below is the
    // documented at-scale configuration, not a query change.
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") { // corpus-scale sides
      import graft.functions.DedupEnrich
      // mega-dup corpus: 90% of docs share ONE fingerprint
      val d = spark.range(2000)
        .repartition(8)
        .withColumn("rep", explode(lit((0 until 32).toArray)))
        .select(col("id").as("doc_id"),
          when(col("id") % 10 =!= 0,
            lit("the same boilerplate template text repeated everywhere"))
            .otherwise(concat(lit("unique document number "), col("id")))
            .as("text"))
        .withColumn("fp", DedupEnrich.exactFp(col("text")))
        .select("doc_id", "fp")
      // the d1 shape with the at-scale build-side hint
      val groups = d.groupBy("fp")
        .agg(count(lit(1)).as("group_size"), min(col("doc_id")).as("canonical_id"))
        .filter(col("group_size") > 1)
      val joined = d.join(groups.hint("shuffle_hash"), "fp")
      val rows = joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("ShuffledHashJoin"),
        s"expected the streaming hash probe; final plan:\n$finalPlan")
      assert(!finalPlan.contains("SortMergeJoin"),
        "the mega-dup partition must not pay a sort-merge sort")
      // correctness under the streamed probe: the boilerplate fp
      // groups 1800 ids x 32 replicas; each "unique" id still forms
      // its own 32-replica group (the explode duplicates text verbatim)
      val sizes = rows.map(_.getAs[Long]("group_size")).groupBy(identity)
        .view.mapValues(_.length).toMap
      assert(sizes == Map(1800L * 32 -> 1800 * 32, 32L -> 200 * 32),
        s"wrong group accounting: $sizes")
    }
    // the escape hatch reaches the REGISTERED operators, not just this
    // synthetic shape: under graft.joinback.strategy=shuffle_hash the
    // registered d1 plans the streaming hash probe (and without the
    // conf, test scale broadcasts as before)
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "graft.joinback.strategy" -> "shuffle_hash") {
      val p = SparkEntry.queries("d1_exact_dedup")(spark, Sf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("ShuffledHashJoin") && !p.contains("SortMergeJoin"),
        s"registered d1 must honor the at-scale join strategy:\n$p")
    }
  }
}
