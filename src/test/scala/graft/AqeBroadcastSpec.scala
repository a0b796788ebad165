package graft

import org.apache.spark.sql.functions._

/** Runtime evidence for the second AQE lane a 100 TB job relies on
  * (beside SkewJoinSpec's skew split): a join planned as sort-merge —
  * because the static optimizer cannot size an aggregated side — is
  * converted to a BROADCAST hash join at runtime once the shuffle
  * stage's actual bytes turn out tiny. This is what keeps
  * dimension-after-aggregation joins cheap at scale without hand-placed
  * broadcast hints on every derived frame. */
class AqeBroadcastSpec extends SparkSpec {


  test("AQE converts a statically-planned sort-merge join to broadcast at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      // threshold low enough that the STATIC planner (which sees only
      // the un-aggregated child estimate) refuses to broadcast, but the
      // RUNTIME size of the aggregated side (a handful of rows) passes
      "spark.sql.autoBroadcastJoinThreshold" -> "10KB") {
      val events = Tables.events(spark, Sf)
      // the small side only becomes small AFTER the aggregate runs:
      // one row per event_type (5 rows at runtime)
      val perType = events.groupBy("event_type")
        .agg(avg(col("value")).as("type_avg"))
      val joined = events.select("event_id", "event_type", "value")
        .join(perType, "event_type")
        .filter(col("value") > col("type_avg"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      val finalSection = plan.split("== Initial Plan ==")(0)
      assert(finalSection.contains("BroadcastHashJoin"),
        s"AQE did not convert the join to broadcast; final plan:\n$finalSection")
      assert(plan.contains("== Initial Plan ==") &&
        plan.split("== Initial Plan ==")(1).contains("SortMergeJoin"),
        "the initial (static) plan should have been a sort-merge join — " +
          "otherwise this spec is not exercising the runtime conversion")
    }
  }
}
