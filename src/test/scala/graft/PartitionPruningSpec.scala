package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Partition-layout evidence: at 100 TB the memories/documents table is
  * written partitioned by a low-cardinality routing key (lang, org,
  * date); a predicate on that key must prune entire directories at plan
  * time, never touching their files. This spec writes the sf0.001 corpus
  * partitioned by `lang` and proves the pruning happens.
  */
class PartitionPruningSpec extends SparkSpec {

  test("a lang predicate prunes partitions at the scan, and counts stay exact") {
    val dir = Files.createTempDirectory("graft_part").toString
    val d = Tables.documents(spark, Sf)
    d.write.mode("overwrite").partitionBy("lang").parquet(dir)

    val en = spark.read.parquet(dir).filter(col("lang") === "en")
    val p = en.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters"), "expected a partitioned scan")
    assert(p.contains("(lang = en)") || p.contains("lang#") && p.contains("= en"),
      s"lang predicate did not become a partition filter:\n$p")
    // the pruned read must agree with the unpartitioned filter
    assert(en.count() == d.filter(col("lang") === "en").count())

    // pruning actually reduces scanned partitions: the scan node selects
    // exactly the one lang directory out of five
    import org.apache.spark.sql.execution.FileSourceScanExec
    val selected = en.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f.selectedPartitions.partitionCount
    }
    assert(selected.contains(1), s"expected 1 selected partition, got $selected")
  }
}
