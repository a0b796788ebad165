package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev tool: top-1 agreement of an ANN query vs brute force.
  * Usage: runMain graft.IvfAgree [annName] [sfDir]
  */
object IvfAgree {
  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "v3_knn_ivf"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def top1(q: String): Map[Long, Long] =
      SparkEntry.queries(q)(spark, sfDir).filter(col("rank") === 1)
        .select("qid", "vec_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = top1("v1_knn_bruteforce")
    val ann = top1(name)
    val agree = ann.count { case (q, v) => brute.get(q).contains(v) }
    println(s"== $name top-1 agreement: $agree/${ann.size} at $sfDir")
    spark.stop()
  }
}
