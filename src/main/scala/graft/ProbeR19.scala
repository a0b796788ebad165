package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only phase probe for the round-19 optimization work: times the
  * funnel staging's internal phases so the optimization targets the
  * measured cost, not the guessed one (guide §1). Not registered in
  * SparkEntry; prints labelled timings. */
object ProbeR19 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"## $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: DataFrame): Unit = {
      df.agg(bit_xor(xxhash64(df.columns.toIndexedSeq.map(col): _*))).collect()
      ()
    }
    def run(label: String)(f: => DataFrame): Unit = {
      time(label)(force(f)); spark.catalog.clearCache()
    }
    (1 to reps).foreach { rep =>
      println(s"=== rep $rep ===")
      spark.conf.set("graft.bpe.strategy", "distributed")
      run("pl18 distributed") {
        SparkEntry.queries("pl18_bpe_merges")(spark, sfDir) }
      spark.conf.set("graft.bpe.strategy", "local")
      run("pl18 local") {
        SparkEntry.queries("pl18_bpe_merges")(spark, sfDir) }
      spark.conf.set("graft.bpe.strategy", "distributed")
      run("pl19 distributed") {
        SparkEntry.queries("pl19_bpe_encode")(spark, sfDir) }
      spark.conf.set("graft.bpe.strategy", "local")
      run("pl19 local") {
        SparkEntry.queries("pl19_bpe_encode")(spark, sfDir) }
      spark.conf.unset("graft.bpe.strategy")
      // funnel phases, each from cold cache
      run("pl16 full") {
        SparkEntry.queries("pl16_curation_funnel")(spark, sfDir) }
      time("enriched build+cache (count)") {
        val e = graft.queries.Pipeline.funnelEnriched(spark, sfDir).cache()
        e.count()
      }
      run("staged4 with enriched precached (checksum)") {
        graft.queries.Pipeline.funnelStage4Core(spark,
          graft.queries.Pipeline.funnelEnriched(spark, sfDir).cache(), None)
      }
      run("pl20 full") {
        SparkEntry.queries("pl20_quality_classifier")(spark, sfDir) }
      run("pl21 full") {
        SparkEntry.queries("pl21_classifier_gate")(spark, sfDir) }
      run("pl23 full") {
        SparkEntry.queries("pl23_gated_funnel")(spark, sfDir) }
      // staging sub-phases over a pre-materialized enriched cache
      locally {
        import graft.functions.DedupEnrich
        val enriched = graft.queries.Pipeline.funnelEnriched(spark, sfDir)
          .cache()
        enriched.count()
        val train = enriched.filter(!col("is_eval"))
        val q = train.filter(col("kept") === 1)
        val canon = time("eager: canon+uniq+banded build") {
          val c = q.groupBy("fp").agg(min(col("doc_id")).as("canonical_id"))
          val u = q.join(DedupEnrich.joinBackBuild(c), "fp")
            .withColumn("canonical",
              (col("doc_id") === col("canonical_id")).cast("int"))
          val banded = DedupEnrich.withBandKeys(
            u.filter(col("canonical") === 1)
              .select(col("doc_id"), col("sh")), "sh").cache()
          banded.count()
          banded
        }
        time("guard: counts+semi/anti+selfjoin+verify+cc") {
          val fkeys = canon.select(col("doc_id").as("id"),
            explode(col("bands")).as("key"))
          val (fsat, fpairs) = DedupEnrich.guardedCandidatePairs(fkeys, 3L)
          val fver = fpairs
            .join(canon.select(col("doc_id").as("a"), col("sh").as("sha")),
              Seq("a"))
            .join(canon.select(col("doc_id").as("b"), col("sh").as("shb")),
              Seq("b"))
            .filter(graft.functions.TextOps.jaccard(col("sha"), col("shb"))
              >= 0.3)
            .select("a", "b")
          val fcomp = DedupEnrich.minLabelComponents(fver,
            graft.queries.IterSizing.iterParts(spark))
          fsat.unionAll(fcomp.select(col("node").as("id"))).count()
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
