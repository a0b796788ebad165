package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe #2 for round 20: separates DRIVER PLANNING time from
  * execution for the exchange-heavy small-data queries (m-family guard
  * rollups, funnel staging), decomposes the staging sub-phases, and
  * times the per-epoch cost of the classifier training loop against a
  * bare job-cadence floor. Guide §1: find out WHERE the time goes
  * before touching anything. */
object ProbeR20b {
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
    import graft.functions.DedupEnrich
    import graft.multimodal.MediaPipeline
    (1 to reps).foreach { rep =>
      println(s"=== rep $rep ===")
      // planning-only cost (analysis + optimizer + physical planning,
      // no execution): how much of a small-data query is driver time
      Seq("m5_frame_neardup", "m9_media_funnel", "m3_phash_neardup",
        "d12_guarded_batch_pairs").foreach { q =>
        time(s"$q planning only") {
          SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
        }
        spark.catalog.clearCache()
      }
      // cadence floor: trivial 2-stage job over a cached 32-part frame
      locally {
        val base = spark.range(0, 50000, 1, 32)
          .withColumn("k", col("id") % 273).cache()
        base.count()
        (1 to 3).foreach { i =>
          time(s"cadence floor: groupBy job $i") {
            base.groupBy("k").agg(sum(col("id"))).collect(); ()
          }
        }
        base.unpersist(false)
      }
      // ---- staging sub-phases (ungated, enriched pre-cached) ----
      locally {
        val enriched = graft.queries.Pipeline.clsEnriched(spark, sfDir).cache()
        time("enriched cache build (count)") { enriched.count() }
        val train = enriched.filter(!col("is_eval"))
        val q = train.filter(col("kept") === 1)
        val canon = q.groupBy("fp").agg(min(col("doc_id")).as("canonical_id"))
        val uniq = q.join(DedupEnrich.joinBackBuild(canon), "fp")
          .withColumn("canonical",
            (col("doc_id") === col("canonical_id")).cast("int"))
        val banded = DedupEnrich.withBandKeys(
          uniq.filter(col("canonical") === 1)
            .select(col("doc_id"), col("sh")), "sh").cache()
        time("staging: banded cache build (count)") { banded.count() }
        val fkeys = banded.select(col("doc_id").as("id"),
          explode(col("bands")).as("key"))
        val (fsat, fpairs) = DedupEnrich.guardedCandidatePairs(fkeys, 3L)
        val fver = fpairs
          .join(banded.select(col("doc_id").as("a"), col("sh").as("sha")),
            Seq("a"))
          .join(banded.select(col("doc_id").as("b"), col("sh").as("shb")),
            Seq("b"))
          .filter(graft.functions.TextOps.jaccard(col("sha"), col("shb"))
            >= 0.3)
          .select("a", "b")
        val fverRows = time("staging: fver collect (guard+verify)") {
          fver.collect()
        }
        println(s"   (fver pairs: ${fverRows.length})")
        val fcomp = time("staging: minLabelComponents") {
          DedupEnrich.minLabelComponents(fver,
            graft.queries.IterSizing.iterParts(spark))
        }
        val fdrop = fsat.select(col("id").as("doc_id"))
          .unionAll(fcomp.filter(col("node") =!= col("component"))
            .select(col("node").as("doc_id")))
          .distinct().withColumn("fuzzy_drop", lit(1))
        val evalGrams = enriched.filter(col("is_eval"))
          .select(explode(col("grams")).as("gram")).distinct()
        val flagged = uniq.filter(col("canonical") === 1)
          .join(fdrop, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), explode(col("grams")).as("gram"))
          .join(broadcast(evalGrams), Seq("gram"))
          .select("doc_id").distinct().withColumn("flag", lit(1))
        val joined = train
          .join(uniq.select(col("doc_id"), col("canonical")),
            Seq("doc_id"), "left")
          .join(fdrop, Seq("doc_id"), "left")
          .join(flagged, Seq("doc_id"), "left")
          .withColumn("stage",
            when(col("kept") =!= 1, 0)
              .when(col("canonical").isNull || col("canonical") =!= 1, 1)
              .when(col("fuzzy_drop") === 1, 2)
              .when(col("flag") === 1, 3)
              .otherwise(4))
          .select("doc_id", "lang", "stage")
        time("staging: final assembly (checksum)") { force(joined) }
        spark.catalog.clearCache()
      }
      // ---- classifier training: per-epoch cost vs floor ----
      locally {
        val enriched = graft.queries.Pipeline.clsEnriched(spark, sfDir).cache()
        enriched.count()
        val feats = enriched
          .select("doc_id", "lang", "kept", "is_eval", "buckets")
        val staged4 = graft.queries.Pipeline
          .funnelStage4Core(spark, enriched, None).cache()
        staged4.count()
        time("clsTrained total") {
          graft.queries.Pipeline.clsTrained(spark, feats, staged4)
        }
        // epoch decomposition: same frames, hand-rolled loop
        val lab = staged4
          .filter(col("stage") === 0 || col("stage") === 4)
          .select(col("doc_id"), (col("stage") === 4).cast("int").as("y"))
          .cache()
        val n = time("  train: lab count") { lab.count() }
        val tr = feats.join(lab, "doc_id")
          .select(col("y"),
            graft.queries.Pipeline.clsXNorm(col("buckets")).as("x"),
            col("buckets"))
          .coalesce(graft.queries.IterSizing.iterParts(spark))
          .cache()
        time("  train: tr cache build (count)") { tr.count() }
        val w0 = Array.fill(graft.queries.Pipeline.ClsDim)(
          java.math.BigDecimal.ZERO)
        (1 to 3).foreach { i =>
          time(s"  train: one epoch gradient job $i") {
            graft.queries.Pipeline.clsEpochGradient(tr, w0, n).collect(); ()
          }
        }
        time("  train: epoch planning only") {
          graft.queries.Pipeline.clsEpochGradient(tr, w0, n)
            .queryExecution.executedPlan
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
