package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only phase probe for the round-20 optimization work: decomposes
  * the two target families — pl23 (the most expensive query) and the
  * media m-family (the biggest untouched block) — so the optimization
  * targets the measured cost, not the guessed one (guide §1). Not
  * registered in SparkEntry; prints labelled timings. */
object ProbeR20 {
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
    import graft.multimodal.MediaPipeline
    (1 to reps).foreach { rep =>
      println(s"=== rep $rep ===")
      // ---- media family ----
      run("m5 full") { SparkEntry.queries("m5_frame_neardup")(spark, sfDir) }
      run("m9 full") { SparkEntry.queries("m9_media_funnel")(spark, sfDir) }
      run("m3 full") { SparkEntry.queries("m3_phash_neardup")(spark, sfDir) }
      time("perceptualHash pass (count)") {
        MediaPipeline.perceptualHash(
          MediaPipeline.syntheticMedia(spark, sfDir)).toDF().count()
      }
      time("frameHashes pass (count)") {
        MediaPipeline.frameHashes(
          MediaPipeline.syntheticMedia(spark, sfDir)).toDF().count()
      }
      time("admissionPass (count)") {
        MediaPipeline.admissionPass(
          MediaPipeline.syntheticMedia(spark, sfDir)).toDF().count()
      }
      time("frameHashes checksum (all cols)") {
        force(MediaPipeline.frameHashes(
          MediaPipeline.syntheticMedia(spark, sfDir)).toDF())
      }
      // m5 with the frame-hash pass pre-cached: isolates guard+verify+
      // rollup cost from the hash pass itself
      locally {
        import graft.functions.DedupEnrich
        val fh = MediaPipeline.frameHashes(
          MediaPipeline.syntheticMedia(spark, sfDir)).toDF().cache()
        time("m5: fh cache build (count)") { fh.count() }
        time("m5: rollup over cached fh (checksum)") {
          force(graft.queries.Multimodal.frameNeardupRollup(fh,
            graft.queries.Multimodal.FrameHotKeys).orderBy("media_id"))
        }
        spark.catalog.clearCache()
      }
      // ---- classifier family / pl23 ----
      run("pl21 full") { SparkEntry.queries("pl21_classifier_gate")(spark, sfDir) }
      run("pl23 full") { SparkEntry.queries("pl23_gated_funnel")(spark, sfDir) }
      locally {
        val enriched = time("pl23: enriched build+cache (count)") {
          val e = graft.queries.Pipeline.clsEnriched(spark, sfDir).cache()
          e.count(); e
        }
        val feats = enriched
          .select("doc_id", "lang", "kept", "is_eval", "buckets")
        val staged4 = time("pl23: ungated staged4 (count, cached)") {
          val st = graft.queries.Pipeline
            .funnelStage4Core(spark, enriched, None).cache()
          st.count(); st
        }
        val w = time("pl23: clsTrained (8 epochs)") {
          graft.queries.Pipeline.clsTrained(spark, feats, staged4)
        }
        val scored = time("pl23: clsScoreAll+cache (count)") {
          val sc = graft.queries.Pipeline.clsScoreAll(feats, w).cache()
          sc.count(); sc
        }
        val tail = time("pl23: tail bucket assign (count, cached)") {
          val t = graft.queries.Pipeline.clsBucketAssign(scored)
            .filter(col("bucket") === 3).select("doc_id").cache()
          t.count(); t
        }
        time("pl23: gated staging + report (checksum)") {
          force(graft.queries.Pipeline
            .gatedFunnelReport(spark, enriched, tail))
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
