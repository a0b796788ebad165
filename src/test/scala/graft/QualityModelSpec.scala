package graft

import java.nio.file.Files

import graft.api.QualityModel
import org.apache.spark.sql.functions._

/** The persisted classifier store: fit-once weights must reproduce the
  * registered queries' in-query training EXACTLY (the pl20 determinism
  * contract makes the weights exact decimals, so equality is
  * bit-level, not approximate), and the manifest lifecycle must follow
  * the maintained-store discipline. */
class QualityModelSpec extends SparkSpec {

  private def freshDir(): String = {
    val d = Files.createTempDirectory("quality-model").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("fit once, score forever: persisted scores equal pl20's AND pl21's in-query training") {
    val dir = freshDir()
    val gen = QualityModel.fit(spark, Sf, dir)
    assert(gen == 1L)
    val h = QualityModel.describe(spark, dir)
    assert(h.generation == 1L && h.dim == graft.queries.Pipeline.ClsDim
      && h.trainedOn.contains(Sf))
    assert(QualityModel.weights(spark, dir).count() ==
      graft.queries.Pipeline.ClsDim.toLong)
    // (a) the persisted model's EVAL-slice report == the registered
    // pl20 query (which retrains in-query) — so pl20's and pl21's
    // scores agree on the eval slice BY this shared-equality pin
    val scored = QualityModel.score(spark, Sf, dir).cache()
    val repFromStore = scored.filter(col("is_eval"))
      .withColumn("pred", (col("p") >= lit(0.5)).cast("int"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_eval"),
        sum(col("pred").cast("long")).as("n_pred_keep"),
        sum((col("pred") === col("kept")).cast("long")).as("n_agree"),
        sum((col("p") * 1000000).cast("long")).as("sp"))
      .withColumn("accuracy",
        expr("(2 * n_agree * 1000000 + n_eval) DIV (2 * n_eval)")
          .cast("double") / lit(1000000.0))
      .withColumn("mean_p",
        expr("(2 * sp + n_eval) DIV (2 * n_eval)")
          .cast("double") / lit(1000000.0))
      .drop("sp")
    assert(rows(repFromStore) ==
      rows(SparkEntry.queries("pl20_quality_classifier")(spark, Sf)),
      "persisted-model eval report must equal pl20's in-query training")
    // (b) the persisted model's gate report == the registered pl21
    // query (same cutoffs, same composition — trained once here)
    assert(rows(QualityModel.gateReport(spark, Sf, dir)) ==
      rows(SparkEntry.queries("pl21_classifier_gate")(spark, Sf)),
      "persisted-model gate report must equal pl21's in-query training")
    // (c) the persisted model's gated SELECTION == the registered pl23
    // query — the deployed path drops and rescues exactly the same
    // documents the oracle-verified composition does
    assert(rows(QualityModel.gatedReport(spark, Sf, dir)) ==
      rows(SparkEntry.queries("pl23_gated_funnel")(spark, Sf)),
      "persisted-model gated selection must equal pl23's in-query training")
    // the staging the trainer consumes partitions the train corpus
    val staging = QualityModel.gatedStaging(spark, Sf, dir)
      .groupBy("stage").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(staging.keySet.subsetOf(Set(0, 1, 2, 3, 4)) &&
      staging.getOrElse(0, 0L) > 0 && staging.getOrElse(4, 0L) > 0,
      s"gated staging must carry both drops and survivors: $staging")
    scored.unpersist(false)
  }

  test("refit supersedes: new generation commits atomically, old one is swept") {
    val dir = freshDir()
    assert(QualityModel.fit(spark, Sf, dir) == 1L)
    val w1 = rows(QualityModel.weights(spark, dir))
    assert(QualityModel.fit(spark, Sf, dir) == 2L)
    assert(QualityModel.describe(spark, dir).generation == 2L)
    // deterministic training on the same corpus: same weights
    assert(rows(QualityModel.weights(spark, dir)) == w1)
    // gc swept the superseded generation dir
    assert(!graft.api.ManifestIO.pathExists(s"$dir/g1"))
    assert(graft.api.ManifestIO.pathExists(s"$dir/g2"))
  }

  test("scoring an empty store is loud") {
    val dir = freshDir()
    intercept[IllegalStateException] {
      QualityModel.weights(spark, dir)
    }
  }
}
