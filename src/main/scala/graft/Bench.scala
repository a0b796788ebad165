package graft
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, sum, xxhash64}

/** Benchmark main: times every SparkEntry query at the sf dir given by
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line (driver contract); the
  * same line is also written to bench_out.json for offline reads.
  *
  * Methodology: the FIRST of the N reps doubles as the JIT +
  * whole-stage-codegen warmup (a per-plan one-time cost of ~0.5-5
  * s/query, irrelevant at 100 TB where each plan compiles once and runs
  * for minutes): min-of-N never selects the cold rep, so the mins are
  * the same warm numbers the rounds-3..7 dedicated warmup pass
  * produced, at ~half the wall clock (that pass re-ran all ~100 queries
  * untimed, JIT-cold — the most expensive pass of the run; the round-7
  * verdict flagged it). Warming happens at the measured SF by
  * construction, which matters because AQE picks different physical
  * plans per data size. Caches are cleared between reps, so every rep
  * pays real IO + shuffle. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // timed action: a checksum aggregate over every output column, so
    // column-pruning cannot skip projected expression work the way a
    // bare count() can (an envelope-string query would otherwise be
    // timed without building its envelopes). Falls back to count() for
    // the rare output type the hash expression rejects.
    def force(df: DataFrame): Unit = {
      try df.agg(sum(xxhash64(df.columns.map(col): _*))).collect()
      catch { case _: Throwable => df.count() }
    }
    // criterion samples each bench many times and reports a statistic;
    // min-of-N is the cheap robust analogue (drops GC/straggler noise
    // AND the JIT-cold first rep, which serves as the warmup — see the
    // methodology note above). 3 reps (round 3) stopped min-of-2's
    // single-straggler artifacts; 5 reps (round 7) damps the ±50%
    // ambient whole-suite swings this box shows (isolated re-measures
    // of every "regressed" query in rounds 5-7 landed back in band —
    // the suite mins were the noise).
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    // dev-only subset filter (comma-separated names); unset = all
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // a query that throws must surface as an error, not as a fast "time
    // to fail" masquerading as a valid min — Left(message) vs Right(sec)
    val results: Seq[(String, Either[String, Double])] = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val outcomes = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val err = try { force(fn(spark, sfDir)); None }
          catch { case e: Throwable => Some(e.toString.take(200)) }
        spark.catalog.clearCache() // no cross-query cache effects
        (err, (System.nanoTime() - t0) / 1e9)
      }
      val firstErr = outcomes.flatMap(_._1).headOption
      name -> firstErr.toLeft(outcomes.map(_._2).min)
    }.toSeq
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val qs = results.map {
      case (k, Right(v)) => s"\"" + k + "\":" + v
      case (k, Left(_)) => s"\"" + k + "\":\"err\""
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(m)) => s"\"${k}\":\"${esc(m)}\"" }
    val errsJson = if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    // methodology is IN the emitted line so rounds are compared
    // like-for-like: warm JIT, min-of-N reps, checksum-forced outputs
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"warmup":"first_rep","timed_action":"checksum_agg"$errsJson}"""
    println(line)
    try Files.writeString(Paths.get("bench_out.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
