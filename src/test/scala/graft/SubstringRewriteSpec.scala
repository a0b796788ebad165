package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** d14's removal contract on a CONSTRUCTED corpus (the oracle gate
  * proves cross-engine equality; this proves the semantics are the
  * ones Lee et al. 2022 publish): duplicated windows keep exactly one
  * canonical occurrence (min doc_id, then min position), overlapping
  * spans merge, in-doc repeats dedup, sub-window docs are untouched. */
class SubstringRewriteSpec extends SparkSpec {

  private def run(texts: (Long, String)*): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    val dir = Files.createTempDirectory("d14").toFile.getAbsolutePath
    texts.toSeq.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("d14_substring_rewrite")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("duplicated windows keep ONE canonical occurrence; counts partition; sub-window docs untouched") {
    val shared = words("dup", 20) // 20 tokens -> 5 windows, all duplicated
    val r = run(
      1L -> (words("a", 10) + " " + shared), // canonical holder (min doc)
      2L -> (words("b", 10) + " " + shared), // loses the shared span
      3L -> words("c", 12)) // 12 tokens < W: no windows, untouched
    // doc 1 holds every shared window's canonical occurrence: nothing
    // removed (its own windows over the a-prefix are unique)
    assert(r(1L) == (30L, 0L, 30L), s"canonical doc: ${r(1L)}")
    // doc 2: the duplicated windows start at positions 11..15 and
    // cover tokens 11..30 — the whole 20-token shared suffix goes
    assert(r(2L) == (30L, 20L, 10L), s"duplicate doc: ${r(2L)}")
    assert(r(3L) == (12L, 0L, 12L), s"sub-window doc: ${r(3L)}")
    // invariant: counts partition
    r.values.foreach { case (n, rm, kp) => assert(rm + kp == n) }
  }

  test("in-document repeats dedup too: the second occurrence of a window inside ONE doc is removed") {
    val span = words("x", 16) // exactly one window
    val r = run(10L -> (span + " " + words("mid", 5) + " " + span))
    // 37 tokens; the second occurrence (positions 22..37) is covered
    val (n, rm, kp) = r(10L)
    assert(n == 37L && rm == 16L && kp == 21L, s"in-doc repeat: ${r(10L)}")
  }

  test("d14 BEFORE fuzzy dedup (Lee et al.'s published pipeline order): removal dissolves boilerplate-driven near-dup pairs and consumes exact dups") {
    import graft.functions.{DedupEnrich, TextOps}
    import spark.implicits._
    // two docs sharing a 40-token boilerplate header plus distinct
    // bodies (the false-near-dup class the published order exists
    // for), and an exact-dup pair (true substring duplication)
    val boiler = words("boiler", 40)
    val docs = Seq(
      (1L, boiler + " " + words("alpha", 15)),
      (2L, boiler + " " + words("beta", 15)),
      (3L, words("gamma", 30)),
      (4L, words("gamma", 30))).toDF("doc_id", "text")
    val base = docs.select(col("doc_id"),
      TextOps.tokens(col("text")).as("toks")).cache()
    def jac(df: org.apache.spark.sql.DataFrame, x: Long, y: Long): Double = {
      val sh = df.select(col("doc_id"),
        DedupEnrich.shingleSetFromToks(col("toks")).as("sh"))
      sh.filter(col("doc_id") === x).select(col("sh").as("sa"))
        .crossJoin(sh.filter(col("doc_id") === y).select(col("sh").as("sb")))
        .select(TextOps.jaccard(col("sa"), col("sb")).cast("double"))
        .collect()(0).getDouble(0)
    }
    // BEFORE removal the boilerplate drives a false near-dup pair past
    // the d3/funnel verification bar
    assert(jac(base, 1L, 2L) >= 0.3,
      "fixture must present a boilerplate-driven near-dup before removal")
    // the published order: rewrite FIRST, fuzzy on the survivors —
    // the SAME builder the registered d14 verifies
    val kept = graft.queries.Dedup.substringKeptTokens(base).cache()
    val rebuilt = kept.groupBy("doc_id").agg(
      transform(array_sort(collect_list(struct(col("t"), col("tok")))),
        x => x.getField("tok")).as("toks"))
    assert(jac(rebuilt, 1L, 2L) < 0.3,
      "after removal the boilerplate pair must dissolve — doc 2 lost the header")
    // the canonical holder keeps everything (doc 1: min doc_id)
    val counts = kept.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(1L) == 55L, s"canonical boilerplate holder: $counts")
    // true substring duplication is CONSUMED by the rewrite: the
    // non-canonical exact dup keeps nothing, so the fuzzy stage never
    // sees it — exactly why Lee et al. order removal first
    assert(counts(3L) == 30L && !counts.contains(4L),
      s"exact dup must be fully consumed before fuzzy: $counts")
  }

  test("registered corpus: non-vacuous, counts partition everywhere") {
    val rows = SparkEntry.queries("d14_substring_rewrite")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == r.getLong(1),
        s"doc ${r.getLong(0)}: removed + kept != total")
      assert(r.getString(4).length == 32)
    }
    assert(rows.map(_.getLong(2)).sum > 0,
      "the corpus's near-dup docs must produce removals — vacuous rewrite")
  }
}
