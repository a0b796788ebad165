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
