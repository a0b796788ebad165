package graft

import graft.api.SqlSurface
import org.apache.spark.sql.functions._

/** F5 hint dispatch (reference: mnemo-pgwire/src/parser.rs:31-94) —
  * detection semantics, strip-then-execute, and both post-processor
  * routes. The oracle rows f6/f7 hash-check the numeric outputs; this
  * spec pins the dispatch behaviour itself. */
class SqlSurfaceSpec extends SparkSpec {

  private def registerMemories(): Unit =
    Tables.documents(spark, Sf).createOrReplaceTempView("memories")

  test("hint detection matches the reference contains-semantics (parser.rs:92-94)") {
    assert(SqlSurface.parseHints("SELECT /*+ reconstruct */ * FROM m").reconstruct)
    assert(SqlSurface.parseHints("select /*+RECONSTRUCT*/ 1").reconstruct)
    assert(SqlSurface.parseHints("SELECT /*+ ORIENTATION_CACHE */ 1").orientationCache)
    assert(SqlSurface.parseHints("SELECT /*+orientation_cache*/ 1").orientationCache)
    val none = SqlSurface.parseHints("SELECT /* reconstruct */ 1") // plain comment
    assert(!none.reconstruct && !none.orientationCache)
  }

  test("unknown hints are stripped; a hint-free statement passes through unchanged") {
    registerMemories()
    val plain =
      "SELECT doc_id, source FROM memories WHERE doc_id < 20 ORDER BY doc_id"
    val hinted =
      "SELECT /*+ merge_join */ doc_id, source FROM memories WHERE doc_id < 20 ORDER BY doc_id"
    assert(SqlSurface.run(spark, plain).collect()
      .sameElements(SqlSurface.run(spark, hinted).collect()))
  }

  test("reconstruct hint routes to the belief-state post-processor") {
    registerMemories()
    val out = SqlSurface.run(spark,
      """SELECT /*+ reconstruct */ doc_id, source, text,
           round(n_chars / 1000e0, 6) AS score
         FROM memories WHERE lang = 'en' ORDER BY score DESC, doc_id LIMIT 3""")
    assert(out.columns.toSeq == Seq("belief", "confidence", "linked_context"))
    val row = out.collect().head
    assert(row.getAs[String]("belief").split(" \\| ").length == 3)
    assert(row.getAs[Double]("confidence") > 0.0)
  }

  test("orientation hint attaches a 5-token namespace line to every hit") {
    registerMemories()
    val out = SqlSurface.run(spark,
      "SELECT /*+ orientation_cache */ doc_id, source FROM memories WHERE doc_id < 10 ORDER BY doc_id")
    assert(out.columns.toSeq == Seq("doc_id", "source", "orientation"))
    assert(out.filter(col("orientation").isNull).count() == 0)
    val widths = out.select(size(split(col("orientation"), " ")).as("n"))
      .collect().map(_.getInt(0))
    assert(widths.forall(_ == 5))
  }
}
