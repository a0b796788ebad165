package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native expressions with Spark
  * SQL, so `SELECT cosine_sim(a, b)` works from any SQL surface:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)        // programmatic
  * // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // arity gate: a wrong argument count should read as a usage error,
    // not an IndexOutOfBounds from children(i) — and extra args must
    // not be silently dropped
    def arity(fn: String, children: Seq[Expression], lo: Int, hi: Int): Unit =
      if (children.length < lo || children.length > hi)
        throw new IllegalArgumentException(
          s"$fn expects ${if (lo == hi) s"$lo" else s"$lo to $hi"} argument(s), " +
            s"got ${children.length}")
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        arity("cosine_sim", children, 2, 2)
        CosineSimilarityExpr(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("squared_l2"),
      new ExpressionInfo(classOf[SquaredL2DistanceExpr].getName, "squared_l2"),
      (children: Seq[Expression]) => {
        arity("squared_l2", children, 2, 2)
        SquaredL2DistanceExpr(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("char_trigram_counts"),
      new ExpressionInfo(classOf[CharTrigramCountsExpr].getName, "char_trigram_counts"),
      (children: Seq[Expression]) => {
        arity("char_trigram_counts", children, 1, 1)
        CharTrigramCountsExpr(children.head)
      }))
    // foldability gate BEFORE eval: an attribute reference would
    // otherwise throw an unbound-reference internal error instead of
    // the usage message (and a NULL literal folds to null, which is
    // equally unusable as a dimension)
    def litArg(fn: String)(e: Expression): Long = {
      if (!e.foldable) throw new IllegalArgumentException(
        s"$fn expects literal int args, got non-literal $e")
      e.eval(null) match {
        case n: Number => n.longValue()
        case other => throw new IllegalArgumentException(
          s"$fn expects literal int args, got $other")
      }
    }
    ext.injectFunction((
      FunctionIdentifier("random_project"),
      new ExpressionInfo(classOf[RandomProjectionExpr].getName, "random_project"),
      (children: Seq[Expression]) => {
        arity("random_project", children, 3, 4)
        val lit = litArg("random_project") _
        RandomProjectionExpr(children.head,
          lit(children(1)).toInt, lit(children(2)).toInt,
          if (children.length > 3) lit(children(3)) else 42L)
      }))
    ext.injectFunction((
      FunctionIdentifier("hash_embedding"),
      new ExpressionInfo(classOf[HashEmbeddingExpr].getName, "hash_embedding"),
      (children: Seq[Expression]) => {
        arity("hash_embedding", children, 1, 2)
        val lit = litArg("hash_embedding") _
        HashEmbeddingExpr(children.head,
          if (children.length > 1) lit(children(1)).toInt else 64)
      }))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucketExpr].getName, "hyperplane_bucket"),
      (children: Seq[Expression]) => {
        arity("hyperplane_bucket", children, 3, 4)
        val lit = litArg("hyperplane_bucket") _
        HyperplaneBucketExpr(children.head,
          lit(children(1)).toInt, lit(children(2)).toInt,
          if (children.length > 3) lit(children(3)) else 42L)
      }))
  }
}
