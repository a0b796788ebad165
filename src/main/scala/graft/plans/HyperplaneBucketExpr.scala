package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd random-hyperplane LSH bucket id: the sign bits of
  * `nPlanes` dot products of the input vector against deterministic
  * splitmix-derived hyperplanes (the ANN pre-partitioning primitive of
  * the dedup and k-NN lanes; reference usage pattern:
  * crates/mnemo-core/src/index/usearch.rs:66-360 coarse partitioning).
  *
  * Versus composing `nPlanes` separate `zip_with`+`aggregate` trees over
  * 64-literal plane arrays (the previous formulation in
  * [[graft.functions.VectorOps.hyperplaneBucket]]), this keeps the
  * coefficient table OUT of the expression tree — a single referenced
  * `double[]` — so the generated code is a 10-line loop instead of
  * thousands of literal nodes. That matters twice: janino compiles it in
  * milliseconds (the literal version cost seconds per plan, which a
  * busy codegen cache turns into a per-query tax), and the loop stays
  * comfortably inside whole-stage codegen.
  *
  * Bit-identical to the SQL rendering
  * [[graft.functions.VectorOps.hyperplaneBucketSql]]: same coefficients,
  * same left-to-right double accumulation, same `>= 0` sign test — and
  * the same degenerate-input semantics: the SQL chain indexes exactly
  * `dim` elements, so a shorter vector or a null element makes every
  * plane's dot NULL and every CASE emit 0, i.e. bucket 0. The native
  * paths mirror that (bucket 0 on short/null-element input) instead of
  * zero-padding, so bucket ids can never diverge between engines.
  */
case class HyperplaneBucketExpr(child: Expression, dim: Int, nPlanes: Int, seed: Long)
    extends UnaryExpression {

  // the bucket id is one sign bit per plane in a 64-bit long; plane 64
  // would be `1L << 64 == 1L`, silently XOR-colliding with plane 0
  require(nPlanes >= 1 && nPlanes <= 63,
    s"hyperplane_bucket supports 1..63 planes (long bucket id), got $nPlanes")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket expects array<float>|array<double>, got ${dt.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // flattened [plane * dim + i] coefficient table — computed once on the
  // driver, shipped as a plain object reference, never as literal nodes
  @transient private lazy val coefs: Array[Double] =
    Array.tabulate(nPlanes * dim)(k =>
      graft.functions.VectorOps.planeCoef(k / dim, k % dim, seed))

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    if (xs.numElements() < dim) return 0L
    var k = 0
    while (k < dim) {
      if (xs.isNullAt(k)) return 0L
      k += 1
    }
    val fl = isFloat
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      val base = p * dim
      var i = 0
      while (i < dim) {
        val x = if (fl) xs.getFloat(i).toDouble else xs.getDouble(i)
        dot += x * coefs(base + i)
        i += 1
      }
      if (dot >= 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coefRef = ctx.addReferenceObj("planeCoefs", coefs, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val ok = ctx.freshName("ok")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val bkt = ctx.freshName("bkt")
      val base = ctx.freshName("base")
      // SQL-mirror degenerate semantics: short vector or null element
      // → every plane dot is NULL in SQL → bucket 0 here.
      s"""
         |long $bkt = 0L;
         |boolean $ok = $a.numElements() >= $dim;
         |for (int $i = 0; $ok && $i < $dim; $i++) {
         |  if ($a.isNullAt($i)) $ok = false;
         |}
         |if ($ok) {
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    double $dot = 0.0;
         |    int $base = $p * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += ((double) $a.$getter($i)) * $coefRef[$base + $i];
         |    }
         |    if ($dot >= 0.0) $bkt |= (1L << $p);
         |  }
         |}
         |${ev.value} = $bkt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_bucket"
}
