package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd squared euclidean distance over two
  * ArrayType(Float|Double) columns — the assignment/ADC primitive of the
  * product-quantization path (reference trains/scans flat codebooks in
  * crates/mnemo-core/src/index/usearch.rs:66-360).
  *
  * Versus the `zip_with`+`aggregate` composition in
  * [[graft.functions.VectorOps.squaredL2Distance]], this avoids the
  * intermediate difference array per row: one fused loop, one scalar
  * accumulator, inside whole-stage codegen. Accumulation is
  * left-to-right in double — bit-identical to the composed version and
  * to DuckDB's `list_sum(list_transform(list_zip(a, b), ...))`, so
  * swapping it into an oracle-checked query changes no hashes.
  *
  * Null semantics: null if either array is null or the lengths differ
  * (matching the composed zip_with form); array elements are assumed
  * non-null (embeddings are dense).
  */
case class SquaredL2DistanceExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"squared_l2 expects array<float>|array<double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    // length mismatch → NULL (matches the composed zip_with form and
    // DuckDB list_zip; a prefix-only distance is silently wrong)
    if (xs.numElements() != ys.numElements()) return null
    val n = xs.numElements()
    val leftIsFloat = elemType(left) == FloatType
    val rightIsFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftIsFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rightIsFloat) ys.getFloat(i).toDouble else ys.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, arr: String, i: String): String = elemType(e) match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ${getter(left, a, i)} - ${getter(right, b, i)};
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2DistanceExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "squared_l2"
}
