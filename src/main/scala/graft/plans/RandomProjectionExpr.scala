package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd Johnson-Lindenstrauss random projection: maps a
  * `dim`-dimensional vector to `k` dimensions through the deterministic
  * splitmix-derived coefficient table shared with the LSH buckets
  * ([[graft.functions.VectorOps.planeCoef]]) — the cheap
  * dimensionality-reduction step a 100 TB embedding pipeline runs
  * before ANN indexing or near-dup blocking (the same coarse-geometry
  * role as the reference's index partitioning,
  * crates/mnemo-core/src/index/usearch.rs:66-360).
  *
  * Same design rules as [[HyperplaneBucketExpr]]: the k×dim table rides
  * as ONE object reference (never literal nodes, so janino compiles a
  * short loop), accumulation is left-to-right in double, and the
  * degenerate semantics mirror the SQL rendering exactly — a vector
  * shorter than `dim` or containing a null element yields NULL (the SQL
  * CASE guard emits NULL for the whole projected array), so results can
  * never diverge between engines.
  *
  * SQL mirror: [[graft.functions.VectorOps.randomProjectionSql]].
  */
case class RandomProjectionExpr(child: Expression, dim: Int, k: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"random_project expects array<float>|array<double>, got ${dt.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // flattened [j * dim + i] coefficient table — computed once on the
  // driver, shipped as a plain object reference, never as literal nodes
  @transient private lazy val coefs: Array[Double] =
    Array.tabulate(k * dim)(n =>
      graft.functions.VectorOps.planeCoef(n / dim, n % dim, seed))

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    if (xs.numElements() < dim) return null
    var n = 0
    while (n < dim) {
      if (xs.isNullAt(n)) return null
      n += 1
    }
    val fl = isFloat
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      var dot = 0.0
      val base = j * dim
      var i = 0
      while (i < dim) {
        val x = if (fl) xs.getFloat(i).toDouble else xs.getDouble(i)
        dot += x * coefs(base + i)
        i += 1
      }
      out(j) = dot
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coefRef = ctx.addReferenceObj("projCoefs", coefs, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val ok = ctx.freshName("ok")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      val out = ctx.freshName("out")
      // SQL-mirror degenerate semantics: short vector or null element
      // → the SQL CASE guard yields NULL → NULL here too.
      s"""
         |boolean $ok = $a.numElements() >= $dim;
         |for (int $i = 0; $ok && $i < $dim; $i++) {
         |  if ($a.isNullAt($i)) $ok = false;
         |}
         |if ($ok) {
         |  double[] $out = new double[$k];
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $dot = 0.0;
         |    int $base = $j * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += ((double) $a.$getter($i)) * $coefRef[$base + $i];
         |    }
         |    $out[$j] = $dot;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RandomProjectionExpr =
    copy(child = newChild)

  override def prettyName: String = "random_project"
}
