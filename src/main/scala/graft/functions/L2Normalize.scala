package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd L2 normalization of an `array<float>` /
  * `array<double>` column into a unit `array<double>`.
  *
  * Replaces the higher-order-function form (`transform` dividing by a
  * `sqrt(aggregate(...))` sub-expression): Catalyst inlines that norm
  * sub-tree into the per-element lambda, so the interpreted
  * sum-of-squares re-ran once PER ELEMENT — O(d²) interpreted work per
  * row, ~1.4 s per query execution on a 2000×64 corpus, paid by every
  * embedding operator. This expression is the semantics-identical
  * O(d) loop inside whole-stage codegen.
  *
  * Bit-parity contract (the DuckDB oracles replay it): elements cast
  * to double, squares summed in index-ascending order, each element
  * divided by the sqrt; an all-zero (or squared-underflow) vector
  * yields all zeros rather than NaNs — Spark sorts NaN as the LARGEST
  * double, so a NaN vector would rank as every query's best neighbor.
  * A null ELEMENT nulls the whole result (a real embedding never has
  * one; a null must not silently score as zero). */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "l2_normalize"

  private def fromFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val tmp = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val xi = if (fromFloat) a.getFloat(i).toDouble else a.getDouble(i)
      tmp(i) = xi
      ss += xi * xi
      i += 1
    }
    val norm = math.sqrt(ss)
    if (norm == 0.0) java.util.Arrays.fill(tmp, 0.0)
    else {
      i = 0
      while (i < n) { tmp(i) = tmp(i) / norm; i += 1 }
    }
    new GenericArrayData(tmp)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val tmp = ctx.freshName("tmp")
      val ss = ctx.freshName("ss")
      val norm = ctx.freshName("norm")
      val xi = ctx.freshName("xi")
      val get = if (fromFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $tmp = new double[$n];
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $xi = $get;
         |  $tmp[$i] = $xi;
         |  $ss += $xi * $xi;
         |}
         |if (!${ev.isNull}) {
         |  double $norm = java.lang.Math.sqrt($ss);
         |  if ($norm == 0.0) {
         |    java.util.Arrays.fill($tmp, 0.0);
         |  } else {
         |    for (int $j = 0; $j < $n; $j++) { $tmp[$j] = $tmp[$j] / $norm; }
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($tmp);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}
