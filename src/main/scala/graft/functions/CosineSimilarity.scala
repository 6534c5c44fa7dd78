package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns — the (b)-path of the custom-operator
  * preference order (builder brief): a codegen'd `Expression` beats a
  * Scala UDF beats a higher-order-function chain. `doGenCode` emits a
  * tight primitive loop that stays inside whole-stage codegen (no
  * boxing, no lambda dispatch per element).
  *
  * Summation order is index-ascending, matching the DuckDB oracle's
  * `list_cosine_similarity` on `DOUBLE[]` bit-for-bit. Mismatched
  * vector lengths yield NULL (a real dimension bug must not silently
  * score the common prefix; DuckDB raises on mismatch).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // NULL on length mismatch even when both inputs are non-null.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  ${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 :
         |    $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  val name = "cosine_similarity"

  /** Register into a session's function registry (idempotent) so
    * `call_function("cosine_similarity", a, b)` and SQL both resolve.
    * Direct-registry registration works on any session — no
    * spark.sql.extensions config required (the `GraftExtensions`
    * class wires the same function for sessions built with
    * `--conf spark.sql.extensions=graft.functions.GraftExtensions`). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[CosineSimilarity].getName, name),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            s"${CosineSimilarity.name} expects 2 arguments, got ${children.length}")
          CosineSimilarity(children(0), children(1))
        })
    }
  }
}

/** Session-extension hook: `spark.sql.extensions=graft.functions.GraftExtensions`
  * installs every custom codegen expression into sessions at build time
  * — the deployment seam for clusters where calling `register(spark)`
  * per session isn't an option (e.g. Thrift server, notebooks). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(CosineSimilarity.name),
      new ExpressionInfo(classOf[CosineSimilarity].getName, CosineSimilarity.name),
      (children: Seq[Expression]) => {
          require(children.length == 2,
            s"${CosineSimilarity.name} expects 2 arguments, got ${children.length}")
          CosineSimilarity(children(0), children(1))
        }))
    ext.injectFunction((
      FunctionIdentifier(NormalizeNfc.name),
      new ExpressionInfo(classOf[NormalizeNfc].getName, NormalizeNfc.name),
      (children: Seq[Expression]) => {
          require(children.length == 1,
            s"${NormalizeNfc.name} expects 1 argument, got ${children.length}")
          NormalizeNfc(children.head)
        }))
    ext.injectFunction((
      FunctionIdentifier("l2_normalize"),
      new ExpressionInfo(classOf[L2Normalize].getName, "l2_normalize"),
      (children: Seq[Expression]) => {
          require(children.length == 1,
            s"l2_normalize expects 1 argument, got ${children.length}")
          L2Normalize(children.head)
        }))
  }
}
