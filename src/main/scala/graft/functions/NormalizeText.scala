package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — Spark
  * has no built-in for it, and a corpus mixing composed é (U+00E9)
  * with decomposed e+U+0301 breaks every downstream equality: exact
  * dedup hashes, shingle joins, token counts all see different bytes
  * for canonically-equal text.
  *
  * (b)-path custom operator: `doGenCode` keeps the call inside
  * whole-stage codegen — one static `Normalizer.normalize` invocation,
  * no UDF serialization boundary. Oracle parity: DuckDB's
  * `nfc_normalize` implements the same Unicode canonical composition.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "normalize_nfc"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NormalizeNfc.nfc(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NormalizeNfc.nfc($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object NormalizeNfc {

  val name = "normalize_nfc"

  /** Fast path: `Normalizer.isNormalized` is a cheap scan that avoids
    * allocating a new string for already-NFC text — which at 100 TB is
    * almost every document. */
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** Register into the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[NormalizeNfc].getName, name),
        (children: Seq[Expression]) => {
          require(children.length == 1,
            s"$name expects 1 argument, got ${children.length}")
          NormalizeNfc(children.head)
        })
    }
  }
}
