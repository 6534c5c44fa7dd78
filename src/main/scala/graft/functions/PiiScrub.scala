package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole staged PII scrub — redacted text plus the per-pattern
  * match counts — as ONE codegen expression returning a struct.
  *
  * Why it exists (optimization r17, guide §1.2 "per-task work" +
  * §4.4): the column-chain spelling (`regexp_count` staged over
  * `regexp_replace` prefixes) expands to ~7 independent regex
  * expressions whose shared stage prefixes Catalyst only deduplicates
  * within a single Project; the moment a filter references the counts,
  * predicate pushdown copies the whole staged chain into the Filter and
  * every row pays it twice. Fused, each pattern runs one
  * `Matcher.find()` loop that counts and replaces in the same pass (no
  * `regexp_extract_all` array materialization), and the expression is
  * declared NON-DETERMINISTIC purely as an optimizer barrier — the
  * documented Spark idiom for "evaluate this expensive thing once"
  * (the same reason `asNondeterministic()` exists on UDFs): the filter
  * then runs above the projection instead of duplicating it.
  *
  * Semantics are bit-identical to the staged chain (PiiScrubSpec pins
  * it against the column spelling): count i is taken on the text with
  * patterns 1..i-1 already replaced, replacement is global
  * left-to-right, both via the same `java.util.regex` engine Spark's
  * own `regexp_replace`/`regexp_count` use.
  */
case class PiiScrubExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = PiiScrub.resultType

  override def prettyName: String = PiiScrub.name

  // Optimizer barrier, not actual randomness: block predicate pushdown /
  // projection collapse from duplicating the scrub (see scaladoc).
  override lazy val deterministic: Boolean = false

  override protected def nullSafeEval(input: Any): Any =
    PiiScrub.scrub(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.sql.catalyst.InternalRow) graft.functions.PiiScrub.scrub($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiScrubExpr =
    copy(child = newChild)
}

object PiiScrub {

  val name = "pii_scrub"

  /** (name, pattern, replacement) in application order — the single
    * source of truth; `Redact.patterns` re-exports it. Patterns are the
    * portable regex subset shared with the DuckDB oracles. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("id", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<ID>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+?\\d[\\d\\s().-]{7,}\\d", "<PHONE>"))

  val resultType: StructType = StructType(
    StructField("redacted", StringType) +:
      patterns.map { case (n, _, _) => StructField(s"n_$n", IntegerType, nullable = false) })

  private val compiled: Array[(java.util.regex.Pattern, String)] =
    patterns.map { case (_, re, tok) => (java.util.regex.Pattern.compile(re), tok) }.toArray

  /** One fused staged pass: per pattern, count matches and replace them
    * in the same Matcher loop; the next pattern sees the replaced text,
    * exactly like the staged column chain. */
  def scrub(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    var cur = input.toString
    val out = new Array[Any](1 + compiled.length)
    var i = 0
    while (i < compiled.length) {
      val (p, tok) = compiled(i)
      val m = p.matcher(cur)
      if (!m.find()) {
        out(i + 1) = 0
      } else {
        val sb = new java.lang.StringBuilder(cur.length)
        var n = 0
        var go = true
        while (go) {
          n += 1
          m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(tok))
          go = m.find()
        }
        m.appendTail(sb)
        cur = sb.toString
        out(i + 1) = n
      }
      i += 1
    }
    out(0) = UTF8String.fromString(cur)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  /** Register into the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[PiiScrubExpr].getName, name),
        (children: Seq[Expression]) => {
          require(children.length == 1,
            s"$name expects 1 argument, got ${children.length}")
          PiiScrubExpr(children.head)
        })
    }
  }
}
