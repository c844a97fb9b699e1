package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text normalization worker for [[TextClean]]. Replicates,
  * character-for-character, the four-regex projection it replaces:
  *
  *  - normalized    = lower(regexp_replace(trim(text), " +", " "))
  *  - no_punct      = regexp_replace(text, "[^a-zA-Z0-9 ]", "")
  *  - digits_masked = regexp_replace(text, "[0-9]", "#")
  *  - n_special     = length(text) − length(regexp_replace(text, "[^a-zA-Z ]", ""))
  *
  * All four are single-pass character-class operations; running them
  * through java.util.regex costs four full engine scans per row plus
  * match-state allocation. This worker walks the string once, building
  * the three outputs and the count together. The final lowercase goes
  * through `UTF8String.toLowerCase` — the exact code path Spark's own
  * `lower()` takes — so non-ASCII case mapping stays bit-identical to
  * the expression combo this replaces. `n_special` counts CODE POINTS
  * (a non-BMP character's two surrogate halves are one removed char in
  * `length()` terms), matching the length-difference formula.
  */
object TextCleaner extends Serializable {
  def clean(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    val norm = new java.lang.StringBuilder(n)
    val noPunct = new java.lang.StringBuilder(n)
    val masked = new java.lang.StringBuilder(n)
    var nSpecial = 0
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val isLetter = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      val isDigit = c >= '0' && c <= '9'
      // normalized: trim leading/trailing ' ', collapse ' ' runs.
      if (c == ' ') { if (started) pendingSpace = true }
      else {
        if (pendingSpace) { norm.append(' '); pendingSpace = false }
        norm.append(c)
        started = true
      }
      if (isLetter || isDigit || c == ' ') noPunct.append(c)
      masked.append(if (isDigit) '#' else c)
      // Count code points outside [a-zA-Z ]: skip the low surrogate so a
      // non-BMP character counts once, like length() would.
      if (!isLetter && c != ' ' && !Character.isLowSurrogate(c)) nSpecial += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(norm.toString).toLowerCase,
      UTF8String.fromString(noPunct.toString),
      UTF8String.fromString(masked.toString),
      nSpecial))
  }
}

/** `text_clean(text)` — struct(normalized, no_punct, digits_masked,
  * n_special) in ONE pass over the text (see [[TextCleaner]] for the
  * exact regex semantics replicated). Codegen emits a single worker
  * call per row; the struct fields are projected out by ordinary
  * GetStructField, and whole-stage codegen's subexpression elimination
  * keeps the walk at once per row however many fields are read.
  */
case class TextClean(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("normalized", StringType, nullable = false),
    StructField("no_punct", StringType, nullable = false),
    StructField("digits_masked", StringType, nullable = false),
    StructField("n_special", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "text_clean"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  override protected def nullSafeEval(t: Any): Any =
    TextCleaner.clean(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCleaner.clean($c)")

  override protected def withNewChildInternal(newChild: Expression): TextClean =
    copy(child = newChild)
}
