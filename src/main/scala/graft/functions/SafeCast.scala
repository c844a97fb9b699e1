package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Expression, If, Literal, RLike, RuntimeReplaceable}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** `safe_cast(expr, 'type')` — TRY-mode cast with the exception path
  * short-circuited for the common hot case.
  *
  * Spark's `try_cast(string AS int)` evaluates the ANSI cast and catches
  * its exception per failing row; constructing the error (message +
  * SQL-value rendering) costs ~16 µs/row single-threaded (measured via
  * `tools/PkgProfile --raw`: 2.4 s for 150k all-failing rows, ~30× the
  * surrounding projection). On a 100 TB corpus a mostly-non-numeric
  * column — exactly what `dbt_utils.safe_cast` exists for — would spend
  * its entire runtime building discarded exceptions.
  *
  * The rewrite: when the child is a string and the target integral, a
  * digit-presence test (`RLIKE '[0-9]'`, ~100 ns/row, regex compiled
  * once) gates the TRY cast. A digit is a NECESSARY condition for any
  * integral parse (sign/whitespace alone never parse), so rows without
  * one go straight to NULL — the value try_cast would produce — and the
  * exception path remains only for digit-containing garbage ('12abc'),
  * which is rare in real data. Every other (childType, target) pair —
  * including boolean→int (true→1, which a string-side guard would get
  * WRONG) and all tz-sensitive casts — delegates to the plain TRY cast,
  * so semantics are try_cast's everywhere by construction.
  */
case class SafeCast(child: Expression, target: DataType)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression] {

  override lazy val replacement: Expression = {
    val tryCast =
      Cast(child, target, Some(SQLConf.get.sessionLocalTimeZone), EvalMode.TRY)
    (child.dataType, target) match {
      case (_: StringType, ByteType | ShortType | IntegerType | LongType) =>
        If(RLike(child, Literal("[0-9]")), tryCast, Literal(null, target))
      case _ => tryCast
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SafeCast =
    copy(child = newChild)
}
