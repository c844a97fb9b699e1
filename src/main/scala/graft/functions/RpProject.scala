package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression computing the EXACT-INTEGER signed random
  * projection of an embedding: element d quantizes to
  * `e6 = floor(x·10^6 + 0.5)` (BIGINT) and output j is
  * `Σ_d e6(d) · sign(d, j)` over `RpProject6.K = 16` target dims, with
  * `sign(d, j) = +1 iff the first hex nibble of md5("rp:d:j") < 8` —
  * the md5 convention the DuckDB oracle reproduces relationally
  * (SimilarityOps `llm_random_projection` CTEs), precomputed once into
  * a flat 64×16 table at class-load.
  *
  * Why an expression and not SQL: the relational form (explode 64
  * elements, broadcast-join the sign table, re-group by vector)
  * shuffles a 64×corpus long-form intermediate to rebuild per-vector
  * rows — measured 3.4 s at sf10p where the fused cosine scan runs
  * 0.9 s; and the column-sum form (`transform` + 16×64 `element_at`
  * trees) knocks the stage out of whole-stage codegen entirely (HOFs
  * have no doGenCode), paying interpreted dispatch on every term. This
  * fused loop quantizes each element ONCE and feeds all 16
  * accumulators inside codegen — one pass, zero shuffle, exact same
  * integers as the oracle.
  *
  * Result: array<bigint> of length 16. Supports embeddings up to 64
  * dims (the sign table's extent); NULL array → NULL. NULL ELEMENTS
  * contribute zero to every projection (they are skipped, exactly as a
  * missing trailing dimension is) — the function is registered globally
  * as `rp_project6`, so user SQL may pass containsNull=true arrays;
  * silently reading an undefined slot is not acceptable there.
  */
case class RpProject6(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rp_project6"

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float>/array<double> argument, " +
        s"got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val t = elemType.get
    val n = math.min(a.numElements(), 64)
    val acc = new Array[Long](RpProject6.K)
    var d = 0
    while (d < n) {
      if (!a.isNullAt(d)) { // null elements contribute zero (see Scaladoc)
        val x = t match {
          case FloatType => a.getFloat(d).toDouble
          case _ => a.getDouble(d)
        }
        val e6 = math.floor(x * 1e6 + 0.5).toLong
        var j = 0
        while (j < RpProject6.K) {
          acc(j) += e6 * RpProject6.signs(d * RpProject6.K + j)
          j += 1
        }
      }
      d += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = elemType.get match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    val signsRef = ctx.addReferenceObj("rpSigns", RpProject6.signs, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val e6 = ctx.freshName("e6")
      val acc = ctx.freshName("acc")
      val k = RpProject6.K
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), 64);
         |final long[] $acc = new long[$k];
         |for (int $d = 0; $d < $n; $d++) {
         |  if ($a.isNullAt($d)) continue; // null elements contribute zero
         |  final long $e6 = (long) java.lang.Math.floor(${getter(a, d)} * 1000000.0 + 0.5);
         |  for (int $j = 0; $j < $k; $j++) {
         |    $acc[$j] += $e6 * $signsRef[$d * $k + $j];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RpProject6 =
    copy(child = newChild)
}

object RpProject6 {
  /** Target dimensionality. */
  val K = 16

  /** Flat 64×K ±1 table, sign(d, j) at index d·K + j — BYTE-IDENTICAL
    * to the oracle's `substring(md5('rp:' || d || ':' || j), 1, 1) < '8'`.
    */
  lazy val signs: Array[Long] = {
    val out = new Array[Long](64 * K)
    val mdBase = java.security.MessageDigest.getInstance("MD5")
    for (d <- 0 until 64; j <- 0 until K) {
      val h = mdBase.digest(s"rp:$d:$j".getBytes("UTF-8"))
      out(d * K + j) = if (((h(0) >> 4) & 0xf) < 8) 1L else -1L
    }
    out
  }
}
