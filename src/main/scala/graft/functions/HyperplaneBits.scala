package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression computing the sign-random-projection bit
  * mask (Charikar STOC 2002) of a numeric embedding against `numPlanes`
  * deterministic hyperplanes: bit p of the result is set iff
  * `Σ_d embedding[d] · hv(p, d) > 0`, where
  * `hv(p, d) = ((((p·64 + d) · 2654435761) mod 1000003) / 1000003) · 2 − 1`
  * — the same fixed Knuth-multiplicative-hash formula the DuckDB oracle
  * reproduces bit-identically (SimilarityOps `llm_cosine_neardup`).
  *
  * This replaces the `transform(sequence(0,15), p -> aggregate(...))`
  * higher-order-function formulation on the LSH banding hot path. The
  * HOF version evaluates 16 interpreted lambda folds per row (~16×64
  * closure dispatches) and, being non-codegen, was the expensive child
  * that forced a MERGE join hint to stop AQE from rebuilding it
  * single-threaded inside a broadcast (VERDICT r6 next #3); this fused
  * loop stays inside whole-stage codegen, computing all plane
  * accumulators in one pass over the array. Accumulation order per plane
  * matches the sequential fold of the HOF version (d = 0..n−1, doubles),
  * so the sign bits — and therefore the bench-critical band buckets —
  * are bit-identical.
  *
  * Result: LongType bit mask, bit p = plane p (so band b of width-w
  * bands is `(mask >> w·b) & (2^w − 1)`). NULL array → NULL. `numPlanes`
  * must be a foldable integer in [1, 64] — 64 planes give 4 bands of 16
  * bits (65,536 buckets/band), the widest geometry the corpus-count
  * auto-scaler (SimilarityOps.autoLshBpb) can request.
  */
case class HyperplaneBits(child: Expression, numPlanes: Int)
    extends UnaryExpression {

  require(numPlanes >= 1 && numPlanes <= 64,
    s"hyperplane_bits supports 1..64 planes, got $numPlanes")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hyperplane_bits"

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
    val n = a.numElements()
    var mask = 0L
    var p = 0
    while (p < numPlanes) {
      var acc = 0.0
      var d = 0
      while (d < n) {
        val x = t match {
          case FloatType => a.getFloat(d).toDouble
          case _ => a.getDouble(d)
        }
        val hv = (((p * 64L + d) * 2654435761L) % 1000003L).toDouble / 1000003.0 * 2.0 - 1.0
        acc += x * hv
        d += 1
      }
      if (acc > 0.0) mask |= 1L << p
      p += 1
    }
    mask
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = elemType.get match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val mask = ctx.freshName("mask")
      val hv = ctx.freshName("hv")
      s"""
         |final int $n = $a.numElements();
         |long $mask = 0L;
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    final double $hv =
         |      (double) ((($p * 64L + $d) * 2654435761L) % 1000003L) / 1000003.0 * 2.0 - 1.0;
         |    $acc += ${getter(a, d)} * $hv;
         |  }
         |  if ($acc > 0.0) $mask |= 1L << $p;
         |}
         |${ev.value} = $mask;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBits =
    copy(child = newChild)
}
