package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression computing the sign-random-projection bit
  * mask (Charikar STOC 2002) of a numeric embedding against `numPlanes`
  * deterministic hyperplanes: bit j of the result is set iff
  * `Σ_d embedding[d] · hv(planeOffset + j, d) > 0`, where
  * `hv(p, d) = fmix32(p·64 + d) / 2^32 · 2 − 1` and `fmix32` is the
  * MurmurHash3 32-bit finalizer (`h ^= h>>>16; h *= 0x85ebca6b;
  * h ^= h>>>13; h *= 0xc2b2ae35; h ^= h>>>16`, all mod 2^32) — a
  * full-avalanche hash the DuckDB oracle reproduces bit-identically
  * (SimilarityOps `llm_cosine_neardup`).
  *
  * The avalanche matters, not just determinism: the previous formula
  * (`frac(idx · c / 1000003)`, a Weyl sequence in the flat plane×dim
  * index) made every hyperplane a constant-slope sawtooth of ONE
  * underlying sequence — the planes were strongly correlated, so real
  * (clustered) embedding corpora collapsed into a few sign-pattern
  * classes: at 600k vectors the hottest 16-bit band bucket held ~10,000
  * vectors (measured; near-Poisson would be ~40) and the within-bucket
  * self-join materialized 2.3 BILLION candidate pairs. fmix32 planes
  * are effectively i.i.d.: the same corpus hashes to max-occupancy ~40,
  * a ~100× candidate cut with identical recall structure (collision
  * probability per plane is the standard 1 − θ/π for INDEPENDENT signs,
  * which is exactly what correlated planes fail to deliver).
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
  * Result: LongType bit mask, bit j = plane `planeOffset + j` (so band b
  * of width-w bands is `hyperplane_bits(e, w, w·b)` — each band hashed
  * independently against its own plane range, which lifts the old
  * 64-plane total ceiling: one CALL still yields ≤ 64 bits, but the
  * global plane index space is unbounded, so the corpus-count
  * auto-scaler (SimilarityOps.autoLshBpb) can widen bands past 16 bits
  * as the corpus grows instead of letting bucket occupancy — and the
  * within-bucket self-join — grow linearly with it). A zero-offset call
  * is bit-identical to the historical single-mask form (`bit p = plane
  * p`), so all existing geometries and their DuckDB oracles are
  * unchanged. NULL array → NULL. `numPlanes` must be a foldable integer
  * in [1, 64]; `planeOffset` a foldable integer ≥ 0.
  */
case class HyperplaneBits(child: Expression, numPlanes: Int, planeOffset: Int = 0)
    extends UnaryExpression {

  require(numPlanes >= 1 && numPlanes <= 64,
    s"hyperplane_bits supports 1..64 planes per call, got $numPlanes")
  require(planeOffset >= 0, s"hyperplane_bits plane offset must be >= 0, got $planeOffset")

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
        acc += x * HyperplaneBits.hv(planeOffset + p, d)
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
      val h = ctx.freshName("h")
      // fmix32 inline; Java long multiply wraps mod 2^64, so `& 0xffffffffL`
      // after each product is an EXACT mod-2^32 multiply (matching the
      // DuckDB oracle's HUGEINT-free split-multiply formulation).
      s"""
         |final int $n = $a.numElements();
         |long $mask = 0L;
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    long $h = ($planeOffset + $p) * 64L + $d;
         |    $h ^= $h >>> 16; $h = ($h * 0x85ebca6bL) & 0xffffffffL;
         |    $h ^= $h >>> 13; $h = ($h * 0xc2b2ae35L) & 0xffffffffL;
         |    $h ^= $h >>> 16;
         |    $acc += ${getter(a, d)} * ((double) $h / 4294967296.0 * 2.0 - 1.0);
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

object HyperplaneBits {
  /** Hyperplane component (p, d) in [−1, 1): `fmix32(p·64 + d)` scaled.
    * Java long multiplication wraps mod 2^64, so masking to 32 bits after
    * each product is an exact mod-2^32 multiply — identical to the DuckDB
    * oracle's split-multiply formulation, which never exceeds 2^48 and so
    * needs neither HUGEINT nor wrap-around semantics.
    */
  def hv(p: Int, d: Int): Double = {
    var h = p * 64L + d
    h ^= h >>> 16; h = (h * 0x85ebca6bL) & 0xffffffffL
    h ^= h >>> 13; h = (h * 0xc2b2ae35L) & 0xffffffffL
    h ^= h >>> 16
    h.toDouble / 4294967296.0 * 2.0 - 1.0
  }
}
