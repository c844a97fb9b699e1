package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Native Catalyst expression for the Lloyd-iteration assignment step:
  * given a BIGINT-quantized vector and a (small) centroid table carried
  * as an array of `struct(cluster int, c array<bigint>)`, return
  * `struct(dist bigint, cluster int)` — the minimum squared L2 distance
  * over the centroids, ties broken by the LOWEST cluster id.
  *
  * This is the k-means/PQ argmin the similarity family trains with
  * (optimization round 14, guide §2.4/§1.2): the relational
  * formulation — `crossJoin(broadcast(cents))` then
  * `groupBy(vec_id).agg(min(dist*100+cluster))` — paid a broadcast
  * exchange plus an aggregation exchange PER LLOYD ROUND, and evaluated
  * the distance through interpreted `aggregate(zip_with(...))` lambdas.
  * With the centroids collected to the driver between rounds (they are
  * k·dim BIGINTs — 8×64 here — the same driver-resident centroid state
  * Spark MLlib's own KMeans keeps per iteration) and inlined as a
  * LITERAL argument to this expression, every assignment is a narrow
  * codegen projection over the corpus: zero exchanges, one fused
  * k×dim JVM loop per row. Values are bit-identical to the relational
  * argmin: the same integer squared-distance sum (addition is
  * associative and overflow-free — |dist| ≤ dim·(2·10⁶)² ≪ 2⁶³), and
  * `min(dist*100+cluster)` ≡ (min dist, then min cluster) whenever
  * cluster < 100, which is exactly the struct tiebreak here.
  *
  * NULL/degenerate semantics: inputs are non-null by construction
  * (quantized projections of non-null embeddings; a literal centroid
  * table). A null input or an empty/length-mismatched centroid table
  * yields the sentinel `(dist = -1, cluster = -1)` — never a real
  * assignment (real distances are ≥ 0, real clusters ≥ 0), and the
  * expression stays NON-NULLABLE so constraint inference cannot push
  * an `IsNotNull(lloyd_argmin(...))` below the projection and
  * double-evaluate the k×dim loop (the [[MinhashSigs]] lesson).
  */
case class LloydArgmin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LloydArgmin.outType
  override def nullable: Boolean = false
  override def prettyName: String = "lloyd_argmin"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _),
          ArrayType(StructType(Array(
            StructField(_, IntegerType, _, _),
            StructField(_, ArrayType(LongType, _), _, _))), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<struct<cluster:int,c:array<bigint>>>), " +
        s"got ${l.catalogString} and ${r.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    val c = right.eval(input)
    if (v == null || c == null) LloydArgmin.SENTINEL()
    else LloydArgmin.compute(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val code =
      code"""
        ${l.code}
        ${r.code}
        InternalRow ${ev.value} = (${l.isNull} || ${r.isNull}) ?
          graft.functions.LloydArgmin.SENTINEL() :
          graft.functions.LloydArgmin.compute(${l.value}, ${r.value});
      """
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LloydArgmin =
    copy(left = newLeft, right = newRight)
}

object LloydArgmin {
  val outType: StructType = StructType(Seq(
    StructField("dist", LongType, nullable = false),
    StructField("cluster", IntegerType, nullable = false)))

  private val sentinelRow: InternalRow = InternalRow(-1L, -1)
  def SENTINEL(): InternalRow = sentinelRow

  /** One fused pass: for each centroid (ascending-cluster order not
    * required — the tiebreak is explicit), the squared L2 distance to
    * `vec` over BIGINTs; keep the (dist, cluster) minimum with
    * lowest-cluster tiebreak. Centroids whose dimension differs from
    * the vector's are skipped (the relational `zip_with` form nulled
    * their distance out of the min the same way).
    */
  def compute(vec: ArrayData, cents: ArrayData): InternalRow = {
    val dim = vec.numElements()
    val k = cents.numElements()
    var bestD = Long.MaxValue
    var bestC = -1
    var any = false
    var i = 0
    while (i < k) {
      val row = cents.getStruct(i, 2)
      val c = row.getArray(1)
      if (c.numElements() == dim) {
        val cl = row.getInt(0)
        var d = 0L
        var j = 0
        while (j < dim) {
          val diff = vec.getLong(j) - c.getLong(j)
          d += diff * diff
          j += 1
        }
        if (!any || d < bestD || (d == bestD && cl < bestC)) {
          bestD = d; bestC = cl; any = true
        }
      }
      i += 1
    }
    if (!any) sentinelRow else InternalRow(bestD, bestC)
  }
}
