package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate (`topk_pairs(score, id, k)`): keeps the k
  * best (score DESC, id ASC) pairs in a fixed-size heap and returns them
  * as a sorted `array<struct<score double, id bigint>>`.
  *
  * Why a custom `TypedImperativeAggregate` (SURVEY §7.2 M6): top-k as an
  * AGGREGATE gets Spark's two-phase execution — each map task reduces
  * its partition to at most k pairs before the shuffle, so the exchange
  * carries O(partitions × k) rows regardless of input size. The
  * row_number-window formulation shuffles every scored row to its
  * group's reducer first (WindowGroupLimit prunes map-side too, but
  * still sorts per partition); the heap needs no sort at all — O(n log
  * k) updates. `TopKSpec` proves result equality against the window
  * formulation on real data.
  *
  * Ties break deterministically (lower id wins), NULL scores/ids are
  * ignored, and the serialized buffer is a flat (size, pairs…) byte
  * stream.
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!scoreExpr.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure("topk_pairs: score must be numeric")
    else if (!isIntegral(idExpr.dataType))
      TypeCheckResult.TypeCheckFailure("topk_pairs: id must be integral")
    else if (!kExpr.foldable || !isIntegral(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("topk_pairs: k must be an integer literal")
    else if (kExpr.eval() == null)
      TypeCheckResult.TypeCheckFailure("topk_pairs: k must not be NULL")
    else if (k <= 0) TypeCheckResult.TypeCheckFailure("topk_pairs: k must be positive")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** Heap root = the WORST kept pair (lowest score; ties: larger id),
    * so replacement is an O(log k) peek-compare-swap.
    */
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    p: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(p)
    else if (better(p, buf.head)) { buf.dequeue(); buf.enqueue(p) }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      val d = s.asInstanceOf[Number].doubleValue()
      // NaN scores (e.g. cosine of a zero-norm vector) are unrankable:
      // admitted, one would sit at the heap root where `better` (all NaN
      // comparisons false) could never displace it, silently blocking
      // every true top-k pair. Treated like NULL instead.
      if (!d.isNaN) offer(buf, (d, i.asInstanceOf[Number].longValue()))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortWith(better)
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))

  override def prettyName: String = "topk_pairs"
}
