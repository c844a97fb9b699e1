package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing, in ONE compiled pass over a
  * document's word array, the MinHash-LSH signature block the dedup
  * family is built on:
  *
  *   struct(mh:    array<string>  — 8 elements, mh[s] = min over the
  *                 doc's word 3-shingles of md5('<s>:' ‖ shingle) in
  *                 lowercase hex,
  *          shset: array<bigint>  — the doc's DISTINCT xxhash64(shingle)
  *                 values, first-occurrence order)
  *
  * Bit-identical to the relational formulations it replaces —
  * `min(md5(concat('<s>:', shingle)))` over the exploded
  * [[graft.llm.Grams.ngrams]] relation for `mh`, and
  * `collect_set(xxhash64(shingle))` for `shset` (as a SET; callers only
  * apply order-insensitive `array_intersect`/`size`) — because the
  * shingle bytes are the same UTF-8 concatenation (words joined by a
  * single 0x20, null words skipped exactly as `concat_ws` skips them),
  * md5 is md5, and lowercase-hex lexicographic order equals unsigned
  * byte order of the 16-byte digest, so the min is taken on raw digests
  * and only the 8 winners are hex-encoded. xxhash64 uses Spark's own
  * XXH64 with the expression default seed 42.
  *
  * Why an expression and not SQL (optimization round 14, the LSH-kernel
  * fix): the aggregate form's `min` over an md5-hex STRING has no
  * mutable hash-agg buffer, so every LSH-family row fell back to
  * SortAggregate — a full sort of the corpus-wide exploded shingle
  * relation. The array-HOF form (`array_min(transform(...))`) removes
  * the shuffle but evaluates its lambdas INTERPRETED per element
  * (measured ~2× slower than the codegen'd aggregate at sf0.1 — the
  * same hazard the [[HyperplaneBits]] scaladoc documents). This fused
  * loop is invoked once per ROW from within whole-stage codegen and
  * runs the ~8·|shingles| digests in plain JVM code: no sort, no
  * shuffle, no per-element dispatch. At 100 TB the corpus is never
  * shuffled or sorted to get signed — signature generation is a narrow
  * scan, and the band self-join becomes the candidate pipeline's ONLY
  * exchange.
  *
  * NULL input array → NULL; fewer than 3 words (no shingles) → NULL,
  * matching the aggregate form where such docs produced no row (callers
  * filter).
  */
case class MinhashSigs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MinhashSigs.outType

  /** NEVER null — a null word array or one with < 3 words (no shingles)
    * yields the shared EMPTY struct (both arrays empty) instead of
    * null, and callers filter on word count BEFORE this projection.
    * Deliberate: a nullable result makes constraint inference push
    * `IsNotNull(minhash_sigs(...))` below the projection, where the
    * ~8·|shingles| digests run TWICE per row (once in the pushed
    * Filter, once in the Project — observed in the incremental-dedup
    * plan before this). Non-nullable, no IsNotNull exists to push; and
    * the expression stays DETERMINISTIC so identical signature
    * subtrees still dedupe via ReusedExchange (a non-deterministic
    * flag — guide §4.4's other remedy — defeats `semanticEquals` and
    * with it all exchange reuse).
    */
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sigs"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinhashSigs.EMPTY else MinhashSigs.compute(v.asInstanceOf[ArrayData])
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.catalogString}")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        InternalRow ${ev.value} = ${c.isNull} ?
          graft.functions.MinhashSigs.EMPTY() :
          graft.functions.MinhashSigs.compute(${c.value});
      """
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {
  val outType: StructType = StructType(Seq(
    StructField("mh", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("shset", ArrayType(LongType, containsNull = false), nullable = false)))

  private val seedPrefix: Array[Array[Byte]] =
    (0 to 7).map(s => s"$s:".getBytes("UTF-8")).toArray

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned byte-wise less-than over two 16-byte digests — equal to
    * lexicographic order of their lowercase-hex renderings.
    */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** The no-shingles result (both arrays empty) — shared, immutable.
    * A method, not a val, so generated Java sees a plain static call.
    */
  private val emptyRow: InternalRow =
    InternalRow(new GenericArrayData(Array.empty[Any]),
      new GenericArrayData(Array.empty[Any]))
  def EMPTY(): InternalRow = emptyRow

  /** One pass over the word array: all 8 digest minima + the distinct
    * shingle-hash set. Public + static-shaped so codegen calls it
    * directly. No shingles (< 3 words) yields [[EMPTY]], never null.
    */
  def compute(ws: ArrayData): InternalRow = {
    val n = ws.numElements()
    if (n < 3) return emptyRow
    val md = md5Local.get()
    val mins = new Array[Array[Byte]](8)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= n - 3) {
      // Shingle bytes = the non-null of the 3 words joined by single
      // 0x20 separators — exactly concat_ws(' ', w, w, w).
      var len = 0
      var parts = 0
      var k = 0
      while (k < 3) {
        if (!ws.isNullAt(i + k)) {
          len += ws.getUTF8String(i + k).numBytes()
          parts += 1
        }
        k += 1
      }
      if (parts > 1) len += parts - 1
      val sh = new Array[Byte](len)
      var off = 0
      var written = 0
      k = 0
      while (k < 3) {
        if (!ws.isNullAt(i + k)) {
          if (written > 0) { sh(off) = ' '; off += 1 }
          val u = ws.getUTF8String(i + k)
          u.writeToMemory(sh, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
          off += u.numBytes()
          written += 1
        }
        k += 1
      }
      var s = 0
      while (s < 8) {
        md.reset()
        md.update(seedPrefix(s))
        md.update(sh)
        val d = md.digest()
        if (mins(s) == null || less(d, mins(s))) mins(s) = d
        s += 1
      }
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        sh, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, sh.length, 42L))
      i += 1
    }
    val mh = new GenericArrayData(mins.map(hex(_): Any))
    val it = seen.iterator()
    val hs = new Array[Any](seen.size())
    var j = 0
    while (it.hasNext) { hs(j) = it.next().longValue(); j += 1 }
    InternalRow(mh, new GenericArrayData(hs))
  }
}
