package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring automaton. One pass over the
  * text reports every lexicon pattern that occurs ANYWHERE in it —
  * O(|text| + hits) regardless of lexicon size, where the naive
  * `contains` loop is O(|text| · |lexicon|). This is the scale path the
  * blocklist-filter docs promise (`llm_blocklist_filter` in TextOps):
  * a curation lexicon of 10⁴–10⁵ phrases over a 100 TB corpus cannot
  * afford a per-pattern scan, and substring (not whole-token) semantics
  * rule out the token-set join.
  *
  * The automaton is built ONCE on the driver from the literal lexicon
  * and shipped to executors as a reference object; the trie itself is
  * `@transient lazy` and rebuilds from the pattern array on first use
  * per JVM, so the serialized footprint is just the patterns.
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {

  /** Flat trie: per-node char→node transition maps, failure links, and
    * the pattern indices reported at each node (own + inherited from
    * the failure chain, precomputed at build so matching never walks
    * fail links to report).
    */
  @transient private lazy val trie: (Array[java.util.HashMap[Character, Integer]], Array[Int], Array[Array[Int]]) = {
    val next = ArrayBuffer(new java.util.HashMap[Character, Integer]())
    val ownOut = ArrayBuffer(ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { c =>
        val m = next(node)
        val hit = m.get(c)
        node = if (hit != null) hit.intValue()
        else {
          next += new java.util.HashMap[Character, Integer]()
          ownOut += ArrayBuffer.empty[Int]
          m.put(c, next.length - 1)
          next.length - 1
        }
      }
      ownOut(node) += pi
    }
    val n = next.length
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    out(0) = ownOut(0).toArray
    val queue = new java.util.ArrayDeque[Integer]()
    val rootIt = next(0).entrySet().iterator()
    while (rootIt.hasNext) {
      val v = rootIt.next().getValue.intValue()
      fail(v) = 0
      out(v) = ownOut(v).toArray
      queue.add(v)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      val it = next(u).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getKey
        val v = e.getValue.intValue()
        var f = fail(u)
        var t = next(f).get(c)
        while (t == null && f != 0) { f = fail(f); t = next(f).get(c) }
        fail(v) = if (t == null) 0 else t.intValue()
        out(v) = ownOut(v).toArray ++ out(fail(v))
        queue.add(v)
      }
    }
    (next.toArray, fail, out)
  }

  /** Distinct lexicon patterns occurring in `text`, lexicographically
    * sorted — deterministic regardless of match order.
    */
  def find(text: UTF8String): ArrayData = {
    val (next, fail, out) = trie
    val s = text.toString
    val hit = new Array[Boolean](patterns.length)
    var st = 0
    var i = 0
    while (i < s.length) {
      val c = Character.valueOf(s.charAt(i))
      var cur = st
      var t = next(cur).get(c)
      while (t == null && cur != 0) { cur = fail(cur); t = next(cur).get(c) }
      st = if (t == null) 0 else t.intValue()
      val os = out(st)
      var j = 0
      while (j < os.length) { hit(os(j)) = true; j += 1 }
      i += 1
    }
    val found = patterns.indices.collect { case i if hit(i) => patterns(i) }.sorted
    ArrayData.toArrayData(found.map(UTF8String.fromString).toArray)
  }
}

/** `lexicon_hits(text, 'p1|p2|…')` — the distinct lexicon patterns
  * occurring as substrings of `text`, sorted. The lexicon must be a
  * string literal (pipe-separated), so the automaton compiles once at
  * plan time; codegen emits a single automaton call per row (the same
  * referenced-object shape Spark's own regexp expressions use — the
  * hot loop is the automaton's char walk, not expression dispatch).
  */
case class LexiconMatch(child: Expression, lexicon: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "lexicon_hits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  @transient private lazy val ac = new AhoCorasick(lexicon.toArray)

  override protected def nullSafeEval(t: Any): Any =
    ac.find(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("lexiconAc", ac, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.find($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconMatch =
    copy(child = newChild)
}
