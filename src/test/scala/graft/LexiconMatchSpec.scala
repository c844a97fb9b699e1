package graft

import org.apache.spark.sql.functions._

import graft.functions.{AhoCorasick, GraftFunctions}

/** The Aho–Corasick `lexicon_hits` expression: parity with a naive
  * per-pattern contains scan on random text, overlapping-pattern
  * reporting through failure links, null handling, and SQL
  * registration (codegen path — the expression runs inside
  * whole-stage codegen in a plain projection).
  */
class LexiconMatchSpec extends SparkSpec {

  private val lexicon = Seq("ab", "babc", "bc", "c", "cab", "xyz")

  private def naive(text: String): Seq[String] =
    lexicon.filter(text.contains).sorted

  test("automaton equals naive contains scan on random text") {
    val rnd = new scala.util.Random(11)
    val ac = new AhoCorasick(lexicon.toArray)
    (1 to 500).foreach { _ =>
      val s = (1 to rnd.nextInt(40)).map(_ => "abcxyz".charAt(rnd.nextInt(6))).mkString
      val got = ac.find(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(got === naive(s), s"text=$s")
    }
  }

  test("overlapping patterns all report: suffix matches ride failure links") {
    val ac = new AhoCorasick(Array("low", "slow", "lowly"))
    val got = ac.find(org.apache.spark.unsafe.types.UTF8String.fromString("a slowly thing"))
      .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(got === Seq("low", "lowly", "slow"))
  }

  test("SQL registration: codegen projection equals naive filter; NULL passes through") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      Some("the slow duplicate"),
      Some("nothing here"),
      Some(""),
      None).toDF("text")
    val r = df.select(expr("lexicon_hits(text, 'dup|low|slow|upli')").as("h")).collect()
    assert(r(0).getSeq[String](0) === Seq("dup", "low", "slow", "upli"))
    assert(r(1).getSeq[String](0) === Seq())
    assert(r(2).getSeq[String](0) === Seq())
    assert(r(3).isNullAt(0))
  }

  test("non-literal lexicon is rejected") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(("a", "b")).toDF("text", "lex")
    val e = intercept[Exception] {
      df.select(expr("lexicon_hits(text, lex)")).collect()
    }
    assert(e.getMessage.contains("literal") || e.getCause != null)
  }
}
