package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The one-pass `text_clean` expression: exact parity with the
  * four-regex projection it replaced, on adversarial inputs — space
  * runs at every boundary, unicode (including non-BMP surrogate
  * pairs), empty/all-space strings, NULL pass-through, and random
  * fuzz.
  */
class TextCleanSpec extends SparkSpec {

  private def regexForm(dfCols: org.apache.spark.sql.Column) = Seq(
    lower(regexp_replace(trim(dfCols), " +", " ")).as("normalized"),
    regexp_replace(dfCols, "[^a-zA-Z0-9 ]", "").as("no_punct"),
    regexp_replace(dfCols, "[0-9]", "#").as("digits_masked"),
    (length(dfCols) - length(regexp_replace(dfCols, "[^a-zA-Z ]", "")))
      .as("n_special"))

  private def check(texts: Seq[String]): Unit = {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = texts.toDF("text")
    val viaRegex = df.select(regexForm(col("text")): _*).collect()
    val viaExpr = df.select(expr("text_clean(text)").as("tc"))
      .select(col("tc.normalized"), col("tc.no_punct"),
        col("tc.digits_masked"), col("tc.n_special"))
      .collect()
    viaRegex.zip(viaExpr).zip(texts).foreach { case ((a, b), t) =>
      assert(a === b, s"text=${t.replace(' ', '·')}")
    }
  }

  test("boundary shapes: space runs, empties, digits, punctuation") {
    check(Seq(
      "", " ", "   ", "a", " a ", "  a  b  ", "A  B",
      "abc123!@# def", "1234567890", "!!!", "Tab\tand\nnewline",
      "trailing   ", "   leading", "UPPER lower MiXeD 42",
      "a-b_c.d,e;f", "double  space   triple"))
  }

  test("unicode: accents, non-latin scripts, non-BMP surrogate pairs") {
    check(Seq(
      "café über ñoño", "Ärger STRASSE ß", "русский текст",
      "日本語テキスト", "emoji 😀 pair", "mixed é🍕 9",
      "😀😁", "İstanbul I ı"))
  }

  test("random fuzz equals the regex combo") {
    val rnd = new scala.util.Random(7)
    val alphabet = "aB z09.!?é日😀"
    val texts = (1 to 200).map { _ =>
      val sb = new StringBuilder
      (0 until rnd.nextInt(60)).foreach { _ =>
        val c = alphabet.charAt(rnd.nextInt(alphabet.length))
        // keep surrogate pairs whole
        if (Character.isHighSurrogate(c)) sb.append("😀") else sb.append(c)
      }
      sb.toString
    }
    check(texts)
  }

  test("NULL passes through as NULL struct") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq[String](null).toDF("text")
      .select(expr("text_clean(text)").as("tc")).collect()
    assert(r.head.isNullAt(0))
  }
}
