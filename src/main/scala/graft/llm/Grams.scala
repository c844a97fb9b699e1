package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word n-gram row construction — the ONE sanctioned shape.
  *
  * NEVER `explode(transform(sequence(...), i -> ...))`: when the
  * gram-array projection fuses into the `Generate`'s codegen stage, the
  * interpreted higher-order `transform` is torn down and re-run so the
  * cost scales with emitted-elements × array-length — O(n²) per doc.
  * Measured at sf0.1 (5 000 docs, 54 words avg): exploding
  * HOF-built 5-grams runs 13.8 s and 2-grams 5.9 s, while building the
  * very same arrays WITHOUT the explode takes 0.4 s, and exploding them
  * from a parquet-materialized column 0.14 s — the 30× is pure
  * re-evaluation, and it grows linearly with doc length on top of the
  * linear row count (a 5 000-word web document would pay 100× more).
  *
  * The shape here keeps the ZERO-SHUFFLE property that motivated the
  * HOF form (a lag/lead-window formulation pays a full doc-keyed sort
  * exchange, the scale-killer at 100 TB): `posexplode` the split array
  * — a Generate over a cheap child — then assemble each gram from the
  * CARRIED array with O(1) `element_at` lookups in the projection
  * above, evaluated once per OUTPUT row. Same rows, same order
  * semantics, 0.4 s for the 13.8 s case. Short docs (< n words) emit
  * nothing — `generate_series` semantics, with no descending-`sequence`
  * hazard to guard against.
  */
object Grams {

  /** Rows `idCols..., pos, w_1 .. w_n`: `pos` is the 1-based start
    * position of the n-gram in the word array, `w_k` its k-th word.
    */
  def ngramWords(docs: DataFrame, wsCol: Column, n: Int,
                 idCols: Seq[String] = Seq("doc_id")): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    docs
      .select(idCols.map(col) :+ wsCol.as("__gws"): _*)
      .select(idCols.map(col) ++ Seq(col("__gws"),
        posexplode(col("__gws")).as(Seq("__gi", "w_1"))): _*)
      .filter(col("__gi") + n <= size(col("__gws")))
      .select(idCols.map(col) ++
        Seq((col("__gi") + 1).as("pos"), col("w_1")) ++
        (2 to n).map(k =>
          element_at(col("__gws"), col("__gi") + k).as(s"w_$k")): _*)
  }

  /** Rows `idCols..., pos, gram` with `gram` the space-joined n words. */
  def ngrams(docs: DataFrame, wsCol: Column, n: Int,
             idCols: Seq[String] = Seq("doc_id")): DataFrame =
    ngramWords(docs, wsCol, n, idCols)
      .select(idCols.map(col) ++ Seq(col("pos"),
        concat_ws(" ", (1 to n).map(k => col(s"w_$k")): _*).as("gram")): _*)
}
