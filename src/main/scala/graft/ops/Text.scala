package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared token/n-gram column expressions for the text operators —
  * one definition so TextDedup and Events cannot drift.
  */
object Text {

  /** Whitespace tokens of the `text` column. */
  val toks: Column = split(col("text"), " ")

  /** n-gram array over `toks`, guarded for short documents: Spark's
    * sequence(1, b) counts DOWN when b < 1 (a <n-token doc would yield
    * [1, 0] and slice() throws), while the DuckDB oracle's
    * generate_series(1, 0) is empty — so emit an empty array for docs
    * shorter than n tokens, which both engines then treat identically
    * (explode drops the row; array_min yields NULL). */
  def grams(n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
}
