package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (match each left row to the most recent right
  * row at or before its timestamp, per key).
  *
  * Scale path: instead of a range join (quadratic candidate blow-up) or a
  * per-key collect, both sides are unioned and sorted once per key; a
  * running `last(_, ignoreNulls = true)` carries the latest right-hand row
  * forward. One shuffle + one sort, regardless of data volume — the same
  * shape Spark uses for windowed dedup, so AQE can still split skewed keys.
  *
  * Right side must be unique per (key, time); pre-dedupe if not (ties have
  * no defined winner in an as-of join).
  */
object AsofJoin {

  /** @param left       probe side
    * @param right      build side, unique per (key, time)
    * @param leftKey    join key column name on `left`
    * @param rightKey   join key column name on `right`
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    right-side columns to carry onto matches
    */
  def leftAsof(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {

    val leftCols = left.columns
    // Tag: right rows sort before left rows at the same instant so a
    // match at exactly t is visible to a probe at t (>= semantics).
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(structType(right, payload)))
    val r = right
      .withColumn("_k", col(rightKey)).withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_payload", struct(payload.map(col): _*))
    val unioned = l.select((leftCols.map(col) ++ meta): _*)
      .unionByName(r.select((payloadNulls(left) ++ meta): _*))

    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) :+ col("_match"): _*)
  }

  /** Alternative physical strategy: range join + per-row top-1. Right
    * for small probe sides or when the right side is already bucketed;
    * the union+window form wins when both sides are huge (no candidate
    * blow-up). Results identical — AsofSpec asserts it.
    */
  def leftAsofRangeJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(leftCols.map(col): _*)
      .orderBy(col(s"_r_$rightTime").desc)
    val r = right.select(
      (Seq(col(rightKey).as(s"_r_$rightKey"),
        col(rightTime).as(s"_r_$rightTime")) ++
        payload.map(p => col(p).as(s"_p_$p"))): _*)
    left.join(r,
        col(leftKey) === col(s"_r_$rightKey") &&
        col(s"_r_$rightTime") <= col(leftTime), "left")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(leftCols.map(col) :+
        when(col(s"_r_$rightKey").isNotNull,
          struct(payload.map(p => col(s"_p_$p").as(p)): _*)).as("_match"): _*)
  }

  private val meta = Seq(col("_k"), col("_t"), col("_side"), col("_payload"))

  private def structType(right: DataFrame, payload: Seq[String]) = {
    import org.apache.spark.sql.types.StructType
    StructType(payload.map(p => right.schema(p)))
  }

  private def payloadNulls(left: DataFrame) =
    left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)).toSeq
}
