package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All C(n,2) ordered pairs of a SORTED long array, each bit-packed
  * into one long (a << 32 | b with a < b) — the market-basket pair
  * stream (q_basket_lift) in one compiled pass. The HOF form
  * (`transform(arr, (x,i) -> transform(slice(arr, i+2, …), y ->
  * shiftleft(x,32)|y))` + flatten) runs INTERPRETED per element and
  * allocates a slice per anchor. Guards are LOUD: a basket past
  * `maxLen` (the map-side fan-out cap — C(cap,2) pairs from one row)
  * or an element outside [0, 2^31) (the pack range) throws with the
  * remedy instead of mis-ranking.
  *
  * Semantics reference: duckpipe's association rules are plain SQL
  * self-joins over the order-product table (reference
  * pipeline/sql_templates); this kernel generates the identical
  * ordered pairs from the grouped basket without the self-join.
  */
object PairCodeMath {
  def pairs(arr: ArrayData, maxLen: Int): ArrayData = {
    val n = arr.numElements()
    if (n > maxLen) throw new IllegalArgumentException(
      s"pair_codes: basket size $n exceeds the map-side pair cap " +
        s"$maxLen - a hub basket would explode C(n,2) pairs from one row")
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val vs = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"pair_codes: null element at index $i - basket arrays must " +
          "be null-free (filter or coalesce before pairing)")
      val v = arr.getLong(i)
      if (v < 0L || v >= (1L << 31)) throw new IllegalArgumentException(
        s"pair_codes: element $v outside the [0, 2^31) pack range")
      vs(i) = v
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      val hi = vs(i) << 32
      var j = i + 1
      while (j < n) { out(k) = hi | vs(j); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class PairCodes(child: Expression, maxLen: Int = 1000)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "pair_codes"

  override protected def nullSafeEval(arr: Any): Any =
    PairCodeMath.pairs(arr.asInstanceOf[ArrayData], maxLen)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.PairCodeMath.pairs($a, $maxLen)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
