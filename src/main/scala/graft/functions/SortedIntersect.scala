package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Merge-intersection of two SORTED, DISTINCT long arrays — the
  * adjacency-intersection kernel for the structural graph queries
  * (triangles' wedge closure, edge overlap's embeddedness).
  *
  * `array_intersect` builds a hash set over one input PER CALL
  * (OpenHashSet allocation + hashing of every element); on the
  * sorted distinct adjacency arrays the graph family feeds it, the
  * intersection is a zero-allocation two-pointer merge. For inputs
  * that are sorted ascending and duplicate-free the result is
  * ELEMENT-IDENTICAL to `array_intersect(a, b)` (elements of `a`, in
  * `a`'s order, present in `b`, deduped) — pinned against
  * array_intersect on randomized sorted-distinct arrays in
  * SortedIntersectSpec.
  *
  * CONTRACT (callers are internal plan builders): both inputs sorted
  * ascending, duplicate-free — the graph adjacency builders produce
  * exactly that (`array_sort(collect_list(...))` over a DISTINCT edge
  * list). Unsorted input would silently under-count; never expose to
  * user SQL without a sort guard.
  */
object SortedIntersectMath {

  /** |a ∩ b| without materializing the intersection. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va < vb) i += 1
      else if (va > vb) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    c
  }

  /** a ∩ b as a sorted long array. */
  def intersect(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var k = 0
    while (i < na && j < nb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va < vb) i += 1
      else if (va > vb) j += 1
      else { out(k) = va; k += 1; i += 1; j += 1 }
    }
    val trimmed = new Array[Any](k)
    i = 0
    while (i < k) { trimmed(i) = out(i); i += 1 }
    new GenericArrayData(trimmed)
  }
}

/** size(a ∩ b) for sorted distinct long arrays. */
case class SortedCommon(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "sorted_common"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectMath.count(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectMath.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** a ∩ b for sorted distinct long arrays. */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "sorted_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectMath.intersect(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectMath.intersect($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
