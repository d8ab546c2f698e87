package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimum md5 hex digest over the word n-grams of a token array, in
  * ONE native pass — the compiled replacement for text_fingerprint's
  *
  *   array_min(transform(word_ngrams(toks, n), g -> md5(g)))
  *
  * whose md5 lambda Catalyst evaluates INTERPRETED per gram (each gram
  * pays the md5→hex-string expression chain plus a UTF8String
  * allocation for the 32-char hex, only for array_min to discard all
  * but one). This kernel digests the identical UTF-8 bytes (grams via
  * `UTF8String.concatWs`, exactly WordNgramMath's construction;
  * MessageDigest MD5 — the intrinsified JDK path, measured faster than
  * a hand-rolled core in round 16) and keeps the RUNNING MIN by
  * unsigned byte comparison of the 16-byte digests, hex-encoding only
  * the winner. Unsigned digest-byte order IS lexicographic hex order:
  * the nibble→'0'..'9','a'..'f' map is monotonic in ASCII and all hex
  * strings have equal length, so the selected gram — and the returned
  * 32-char lowercase string — are bit-identical to the HOF chain
  * (pinned in MinMd5Spec).
  *
  * NULL for docs shorter than n tokens (array_min over the empty gram
  * array is NULL — the same short-doc guard the chain encodes).
  */
object MinMd5Math {
  private val Sep = UTF8String.fromString(" ")
  private val HexDigits = "0123456789abcdef".getBytes

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** -1 / 0 / 1 for a <u b (unsigned, 16 bytes). */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  def minHex(toks: ArrayData, n: Int): UTF8String = {
    val cnt = toks.numElements()
    if (cnt < n) return null
    val ts = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) { ts(i) = toks.getUTF8String(i); i += 1 }
    val ng = cnt - n + 1
    val window = new Array[UTF8String](n)
    val d = md5.get()
    var best: Array[Byte] = null
    i = 0
    while (i < ng) {
      var j = 0
      while (j < n) { window(j) = ts(i + j); j += 1 }
      d.reset()
      d.update(UTF8String.concatWs(Sep, window: _*).getBytes)
      val dig = d.digest()
      if (best == null || cmp(dig, best) < 0) best = dig
      i += 1
    }
    val hex = new Array[Byte](32)
    i = 0
    while (i < 16) {
      hex(2 * i) = HexDigits((best(i) >> 4) & 0xf)
      hex(2 * i + 1) = HexDigits(best(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(hex)
  }
}

case class MinMd5(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), IntegerType)

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def prettyName: String = "min_md5"

  override protected def nullSafeEval(toks: Any, n: Any): Any =
    MinMd5Math.minHex(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ns = nullSafeCodeGen(ctx, ev, (t, n) => s"""
      ${ev.value} = graft.functions.MinMd5Math.minHex($t, $n);
      ${ev.isNull} = ${ev.value} == null;""")
    ns
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
