package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of ONE document's token array in a single
  * native pass — the codegen'd replacement for the posexplode → two
  * LAG windows → running-sum window → collect_list/array_sort rebuild
  * (four shuffles of every token) in chunk_cdc. Semantics are
  * bit-identical to that chain: a boundary fires AFTER token i (i ≥ 2,
  * 0-based) when the first 15 hex chars of md5("t(i-2) t(i-1) t(i)")
  * taken as an integer are ≡ 0 (mod 8) — i.e. the low 3 bits of the
  * 15th nibble of the digest — and each chunk is the maximal run of
  * tokens between boundaries, re-joined with single spaces (tokens are
  * split-on-space, so join(split(x)) round-trips). Returns
  * array<struct<ctext, clen>> in document order; the chunk id is the
  * array ordinal (what the window's running boundary sum computed).
  */
object CdcChunkMath {
  private val SPACE = ' '.toByte

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** b(i): the low 3 bits of nibble 14 of md5(t2 + ' ' + t1 + ' ' + w)
    * — exactly `conv(substring(md5(...), 1, 15), 16, 10) % 8` on the
    * hex form (the 15-nibble value mod 8 is its last nibble mod 8). */
  private def isBoundary(t2: Array[Byte], t1: Array[Byte],
                         w: Array[Byte]): Boolean = {
    val d = md5.get()
    d.reset()
    d.update(t2); d.update(SPACE); d.update(t1); d.update(SPACE); d.update(w)
    ((d.digest()(7) >> 4) & 7) == 0
  }

  def chunks(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val u = toks.getUTF8String(i)
      // loud contract instead of an NPE: the boundary triple has no
      // meaningful null form (concat_ws would silently DROP the token
      // and shift every downstream boundary) — internal call sites
      // tokenize via split(), which never yields null elements; an
      // external SQL caller gets the contract spelled out
      if (u == null) throw new IllegalArgumentException(
        s"cdc_chunks: null token at position $i - token arrays must be " +
          "null-free (split() output)")
      bytes(i) = u.getBytes
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val sb = new java.io.ByteArrayOutputStream()
    var clen = 0L
    i = 0
    while (i < n) {
      if (clen > 0) sb.write(SPACE.toInt)
      sb.write(bytes(i), 0, bytes(i).length)
      clen += 1
      val break = i >= 2 && isBoundary(bytes(i - 2), bytes(i - 1), bytes(i))
      if (break || i == n - 1) {
        out += new GenericInternalRow(Array[Any](
          UTF8String.fromBytes(sb.toByteArray), clen))
        sb.reset()
        clen = 0L
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class CdcChunks(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ctext", StringType, nullable = false),
    StructField("clen", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunkMath.chunks(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcChunkMath.chunks($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
