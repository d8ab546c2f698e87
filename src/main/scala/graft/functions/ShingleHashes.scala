package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct xxhash64 word-shingle hashes of a token array in ONE
  * native pass — the codegen'd replacement for
  * `array_distinct(transform(grams(n), xxhash64))` (and, exploded, for
  * the `explode(transform(...)).distinct()` form): Catalyst evaluates
  * higher-order-function lambdas interpreted per element, and each
  * gram costs a `slice` array allocation plus a `concat_ws` string
  * build before hashing. This kernel joins each n-token window with
  * single spaces via `UTF8String.concatWs` (the same routine
  * `concat_ws` bottoms out in) and hashes with
  * `XXH64.hashUTF8String(..., 42)` (the same call the `xxhash64`
  * expression makes), so the hash values are BIT-IDENTICAL to the HOF
  * chain — certified element-for-element in TextDedupSpec. First-
  * occurrence order is preserved (array_distinct's contract); docs
  * shorter than n tokens yield the empty array (the Text.grams
  * short-doc guard).
  *
  * Null ELEMENTS (possible from an external SQL caller —
  * `array<string>` admits containsNull; internal call sites tokenize
  * via split(), which never yields them) are SKIPPED inside each
  * window by `UTF8String.concatWs`, exactly the `concat_ws` semantics
  * of the HOF chain this replaces — no NPE, bit-identical hashes.
  */
object ShingleMath {
  private val Sep = UTF8String.fromString(" ")

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Distinct 60-bit md5-prefix shingle hashes — bit-identical to
    * `array_distinct(transform(grams(n), conv(substring(md5(g), 1,
    * 15), 16, 10) cast long))`: the first 15 hex nibbles of the digest
    * as an integer are bytes 0..6 followed by the high nibble of byte
    * 7. The md5-derived form is the ORACLE-REPLAYABLE hash family
    * (DuckDB has md5 but not xxhash64); dedup_minhash_est depends on
    * these exact values. */
  def md5Shingles(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val ng = cnt - n + 1
    val ts = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) { ts(i) = toks.getUTF8String(i); i += 1 }
    val seen = new java.util.HashSet[java.lang.Long](ng * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Any](ng)
    val window = new Array[UTF8String](n)
    val d = md5.get()
    i = 0
    while (i < ng) {
      var j = 0
      while (j < n) { window(j) = ts(i + j); j += 1 }
      d.reset()
      d.update(UTF8String.concatWs(Sep, window: _*).getBytes)
      val dig = d.digest()
      var v = 0L
      j = 0
      while (j < 7) { v = (v << 8) | (dig(j) & 0xffL); j += 1 }
      v = (v << 4) | ((dig(7) >> 4) & 0xfL)
      val h = java.lang.Long.valueOf(v)
      if (seen.add(h)) out += h.longValue()
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct xxhash64 shingle hashes, SORTED ascending (since round
    * 17). The sort is one primitive Arrays.sort per document; it
    * enables the zero-allocation `sorted_common` two-pointer
    * verification of candidate pairs (dedup_minhash / containment /
    * incremental) in place of per-pair OpenHashSet array_intersects.
    * Every consumer is order-free: explode feeds set-semantics
    * joins/aggregates, minhash_signature is a pure min over elements,
    * and the containment prefix sketch sorts anyway (now for free).
    * The VALUES are unchanged — still the distinct xxhash64(gram)
    * set (TextVecSpec pins the sorted-distinct equality). */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val ng = cnt - n + 1
    val ts = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) { ts(i) = toks.getUTF8String(i); i += 1 }
    val seen = new java.util.HashSet[java.lang.Long](ng * 2)
    val out = new Array[Long](ng)
    var m = 0
    val window = new Array[UTF8String](n)
    i = 0
    while (i < ng) {
      var j = 0
      while (j < n) { window(j) = ts(i + j); j += 1 }
      val g = UTF8String.concatWs(Sep, window: _*)
      val h = XXH64.hashUTF8String(g, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    java.util.Arrays.sort(out, 0, m)
    val boxed = new Array[Any](m)
    i = 0
    while (i < m) { boxed(i) = out(i); i += 1 }
    new GenericArrayData(boxed)
  }
}

case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), IntegerType)

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(toks: Any, n: Any): Any =
    ShingleMath.shingles(toks.asInstanceOf[ArrayData],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.ShingleMath.shingles($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Character n-gram array of a string in one native pass — equal to
  * `transform(sequence(1, length(text) − (n−1)), i -> substring(text,
  * i, n))` with the short-string empty-array guard (Catalyst runs that
  * lambda INTERPRETED per position; `substringSQL` here is the same
  * routine the `substring` expression bottoms out in, so the gram
  * strings are identical). Multiplicity is preserved — the langid
  * profile counts occurrences. */
object CharNgramMath {
  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val nc = s.numChars()
    if (nc < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nc - n + 1)
    var i = 0
    while (i < nc - n + 1) { out(i) = s.substringSQL(i + 1, n); i += 1 }
    new GenericArrayData(out)
  }
}

case class CharNgrams(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(s: Any, n: Any): Any =
    CharNgramMath.ngrams(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) =>
      s"graft.functions.CharNgramMath.ngrams($s, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Word n-gram STRINGS of a token array in one native pass,
  * multiplicity preserved — the compiled replacement for the
  * `transform(sequence(1, size(toks) − (n−1)), i -> concat_ws(' ',
  * slice(toks, i, n)))` chain (Text.grams), which Catalyst evaluates
  * INTERPRETED per position with a slice allocation + string build
  * each. Gram strings are BIT-IDENTICAL to that chain:
  * `UTF8String.concatWs` is the routine `concat_ws` bottoms out in
  * (null elements skipped identically). Docs shorter than n tokens
  * yield the empty array (the Text.grams short-doc guard). */
object WordNgramMath {
  private val Sep = UTF8String.fromString(" ")

  def ngrams(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val ng = cnt - n + 1
    val ts = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) { ts(i) = toks.getUTF8String(i); i += 1 }
    val out = new Array[Any](ng)
    val window = new Array[UTF8String](n)
    i = 0
    while (i < ng) {
      var j = 0
      while (j < n) { window(j) = ts(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Sep, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class WordNgrams(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), IntegerType)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(toks: Any, n: Any): Any =
    WordNgramMath.ngrams(toks.asInstanceOf[ArrayData],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.WordNgramMath.ngrams($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class Md5Shingles(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), IntegerType)

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "md5_shingles"

  override protected def nullSafeEval(toks: Any, n: Any): Any =
    ShingleMath.md5Shingles(toks.asInstanceOf[ArrayData],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.ShingleMath.md5Shingles($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
