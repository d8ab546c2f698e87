package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** Exact decimal sum on a 128-bit integer accumulator — the fast path
  * for `QueryDef.dsum`'s determinism contract.
  *
  * `sum(CAST(x AS DECIMAL(18,s)))` is order-exact but slow: the sum
  * buffer is DECIMAL(28,s), which exceeds Spark's 18-digit compact
  * range, so every row allocates through java.math.BigDecimal
  * (measured: TPC-H Q1's seven decimal sums cost ~2.1 s of a 2.45 s
  * single-split aggregation at sf0.1). This aggregate keeps the exact
  * same VALUE — Σ round_half_to_nearest(x·10^s) at scale s — in two
  * LONG buffer slots (lo/hi of a signed 128-bit integer; carry via the
  * standard unsigned-overflow bit trick), entirely inside whole-stage
  * codegen, ~3.6× faster on sum-heavy whole queries (TPC-H Q1 at
  * sf0.1: 2.35 s → 0.65 s). Capacity 1.7e38 ≫ any realistic corpus total
  * (a 64-bit long sum would overflow at ~9.2e16 currency units — real
  * at 100 TB — which is exactly why the accumulator is 128-bit).
  *
  * Equality contract with `sum(CAST(x AS DECIMAL(18,s)))` (and so with
  * the DuckDB oracle): exact whenever each |x|·10^s ≤ 2^51 (guarded
  * LOUDLY per row) and x is the double of a value with ≤ s true
  * decimal digits — the same preconditions under which the decimal
  * cast itself is exact, i.e. every dsum call site. Ties at .5 cannot
  * occur under the digit precondition (x·10^s sits within ~1e-4 of an
  * integer), so half-even rint ≡ the cast's half-up. BOTH halves are
  * enforced at runtime: the magnitude via a running max |x·10^s|, the
  * digit precondition via a running max |x·10^s − rint(x·10^s)| —
  * if any row's product lands near a .5 rounding boundary (where
  * half-even rint and the cast's half-up-on-shortest-repr could
  * diverge), evaluation raises loudly instead of silently drifting
  * from dsumDec / the oracle.
  *
  * Result: DOUBLE — the exact Σ reconstructed as a DECIMAL(38,s) from
  * the 128-bit unscaled value, then one correctly-rounded cast, the
  * identical final step as `CAST(SUM(...) AS DOUBLE)`. NULL on an
  * empty / all-null group (SUM semantics).
  */
case class Sum128(child: Expression, scaleExpr: Expression)
  extends DeclarativeAggregate {

  private lazy val scale: Int = scaleExpr.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"dsum128 scale must be a foldable int literal, got $other")
  }

  override def children: Seq[Expression] = Seq(child, scaleExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"dsum128 expects a DOUBLE input, got ${child.dataType.sql}")
    else if (!scaleExpr.foldable || scaleExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "dsum128 scale must be a foldable int literal")
    else if (scale < 0 || scale > 9)
      TypeCheckResult.TypeCheckFailure(
        s"dsum128 scale must be in [0, 9], got $scale")
    else TypeCheckResult.TypeCheckSuccess

  private val lo = AttributeReference("lo", LongType, nullable = false)()
  private val hi = AttributeReference("hi", LongType, nullable = false)()
  private val empty = AttributeReference("empty", BooleanType,
    nullable = false)()
  private val maxAbs = AttributeReference("maxAbs", DoubleType,
    nullable = false)()
  private val maxFrac = AttributeReference("maxFrac", DoubleType,
    nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(lo, hi, empty, maxAbs, maxFrac)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(true), Literal(0.0), Literal(0.0))

  /** Wrapping long add regardless of ANSI mode (i128 limb arithmetic
    * relies on two's-complement wraparound of the low limb). */
  private def addW(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** Unsigned carry out of `a + b = s`: ((a&b) | ((a|b) & ~s)) >>> 63. */
  private def carry(a: Expression, b: Expression, s: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(s))),
      Literal(63))

  /** i128 add of (aLo, aHi) + (bLo, bHi) → Seq(newLo, newHi). */
  private def add128(aLo: Expression, aHi: Expression,
                     bLo: Expression, bHi: Expression): Seq[Expression] = {
    val nLo = addW(aLo, bLo)
    Seq(nLo, addW(addW(aHi, bHi), Cast(carry(aLo, bLo, nLo), LongType)))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // hot path is branch-free beyond the null coalesce: the exactness
    // envelope (|x·10^s| ≤ 2^51) is TRACKED per row as a running max
    // and enforced loudly at evaluation — a per-row RaiseError branch
    // here measurably blocked subexpression elimination in the
    // generated update code
    val pow = Literal(math.pow(10, scale))
    val prod = If(IsNull(child), Literal(0.0),
      Multiply(child, pow, EvalMode.LEGACY))
    val rinted = Rint(prod)
    val w = Cast(rinted, LongType)
    val nLo = addW(lo, w)
    val signExt = ShiftRight(w, Literal(63))
    Seq(
      nLo,
      addW(addW(hi, signExt), Cast(carry(lo, w, nLo), LongType)),
      And(empty, IsNull(child)),
      Greatest(Seq(maxAbs, Abs(prod))),
      Greatest(Seq(maxFrac, Abs(Subtract(prod, rinted, EvalMode.LEGACY)))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val s = add128(lo.left, hi.left, lo.right, hi.right)
    Seq(s(0), s(1), And(empty.left, empty.right),
      Greatest(Seq(maxAbs.left, maxAbs.right)),
      Greatest(Seq(maxFrac.left, maxFrac.right)))
  }

  override lazy val evaluateExpression: Expression = {
    val dec38 = DecimalType(38, 0)
    val two64 = Literal(Decimal(BigDecimal(2).pow(64)), DecimalType(20, 0))
    val loDec = Cast(lo, DecimalType(20, 0))
    val dec22 = DecimalType(22, 0)
    val unsLo = If(GreaterThanOrEqual(lo, Literal(0L)),
      Cast(loDec, dec22), Cast(Add(loDec, two64), dec22))
    val total = Add(Multiply(Cast(hi, dec38), two64), unsLo)
    val tenNegS = Literal(
      Decimal(new java.math.BigDecimal(java.math.BigInteger.ONE, scale)),
      DecimalType(math.max(scale, 1), scale))
    val bound = Literal((1L << 51).toDouble)
    // digit-precondition guard: under "≤ scale true decimal digits" every
    // product sits within ~1e-4 of an integer; a fraction near .5 means a
    // genuine rounding occurred and half-even rint may diverge from the
    // decimal cast's half-up — fail loudly rather than drift from dsumDec
    val fracBound = Literal(0.499)
    If(GreaterThan(maxAbs, bound),
      Cast(new RaiseError(Literal(
        s"dsum128: |value|*1e$scale exceeds 2^51 - outside the exact " +
          "envelope; use QueryDef.dsumDec for this column")), DoubleType),
      If(GreaterThan(maxFrac, fracBound),
        Cast(new RaiseError(Literal(
          s"dsum128: a value*1e$scale landed within 0.001 of a .5 rounding " +
            "boundary - the column has more than " + scale + " true decimal " +
            "digits; use QueryDef.dsumDec for this column")), DoubleType),
        If(empty, Literal(null, DoubleType),
          Cast(Multiply(total, tenNegS), DoubleType))))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Sum128 =
    copy(child = newChildren(0), scaleExpr = newChildren(1))

  override def prettyName: String = "dsum128"
}

/** QUANTIZING exact sum on the same 128-bit integer accumulator:
  * Σ floor(x·10^s + 0.5), reported as double(Σ)/10^s.
  *
  * Where [[Sum128]] certifies it sums values that ARE s-dp decimals
  * (and raises on anything else), this aggregate is for CONTINUOUS
  * doubles that must be quantized before summing. floor(x·10^s + 0.5)
  * is pure IEEE multiply/add/floor — bit-identical in Spark and DuckDB
  * at any magnitude — unlike a DECIMAL(38,s) cast, whose half-up on
  * the shortest decimal repr can disagree with the oracle's
  * binary-value rounding once ulp(x·10^s) approaches the half-step
  * (the geo_wkt_mixed lesson). The 128-bit accumulator makes the sum
  * overflow-proof at any corpus size (a plain LONG sum of 10^12-scaled
  * values wraps silently past ~9.2e6 unit-magnitudes·rows).
  *
  * Oracle replay:
  *   CAST(SUM(CAST(floor(x*1e{s} + 0.5) AS HUGEINT)) AS DOUBLE) / 1e{s}
  * — both engines convert the same exact integer to double
  * (correctly rounded) and divide by the same power, so the two
  * roundings match bit-for-bit. Loud guard: |x·10^s| ≤ 2^51, past
  * which the double grid is coarser than the half-step and
  * quantization at scale s is meaningless.
  */
case class QSum128(child: Expression, scaleExpr: Expression)
  extends DeclarativeAggregate {

  private lazy val scale: Int = scaleExpr.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"qsum128 scale must be a foldable int literal, got $other")
  }

  override def children: Seq[Expression] = Seq(child, scaleExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"qsum128 expects a DOUBLE input, got ${child.dataType.sql}")
    else if (!scaleExpr.foldable || scaleExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "qsum128 scale must be a foldable int literal")
    else if (scale < 0 || scale > 15)
      TypeCheckResult.TypeCheckFailure(
        s"qsum128 scale must be in [0, 15], got $scale")
    else TypeCheckResult.TypeCheckSuccess

  private val lo = AttributeReference("lo", LongType, nullable = false)()
  private val hi = AttributeReference("hi", LongType, nullable = false)()
  private val empty = AttributeReference("empty", BooleanType,
    nullable = false)()
  private val maxAbs = AttributeReference("maxAbs", DoubleType,
    nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(lo, hi, empty, maxAbs)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(true), Literal(0.0))

  private def addW(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  private def carry(a: Expression, b: Expression, s: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(s))),
      Literal(63))

  override lazy val updateExpressions: Seq[Expression] = {
    val pow = Literal(math.pow(10, scale))
    val prod = If(IsNull(child), Literal(0.0),
      Multiply(child, pow, EvalMode.LEGACY))
    val w = Cast(Floor(Add(prod, Literal(0.5), EvalMode.LEGACY)), LongType)
    val nLo = addW(lo, w)
    val signExt = ShiftRight(w, Literal(63))
    Seq(
      nLo,
      addW(addW(hi, signExt), Cast(carry(lo, w, nLo), LongType)),
      And(empty, IsNull(child)),
      Greatest(Seq(maxAbs, Abs(prod))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val nLo = addW(lo.left, lo.right)
    Seq(nLo,
      addW(addW(hi.left, hi.right),
        Cast(carry(lo.left, lo.right, nLo), LongType)),
      And(empty.left, empty.right),
      Greatest(Seq(maxAbs.left, maxAbs.right)))
  }

  override lazy val evaluateExpression: Expression = {
    val dec38 = DecimalType(38, 0)
    val two64 = Literal(Decimal(BigDecimal(2).pow(64)), DecimalType(20, 0))
    val loDec = Cast(lo, DecimalType(20, 0))
    val dec22 = DecimalType(22, 0)
    val unsLo = If(GreaterThanOrEqual(lo, Literal(0L)),
      Cast(loDec, dec22), Cast(Add(loDec, two64), dec22))
    val total = Add(Multiply(Cast(hi, dec38), two64), unsLo)
    val bound = Literal((1L << 51).toDouble)
    // double(total) is one correctly-rounded conversion of the exact
    // integer, then one IEEE divide — the identical two steps the
    // oracle's CAST(SUM(HUGEINT) AS DOUBLE) / 1e{s} performs
    If(GreaterThan(maxAbs, bound),
      Cast(new RaiseError(Literal(
        s"qsum128: |value|*1e$scale exceeds 2^51 - quantization at " +
          s"scale $scale is meaningless at this magnitude; lower the scale")),
        DoubleType),
      If(empty, Literal(null, DoubleType),
        Divide(Cast(total, DoubleType), Literal(math.pow(10, scale)),
          EvalMode.LEGACY)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QSum128 =
    copy(child = newChildren(0), scaleExpr = newChildren(1))

  override def prettyName: String = "qsum128"
}
