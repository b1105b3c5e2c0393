package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, Decimal, DecimalType, DoubleType}

/** double → DECIMAL(28,10), value-identical to `Cast` but without the
  * per-value `new BigDecimal(String)` parse.
  *
  * Spark's Cast defines the result as
  * `BigDecimal(Double.toString(d))` rounded HALF_UP to scale 10 — the
  * shortest-decimal-representation semantics. The exact-sum kernels
  * (`QueryUtils.dsum`/`davg`) apply that cast to every aggregated
  * value, and the BigDecimal construction dominated the measured cost
  * (q01: 5 casts × 600 k rows ≈ 0.4 s of 1.4 s; plus BigDecimal-backed
  * inputs force the decimal Sum onto its BigDecimal.add path).
  *
  * This expression still goes through `Double.toString` (the value
  * DEPENDS on it) but parses the plain-notation form directly into a
  * compact scale-10 long (HALF_UP on the 11th fraction digit, carry
  * handled), producing a long-backed Decimal whose unscaled value and
  * scale equal the Cast result exactly. Anything not trivially
  * parseable — scientific notation (|d| ≥ 1e7 or < 1e-3), NaN/Inf —
  * falls back to the reference path itself, so equality holds by
  * construction there. Property-proven against Cast in
  * DecimalFastSpec.
  */
case class FastDoubleToDecimal(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)

  override def dataType: DataType = DecimalType(28, 10)

  override def prettyName: String = "graft_double_to_dec"

  override protected def nullSafeEval(input: Any): Any =
    DecimalFast.toDec2810(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftbridge.DecimalFast.toDec2810($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DecimalFast {
  private val Precision = 28
  private val Scale = 10
  private val ScaleFactor = 10000000000L // 10^Scale
  // plain Double.toString has < 1e7 magnitude, so <= 7 integer digits;
  // 8 keeps unscaled strictly below 10^18 even after a rounding carry
  private val MaxIntDigits = 8

  /** Reference path: exactly what Cast(double → dec(28,10)) computes. */
  private def slow(d: Double): Decimal = {
    val dec = Decimal(d) // BigDecimal.valueOf == new BigDecimal(Double.toString(d))
    if (dec.changePrecision(Precision, Scale)) dec // HALF_UP, like Cast
    else throw new ArithmeticException(
      s"$d cannot be represented as Decimal($Precision, $Scale)")
  }

  def toDec2810(d: Double): Decimal = {
    val u = unscaled18OrSentinel(d)
    if (u == Long.MinValue) slow(d)
    else Decimal.createUnsafe(u, Precision, Scale)
  }

  /** The fast parse, surfaced as a bare unscaled long for the two-long
    * sum kernel (DecimalSum): returns unscaled(Cast(d → DECIMAL(28,10)))
    * with |u| ≤ 10¹⁸ guaranteed, or Long.MinValue when the plain-
    * notation fast path does not apply (NaN/Inf, scientific notation,
    * > MaxIntDigits integer digits) and the caller must take the exact
    * slow path. */
  def unscaled18OrSentinel(d: Double): Long = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return Long.MinValue
    val s = java.lang.Double.toString(d)
    val n = s.length
    var i = 0
    var neg = false
    if (s.charAt(0) == '-') { neg = true; i = 1 }
    var intPart = 0L
    var intDigits = 0
    var c = s.charAt(i)
    while (c != '.') { // plain form always contains '.'; 'E' only after it
      if (c == 'E') return Long.MinValue
      intPart = intPart * 10 + (c - '0')
      intDigits += 1
      i += 1
      c = s.charAt(i)
    }
    if (intDigits > MaxIntDigits) return Long.MinValue
    i += 1 // skip '.'
    var frac = 0L
    var fracDigits = 0
    while (i < n && fracDigits < Scale) {
      c = s.charAt(i)
      if (c == 'E') return Long.MinValue
      frac = frac * 10 + (c - '0')
      fracDigits += 1
      i += 1
    }
    if (i < n) {
      // digits beyond scale 10: HALF_UP — the discarded tail is >= half
      // an ulp iff its leading digit is >= 5 (ties round away from zero)
      var j = i
      while (j < n) { if (s.charAt(j) == 'E') return Long.MinValue; j += 1 }
      if (s.charAt(i) - '0' >= 5) {
        frac += 1
        if (frac == ScaleFactor) { frac = 0; intPart += 1 }
      }
    } else {
      while (fracDigits < Scale) { frac = frac * 10; fracDigits += 1 }
    }
    val unscaled = intPart * ScaleFactor + frac
    if (neg) -unscaled else unscaled
  }
}
