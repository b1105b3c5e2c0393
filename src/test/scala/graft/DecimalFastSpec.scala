package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.DecimalFast
import org.apache.spark.sql.types.{Decimal, DecimalType}
import org.scalatest.funsuite.AnyFunSuite

/** Proves the fast double→DECIMAL(28,10) kernel equals Spark's Cast —
  * value AND scale — so every dsum/davg consumer keeps bit-identical
  * oracle parity. Sampling is seeded (deterministic across runs).
  */
class DecimalFastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference: exactly what Cast(double → dec(28,10)) computes. */
  private def ref(d: Double): Decimal = {
    val dec = Decimal(d)
    assert(dec.changePrecision(28, 10), s"reference overflow for $d")
    dec
  }

  private def check(d: Double): Unit = {
    val fast = DecimalFast.toDec2810(d)
    val slow = ref(d)
    assert(fast.toJavaBigDecimal == slow.toJavaBigDecimal,
      s"d=$d fast=${fast.toJavaBigDecimal} ref=${slow.toJavaBigDecimal} " +
        s"(toString=${java.lang.Double.toString(d)})")
  }

  test("fast conversion equals Cast on edge values") {
    Seq(0.0, 1.0, 0.05, 0.1, 0.1 + 0.2, 1.0 / 3.0,
      123.456, 999.99999999995, 0.99999999995,
      0.00099999999995, 0.001, 0.0001, 9.999999999e-3,
      1e6, 9999999.9999999, 1e7, 1.23456789e7, 1e15, 1e17, 9.9e17,
      0.12345678901234567, 0.12345678905, 0.12345678904999999,
      Double.MinPositiveValue, 4.9e-300
    ).foreach { d => check(d); check(-d) }
    check(-0.0)
  }

  test("fast conversion throws where Cast overflows Decimal(28,10)") {
    intercept[ArithmeticException](DecimalFast.toDec2810(1e19))
    intercept[ArithmeticException](DecimalFast.toDec2810(-1e19))
  }

  test("fast conversion equals Cast on seeded random doubles") {
    val rnd = new scala.util.Random(42)
    var n = 0
    while (n < 50000) {
      // uniform magnitudes across the plain-notation range
      check((rnd.nextDouble() - 0.5) * 2e7)
      // typical measure values and fraction-heavy
      check((rnd.nextDouble() - 0.5) * 2000.0)
      check(rnd.nextDouble())
      // two-decimal prices at many magnitudes
      check((rnd.nextLong() % 100000000L) / 100.0)
      // arbitrary finite bit patterns below the overflow bound
      val bits = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (java.lang.Double.isFinite(bits) && math.abs(bits) < 1e18) check(bits)
      n += 1
    }
  }

  test("DataFrame-level: fast expression column equals .cast over the corpus") {
    val li = core.Tables.lineitem(spark, TestSpark.sfDir)
    val exprs = Seq(
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_extendedprice") * (lit(1) - col("l_discount")))
    exprs.foreach { e =>
      val bad = li.select(
        core.QueryUtils.dec(e).as("fast"),
        e.cast(DecimalType(28, 10)).as("slow"))
        .filter(not(col("fast") <=> col("slow")))
      assert(bad.count() === 0L, e.toString)
    }
  }
}
